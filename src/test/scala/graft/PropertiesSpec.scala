package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.SampleNaming
import graft.plan.{Planner, QueryFeatures, StrategyChooser}
import graft.sample.Samplers
import graft.sketch.{Cms, Hll}

/** Seeded property-style checks (many random cases per law) for the
  * pure components — no SparkSession needed.
  */
class PropertiesSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("sample naming: encode/decode roundtrip over 3-decimal fractions") {
    (1 to 500).foreach { _ =>
      val f = math.max(0.001, (rnd.nextInt(999) + 1) / 1000.0)
      val name = SampleNaming.uniformName("t", f)
      val parsed = SampleNaming.parse(name)
      assert(parsed.exists { case (t, pf) => t == "t" && math.abs(pf - f) < 1e-9 },
        s"f=$f name=$name parsed=$parsed")
      val sname = SampleNaming.stratifiedName("orders", "o_col", f)
      assert(SampleNaming.parse(sname).exists(p => math.abs(p._2 - f) < 1e-9))
    }
  }

  test("Neyman allocation: fractions in [0,1], sizes track N_h*sigma_h") {
    (1 to 200).foreach { _ =>
      val k = 2 + rnd.nextInt(8)
      val strata = (0 until k).map { i =>
        (s"s$i", 100L + rnd.nextInt(10000), rnd.nextDouble() * 1000)
      }
      val f = 0.05 + rnd.nextDouble() * 0.4
      val alloc = Samplers.allocateNeyman(strata, f)
      alloc.foreach { a =>
        assert(a.fraction >= 0 && a.fraction <= 1.0)
        assert(a.sampleSize <= a.popSize)
      }
      // monotone: a stratum with larger N*sigma never gets a smaller
      // target size (before the cap)
      val uncapped = alloc.filter(_.fraction < 1.0)
      uncapped.sortBy(_.weight).sliding(2).foreach {
        case Seq(lo, hi) => assert(lo.sampleSize <= hi.sampleSize + 1)
        case _ =>
      }
    }
  }

  test("proportional allocation preserves the global fraction per stratum") {
    (1 to 100).foreach { _ =>
      val strata = (0 until 5).map(i => (s"s$i", 1000L + rnd.nextInt(5000), 0.0))
      val f = 0.1 + rnd.nextDouble() * 0.5
      Samplers.allocateProportional(strata, f).foreach { a =>
        assert(math.abs(a.fraction - f) < 1e-12)
        assert(a.sampleSize == (a.popSize * f).toLong)
      }
    }
  }

  test("HLL merge is commutative, associative, idempotent (random sets)") {
    (1 to 20).foreach { _ =>
      val xs = Seq.fill(rnd.nextInt(2000) + 10)(rnd.nextInt(5000).toString)
      val ys = Seq.fill(rnd.nextInt(2000) + 10)(rnd.nextInt(5000).toString)
      def mk(vals: Seq[String]): Hll = {
        val h = new Hll(10); vals.foreach(h.addString); h
      }
      val ab = mk(xs).merge(mk(ys)).serialize
      val ba = mk(ys).merge(mk(xs)).serialize
      assert(ab.sameElements(ba))
      val again = Hll.deserialize(ab).merge(mk(ys)).serialize
      assert(again.sameElements(ab))
      val union = mk(xs ++ ys).serialize
      assert(union.sameElements(ab), "merge must equal build-on-union")
    }
  }

  test("CMS never underestimates (random workloads)") {
    (1 to 10).foreach { _ =>
      val c = new Cms(0.02, 0.05)
      val truth = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      val total = 1000 + rnd.nextInt(5000)
      (0 until total).foreach { _ =>
        val k = s"k${rnd.nextInt(200)}"
        c.addString(k); truth(k) += 1
      }
      // hard guarantee: never underestimates. Soft guarantee: estimate
      // <= truth + eps*N holds per key only with prob 1-delta.
      truth.foreach { case (k, n) => assert(c.estimateString(k) >= n) }
      val over = truth.count { case (k, n) =>
        c.estimateString(k) > n + math.ceil(0.02 * total).toLong
      }
      assert(over <= math.max(1, (2 * 0.05 * truth.size).toInt),
        s"$over/${truth.size} keys exceeded the eps*N bound")
    }
  }

  test("planner never selects a sample plan violating maxRelError") {
    val f = QueryFeatures(Seq("t"), Seq("count"), hasCount = true,
      hasSum = false, hasAvg = false, hasMinMax = false, hasDistinct = false,
      hasGroupBy = false, groupByArity = 0, groupByColumns = Nil,
      whereComplexity = 0, hasOrderBy = false, hasLimit = false,
      hasJoin = false, queryLength = 30)
    val catalog = new graft.catalog.MetaCatalog(
      java.nio.file.Files.createTempDirectory("graft-prop").toString)
    (1 to 200).foreach { _ =>
      val n = 1000L + rnd.nextInt(1000000)
      val frac = 0.001 + rnd.nextDouble() * 0.3
      catalog.addSample(catalog.SampleInfo("t", SampleNaming.uniformName("t", frac),
        frac, None, "/tmp/x", 0L))
      val tol = rnd.nextDouble() * 0.2
      val plan = Planner.plan(f, catalog, n, tol, preferExact = false)
      assert(plan.estimatedError <= tol + 1e-12,
        s"n=$n frac=$frac tol=$tol err=${plan.estimatedError}")
    }
  }

  test("chooser: small tables and zero tolerance always run exact") {
    val feats = QueryFeatures(Seq("t"), Seq("count"), hasCount = true,
      hasSum = true, hasAvg = false, hasMinMax = false, hasDistinct = false,
      hasGroupBy = false, groupByArity = 0, groupByColumns = Nil,
      whereComplexity = 0, hasOrderBy = false, hasLimit = false,
      hasJoin = false, queryLength = 30)
    (1 to 100).foreach { _ =>
      val small = rnd.nextInt(1000).toLong
      assert(StrategyChooser.chooseBase(feats, small, 0.05).strategy ==
        StrategyChooser.Exact)
      val big = 10000L + rnd.nextInt(1000000)
      assert(StrategyChooser.chooseBase(feats, big, 0.0).strategy ==
        StrategyChooser.Exact)
    }
  }
}
