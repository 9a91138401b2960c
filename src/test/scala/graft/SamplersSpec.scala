package graft

import java.nio.file.Files

import graft.catalog.{MetaCatalog, SampleNaming}
import graft.sample.Samplers

class SamplersSpec extends SparkSpec {

  lazy val catalog = new MetaCatalog(
    Files.createTempDirectory("graft-samplers").toString)

  override def beforeAll(): Unit = {
    super.beforeAll()
    Tables.registerAll(spark, sfDir)
  }

  test("uniform sample materializes ~f*N rows and registers metadata") {
    val (name, rows) = Samplers.createUniform(spark, catalog, "orders", 0.2)
    assert(name == "orders__sample_0_2")
    val n = spark.table("orders").count()
    assert(math.abs(rows - 0.2 * n) < 6 * math.sqrt(0.2 * n) + 1)
    assert(catalog.bestUniformSample("orders").map(_.sampleTable).contains(name))
    assert(spark.table(name).count() == rows)
  }

  test("stratified sample (proportional) hits per-stratum fractions and carries weights") {
    val (name, strata) = Samplers.createStratified(
      spark, catalog, "orders", "o_orderpriority", 0.3)
    assert(strata.nonEmpty)
    strata.foreach { a =>
      assert(math.abs(a.fraction - 0.3) < 1e-9)
      assert(math.abs(a.sampleSize - 0.3 * a.popSize) <
        6 * math.sqrt(0.3 * a.popSize) + 1, s"stratum ${a.value}")
    }
    val wdist = spark.table(name).select("graft_weight").distinct().collect()
    assert(wdist.forall(r => math.abs(r.getDouble(0) - 1.0 / 0.3) < 1e-9))
  }

  test("deterministic stratified sample: power-of-two weights, reproducible membership, unbiased-ish HT totals") {
    val (name, strata) = Samplers.createStratifiedDeterministic(
      spark, catalog, "orders", "o_orderstatus", "o_orderkey", 128L)
    assert(name == "orders__strat_det_o_orderstatus")
    // every weight is a power of two in [1, 8192]; small strata keep all
    assert(strata.exists(_.weight > 1.0), strata) // real sampling happened
    strata.foreach { a =>
      val w = a.weight.toLong
      assert(w >= 1 && w <= 8192 && java.lang.Long.bitCount(w) == 1,
        s"stratum ${a.value}: weight $w")
      if (a.popSize < 128) assert(w == 1L, s"stratum ${a.value}")
    }
    // membership is a pure hash function: rebuilding yields the SAME rows
    val first = spark.table(name).select("o_orderkey").collect()
      .map(_.getLong(0)).sorted.toSeq
    Samplers.createStratifiedDeterministic(
      spark, catalog, "orders", "o_orderstatus", "o_orderkey", 128L)
    val second = spark.table(name).select("o_orderkey").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(first == second)
    // HT-weighted rowcount recovers the population within sampling error
    val est = spark.table(name)
      .agg(org.apache.spark.sql.functions.sum("graft_weight"))
      .collect().head.getDouble(0)
    val n = spark.table("orders").count().toDouble
    assert(math.abs(est - n) / n < 0.15, s"est=$est n=$n")
    // catalog rows: real fraction < 1, strata registered
    val info = catalog.stratifiedSampleFor("orders", "o_orderstatus")
    assert(info.exists(i => i.fraction > 0 && i.fraction < 1))
    assert(catalog.strataFor(name).nonEmpty)
  }

  test("Neyman allocation weights high-variance strata more") {
    val strata = Seq(("lo", 1000L, 1.0), ("hi", 1000L, 100.0))
    val alloc = Samplers.allocateNeyman(strata, 0.1)
    val lo = alloc.find(_.value == "lo").get
    val hi = alloc.find(_.value == "hi").get
    // sigma ratio is 10x -> sample sizes 10x apart
    assert(hi.sampleSize > 5 * lo.sampleSize)
    assert(math.abs((lo.sampleSize + hi.sampleSize) - 200L) <= 2)
  }

  test("Neyman fraction caps at 1.0") {
    val strata = Seq(("a", 10L, 10000.0), ("b", 100000L, 0.0001))
    val alloc = Samplers.allocateNeyman(strata, 0.5)
    alloc.foreach(a => assert(a.fraction <= 1.0))
    assert(alloc.find(_.value == "a").get.fraction == 1.0)
  }

  test("proportional allocation applies the flat fraction") {
    val alloc = Samplers.allocateProportional(
      Seq(("x", 100L, 0.0), ("y", 300L, 0.0)), 0.25)
    assert(alloc.map(_.sampleSize) == Seq(25L, 75L))
    assert(alloc.forall(_.fraction == 0.25))
  }

  test("sample naming round-trips fractions like the reference encoding") {
    for (f <- Seq(0.01, 0.02, 0.05, 0.1, 0.25, 0.3, 0.005)) {
      val name = SampleNaming.uniformName("t", f)
      val parsed = SampleNaming.parse(name)
      assert(parsed.exists { case (t, pf) => t == "t" && math.abs(pf - f) < 1e-9 },
        s"$f -> $name -> $parsed")
    }
    assert(SampleNaming.parse("lineitem").isEmpty)
    assert(SampleNaming.parse("orders__strat_sample_o_orderpriority_0_3")
      .exists(_._2 == 0.3))
  }

  test("composite tuple rendering is collision-free for adversarial values and NULLs out on any NULL component") {
    import org.apache.spark.sql.functions.expr
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // under the old U+0001-joined concat these two DISTINCT tuples
    // rendered identically ("ab" + sep + "c" == "a" + sep +
    // "bc"); to_json keeps them apart
    Seq(("ab", "c"), ("a", "bc"), (null.asInstanceOf[String], "x"))
      .toDF("k1", "k2").createOrReplaceTempView("adv_tuples")
    val keyExpr = graft.plan.SampleRewrite.universeKeyExpr(Seq("k1", "k2"))
    val rows = spark.sql(
      s"SELECT $keyExpr AS key, graft_h60($keyExpr) AS h FROM adv_tuples")
      .collect()
    assert(rows(0).getString(0) != rows(1).getString(0),
      s"adversarial tuples alias: ${rows(0).getString(0)}")
    assert(rows(0).getLong(1) != rows(1).getLong(1))
    // NULL component -> NULL key -> no lottery win, no AGMS counter
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))

    // AGMS over the two adversarial single-tuple tables: aliasing would
    // put both tuples in the SAME signed bucket and report ~100*100;
    // the json rendering keeps them apart (estimate ~0, modulo a 1/B
    // bucket collision which cannot reach the aliasing magnitude)
    Seq.fill(100)(("ab", "c")).toDF("k1", "k2")
      .createOrReplaceTempView("adv_t1")
    Seq.fill(100)(("a", "bc")).toDF("k1", "k2")
      .createOrReplaceTempView("adv_t2")
    graft.sketch.SketchOps.createAgms(spark, catalog, "adv_t1",
      Seq("k1", "k2"), 1024)
    graft.sketch.SketchOps.createAgms(spark, catalog, "adv_t2",
      Seq("k1", "k2"), 1024)
    val s1 = catalog.getSketch("adv_t1", "k1,k2", "agms").get
    val s2 = catalog.getSketch("adv_t2", "k1,k2", "agms").get
    assert(s1.parameters.contains("\"enc\":\"j1\""), s1.parameters)
    val est = graft.sketch.Agms.dotEstimate(s1.data, s2.data).get
    assert(est < 10000L, s"adversarial tuples alias in AGMS: est=$est")
  }
}
