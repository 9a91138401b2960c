package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.learn.QueryHistory
import graft.plan.{QueryFeatures, StrategyChooser => SC}

/** Truth table for the rule-based chooser — every branch of the
  * reference's rule set (/root/reference/ml_optimizer.py:153-179).
  */
class StrategyChooserSpec extends AnyFunSuite {

  private def f(count: Boolean = false, sum: Boolean = false,
      avg: Boolean = false, distinct: Boolean = false,
      groupBy: Int = 0): QueryFeatures =
    QueryFeatures(
      tables = Seq("t"), aggFunctions = Nil,
      hasCount = count, hasSum = sum, hasAvg = avg, hasMinMax = false,
      hasDistinct = distinct, hasGroupBy = groupBy > 0,
      groupByArity = groupBy, groupByColumns = (1 to groupBy).map("c" + _),
      whereComplexity = 0, hasOrderBy = false, hasLimit = false,
      hasJoin = false, queryLength = 30)

  val tol = 0.05

  test("size <= 1000 -> exact at 0.95") {
    val c = SC.chooseBase(f(count = true), 500, tol)
    assert(c.strategy == SC.Exact && c.confidence == 0.95)
  }
  test("DISTINCT + COUNT -> sketch at 0.90") {
    val c = SC.chooseBase(f(count = true, distinct = true), 50000, tol)
    assert(c.strategy == SC.Sketch && c.confidence == 0.90)
  }
  test("multi-col GROUP BY on >10k rows -> stratified at 0.85") {
    val c = SC.chooseBase(f(sum = true, groupBy = 2), 20000, tol)
    assert(c.strategy == SC.Stratified && c.confidence == 0.85)
  }
  test("single-col GROUP BY -> sketch at 0.80") {
    val c = SC.chooseBase(f(sum = true, groupBy = 1), 20000, tol)
    assert(c.strategy == SC.Sketch && c.confidence == 0.80)
  }
  test(">5000 rows with COUNT/SUM/AVG -> sample at 0.85") {
    val c = SC.chooseBase(f(avg = true), 20000, tol)
    assert(c.strategy == SC.Sample && c.confidence == 0.85)
  }
  test("1000< size <=5000 with COUNT/SUM -> sample at 0.75") {
    val c = SC.chooseBase(f(sum = true), 3000, tol)
    assert(c.strategy == SC.Sample && c.confidence == 0.75)
  }
  test("zero tolerance -> exact fallback") {
    val c = SC.chooseBase(f(count = true), 50000, 0.0)
    assert(c.strategy == SC.Exact && c.confidence == 0.60)
  }

  test("sample fraction tiers by size, halved above 10% tolerance") {
    assert(SC.sampleFraction(SC.Sample, 200000, 0.05).contains(0.01))
    assert(SC.sampleFraction(SC.Sample, 60000, 0.05).contains(0.02))
    assert(SC.sampleFraction(SC.Sample, 10000, 0.05).contains(0.05))
    assert(SC.sampleFraction(SC.Sample, 200000, 0.2).contains(0.005))
    assert(SC.sampleFraction(SC.Sketch, 200000, 0.05).contains(0.3))
    assert(SC.sampleFraction(SC.Exact, 200000, 0.05).isEmpty)
  }

  test("history adjustment prefers a measured-better strategy within error budget") {
    def rec(strategy: String, speedup: Double, err: Double) =
      QueryHistory.Record("p", 50000, strategy, speedup, err,
        speedup, err, 10, tol, System.currentTimeMillis())
    val hist = Seq.fill(10)(rec("sample", 8.0, 0.01))
    val c = SC.choose(f(count = true, distinct = true), 50000, tol, hist)
    // base would be sketch; history says sample is measurably great
    assert(c.strategy == SC.Sample)
    assert(math.abs(c.confidence - 0.9) < 1e-9) // 0.6 + 0.3*(10/10)
  }

  test("history with excessive error is rejected") {
    def rec(err: Double) =
      QueryHistory.Record("p", 50000, "sample", 9.0, err, 9.0, err,
        10, tol, System.currentTimeMillis())
    val c = SC.choose(f(count = true, distinct = true), 50000, tol,
      Seq.fill(5)(rec(0.2))) // 0.2 > 1.2 * 0.05
    assert(c.strategy == SC.Sketch) // base rule wins
  }

  test("durable history: records written in session 1 adjust the choice in session 2 (restart law)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-hist-restart").toString
    val h1 = new graft.learn.QueryHistory(Some(dir))
    (1 to 10).foreach { _ =>
      h1.append(QueryHistory.Record("p", 50000, "sample", 8.0, 0.01,
        8.0, 0.01, 10, tol, System.currentTimeMillis()))
    }
    // a FRESH history over the same workDir — no shared driver memory
    val h2 = new graft.learn.QueryHistory(Some(dir))
    assert(h2.all.size == 10)
    val c = SC.choose(f(count = true, distinct = true), 50000, tol,
      h2.forPattern("p"))
    assert(c.strategy == SC.Sample) // the learned preference survived
    // GET /ml/stats shape survives too
    val stats = h2.learningStats()
    assert(stats("sample")._1 == 10L &&
      math.abs(stats("sample")._2 - 8.0) < 1e-9)
    // appends in session 2 extend, not clobber, the log
    h2.append(QueryHistory.Record("p", 50000, "sample", 8.0, 0.01,
      8.0, 0.01, 10, tol, System.currentTimeMillis()))
    assert(new graft.learn.QueryHistory(Some(dir)).all.size == 11)
  }

  test("durable history: a torn tail record (crash mid-append) drops only itself") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-hist-torn").toString
    val h1 = new graft.learn.QueryHistory(Some(dir))
    (1 to 3).foreach { i =>
      h1.append(QueryHistory.Record(s"p$i", 1000, "exact", 1.0, 0.0,
        1.0, 0.0, 5, tol, i.toLong))
    }
    val log = java.nio.file.Paths.get(dir, "meta", "query_history.bin")
    val bytes = java.nio.file.Files.readAllBytes(log)
    // simulate a crash: half of record 3's bytes never hit disk
    java.nio.file.Files.write(log,
      java.util.Arrays.copyOf(bytes, bytes.length - 7))
    val h2 = new graft.learn.QueryHistory(Some(dir))
    assert(h2.all.map(_.queryPattern) == Seq("p1", "p2"))
  }

  test("durable history: mid-file damage ends the replay at the damage, keeping the prefix (never a boot failure)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-hist-damage").toString
    val h1 = new graft.learn.QueryHistory(Some(dir))
    (1 to 3).foreach { i =>
      h1.append(QueryHistory.Record(s"p$i", 1000, "exact", 1.0, 0.0,
        1.0, 0.0, 5, tol, i.toLong))
    }
    val log = java.nio.file.Paths.get(dir, "meta", "query_history.bin")
    val bytes = java.nio.file.Files.readAllBytes(log)
    // record 1's big-endian length prefix locates record 2's header;
    // smash that header to an absurd length
    val len1 = ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    val off = 4 + len1
    bytes(off) = 0x7f.toByte
    java.nio.file.Files.write(log, bytes)
    val h2 = new graft.learn.QueryHistory(Some(dir))
    assert(h2.all.map(_.queryPattern) == Seq("p1"))
  }

  test("durable advisor misses: pending build advice survives a restart") {
    import graft.learn.SketchAdvisor
    val dir = java.nio.file.Files
      .createTempDirectory("graft-adv-restart").toString
    val a1 = new SketchAdvisor(persistDir = Some(dir))
    val cand = SketchAdvisor.Candidate("orders", "o_custkey", "hll", None)
    val grouped = SketchAdvisor.Candidate("orders", "o_totalprice",
      "hll_grouped", Some("o_orderstatus"))
    a1.observe(Seq(cand)); a1.observe(Seq(cand, grouped))
    a1.flush() // the snapshot is write-throttled; a clean exit flushes
    val a2 = new SketchAdvisor(persistDir = Some(dir))
    assert(a2.snapshot == Map(cand -> 2L, grouped -> 1L))
  }

  test("planner enumerates catalog serves: valid serve wins, over-budget serve falls out, preferExact skips") {
    import graft.plan.Planner
    val catalog = new graft.catalog.MetaCatalog(
      java.nio.file.Files.createTempDirectory("graft-planner").toString)
    val serve = Planner.ServeCandidate("stats", 0.0, "stats blob covers all outputs")
    val p = Planner.plan(f(count = true), catalog, 100000L, tol,
      preferExact = false, serves = Seq(serve))
    assert(p.planType == "sketch" &&
      p.decision == Planner.ReadCatalogServe("stats"), p.toString)
    assert(p.estimatedCost == Planner.CatalogServeCost)
    assert(p.estimatedError == 0.0)
    assert(p.reason.contains("catalog serve (stats)"), p.reason)
    // an over-budget serve is not a valid candidate: exact wins
    val p2 = Planner.plan(f(count = true), catalog, 100000L, 0.01,
      preferExact = false,
      serves = Seq(Planner.ServeCandidate("histogram", 0.05, "1/20 grid")))
    assert(p2.planType == "exact", p2.toString)
    // shapes outside the reference's sampling model (percentiles — no
    // approximable agg) still take a valid serve instead of exact
    val p3 = Planner.plan(f(), catalog, 100000L, tol, preferExact = false,
      serves = Seq(Planner.ServeCandidate("histogram", 0.015, "64-bucket grid")))
    assert(p3.decision == Planner.ReadCatalogServe("histogram"), p3.toString)
    // preferExact skips serve enumeration entirely (engine parity: the
    // serve probes never run under user preference)
    val p4 = Planner.plan(f(count = true), catalog, 100000L, tol,
      preferExact = true, serves = Seq(serve))
    assert(p4.planType == "exact")
  }
}
