package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.MetaCatalog
import graft.engine.QueryEngine
import graft.sample.Samplers

/** Outlier-indexed sampling (Chaudhuri et al. ICDE'01): the heavy tail
  * of a skewed measure is materialized exactly; only the bounded rest is
  * sampled. These tests run on a deliberately skewed fixture (20 rows
  * carry ~99.9% of the sum) where uniform sampling is known-bad — the
  * exact failure mode the technique exists for.
  */
class OutlierSpec extends SparkSpec {

  lazy val catalog = new MetaCatalog(
    Files.createTempDirectory("graft-outlier-spec").toString)
  lazy val engine = new QueryEngine(spark, catalog)

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.functions.GraftFunctions.register(spark)
    // 20k rows; ids 0..19 are the heavy tail (1e6 each), the rest are 1.0.
    // v2 is a second measure with no outlier index over it.
    spark.range(0, 20000).toDF("id")
      .withColumn("v", expr(
        "cast(case when id < 20 then 1000000.0 else 1.0 end as double)"))
      .withColumn("v2", expr("cast(1 + id % 3 as double)"))
      // high-precision ride-along measure: DECIMAL(18,4) routing would
      // round it to oblivion — the decimal-scope law's probe
      .withColumn("v3", expr("cast(id as double) * cast(1e-7 as double)"))
      // low-cardinality group column for the stratified-preemption law
      .withColumn("g", expr("cast(id % 4 as int)"))
      .createOrReplaceTempView("skewed")
  }

  test("outlier sample: heavy tail lands in the exact part, weights are {1, 2^j}") {
    val (name, nOut, _, nRest) = Samplers.createOutlierSample(
      spark, catalog, "skewed", "v", "id", outlierK = 64, targetRest = 1024L)
    assert(name == "skewed__outlier_v")
    assert(nOut == 64L)
    assert(nRest > 0L)
    // all 20 heavy rows are in the weight-1 part
    val heavyInOutlier = spark.table(name)
      .filter(col("id") < 20 && col("graft_weight") === 1.0).count()
    assert(heavyInOutlier == 20L)
    val weights = spark.table(name).select("graft_weight").distinct()
      .collect().map(_.getDouble(0)).sorted
    assert(weights.head == 1.0)
    weights.foreach { w =>
      assert(w >= 1.0 && w == math.rint(w) &&
        java.lang.Long.bitCount(w.toLong) == 1, s"weight $w")
    }
    assert(catalog.outlierSampleFor("skewed", "v").map(_.sampleTable)
      .contains(name))
    // registered under the marker: never visible to the uniform lookup
    assert(catalog.bestUniformSample("skewed").isEmpty)
  }

  test("engine serves SUM/AVG from the outlier sample and beats uniform sampling on the skewed measure") {
    Samplers.createOutlierSample(
      spark, catalog, "skewed", "v", "id", outlierK = 64, targetRest = 1024L)
    val exact = spark.sql("SELECT sum(v) FROM skewed").collect()(0).getDouble(0)
    val r = engine.query(
      "SELECT count(*) AS n_est, sum(v) AS v_est, avg(v) AS v_avg FROM skewed",
      engine.Options(ciColumns = false))
    assert(r.planType == "outlier", s"${r.planType} (${r.reason})")
    val row = r.df.collect()(0)
    val outErr = math.abs(row.getDouble(1) - exact) / exact
    assert(outErr < 0.01, s"outlier-indexed SUM err $outErr")
    // count estimate is the HT total — within a few percent here
    assert(math.abs(row.getDouble(0) - 20000.0) / 20000.0 < 0.1)
    // the same-budget plain systematic lottery (w=16, no outlier index):
    // whether 0, 1, or 2+ heavy rows win, its error dwarfs the indexed one
    val plain = spark.sql(
      "SELECT sum(CASE WHEN graft_h60(concat('sys:', cast(id as string))) % 8192 < 512 " +
        "THEN v * 16 ELSE 0.0 END) FROM skewed").collect()(0).getDouble(0)
    val plainErr = math.abs(plain - exact) / exact
    assert(outErr < plainErr,
      s"outlier err $outErr must beat uniform err $plainErr")
  }

  test("membership and estimates are deterministic across rebuilds") {
    val (_, o1, _, r1) = Samplers.createOutlierSample(
      spark, catalog, "skewed", "v", "id", outlierK = 64, targetRest = 1024L)
    val e1 = engine.query("SELECT sum(v) AS v_est FROM skewed",
      engine.Options(ciColumns = false)).df.collect()(0).getDouble(0)
    val (_, o2, _, r2) = Samplers.createOutlierSample(
      spark, catalog, "skewed", "v", "id", outlierK = 64, targetRest = 1024L)
    val e2 = engine.query("SELECT sum(v) AS v_est FROM skewed",
      engine.Options(ciColumns = false)).df.collect()(0).getDouble(0)
    assert((o1, r1) == (o2, r2))
    assert(e1 == e2)
  }

  test("dispatch is targeted: other measures, distinct/min-max shapes, and stale samples fall through") {
    Samplers.createOutlierSample(
      spark, catalog, "skewed", "v", "id", outlierK = 64, targetRest = 1024L)
    // SUM of a measure with no outlier index: generic path
    val other = engine.query("SELECT sum(v2) AS s2 FROM skewed",
      engine.Options(ciColumns = false))
    assert(other.planType != "outlier", other.planType)
    // MIN alongside the indexed measure: never the outlier sample (the
    // low tail is lottery-sampled — the sample min can miss the true min)
    val mm = engine.query("SELECT count(*) AS n, min(v) AS mn FROM skewed",
      engine.Options(ciColumns = false))
    assert(mm.planType != "outlier", mm.planType)
    // staleness: table stats move -> the freshness guard retires the sample
    catalog.upsertTableStats("skewed", 99999L)
    val stale = engine.query("SELECT sum(v) AS v_est FROM skewed",
      engine.Options(ciColumns = false))
    assert(stale.planType != "outlier", stale.planType)
    // rebuild restores service
    Samplers.createOutlierSample(
      spark, catalog, "skewed", "v", "id", outlierK = 64, targetRest = 1024L)
    val back = engine.query("SELECT sum(v) AS v_est FROM skewed",
      engine.Options(ciColumns = false))
    assert(back.planType == "outlier", s"${back.planType} (${back.reason})")
  }

  test("decimal sum routing is measure-scoped; high-precision ride-alongs stay unbiased") {
    Samplers.createOutlierSample(
      spark, catalog, "skewed", "v", "id", outlierK = 64, targetRest = 1024L)
    val r = engine.query(
      "SELECT sum(v) AS sv, sum(v3) AS s3 FROM skewed",
      engine.Options(ciColumns = false))
    assert(r.planType == "outlier", s"${r.planType} (${r.reason})")
    val exact3 = spark.sql("SELECT sum(v3) FROM skewed").collect()(0).getDouble(0)
    val est3 = r.df.collect()(0).getDouble(1)
    // under DECIMAL(18,4) routing every v3 value (max 2e-3) would round
    // to a grid 5x coarser than itself; the double HT path stays within
    // sampling noise
    assert(math.abs(est3 - exact3) / exact3 < 0.05,
      s"v3 est $est3 exact $exact3")
  }

  test("min/max shapes stay exact on the planner-only route despite the outlier candidate") {
    Samplers.createOutlierSample(
      spark, catalog, "skewed", "v", "id", outlierK = 64, targetRest = 1024L)
    val r = engine.query(
      "SELECT sum(v) AS sv, max(v) AS mv FROM skewed",
      engine.Options(useMl = false, ciColumns = false))
    assert(r.planType == "exact", s"${r.planType} (${r.reason})")
    assert(r.df.collect()(0).getDouble(1) == 1000000.0)
  }

  test("filtered percentiles emit no CI companions (subset effective n is unknowable)") {
    Samplers.createOutlierSample(
      spark, catalog, "skewed", "v", "id", outlierK = 64, targetRest = 1024L)
    val r = engine.query(
      "SELECT percentile(v, 0.5) AS p50, count(*) AS n FROM skewed " +
        "WHERE id % 2 = 0",
      engine.Options(ciColumns = true))
    assert(r.planType == "outlier", s"${r.planType} (${r.reason})")
    assert(!r.df.columns.contains("p50_ci_low"), r.df.columns.toSeq)
  }

  test("build refuses non-unique and nullable keys (the silent-bias preconditions)") {
    spark.range(0, 1000).toDF("id")
      .withColumn("dup", expr("id % 10"))
      .withColumn("nk", expr("case when id % 5 = 0 then null else id end"))
      .withColumn("v", expr("cast(id as double)"))
      .createOrReplaceTempView("badkeys")
    val e1 = intercept[IllegalArgumentException] {
      Samplers.createOutlierSample(spark, catalog, "badkeys", "v", "dup",
        outlierK = 8, targetRest = 64L)
    }
    assert(e1.getMessage.contains("unique"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Samplers.createOutlierSample(spark, catalog, "badkeys", "v", "nk",
        outlierK = 8, targetRest = 64L)
    }
    assert(e2.getMessage.contains("non-null"), e2.getMessage)
  }

  test("detect -> advise -> build -> serve: the measure-skew loop closes") {
    // fresh engine so earlier tests' samples cannot pre-cover the advice
    val cat2 = new MetaCatalog(
      Files.createTempDirectory("graft-outlier-advise").toString)
    val e2 = new QueryEngine(spark, cat2)
    // detect: v is heavy-tailed (top 500 rows hold ~99.9% of the mass),
    // v2 is not (uniform 0..6)
    val skewV = e2.profileMeasureSkew("skewed", "v")
    assert(skewV.topSharePpm >= e2.OutlierSkewPpmThreshold, skewV)
    val skewV2 = e2.profileMeasureSkew("skewed", "v2")
    assert(skewV2.topSharePpm < e2.OutlierSkewPpmThreshold, skewV2)
    // misses: a FILTERED skewed sum runs on the generic sample path
    val sql = "SELECT count(*) AS n, sum(v) AS sv FROM skewed WHERE id % 2 = 0"
    (1 to 3).foreach { _ =>
      val r = e2.query(sql, e2.Options(ciColumns = false))
      assert(r.planType == "sample", s"${r.planType} (${r.reason})")
    }
    // a filtered sum over the UNFLAGGED measure never advises outlier
    (1 to 3).foreach { _ =>
      e2.query("SELECT sum(v2) AS s2 FROM skewed WHERE id % 2 = 0",
        e2.Options(ciColumns = false))
    }
    val advice = e2.adviseSketches()
    val outlierAdvice = advice.filter(_.candidate.sketchType == "outlier")
    assert(outlierAdvice.map(_.candidate.column) == Seq("v"), advice)
    assert(outlierAdvice.head.build.contains("createOutlierSample"))
    // build the recommendation -> the same query flips to the serve
    Samplers.createOutlierSample(
      spark, cat2, "skewed", "v", "id", outlierK = 64, targetRest = 1024L)
    val served = e2.query(sql, e2.Options(ciColumns = false))
    assert(served.planType == "outlier",
      s"${served.planType} (${served.reason})")
    // the filtered estimate stays accurate: all 10 even-id heavy rows
    // read exactly
    val exact = spark.sql(
      "SELECT sum(v) FROM skewed WHERE id % 2 = 0").collect()(0).getDouble(0)
    val est = served.df.collect()(0).getDouble(1)
    assert(math.abs(est - exact) / exact < 0.01, s"est $est exact $exact")
    // the advice retires once covered
    assert(!e2.adviseSketches().exists(_.candidate.sketchType == "outlier"))
  }

  test("percentile CI companions: rank-based bounds bracket the estimate; grouped queries emit none") {
    Samplers.createOutlierSample(
      spark, catalog, "skewed", "v", "id", outlierK = 64, targetRest = 1024L)
    val r = engine.query(
      "SELECT percentile(v, 0.5) AS p50, count(*) AS n_est FROM skewed",
      engine.Options(ciColumns = true))
    assert(r.planType == "outlier", s"${r.planType} (${r.reason})")
    val cols = r.df.columns.toSet
    assert(cols.contains("p50_ci_low") && cols.contains("p50_ci_high"), cols)
    val row = r.df.collect()(0)
    val lo = row.getAs[Double]("p50_ci_low")
    val p = row.getAs[Double]("p50")
    val hi = row.getAs[Double]("p50_ci_high")
    assert(lo <= p && p <= hi, s"$lo <= $p <= $hi")
    // the count's moment companions ride along (the q28 contract)
    assert(cols.contains("n_est_ci_low") && cols.contains("n_est_rel_error"))
    // grouped percentiles keep their point estimates: plan time cannot
    // know a group's effective n
    val g = engine.query(
      "SELECT id % 3 AS b, percentile(v, 0.5) AS p50, count(*) AS n " +
        "FROM skewed GROUP BY id % 3",
      engine.Options(ciColumns = true))
    assert(g.planType == "outlier", s"${g.planType} (${g.reason})")
    assert(!g.df.columns.contains("p50_ci_low"), g.df.columns.toSeq)
  }

  test("expression SUM arguments never take the decimal route, even when they reference only the indexed measure") {
    Samplers.createOutlierSample(
      spark, catalog, "skewed", "v", "id", outlierK = 64, targetRest = 1024L)
    // every term is 1e-5: DECIMAL(18,4) routing would round ALL of them
    // to zero (estimate 0.0, a 100% systematic bias); the double HT path
    // stays within sampling noise. The argument references only `v`, so
    // a referenced-column-set check would wrongly engage the decimal path.
    val exact = spark.sql(
      "SELECT sum(least(v, 1.0) * 1e-5) FROM skewed").collect()(0).getDouble(0)
    val r = engine.query(
      "SELECT sum(least(v, 1.0) * 1e-5) AS sv FROM skewed",
      engine.Options(ciColumns = false))
    assert(r.planType == "outlier", s"${r.planType} (${r.reason})")
    val est = r.df.collect()(0).getDouble(0)
    assert(math.abs(est - exact) / exact < 0.05, s"est $est exact $exact")
    // large expression values: the decimal cast would OVERFLOW (a thrown
    // error under ANSI mode) — the double path executes fine
    val big = engine.query("SELECT sum(v * v * v) AS s3 FROM skewed",
      engine.Options(ciColumns = false))
    assert(big.planType == "outlier", s"${big.planType} (${big.reason})")
    val bigExact =
      spark.sql("SELECT sum(v*v*v) FROM skewed").collect()(0).getDouble(0)
    val bigEst = big.df.collect()(0).getDouble(0)
    assert(math.abs(bigEst - bigExact) / bigExact < 0.01,
      s"est $bigEst exact $bigExact")
  }

  test("MAX serves exactly from the outlier sample; min/filtered/grouped/expression shapes refuse it") {
    Samplers.createOutlierSample(
      spark, catalog, "skewed", "v", "id", outlierK = 64, targetRest = 1024L)
    // the weight-1 part holds the global top-64 rows by v, so max over
    // the sample IS the true max — served exactly alongside the HT sum
    val r = engine.query(
      "SELECT count(*) AS n, sum(v) AS sv, max(v) AS mx FROM skewed",
      engine.Options(ciColumns = false))
    assert(r.planType == "outlier", s"${r.planType} (${r.reason})")
    assert(r.df.collect()(0).getDouble(2) == 1000000.0)
    assert(r.transformations.exists(_.contains("MAX answered exactly")),
      r.transformations)
    // count + max with no sum also routes through the measure lookup
    val r2 = engine.query("SELECT count(*) AS n, max(v) AS mx FROM skewed",
      engine.Options(ciColumns = false))
    assert(r2.planType == "outlier", s"${r2.planType} (${r2.reason})")
    assert(r2.df.collect()(0).getDouble(1) == 1000000.0)
    // refusals — each shape breaks the exactness argument:
    // min: the sample's low tail is lottery-sampled
    val rMin = engine.query("SELECT sum(v) AS sv, min(v) AS mn FROM skewed",
      engine.Options(ciColumns = false))
    assert(rMin.planType != "outlier", rMin.planType)
    // filter: it can eliminate the whole weight-1 tail
    val rFil = engine.query(
      "SELECT sum(v) AS sv, max(v) AS mx FROM skewed WHERE id % 2 = 0",
      engine.Options(ciColumns = false))
    assert(rFil.planType != "outlier", rFil.planType)
    // group: a group can hold no tail row
    val rGrp = engine.query(
      "SELECT g, sum(v) AS sv, max(v) AS mx FROM skewed GROUP BY g",
      engine.Options(ciColumns = false))
    assert(rGrp.planType != "outlier", rGrp.planType)
    // expression argument: need not attain its maximum on the v-tail
    val rExp = engine.query(
      "SELECT sum(v) AS sv, max(0.0 - v) AS mx FROM skewed",
      engine.Options(ciColumns = false))
    assert(rExp.planType != "outlier", rExp.planType)
  }

  test("grouped queries prefer a dedicated stratified sample over the outlier sample (representation guard)") {
    val cat3 = new MetaCatalog(
      Files.createTempDirectory("graft-outlier-strat").toString)
    val e3 = new QueryEngine(spark, cat3)
    Samplers.createOutlierSample(
      spark, cat3, "skewed", "v", "id", outlierK = 64, targetRest = 1024L)
    val sql = "SELECT g, count(*) AS n, sum(v) AS sv FROM skewed GROUP BY g"
    // without a stratified sample the outlier sample serves grouped shapes
    val before = e3.query(sql, e3.Options(ciColumns = false))
    assert(before.planType == "outlier",
      s"${before.planType} (${before.reason})")
    // a fresh stratified sample keyed on the group-by column preempts it:
    // the outlier sample's rest lottery carries no per-group guarantee
    Samplers.createStratifiedDeterministic(
      spark, cat3, "skewed", "g", "id", targetPerStratum = 256L)
    val after = e3.query(sql, e3.Options(ciColumns = false))
    assert(after.planType == "stratified",
      s"${after.planType} (${after.reason})")
    // every group is represented — the guarantee the preemption exists for
    assert(after.df.select("g").distinct().count() == 4L)
    // ungrouped sums over the measure keep the outlier route
    val ung = e3.query("SELECT sum(v) AS sv FROM skewed",
      e3.Options(ciColumns = false))
    assert(ung.planType == "outlier", s"${ung.planType} (${ung.reason})")
  }

  test("two-sided build (lowK > 0) serves exact MIN alongside exact MAX") {
    val cat4 = new MetaCatalog(
      Files.createTempDirectory("graft-outlier-2s").toString)
    val e4 = new QueryEngine(spark, cat4)
    // index on v3 (unique values id*1e-7): the true min row (id=0) is
    // ONE row out of 20k — a lottery-sampled low tail would miss it
    // ~94% of the time; the two-sided build holds it at weight 1
    Samplers.createOutlierSample(spark, cat4, "skewed", "v3", "id",
      outlierK = 64, targetRest = 1024L, lowK = 64)
    assert(cat4.strataFor("skewed__outlier2_v3")
      .exists(st => st.strataValue == "outlier_low" && st.sampleSize == 64L))
    val r = e4.query(
      "SELECT count(*) AS n, min(v3) AS mn, max(v3) AS mx FROM skewed",
      e4.Options(ciColumns = false))
    assert(r.planType == "outlier", s"${r.planType} (${r.reason})")
    val row = r.df.collect()(0)
    assert(row.getDouble(1) == 0.0, s"min=${row.getDouble(1)}")
    assert(row.getDouble(2) == 19999 * 1e-7, s"max=${row.getDouble(2)}")
    assert(r.transformations.exists(_.contains("MIN answered exactly")),
      r.transformations)
    // the q171 guards apply to MIN too: filtered and grouped refuse
    val rf = e4.query("SELECT min(v3) AS mn FROM skewed WHERE id % 2 = 0",
      e4.Options(ciColumns = false))
    assert(rf.planType != "outlier", rf.planType)
    val rg = e4.query("SELECT g, min(v3) AS mn FROM skewed GROUP BY g",
      e4.Options(ciColumns = false))
    assert(rg.planType != "outlier", rg.planType)
    // and a HIGH-TAIL-ONLY sample still refuses MIN (the existing law)
    val cat5 = new MetaCatalog(
      Files.createTempDirectory("graft-outlier-1s").toString)
    val e5 = new QueryEngine(spark, cat5)
    Samplers.createOutlierSample(spark, cat5, "skewed", "v3", "id",
      outlierK = 64, targetRest = 1024L)
    val r1s = e5.query("SELECT count(*) AS n, min(v3) AS mn FROM skewed",
      e5.Options(ciColumns = false))
    assert(r1s.planType != "outlier", s"${r1s.planType} (${r1s.reason})")
  }

  test("percentiles ride the integer-weight frequency rewrite on the outlier sample") {
    Samplers.createOutlierSample(
      spark, catalog, "skewed", "v", "id", outlierK = 64, targetRest = 1024L)
    val r = engine.query(
      "SELECT count(*) AS n_est, percentile(v, 0.5) AS p50 FROM skewed",
      engine.Options(ciColumns = false))
    assert(r.planType == "outlier", s"${r.planType} (${r.reason})")
    // the true median is 1.0 (heavy tail is 0.1% of rows); the weighted
    // sample must agree exactly — every rest row carries value 1.0
    assert(r.df.collect()(0).getDouble(1) == 1.0)
  }
}
