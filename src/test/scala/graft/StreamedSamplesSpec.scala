package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.SampleMaintainers

/** Round-14 sample-maintenance laws: the streamed outlier-indexed
  * sample must hold EXACTLY the rows a batch `createOutlierSample`
  * picks over the same data (fold == rebuild), keep the exact MIN/MAX
  * serves alive over an empty backing view, and skip replayed batch
  * ids; the bottom-k maintainer's first-fold crash window (documented
  * in round 13) must be CLOSED by the provisional rider — a replay
  * from the crash state folds to the same N.
  */
class StreamedSamplesSpec extends SparkSpec {

  private def tmpCatalog(tag: String) = new graft.catalog.MetaCatalog(
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString)

  test("streamed outlier sample: fold == rebuild, exact MIN/MAX over an empty view, replay guard") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val catalog = tmpCatalog("sol")
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("v", expr("cast(id as double)"))
    val stream = MemoryStream[Long]
    val q = SampleMaintainers.maintainOutlierSample(
      shape(stream.toDF().toDF("id")), catalog, "sol_live", "v", "id",
      outlierK = 64, targetRest = 512L, lowK = 32)
    stream.addData(0L until 2000L)
    q.processAllAvailable()
    stream.addData(2000L until 4000L)
    q.processAllAvailable(); q.stop()

    // fold == rebuild: a batch build over the SAME 4000 rows picks the
    // identical row set at the identical weights (membership is the
    // (value, key) total order + the 'ol:' lottery — both pure
    // functions of the data, and w is a pure function of N)
    spark.range(0, 4000).select(col("id"), expr("cast(id as double)").as("v"))
      .createOrReplaceTempView("sol_batch")
    val cat2 = tmpCatalog("sol-batch")
    graft.sample.Samplers.createOutlierSample(spark, cat2, "sol_batch",
      "v", "id", outlierK = 64, targetRest = 512L, lowK = 32)
    def rowSet(path: String) = spark.read.parquet(path)
      .select(col("id"), col("v"), col("graft_weight"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .toSet
    val streamed = rowSet(s"${catalog.samplesDir}/sol_live__outlier2_v")
    val batch = rowSet(s"${cat2.samplesDir}/sol_batch__outlier2_v")
    assert(streamed == batch,
      s"fold != rebuild: only-streamed=${(streamed -- batch).take(5)} " +
        s"only-batch=${(batch -- streamed).take(5)}")
    // strata parity: both tails at their full size, weight 1
    assert(catalog.strataFor("sol_live__outlier2_v").exists(st =>
      st.strataValue == "outlier" && st.sampleSize == 64L && st.weight == 1.0))
    assert(catalog.strataFor("sol_live__outlier2_v").exists(st =>
      st.strataValue == "outlier_low" && st.sampleSize == 32L && st.weight == 1.0))

    // the engine serves the EXACT MIN and MAX from the maintained
    // tails over an EMPTY backing view — the serve the round-13
    // verdict said went stale under ingest
    spark.range(0).select(col("id"), expr("cast(id as double)").as("v"))
      .createOrReplaceTempView("sol_live")
    val engine = new graft.engine.QueryEngine(spark, catalog)
    val r = engine.query(
      "SELECT count(*) AS n, min(v) AS mn, max(v) AS mx FROM sol_live",
      engine.Options(ciColumns = false))
    assert(r.planType == "outlier", s"${r.planType} (${r.reason})")
    val row = r.df.collect()(0)
    assert(row.getDouble(1) == 0.0, s"min=${row.getDouble(1)}")
    assert(row.getDouble(2) == 3999.0, s"max=${row.getDouble(2)}")

    // replay guard: a fresh maintainer restarts at batch id 0 — both
    // already folded, so N and the sample must not move
    val stream2 = MemoryStream[Long]
    val q2 = SampleMaintainers.maintainOutlierSample(
      shape(stream2.toDF().toDF("id")), catalog, "sol_live", "v", "id",
      outlierK = 64, targetRest = 512L, lowK = 32)
    stream2.addData(0L until 500L)
    q2.processAllAvailable(); q2.stop()
    assert(catalog.getSketch("sol_live", "v", "outlier_rider")
      .exists(_.parameters.contains("\"rows\":4000")),
      catalog.getSketch("sol_live", "v", "outlier_rider").map(_.parameters))
    assert(rowSet(s"${catalog.samplesDir}/sol_live__outlier2_v") == streamed,
      "replayed batch id changed the sample")
  }

  test("streamed outlier sample: weight doubling re-filters the stored rest through the tightened lottery") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val catalog = tmpCatalog("sol-grow")
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("v", expr("cast(id as double)"))
    val stream = MemoryStream[Long]
    // targetRest 256: N=1000 -> m=3 -> w=2; N=3000 -> m=11 -> w=8 — the
    // threshold tightens 4x between the folds
    val q = SampleMaintainers.maintainOutlierSample(
      shape(stream.toDF().toDF("id")), catalog, "solg_live", "v", "id",
      outlierK = 16, targetRest = 256L, lowK = 0)
    stream.addData(0L until 1000L)
    q.processAllAvailable()
    val w1 = catalog.strataFor("solg_live__outlier_v")
      .find(_.strataValue == "rest").get.weight
    stream.addData(1000L until 3000L)
    q.processAllAvailable(); q.stop()
    val w2 = catalog.strataFor("solg_live__outlier_v")
      .find(_.strataValue == "rest").get.weight
    assert(w1 == 2.0 && w2 == 8.0, s"w1=$w1 w2=$w2")
    // rebuild parity AFTER the tightening: stored rows that won the
    // loose lottery but not the tight one must be gone
    spark.range(0, 3000).select(col("id"), expr("cast(id as double)").as("v"))
      .createOrReplaceTempView("solg_batch")
    val cat2 = tmpCatalog("solg-batch")
    graft.sample.Samplers.createOutlierSample(spark, cat2, "solg_batch",
      "v", "id", outlierK = 16, targetRest = 256L)
    def rowSet(path: String) = spark.read.parquet(path)
      .select(col("id"), col("graft_weight"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rowSet(s"${catalog.samplesDir}/solg_live__outlier_v") ==
      rowSet(s"${cat2.samplesDir}/solg_batch__outlier_v"))
  }

  test("streamed outlier sample: taking over a BATCH-built sample re-derives the parts exactly") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val catalog = tmpCatalog("sol-takeover")
    // batch build over the first 2000 rows (no maintainer state yet)
    spark.range(0, 2000).select(col("id"), expr("cast(id as double)").as("v"))
      .createOrReplaceTempView("solt_live")
    graft.sample.Samplers.createOutlierSample(spark, catalog, "solt_live",
      "v", "id", outlierK = 32, targetRest = 256L, lowK = 16)
    // a maintainer takes over (no __state parquet: parts are inferred
    // from the sample parquet under the (value, key) total order) and
    // folds 2000 more rows
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("v", expr("cast(id as double)"))
    val stream = MemoryStream[Long]
    val q = SampleMaintainers.maintainOutlierSample(
      shape(stream.toDF().toDF("id")), catalog, "solt_live", "v", "id",
      outlierK = 32, targetRest = 256L, lowK = 16)
    stream.addData(2000L until 4000L)
    q.processAllAvailable(); q.stop()
    // fold == rebuild over the UNION: batch rows seeded the tails and
    // the rest at the build-time threshold; the fold displaced the old
    // high tail (new rows have higher values), demoted it through the
    // lottery, and re-filtered at the new N's threshold
    spark.range(0, 4000).select(col("id"), expr("cast(id as double)").as("v"))
      .createOrReplaceTempView("solt_batch")
    val cat2 = tmpCatalog("solt-batch")
    graft.sample.Samplers.createOutlierSample(spark, cat2, "solt_batch",
      "v", "id", outlierK = 32, targetRest = 256L, lowK = 16)
    def rowSet(path: String) = spark.read.parquet(path)
      .select(col("id"), col("graft_weight"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rowSet(s"${catalog.samplesDir}/solt_live__outlier2_v") ==
      rowSet(s"${cat2.samplesDir}/solt_batch__outlier2_v"),
      "takeover fold != full rebuild")
    assert(catalog.getSketch("solt_live", "v", "outlier_rider")
      .exists(_.parameters.contains("\"rows\":4000")))
  }

  test("bottom-k first-fold crash window is closed: a replay from the provisional-rider state folds to the same N") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val catalog = tmpCatalog("bk-crash")
    val stream = MemoryStream[Long]
    val q = SampleMaintainers.maintainBottomKSample(
      stream.toDF().toDF("rowkey"), catalog, "bkc_live", "rowkey", k = 64)
    stream.addData(0L until 1000L)
    q.processAllAvailable(); q.stop()
    assert(catalog.getSketch("bkc_live", "rowkey", "bottomk_rider")
      .exists(_.parameters.contains("\"rows\":1000")))
    val sample0 = spark.read
      .parquet(s"${catalog.samplesDir}/bkc_live__bottomk_rowkey")
      .select(col("rowkey")).collect().map(_.getLong(0)).toSet
    // simulate the round-13 crash window: the fold died AFTER
    // addSample/putStrata (baseRows=1000 recorded) but BEFORE the
    // final rider stamp — with the round-14 provisional rider, the
    // catalog at that point holds the rider with the UN-ADVANCED
    // rows/last_batch, which is exactly this state:
    catalog.upsertSketch(catalog.SketchInfo("bkc_live", "rowkey",
      "bottomk_rider", Array.emptyByteArray,
      """{"rows":0,"k":64,"last_batch":-1}""",
      System.currentTimeMillis()))
    // the checkpoint re-delivers the same batch (fresh maintainer,
    // batch ids restart at 0): N must fold to 1000, not 2000 — the
    // rider's un-advanced "rows" wins over the crashed fold's
    // baseRows(=1000), which is the law the provisional exists for
    val stream2 = MemoryStream[Long]
    val q2 = SampleMaintainers.maintainBottomKSample(
      stream2.toDF().toDF("rowkey"), catalog, "bkc_live", "rowkey", k = 64)
    stream2.addData(0L until 1000L)
    q2.processAllAvailable(); q2.stop()
    assert(catalog.getSketch("bkc_live", "rowkey", "bottomk_rider")
      .exists(_.parameters.contains("\"rows\":1000")),
      catalog.getSketch("bkc_live", "rowkey", "bottomk_rider").map(_.parameters))
    assert(catalog.statsFor("bkc_live").exists(_.rowCount == 1000L))
    // rows stayed idempotent through the replay
    val sample1 = spark.read
      .parquet(s"${catalog.samplesDir}/bkc_live__bottomk_rowkey")
      .select(col("rowkey")).collect().map(_.getLong(0)).toSet
    assert(sample1 == sample0)
  }

  test("windowed outlier sample: exact MIN/MAX track the live window; rest is the fixed-weight lottery over live rows") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val catalog = tmpCatalog("solw")
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ts", expr("timestamp_micros(id * 1000000)"))
      .withColumn("v", expr("cast(id as double)"))
    val stream = MemoryStream[Long]
    val q = SampleMaintainers.maintainOutlierWindowed(
      shape(stream.toDF().toDF("id")), catalog, "solw_live", "v", "id",
      "ts", windowMicros = 2000L * 1000000L,
      bucketMicros = 100L * 1000000L, outlierK = 32, lowK = 16,
      restWeight = 4L)
    stream.addData(0L until 2000L)
    q.processAllAvailable()
    stream.addData(2000L until 4000L)
    q.processAllAvailable(); q.stop()
    // live window = ids 1900..3999 (2100 rows)
    assert(catalog.statsFor("solw_live").exists(_.rowCount == 2100L),
      catalog.statsFor("solw_live").toString)
    // parts over the LIVE rows: tails are the live extremes (ids
    // 3968..3999 and 1900..1915 — all-time extremes 0..15 EXPIRED),
    // rest = the fixed-threshold lottery winners among the remainder
    graft.functions.GraftFunctions.register(spark)
    val sample = spark.read
      .parquet(s"${catalog.samplesDir}/solw_live__outlier2_v")
      .select(col("id"), col("graft_weight"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hi = (3968L until 4000L).toSet
    val lo = (1900L until 1916L).toSet
    assert(hi.forall(sample.get(_).contains(1.0)), "high tail wrong")
    assert(lo.forall(sample.get(_).contains(1.0)), "low tail wrong")
    val winners = spark.range(1900, 4000).toDF("id")
      .filter(expr("graft_h60(concat('ol:', cast(id as string))) % 8192 < 2048"))
      .collect().map(_.getLong(0)).toSet
    val expectedRest = winners -- hi -- lo
    assert(sample.filter(_._2 == 4.0).keySet == expectedRest,
      "rest != live fixed-threshold winners")
    assert(sample.keySet == hi ++ lo ++ expectedRest)
    // the engine serves the LIVE window's exact MIN and MAX over an
    // empty view: the all-time min (0.0) expired with its bucket
    spark.range(0).select(col("id"), expr("cast(id as double)").as("v"))
      .createOrReplaceTempView("solw_live")
    val engine = new graft.engine.QueryEngine(spark, catalog)
    val r = engine.query(
      "SELECT count(*) AS n, min(v) AS mn, max(v) AS mx FROM solw_live",
      engine.Options(ciColumns = false))
    assert(r.planType == "outlier", s"${r.planType} (${r.reason})")
    val row = r.df.collect()(0)
    assert(row.getDouble(1) == 1900.0,
      s"live-window min=${row.getDouble(1)} (all-time would be 0.0)")
    assert(row.getDouble(2) == 3999.0, s"max=${row.getDouble(2)}")
    // replay guard: a fresh maintainer restarts at batch id 0
    val stream2 = MemoryStream[Long]
    val q2 = SampleMaintainers.maintainOutlierWindowed(
      shape(stream2.toDF().toDF("id")), catalog, "solw_live", "v", "id",
      "ts", windowMicros = 2000L * 1000000L,
      bucketMicros = 100L * 1000000L, outlierK = 32, lowK = 16,
      restWeight = 4L)
    stream2.addData(0L until 500L)
    q2.processAllAvailable(); q2.stop()
    assert(catalog.statsFor("solw_live").exists(_.rowCount == 2100L))
  }

  test("windowed grouped bottom-k: expiry, row-set parity with the batch build over live rows, live grouped serve") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val catalog = tmpCatalog("bkgw")
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ts", expr("timestamp_micros(id * 1000000)"))
      .withColumn("g", expr("cast(id % 3 as int)"))
      .withColumn("v", expr("cast(1 + id % 100 as double)"))
    val stream = MemoryStream[Long]
    val q = SampleMaintainers.maintainBottomKGroupedWindowed(
      shape(stream.toDF().toDF("id")), catalog, "bkgw_live", "g", "id",
      "ts", windowMicros = 2000L * 1000000L,
      bucketMicros = 100L * 1000000L, kPerGroup = 32)
    stream.addData(0L until 2000L)
    q.processAllAvailable()
    stream.addData(2000L until 4000L)
    q.processAllAvailable(); q.stop()
    // live window = ids 1900..3999 (2100 rows, 700 per group)
    assert(catalog.statsFor("bkgw_live").exists(_.rowCount == 2100L),
      catalog.statsFor("bkgw_live").toString)
    // row-set AND weight parity with the batch builder over EXACTLY
    // the live rows (same 'bkg:' hash, same per-group total order;
    // expired rows left the sample and the N_g/k_g weights)
    spark.range(1900, 4000).toDF("id")
      .withColumn("g", expr("cast(id % 3 as int)"))
      .withColumn("v", expr("cast(1 + id % 100 as double)"))
      .createOrReplaceTempView("bkgw_batch")
    val cat2 = tmpCatalog("bkgw-batch")
    val (bname, _) = graft.sample.Samplers.createBottomKGrouped(
      spark, cat2, "bkgw_batch", "g", "id", kPerGroup = 32)
    def rowSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), col("graft_h"), col("graft_gn"), col("graft_gw"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(rowSet(spark.read
      .parquet(s"${catalog.samplesDir}/bkgw_live__bottomkg_g")) ==
      rowSet(spark.table(bname)),
      "windowed grouped sample != batch build over the live rows")
    // the engine serves per-group estimates tracking the LIVE counts
    // over an EMPTY view (count per group = gn exactly: k rows * N_g/k)
    spark.range(0).toDF("id")
      .withColumn("g", expr("cast(id % 3 as int)"))
      .withColumn("v", expr("cast(1 + id % 100 as double)"))
      .createOrReplaceTempView("bkgw_live")
    val engine = new graft.engine.QueryEngine(spark, catalog)
    val r = engine.query(
      "SELECT g, count(*) AS n FROM bkgw_live GROUP BY g ORDER BY g",
      engine.Options(ciColumns = false, maxRelError = 0.2))
    assert(r.planType == "bottomk_grouped", s"${r.planType}: ${r.reason}")
    val ns = r.df.collect().map(_.getDouble(1))
    assert(ns.length == 3)
    ns.foreach(n => assert(math.abs(n - 700.0) / 700.0 < 1e-12,
      s"n=$n (all-time would be ~1333)"))
  }

  test("grouped bottom-k first-fold crash window is closed the same way") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val catalog = tmpCatalog("bkg-crash")
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("g", expr("concat('g', cast(rowkey % 3 as string))"))
    val stream = MemoryStream[Long]
    val q = SampleMaintainers.maintainBottomKGrouped(
      shape(stream.toDF().toDF("rowkey")), catalog, "bkgc_live", "g",
      "rowkey", kPerGroup = 32)
    stream.addData(0L until 900L)
    q.processAllAvailable(); q.stop()
    // crash-window state: provisional rider (empty counts, un-advanced
    // last_batch) + the crashed fold's strata already written
    catalog.upsertSketch(catalog.SketchInfo("bkgc_live", "g",
      "bottomkg_rider", Array.emptyByteArray,
      """{"rows":0,"k":32,"last_batch":-1}""",
      System.currentTimeMillis()))
    val stream2 = MemoryStream[Long]
    val q2 = SampleMaintainers.maintainBottomKGrouped(
      shape(stream2.toDF().toDF("rowkey")), catalog, "bkgc_live", "g",
      "rowkey", kPerGroup = 32)
    stream2.addData(0L until 900L)
    q2.processAllAvailable(); q2.stop()
    // per-group counts folded once, not twice (the strata fallback
    // must NOT fire when the provisional rider is present)
    assert(catalog.statsFor("bkgc_live").exists(_.rowCount == 900L),
      catalog.statsFor("bkgc_live").toString)
    catalog.strataFor("bkgc_live__bottomkg_g").foreach { st =>
      assert(st.popSize == 300L, s"${st.strataValue}: ${st.popSize}")
    }
  }
}
