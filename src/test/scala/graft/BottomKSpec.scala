package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.MetaCatalog
import graft.engine.QueryEngine
import graft.sample.Samplers

/** Bottom-k (fixed-size order-statistic) sampling: the k rows with the
  * smallest keyed h60 hash. Laws under test: the sample is a pure
  * function of the data (deterministic, exactly the k smallest), the
  * engine serves COUNT/SUM/AVG from it with the N/k post-scale and
  * refuses the shapes a fixed-size row sample cannot answer
  * (distinct, min/max), staleness falls through, a cheaper materialized
  * uniform sample wins the cost race, and the STREAMING maintainer
  * folds micro-batches to the identical row set the batch builder
  * picks (merge law: bottom-k of a union == fold of bottom-k's).
  */
class BottomKSpec extends SparkSpec {

  lazy val catalog = new MetaCatalog(
    Files.createTempDirectory("graft-bk-spec").toString)
  lazy val engine = new QueryEngine(spark, catalog)

  private val K = 512

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.functions.GraftFunctions.register(spark)
    spark.range(0, 20000).toDF("id")
      .withColumn("v", expr("cast(1 + id % 100 as double)"))
      .withColumn("g", expr("cast(id % 4 as int)"))
      // high-precision ride-along: DECIMAL(18,4) routing would round it
      // to oblivion — the decimal-scope law's probe (the OutlierSpec v3)
      .withColumn("v3", expr("cast(id as double) * cast(1e-7 as double)"))
      .createOrReplaceTempView("bk_base")
  }

  test("decimal routing is proof-scoped: high-precision columns stay unbiased") {
    Samplers.createBottomK(spark, catalog, "bk_base", "id", K)
    val r = engine.query("SELECT sum(v3) AS s3 FROM bk_base",
      engine.Options(ciColumns = false))
    assert(r.planType == "bottomk", s"${r.planType}: ${r.reason}")
    val est = r.df.collect().head.getDouble(0)
    val exact = spark.sql("SELECT sum(v3) FROM bk_base")
      .collect().head.getDouble(0)
    // under the old blanket decimal gate every v3 value would round to
    // 0.0000 and the estimate would be exactly 0
    assert(math.abs(est - exact) / exact < 0.25, s"est=$est exact=$exact")
  }

  test("maintainers CONTINUE a batch-built sample's counts instead of resetting them") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    // plain: batch build over 6000 rows, then stream 2000 more
    val ccat = new MetaCatalog(
      Files.createTempDirectory("graft-bk-cont").toString)
    spark.range(0, 6000).toDF("id")
      .withColumn("v", expr("cast(1 + id % 100 as double)"))
      .createOrReplaceTempView("bk_cont")
    Samplers.createBottomK(spark, ccat, "bk_cont", "id", K)
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val rows = stream.toDF().toDF("id")
      .withColumn("v", expr("cast(1 + id % 100 as double)"))
    val q = graft.streaming.SampleMaintainers.maintainBottomKSample(
      rows, ccat, "bk_cont", "id", k = K)
    stream.addData((6000L until 8000L).toSeq)
    q.processAllAvailable(); q.stop()
    assert(ccat.statsFor("bk_cont").exists(_.rowCount == 8000L),
      ccat.statsFor("bk_cont").toString)
    val ceng = new QueryEngine(spark, ccat)
    val r = ceng.query("SELECT count(*) AS n FROM bk_cont",
      ceng.Options(ciColumns = false))
    assert(r.planType == "bottomk", s"${r.planType}: ${r.reason}")
    val n = r.df.collect().head.getDouble(0)
    assert(math.abs(n - 8000.0) / 8000.0 < 1e-12, s"n=$n")
    // grouped: batch build, then a fold whose batch holds only ONE of
    // the groups — the other groups' counts must persist from the
    // builder-seeded rider, not crash or reset
    val gcat = new MetaCatalog(
      Files.createTempDirectory("graft-bkg-cont").toString)
    spark.range(0, 3000).toDF("id")
      .withColumn("g", expr("cast(id % 3 as int)"))
      .withColumn("v", expr("cast(1 + id % 100 as double)"))
      .createOrReplaceTempView("bkg_cont")
    Samplers.createBottomKGrouped(spark, gcat, "bkg_cont", "g", "id", 64)
    val stream2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val rows2 = stream2.toDF().toDF("id")
      .withColumn("g", expr("cast(0 as int)"))
      .withColumn("v", expr("cast(1 + id % 100 as double)"))
    val q2 = graft.streaming.SampleMaintainers.maintainBottomKGrouped(
      rows2, gcat, "bkg_cont", "g", "id", kPerGroup = 64)
    stream2.addData((3000L until 3300L).toSeq)
    q2.processAllAvailable(); q2.stop()
    val pops = gcat.strataFor("bkg_cont__bottomkg_g")
      .map(st => st.strataValue -> st.popSize).toMap
    assert(pops == Map("0" -> 1300L, "1" -> 1000L, "2" -> 1000L), pops.toString)
  }

  test("build picks exactly the k hash-smallest rows, deterministically") {
    val (name, achieved) =
      Samplers.createBottomK(spark, catalog, "bk_base", "id", K)
    assert(achieved == K)
    val got = spark.table(name).select(col("id")).collect()
      .map(_.getLong(0)).toSet
    // re-derive the expected membership independently: rank by (h, id)
    val expected = spark.table("bk_base")
      .select(col("id"),
        expr("graft_h60(concat('bk:', cast(id as string)))").as("h"))
      .orderBy(col("h").asc, col("id").asc).limit(K)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected)
    // rebuild lands on the identical set (no RNG anywhere)
    val (name2, _) = Samplers.createBottomK(spark, catalog, "bk_base", "id", K)
    val again = spark.table(name2).select(col("id")).collect()
      .map(_.getLong(0)).toSet
    assert(again == got)
  }

  test("engine serves COUNT/SUM/AVG with the N/k post-scale; count is N up to one rounding") {
    Samplers.createBottomK(spark, catalog, "bk_base", "id", K)
    val r = engine.query(
      "SELECT count(*) AS n_est, sum(v) AS s_est, avg(v) AS a_est FROM bk_base",
      engine.Options(ciColumns = false))
    assert(r.planType == "bottomk", s"${r.planType}: ${r.reason}")
    val row = r.df.collect().head
    val n = row.getDouble(0); val sEst = row.getDouble(1); val aEst = row.getDouble(2)
    // unfiltered count estimate is (N/k)·k — N up to float rounding
    assert(math.abs(n - 20000.0) / 20000.0 < 1e-12, s"n=$n")
    val exact = spark.sql("SELECT sum(v), avg(v) FROM bk_base").collect().head
    assert(math.abs(sEst - exact.getDouble(0)) / exact.getDouble(0) < 0.15,
      s"sum est $sEst vs ${exact.getDouble(0)}")
    assert(math.abs(aEst - exact.getDouble(1)) / exact.getDouble(1) < 0.15,
      s"avg est $aEst vs ${exact.getDouble(1)}")
    // grouped + filtered dashboard shape serves too
    val rg = engine.query(
      "SELECT g, count(*) AS n_est, sum(v) AS s_est FROM bk_base " +
        "WHERE v > 10 GROUP BY g", engine.Options(ciColumns = false))
    assert(rg.planType == "bottomk", s"${rg.planType}: ${rg.reason}")
    assert(rg.df.collect().length == 4)
  }

  test("distinct and min/max shapes refuse; stale samples fall through") {
    Samplers.createBottomK(spark, catalog, "bk_base", "id", K)
    val rd = engine.query("SELECT count(DISTINCT g) AS nd FROM bk_base")
    assert(rd.planType != "bottomk", rd.reason)
    val rm = engine.query("SELECT max(v) AS mx, count(*) AS n FROM bk_base")
    assert(rm.planType != "bottomk", rm.reason)
    // stale: the base table "grew" after the build
    catalog.upsertTableStats("bk_base", 30000L)
    val rs = engine.query("SELECT count(*) AS n FROM bk_base",
      engine.Options(ciColumns = false))
    assert(rs.planType != "bottomk", rs.reason)
    catalog.upsertTableStats("bk_base", 20000L) // restore freshness
  }

  test("a cheaper materialized uniform sample wins the cost race") {
    val cat2 = new MetaCatalog(
      Files.createTempDirectory("graft-bk-race").toString)
    val eng2 = new QueryEngine(spark, cat2)
    Samplers.createBottomK(spark, cat2, "bk_base", "id", K)
    // 2.5% of 20k = 500 expected rows < k=512 — strictly cheaper to
    // scan, and √(1/500) ≈ 0.045 still meets the default 5% budget
    Samplers.createUniform(spark, cat2, "bk_base", 0.025)
    val r = eng2.query("SELECT count(*) AS n FROM bk_base",
      eng2.Options(ciColumns = false))
    assert(r.planType == "sample", s"${r.planType}: ${r.reason}")
  }

  test("percentile CI companions on the bottom-k serve: bounds bracket; filtered shapes refuse") {
    Samplers.createBottomK(spark, catalog, "bk_base", "id", K)
    val r = engine.query(
      "SELECT percentile(v, 0.5) AS p50, count(*) AS n FROM bk_base")
    assert(r.planType == "bottomk", s"${r.planType}: ${r.reason}")
    val row = r.df.collect().head
    val lo = row.getAs[Double]("p50_ci_low")
    val p = row.getAs[Double]("p50")
    val hi = row.getAs[Double]("p50_ci_high")
    assert(lo <= p && p <= hi, s"$lo <= $p <= $hi")
    assert(lo < hi)
    // a filter makes the subset's effective n unknowable at plan time
    val rf = engine.query(
      "SELECT percentile(v, 0.5) AS p50, count(*) AS n FROM bk_base " +
        "WHERE v > 10")
    assert(rf.planType == "bottomk", rf.reason)
    assert(!rf.df.columns.contains("p50_ci_low"), rf.df.columns.mkString(","))
  }

  test("advisor loop: repeated inline sampling surfaces the bottom-k build; building retires it") {
    val acat = new MetaCatalog(
      Files.createTempDirectory("graft-bk-advise").toString)
    val aeng = new QueryEngine(spark, acat)
    val sql = "SELECT count(*) AS n, sum(v) AS s FROM bk_base"
    (1 to 3).foreach(_ => aeng.query(sql, aeng.Options(ciColumns = false)))
    val advice = aeng.adviseSketches()
    val hit = advice.find(a => a.candidate.sketchType == "bottomk" &&
      a.candidate.table == "bk_base")
      .getOrElse(fail(s"no bottomk advice: $advice"))
    assert(hit.misses >= 3)
    assert(hit.build.contains("createBottomK"))
    // the grouped shape advises the grouped form keyed on its group col
    val gsql = "SELECT g, count(*) AS n FROM bk_base GROUP BY g"
    (1 to 3).foreach(_ => aeng.query(gsql, aeng.Options(ciColumns = false)))
    val ghit = aeng.adviseSketches().find(a =>
      a.candidate.sketchType == "bottomk_grouped" &&
        a.candidate.groupBy.contains("g"))
      .getOrElse(fail("no grouped bottomk advice"))
    assert(ghit.build.contains("createBottomKGrouped"))
    // running the builds retires both and the queries flip to serves
    Samplers.createBottomK(spark, acat, "bk_base", "id", K)
    Samplers.createBottomKGrouped(spark, acat, "bk_base", "g", "id", K)
    val after = aeng.adviseSketches()
    assert(!after.exists(_.candidate.sketchType.startsWith("bottomk")),
      after.toString)
    assert(aeng.query(sql, aeng.Options(ciColumns = false))
      .planType == "bottomk")
    assert(aeng.query(gsql, aeng.Options(ciColumns = false))
      .planType == "bottomk_grouped")
  }

  test("grouped bottom-k: every group keeps its k hash-smallest rows; serve scales per group") {
    val gcat = new MetaCatalog(
      Files.createTempDirectory("graft-bkg-spec").toString)
    val geng = new QueryEngine(spark, gcat)
    // skewed groups: group 0 holds 19.9k rows, groups 1..3 hold ~33
    // rows each (below k, so they are COMPLETE) — exactly the shape
    // where plain bottom-k starves the rare groups
    spark.range(0, 20000).toDF("id")
      .withColumn("g", expr("cast(case when id < 19900 then 0 else 1 + id % 3 end as int)"))
      .withColumn("v", expr("cast(1 + id % 100 as double)"))
      .createOrReplaceTempView("bkg_base")
    val (name, achieved) = Samplers.createBottomKGrouped(
      spark, gcat, "bkg_base", "g", "id", kPerGroup = 128)
    // group 0 subsamples to 128; rare groups are complete
    val sizes = spark.table(name).groupBy(col("g")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes(0) == 128)
    assert(sizes.keySet == Set(0, 1, 2, 3))
    assert(achieved == sizes.values.sum)
    // membership per group re-derived independently
    val expected = spark.table("bkg_base")
      .withColumn("h", expr("graft_h60(concat('bkg:', cast(id as string)))"))
      .withColumn("rn", expr(
        "row_number() over (partition by g order by h asc, id asc)"))
      .filter(col("rn") <= 128).select(col("id")).collect()
      .map(_.getLong(0)).toSet
    val got = spark.table(name).select(col("id")).collect()
      .map(_.getLong(0)).toSet
    assert(got == expected)
    // grouped serve: every group present, rare groups EXACT (w=1);
    // the subsampled group's bound √(1/128) ≈ 0.088 needs a budget
    // above the 0.05 default
    val r = geng.query(
      "SELECT g, count(*) AS n_est, sum(v) AS s_est FROM bkg_base " +
        "GROUP BY g ORDER BY g",
      geng.Options(ciColumns = false, maxRelError = 0.1))
    assert(r.planType == "bottomk_grouped", s"${r.planType}: ${r.reason}")
    val rows = r.df.collect().map(x => (x.getInt(0), x.getDouble(1), x.getDouble(2)))
    assert(rows.length == 4)
    val exact = spark.sql(
      "SELECT g, count(*), sum(v) FROM bkg_base GROUP BY g ORDER BY g")
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getDouble(2)))
    rows.zip(exact).foreach { case ((g, n, sv), (ge, ne, se)) =>
      assert(g == ge)
      if (g != 0) { // complete groups answer exactly
        assert(math.abs(n - ne) < 1e-9, s"g=$g n=$n vs $ne")
        assert(math.abs(sv - se) / se < 1e-12, s"g=$g s=$sv vs $se")
      } else {
        assert(math.abs(n - ne) / ne < 1e-12, s"g=$g n=$n vs $ne")
        assert(math.abs(sv - se) / se < 0.3, s"g=$g s=$sv vs $se")
      }
    }
    // a GROUP BY that does not contain the sample's group column
    // refuses the grouped serve
    spark.range(0, 20000).toDF("id") // keep view untouched; query other col
    val r2 = geng.query(
      "SELECT v, count(*) AS n FROM bkg_base GROUP BY v",
      geng.Options(ciColumns = false))
    assert(r2.planType != "bottomk_grouped", r2.reason)
  }

  test("grouped streaming maintainer folds to the batch builder's row set; weights track ingest") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val scat = new MetaCatalog(
      Files.createTempDirectory("graft-bkg-stream").toString)
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val rows = stream.toDF().toDF("id")
      .withColumn("g", expr("cast(id % 3 as int)"))
      .withColumn("v", expr("cast(1 + id % 100 as double)"))
    val q = graft.streaming.SampleMaintainers.maintainBottomKGrouped(
      rows, scat, "bkg_live", "g", "id", kPerGroup = 64)
    (0L until 3000L).grouped(1000).foreach { batch =>
      stream.addData(batch.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    spark.range(0, 3000).toDF("id")
      .withColumn("g", expr("cast(id % 3 as int)"))
      .withColumn("v", expr("cast(1 + id % 100 as double)"))
      .createOrReplaceTempView("bkg_live_all")
    val bcat = new MetaCatalog(
      Files.createTempDirectory("graft-bkg-batch").toString)
    val (bname, _) = Samplers.createBottomKGrouped(
      spark, bcat, "bkg_live_all", "g", "id", kPerGroup = 64)
    def rowSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), col("graft_h"), col("graft_gn"), col("graft_gw"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val streamed = rowSet(
      spark.read.parquet(s"${scat.samplesDir}/bkg_live__bottomkg_g"))
    val batched = rowSet(spark.table(bname))
    assert(streamed == batched) // rows AND live gn/gw values
    // the maintained sample serves grouped estimates over an empty view
    spark.range(0).toDF("id")
      .withColumn("g", expr("cast(id % 3 as int)"))
      .withColumn("v", expr("cast(1 + id % 100 as double)"))
      .createOrReplaceTempView("bkg_live")
    val seng = new QueryEngine(spark, scat)
    val r = seng.query(
      "SELECT g, count(*) AS n FROM bkg_live GROUP BY g ORDER BY g",
      seng.Options(ciColumns = false, maxRelError = 0.15))
    assert(r.planType == "bottomk_grouped", s"${r.planType}: ${r.reason}")
    val ns = r.df.collect().map(x => x.getDouble(1))
    assert(ns.length == 3)
    ns.foreach(n => assert(math.abs(n - 1000.0) / 1000.0 < 1e-12, s"n=$n"))
  }

  test("streaming maintainer folds to the batch builder's exact row set; serve tracks N") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val scat = new MetaCatalog(
      Files.createTempDirectory("graft-bk-stream").toString)
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val rows = stream.toDF().toDF("id")
      .withColumn("v", expr("cast(1 + id % 100 as double)"))
    val q = graft.streaming.SampleMaintainers.maintainBottomKSample(
      rows, scat, "bk_live", "id", k = K)
    (0L until 6000L).grouped(2000).foreach { g =>
      stream.addData(g.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    // batch-build the same rows under a different catalog: identical set
    spark.range(0, 6000).toDF("id")
      .withColumn("v", expr("cast(1 + id % 100 as double)"))
      .createOrReplaceTempView("bk_live_all")
    val bcat = new MetaCatalog(
      Files.createTempDirectory("graft-bk-batch").toString)
    val (bname, _) = Samplers.createBottomK(spark, bcat, "bk_live_all", "id", K)
    val streamed = spark.read.parquet(s"${scat.samplesDir}/bk_live__bottomk_id")
      .select(col("id"), col("graft_h")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batched = spark.table(bname)
      .select(col("id"), col("graft_h")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batched)
    // the catalog tracked N across batches; the engine serves from the
    // maintained sample with the live N/k scale — the backing view is
    // EMPTY, so any scan would answer 0
    assert(scat.statsFor("bk_live").exists(_.rowCount == 6000L))
    spark.range(0).toDF("id")
      .withColumn("v", expr("cast(1 + id % 100 as double)"))
      .createOrReplaceTempView("bk_live")
    val seng = new QueryEngine(spark, scat)
    val r = seng.query("SELECT count(*) AS n FROM bk_live",
      seng.Options(ciColumns = false))
    assert(r.planType == "bottomk", s"${r.planType}: ${r.reason}")
    val n = r.df.collect().head.getDouble(0)
    assert(math.abs(n - 6000.0) / 6000.0 < 1e-12, s"n=$n")
  }

  test("grouped bottom-k percentile CIs: capped groups bracket, complete groups are zero-width") {
    val ccat = new MetaCatalog(
      Files.createTempDirectory("graft-bkg-ci").toString)
    // group 0: 4000 rows (capped at 64 — subsampled); group 1: 40 rows
    // (complete — fully contained in the sample)
    spark.range(0, 4040).toDF("id")
      .withColumn("g", expr("cast(case when id < 4000 then 0 else 1 end as int)"))
      .withColumn("v", expr("cast(1 + id % 1000 as double)"))
      .createOrReplaceTempView("bkg_ci")
    Samplers.createBottomKGrouped(spark, ccat, "bkg_ci", "g", "id", 64)
    val ceng = new QueryEngine(spark, ccat)
    val r = ceng.query(
      "SELECT g, count(*) AS n, percentile(v, 0.5) AS p50 FROM bkg_ci " +
        "GROUP BY g ORDER BY g",
      ceng.Options(ciColumns = true, maxRelError = 0.15))
    assert(r.planType == "bottomk_grouped", s"${r.planType}: ${r.reason}")
    val rows = r.df.collect()
    assert(rows.length == 2)
    val capped = rows(0)   // g = 0
    val complete = rows(1) // g = 1
    def at(row: org.apache.spark.sql.Row, name: String): Double =
      row.getDouble(row.fieldIndex(name))
    // capped group: bounds bracket the point estimate, strictly wider
    assert(at(capped, "p50_ci_low") <= at(capped, "p50") &&
      at(capped, "p50") <= at(capped, "p50_ci_high"), capped.toString)
    assert(at(capped, "p50_ci_low") < at(capped, "p50_ci_high"),
      capped.toString)
    // complete group: exact quantile, zero-width bounds
    val exactP50 = spark.sql(
      "SELECT percentile(v, 0.5) FROM bkg_ci WHERE g = 1")
      .collect()(0).getDouble(0)
    assert(at(complete, "p50") == exactP50, complete.toString)
    assert(at(complete, "p50_ci_low") == exactP50 &&
      at(complete, "p50_ci_high") == exactP50, complete.toString)
    // filtered shapes refuse the CI companions (per-group post-filter
    // counts are unknowable at plan time)
    val rf = ceng.query(
      "SELECT g, count(*) AS n, percentile(v, 0.5) AS p50 FROM bkg_ci " +
        "WHERE v > 10 GROUP BY g ORDER BY g",
      ceng.Options(ciColumns = true, maxRelError = 0.15))
    assert(rf.planType == "bottomk_grouped", s"${rf.planType}: ${rf.reason}")
    assert(!rf.df.columns.contains("p50_ci_low"), rf.df.columns.mkString(","))
  }

  test("windowed maintainer expires buckets: sample and N track the live window") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val scat = new MetaCatalog(
      Files.createTempDirectory("graft-bkw-stream").toString)
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ts", expr("timestamp_micros(id * 1000000)"))
      .withColumn("v", expr("cast(1 + id % 100 as double)"))
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val q = graft.streaming.SampleMaintainers.maintainBottomKWindowed(
      shape(stream.toDF().toDF("id")), scat, "bkw_live", "id", "ts",
      windowMicros = 2000L * 1000000L, bucketMicros = 100L * 1000000L,
      k = 64)
    // two folds, one row per second of event time: 0..1999s then
    // 2000..3999s — after the second fold the live window is the last
    // 2000 s at 100 s bucket granularity: buckets b with
    // (b+1)*100s > 3999s - 2000s, i.e. b >= 19 → ids 1900..3999
    // (2100 live rows — above the small-table exact rule)
    stream.addData((0L until 2000L).toSeq)
    q.processAllAvailable()
    stream.addData((2000L until 4000L).toSeq)
    q.processAllAvailable(); q.stop()
    // batch twin over ALL ingested rows: identical membership AND N
    val twin = graft.streaming.SampleMaintainers.windowedBottomK(
      shape(spark.range(0, 4000).toDF("id")), "id", "ts",
      windowMicros = 2000L * 1000000L, bucketMicros = 100L * 1000000L,
      k = 64).collect()
    val twinIds = twin.map(_.getLong(0)).toSet
    val nLive = twin.head.getLong(1)
    val folded = spark.read
      .parquet(s"${scat.samplesDir}/bkw_live__bottomkw_id")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(folded == twinIds, s"folded=${folded.size} twin=${twinIds.size}")
    assert(scat.statsFor("bkw_live").exists(_.rowCount == nLive),
      s"${scat.statsFor("bkw_live")} vs live $nLive")
    // expired rows left the sample: everything in it is inside the
    // live window (ids ARE seconds here)
    val maxTs = 3999L
    folded.foreach(id => assert(
      (id / 100L + 1L) * 100L * 1000000L > (maxTs - 2000L) * 1000000L,
      s"expired id $id still in sample"))
    // the engine serves the LIVE window's count from the maintained
    // sample (backing view empty — a scan would answer 0)
    spark.range(0).toDF("id").withColumn("v", lit(1.0))
      .createOrReplaceTempView("bkw_live")
    val seng = new QueryEngine(spark, scat)
    val r = seng.query("SELECT count(*) AS n FROM bkw_live",
      seng.Options(ciColumns = false, maxRelError = 0.2))
    assert(r.planType == "bottomk", s"${r.planType}: ${r.reason}")
    val n = r.df.collect().head.getDouble(0)
    assert(math.abs(n - nLive.toDouble) / nLive < 1e-12, s"n=$n vs $nLive")
  }

  test("grouped serve refuses when per-group representation is too thin") {
    Samplers.createBottomK(spark, catalog, "bk_base", "id", K)
    // ~512 sample rows over 20000 distinct id groups: 1 row per present
    // group and most groups vanished — per-group estimates are noise
    val r = engine.query(
      "SELECT id, count(*) AS n FROM bk_base GROUP BY id",
      engine.Options(ciColumns = false))
    assert(r.planType != "bottomk", s"${r.planType}: ${r.reason}")
    // the low-cardinality dashboard shape (4 groups, ~128 rows each)
    // still serves — the gate is per-group presence, not a blanket ban
    val ok = engine.query(
      "SELECT g, count(*) AS n FROM bk_base GROUP BY g",
      engine.Options(ciColumns = false))
    assert(ok.planType == "bottomk", s"${ok.planType}: ${ok.reason}")
  }

  test("grouped serve refuses when a stored HLL shows vanished groups") {
    val hcat = new MetaCatalog(
      Files.createTempDirectory("graft-bk-hll").toString)
    Samplers.createBottomK(spark, hcat, "bk_base", "id", K)
    // forge the base-table truth: an HLL claiming ~1000 distinct g
    // values while the sample shows 4 — whole groups are missing and
    // only the sketch can tell
    val h = new graft.sketch.Hll(12)
    (0 until 1000).foreach(i => h.addString(s"g$i"))
    hcat.upsertSketch(hcat.SketchInfo("bk_base", "g", "hyperloglog",
      h.serialize, """{"b":12}""", System.currentTimeMillis()))
    val heng = new QueryEngine(spark, hcat)
    val r = heng.query(
      "SELECT g, count(*) AS n FROM bk_base GROUP BY g",
      heng.Options(ciColumns = false))
    assert(r.planType != "bottomk", s"${r.planType}: ${r.reason}")
    // ungrouped shapes are untouched by the representation gate
    val r2 = heng.query("SELECT count(*) AS n FROM bk_base",
      heng.Options(ciColumns = false))
    assert(r2.planType == "bottomk", s"${r2.planType}: ${r2.reason}")
  }

  test("plain maintainer normalizes stored column order on takeover") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val ccat = new MetaCatalog(
      Files.createTempDirectory("graft-bk-order").toString)
    // batch build writes parquet in (id, v, graft_h) order
    spark.range(0, 4000).toDF("id")
      .withColumn("v", expr("cast(1 + id % 100 as double)"))
      .createOrReplaceTempView("bk_order")
    Samplers.createBottomK(spark, ccat, "bk_order", "id", K)
    // the stream frame presents (v, id) — a taking-over maintainer must
    // not read the stored rows positionally against its own schema
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val rows = stream.toDF().toDF("id")
      .withColumn("v", expr("cast(1 + id % 100 as double)"))
      .select(col("v"), col("id"))
    val q = graft.streaming.SampleMaintainers.maintainBottomKSample(
      rows, ccat, "bk_order", "id", k = K)
    stream.addData((4000L until 8000L).toSeq)
    q.processAllAvailable(); q.stop()
    // parity with the batch builder over the full 0..8000 row set
    spark.range(0, 8000).toDF("id")
      .withColumn("v", expr("cast(1 + id % 100 as double)"))
      .createOrReplaceTempView("bk_order_all")
    val bcat = new MetaCatalog(
      Files.createTempDirectory("graft-bk-order-batch").toString)
    val (bname, _) = Samplers.createBottomK(spark, bcat, "bk_order_all", "id", K)
    val folded = spark.read.parquet(s"${ccat.samplesDir}/bk_order__bottomk_id")
      .select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val batched = spark.table(bname)
      .select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(folded == batched)
    assert(ccat.statsFor("bk_order").exists(_.rowCount == 8000L))
  }
}
