package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the bench's AQP group_by case: decompose where the
  * sampled side's wall-time goes (AQE scheduling vs shuffle width vs
  * aggregate work) on the same widened configuration Bench measures.
  * Not part of the driver contract.
  */
object AqpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.registerAll(spark, sfDir)
    val catalog = new graft.catalog.MetaCatalog(
      java.nio.file.Files.createTempDirectory("graft-probe").toString)
    val engine = new graft.engine.QueryEngine(spark, catalog)
    val wide = Seq.fill(10)(spark.table("lineitem")).reduce(_ unionAll _)
    wide.createOrReplaceTempView("lineitem_x10")
    graft.sample.Samplers.createUniform(spark, catalog, "lineitem_x10", 0.01)

    val sql = "SELECT l_returnflag, count(*) AS n, sum(l_extendedprice * (1 - l_discount)) AS s, avg(l_quantity) AS aq FROM lineitem_x10 GROUP BY l_returnflag"

    def minMs(label: String)(body: => Unit): Unit = {
      body // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }
      println(f"[probe] $label: min=${ts.min}%.1f ms all=${ts.map(t => f"$t%.0f").mkString(",")}")
    }

    val r = engine.query(sql)
    println(s"[probe] plan_type=${r.planType} sample=${r.sampleTable}")
    minMs("approx collect (AQE on)")(r.df.collect())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val r2 = engine.query(sql)
    minMs("approx collect (AQE off)")(r2.df.collect())
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val r3 = engine.query(sql)
    minMs("approx collect (AQE off, shuffle=8)")(r3.df.collect())
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    val r4 = engine.query(sql)
    minMs("approx collect (AQE off, shuffle=1)")(r4.df.collect())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    // exact side for reference
    minMs("exact collect (AQE on)")(spark.sql(sql).collect())
    // no-CI variant: how much do the companion aggregates cost?
    val r5 = engine.query(sql, engine.Options(ciColumns = false))
    minMs("approx collect no-CI (AQE on)")(r5.df.collect())

    // stats serve: the bench's stats_serve case isolated, with query()
    // and collect() decomposed — adjudicates a bench reading inflated
    // by a contention window covering all three of its passes
    graft.sketch.SketchOps.createHistogram(spark, catalog, "lineitem_x10",
      "l_extendedprice")
    val statsSql = "SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx, " +
      "sum(l_extendedprice) AS sm, avg(l_extendedprice) AS av, " +
      "count(l_extendedprice) AS nv FROM lineitem_x10"
    val rs = engine.query(statsSql, engine.Options(ciColumns = false))
    println(s"[probe] stats plan_type=${rs.planType} served=${rs.servedFromCatalog}")
    minMs("stats query() only")(
      engine.query(statsSql, engine.Options(ciColumns = false)))
    minMs("stats collect only")(rs.df.collect())
    minMs("stats query+collect")(
      engine.query(statsSql, engine.Options(ciColumns = false)).df.collect())
    minMs("stats exact collect")(spark.sql(statsSql).collect())

    // count case isolated: adjudicates a bench raw ratio drifting
    // under/over the 4-6x window — the exact parquet scan's wall time
    // swings ~2x with page-cache and CPU-steal state, while the
    // sampled side is stable, so the RAW ratio moves with the host
    val countSql = "SELECT count(*) AS n FROM lineitem_x10 WHERE l_quantity < 30"
    val rc = engine.query(countSql, engine.Options(ciColumns = false))
    println(s"[probe] count plan_type=${rc.planType} sample=${rc.sampleTable}")
    minMs("count approx collect")(rc.df.collect())
    minMs("count exact collect")(spark.sql(countSql).collect())
    spark.stop()
  }
}
