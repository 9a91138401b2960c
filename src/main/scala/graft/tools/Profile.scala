package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: two timed passes over every SparkEntry query
  * (pass 1 = cold JVM/codegen, pass 2 = steady state) plus an AQP
  * latency breakdown (planning vs approx execution vs exact execution).
  * Not part of the driver contract.
  */
object Profile {
  def time[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

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

    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    (1 to 2).foreach { pass =>
      qs.foreach { case (name, fn) =>
        time(s"pass$pass $name")(
          try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L })
      }
    }

    // AQP latency decomposition on a scan-bearing aggregate
    import graft.catalog.MetaCatalog
    import graft.engine.QueryEngine
    graft.Tables.registerAll(spark, sfDir)
    val catalog = new MetaCatalog(
      java.nio.file.Files.createTempDirectory("graft-prof").toString)
    val engine = new QueryEngine(spark, catalog)
    graft.sample.Samplers.createUniform(spark, catalog, "lineitem", 0.01)
    val sql = "SELECT sum(l_extendedprice * (1 - l_discount)) AS s FROM lineitem WHERE l_quantity < 30"
    engine.query(sql).df.collect(); spark.sql(sql).collect() // warm
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val r = engine.query(sql)
      val t1 = System.nanoTime()
      r.df.collect()
      val t2 = System.nanoTime()
      spark.sql(sql).collect()
      val t3 = System.nanoTime()
      println(f"[profile] aqp iter $i: plan=${(t1 - t0) / 1e6}%.1f ms " +
        f"approx=${(t2 - t1) / 1e6}%.1f ms exact=${(t3 - t2) / 1e6}%.1f ms " +
        s"(type=${r.planType})")
    }
    spark.stop()
  }
}
