package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: times labeled sub-stages of the hot queries.
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    (1 to 2).foreach { pass =>
      qs.foreach { case (name, fn) =>
        time(s"pass$pass $name")(try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L })
      }
    }
    spark.stop()
  }
}
