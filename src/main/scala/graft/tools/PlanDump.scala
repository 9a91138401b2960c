package graft.tools

import org.apache.spark.sql.SparkSession

/** Evidence helper (round 17): dump `.explain("formatted")` for a list of
  * SparkEntry queries straight into files — the `plans/rNN/` before/after
  * pairs the optimization rounds commit as plan-shape evidence.
  * Not part of the driver contract.
  *
  *   runMain graft.tools.PlanDump plans/r17 before q01_pricing_summary q44_dedup_clusters
  *   runMain graft.tools.PlanDump plans/r17 after --all-touched
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32 —
  * matches the driver's bench config so partition-count-dependent plan
  * nodes render as the bench sees them), SPARK_GRAFT_MAXPART (optional
  * spark.sql.files.maxPartitionBytes override — lets a "well-split input"
  * plan be dumped against the same single-file testdata by forcing many
  * scan splits, the guard evidence for the round-17 scan spreads).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> <query...>")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    sys.env.get("SPARK_GRAFT_MAXPART")
      .foreach(v => b.config("spark.sql.files.maxPartitionBytes", v))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = outDir.resolve(s"${name}_$suffix.txt")
      java.nio.file.Files.write(f, plan.getBytes("UTF-8"))
      println(s"[plandump] wrote $f (${plan.length} chars)")
    }
    spark.stop()
  }
}
