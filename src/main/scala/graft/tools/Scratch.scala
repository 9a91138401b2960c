package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev harness for stage-by-stage timing of the documents
  * pipeline. Not part of the driver contract.
  */
object Scratch {
  def t[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dp = spark.sparkContext.defaultParallelism

    def docs = graft.Tables.load(spark, sfDir, "documents")

    (1 to 2).foreach { pass =>
      t(s"p$pass load.count")(docs.count())
      t(s"p$pass repart.count")(
        docs.repartition(dp, col("doc_id")).queryExecution.toRdd.count())
      val fp = docs.repartition(dp, col("doc_id"))
        .select(col("doc_id"),
          expr("md5(array_join(array_sort(array_distinct(split(lower(text), ' '))), ' '))").as("fp"))
      t(s"p$pass fp-project")(fp.queryExecution.toRdd.count())
      t(s"p$pass fp-agg")(
        fp.groupBy(col("fp")).agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
          .queryExecution.toRdd.count())
      t(s"p$pass q17-full")(
        graft.queries.Dedup.queries("q17_dedup_exact")(spark, sfDir)
          .queryExecution.toRdd.count())
      t(s"p$pass q18-full")(
        graft.queries.Dedup.queries("q18_minhash_lsh")(spark, sfDir)
          .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
