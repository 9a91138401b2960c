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

    // q50 stage decomposition
    (1 to 2).foreach { pass =>
      t(s"p$pass q19-full")(
        graft.queries.Dedup.queries("q19_ngram_jaccard")(spark, sfDir)
          .queryExecution.toRdd.count())
      t(s"p$pass q50-full")(
        graft.queries.Corpus.queries("q50_contamination")(spark, sfDir)
          .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
