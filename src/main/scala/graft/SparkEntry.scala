package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates per-domain modules; every entry is deterministic.
  * Entries with a DuckDB-expressible equivalent carry an `oracleSql` entry
  * (same column names + aliases — the driver hash-compares after sorting
  * columns by name); genuinely approximate operators (seeded sampling,
  * HLL/CMS sketches, LSH) are rows-only checked and covered by ScalaTest
  * error-bound assertions instead.
  */
object SparkEntry {

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (graft.queries.Relational.queries, graft.queries.Relational.oracle),
      (graft.queries.TextAnalysis.queries, graft.queries.TextAnalysis.oracle),
      (graft.queries.Dedup.queries, graft.queries.Dedup.oracle),
      (graft.queries.Corpus.queries, graft.queries.Corpus.oracle),
      (graft.queries.Similarity.queries, graft.queries.Similarity.oracle),
      (graft.queries.Events.queries, graft.queries.Events.oracle),
      (graft.queries.Aqp.queries, graft.queries.Aqp.oracle),
      (graft.queries.Analytics.queries, graft.queries.Analytics.oracle)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}
