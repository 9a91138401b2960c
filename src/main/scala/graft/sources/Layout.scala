package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout operations for the 100 TB path: bucketing (so joins
  * and aggregations on the bucket key need NO exchange — both sides are
  * already hash-partitioned on disk) and date partitioning (so
  * time-range predicates prune whole directories before any IO).
  *
  * These are the write-side levers the engine's read-side planning
  * relies on at scale; LayoutSpec asserts the resulting plans (no
  * Exchange under the join; PartitionFilters on the scan).
  */
object Layout {

  /** Write `df` as a bucketed+sorted managed table on `key`. Joins and
    * groupBys on `key` between tables bucketed with the same count
    * produce no shuffle.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  /** Write `df` partitioned by the given column (directory-per-value). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
