package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY §2.A2-A4): parquet is the primary store
  * (driver test data); CSV honors the reference UI's upload path
  * (/root/reference/templates/index.html:589-593 — the dead `/upload`
  * variant), JSON mirrors the result-sink shape of `POST /query`.
  *
  * Scale notes: all readers are splittable scans (CSV/JSON split by
  * line, parquet by row group) — ingest parallelism is free; schema is
  * supplied explicitly where possible because runtime inference is a
  * full extra pass over the data at 100 TB.
  */
object Sources {

  /** CSV read with explicit schema (preferred — no inference pass). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** CSV read with header + type inference (small/interactive files
    * only: inference scans the data once before the real read).
    */
  def readCsvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** JSON-lines sink/source (the REST result shape, durable form). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC sink/source (round 11) — the other columnar warehouse format
    * Spark ships natively; splittable by stripe like parquet's row
    * groups, with the same predicate-pushdown/column-pruning behavior,
    * so any table in this engine can live in either format unchanged.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
