package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.MetaCatalog

/** Synthetic `purchases` generator — the reference's seed script
  * (/root/reference/seed.py:10-69: 200 K rows of id / customer_id /
  * product_id / amount / country / city / category / purchase_date with
  * uniform distributions), re-expressed Spark-first.
  *
  * The reference loops on the driver and batch-inserts 1000 rows at a
  * time; here generation IS the query: `spark.range` is a splittable
  * distributed source and every column is a pure hash of the row id, so
  * the data is generated in parallel on the executors, is byte-identical
  * regardless of partitioning or cluster size, and scales to any row
  * count a cluster can write (no driver bottleneck, no RNG state).
  */
object Seed {

  val countries: Seq[String] = Seq("USA", "UK", "Canada", "Germany",
    "France", "Japan", "Australia", "Brazil", "India", "China")
  val cities: Seq[String] = Seq("New York", "London", "Toronto", "Berlin",
    "Paris", "Tokyo", "Sydney", "Rio", "Mumbai", "Beijing")
  val categories: Seq[String] = Seq("Electronics", "Clothing", "Food",
    "Books", "Home", "Sports", "Toys", "Beauty", "Garden", "Automotive")

  private def arr(vals: Seq[String]): String =
    vals.map(v => s"'$v'").mkString("array(", ", ", ")")

  /** Deterministic uniform pick in [1, n] derived from (id, salt). */
  private def pick(salt: String, n: Long): String =
    s"pmod(xxhash64(id, '$salt'), $n) + 1"

  /** The purchases DataFrame: one row per id in [1, numRecords]. */
  def purchases(spark: SparkSession, numRecords: Long = 200000L): DataFrame =
    spark.range(1, numRecords + 1).toDF("id")
      .select(
        col("id"),
        expr(pick("cust", 50000)).as("customer_id"),
        expr(pick("prod", 10000)).as("product_id"),
        // 10.00 .. 999.99, exactly two decimals (seed.py: uniform(10, 1000))
        expr(s"cast((999 + ${pick("amt", 99000)}) as double) / 100").as("amount"),
        expr(s"element_at(${arr(countries)}, cast(${pick("country", 10)} as int))").as("country"),
        expr(s"element_at(${arr(cities)}, cast(${pick("city", 10)} as int))").as("city"),
        expr(s"element_at(${arr(categories)}, cast(${pick("cat", 10)} as int))").as("category"),
        // 2023-01-01 + [0, 365] days, formatted like seed.py's strftime
        expr(s"date_format(date_add(date'2023-01-01', cast(${pick("date", 366)} as int) - 1), 'yyyy-MM-dd')")
          .as("purchase_date"))

  /** Generate, persist as parquet, register the temp view, and record
    * table stats — the full seed.py contract (table + indexes-analogue +
    * aqe_table_stats row). Returns the row count.
    */
  def generate(spark: SparkSession, catalog: MetaCatalog, path: String,
      numRecords: Long = 200000L): Long = {
    Sources.writeParquet(purchases(spark, numRecords), path)
    val df = Sources.readParquet(spark, path)
    df.createOrReplaceTempView("purchases")
    val n = df.count()
    catalog.upsertTableStats("purchases", n)
    n
  }
}
