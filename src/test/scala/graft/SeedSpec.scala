package graft

import java.nio.file.Files

import graft.catalog.MetaCatalog
import graft.engine.QueryEngine
import graft.sources.Seed

/** The seed generator (reference seed.py parity): schema, ranges,
  * distributions, determinism, and end-to-end use through the engine.
  */
class SeedSpec extends SparkSpec {

  private val n = 20000L

  test("purchases carries the reference schema and value ranges") {
    val df = Seed.purchases(spark, n)
    assert(df.schema.fieldNames.toSeq == Seq("id", "customer_id",
      "product_id", "amount", "country", "city", "category", "purchase_date"))
    val r = df.selectExpr(
      "count(*)", "min(id)", "max(id)",
      "min(customer_id)", "max(customer_id)",
      "min(product_id)", "max(product_id)",
      "min(amount)", "max(amount)",
      "min(purchase_date)", "max(purchase_date)").collect().head
    assert(r.getLong(0) == n && r.getLong(1) == 1L && r.getLong(2) == n)
    assert(r.getLong(3) >= 1L && r.getLong(4) <= 50000L)
    assert(r.getLong(5) >= 1L && r.getLong(6) <= 10000L)
    assert(r.getDouble(7) >= 10.0 && r.getDouble(8) < 1000.0)
    assert(r.getString(9) >= "2023-01-01" && r.getString(10) <= "2024-01-01")
    // amounts are 2-decimal values (seed.py round(x, 2)): each is the
    // nearest double to k/100, so round(amount, 2) is a fixpoint
    assert(df.filter("amount <> round(amount, 2)").count() == 0)
  }

  test("categorical columns draw from the reference vocabularies, roughly uniformly") {
    val df = Seed.purchases(spark, n)
    val counts = df.groupBy("country").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Seed.countries.toSet)
    // uniform-ish: each of 10 countries within 3x of the expected share
    counts.values.foreach(c => assert(c > n / 30 && c < n * 3 / 10))
    val cats = df.select("category").distinct().collect().map(_.getString(0)).toSet
    assert(cats == Seed.categories.toSet)
  }

  test("generation is deterministic and independent of partitioning") {
    val a = Seed.purchases(spark, 1000).collect().sortBy(_.getLong(0))
    val b = Seed.purchases(spark, 1000).repartition(7).collect().sortBy(_.getLong(0))
    assert(a.toSeq == b.toSeq)
  }

  test("generate() persists, registers the view, and feeds the engine") {
    val dir = Files.createTempDirectory("graft-seed").toString + "/purchases"
    val catalog = new MetaCatalog(Files.createTempDirectory("graft-seedcat").toString)
    val rows = Seed.generate(spark, catalog, dir, n)
    assert(rows == n)
    assert(catalog.statsFor("purchases").exists(_.rowCount == n))
    // the reference's demo queries run against the seeded table
    val engine = new QueryEngine(spark, catalog)
    val r = engine.query(
      "SELECT country, count(*) AS n_purchases FROM purchases GROUP BY country")
    assert(r.df.count() == 10)
    val exact = spark.sql("SELECT avg(amount) FROM purchases").collect().head.getDouble(0)
    assert(exact > 400 && exact < 600) // uniform(10, 1000) mean ~505
  }
}
