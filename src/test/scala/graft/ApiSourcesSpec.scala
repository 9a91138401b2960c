package graft

import java.nio.file.Files

import graft.api.Response
import graft.catalog.MetaCatalog
import graft.engine.QueryEngine
import graft.sources.Sources

/** Source/sink roundtrips (A2-A4) and the POST /query JSON response
  * contract (app.py:146-156 shape).
  */
class ApiSourcesSpec extends SparkSpec {

  test("CSV roundtrip preserves rows and schema (explicit + inferred)") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    val dir = Files.createTempDirectory("graft-csv").toString + "/orders"
    Sources.writeCsv(orders, dir)
    val back = Sources.readCsv(spark, dir, orders.schema)
    assert(back.count() == orders.count())
    val a = orders.orderBy("o_orderkey").collect().toSeq
    val b = back.orderBy("o_orderkey").collect().toSeq
    assert(a == b)
    val inferred = Sources.readCsvInferred(spark, dir)
    assert(inferred.count() == orders.count())
    assert(inferred.schema.fieldNames.toSeq == orders.schema.fieldNames.toSeq)
  }

  test("JSON-lines roundtrip preserves rows") {
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val dir = Files.createTempDirectory("graft-json").toString + "/nation"
    Sources.writeJson(nation, dir)
    val back = Sources.readJson(spark, dir, nation.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("ORC roundtrip preserves rows and schema; pushdown reaches the scan") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
    val dir = Files.createTempDirectory("graft-orc").toString + "/lineitem"
    Sources.writeOrc(li, dir)
    val back = Sources.readOrc(spark, dir)
    assert(back.schema == li.schema)
    assert(back.count() == li.count())
    // filters push into the ORC scan exactly like parquet
    val plan = back.filter("l_quantity < 5").queryExecution
      .executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      plan.take(800))
    val a = li.filter("l_quantity < 5").orderBy("l_orderkey", "l_partkey")
      .collect().toSeq
    val b = back.filter("l_quantity < 5").orderBy("l_orderkey", "l_partkey")
      .collect().toSeq
    assert(a == b)
  }

  test("response JSON carries the reference contract fields") {
    Tables.registerAll(spark, sfDir)
    val engine = new QueryEngine(spark,
      new MetaCatalog(Files.createTempDirectory("graft-api").toString))
    val r = engine.query("SELECT count(*) AS n FROM nation",
      engine.Options(measureExact = true))
    val json = Response.render(r)
    Seq("\"status\": \"success\"", "\"plan\":", "\"result\":", "\"meta\":",
      "\"ml_optimization\":", "\"execution_time_ms\":", "\"actual_speedup\":",
      "\"strategy\":", "\"confidence\":", "\"reasoning\":").foreach { f =>
      assert(json.contains(f), s"missing $f in $json")
    }
    assert(json.contains("\"n\": 25"))
  }

  test("samples/sketches/ml-stats listings render the reference shapes") {
    val catalog = new MetaCatalog(
      java.nio.file.Files.createTempDirectory("graft-api2").toString)
    val engine = new QueryEngine(spark, catalog)
    Tables.registerAll(spark, sfDir)
    graft.sample.Samplers.createUniform(spark, catalog, "nation", 0.5)
    graft.sketch.SketchOps.createHll(spark, catalog, "nation", "n_name")
    engine.query("SELECT count(*) AS n FROM nation",
      engine.Options(measureExact = true))

    val sj = Response.renderSamples(catalog.samplesFor("nation"))
    assert(sj.contains("\"sample_table\": \"nation__sample_0_5\""), sj)
    val kj = Response.renderSketches(catalog.listSketches(Some("nation")))
    assert(kj.contains("\"sketch_type\": \"hyperloglog\"") &&
      kj.contains("\"size_bytes\": 4101"), kj)
    val mj = Response.renderLearningStats(engine.history.learningStats())
    assert(mj.contains("\"query_count\": 1") &&
      mj.contains("\"total_queries\": 1"), mj)
  }
}
