package graft

import org.apache.spark.sql.functions._

/** Round-14 law for the bounded dual-run measurement
  * (`Options.measureExactCap`): a high-cardinality GROUP BY under
  * `measureExact` collects both result sets through a deterministic
  * keyed-hash sample of the group keys instead of collecting every
  * group twice. The capped realized error must (a) be reproducible
  * run-to-run (the hash order is a pure function of the keys) and
  * (b) track the uncapped value — the capped subset is a hash-random
  * sample of groups, so its mean |rel error| estimates the full mean.
  */
class MeasureExactSpec extends SparkSpec {

  test("capped measureExact error is reproducible and tracks the uncapped value on a high-cardinality GROUP BY") {
    val catalog = new graft.catalog.MetaCatalog(
      java.nio.file.Files.createTempDirectory("graft-mx").toString)
    spark.range(40000)
      .select(expr("id % 8192").as("g"),
        expr("cast(id % 100 as double)").as("v"))
      .createOrReplaceTempView("mx_wide")
    // a materialized uniform sample routes the grouped query through
    // the sampled path, so the realized per-group errors are nonzero;
    // seeded Bernoulli + one materialized parquet = both runs measure
    // against the IDENTICAL estimates, so only the group SUBSET
    // differs between capped and uncapped
    graft.sample.Samplers.createUniform(spark, catalog, "mx_wide", 0.1)
    val engine = new graft.engine.QueryEngine(spark, catalog)
    val sql = "SELECT g, count(*) AS n, sum(v) AS s FROM mx_wide GROUP BY g"

    def errAt(cap: Int): Double = {
      val r = engine.query(sql, engine.Options(measureExact = true,
        ciColumns = false, measureExactCap = cap))
      assert(r.planType == "sample", s"${r.planType} (${r.reason})")
      engine.history.all.last.actualError
    }
    val errFull = errAt(1 << 28)  // effectively uncapped: all 8192 groups
    val errCap = errAt(512)       // 512-group keyed-hash subset
    val errCap2 = errAt(512)      // determinism: same subset, same value
    assert(errCap == errCap2, s"capped error not reproducible: $errCap vs $errCap2")
    assert(errFull > 0.0, s"fixture produced zero realized error ($errFull)")
    // the hash-sampled subset's mean tracks the full mean
    assert(math.abs(errCap - errFull) <= 0.35 * errFull,
      s"capped=$errCap full=$errFull")
  }

  test("scalar measureExact is unaffected by the cap") {
    val catalog = new graft.catalog.MetaCatalog(
      java.nio.file.Files.createTempDirectory("graft-mx2").toString)
    spark.range(5000)
      .select(expr("cast(id % 100 as double)").as("v"))
      .createOrReplaceTempView("mx_scalar")
    graft.sample.Samplers.createUniform(spark, catalog, "mx_scalar", 0.1)
    val engine = new graft.engine.QueryEngine(spark, catalog)
    val sql = "SELECT count(*) AS n, sum(v) AS s FROM mx_scalar"
    val r1 = engine.query(sql, engine.Options(measureExact = true,
      ciColumns = false, measureExactCap = 1))
    val e1 = engine.history.all.last.actualError
    val r2 = engine.query(sql, engine.Options(measureExact = true,
      ciColumns = false))
    val e2 = engine.history.all.last.actualError
    assert(r1.planType == "sample" && r2.planType == "sample")
    assert(e1 == e2, s"scalar error changed under the cap: $e1 vs $e2")
  }
}
