package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Native codegen expression: correctness vs a reference Scala
  * computation, null/length handling, and plan-level evidence that the
  * expression participates in the generated stage.
  */
class FunctionsSpec extends SparkSpec {

  test("cosine_similarity matches a reference implementation on real vectors") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val joined = q.crossJoin(
        e.select(col("vec_id").as("nid"), col("embedding").as("ne")))
      .filter(col("qid") < col("nid"))
      .select(col("qid"), col("nid"),
        GraftFunctions.cosineSimilarity(col("qe"), col("ne")).as("cos"),
        col("qe"), col("ne"))
    val rows = joined.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getSeq[Float](3).map(_.toDouble)
      val b = r.getSeq[Float](4).map(_.toDouble)
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val expected = dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
      assert(math.abs(r.getDouble(2) - expected) < 1e-12,
        s"${r.getDouble(2)} vs $expected")
      assert(r.getDouble(2) >= -1.0 - 1e-9 && r.getDouble(2) <= 1.0 + 1e-9)
    }
  }

  test("cosine_similarity is callable from SQL once registered") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(
           array(cast(3.0 as float), cast(4.0 as float)),
           array(cast(3.0 as float), cast(4.0 as float))) AS cos""")
      .collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    // engine construction registers it too (the POST /query surface)
    Tables.registerAll(spark, sfDir)
    val engine = new graft.engine.QueryEngine(spark,
      new graft.catalog.MetaCatalog(
        java.nio.file.Files.createTempDirectory("graft-fn").toString))
    val viaEngine = engine.query(
      """SELECT max(cosine_similarity(e1.embedding, e2.embedding)) AS m
         FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id""")
    assert(viaEngine.df.collect().head.getDouble(0) <= 1.0 + 1e-9)
    // the extensions entry point constructs and injects without error
    new graft.functions.GraftExtensions()(
      new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("quantized_dot equals the interpreted SQL fragment bit-for-bit") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val pairs = e.filter(col("vec_id") < 32)
      .select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(e.filter(col("vec_id") < 32)
        .select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .select(
        expr("quantized_dot(a, b)").as("native"),
        expr("""aggregate(zip_with(a, b,
            (x, y) -> cast(floor(cast(x as double) * cast(y as double) * 1000000) as bigint)),
            cast(0 as bigint), (acc, v) -> acc + v)""").as("interpreted"))
    val rows = pairs.collect()
    assert(rows.length == 32 * 32)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native=${r.getLong(0)} interpreted=${r.getLong(1)}"))
  }

  test("graft_h60 equals the conv(substring(md5)) fragment bit-for-bit") {
    GraftFunctions.register(spark)
    // real corpus text (includes non-ASCII zh tokens) + adversarial
    // literals: empty string, unicode, long strings, digit runs
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text").as("s"))
    import spark.implicits._
    val edge = Seq("", "a", "的是在", "x" * 5000, "1234567890",
      "prefix:42-17", "ws:99").toDF("s")
    val rows = docs.unionAll(edge)
      .select(
        expr("graft_h60(s)").as("native"),
        expr("cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)")
          .as("sql"))
      .collect()
    assert(rows.length > 500)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native=${r.getLong(0)} sql=${r.getLong(1)}"))
    // null propagates
    val n = spark.sql("SELECT graft_h60(cast(null as string))").collect().head
    assert(n.isNullAt(0))
    // range: 60 bits, never negative
    rows.foreach(r => assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 60)))
  }

  test("graft_percentile is bit-identical to the builtin percentile on every gated shape") {
    // round 16: the exact-companion percentiles moved to the
    // primitive-buffer aggregate; its eval delegates the rank walk and
    // interpolation to PercentileBase.getPercentile, so equality must be
    // EXACT (raw bits), not approximate — including array/scalar forms,
    // grouped evaluation, duplicates-heavy columns, and empty input.
    graft.Tables.registerAll(spark, sfDir)
    val ps = "array(0.0D, 0.01D, 0.25D, 0.5D, 0.75D, 0.9D, 0.95D, 0.99D, 1.0D)"
    def bitsEq(a: Seq[Double], b: Seq[Double]): Boolean =
      a.length == b.length && a.zip(b).forall { case (x, y) =>
        java.lang.Double.doubleToRawLongBits(x) ==
          java.lang.Double.doubleToRawLongBits(y) }
    for ((t, c) <- Seq(("lineitem", "l_extendedprice"),
        ("lineitem", "l_discount"), ("lineitem", "l_quantity"),
        ("orders", "o_totalprice"), ("events", "value"))) {
      val r = spark.sql(s"SELECT percentile($c, $ps) AS a, " +
        s"graft_percentile(cast($c as double), $ps) AS b FROM $t").collect()(0)
      assert(bitsEq(r.getSeq[Double](0), r.getSeq[Double](1)), s"$t.$c")
    }
    val g = spark.sql("SELECT l_returnflag, l_linestatus, " +
      s"percentile(l_extendedprice, $ps) AS a, " +
      s"graft_percentile(cast(l_extendedprice as double), $ps) AS b " +
      "FROM lineitem GROUP BY l_returnflag, l_linestatus").collect()
    assert(g.nonEmpty)
    g.foreach(r => assert(bitsEq(r.getSeq[Double](2), r.getSeq[Double](3))))
    val sc = spark.sql("SELECT percentile(l_discount, 0.5) AS a, " +
      "graft_percentile(cast(l_discount as double), 0.5D) AS b FROM lineitem")
      .collect()(0)
    assert(java.lang.Double.doubleToRawLongBits(sc.getDouble(0)) ==
      java.lang.Double.doubleToRawLongBits(sc.getDouble(1)))
    val empty = spark.sql("SELECT percentile(l_discount, 0.5) AS a, " +
      "graft_percentile(cast(l_discount as double), 0.5D) AS b " +
      "FROM lineitem WHERE l_discount > 100").collect()(0)
    assert(empty.isNullAt(0) && empty.isNullAt(1))
  }

  test("quantized_dot null and mismatch semantics") {
    import spark.implicits._
    val vals = Seq(
      (Some(Seq(1.5f, -2.0f)), Some(Seq(2.0f, 1.0f))),
      (None, Some(Seq(1.0f))),
      (Some(Seq(1.0f)), Some(Seq(1.0f, 2.0f))))
      .toDF("a", "b")
      .select(GraftFunctions.quantizedDot(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(vals(0).contains(3000000L - 2000000L)) // floor(3e6) + floor(-2e6)
    assert(vals(1).isEmpty)
    assert(vals(2).isEmpty)
  }

  test("cosine_similarity null and mismatch semantics") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 0.0f)), Some(Seq(1.0f, 0.0f))),
      (Some(Seq(1.0f, 0.0f)), Some(Seq(0.0f, 1.0f))),
      (Some(Seq(0.0f, 0.0f)), Some(Seq(1.0f, 1.0f))),
      (None, Some(Seq(1.0f))),
      (Some(Seq(1.0f)), Some(Seq(1.0f, 2.0f))))
      .toDF("a", "b")
      .select(GraftFunctions.cosineSimilarity(col("a"), col("b")).as("cos"))
    val vals = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(vals(0).contains(1.0))
    assert(vals(1).contains(0.0))
    assert(vals(2).contains(0.0)) // zero-norm convention
    assert(vals(3).isEmpty)       // null input
    assert(vals(4).isEmpty)       // length mismatch
  }
}
