package graft

import java.nio.file.Files

import graft.catalog.MetaCatalog
import graft.sketch.{Cms, Hll, SketchOps}

/** Sketch correctness: byte-format parity with the reference layout
  * (fixtures computed from the documented algorithm: SHA-256 -> first 8
  * bytes LE; HLL `[b][m u32 LE][m registers]`; CMS
  * `[w u32][d u32][eps f64][delta f64][d*w u64 LE]`), estimate accuracy
  * bounds, merge laws, and the distributed aggregator path.
  */
class SketchSpec extends SparkSpec {

  test("HLL byte-format parity: b=4, values a,b,c") {
    val h = new Hll(4)
    Seq("a", "b", "c").foreach(h.addString)
    assert(h.serialize.map("%02x".format(_)).mkString ==
      "041000000000000000000000000000030000000200")
    assert(h.count == 2) // reference small-range estimate for this input
  }

  test("HLL estimate parity and accuracy: b=10, 1000 distinct") {
    val h = new Hll(10)
    (0 until 1000).foreach(i => h.addString(s"v$i"))
    assert(h.count == 1025) // value computed from the reference algorithm
    assert(math.abs(h.count - 1000.0) / 1000.0 < 3 * h.standardError)
    val (lo, hi) = h.confidenceInterval()
    assert(lo <= 1025 && 1025 <= hi)
  }

  test("HLL serde roundtrip + merge is max-associative and idempotent") {
    val a = new Hll(10); val b = new Hll(10)
    (0 until 500).foreach(i => a.addString(s"x$i"))
    (250 until 750).foreach(i => b.addString(s"x$i"))
    val ser = a.serialize
    val a2 = Hll.deserialize(ser)
    assert(a2.serialize.sameElements(ser))
    val merged = Hll.deserialize(a.serialize).merge(b)
    val mergedRev = Hll.deserialize(b.serialize).merge(a)
    assert(merged.serialize.sameElements(mergedRev.serialize))
    assert(merged.merge(b).serialize.sameElements(mergedRev.serialize))
    assert(math.abs(merged.count - 750.0) / 750.0 < 3 * merged.standardError)
  }

  test("CMS byte-format parity: eps=delta=0.1, adds a(1), b(2), a(3)") {
    val c = new Cms(0.1, 0.1)
    assert(c.w == 28 && c.d == 3)
    c.addString("a", 1); c.addString("b", 2); c.addString("a", 3)
    val hex = c.serialize.map("%02x".format(_)).mkString
    assert(hex.startsWith(
      "1c000000030000009a9999999999b93f9a9999999999b93f"))
    assert(c.serialize.length == 696)
    assert(c.estimateString("a") == 4)
    assert(c.estimateString("b") == 2)
    assert(c.estimateString("zz") == 0)
  }

  test("CMS is overestimate-only and mergeable") {
    val a = new Cms(0.01, 0.01)
    val b = new Cms(0.01, 0.01)
    val truth = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    (0 until 2000).foreach { i =>
      val k = s"k${i % 97}"
      (if (i % 2 == 0) a else b).addString(k); truth(k) += 1
    }
    val merged = Cms.deserialize(a.serialize).merge(b)
    truth.foreach { case (k, n) =>
      val est = merged.estimateString(k)
      assert(est >= n, s"$k underestimated: $est < $n")
      assert(est <= n + math.ceil(0.01 * 2000).toLong + 1)
    }
  }

  test("Histogram: serde roundtrip, mergeability, percentile bracketing") {
    import graft.sketch.Histogram
    val rnd = new scala.util.Random(42)
    val data = Array.fill(5000)(rnd.nextDouble() * 1000.0).sorted
    val lo = data.head
    val width = (data.last - lo) / 64
    val counts = new Array[Long](64)
    data.foreach { x =>
      counts(math.min(63, math.floor((x - lo) / width).toInt)) += 1
    }
    val h = Histogram(lo, width, counts)
    // serde roundtrip is exact
    val rt = Histogram.deserialize(h.serialize)
    assert(rt.lo == h.lo && rt.width == h.width)
    assert(rt.counts.toSeq == h.counts.toSeq)
    // estimates bracket the true order statistic within one bucket
    // width, and are monotone in p
    var prev = Double.NegativeInfinity
    for (p <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = h.percentile(p)
      val exact = data(math.round(p * (data.length - 1)).toInt)
      assert(math.abs(est - exact) <= 2 * width, s"p=$p est=$est exact=$exact")
      assert(est >= prev, s"non-monotone at p=$p")
      prev = est
    }
    // same-grid merge == histogram of the concatenation
    val h2 = Histogram(lo, width, counts.map(_ * 2))
    val merged = h.merge(h2)
    assert(merged.n == h.n * 3)
    assert(merged.percentile(0.5) == Histogram(lo, width,
      counts.map(_ * 3)).percentile(0.5))
    // different grids refuse to merge
    intercept[IllegalArgumentException] {
      h.merge(Histogram(lo + 1.0, width, counts))
    }
  }

  test("distributed sketch build over a table matches single-threaded") {
    Tables.registerAll(spark, sfDir)
    val catalog = new MetaCatalog(
      Files.createTempDirectory("graft-sketch").toString)
    val (_, est) = SketchOps.createHll(spark, catalog, "lineitem", "l_partkey")
    val truth = spark.table("lineitem")
      .selectExpr("count(distinct l_partkey)").collect().head.getLong(0)
    assert(math.abs(est - truth.toDouble) / truth < 3 * (1.04 / math.sqrt(4096)),
      s"est=$est truth=$truth")
    // single-threaded reference construction over the same values
    val h = new Hll(12)
    spark.table("lineitem").select("l_partkey").collect()
      .foreach(r => h.addString(r.get(0).toString))
    assert(est == h.count,
      "distributed merge must equal sequential construction")

    SketchOps.createCms(spark, catalog, "orders", "o_orderpriority")
    val freq = SketchOps.frequencyFromSketch(catalog, "orders",
      "o_orderpriority", "1-URGENT").get
    val truthFreq = spark.table("orders")
      .filter("o_orderpriority = '1-URGENT'").count()
    assert(freq >= truthFreq && freq <= truthFreq + (0.01 * spark.table("orders").count()).toLong + 1)
    assert(SketchOps.distinctFromSketch(catalog, "lineitem", "l_partkey").contains(est))
  }

  test("jsonTupleKey is byte-identical to Spark's to_json(array(...)) rendering") {
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    // adversarial values: JSON metachars, the five short escapes, raw
    // control chars (incl. the old U+0001 separator), non-ASCII
    val adversarial = Seq(
      ("plain", "x"),
      ("with\"quote", "back\\slash"),
      ("tab\there", "new\nline"),
      ("cr\rhere", "ff\fhere"),
      ("bs\bhere", "ctrl\u0001sep"),
      ("unit\u001fsep", "café ✓"),
      ("", " spaced "),
      ("ab", "c") // the pair that aliased under separator-concat
    )
    val rendered = adversarial.toDF("a", "b")
      .select(
        expr("to_json(array(cast(a as string), cast(b as string)))").as("j"),
        col("a"), col("b"))
      .collect()
    rendered.foreach { r =>
      assert(r.getString(0) ==
        SketchOps.jsonTupleKey(Seq(r.getString(1), r.getString(2))),
        s"Spark=${r.getString(0)} scala=${SketchOps.jsonTupleKey(
          Seq(r.getString(1), r.getString(2)))}")
    }
    // distinct tuples render distinct keys (the collision class the
    // separator-concat encoding had)
    assert(SketchOps.jsonTupleKey(Seq("ab", "c")) !=
      SketchOps.jsonTupleKey(Seq("a", "bc")))
  }
}
