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

  test("rangePercentile: segment rule over restricted masses; empty coverage is None") {
    import graft.sketch.Histogram
    val h = Histogram(0.0, 10.0, Array(10L, 0L, 30L, 20L, 0L, 40L))
    // [20, 40): full buckets 2 (30 vals) and 3 (20); median = 25th of
    // 50 -> 25/30 through bucket 2
    assert(h.rangePercentile(Some(20.0), Some(40.0), 0.5)
      .contains(0.0 + 10.0 * (2.0 + (25.0 / 30.0))))
    // p90 -> 45th: 30 in bucket 2, then (45-30)/20 through bucket 3
    assert(h.rangePercentile(Some(20.0), Some(40.0), 0.9)
      .contains(10.0 * (3.0 + 15.0 / 20.0)))
    // [45, 60): boundary bucket 4 is EMPTY (zero-mass segment skipped),
    // all mass in bucket 5 -> median halfway through it
    assert(h.rangePercentile(Some(45.0), None, 0.5).contains(55.0))
    // a range covering only an empty bucket: no row can pass -> None
    // (exact execution returns NULL)
    assert(h.rangePercentile(Some(10.0), Some(20.0), 0.5).isEmpty)
    // empty range (lower >= upper after clamping) -> None
    assert(h.rangePercentile(Some(70.0), None, 0.5).isEmpty)
    // estimates stay inside the requested range
    val est = h.rangePercentile(Some(25.0), Some(35.0), 0.5).get
    assert(est >= 25.0 && est <= 35.0, est.toString)
  }

  test("KMV serde roundtrip; union is the bottom-k semilattice") {
    import graft.sketch.Kmv
    val a = Kmv.Sketch(8, Array(1L, 5L, 9L, 20L, 31L, 44L, 58L, 70L))
    val ser = a.serialize
    val a2 = Kmv.deserialize(ser)
    assert(a2.k == 8 && a2.hashes.sameElements(a.hashes))
    assert(a2.serialize.sameElements(ser))
    val b = Kmv.Sketch(8, Array(2L, 5L, 11L, 20L, 35L, 44L, 60L, 81L))
    val u = a.union(b)
    // bottom-k of the hash-set union
    assert(u.hashes.sameElements(Array(1L, 2L, 5L, 9L, 11L, 20L, 31L, 35L)))
    // idempotent, commutative — replay-safe stream maintenance
    assert(u.union(u).serialize.sameElements(u.serialize))
    assert(b.union(a).serialize.sameElements(u.serialize))
    // associative through partial batches: union of bottom-ks ==
    // bottom-k of the union (the stream==batch byte law's algebra)
    val c = Kmv.Sketch(8, Array(0L, 3L, 7L))
    assert(a.union(b).union(c).serialize
      .sameElements(a.union(b.union(c)).serialize))
    // an exhaustive sketch (fewer than k hashes) estimates exactly
    assert(c.exhaustive && c.estimate == 3.0)
    // a saturated sketch uses q45's (k-1) * 2^60 / h_(k) formula
    assert(!a.exhaustive &&
      a.estimate == 7.0 * Kmv.Pow60 / 70.0)
  }

  test("KMV set estimates: exact when exhaustive, proportional when saturated") {
    import graft.sketch.Kmv
    // exhaustive pair: every set-op figure is the true distinct count
    val ea = Kmv.Sketch(16, Array(1L, 2L, 3L, 4L, 5L))
    val eb = Kmv.Sketch(16, Array(3L, 4L, 5L, 6L))
    val ex = Kmv.setEstimate(ea, eb)
    assert(ex.exact)
    assert(ex.unionEst == 6.0 && ex.intersectEst == 3.0 && ex.exceptEst == 2.0)
    // saturated pair over a synthetic domain: estimates land within the
    // reported bounds of the true cardinalities
    val k = 256
    def h(s: String): Long = { // the repo's portable h60, driver-side
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val aVals = (0 until 4000).map(i => h(s"v$i"))      // A = v0..v3999
    val bVals = (2000 until 6000).map(i => h(s"v$i"))   // B = v2000..v5999
    val sa = Kmv.Sketch(k, aVals.distinct.sorted.take(k).toArray)
    val sb = Kmv.Sketch(k, bVals.distinct.sorted.take(k).toArray)
    val se = Kmv.setEstimate(sa, sb)
    assert(!se.exact)
    assert(math.abs(se.unionEst - 6000.0) / 6000.0 <
      3 * Kmv.unionError(k))
    assert(math.abs(se.intersectEst - 2000.0) / 2000.0 <
      3 * Kmv.proportionError(k, se.matched))
    assert(math.abs(se.exceptEst - 2000.0) / 2000.0 <
      3 * Kmv.proportionError(k, se.aOnly))
    // zero overlap has no relative bound — the engine must refuse
    assert(Kmv.proportionError(k, 0).isPosInfinity)
  }

  test("createTopK stores exactly the groups reaching the threshold, with exact counts") {
    import org.apache.spark.sql.functions.expr
    // group g<i> appears (i+1) times, i in [0, 100): threshold 60 keeps
    // groups 59..99 (counts 60..100) — 41 entries
    spark.range(0, 100).selectExpr("explode(sequence(0, cast(id as int))) AS rep", "id")
      .select(expr("concat('g', id)").as("g"))
      .createOrReplaceTempView("topk_build_t")
    val cat = new MetaCatalog(
      java.nio.file.Files.createTempDirectory("graft-topkb").toString)
    val (_, entries) =
      SketchOps.createTopK(spark, cat, "topk_build_t", Seq("g"), 60L)
    assert(entries == 41)
    val s = cat.getSketch("topk_build_t", "g", "topk").get
    assert(s.parameters.contains("\"threshold\":60") &&
      s.parameters.contains("\"entries\":41") &&
      s.parameters.contains("\"rows\":5050")) // sum 1..100
    val decoded = graft.sketch.GroupedHll.unpack(s.data).map { case (k, b) =>
      k.get -> java.nio.ByteBuffer.wrap(b)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    }.toMap
    assert(decoded == (59 until 100).map(i => s"g$i" -> (i + 1).toLong).toMap)
    // a threshold keeping more than maxEntries groups refuses: the
    // blob would be a scan in disguise
    intercept[IllegalArgumentException] {
      SketchOps.createTopK(spark, cat, "topk_build_t", Seq("g"), 1L,
        maxEntries = 10)
    }
  }

  test("createKmv builds the bottom-k of distinct h60 hashes (one pass, value-keyed)") {
    import org.apache.spark.sql.functions.expr
    import graft.sketch.Kmv
    spark.range(0, 3000)
      .select(expr("concat('u', id % 700)").as("u"))
      .createOrReplaceTempView("kmv_build_t")
    val cat = new MetaCatalog(
      java.nio.file.Files.createTempDirectory("graft-kmv").toString)
    val (_, kept) = SketchOps.createKmv(spark, cat, "kmv_build_t", "u", 64)
    assert(kept == 64)
    val s = cat.getSketch("kmv_build_t", "u", "kmv").get
    assert(s.parameters.contains("\"k\":64") &&
      s.parameters.contains("\"rows\":3000"))
    val sk = Kmv.deserialize(s.data)
    // recompute the bottom-64 with the same portable hash, driver-side
    def h(x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val want = (0 until 700).map(i => h(s"u$i")).distinct.sorted.take(64)
    assert(sk.hashes.toSeq == want)
    // 700 true distinct; the estimate is within 3 CVs
    assert(math.abs(sk.estimate - 700.0) / 700.0 < 3 * Kmv.unionError(64))
  }

  test("HdrSketch: deterministic log-linear buckets, exact merge, relative-error percentiles") {
    import graft.sketch.HdrSketch
    // binade edges: exact powers of two land in sub-bucket 0 of their
    // OWN binade (the corrected floor-log2 can't be fooled by last-ulp
    // log2 error), the value just below in the top sub-bucket below
    assert(HdrSketch.bucketOf(1.0, 32) == ((0, 0)))
    assert(HdrSketch.bucketOf(2.0, 32) == ((1, 0)))
    assert(HdrSketch.bucketOf(1024.0, 32) == ((10, 0)))
    assert(HdrSketch.bucketOf(0.5, 32) == ((-1, 0)))
    assert(HdrSketch.bucketOf(math.nextDown(2.0), 32) == ((0, 31)))
    assert(HdrSketch.bucketOf(1.0 + 1.0 / 32, 32) == ((0, 1)))
    // distributed build over ~4 decades of magnitude (the shape that
    // breaks equi-width grids); percentile within the relative bound
    spark.range(0, 5000)
      .selectExpr("exp(cast(id % 997 as double) / 100.0d) as v")
      .createOrReplaceTempView("hdr_t")
    val cat = new MetaCatalog(
      java.nio.file.Files.createTempDirectory("graft-hdr").toString)
    SketchOps.createHdr(spark, cat, "hdr_t", "v", 32)
    val s = cat.getSketch("hdr_t", "v", "hdr").get
    val sk = HdrSketch.deserialize(s.data)
    assert(sk.n == 5000)
    assert(HdrSketch.deserialize(sk.serialize).serialize.sameElements(s.data))
    val exact = spark.sql("SELECT percentile(v, 0.5), percentile(v, 0.99), " +
      "percentile(v, 0.01) FROM hdr_t").collect().head
    Seq(0.5, 0.99, 0.01).zipWithIndex.foreach { case (p, i) =>
      val est = sk.percentile(p).get
      val t = exact.getDouble(i)
      // 2x: the exact rank interpolates between two order statistics
      // that can straddle a bucket edge
      assert(math.abs(est - t) / t <= 2 * sk.relErrBound,
        s"p=$p est=$est truth=$t")
    }
    // merge == whole-build, byte-for-byte (the log grid is global — no
    // grid mismatch can exist)
    spark.range(0, 2500)
      .selectExpr("exp(cast(id % 997 as double) / 100.0d) as v")
      .createOrReplaceTempView("hdr_a")
    spark.range(2500, 5000)
      .selectExpr("exp(cast(id % 997 as double) / 100.0d) as v")
      .createOrReplaceTempView("hdr_b")
    val cat2 = new MetaCatalog(
      java.nio.file.Files.createTempDirectory("graft-hdr2").toString)
    SketchOps.createHdr(spark, cat2, "hdr_a", "v", 32)
    SketchOps.createHdr(spark, cat2, "hdr_b", "v", 32)
    val merged = HdrSketch
      .deserialize(cat2.getSketch("hdr_a", "v", "hdr").get.data)
      .merge(HdrSketch.deserialize(cat2.getSketch("hdr_b", "v", "hdr").get.data))
    assert(merged.serialize.sameElements(s.data))
    // hand-built walk: negatives ascend from the most negative bucket,
    // zero serves 0 exactly, positives interpolate within their bucket
    val z = HdrSketch(32, 3, Vector(((1, 0), 2L)), Vector(((0, 0), 5L)))
    assert(z.percentile(0.0).get == -2.0 * (1.0 + 1.0 / 32))
    assert(z.percentile(0.3).get == 0.0)
    assert(z.percentile(1.0).get == 1.0 + (1.0 / 32) * ((9.0 - 5.0) / 5.0))
    assert(HdrSketch(32, 0, Vector.empty, Vector.empty).percentile(0.5).isEmpty)
  }

  test("HdrSketch.rangeCount: covered buckets exact, clipped edges bounded, zero point mass") {
    import graft.sketch.HdrSketch
    // m=32: neg (0,0) = [-1.03125, -1) c=3; zero c=5;
    // pos (0,0) = [1, 1.03125) c=4, (0,16) = [1.5, 1.53125) c=6,
    // (1,0) = [2, 2.0625) c=10
    val sk = HdrSketch(32, 5, Vector(((0, 0), 3L)),
      Vector(((0, 0), 4L), ((0, 16), 6L), ((1, 0), 10L)))
    // unbounded: everything interior, zero strictly inside
    assert(sk.rangeCount(None, None) == ((28.0, 0L)))
    // [1, 2): both covered pos buckets exact, nothing clipped
    assert(sk.rangeCount(Some(1.0), Some(2.0)) == ((10.0, 0L)))
    // a half-bucket clip: fraction of the count, full count as bound
    assert(sk.rangeCount(Some(1.5), Some(1.515625)) == ((3.0, 6L)))
    // bound AT zero: zero bucket is boundary mass, estimate excludes it
    assert(sk.rangeCount(Some(0.0), None) == ((20.0, 5L)))
    // zero strictly inside: exact
    assert(sk.rangeCount(Some(-2.0), Some(0.5)) == ((8.0, 0L)))
    // negative-side clip mirrors: [-1.03125, -1.015625) is half of c=3
    assert(sk.rangeCount(Some(-2.0), Some(-1.015625)) == ((1.5, 3L)))
    // empty range
    assert(sk.rangeCount(Some(5.0), Some(4.0)) == ((0.0, 0L)))
  }

  test("HdrSketch.rangePercentile: segment rule over the clipped log grid") {
    import graft.sketch.HdrSketch
    // the rangeCount fixture: neg (0,0)=[-1.03125,-1) c=3; zero c=5;
    // pos (0,0)=[1,1.03125) c=4, (0,16)=[1.5,1.53125) c=6,
    // (1,0)=[2,2.0625) c=10
    val sk = HdrSketch(32, 5, Vector(((0, 0), 3L)),
      Vector(((0, 0), 4L), ((0, 16), 6L), ((1, 0), 10L)))
    // unbounded: everything interior; total 28, target 14 lands in
    // (0,16) after cum 12 (neg 3 + zero 5 + pos 4)
    assert(sk.rangePercentile(None, None, 0.5)
      .contains(1.5 + (1.0 / 32) * ((14.0 - 12.0) / 6.0)))
    // interior-only range [1,2): total 10, target 5 after cum 4
    assert(sk.rangePercentile(Some(1.0), Some(2.0), 0.5)
      .contains(1.5 + (1.0 / 32) * ((5.0 - 4.0) / 6.0)))
    // left-clipped low edge: [1.515625, 3) halves (0,16) (ma=3) and
    // fully covers (1,0) (interior 10). target <= ma serves inside
    // the covered span; past it the interior walk takes over
    assert(sk.rangePercentile(Some(1.515625), Some(3.0), 0.1)
      .contains(1.515625 + 0.015625 * ((0.1 * 13.0) / 3.0)))
    assert(sk.rangePercentile(Some(1.515625), Some(3.0), 0.5)
      .contains(2.0 + 0.0625 * ((0.5 * 13.0 - 3.0) / 10.0)))
    // right-clipped high edge: [1, 2.03125) halves (1,0) (mb=5) after
    // interior 10; target 13.5 interpolates the covered span
    assert(sk.rangePercentile(Some(1.0), Some(2.03125), 0.9)
      .contains(2.0 + 0.03125 * ((0.9 * 15.0 - 10.0) / 5.0)))
    // both edges inside ONE bucket: the doubly clipped partial
    // interpolates its own span
    assert(sk.rangePercentile(Some(1.5078125), Some(1.5234375), 0.5)
      .contains(1.515625))
    // the zero bucket serves exactly 0.0
    assert(sk.rangePercentile(Some(-0.5), Some(0.5), 0.5).contains(0.0))
    // no covered mass -> None (exact over zero rows is NULL)
    assert(sk.rangePercentile(Some(3.0), Some(4.0), 0.5).isEmpty)
    assert(sk.rangePercentile(Some(5.0), Some(4.0), 0.5).isEmpty)
  }

  test("a group-key spec matching a schema column keys on the COLUMN, never a parsed expression") {
    import org.apache.spark.sql.functions.expr
    // the table has a column literally named "a+b" AND columns a, b:
    // the old expr() routing would silently parse the spec as the
    // addition a + b; the schema-first match must key on the column
    spark.range(0, 200).select(
      expr("concat('x', id % 2)").as("a+b"),
      expr("cast(id % 3 as long)").as("a"),
      expr("cast(id % 5 as long)").as("b"),
      expr("concat('v', id % 40)").as("v"))
      .createOrReplaceTempView("exotic_t")
    val cat = new MetaCatalog(
      java.nio.file.Files.createTempDirectory("graft-exotic").toString)
    SketchOps.createGroupedHll(spark, cat, "exotic_t", Seq("a+b"), "v", 12)
    val s = cat.getSketch("exotic_t", "v", "hll_grouped").get
    val keys = graft.sketch.GroupedHll.unpack(s.data).map(_._1).toSet
    // column values — NOT the sums {0..6} the addition would produce
    assert(keys == Set(Some("x0"), Some("x1")), keys.toString)
    // a spec that is NOT a schema column still parses as an expression
    // (the round-10 time-bucket contract)
    SketchOps.createGroupedHll(spark, cat, "exotic_t", Seq("a % 2"), "v", 12)
    val s2 = cat.getSketch("exotic_t", "v", "hll_grouped").get
    val keys2 = graft.sketch.GroupedHll.unpack(s2.data).map(_._1).toSet
    assert(keys2 == Set(Some("0"), Some("1")), keys2.toString)
  }
}
