package graft

import graft.queries.Similarity

/** Invariant checks for the similarity/ANN operators on sf0.001.
  * (Value-level correctness is enforced by the DuckDB oracle gate; these
  * specs pin the structural/semantic properties the hashes can't express,
  * e.g. that IVF never beats brute force.)
  */
class SimilaritySpec extends SparkSpec {

  private def run(name: String) = Similarity.queries(name)(spark, sfDir)

  test("label diversity: O(n) sum-vector identity equals brute-force pairs") {
    import org.apache.spark.sql.functions._
    val rows = Similarity.queries("q70_label_diversity")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // brute-force check on one label: mean pairwise cosine of the
    // quantized unit vectors, computed over all n(n-1)/2 pairs
    val label = rows.head.getAs[Int]("label")
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("label") === label)
      .collect().map { r =>
        val v = r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray
        val nrm = v.map(x => math.floor(x * x * 1e6).toLong).sum
        v.map(x => math.floor(x / math.sqrt(nrm / 1e6) * 1e4).toLong)
      }
    val n = vecs.length
    var acc = 0.0
    for (i <- vecs.indices; j <- vecs.indices if i < j)
      acc += vecs(i).zip(vecs(j)).map { case (a, b) => (a * b).toDouble }.sum
    val brute = 2.0 * acc / (n.toDouble * (n - 1).toDouble * 1e8)
    val got = rows.find(_.getAs[Int]("label") == label).get
      .getAs[Double]("mean_pairwise_cos")
    assert(math.abs(got - brute) < 1e-9, s"identity=$got brute=$brute")
    rows.foreach { r =>
      val m = r.getAs[Double]("mean_pairwise_cos")
      assert(m >= -1.0 - 1e-6 && m <= 1.0 + 1e-6)
    }
  }

  test("embed near-dup pairs are ordered, deduplicated, above threshold") {
    val rows = run("q40_embed_neardup").collect()
    assert(rows.nonEmpty)
    val seen = scala.collection.mutable.Set[(Long, Long)]()
    rows.foreach { r =>
      val a = r.getAs[Long]("vec_a"); val b = r.getAs[Long]("vec_b")
      assert(a < b, s"pair not ordered: ($a, $b)")
      assert(seen.add((a, b)), s"duplicate pair ($a, $b)")
      val c = r.getAs[Double]("cos")
      assert(c >= Similarity.nearDupCos && c <= 1.0 + 1e-9, s"cos=$c")
    }
  }

  test("ivf top-k: ranks are dense per query, cosines non-increasing") {
    val byQ = run("q41_ivf_topk").collect()
      .groupBy(_.getAs[Long]("qid"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length),
        s"qid=$qid ranks not dense")
      val cosines = sorted.map(_.getAs[Double]("cos")).toSeq
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y - 1e-12 },
        s"qid=$qid cosines increase with rank")
      sorted.foreach(r => assert(r.getAs[Long]("nid") != qid))
    }
  }

  test("ivf top-1 never beats brute-force top-1 (subset search)") {
    def top1(name: String): Map[Long, Double] =
      run(name).collect()
        .filter(_.getAs[Int]("rank") == 1)
        .map(r => r.getAs[Long]("qid") -> r.getAs[Double]("cos")).toMap
    val bf = top1("q21_cosine_topk")
    val ivf = top1("q41_ivf_topk")
    assert(ivf.nonEmpty)
    ivf.foreach { case (qid, c) =>
      assert(bf.contains(qid) && c <= bf(qid) + 1e-9,
        s"qid=$qid ivf=$c bf=${bf.get(qid)}")
    }
  }

  test("pq/adc top-k: dense ranks, rescored cosines non-increasing, subset of brute force") {
    val rows = run("q166_pq_adc_topk").collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    byQ.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length),
        s"qid=$qid ranks not dense")
      val cosines = sorted.map(_.getAs[Double]("cos")).toSeq
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y - 1e-12 },
        s"qid=$qid cosines increase with rank")
      sorted.foreach(r => assert(r.getAs[Long]("nid") != qid))
    }
    // compressed-domain search over a 10-row shortlist can never beat
    // exhaustive exact search
    val bf = run("q21_cosine_topk").collect()
      .filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[Long]("qid") -> r.getAs[Double]("cos")).toMap
    byQ.foreach { case (qid, rs) =>
      val c = rs.filter(_.getAs[Int]("rank") == 1).head.getAs[Double]("cos")
      assert(bf.contains(qid) && c <= bf(qid) + 1e-9,
        s"qid=$qid pq=$c bf=${bf.get(qid)}")
    }
  }

  test("ivfpq composition: rescored results never beat brute force; ranks dense") {
    def top1(name: String): Map[Long, Double] =
      run(name).collect()
        .filter(_.getAs[Int]("rank") == 1)
        .map(r => r.getAs[Long]("qid") -> r.getAs[Double]("cos")).toMap
    val bf = top1("q21_cosine_topk")
    val ivfpq = top1("q170_ivfpq_topk")
    assert(ivfpq.nonEmpty)
    // any exactly-rescored subset search is bounded by exhaustive exact
    // search. NOTE deliberately NOT asserted: q170 ≤ q166 — an ADC
    // shortlist is not monotone under cell restriction (with fewer
    // competitors, a mediocre-ADC/high-cosine neighbor can enter the
    // probed top-10 that PQ-brute's crowd pushed out), so IVF+PQ can
    // legitimately beat PQ-brute on individual queries.
    ivfpq.foreach { case (qid, c) =>
      assert(bf.contains(qid) && c <= bf(qid) + 1e-9,
        s"qid=$qid ivfpq=$c bf=${bf.get(qid)}")
    }
    val rows = run("q170_ivfpq_topk").collect().groupBy(_.getAs[Long]("qid"))
    rows.foreach { case (qid, rs) =>
      assert(rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Int]("rank")).toSeq
        == (1 to rs.length), s"qid=$qid ranks not dense")
    }
  }

  test("pq training law: trained ADC recall beats the sliced-centroid init on a label-uninformative corpus") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    def vec(x: Double, y: Double, z: Double): Seq[Float] =
      Seq(x.toFloat, y.toFloat, z.toFloat) ++ Seq.fill(61)(0.0f)
    // Labels 0 and 2 hold IDENTICAL value multisets (2×e1 + 8×e3), so
    // their sliced codebook entries are bit-identical: sliced ADC
    // cannot separate the true e1 neighbors (high nids) from the e3
    // decoys (low nids) — everything codes to entry 0 by tie-break and
    // the shortlist fills with low-nid decoys. Lloyd training breaks
    // the tie through the deterministic empty-cell rule: iteration 1
    // pools all of A∪C into entry 0 and re-centers it (entry 2 keeps
    // the old value), iteration 2 then splits the e1 vectors (toward
    // the re-centered entry) from the e3 decoys (toward the kept one),
    // converging to the true cluster means.
    val rows =
      Seq((0L, 1, vec(1, 0, 0))) ++                              // query
        (1L to 16L).map(i =>
          (i, if (i <= 8) 0 else 2, vec(0, 0, 1))) ++            // decoys
        (17L to 26L).map(i => (i, 1, vec(0, 1, 0))) ++           // cell-1 mass
        (30L to 33L).map(i =>
          (i, if (i <= 31) 0 else 2, vec(1, 0.0001 * (i - 30), 0))) // true nbrs
    val fixture = rows.toDF("vec_id", "label", "embedding")
    val nemb = fixture.select(col("vec_id"), col("embedding"),
      expr("quantized_dot(embedding, embedding)").as("nrm"))
    val cent = Similarity.cellCentroidsOf(spark, fixture)
    val truth = Set(30L, 31L, 32L) // highest exact cosines after the query
    def recall(book: org.apache.spark.sql.DataFrame): Double = {
      val got = Similarity.pqAdcTopKOf(spark, fixture, nemb, book, 1L)
        .collect().map(_.getAs[Long]("nid")).toSet
      (got intersect truth).size.toDouble / truth.size
    }
    val sliced = recall(Similarity.pqSlicedBooks(cent))
    val trained = recall(
      Similarity.pqTrainedBooks(Similarity.pqSlices(fixture), cent))
    assert(trained >= sliced, s"trained $trained < sliced $sliced")
    assert(sliced < 1.0, s"fixture not adversarial: sliced recall $sliced")
    assert(trained == 1.0, s"training should recover the true cluster: $trained")
  }

  test("ivf multi-probe recall law: nprobe=4 recall >= nprobe=1 on a boundary-heavy corpus") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // a query assigned to cell a whose TRUE nearest neighbors live in
    // cell b, just across the boundary: cell a is e1-aligned, cell b is
    // mostly e2-pure (pulling its centroid away from the query) except
    // two members near the query's direction — the classic multi-probe
    // rescue shape
    def vec(x: Double, y: Double): Seq[Float] =
      (Seq(x.toFloat, y.toFloat) ++ Seq.fill(62)(0.0f))
    val rows =
      Seq((0L, "a", vec(0.9, 0.44))) ++                 // the query
        (8L to 17L).map(i =>
          (i, "a", vec(1.0, 0.0005 * (i - 8)))) ++      // cell a: e1-ish
        (18L to 27L).map(i =>
          (i, "b", vec(0.0005 * (i - 18), 1.0))) ++     // cell b: e2-pure
        Seq((28L, "b", vec(0.643, 0.766)),              // boundary members:
          (29L, "b", vec(0.64, 0.77)))                  // nearest to the
    // query (cos ~0.914 vs ~0.899 for cell a's members) yet closer to
    // cell b's centroid than to cell a's — single-probe misses them
    val fixture = rows.toDF("vec_id", "label", "embedding")
    val nemb = fixture.select(col("vec_id"), col("embedding"),
      expr("quantized_dot(embedding, embedding)").as("nrm"))

    // brute-force truth top-3 for the single query (id 0)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) =>
        math.floor(x.toDouble * y.toDouble * 1e6).toLong }.sum
      def n(v: Seq[Float]) = v.map(x =>
        math.floor(x.toDouble * x.toDouble * 1e6).toLong).sum
      dot.toDouble / math.sqrt(n(a).toDouble * n(b).toDouble)
    }
    val q = rows.head._3
    val truth = rows.drop(1).map { case (id, _, v) => id -> cos(q, v) }
      .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet

    def recall(nprobe: Int): Double = {
      val got = Similarity.ivfTopKOf(spark, fixture, nemb, nprobe)
        .collect().filter(_.getAs[Long]("qid") == 0L)
        .map(_.getAs[Long]("nid")).toSet
      (got intersect truth).size.toDouble / truth.size
    }
    val r1 = recall(1)
    val r4 = recall(4)
    assert(r4 >= r1, s"nprobe=4 recall $r4 < nprobe=1 recall $r1")
    // the fixture is engineered so single-probe MISSES the boundary
    // neighbors and multi-probe recovers them
    assert(r1 < 1.0, s"fixture not boundary-heavy: nprobe=1 recall $r1")
    assert(r4 == 1.0, s"multi-probe should recover all: recall $r4")
  }

  test("semantic dedup with ZERO cosine edges is already at the fixpoint: every vector keeps, no NPE (round-14 ADVICE regression)") {
    // a corpus of pairwise-orthogonal vectors: no pair reaches
    // semDedupCos, so the edge set is EMPTY and the label sum is NULL
    // on the very first probe — the pre-fix loop compared
    // null.compareTo(null) and died; the fixed loop recognizes the
    // empty fixpoint and keeps every vector as its own cluster
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-semdedup-empty").toString
    val rows = (0L until 6L).map { i =>
      // the corpus contract is 64-dim vectors (Similarity.scala:10)
      val v = Array.fill(64)(0.0f); v(i.toInt) = 1.0f
      (i, v.toSeq, i.toInt) // distinct labels: one vector per cell
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.semanticDedupOf(spark, dir).collect()
    assert(out.length == 6)
    out.foreach { r =>
      assert(r.getAs[Long]("cluster_id") == r.getAs[Long]("vec_id"))
      assert(r.getAs[Int]("kept") == 1)
    }
  }
}
