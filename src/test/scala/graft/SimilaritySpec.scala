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
}
