package graft

import graft.queries.Similarity

/** Invariant checks for the similarity/ANN operators on sf0.001.
  * (Value-level correctness is enforced by the DuckDB oracle gate; these
  * specs pin the structural/semantic properties the hashes can't express,
  * e.g. that IVF never beats brute force.)
  */
class SimilaritySpec extends SparkSpec {

  private def run(name: String) = Similarity.queries(name)(spark, sfDir)

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
