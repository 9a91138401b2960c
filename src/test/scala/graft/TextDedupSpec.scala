package graft

import graft.queries.{Dedup, TextAnalysis}

/** Invariant checks for the text-analysis + dedup operators on sf0.001.
  * (Value-level correctness is enforced by the DuckDB oracle gate; these
  * specs pin the structural/semantic properties.)
  */
class TextDedupSpec extends SparkSpec {

  private def run(m: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame],
      name: String) = m(name)(spark, sfDir)

  test("rare tokens: ratio bounded, mean frequency >= 1") {
    val rows = run(TextAnalysis.queries, "q66_rare_tokens").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens"); val rare = r.getAs[Long]("n_rare")
      assert(rare >= 0 && rare <= n)
      val ratio = r.getAs[Double]("rare_ratio")
      assert(ratio == rare.toDouble / n.toDouble)
      // every token occurs at least once in the corpus (itself)
      assert(r.getAs[Double]("mean_corpus_freq") >= 1.0)
    }
  }

  test("token stats: types <= tokens, ttr in (0,1]") {
    val rows = run(TextAnalysis.queries, "q13_token_stats").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Int]("n_tokens"); val t = r.getAs[Int]("n_types")
      assert(t <= n && t > 0)
      val ttr = r.getAs[Double]("ttr")
      assert(ttr > 0 && ttr <= 1.0)
    }
  }

  test("lang id: prediction is one of the marker languages or und") {
    val ok = TextAnalysis.markers.map(_._1).toSet + "und"
    run(TextAnalysis.queries, "q14_lang_id").collect().foreach { r =>
      assert(ok.contains(r.getAs[String]("pred_lang")))
    }
  }

  test("quality: bucket agrees with score thresholds") {
    run(TextAnalysis.queries, "q15_quality_score").collect().foreach { r =>
      val s = r.getAs[Double]("score"); val b = r.getAs[String]("bucket")
      val expect = if (s >= 0.7) "high" else if (s >= 0.4) "mid" else "low"
      assert(b == expect, s"score=$s bucket=$b")
    }
  }

  test("exact dedup partitions the corpus; representatives are minima") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val groups = run(Dedup.queries, "q17_dedup_exact").collect()
    assert(groups.map(_.getAs[Long]("n_docs")).sum == docs)
    assert(groups.length <= docs)
  }

  test("minhash-lsh pairs are ordered, scored in [5/12, 1]") {
    run(Dedup.queries, "q18_minhash_lsh").collect().foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val e = r.getAs[Double]("est_jaccard")
      assert(e >= 5.0 / 12 - 1e-9 && e <= 1.0)
    }
  }

  test("exact jaccard pairs exceed threshold and are ordered") {
    val pairs = run(Dedup.queries, "q19_ngram_jaccard").collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.5 && j <= 1.0)
    }
  }

  test("prefix-filtered jaccard: identical output to the full join, strictly fewer candidates") {
    val full = run(Dedup.queries, "q19_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val pref = run(Dedup.queries, "q165_prefix_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pref == full) // completeness AND exactness, value for value
    val (fullCands, prefCands, ppCands) = Dedup.prefixFilterStats(spark, sfDir)
    assert(prefCands <= fullCands)
    assert(prefCands < fullCands,
      s"prefix filter must shrink the candidate set: $prefCands vs $fullCands")
    assert(ppCands <= prefCands,
      s"length+positional filters must not grow the candidate set: $ppCands vs $prefCands")
    assert(ppCands >= full.size,
      s"candidates must cover every true pair: $ppCands vs ${full.size}")
  }

  test("simhash: 64-bit signatures; near-dup pairs are hamming-close") {
    val sig = run(Dedup.queries, "q20_simhash").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("simhash")).toMap
    sig.values.foreach { s =>
      assert(s.length == 64 && s.forall(c => c == '0' || c == '1'))
    }
    def hamming(a: String, b: String): Int =
      a.zip(b).count { case (x, y) => x != y }
    val nearPairs = run(Dedup.queries, "q19_ngram_jaccard").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    if (nearPairs.nonEmpty) {
      val nearAvg = nearPairs.map { case (a, b) => hamming(sig(a), sig(b)) }
        .sum.toDouble / nearPairs.length
      // baseline: consecutive doc ids (random content at this corpus size)
      val ids = sig.keys.toSeq.sorted
      val basePairs = ids.zip(ids.tail)
        .filterNot { case (a, b) => nearPairs.contains((a, b)) }
      val baseAvg = basePairs.map { case (a, b) => hamming(sig(a), sig(b)) }
        .sum.toDouble / basePairs.length
      assert(nearAvg < baseAvg,
        s"near-dup avg hamming $nearAvg should beat baseline $baseAvg")
    }
  }
}
