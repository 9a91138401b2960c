package graft

import org.apache.spark.sql.functions._
import graft.queries.{Analytics, Corpus, Events}

/** Invariant checks for the round-5 corpus-construction operators on
  * sf0.001: sequence packing (q49), contamination check (q50),
  * k-anonymity (q51), repetition scoring (q52), deterministic reservoir
  * (q53), and TF-IDF (q54). Value-level correctness is enforced by the
  * DuckDB oracle gate at sf0.01; these pin the semantic properties.
  */
class CorpusSpec extends SparkSpec {

  private def docCount: Long =
    spark.read.parquet(s"$sfDir/documents.parquet").count()

  test("seq packing: chunks partition the corpus and offsets are consistent") {
    val rows = Corpus.queries("q49_seq_packing")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docCount)
    val totalTokens = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(size(split(lower(col("text")), " ")).as("nt"))
      .agg(sum("nt")).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == totalTokens)
    // chunks are ordered and doc ranges never overlap (doc_id order is
    // the packing order)
    val sorted = rows.sortBy(_.getAs[Long]("chunk"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("chunk") < b.getAs[Long]("chunk"))
        assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
      case _ =>
    }
    // a chunk never holds more than budget + one straddling doc's tokens
    // fewer than budget tokens only for the final chunk
    sorted.dropRight(1).foreach { r =>
      assert(r.getAs[Long]("n_tokens") >= 1)
    }
  }

  test("shard shuffle: shards partition the corpus, positions dense, offsets are prefix sums") {
    val rows = Corpus.queries("q176_shard_shuffle")(spark, sfDir).collect()
    assert(rows.length == docCount)
    val byShard = rows.groupBy(_.getAs[Int]("shard"))
    assert(byShard.keySet.subsetOf((0 until Corpus.shuffleShards).toSet))
    val sizes = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byShard.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("pos"))
      // positions are 1..n dense, offsets are the running byte sum
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Int]("pos") == i + 1)
      }
      var off = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("offset") == off)
        off += sizes(r.getAs[Long]("doc_id"))
      }
    }
    // the permutation is hash-random, not id-ordered: some shard's
    // doc_ids must be non-monotone in position
    assert(byShard.values.exists { rs =>
      val ids = rs.sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("doc_id"))
      ids.sliding(2).exists { case Array(a, b) => a > b; case _ => false }
    })
  }

  test("contamination: reports exactly the test split, counts consistent") {
    val rows = Corpus.queries("q50_contamination")(spark, sfDir).collect()
    val split = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        expr(s"${graft.queries.Dedup.h60Spark("concat('split:', cast(doc_id as string))")} % 100")
          .as("b"))
    val testIds = split.filter(col("b") >= 95).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == testIds)
    rows.foreach { r =>
      val ns = r.getAs[Long]("n_shared_shingles")
      val ntd = r.getAs[Long]("n_train_docs")
      val flag = r.getAs[Int]("contaminated")
      assert(ns >= 0 && ntd >= 0)
      assert((ns > 0) == (flag == 1))
      assert((ns > 0) == (ntd > 0))
    }
  }

  test("k-anonymity: suppression flag matches the k rule, totals preserved") {
    val rows = Events.queries("q51_kanonymity")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalEvents = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == totalEvents)
    rows.foreach { r =>
      val nUsers = r.getAs[Long]("n_users")
      val suppressed = r.getAs[Int]("suppressed")
      assert((nUsers < Corpus.kAnon) == (suppressed == 1))
      if (suppressed == 1) assert(r.isNullAt(r.fieldIndex("released_n")))
      else assert(r.getAs[Long]("released_n") == r.getAs[Long]("n_events"))
      assert(nUsers <= r.getAs[Long]("n_events"))
    }
    // the pseudonymized report never carries a raw user id column
    val cols = Events.queries("q51_kanonymity")(spark, sfDir).columns.toSet
    assert(!cols.contains("user_id") && !cols.contains("pseudo"))
  }

  test("repetition: ratios bounded, flag matches the integer rule") {
    val rows = Corpus.queries("q52_repetition")(spark, sfDir).collect()
    assert(rows.length == docCount)
    rows.foreach { r =>
      val nTok = r.getAs[Long]("n_tokens")
      val nTyp = r.getAs[Long]("n_types")
      val topCnt = r.getAs[Long]("top_cnt")
      assert(nTyp >= 1 && nTyp <= nTok)
      assert(topCnt >= 1 && topCnt <= nTok)
      assert(r.getAs[Double]("top_ratio") == topCnt.toDouble / nTok)
      val d2 = r.getAs[Double]("dup2_ratio")
      assert(d2 >= 0.0 && d2 <= 1.0)
    }
  }

  test("reservoir: k per group, hash-ordered, reproducible") {
    val run1 = Analytics.queries("q53_reservoir")(spark, sfDir).collect()
    val run2 = Analytics.queries("q53_reservoir")(spark, sfDir).collect()
    assert(run1.map(_.toString).toSeq == run2.map(_.toString).toSeq)
    val byFlag = run1.groupBy(_.getAs[String]("l_returnflag"))
    byFlag.foreach { case (_, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
      // ranks follow ascending sample hash
      val hashes = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("sample_hash"))
      assert(hashes.toSeq == hashes.sorted.toSeq)
    }
  }

  test("mix weights: fractions in (0,1], targets within budget, sqrt weighting") {
    val rows = Corpus.queries("q55_mix_weights")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    val budget = totalTokens / 2
    assert(rows.map(_.getAs[Long]("target_tokens")).sum <= budget)
    rows.foreach { r =>
      val f = r.getAs[Double]("sample_frac")
      assert(f > 0.0 && f <= 1.0)
      val w = r.getAs[Long]("w")
      assert(w == math.floor(math.sqrt(r.getAs[Long]("n_tokens").toDouble) * 1e6).toLong)
      assert(r.getAs[Long]("target_tokens") <= budget)
    }
    // temperature weighting is monotone: more tokens -> weight no smaller
    val sorted = rows.sortBy(_.getAs[Long]("n_tokens"))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("w") <= b.getAs[Long]("w"))
      case _ =>
    }
  }

  test("bloom semi-join: no false negatives, counts reconcile") {
    val rows = Analytics.queries("q56_bloom_semijoin")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val exactByStatus = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_custkey").isin(dim.toSeq: _*))
      .groupBy(col("o_orderstatus")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val nb = r.getAs[Long]("n_bloom")
      val ne = r.getAs[Long]("n_exact")
      // a Bloom filter admits false positives but NEVER false negatives
      assert(nb >= ne)
      assert(r.getAs[Long]("n_false_pos") == nb - ne)
      assert(ne == exactByStatus.getOrElse(r.getAs[String]("o_orderstatus"), 0L))
    }
  }

  test("rate anomaly: flag matches the integer rule, windows bounded") {
    val rows = Events.queries("q57_rate_anomaly")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val tn = r.getAs[Long]("trailing_n")
      val th = r.getAs[Long]("trailing_hours")
      assert(n >= 1 && th >= 0 && th <= 7 && tn >= 0)
      val expected = if (th >= 3 && n * th > 2 * tn) 1 else 0
      assert(r.getAs[Int]("anomaly") == expected)
    }
    // trailing counts are per type: first row of each type has no history
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val first = rs.minBy(_.getAs[Long]("hb"))
      assert(first.getAs[Long]("trailing_hours") == 0L)
    }
  }

  test("corpus funnel: stages cumulative, stage 0 is the whole corpus") {
    val rows = Corpus.queries("q58_corpus_funnel")(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("stage"))
    assert(rows.length == 5)
    assert(rows.head.getAs[Long]("n_docs") == docCount)
    // each stage only removes documents (and tokens), never adds
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_docs") <= a.getAs[Long]("n_docs"))
        assert(b.getAs[Long]("n_tokens") <= a.getAs[Long]("n_tokens"))
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 0)
      // no surviving docs means no surviving tokens
      if (r.getAs[Long]("n_docs") == 0) assert(r.getAs[Long]("n_tokens") == 0)
    }
  }

  test("doc chunks: cover every token once per stride, sizes bounded") {
    val rows = Corpus.queries("q59_doc_chunks")(spark, sfDir).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.size.toLong == docCount)
    byDoc.foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Int]("chunk_id"))
      val nt = ordered.head.getAs[Int]("nt")
      // chunk count = number of stride starts <= nt
      assert(ordered.length == 1 + (nt - 1) / 96)
      ordered.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Int]("chunk_id") == i)
        assert(r.getAs[Int]("start_tok") == 1 + i * 96)
        val expectLen = math.min(128, nt - i * 96)
        assert(r.getAs[Int]("n_chunk_tokens") == expectLen)
      }
    }
  }

  test("hist quantiles: estimates bracket the exact values within a bucket") {
    val rows = Analytics.queries("q61_hist_quantiles")(spark, sfDir).collect()
    assert(rows.length == 3)
    val n = rows.head.getAs[Long]("n_total")
    rows.foreach { r =>
      val target = r.getAs[Long]("target")
      assert(target >= 1 && target <= n)
      val lo = r.getAs[Long]("bucket") * 30000.0
      val est = r.getAs[Double]("est")
      assert(est > lo && est <= lo + 30000.0)
      // the histogram estimate lands within one bucket width of exact
      assert(math.abs(r.getAs[Double]("abs_err")) <= 30000.0)
    }
  }

  test("conversion funnel: stages monotone, rates consistent") {
    val r = Events.queries("q64_conversion_funnel")(spark, sfDir).collect().head
    val (v, c, p) = (r.getAs[Long]("n_viewers"), r.getAs[Long]("n_clicked"),
      r.getAs[Long]("n_purchased"))
    assert(v >= c && c >= p) // each stage filters the previous stage's users
    assert(v > 0)
    assert(r.getAs[Double]("click_through") == c.toDouble / v.toDouble)
    if (c > 0)
      assert(r.getAs[Double]("purchase_through") == p.toDouble / c.toDouble)
  }

  test("equi-depth histogram: bins partition the table, roughly equal") {
    val r = Analytics.queries("q67_equidepth_hist")(spark, sfDir).collect().head
    val n = r.getAs[Long]("n_rows")
    val bins = Seq("n_q1", "n_q2", "n_q3", "n_q4").map(r.getAs[Long])
    assert(bins.sum == n) // the four bins cover every row exactly once
    assert(r.getAs[Double]("b1") <= r.getAs[Double]("b2"))
    assert(r.getAs[Double]("b2") <= r.getAs[Double]("b3"))
    // equi-depth: each quartile bin holds ~n/4 (loose bound for ties)
    bins.foreach(b => assert(b >= n / 8 && b <= 3 * n / 8, s"bin $b of $n"))
  }

  test("key skew profile: ratios bounded and recomputable") {
    val r = Analytics.queries("q65_key_skew_profile")(spark, sfDir).collect().head
    val (n, k, mx) = (r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"),
      r.getAs[Long]("max_key_rows"))
    assert(n > 0 && k > 0 && mx >= 1)
    assert(mx * k >= n) // max >= avg
    assert(r.getAs[Long]("top_share_ppm") == mx * 1000000 / n)
    assert(r.getAs[Long]("skew_x1000") == mx * k * 1000 / n)
    assert(r.getAs[Long]("skew_x1000") >= 1000)
  }

  test("tfidf: top-3 per doc, scores recomputable and ordered") {
    val rows = Corpus.queries("q54_tfidf")(spark, sfDir).collect()
    val n = docCount
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val ordered = rs.sortBy(_.getAs[Int]("rank"))
      ordered.foreach { r =>
        val expect = (r.getAs[Long]("tf") * n).toDouble / r.getAs[Long]("df")
        assert(r.getAs[Double]("score") == expect)
      }
      // rank order is non-increasing score
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("score") >= b.getAs[Double]("score"))
        case _ =>
      }
    }
  }
}
