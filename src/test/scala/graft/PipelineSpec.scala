package graft

import org.apache.spark.sql.functions._
import graft.queries.{Analytics, Dedup, Events, TextAnalysis}

/** Invariant checks for the round-5 pipeline operators on sf0.001:
  * dedup-cluster assignment (q44), KMV distinct estimation (q45),
  * bucketed interval self-join (q46), deterministic corpus split (q47),
  * and collocation mining (q48). Value-level correctness is enforced by
  * the DuckDB oracle gate; these pin the semantic properties.
  */
class PipelineSpec extends SparkSpec {

  test("dedup clusters: edge endpoints co-clustered, ids are member minima") {
    val edges = Dedup.minhashEdges(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.queries("q44_dedup_clusters")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(edges.nonEmpty && clusters.nonEmpty)
    // every doc on an edge got a cluster, and both endpoints agree
    edges.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"edge ($a,$b) split across clusters")
    }
    // each cluster's id is the minimum doc_id among its members
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid not the min member")
    }
    // transitivity: a cluster never contains two different edge-components
    // (spot-checked by the recursive-CTE oracle at sf0.01; here we check
    // the assignment covers exactly the edge-incident docs)
    val incident = edges.flatMap(e => Seq(e._1, e._2)).toSet
    assert(clusters.keySet == incident)
  }

  test("kmv: small-cardinality case is exact, estimator fields consistent") {
    val r = Analytics.queries("q45_kmv_distinct")(spark, sfDir).collect().head
    val kUsed = r.getAs[Long]("k_used")
    val est = r.getAs[Double]("est_distinct")
    val exact = r.getAs[Long]("n_exact")
    assert(kUsed > 0 && kUsed <= 64)
    assert(r.getAs[Long]("kth_hash") > 0)
    if (kUsed < 64) {
      // sketch saw every distinct value -> exact by construction
      assert(est == exact.toDouble)
      assert(math.abs(r.getAs[Double]("rel_error")) < 1e-12)
    } else {
      // KMV standard error is ~1/sqrt(k-2); allow 5 sigma
      assert(math.abs(est - exact) / exact < 5.0 / math.sqrt(62.0))
    }
  }

  test("interval join: banded equi-join equals the naive range join") {
    val banded = Events.queries("q46_interval_join")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("sum_gap_us"))).toMap
    val e = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"))
    val naive = e.as("a").join(e.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.us") > col("a.us") &&
          col("b.us") <= col("a.us") + 3600L * 1000000L)
      .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
      .agg(count(lit(1)).as("n"), sum(col("b.us") - col("a.us")).as("g"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("g"))).toMap
    assert(banded == naive)
  }

  test("corpus split: partitions the corpus 90/5/5 by doc count") {
    val rows = TextAnalysis.queries("q47_corpus_split")(spark, sfDir).collect()
    val bySplit = rows.map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(bySplit.values.sum == total)
    // hash buckets are uniform enough that train dominates at 500 docs
    assert(bySplit("train") > bySplit.getOrElse("val", 0L))
    assert(bySplit("train") > bySplit.getOrElse("test", 0L))
  }

  test("agms join-size: estimate within sketch error of the true size") {
    val r = graft.queries.Aqp.queries("q62_join_size_agms")(spark, sfDir)
      .collect().head
    val est = r.getAs[Long]("est_join_size")
    val exact = r.getAs[Long]("exact_join_size")
    assert(r.getAs[Int]("n_buckets") == 1024)
    assert(exact > 0)
    // AGMS rel std dev ~ sqrt(2/B) ~ 4.4%; allow a generous 10-sigma
    assert(math.abs(est - exact).toDouble / exact < 0.5,
      s"est=$est exact=$exact")
    assert(r.getAs[Double]("rel_error") == (est - exact).toDouble / exact)
  }

  test("sampled join agg: HT scaling recomputable, estimates near exact") {
    val rows = graft.queries.Aqp.queries("q68_sampled_join_agg")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_rows") == r.getAs[Long]("n_sampled") * 10)
      val est = r.getAs[Double]("est_revenue")
      val exact = r.getAs[Double]("exact_revenue")
      assert(exact > 0)
      // p=0.1 keyed-hash Bernoulli at spec scale: generous 50% bound
      assert(math.abs(est - exact) / exact < 0.5, s"est=$est exact=$exact")
      assert(r.getAs[Double]("rel_error") == (est - exact) / exact)
    }
  }

  test("weighted sample: strata consistent, HT terms recomputable") {
    val r = graft.queries.Aqp.queries("q63_weighted_sample")(spark, sfDir)
      .collect().head
    val (nh, nm, nl) = (r.getAs[Long]("n_high"), r.getAs[Long]("n_mid"),
      r.getAs[Long]("n_low"))
    val exactDocs = r.getAs[Long]("exact_docs")
    assert(nh >= 0 && nm >= 0 && nl >= 0)
    assert(nh + nm + nl <= exactDocs) // a sample, never more than the corpus
    // HT estimate recomputable from the kept counts in the same form
    val expect = (nh.toDouble + (nm * 10000).toDouble / 3000.0) +
      (nl * 10000).toDouble / 500.0
    assert(r.getAs[Double]("est_docs") == expect)
    assert(r.getAs[Double]("err_docs") ==
      (expect - exactDocs.toDouble) / exactDocs.toDouble)
  }

  test("collocations: counts honored and lift recomputable from the corpus") {
    val rows = TextAnalysis.queries("q48_collocations")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(split(lower(col("text")), " ").as("t"))
    val uni = toks.select(explode(col("t")).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nn = toks.select((size(col("t")) - 1).as("m"))
      .filter(col("m") >= 1).agg(sum("m")).collect().head.getLong(0)
    rows.foreach { r =>
      val (x, y) = (r.getString(0), r.getString(1))
      val nxy = r.getAs[Long]("nxy")
      assert(nxy >= 5)
      val expect = (nxy * nn).toDouble / (uni(x) * uni(y)).toDouble
      assert(r.getAs[Double]("lift") == expect, s"lift mismatch for ($x,$y)")
    }
  }
}
