package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-construction operators — the steps between "filtered documents"
  * and "training batches" in an LLM data pipeline: sequence packing into
  * fixed token budgets, train/test contamination checking, intra-document
  * repetition scoring, and TF-IDF keyterm extraction.
  *
  * None exist in the reference (whose only data model is SQL rows); they
  * extend the engine toward the declared north-star workload. All four
  * are exact and deterministic, so each carries a bit-for-bit DuckDB
  * oracle.
  *
  * Ordering note (round 17): per-doc/per-chunk outputs sort via
  * Checkpoints.sortedOnce — the heavy pre-sort stage is lazily
  * localCheckpointed so the range sort's sampling pass cannot re-execute
  * it (the round-16 diagnosis), while the sort stays PARALLEL (the
  * round-16 repartition(1) funneled corpus-sized output through one
  * task — the 100 TB liability this round removes).
  *
  * Scale design:
  *  - q49 packing is the distributed two-phase prefix-scan: per-bucket
  *    subtotals (one small aggregate), a driver-scale cumulative offset
  *    over the bucket table, then per-bucket local prefix sums under
  *    `Window.partitionBy(bucket)` — no global single-partition window
  *    ever sees the full corpus.
  *  - q50 contamination joins hashed-shingle sets (8-byte keys, the q19
  *    inverted-index machinery) restricted to the test split on one side
  *    — at 100 TB the test side is tiny, so the join is a broadcast of
  *    test shingles against the train posting list.
  *  - q52 repetition is per-row array arithmetic plus one (doc, token)
  *    hash-aggregate — linear, no self-joins.
  *  - q54 TF-IDF is two hash-aggregates plus a vocabulary-sized
  *    broadcast join; scores are exact integer ratios (tf·N/df), a
  *    log-free monotone transform of add-nothing TF-IDF, so ordering
  *    matches and values are bit-portable across engines.
  */
object Corpus {

  /** Token budget per packed training chunk (q49). */
  val packBudget: Long = 512L

  /** Shard count for the deterministic pre-training shuffle (q176). At
    * cluster scale this is sized so one shard ≈ one comfortable write
    * task (100 TB / S); the manifest arithmetic is S-independent.
    */
  val shuffleShards: Int = 16

  /** doc_ids per coarse prefix-scan bucket (q49). At cluster scale this
    * is sized so the bucket table (one row per bucket) stays driver- or
    * broadcast-scale while each bucket's local window fits one task.
    */
  val packBucket: Long = 64L

  /** Suppression threshold for the k-anonymity report (shared with the
    * Events module's q51).
    */
  val kAnon: Long = 3L

  private def tokenized(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))

  /** [[tokenized]] twin for doc_id-ORDERED outputs (the TextAnalysis
    * rtoks note): the distribution exchange is a RANGE exchange on the
    * raw scan, so the final order needs only sortWithinPartitions — no
    * second exchange, no single-task funnel, bounds sampled from cheap
    * scan rows.
    */
  private def rtokenized(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .repartitionByRange(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))

  private val duckTok =
    "SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents"

  /** (doc_id, tok, cnt) token counts — one hash-aggregate, shared by the
    * repetition and TF-IDF operators.
    */
  private def tokenCounts(s: SparkSession, dir: String): DataFrame =
    tokenized(s, dir)
      .select(col("doc_id"), explode(col("t")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))

  private val duckTokenCounts =
    s"""SELECT doc_id, tok, count(*) AS cnt
        FROM (SELECT doc_id, unnest(t) AS tok FROM ($duckTok))
        GROUP BY doc_id, tok"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Sequence packing: assign each document (in deterministic doc_id
    // order) to the fixed-token-budget training chunk where its global
    // token offset starts — the "concat corpus, cut every B tokens"
    // step of batch construction. The global running offset is computed
    // as a distributed two-phase prefix scan (bucket subtotals ->
    // bucket offsets -> per-bucket local prefix), never a
    // whole-corpus single-partition window.
    "q49_seq_packing" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = tokenized(s, dir)
        .select(col("doc_id"), expr("size(t)").as("nt"),
          expr(s"doc_id div ${packBucket}L").as("bucket"))
      val bucketTotals = docs.groupBy(col("bucket"))
        .agg(sum(col("nt")).as("btot"))
      // the bucket table is corpus_size/packBucket rows — small enough
      // that one ordered window over it is fine (and at extreme scale
      // the same two-phase trick applies recursively)
      val wOff = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = bucketTotals
        .withColumn("boff", coalesce(sum(col("btot")).over(wOff), lit(0L)))
        .select(col("bucket"), col("boff"))
      val wLocal = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docs.join(broadcast(offsets), "bucket")
        .withColumn("lp", coalesce(sum(col("nt")).over(wLocal), lit(0L)))
        .withColumn("chunk", expr(s"(boff + lp) div ${packBudget}L"))
        .groupBy(col("chunk"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("chunk"))
    }),

    // Train/test contamination check: for every test-split document,
    // how many of its (df-guarded) 3-gram shingle hashes also appear in
    // any train-split document, and how many train documents share one.
    // The split is q47's content-independent hash bucket; the shingle
    // machinery (60-bit hashes + stop-shingle guard) is q19's.
    // DETERMINISTIC SHARD SHUFFLE manifest (round 12): the global
    // pre-training shuffle — every epoch pipeline starts by scattering
    // the curated corpus across S shards in a pseudo-random but
    // REPRODUCIBLE order. shard = keyed-h60 % S routes each document;
    // within-shard order is (hash, doc_id) — a hash-random permutation
    // with NO GLOBAL SORT: at 100 TB this is one repartition(S)
    // exchange plus a per-shard local sort (sortWithinPartitions), and
    // what this query emits is the MANIFEST a trainer's loader seeks
    // by — (shard, position, starting byte offset) per document, the
    // offsets from a per-shard running sum (each shard's window is one
    // partition; S is chosen so a shard fits a task). Every column is
    // a pure integer function of doc_ids, so the whole manifest is
    // re-derived bit-for-bit in DuckDB.
    "q176_shard_shuffle" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val d = Tables.load(s, dir, "documents")
      Checkpoints.sortedOnce(s, "q176_sorted",
        d.select(col("doc_id"), col("n_chars"),
          expr("graft_h60(concat('sh:', cast(doc_id as string)))").as("hh"))
        .withColumn("shard", expr(s"cast(hh % $shuffleShards as int)"))
        .withColumn("pos", expr(
          "row_number() over (partition by shard order by hh asc, doc_id asc)"))
        .withColumn("offset", expr(
          "coalesce(sum(n_chars) over (partition by shard " +
            "order by hh asc, doc_id asc " +
            "rows between unbounded preceding and 1 preceding), " +
            "cast(0 as bigint))"))
        .select(col("doc_id"), col("shard"), col("pos"), col("offset")))(
        col("shard"), col("pos"))
    }),

    "q50_contamination" -> ((s, dir) => {
      // memoized df-guarded posting list (the Dedup.keptShingles note)
      val kept = Dedup.keptShingles(s, dir).select(col("doc_id"), col("h"))
      val split = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          expr(s"${Dedup.h60Spark("concat('split:', cast(doc_id as string))")} % 100")
            .as("b"))
      val testIds = split.filter(col("b") >= 95).select(col("doc_id"))
      val trainIds = split.filter(col("b") < 90).select(col("doc_id"))
      val testSh = kept.join(broadcast(testIds), "doc_id")
        .select(col("doc_id").as("t_doc"), col("h"))
      val trainSh = kept.join(trainIds, "doc_id")
        .select(col("doc_id").as("r_doc"), col("h"))
      val overlap = testSh.join(trainSh, "h")
        .groupBy(col("t_doc"))
        .agg(countDistinct(col("h")).as("ns"),
          countDistinct(col("r_doc")).as("ntd"))
      Checkpoints.sortedOnce(s, "q50_sorted",
        testIds.join(overlap, testIds("doc_id") === overlap("t_doc"), "left")
          .select(col("doc_id"),
            coalesce(col("ns"), lit(0L)).as("n_shared_shingles"),
            coalesce(col("ntd"), lit(0L)).as("n_train_docs"),
            expr("case when ns is not null and ns > 0 then 1 else 0 end")
              .as("contaminated")))(col("doc_id"))
    }),

    // Intra-document repetition scoring (the Gopher-style "repetitive
    // content" quality signals): top-token concentration and duplicate
    // 2-gram fraction, with an integer-arithmetic repetition flag.
    "q52_repetition" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // round 17: cnts feeds BOTH the top-token window and the stats
      // aggregate — without the checkpoint the token-count aggregate
      // ran twice per invocation (q54 already materialized its copy);
      // one-generation retire keeps the bench's passes from
      // accumulating block generations
      val cnts = tokenCounts(s, dir).localCheckpoint()
      Checkpoints.retireSwap(s, "q52_cnts", cnts)
      val wTop = Window.partitionBy(col("doc_id"))
        .orderBy(col("cnt").desc, col("tok").asc)
      val top = cnts.withColumn("rn", row_number().over(wTop))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("tok").as("top_tok"), col("cnt").as("top_cnt"))
      val stats = cnts.groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_tokens"), count(lit(1)).as("n_types"))
      val g2 = tokenized(s, dir).select(col("doc_id"),
        expr("case when size(t) >= 2 then size(t) - 1 else 0 end").as("n2"),
        expr("""case when size(t) >= 2
                then size(array_distinct(transform(sequence(1, size(t) - 1),
                  i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))))
                else 0 end""").as("d2"))
      Checkpoints.sortedOnce(s, "q52_sorted",
        stats.join(top, "doc_id").join(g2, "doc_id")
          .select(col("doc_id"), col("n_tokens"), col("n_types"),
            col("top_tok"), col("top_cnt"),
            expr("cast(top_cnt as double) / n_tokens").as("top_ratio"),
            expr("case when n2 > 0 then cast(n2 - d2 as double) / n2 else cast(0 as double) end")
              .as("dup2_ratio"),
            // integer comparisons, no float threshold ambiguity:
            // top token >10% of tokens, or >10% duplicate bigrams
            expr("case when top_cnt * 10 > n_tokens or (n2 - d2) * 10 > n2 then 1 else 0 end")
              .as("rep_flag")))(col("doc_id"))
    }),

    // Corpus mixing weights: per-source sampling plan for a token budget
    // of half the corpus under temperature-2 multinomial weighting
    // (weight ~ sqrt(source tokens) — the standard upweight-the-tail
    // mixing rule for multilingual/multi-domain training sets). sqrt is
    // IEEE-correctly-rounded in both engines and is quantized to an
    // integer weight, so every downstream ratio is exact integer
    // arithmetic and the plan is bit-portable. One hash-aggregate over
    // the corpus + a broadcast of the (tiny) per-source totals.
    "q55_mix_weights" -> ((s, dir) => {
      val perSource = Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("source"), expr("size(split(lower(text), ' '))").as("nt"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
        .withColumn("w",
          expr("cast(floor(sqrt(cast(n_tokens as double)) * 1000000) as bigint)"))
      val totals = perSource.agg(sum(col("w")).as("tw"),
        expr("sum(n_tokens) div 2").as("budget"))
      perSource.crossJoin(broadcast(totals))
        .withColumn("target_tokens", expr("(budget * w) div tw"))
        .withColumn("sample_frac", expr(
          "least(cast(1 as double), cast(target_tokens as double) / cast(n_tokens as double))"))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("w"),
          col("target_tokens"), col("sample_frac"))
        .orderBy(col("source"))
    }),

    // Corpus-construction funnel: the composed selection pass of a
    // training-data pipeline — each stage applies one of the engine's
    // own filter rules CUMULATIVELY and reports surviving docs/tokens:
    //   0 all -> 1 declared-language filter -> 2 quality score (q15
    //   formula) -> 3 repetition guard (q52's duplicate-2-gram integer
    //   rule) -> 4 exact-dedup representative (q17's min-doc_id rule).
    // Shape: one narrow per-row pass computes every flag except dedup
    // (one md5 hash-aggregate + a representative join), then a single
    // aggregate row unpivots to the 5-stage report — no per-stage
    // rescans of the corpus.
    "q58_corpus_funnel" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), col("lang"),
          split(lower(col("text")), " ").as("t"),
          md5(col("text")).as("ck"))
      val rep = docs.groupBy(col("ck")).agg(min(col("doc_id")).as("rep_id"))
      val flags = docs
        .withColumn("nt", expr("size(t)"))
        .withColumn("score", expr(TextAnalysis.scoreSpark("t")))
        .withColumn("n2", expr("case when size(t) >= 2 then size(t) - 1 else 0 end"))
        .withColumn("d2", expr(
          """case when size(t) >= 2
              then size(array_distinct(transform(sequence(1, size(t) - 1),
                i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))))
              else 0 end"""))
        .join(rep, "ck")
        .withColumn("c1", expr("case when lang = 'en' then 1 else 0 end"))
        .withColumn("c2", expr("case when c1 = 1 and score >= 0.4 then 1 else 0 end"))
        .withColumn("c3", expr("case when c2 = 1 and not ((n2 - d2) * 10 > n2) then 1 else 0 end"))
        .withColumn("c4", expr("case when c3 = 1 and doc_id = rep_id then 1 else 0 end"))
      flags.agg(
        count(lit(1)).as("n0"), sum(col("nt")).as("t0"),
        sum(col("c1")).as("n1"), sum(expr("c1 * nt")).as("t1"),
        sum(col("c2")).as("n2s"), sum(expr("c2 * nt")).as("t2"),
        sum(col("c3")).as("n3"), sum(expr("c3 * nt")).as("t3"),
        sum(col("c4")).as("n4"), sum(expr("c4 * nt")).as("t4"))
        .select(expr(
          """stack(5,
               0, 'all', n0, t0,
               1, 'lang_en', n1, t1,
               2, 'quality', n2s, t2,
               3, 'repetition', n3, t3,
               4, 'dedup', n4, t4) AS (stage, stage_name, n_docs, n_tokens)"""))
        .orderBy(col("stage"))
    }),

    // Per-document CURATION VERDICT (round 11): the row-level artifact
    // a pipeline actually writes — q58's funnel rules applied per
    // document with the FIRST failing stage as the reason (lang →
    // quality → repetition → duplicate; q17's min-doc_id exact-dedup
    // representative rule). Same one-pass shape as q58: a narrow
    // per-row pass + one md5 hash-aggregate + a representative join;
    // at 100 TB this is the job that materializes the kept corpus.
    "q159_curation_verdict" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), col("lang"),
          split(lower(col("text")), " ").as("t"),
          md5(col("text")).as("ck"))
      val rep = docs.groupBy(col("ck")).agg(min(col("doc_id")).as("rep_id"))
      Checkpoints.sortedOnce(s, "q159_sorted", docs
        .withColumn("score", expr(TextAnalysis.scoreSpark("t")))
        .withColumn("n2", expr("case when size(t) >= 2 then size(t) - 1 else 0 end"))
        .withColumn("d2", expr(
          """case when size(t) >= 2
              then size(array_distinct(transform(sequence(1, size(t) - 1),
                i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))))
              else 0 end"""))
        .join(rep, "ck")
        .withColumn("reason", expr(
          "case when lang <> 'en' then 'lang' " +
            "when score < 0.4 then 'quality' " +
            "when (n2 - d2) * 10 > n2 then 'repetition' " +
            "when doc_id <> rep_id then 'duplicate' " +
            "else 'keep' end"))
        .select(col("doc_id"),
          expr("case when reason = 'keep' then 1 else 0 end").as("kept"),
          col("reason")))(col("doc_id"))
    }),


    // Sliding-window document chunking: cut each document into
    // fixed-size token chunks (size 128, stride 96 — 32-token overlap),
    // the context-window preparation step that, unlike q49's packing,
    // splits WITHIN documents and never crosses them. Pure per-row
    // array arithmetic (sequence + slice under one explode): linear,
    // shuffle-free until the final ORDER BY.
    "q59_doc_chunks" -> ((s, dir) => {
      // doc_id ranges are disjoint, so the within-partition
      // (doc_id, chunk_id) sort composes to the total order — the
      // explode preserves the range partitioning (rtokenized note)
      rtokenized(s, dir)
        .select(col("doc_id"), expr("size(t)").as("nt"), col("t"),
          explode(expr(
            "transform(sequence(1, size(t), 96), st -> struct(st as st, slice(t, st, 128) as c))"))
            .as("ch"))
        .select(col("doc_id"), col("nt"),
          expr("cast((ch.st - 1) div 96 as int)").as("chunk_id"),
          expr("cast(ch.st as int)").as("start_tok"),
          expr("cast(size(ch.c) as int)").as("n_chunk_tokens"),
          expr("md5(array_join(ch.c, ' '))").as("chunk_md5"))
        .sortWithinPartitions(col("doc_id"), col("chunk_id"))
    }),

    // Corpus data card: the summary report a dataset release ships —
    // doc/token counts and quality composition for every (lang),
    // (source), (lang, source) margin plus the grand total, in ONE
    // pass via CUBE grouping sets (Spark expands the sets inside a
    // single hash aggregate; no per-margin rescans). The quality
    // column is q15's score rule, so the card's "high-quality share"
    // is consistent with the funnel's stage-2 filter.
    "q71_corpus_report" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("lang"), col("source"),
          split(lower(col("text")), " ").as("t"))
        .select(col("lang"), col("source"), expr("size(t)").as("nt"),
          expr(s"case when ${TextAnalysis.scoreSpark("t")} >= 0.7 then 1 else 0 end")
            .as("hi"))
        .cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
          sum(col("hi")).as("n_high_quality"),
          expr("cast(grouping(lang) * 2 + grouping(source) as int)").as("gid"))
        .orderBy(col("gid").asc, col("lang").asc_nulls_first,
          col("source").asc_nulls_first)
    }),

    // TF-IDF keyterm extraction: top-3 terms per document scored by
    // tf·N/df — the exact-integer reciprocal-df weighting (same ranking
    // as tf·log(N/df) for fixed tf since log is monotone; ratio form
    // keeps the score bit-portable). df comes from one vocabulary-sized
    // aggregate and broadcasts back.
    "q54_tfidf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cnts = tokenCounts(s, dir).localCheckpoint()
      // one-generation retire (round 17): the per-call eager checkpoint
      // otherwise accumulates a block generation per bench pass — the
      // exact leak the round-15 Checkpoints policy exists to stop
      Checkpoints.retireSwap(s, "q54_cnts", cnts)
      val dfreq = cnts.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val nDocs = Tables.load(s, dir, "documents")
        .agg(count(lit(1)).as("n_corpus"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("tok").asc)
      // round 17: ONE range exchange on the checkpointed counts both
      // clusters the window by doc_id (RangePartitioning satisfies the
      // window's ClusteredDistribution — no hash exchange) and
      // establishes the output order; bounds sampling reads the
      // checkpoint blocks, never the joins/window. One exchange fewer
      // than the round-16 shape and no single-task funnel.
      cnts
        .repartitionByRange(s.sparkContext.defaultParallelism, col("doc_id"))
        .join(broadcast(dfreq), "tok")
        .crossJoin(broadcast(nDocs))
        .withColumn("score", expr("cast(cnt * n_corpus as double) / cast(df as double)"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("tok"),
          col("cnt").as("tf"), col("df"), col("score"))
        .sortWithinPartitions(col("doc_id"), col("rank"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q49_seq_packing" ->
      s"""WITH nt AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS nt FROM ($duckTok)),
          cum AS (SELECT doc_id, nt,
              CAST(COALESCE(sum(nt) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS strt
            FROM nt)
          SELECT strt // $packBudget AS chunk, count(*) AS n_docs,
            CAST(sum(nt) AS BIGINT) AS n_tokens,
            min(doc_id) AS first_doc, max(doc_id) AS last_doc
          FROM cum GROUP BY 1 ORDER BY 1""",
    // q176: the shard-shuffle manifest — the 'sh:' keyed h60, shard =
    // hh % S, within-shard (hh, doc_id) rank, and the per-shard
    // running byte offset (exact integer sums; DuckDB's HUGEINT sum
    // casts back to BIGINT; row_number casts to INT to match Spark).
    "q176_shard_shuffle" ->
      s"""WITH h AS (SELECT doc_id, n_chars,
              ${Dedup.h60Duck("'sh:' || CAST(doc_id AS VARCHAR)")} AS hh
            FROM documents),
          sh AS (SELECT doc_id, n_chars, hh,
              CAST(hh % $shuffleShards AS INT) AS shard FROM h)
        SELECT doc_id, shard,
          CAST(row_number() OVER
            (PARTITION BY shard ORDER BY hh ASC, doc_id ASC) AS INT) AS pos,
          coalesce(CAST(sum(n_chars) OVER
            (PARTITION BY shard ORDER BY hh ASC, doc_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
            CAST(0 AS BIGINT)) AS "offset"
        FROM sh
        ORDER BY shard, pos""",

    "q50_contamination" ->
      s"""WITH ex AS (${Dedup.duckShingleHashes}),
          dfreq AS (SELECT h, count(*) AS df FROM ex GROUP BY h),
          kept AS (SELECT ex.doc_id, ex.h FROM ex JOIN dfreq ON ex.h = dfreq.h
                   WHERE dfreq.df <= ${Dedup.maxShingleDf}),
          spl AS (SELECT doc_id,
              ${Dedup.h60Duck("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS b
            FROM documents),
          tst AS (SELECT doc_id FROM spl WHERE b >= 95),
          trn AS (SELECT doc_id FROM spl WHERE b < 90),
          tsh AS (SELECT t.doc_id AS t_doc, k.h FROM tst t JOIN kept k ON k.doc_id = t.doc_id),
          rsh AS (SELECT r.doc_id AS r_doc, k.h FROM trn r JOIN kept k ON k.doc_id = r.doc_id),
          ov AS (SELECT t_doc, count(DISTINCT tsh.h) AS ns, count(DISTINCT r_doc) AS ntd
                 FROM tsh JOIN rsh ON tsh.h = rsh.h GROUP BY t_doc)
          SELECT tst.doc_id,
            CAST(COALESCE(ns, 0) AS BIGINT) AS n_shared_shingles,
            CAST(COALESCE(ntd, 0) AS BIGINT) AS n_train_docs,
            CASE WHEN ns IS NOT NULL AND ns > 0 THEN 1 ELSE 0 END AS contaminated
          FROM tst LEFT JOIN ov ON tst.doc_id = ov.t_doc ORDER BY tst.doc_id""",
    "q52_repetition" ->
      s"""WITH tk AS ($duckTok),
          cnts AS ($duckTokenCounts),
          top AS (SELECT doc_id, tok AS top_tok, cnt AS top_cnt
            FROM (SELECT doc_id, tok, cnt,
                row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, tok ASC) AS rn
              FROM cnts) WHERE rn = 1),
          st AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
              count(*) AS n_types FROM cnts GROUP BY doc_id),
          g2 AS (SELECT doc_id,
              CASE WHEN len(t) >= 2 THEN CAST(len(t) - 1 AS BIGINT) ELSE 0 END AS n2,
              CASE WHEN len(t) >= 2
                THEN CAST(len(list_distinct([t[i] || ' ' || t[i+1]
                  for i in generate_series(1, len(t) - 1)])) AS BIGINT)
                ELSE 0 END AS d2
            FROM tk)
          SELECT st.doc_id, n_tokens, n_types, top_tok, top_cnt,
            CAST(top_cnt AS DOUBLE) / n_tokens AS top_ratio,
            CASE WHEN n2 > 0 THEN CAST(n2 - d2 AS DOUBLE) / n2 ELSE CAST(0 AS DOUBLE) END AS dup2_ratio,
            CASE WHEN top_cnt * 10 > n_tokens OR (n2 - d2) * 10 > n2 THEN 1 ELSE 0 END AS rep_flag
          FROM st JOIN top ON st.doc_id = top.doc_id
                  JOIN g2 ON st.doc_id = g2.doc_id
          ORDER BY st.doc_id""",
    "q55_mix_weights" ->
      """WITH ps AS (SELECT source, count(*) AS n_docs,
              CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source),
          pw AS (SELECT source, n_docs, n_tokens,
              CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT) AS w
            FROM ps),
          tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw,
              CAST(sum(n_tokens) AS BIGINT) // 2 AS budget FROM pw)
          SELECT source, n_docs, n_tokens, w,
            (budget * w) // tw AS target_tokens,
            least(CAST(1 AS DOUBLE),
              CAST((budget * w) // tw AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS sample_frac
          FROM pw, tot ORDER BY source""",
    "q71_corpus_report" ->
      s"""WITH d AS (SELECT lang, source, string_split(lower(text), ' ') AS t
            FROM documents),
          f AS (SELECT lang, source, CAST(len(t) AS INT) AS nt,
              CASE WHEN ${TextAnalysis.scoreDuck("t")} >= 0.7 THEN 1 ELSE 0 END AS hi
            FROM d)
          SELECT lang, source, count(*) AS n_docs,
            CAST(sum(nt) AS BIGINT) AS n_tokens,
            CAST(sum(hi) AS BIGINT) AS n_high_quality,
            CAST(grouping(lang) * 2 + grouping(source) AS INT) AS gid
          FROM f GROUP BY CUBE(lang, source)
          ORDER BY gid ASC, lang ASC NULLS FIRST, source ASC NULLS FIRST""",
    // q159: q58's stage rules per document — the first failing stage
    // is the reason, in the funnel's order; the score comparison uses
    // the shared scoreDuck rendering (bit-portable via q15/q58).
    "q159_curation_verdict" ->
      s"""WITH d AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS t,
              md5(text) AS ck FROM documents),
          rep AS (SELECT ck, min(doc_id) AS rep_id FROM d GROUP BY ck),
          f AS (SELECT d.doc_id, d.lang,
              ${TextAnalysis.scoreDuck("t")} AS score,
              CASE WHEN len(t) >= 2 THEN len(t) - 1 ELSE 0 END AS n2,
              CASE WHEN len(t) >= 2
                THEN len(list_distinct([t[i] || ' ' || t[i+1]
                  for i in generate_series(1, len(t) - 1)]))
                ELSE 0 END AS d2,
              rep.rep_id
            FROM d JOIN rep ON d.ck = rep.ck),
          v AS (SELECT doc_id,
              CASE WHEN lang <> 'en' THEN 'lang'
                   WHEN score < 0.4 THEN 'quality'
                   WHEN (n2 - d2) * 10 > n2 THEN 'repetition'
                   WHEN doc_id <> rep_id THEN 'duplicate'
                   ELSE 'keep' END AS reason
            FROM f)
          SELECT doc_id,
            CAST(CASE WHEN reason = 'keep' THEN 1 ELSE 0 END AS INT) AS kept,
            reason
          FROM v ORDER BY doc_id""",
    "q58_corpus_funnel" ->
      s"""WITH d AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS t,
              md5(text) AS ck FROM documents),
          rep AS (SELECT ck, min(doc_id) AS rep_id FROM d GROUP BY ck),
          f AS (SELECT d.doc_id, CAST(len(t) AS BIGINT) AS nt,
              CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS c1,
              ${TextAnalysis.scoreDuck("t")} AS score,
              CASE WHEN len(t) >= 2 THEN len(t) - 1 ELSE 0 END AS n2,
              CASE WHEN len(t) >= 2
                THEN len(list_distinct([t[i] || ' ' || t[i+1]
                  for i in generate_series(1, len(t) - 1)]))
                ELSE 0 END AS d2,
              CASE WHEN d.doc_id = rep.rep_id THEN 1 ELSE 0 END AS is_rep
            FROM d JOIN rep ON d.ck = rep.ck),
          c AS (SELECT nt, c1,
              CASE WHEN c1 = 1 AND score >= 0.4 THEN 1 ELSE 0 END AS c2,
              CASE WHEN c1 = 1 AND score >= 0.4 AND NOT ((n2 - d2) * 10 > n2) THEN 1 ELSE 0 END AS c3,
              CASE WHEN c1 = 1 AND score >= 0.4 AND NOT ((n2 - d2) * 10 > n2) AND is_rep = 1 THEN 1 ELSE 0 END AS c4
            FROM f),
          a AS (SELECT count(*) AS n0, CAST(sum(nt) AS BIGINT) AS t0,
              CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c1 * nt) AS BIGINT) AS t1,
              CAST(sum(c2) AS BIGINT) AS n2s, CAST(sum(c2 * nt) AS BIGINT) AS t2,
              CAST(sum(c3) AS BIGINT) AS n3, CAST(sum(c3 * nt) AS BIGINT) AS t3,
              CAST(sum(c4) AS BIGINT) AS n4, CAST(sum(c4 * nt) AS BIGINT) AS t4
            FROM c)
          SELECT 0 AS stage, 'all' AS stage_name, n0 AS n_docs, t0 AS n_tokens FROM a
          UNION ALL SELECT 1, 'lang_en', n1, t1 FROM a
          UNION ALL SELECT 2, 'quality', n2s, t2 FROM a
          UNION ALL SELECT 3, 'repetition', n3, t3 FROM a
          UNION ALL SELECT 4, 'dedup', n4, t4 FROM a
          ORDER BY stage""",
    "q59_doc_chunks" ->
      s"""SELECT doc_id, CAST(len(t) AS INT) AS nt,
            CAST((st - 1) // 96 AS INT) AS chunk_id,
            CAST(st AS INT) AS start_tok,
            CAST(len(t[st:st+127]) AS INT) AS n_chunk_tokens,
            md5(array_to_string(t[st:st+127], ' ')) AS chunk_md5
          FROM (SELECT doc_id, t, unnest(generate_series(1, len(t), 96)) AS st
                FROM ($duckTok))
          ORDER BY doc_id, chunk_id""",
    "q54_tfidf" ->
      s"""WITH cnts AS ($duckTokenCounts),
          dfreq AS (SELECT tok, count(*) AS df FROM cnts GROUP BY tok),
          nd AS (SELECT count(*) AS n_corpus FROM documents),
          scored AS (SELECT doc_id, tok, cnt, df,
              CAST(cnt * n_corpus AS DOUBLE) / CAST(df AS DOUBLE) AS score
            FROM cnts JOIN dfreq USING (tok), nd),
          ranked AS (SELECT doc_id, tok, cnt, df, score,
              row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rank
            FROM scored)
          SELECT doc_id, CAST(rank AS INT) AS rank, tok, cnt AS tf, df, score
          FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank"""
  )
}
