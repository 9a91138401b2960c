package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table: token statistics, marker-based language ID,
  * quality scoring, and content fingerprinting.
  *
  * None of these exist in the reference (its only text handling is SQL
  * strings); they extend the engine toward LLM-corpus preparation, the
  * declared north-star workload.
  *
  * Scale design: every query is a narrow projection (doc_id + text) with
  * per-row array expressions that stay inside whole-stage codegen — no
  * shuffle except the final sort. Nothing collects to the driver;
  * determinism comes from md5 + integer/decimal arithmetic, so results
  * are DuckDB-oracle-checkable bit-for-bit.
  *
  * Ordering note (round 17, replacing the round-16 repartition(1)
  * funnel): the per-doc outputs are ordered by doc_id, so the corpus
  * distribution exchange IS the sort's range exchange — [[rtoks]] range-
  * partitions the RAW scan (bounds sampling reads only cheap scan rows,
  * never the tokenization), the heavy projections run once above it,
  * and a final sortWithinPartitions yields the total order with a fully
  * PARALLEL sort and no extra exchange. The round-16 shape funneled
  * corpus-sized output through ONE task; a plain orderBy re-executed
  * the heavy projection inside RangePartitioner's sampler.
  */
object TextAnalysis {

  /** Tokenized view: doc_id, t = lower-cased whitespace tokens.
    *
    * The repartition (EXPLICIT count, so AQE cannot coalesce it) sits
    * BETWEEN the split() projection and the expensive consumers: it
    * spreads the single-file corpus across all cores AND, as an exchange
    * boundary, stops Catalyst's project-collapsing from inlining split()
    * into every downstream reference to `t` (see Dedup.bound — the same
    * trap, measured 6s -> sub-second on q15/q16 at sf0.1).
    */
  private def toks(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"),
        split(lower(col("text")), " ").as("t"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))

  /** [[toks]] twin for the doc_id-ORDERED outputs (q13–q16, q66): the
    * distribution exchange is a RANGE exchange on the raw scan, so it
    * simultaneously spreads the single-split corpus, acts as the same
    * projection barrier, and establishes the output order — consumers
    * end with sortWithinPartitions(doc_id) instead of a second exchange.
    * Range-bound sampling reads only the scan (doc_id/lang/text), never
    * the split() projection, which sits ABOVE the exchange. Also
    * shuffles fewer bytes than [[toks]] (guide §2.3: the token array is
    * computed after the exchange instead of riding through it).
    */
  private def rtoks(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .repartitionByRange(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), col("lang"), col("text"),
        split(lower(col("text")), " ").as("t"))

  /** Per-language marker ("stopword") lists for language ID. Tiny by
    * design — a real deployment swaps in per-language lexicons; the
    * operator shape (score per language, deterministic arg-max) is what
    * matters.
    */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "les", "et", "un", "est"),
    "zh" -> Seq("的", "是", "在"))

  private def markerArraySql(lang: String): String =
    markers.toMap.apply(lang).map(m => s"'$m'").mkString("array(", ", ", ")")

  private def markerListDuck(lang: String): String =
    markers.toMap.apply(lang).map(m => s"'$m'").mkString("[", ", ", "]")

  /** q15's composite quality score over a token-array column — THE
    * score rule. Shared by the funnel (q58), the data card (q71), the
    * weighted sampler (q63), and the streaming ingest, so a rule tweak
    * changes every consumer in lockstep; [[scoreDuck]] is the oracle
    * mirror. `t` is the SQL name of an array<string> column.
    */
  def scoreSpark(t: String): String =
    s"""least(cast(1 as double), cast(size($t) as double) / 100) * cast(0.6 as double)
        + least(cast(size(filter($t, x -> array_contains(${markerArraySql("en")}, x))) as double) / size($t) * 10,
            cast(1 as double)) * cast(0.4 as double)"""

  /** DuckDB mirror of [[scoreSpark]]. */
  def scoreDuck(t: String): String =
    s"""least(CAST(1 AS DOUBLE), CAST(len($t) AS DOUBLE) / 100) * CAST(0.6 AS DOUBLE)
        + least(CAST(len([x for x in $t if list_contains(${markerListDuck("en")}, x)]) AS DOUBLE) / len($t) * 10,
            CAST(1 AS DOUBLE)) * CAST(0.4 AS DOUBLE)"""

  /** q162's PII span patterns — class-only regexes with bounded
    * repetition, chosen because Java regex (Spark) and RE2 (DuckDB)
    * agree on them exactly; `[.]` avoids escape-sequence divergence
    * between the two engines' string literals. Redaction applies ID
    * before PHONE (3-2-4 vs 3-3-4 digit groups cannot overlap, but the
    * fixed order keeps the composition deterministic by construction).
    */
  val piiEmail: String = "[a-z0-9]+@[a-z]+[.][a-z]+"
  val piiPhone: String = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val piiId: String = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace tokenization + distinct-type stats.
    "q13_token_stats" -> ((s, dir) => {
      rtoks(s, dir).select(
        col("doc_id"),
        expr("size(t)").as("n_tokens"),
        expr("size(array_distinct(t))").as("n_types"),
        // Σ length(token) == length(text) - #separators == len - (size-1)
        // for a single-char split (empties retained) — the identity
        // replaces an interpreted aggregate() lambda (CodegenFallback)
        // with codegen integer arithmetic; values are unchanged.
        expr("cast(length(text) - (size(t) - 1) as double) / size(t)")
          .as("avg_tok_len"),
        expr("cast(size(array_distinct(t)) as double) / size(t)").as("ttr"),
        // BPE-ish subtokenization: letter runs and digit runs as units
        // (regex kept to a class-only pattern with identical semantics
        // in Java regex and RE2)
        expr("size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+', 0))")
          .as("n_subtok"))
        .sortWithinPartitions(col("doc_id"))
    }),

    // Language ID: per-language marker-hit ratio, deterministic arg-max
    // with fixed precedence (en > de > es > fr > zh) on ties.
    "q14_lang_id" -> ((s, dir) => {
      val scored = rtoks(s, dir).select(
        (Seq(col("doc_id"), col("lang")) ++ markers.map { case (l, _) =>
          expr(s"cast(size(filter(t, x -> array_contains(${markerArraySql(l)}, x))) as double) / size(t)")
            .as(s"s_$l")
        }): _*)
      val pred = markers.map(_._1).foldRight(lit("und")) { case (l, acc) =>
        when(markers.map(_._1).filter(_ != l)
          .map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _), lit(l))
          .otherwise(acc)
      }
      scored.withColumn("pred_lang", pred)
        .sortWithinPartitions(col("doc_id"))
    }),

    // Quality scoring: length, token shape, marker ratio, digit ratio ->
    // composite score + bucket (the filter stage of a corpus pipeline).
    "q15_quality_score" -> ((s, dir) => {
      rtoks(s, dir).select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        expr("size(t)").as("n_tokens"),
        expr(s"cast(size(filter(t, x -> array_contains(${markerArraySql("en")}, x))) as double) / size(t)")
          .as("stop_ratio"),
        expr("cast(length(text) - length(regexp_replace(text, '[0-9]', '')) as double) / length(text)")
          .as("digit_ratio"))
        .withColumn("score",
          expr("least(cast(1 as double), cast(n_tokens as double) / 100) * cast(0.6 as double) + least(stop_ratio * 10, cast(1 as double)) * cast(0.4 as double)"))
        .withColumn("bucket",
          expr("case when score >= 0.7 then 'high' when score >= 0.4 then 'mid' else 'low' end"))
        .sortWithinPartitions(col("doc_id"))
    }),

    // Document fingerprinting: md5 over the sorted distinct token set —
    // an order/multiplicity-insensitive content key for exact dedup.
    "q16_fingerprint" -> ((s, dir) => {
      rtoks(s, dir).select(
        col("doc_id"),
        expr("md5(array_join(array_sort(array_distinct(t)), ' '))").as("fp"))
        .sortWithinPartitions(col("doc_id"))
    }),

    // Corpus heavy hitters: top-20 tokens by total count with document
    // frequency — the vocabulary/stop-word discovery pass of a corpus
    // pipeline (and the ground truth a Count-Min sketch estimates).
    // One explode + one hash-aggregate (map-side partial) + top-k;
    // deterministic tie-break on the token itself.
    "q42_heavy_hitters" -> ((s, dir) => {
      toks(s, dir)
        .select(col("doc_id"), explode(col("t")).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n").desc, col("tok").asc)
        .limit(20)
    }),

    // Deterministic train/val/test split (90/5/5) by content-independent
    // hash bucket of the doc key — the reproducible-split primitive of a
    // training pipeline (stable across runs, machines, and re-shards
    // because it derives from doc_id alone, not partitioning or RNG
    // state). One projection + one hash-aggregate.
    "q47_corpus_split" -> ((s, dir) => {
      toks(s, dir)
        .select(col("doc_id"), col("t"),
          expr(s"${Dedup.h60Spark("concat('split:', cast(doc_id as string))")} % 100")
            .as("b"))
        .withColumn("split",
          expr("case when b < 90 then 'train' when b < 95 then 'val' else 'test' end"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("size(t)")).as("n_tokens"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("split"))
    }),

    // Rare-token scoring: per document, the fraction of token
    // OCCURRENCES whose corpus-wide count falls below a threshold, plus
    // the mean corpus frequency of its tokens — the vocabulary-grounded
    // quality signal (OOV/typo-heavy docs score high, template/boiler-
    // plate docs score low) that complements q15's shape heuristics.
    // One unigram hash-aggregate (vocabulary-sized, broadcast back, the
    // q54 pattern) + one per-doc aggregate; ratios are single
    // exact-integer divisions. 100 TB note: a web-scale vocabulary can
    // outgrow the broadcast threshold — the same plan with the
    // broadcast hint dropped becomes a shuffle join on tok and stays
    // correct; AQE picks the strategy from the measured unigram size.
    "q66_rare_tokens" -> ((s, dir) => {
      // rtoks' RANGE partitioning on doc_id satisfies the per-doc
      // aggregate's clustering requirement, so the groupBy(doc_id) runs
      // WITHOUT its own exchange and the output is already range-ordered
      // — one exchange fewer than the round-16 shape (plan evidence in
      // plans/r17/q66_rare_tokens_after.txt)
      val tk = rtoks(s, dir)
      val uni = tk.select(explode(col("t")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cf"))
      tk.select(col("doc_id"), explode(col("t")).as("tok"))
        .join(broadcast(uni), "tok")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(expr("case when cf < 5 then 1 else 0 end")).as("n_rare"),
          sum(col("cf")).as("sum_cf"))
        .select(col("doc_id"), col("n_tokens"), col("n_rare"),
          expr("cast(n_rare as double) / cast(n_tokens as double)")
            .as("rare_ratio"),
          expr("cast(sum_cf as double) / cast(n_tokens as double)")
            .as("mean_corpus_freq"))
        .sortWithinPartitions(col("doc_id"))
    }),

    // PII detection + redaction: the compliance pass every training
    // pipeline runs before release — scan each document for
    // email/phone/national-id shaped spans, count them per category,
    // and emit the redaction fingerprint ([EMAIL]/[PHONE]/[ID]
    // placeholders). The synthetic corpus carries no real PII, so the
    // scan input is the document text with DETERMINISTIC doc_id-derived
    // PII spans appended (the q72/q81 generated-modality pattern: the
    // generator arithmetic is mirrored in the oracle, the
    // detection/redaction machinery is the real operator). Patterns are
    // class-only regexes with bounded repetition — identical semantics
    // in Java regex and RE2, so counts AND the redacted text hash are
    // bit-portable. Scale: one narrow per-row projection, all three
    // scans + replaces inside whole-stage codegen, shuffle-free until
    // the final ORDER BY.
    "q162_pii_redact" -> ((s, dir) => {
      // range exchange on the raw scan = spread + output order in one
      // (the rtoks note); the regex stages run once above it
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartitionByRange(s.sparkContext.defaultParallelism, col("doc_id"))
        .withColumn("aug", expr(
          """concat(text,
              case when doc_id % 3 = 0
                then concat(' contact user', cast(doc_id as string), '@example.com') else '' end,
              case when doc_id % 5 = 0
                then concat(' call 415-555-', lpad(cast(doc_id % 10000 as string), 4, '0')) else '' end,
              case when doc_id % 7 = 0
                then concat(' ssn 123-45-', lpad(cast(doc_id % 10000 as string), 4, '0')) else '' end)"""))
        .select(col("doc_id"),
          expr(s"size(regexp_extract_all(aug, '$piiEmail', 0))").as("n_email"),
          expr(s"size(regexp_extract_all(aug, '$piiPhone', 0))").as("n_phone"),
          expr(s"size(regexp_extract_all(aug, '$piiId', 0))").as("n_id"),
          expr(
            s"""md5(regexp_replace(regexp_replace(regexp_replace(aug,
                '$piiId', '[ID]'), '$piiPhone', '[PHONE]'), '$piiEmail', '[EMAIL]'))""")
            .as("redacted_md5"))
        .withColumn("pii_total", expr("n_email + n_phone + n_id"))
        .sortWithinPartitions(col("doc_id"))
    }),

    // Collocation mining: top-20 adjacent-token bigrams by lift
    // nxy·N / (nx·ny) with a min-count guard — the PMI-style phrase
    // discovery pass. The score is a ratio of exact int64 products
    // (all < 2^53, so exact in double and bit-identical cross-engine —
    // a log-free PMI surrogate with the same ordering). Bigram and
    // unigram counts are two hash-aggregates over the exploded corpus;
    // the unigram table is vocabulary-sized and broadcast.
    "q48_collocations" -> ((s, dir) => {
      val tk = toks(s, dir)
      val bi = tk.filter(expr("size(t) >= 2"))
        .select(explode(expr(
          "transform(sequence(1, size(t) - 1), i -> struct(element_at(t, i) as x, element_at(t, i + 1) as y))"))
          .as("p"))
        .select(col("p.x"), col("p.y"))
      val nxy = bi.groupBy(col("x"), col("y")).agg(count(lit(1)).as("nxy"))
      val uni = tk.select(explode(col("t")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val tot = bi.agg(count(lit(1)).as("nn"))
      nxy
        .join(broadcast(uni.select(col("tok").as("x"), col("cnt").as("nx"))), "x")
        .join(broadcast(uni.select(col("tok").as("y"), col("cnt").as("ny"))), "y")
        .crossJoin(broadcast(tot))
        .filter(col("nxy") >= 5)
        .withColumn("lift", expr("cast(nxy * nn as double) / cast(nx * ny as double)"))
        .orderBy(col("lift").desc, col("x").asc, col("y").asc)
        .limit(20)
        .select(col("x"), col("y"), col("nxy"), col("lift"))
    })
  )

  private val duckToks =
    "SELECT doc_id, lang, text, string_split(lower(text), ' ') AS t FROM documents"

  val oracle: Map[String, String] = Map(
    "q13_token_stats" ->
      s"""SELECT doc_id,
          CAST(len(t) AS INT) AS n_tokens,
          CAST(len(list_distinct(t)) AS INT) AS n_types,
          CAST(list_sum([length(x) for x in t]) AS DOUBLE) / len(t) AS avg_tok_len,
          CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
          CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+')) AS INT) AS n_subtok
          FROM ($duckToks) ORDER BY doc_id""",
    "q14_lang_id" -> {
      val scoreCols = markers.map { case (l, _) =>
        s"CAST(len([x for x in t if list_contains(${markerListDuck(l)}, x)]) AS DOUBLE) / len(t) AS s_$l"
      }.mkString(",\n          ")
      val langs = markers.map(_._1)
      val predCase = langs.map { l =>
        val conds = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"WHEN $conds THEN '$l'"
      }.mkString(" ")
      s"""SELECT doc_id, lang, s_en, s_de, s_es, s_fr, s_zh,
          CASE $predCase ELSE 'und' END AS pred_lang
          FROM (SELECT doc_id, lang,
          $scoreCols
          FROM ($duckToks)) ORDER BY doc_id"""
    },
    "q15_quality_score" ->
      s"""SELECT doc_id, n_chars, n_tokens, stop_ratio, digit_ratio,
          least(CAST(1 AS DOUBLE), CAST(n_tokens AS DOUBLE) / 100) * CAST(0.6 AS DOUBLE) + least(stop_ratio * 10, CAST(1 AS DOUBLE)) * CAST(0.4 AS DOUBLE) AS score,
          CASE WHEN least(CAST(1 AS DOUBLE), CAST(n_tokens AS DOUBLE) / 100) * CAST(0.6 AS DOUBLE) + least(stop_ratio * 10, CAST(1 AS DOUBLE)) * CAST(0.4 AS DOUBLE) >= 0.7 THEN 'high'
               WHEN least(CAST(1 AS DOUBLE), CAST(n_tokens AS DOUBLE) / 100) * CAST(0.6 AS DOUBLE) + least(stop_ratio * 10, CAST(1 AS DOUBLE)) * CAST(0.4 AS DOUBLE) >= 0.4 THEN 'mid'
               ELSE 'low' END AS bucket
          FROM (SELECT doc_id,
            CAST(length(text) AS INT) AS n_chars,
            CAST(len(t) AS INT) AS n_tokens,
            CAST(len([x for x in t if list_contains(${markerListDuck("en")}, x)]) AS DOUBLE) / len(t) AS stop_ratio,
            CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text) AS digit_ratio
            FROM ($duckToks)) ORDER BY doc_id""",
    "q16_fingerprint" ->
      s"""SELECT doc_id,
          md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fp
          FROM ($duckToks) ORDER BY doc_id""",
    "q42_heavy_hitters" ->
      s"""SELECT tok, CAST(count(*) AS BIGINT) AS n,
          CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM (SELECT doc_id, unnest(t) AS tok FROM ($duckToks))
          GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 20""",
    "q47_corpus_split" ->
      s"""WITH b AS (SELECT doc_id, len(t) AS nt,
              ${Dedup.h60Duck("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS b
            FROM ($duckToks))
          SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
            count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
            min(doc_id) AS min_doc, max(doc_id) AS max_doc
          FROM b GROUP BY 1 ORDER BY 1""",
    "q66_rare_tokens" ->
      s"""WITH tk AS ($duckToks),
          inst AS (SELECT doc_id, unnest(t) AS tok FROM tk),
          uni AS (SELECT tok, count(*) AS cf FROM inst GROUP BY tok)
          SELECT doc_id, count(*) AS n_tokens,
            CAST(sum(CASE WHEN cf < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
            CAST(sum(CASE WHEN cf < 5 THEN 1 ELSE 0 END) AS DOUBLE)
              / CAST(count(*) AS DOUBLE) AS rare_ratio,
            CAST(sum(cf) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_corpus_freq
          FROM inst JOIN uni USING (tok)
          GROUP BY doc_id ORDER BY doc_id""",
    "q162_pii_redact" ->
      s"""WITH aug AS (SELECT doc_id,
            text
              || CASE WHEN doc_id % 3 = 0
                   THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
              || CASE WHEN doc_id % 5 = 0
                   THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
              || CASE WHEN doc_id % 7 = 0
                   THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS aug
          FROM documents)
          SELECT doc_id,
            CAST(len(regexp_extract_all(aug, '$piiEmail')) AS INT) AS n_email,
            CAST(len(regexp_extract_all(aug, '$piiPhone')) AS INT) AS n_phone,
            CAST(len(regexp_extract_all(aug, '$piiId')) AS INT) AS n_id,
            md5(regexp_replace(regexp_replace(regexp_replace(aug,
              '$piiId', '[ID]', 'g'), '$piiPhone', '[PHONE]', 'g'),
              '$piiEmail', '[EMAIL]', 'g')) AS redacted_md5,
            CAST(len(regexp_extract_all(aug, '$piiEmail'))
              + len(regexp_extract_all(aug, '$piiPhone'))
              + len(regexp_extract_all(aug, '$piiId')) AS INT) AS pii_total
          FROM aug ORDER BY doc_id""",
    "q48_collocations" ->
      s"""WITH tk AS ($duckToks),
          bi AS (SELECT t[i] AS x, t[i + 1] AS y
            FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
                  FROM tk WHERE len(t) >= 2)),
          nxy AS (SELECT x, y, count(*) AS nxy FROM bi GROUP BY x, y),
          uni AS (SELECT tok, count(*) AS cnt
            FROM (SELECT unnest(t) AS tok FROM tk) GROUP BY tok),
          tot AS (SELECT count(*) AS nn FROM bi)
          SELECT x, y, CAST(nxy AS BIGINT) AS nxy,
            CAST(nxy * nn AS DOUBLE) / CAST(nx * ny AS DOUBLE) AS lift
          FROM (SELECT nxy.x, nxy.y, nxy.nxy, ux.cnt AS nx, uy.cnt AS ny, tot.nn
                FROM nxy JOIN uni ux ON nxy.x = ux.tok
                         JOIN uni uy ON nxy.y = uy.tok, tot)
          WHERE nxy >= 5
          ORDER BY lift DESC, x ASC, y ASC LIMIT 20"""
  )
}
