package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distribution analytics: exact interpolated percentiles, fixed-bound
  * histograms, and table profiling (the data-quality pass of a corpus
  * pipeline).
  *
  * Portability notes: both engines implement type-7 (linear
  * interpolation) percentiles; outputs are rounded through
  * DECIMAL(18,6) because the interpolation formula's floating-point
  * association may differ in the last ulp across engines. Histogram
  * buckets use fixed bounds + integer arithmetic (no data-dependent
  * min/max pass, no float boundaries).
  */
object Analytics {

  /** Exact multi-quantile aggregate via ONE `percentile(col, array(..))`
    * call. Spark's Percentile keeps a per-partition counts buffer PER
    * AGGREGATE CALL — k scalar `percentile(col, p_i)` expressions build
    * and merge k identical buffers of the whole column; the array form
    * builds one and interpolates every requested quantile from the same
    * counts map, so the values are bit-identical to the scalar calls.
    * Use with [[pctAt]] to unpack + DECIMAL(18,6)-round each output.
    */
  private[queries] def pctArr(valueCol: String, ps: Seq[String]): org.apache.spark.sql.Column =
    // graft_percentile (round 16): primitive-buffer twin of the builtin,
    // bit-identical by construction (its eval calls PercentileBase's own
    // getPercentile; FunctionsSpec pins parity) — the builtin's boxed
    // OpenHashMap update path was the exact-companion hot spot (2.1 s ->
    // 0.43 s for the two-quantile lineitem aggregate at sf0.1)
    expr(s"graft_percentile(cast($valueCol as double), array(${ps.map(_ + "D").mkString(", ")}))")

  /** i-th quantile out of a [[pctArr]] result attribute, rounded through
    * DECIMAL(18,6) for cross-engine bit-parity (the q32/q61 rule).
    */
  private[queries] def pctAt(arrCol: String, i: Int, name: String): org.apache.spark.sql.Column =
    expr(s"cast(cast(element_at($arrCol, ${i + 1}) as decimal(18,6)) as double)")
      .as(name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact interpolated percentiles of order value, grouped by status.
    "q32_percentiles" -> ((s, dir) => {
      // single-row-group input: spread the scan before the percentile
      // partial aggregate (Relational q01's note; counts-map percentile
      // is partitioning-independent). Guarded since round 17 — no extra
      // Exchange when the scan is already well split.
      val o = Tables.spreadIfNarrow(s, dir, "orders")(col("o_orderkey"))
      o.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          pctArr("o_totalprice", Seq("0.25", "0.5", "0.75", "0.9")).as("pcts"))
        .select(col("o_orderstatus"), col("n"),
          pctAt("pcts", 0, "p25"), pctAt("pcts", 1, "p50"),
          pctAt("pcts", 2, "p75"), pctAt("pcts", 3, "p90"))
        .orderBy(col("o_orderstatus"))
    }),

    // Fixed-bound histogram of order value: 20 buckets of 30k.
    "q33_histogram" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      o.select(expr("least(19, cast(floor(o_totalprice / 30000) as int))").as("bucket"),
        col("o_totalprice"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          expr("cast(sum(cast(o_totalprice as decimal(18,4))) as double)").as("total"))
        .orderBy(col("bucket"))
    }),

    // KMV (bottom-k) distinct-count estimator: keep the k smallest
    // 60-bit hashes of the key; estimate NDV as (k-1) * 2^60 / h_(k).
    // Unlike HLL this sketch is fully deterministic given the hash, so
    // the DuckDB oracle reproduces the ESTIMATE bit-for-bit — an
    // approximate operator with an exact cross-engine gate. Scale shape:
    // per-partition top-k (map-side) merges k values per partition —
    // the k-th smallest of n hashes never materializes more than k rows
    // past the scan; the exact NDV companion column is one
    // count(DISTINCT) for the rel_error report.
    "q45_kmv_distinct" -> ((s, dir) => {
      val k = 64
      val pow60 = "1152921504606846976" // 2^60, exactly representable
      val e = Tables.load(s, dir, "events")
      val kth = e
        .select(expr(Dedup.h60Spark("cast(user_id as string)")).as("h"))
        .distinct()
        .orderBy(col("h")).limit(k)
        .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_hash"))
      val exact = e.agg(countDistinct(col("user_id")).as("n_exact"))
      kth.crossJoin(exact)
        // a sketch holding fewer than k hashes saw EVERY distinct value:
        // report it exactly (the standard KMV small-cardinality case)
        .withColumn("est_distinct", expr(
          s"""case when k_used < $k then cast(k_used as double)
              else cast(${k - 1} as double) * cast($pow60 as double) / cast(kth_hash as double) end"""))
        .withColumn("rel_error", expr(
          "(est_distinct - cast(n_exact as double)) / cast(n_exact as double)"))
        .select(col("k_used"), col("kth_hash"), col("est_distinct"),
          col("n_exact"), col("rel_error"))
    }),

    // Deterministic per-group fixed-size sample ("reservoir" semantics
    // without RNG state): within each group keep the k rows with the
    // smallest keyed hash of the row identity. Every row competes
    // independently, so the result is a uniform-without-replacement
    // k-sample per group, yet fully reproducible across runs, machines,
    // and partitionings — unlike rand()-based sampling. One shuffle on
    // the group key; at scale the per-partition top-k (window + filter)
    // keeps only k rows per partition past the sort.
    "q53_reservoir" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // spread the single-split scan BEFORE the per-row md5 hash (one
      // input split serializes all h60 evaluation); guarded since
      // round 17 — a well-split scan already runs the hash in parallel
      val li = Tables.spreadIfNarrow(s, dir, "lineitem")(col("l_orderkey"))
        .withColumn("h", expr(graft.queries.Dedup.h60Spark(
          "concat('rsv:', cast(l_orderkey as string), '-', cast(l_linenumber as string))")))
      // (l_orderkey, l_linenumber) is NOT unique in the test data, so the
      // hash ties for duplicate keys — l_quantity completes the ordering
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("h").asc, col("l_orderkey").asc, col("l_linenumber").asc,
          col("l_quantity").asc)
      li.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("l_returnflag"), col("rank"), col("l_orderkey"),
          col("l_linenumber"), col("l_quantity"), col("h").as("sample_hash"))
        .orderBy(col("l_returnflag"), col("rank"))
    }),

    // Bloom-filter semi-join pruning: build a Bloom filter over the dim
    // side's keys (customers in one segment) as a ~131-word/63-bit
    // bitmap (one tiny aggregate), ship the finished bitmap to every
    // task as a plan literal (the same move Spark's own runtime bloom
    // pushdown and q41's broadcast centroids make — the sketch is a few
    // hundred bytes regardless of dim size), and filter the fact scan
    // with K=3 scan-local bit tests: NO join, no shuffle, the pruning
    // runs inside the scan's codegen stage. False positives only ever
    // ADD rows; a final exact join removes them when needed. Because
    // the hash functions are the engine's deterministic h60 with
    // double-hashed positions (one digest per key, pos_j = h1 + j*h2
    // mod m), even the false positives reproduce bit-for-bit in
    // DuckDB: the oracle gate covers the sketch itself, not just the
    // exact companion counts.
    "q56_bloom_semijoin" -> ((s, dir) => {
      val m = 8192L // bits
      val k = 3 // hash functions
      val nWords = ((m + 62) / 63).toInt // 63-bit words: bit 63 of a
      // signed BIGINT is a checked overflow in DuckDB but wraps on the
      // JVM — divergent, so the sign bit is never used
      def posFromH(j: Int): String =
        s"(h % ${m}L + $j * (1L + (h div ${m}L) % ${m - 1}L)) % ${m}L"
      val dimKeys = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      // build job: tiny aggregate -> nWords longs on the driver
      val wordMap = dimKeys
        .withColumn("h", expr(
          graft.queries.Dedup.h60Spark("concat('bf:', cast(c_custkey as string))")))
        .select(explode(expr(
          (0 until k).map(posFromH).mkString("array(", ", ", ")")))
          .as("p"))
        .select(expr("cast(p div 63 as int)").as("word"),
          expr("shiftleft(1L, cast(p % 63 as int))").as("bit"))
        .groupBy(col("word")).agg(expr("bit_or(bit)").as("w"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val bloomLit = (0 until nWords).map(wordMap.getOrElse(_, 0L))
        .mkString("array(", "L, ", "L)")
      val tests = (0 until k).map { j =>
        val p = posFromH(j)
        s"(shiftright(element_at($bloomLit, cast(($p) div 63 as int) + 1), cast(($p) % 63 as int)) & 1L) = 1L"
      }.mkString(" and ")
      // bind the digest to a lambda var: the probe predicate references
      // h six times, and predicate-pushdown substitution would
      // otherwise clone the md5 into every reference
      val passExpr = expr(graft.queries.Dedup.bound(
        graft.queries.Dedup.h60Spark("concat('bf:', cast(o_custkey as string))"),
        "h", s"($tests)"))
      val o = Tables.load(s, dir, "orders")
      val passed = o
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .filter(passExpr)
      val exact = o.join(dimKeys.withColumnRenamed("c_custkey", "o_custkey"),
        Seq("o_custkey"), "left_semi")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n_exact"))
      passed.groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n_bloom"))
        .join(exact, Seq("o_orderstatus"), "left")
        .select(col("o_orderstatus"), col("n_bloom"),
          coalesce(col("n_exact"), lit(0L)).as("n_exact"),
          (col("n_bloom") - coalesce(col("n_exact"), lit(0L))).as("n_false_pos"))
        .orderBy(col("o_orderstatus"))
    }),

    // Histogram-sketch quantile estimation: approximate p50/p90/p99 by
    // linear interpolation inside fixed-bound integer buckets — the
    // single-pass quantile sketch an AQP engine answers percentile
    // queries from WITHOUT the per-group sort q32's exact path needs.
    // Scale shape: one hash-aggregate builds the (bounded, ~20-row)
    // bucket table; the cumulative window and target join run on that
    // tiny table, never the fact data. Determinism: target ranks are
    // exact ceil-division integers (num/den fractions, no p*N float),
    // and the interpolation is a single identically-associated double
    // expression — so this APPROXIMATE operator carries a bit-for-bit
    // DuckDB oracle, alongside the exact companion value and the
    // realized error.
    "q61_hist_quantiles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val width = 30000L
      val o = Tables.load(s, dir, "orders")
      val hist = o
        .select(expr(s"cast(floor(o_totalprice / $width) as bigint)").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("nb"))
      val wCum = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("nb")).over(wCum))
        .withColumn("cumb", col("cum") - col("nb"))
      val tot = o.agg(count(lit(1)).as("n_total"))
      val exacts = o
        .agg(pctArr("o_totalprice", Seq("0.5", "0.9", "0.99")).as("pcts"))
        .select(pctAt("pcts", 0, "x50"), pctAt("pcts", 1, "x90"),
          pctAt("pcts", 2, "x99"))
      val targets = tot.select(explode(expr(
        """array(named_struct('p_label', 'p50', 'num', 1L, 'den', 2L),
                 named_struct('p_label', 'p90', 'num', 9L, 'den', 10L),
                 named_struct('p_label', 'p99', 'num', 99L, 'den', 100L))""")).as("t"),
        col("n_total"))
        .select(col("t.p_label"), col("n_total"),
          expr("(n_total * t.num + t.den - 1) div t.den").as("target"))
      targets
        .join(cum, col("cumb") < col("target") && col("target") <= col("cum"))
        .crossJoin(exacts)
        .select(col("p_label"), col("n_total"), col("target"), col("bucket"),
          col("nb").as("n_in_bucket"),
          expr(s"""cast(bucket * $width as double)
              + cast($width as double) * (cast(target - cumb as double) / cast(nb as double))""")
            .as("est"),
          expr("""case when p_label = 'p50' then x50
                  when p_label = 'p90' then x90 else x99 end""").as("exact_val"))
        .withColumn("abs_err", expr("est - exact_val"))
        .orderBy(col("p_label"))
    }),

    // Equi-depth histogram: quartile boundaries (type-7 percentiles,
    // decimal-rounded for cross-engine bit-parity like q32) + the row
    // count landing in each [b_i, b_{i+1}) bin — the histogram flavor
    // optimizers actually store (equal-count bins adapt to the value
    // distribution; q33 is the equal-width complement). One aggregate
    // computes the three boundaries, broadcasts them, and one more
    // aggregate bins the scan — no sort, no per-row join.
    // 100 TB note: Spark's exact `percentile` buffers the group's
    // values in the aggregation buffer, which caps the input size the
    // boundary pass can handle; at scale the boundaries come from the
    // q61 histogram sketch (or percentile_approx) instead — the
    // binning pass is unchanged either way.
    "q67_equidepth_hist" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val bounds = o
        .agg(pctArr("o_totalprice", Seq("0.25", "0.5", "0.75")).as("pcts"))
        .select(pctAt("pcts", 0, "b1"), pctAt("pcts", 1, "b2"),
          pctAt("pcts", 2, "b3"))
      o.crossJoin(broadcast(bounds))
        .agg(count(lit(1)).as("n_rows"),
          sum(expr("case when o_totalprice < b1 then 1 else 0 end")).as("n_q1"),
          sum(expr("case when o_totalprice >= b1 and o_totalprice < b2 then 1 else 0 end")).as("n_q2"),
          sum(expr("case when o_totalprice >= b2 and o_totalprice < b3 then 1 else 0 end")).as("n_q3"),
          sum(expr("case when o_totalprice >= b3 then 1 else 0 end")).as("n_q4"),
          min(col("b1")).as("b1"), min(col("b2")).as("b2"), min(col("b3")).as("b3"))
        .select(col("n_rows"), col("b1"), col("b2"), col("b3"),
          col("n_q1"), col("n_q2"), col("n_q3"), col("n_q4"))
    }),

    // Join-key skew profile: the distribution statistics a planner
    // reads before choosing salting / skew-join handling (q35 is the
    // mitigation; this is the detector). One hash-aggregate to per-key
    // counts, then a tiny summary: total rows, NDV, the heaviest key
    // (deterministic min-key tie-break) and integer skew ratios —
    // top-key share in ppm and max/avg x1000, both exact ceil-free
    // integer divisions.
    "q65_key_skew_profile" -> ((s, dir) => {
      val cnts = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      val top = cnts.orderBy(col("c").desc, col("l_partkey").asc).limit(1)
        .select(col("l_partkey").as("top_key"), col("c").as("max_key_rows"))
      cnts.agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"))
        .crossJoin(top)
        .select(col("n_rows"), col("n_keys"), col("top_key"),
          col("max_key_rows"),
          expr("(max_key_rows * 1000000) div n_rows").as("top_share_ppm"),
          expr("(max_key_rows * n_keys * 1000) div n_rows").as("skew_x1000"))
    }),

    // Table profile: per-column null counts + distinct cardinalities +
    // numeric ranges in one pass (single row).
    "q34_profile" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      o.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
        sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)).as("null_orderdate"),
        countDistinct(col("o_custkey")).as("ndv_custkey"),
        countDistinct(col("o_orderstatus")).as("ndv_status"),
        countDistinct(col("o_orderpriority")).as("ndv_priority"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        expr("cast(min(o_orderdate) as date)").as("min_date"),
        expr("cast(max(o_orderdate) as date)").as("max_date"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q32_percentiles" ->
      """SELECT o_orderstatus, count(*) AS n,
           CAST(CAST(quantile_cont(o_totalprice, 0.25) AS DECIMAL(18,6)) AS DOUBLE) AS p25,
           CAST(CAST(quantile_cont(o_totalprice, 0.5) AS DECIMAL(18,6)) AS DOUBLE) AS p50,
           CAST(CAST(quantile_cont(o_totalprice, 0.75) AS DECIMAL(18,6)) AS DOUBLE) AS p75,
           CAST(CAST(quantile_cont(o_totalprice, 0.9) AS DECIMAL(18,6)) AS DOUBLE) AS p90
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q33_histogram" ->
      """SELECT least(19, CAST(floor(o_totalprice / 30000) AS INT)) AS bucket,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
         FROM orders GROUP BY bucket ORDER BY bucket""",
    "q45_kmv_distinct" ->
      s"""WITH hs AS (SELECT DISTINCT ${graft.queries.Dedup.h60Duck("CAST(user_id AS VARCHAR)")} AS h
              FROM events),
          bot AS (SELECT h FROM hs ORDER BY h LIMIT 64),
          kth AS (SELECT count(*) AS k_used, max(h) AS kth_hash FROM bot),
          ex AS (SELECT count(DISTINCT user_id) AS n_exact FROM events)
          SELECT k_used, kth_hash, est_distinct, n_exact,
            (est_distinct - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE) AS rel_error
          FROM (SELECT CAST(k_used AS BIGINT) AS k_used, kth_hash,
              CASE WHEN k_used < 64 THEN CAST(k_used AS DOUBLE)
                   ELSE CAST(63 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
                     / CAST(kth_hash AS DOUBLE) END AS est_distinct,
              n_exact
            FROM kth, ex)""",
    "q53_reservoir" ->
      s"""WITH h AS (SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
              ${graft.queries.Dedup.h60Duck("'rsv:' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)")} AS h
            FROM lineitem),
          ranked AS (SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity, h,
              row_number() OVER (PARTITION BY l_returnflag
                ORDER BY h ASC, l_orderkey ASC, l_linenumber ASC, l_quantity ASC) AS rank
            FROM h)
          SELECT l_returnflag, CAST(rank AS INT) AS rank, l_orderkey,
            l_linenumber, l_quantity, h AS sample_hash
          FROM ranked WHERE rank <= 5 ORDER BY l_returnflag, rank""",
    "q56_bloom_semijoin" -> {
      def posFromH(j: Int): String =
        s"(h % 8192 + $j * (1 + (h // 8192) % 8191)) % 8192"
      s"""WITH dim AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
          dimh AS (SELECT ${graft.queries.Dedup.h60Duck("'bf:' || CAST(c_custkey AS VARCHAR)")} AS h FROM dim),
          ps AS (SELECT unnest([${(0 until 3).map(posFromH).mkString(", ")}]) AS p FROM dimh),
          words AS (SELECT CAST(p // 63 AS INT) AS word,
              bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS w
            FROM ps GROUP BY 1),
          probe AS (SELECT o_orderkey, o_custkey, o_orderstatus,
              ${(1 to 3).map(kk => s"${posFromH(kk - 1)} AS p$kk").mkString(", ")}
            FROM (SELECT o_orderkey, o_custkey, o_orderstatus,
                ${graft.queries.Dedup.h60Duck("'bf:' || CAST(o_custkey AS VARCHAR)")} AS h
              FROM orders)),
          passed AS (SELECT probe.* FROM probe
            LEFT JOIN words w1 ON w1.word = CAST(p1 // 63 AS INT)
            LEFT JOIN words w2 ON w2.word = CAST(p2 // 63 AS INT)
            LEFT JOIN words w3 ON w3.word = CAST(p3 // 63 AS INT)
            WHERE w1.w IS NOT NULL AND ((w1.w >> CAST(p1 % 63 AS INT)) & 1) = 1
              AND w2.w IS NOT NULL AND ((w2.w >> CAST(p2 % 63 AS INT)) & 1) = 1
              AND w3.w IS NOT NULL AND ((w3.w >> CAST(p3 % 63 AS INT)) & 1) = 1),
          nb AS (SELECT o_orderstatus, count(*) AS n_bloom FROM passed GROUP BY 1),
          ne AS (SELECT o_orderstatus, count(*) AS n_exact FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM dim) GROUP BY 1)
          SELECT nb.o_orderstatus, n_bloom,
            COALESCE(n_exact, 0) AS n_exact,
            n_bloom - COALESCE(n_exact, 0) AS n_false_pos
          FROM nb LEFT JOIN ne ON nb.o_orderstatus = ne.o_orderstatus
          ORDER BY nb.o_orderstatus"""
    },
    "q61_hist_quantiles" ->
      """WITH hist AS (SELECT CAST(floor(o_totalprice / 30000) AS BIGINT) AS bucket,
              count(*) AS nb
            FROM orders GROUP BY 1),
          cum AS (SELECT bucket, nb,
              CAST(sum(nb) OVER (ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM hist),
          cum2 AS (SELECT bucket, nb, cum, cum - nb AS cumb FROM cum),
          tot AS (SELECT count(*) AS n_total FROM orders),
          ex AS (SELECT
              CAST(CAST(quantile_cont(o_totalprice, 0.5) AS DECIMAL(18,6)) AS DOUBLE) AS x50,
              CAST(CAST(quantile_cont(o_totalprice, 0.9) AS DECIMAL(18,6)) AS DOUBLE) AS x90,
              CAST(CAST(quantile_cont(o_totalprice, 0.99) AS DECIMAL(18,6)) AS DOUBLE) AS x99
            FROM orders),
          tg AS (SELECT p_label, num, den, n_total,
              (n_total * num + den - 1) // den AS target
            FROM (SELECT unnest([
                {'p_label': 'p50', 'num': 1, 'den': 2},
                {'p_label': 'p90', 'num': 9, 'den': 10},
                {'p_label': 'p99', 'num': 99, 'den': 100}],
                recursive := true) ), tot)
          SELECT p_label, n_total, CAST(target AS BIGINT) AS target, bucket,
            nb AS n_in_bucket,
            CAST(bucket * 30000 AS DOUBLE)
              + CAST(30000 AS DOUBLE) * (CAST(target - cumb AS DOUBLE) / CAST(nb AS DOUBLE)) AS est,
            CASE WHEN p_label = 'p50' THEN x50
                 WHEN p_label = 'p90' THEN x90 ELSE x99 END AS exact_val,
            CAST(bucket * 30000 AS DOUBLE)
              + CAST(30000 AS DOUBLE) * (CAST(target - cumb AS DOUBLE) / CAST(nb AS DOUBLE))
              - (CASE WHEN p_label = 'p50' THEN x50
                      WHEN p_label = 'p90' THEN x90 ELSE x99 END) AS abs_err
          FROM tg JOIN cum2 ON cumb < target AND target <= cum, ex
          ORDER BY p_label""",
    "q67_equidepth_hist" ->
      """WITH b AS (SELECT
            CAST(CAST(quantile_cont(o_totalprice, 0.25) AS DECIMAL(18,6)) AS DOUBLE) AS b1,
            CAST(CAST(quantile_cont(o_totalprice, 0.5) AS DECIMAL(18,6)) AS DOUBLE) AS b2,
            CAST(CAST(quantile_cont(o_totalprice, 0.75) AS DECIMAL(18,6)) AS DOUBLE) AS b3
          FROM orders)
          SELECT count(*) AS n_rows, b1, b2, b3,
            CAST(sum(CASE WHEN o_totalprice < b1 THEN 1 ELSE 0 END) AS BIGINT) AS n_q1,
            CAST(sum(CASE WHEN o_totalprice >= b1 AND o_totalprice < b2 THEN 1 ELSE 0 END) AS BIGINT) AS n_q2,
            CAST(sum(CASE WHEN o_totalprice >= b2 AND o_totalprice < b3 THEN 1 ELSE 0 END) AS BIGINT) AS n_q3,
            CAST(sum(CASE WHEN o_totalprice >= b3 THEN 1 ELSE 0 END) AS BIGINT) AS n_q4
          FROM orders, b GROUP BY b1, b2, b3""",
    "q65_key_skew_profile" ->
      """WITH cnts AS (SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY l_partkey),
          top AS (SELECT l_partkey AS top_key, CAST(c AS BIGINT) AS max_key_rows
                  FROM cnts ORDER BY c DESC, l_partkey ASC LIMIT 1),
          a AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys FROM cnts)
          SELECT n_rows, n_keys, top_key, max_key_rows,
            (max_key_rows * 1000000) // n_rows AS top_share_ppm,
            (max_key_rows * n_keys * 1000) // n_rows AS skew_x1000
          FROM a, top""",
    "q34_profile" ->
      """SELECT count(*) AS n_rows,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
           CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_orderdate,
           count(DISTINCT o_custkey) AS ndv_custkey,
           count(DISTINCT o_orderstatus) AS ndv_status,
           count(DISTINCT o_orderpriority) AS ndv_priority,
           min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
           CAST(min(o_orderdate) AS DATE) AS min_date,
           CAST(max(o_orderdate) AS DATE) AS max_date
         FROM orders"""
  )
}
