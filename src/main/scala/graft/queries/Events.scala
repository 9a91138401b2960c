package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-stream analytics over the `events` table, expressed in batch
  * form with DuckDB oracles. The same transformations run unchanged on a
  * streaming DataFrame (see graft.streaming.EventStreams + its spec):
  * tumbling-window aggregation maps to watermark + window in Structured
  * Streaming; sessionization maps to flatMapGroupsWithState.
  *
  * Scale: windowed aggregation is one shuffle on (window, event_type) —
  * partial aggregation map-side; sessionization is one shuffle on
  * user_id then a per-user sort (Spark's window functions sort within
  * partitions), both linear.
  */
object Events {

  /** Exact, order-independent sum of a 2dp double column. */
  private val dsumVal = "cast(sum(cast(value as decimal(18,4))) as double)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // WINDOWED bottom-k sample (round 13) — the TTL form's batch twin:
    // the bottom-k sample of the LAST 10 days of event time at 1-day
    // bucket granularity, computed the way the streaming maintainer
    // folds it (per-bucket bottom-k, then a global re-merge). The
    // oracle re-derives the DIRECT bottom-k over the live rows, so the
    // merge law (bottom-k of a union == bottom-k of the parts'
    // bottom-k's) is hash-gated end to end; n_live is the exact count
    // the maintained sample's N/k serve weight tracks.
    "q183_windowed_bottomk" -> ((s, dir) => {
      graft.streaming.SampleMaintainers.windowedBottomK(
        Tables.load(s, dir, "events"), "event_id", "ts",
        windowMicros = 10L * 86400000000L,
        bucketMicros = 86400000000L, k = 512)
        .orderBy(col("event_id"))
    }),

    // WINDOWED deterministic HLL (round 13) — the TTL form for the
    // DISTINCT sketch family: q73's portable register chain (m=1024
    // over the 60-bit h60 hash, rho capped at 30 so the indicator sum
    // is an exact BIGINT) computed over the LAST 10 days of event time
    // at 1-day bucket granularity, THROUGH the per-bucket merge the
    // streaming maintainer folds (per-(bucket, register) max rho →
    // drop expired buckets → per-register max across live buckets).
    // Register max is idempotent/commutative, so the merged registers
    // equal the direct registers over live rows — the oracle
    // re-derives the DIRECT form, gating the merge law exactly as
    // q183 does for bottom-k. event_id is the key BECAUSE it ages out
    // (every user stays active; distinct events in the window don't),
    // so expiry is observable in the estimate.
    "q184_windowed_hll" -> ((s, dir) => {
      val num = (0.7213 / (1.0 + 1.079 / 1024.0) * 1048576.0
        * 1073741824.0).toString
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), expr("unix_micros(ts)").as("us"))
      val mx = ev.agg(max(col("us")).as("mx"))
      val perBucket = ev
        .select(expr("us div 86400000000").as("bkt"),
          expr(graft.queries.Dedup.h60Spark(
            "concat('whll:', cast(event_id as string))")).as("h"))
        .select(col("bkt"), expr("cast(h % 1024 as int)").as("b"),
          expr("h div 1024").as("rest"))
        .groupBy(col("bkt"), col("b"))
        .agg(max(expr(
          "case when rest = 0 then 51 else 51 - length(bin(rest)) end"))
          .as("rho"))
      val regs = perBucket.crossJoin(mx)
        .filter(expr("(bkt + 1) * 86400000000 > mx - 864000000000"))
        .groupBy(col("b")).agg(max(col("rho")).as("rho"))
      val est = regs
        .agg(count(lit(1)).as("nb"),
          sum(expr("shiftleft(cast(1 as bigint), 30 - least(rho, 30))"))
            .as("sp"))
        .select(expr("cast(1024 - nb as int)").as("v_empty"),
          expr("cast(sp + (1024 - nb) * 1073741824 as bigint)")
            .as("s_scaled"))
        .withColumn("est_raw", expr(
          s"cast('$num' as double) / cast(s_scaled as double)"))
      val exact = ev.crossJoin(mx)
        .filter(expr(
          "((us div 86400000000) + 1) * 86400000000 > mx - 864000000000"))
        .agg(countDistinct(col("event_id")).as("n_exact"))
      est.crossJoin(exact)
        .withColumn("rel_error", expr(
          "(est_raw - cast(n_exact as double)) / cast(n_exact as double)"))
    }),

    // WINDOWED CMS point frequencies (round 13) — the frequency
    // family's TTL form, completing the windowed trio (q183 samples,
    // q184 distinct): per-bucket Count-Min sketches over the last 10
    // days at 1-day buckets, merged counter-wise (CMS merge IS
    // addition, so merged == direct over live rows — the additive
    // merge law), each key's min-over-d-rows estimate next to its
    // exact live count. The oracle re-derives q90's SHA-256 bucket
    // arithmetic restricted to the live window.
    "q185_windowed_cms" -> ((s, dir) => {
      graft.streaming.EventStreams.windowedCmsFrequency(
        Tables.load(s, dir, "events"), "event_type", "ts",
        windowMicros = 10L * 86400000000L,
        bucketMicros = 86400000000L,
        keys = Seq("click", "error", "purchase"))
    }),

    // WINDOWED histogram stats (round 14) — the TTL form for the
    // equi-width histogram family (q74/q103 percentile/range serves):
    // per-grid-bucket counts + exact decimal sums over the last 10
    // days at 1-day buckets, computed through the per-event-bucket
    // partials + additive merge the streaming maintainer folds
    // (WindowedSketches.maintainHistogramWindowed). Counts and decimal
    // sums are associative, so the merged form equals the direct
    // aggregate — the oracle re-derives the DIRECT form, gating the
    // additive merge law (the q185 pattern on the histogram family).
    "q186_windowed_histogram" -> ((s, dir) => {
      graft.streaming.WindowedSketches.windowedHistogramStats(
        Tables.load(s, dir, "events"), "value", "ts",
        windowMicros = 10L * 86400000000L,
        bucketMicros = 86400000000L,
        lo = 0.0, width = 30.0, buckets = 20)
    }),

    // WINDOWED grouped stats (round 14) — the TTL form for the exact
    // per-group MIN/MAX/COUNT/SUM serve (q86's family): counts/sums
    // add across live buckets, min/max re-merge (the q184 rule) — the
    // oracle re-derives the direct grouped aggregate over the live
    // window.
    "q187_windowed_grouped_stats" -> ((s, dir) => {
      graft.streaming.WindowedSketches.windowedGroupedStats(
        Tables.load(s, dir, "events"), "event_type", "value", "ts",
        windowMicros = 10L * 86400000000L,
        bucketMicros = 86400000000L)
    }),

    // WINDOWED KMV distinct (round 14) — the TTL form for the
    // set-op/NDV sketch family (q45/q107): per-bucket bottom-k value
    // hashes, live buckets re-merged by bottom-k union (idempotent —
    // the q183 merge law on value hashes), the q45 estimator over the
    // result. event_id is the key BECAUSE it ages out (q184's
    // argument): distinct events in the window shrink as buckets
    // expire, so expiry is observable in the estimate.
    "q188_windowed_kmv" -> ((s, dir) => {
      graft.streaming.WindowedSketches.windowedKmvDistinct(
        Tables.load(s, dir, "events"), "event_id", "ts",
        windowMicros = 10L * 86400000000L,
        bucketMicros = 86400000000L, k = 256)
    }),

    // WINDOWED top-k heavy hitters (round 14) — the trending-now
    // dashboard over the live window: per-user live-window counts at
    // the serve threshold, computed through the per-bucket partials +
    // additive merge the maintainer folds
    // (WindowedSketches.maintainTopKWindowed — expiry subtracts
    // exactly, so unlike the append-only maintainer the completeness
    // bound never inflates). The oracle re-derives the direct
    // GROUP BY ... HAVING over the live window.
    "q189_windowed_topk" -> ((s, dir) => {
      graft.streaming.WindowedSketches.windowedTopK(
        Tables.load(s, dir, "events"), "user_id", "ts",
        windowMicros = 10L * 86400000000L,
        bucketMicros = 86400000000L, threshold = 25L)
    }),

    // WINDOWED grouped HLL (round 14) — the TTL form for the
    // per-group COUNT(DISTINCT) family (q83): q184's deterministic
    // register chain PER GROUP, computed through the per-(bucket,
    // group, register) max-merge the maintainer folds
    // (WindowedSketches.maintainGroupedHllWindowed). Register max is
    // idempotent per group, so merged == direct — the oracle
    // re-derives the DIRECT per-group chain over the live window.
    // event_id is the counted key BECAUSE it ages out (q184's
    // argument, per group).
    "q191_windowed_grouped_hll" -> ((s, dir) => {
      val num = (0.7213 / (1.0 + 1.079 / 1024.0) * 1048576.0
        * 1073741824.0).toString
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          expr("unix_micros(ts)").as("us"))
      val mx = ev.agg(max(col("us")).as("mx"))
      val perBucket = ev
        .select(col("event_type"), expr("us div 86400000000").as("bkt"),
          expr(graft.queries.Dedup.h60Spark(
            "concat('wghll:', cast(event_id as string))")).as("h"))
        .select(col("event_type"), col("bkt"),
          expr("cast(h % 1024 as int)").as("b"),
          expr("h div 1024").as("rest"))
        .groupBy(col("event_type"), col("bkt"), col("b"))
        .agg(max(expr(
          "case when rest = 0 then 51 else 51 - length(bin(rest)) end"))
          .as("rho"))
      val regs = perBucket.crossJoin(mx)
        .filter(expr("(bkt + 1) * 86400000000 > mx - 864000000000"))
        .groupBy(col("event_type"), col("b"))
        .agg(max(col("rho")).as("rho"))
      val est = regs
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("nb"),
          sum(expr("shiftleft(cast(1 as bigint), 30 - least(rho, 30))"))
            .as("sp"))
        .select(col("event_type"),
          expr("cast(1024 - nb as int)").as("v_empty"),
          expr("cast(sp + (1024 - nb) * 1073741824 as bigint)")
            .as("s_scaled"))
        .withColumn("est_raw", expr(
          s"cast('$num' as double) / cast(s_scaled as double)"))
      val exact = ev.crossJoin(mx)
        .filter(expr(
          "((us div 86400000000) + 1) * 86400000000 > mx - 864000000000"))
        .groupBy(col("event_type"))
        .agg(countDistinct(col("event_id")).as("n_exact"))
      est.join(exact, Seq("event_type"))
        .withColumn("rel_error", expr(
          "(est_raw - cast(n_exact as double)) / cast(n_exact as double)"))
        .orderBy(col("event_type"))
    }),

    // WINDOWED HDR percentile (round 14) — the TTL form for the
    // relative-error quantile family (q144): the corrected-log2
    // bucket chain over the last 10 days at 1-day buckets, computed
    // through the per-event-bucket partials + binade-count merge the
    // maintainer folds (WindowedSketches.maintainHdrWindowed — the
    // global log grid means counts add with no grid to declare). The
    // oracle re-derives the DIRECT q144 chain restricted to the live
    // window, with the exact quantile companion through the
    // DECIMAL(18,6) rounding.
    "q190_windowed_hdr" -> ((s, dir) => {
      graft.streaming.WindowedSketches.windowedHdrPercentile(
        Tables.load(s, dir, "events"), "value", "ts",
        windowMicros = 10L * 86400000000L,
        bucketMicros = 86400000000L)
    }),

    // Tumbling 1-hour windows by event type (epoch-aligned, like
    // streaming `window(ts, '1 hour')`).
    "q24_event_window" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
      e.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), expr(dsumVal).as("sum_value"))
        .select(expr("unix_micros(w.start)").as("ws_us"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("ws_us"), col("event_type"))
    }),

    // Streaming AQP's batch twin, oracle-gated: the EXACT
    // sampledWindowedAgg transformation (systematic keyed-hash sample →
    // windowed aggregate → Horvitz-Thompson scaling) that
    // EventStreamsSpec proves equal across micro-batches, run here on
    // the batch input so the driver's DuckDB gate checks the scaled
    // ESTIMATES bit-for-bit (f=0.1 ⇒ HT weight exactly 10.0; decimal
    // sums; single multiplies).
    "q75_sampled_window" -> ((s, dir) => {
      graft.streaming.EventStreams
        .sampledWindowedAgg(Tables.load(s, dir, "events"), 0.1)
        .select(expr("unix_micros(ws)").as("ws_us"), col("event_type"),
          col("n_sampled"), col("est_n"), col("est_sum_value"))
        .orderBy(col("ws_us"), col("event_type"))
    }),

    // Gap-based sessionization (30-minute inactivity closes a session):
    // lag -> new-session flag -> running sum = session id -> per-user
    // session stats. Integer microsecond arithmetic end-to-end.
    "q25_sessionize" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sess = e
        .withColumn("us", expr("unix_micros(ts)"))
        .withColumn("new_s",
          when(col("us") - lag(col("us"), 1).over(byUser) > 1800L * 1000000L
            || lag(col("us"), 1).over(byUser).isNull, 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_s")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("us")) - min(col("us"))).as("span_us"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          max(col("n_events")).as("max_session_events"),
          sum(col("span_us")).as("total_span_us"))
        .orderBy(col("user_id"))
    }),

    // Per-type value distribution stats (the shape a stream-quality
    // monitor computes per window; here over the whole table).
    "q26_event_type_stats" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
      e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          expr(dsumVal).as("sum_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .orderBy(col("event_type"))
    }),

    // Skew mitigation pattern: salted two-stage aggregation. Stage 1
    // groups on (key, salt) so a hot key's rows spread over `salts`
    // reducers; stage 2 merges the partials. The result is EXACTLY the
    // plain GROUP BY (the oracle is the unsalted query).
    "q35_salted_agg" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
      val salted = e
        .withColumn("salt", expr("cast(user_id % 8 as int)"))
        .groupBy(col("event_type"), col("salt"))
        .agg(count(lit(1)).as("pn"),
          sum(expr("cast(value as decimal(18,4))")).as("psum"))
      salted.groupBy(col("event_type"))
        .agg(sum(col("pn")).as("n"),
          expr("cast(sum(psum) as double)").as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // As-of join composed from a tagged union + carry-forward window
    // (one shuffle on user_id, no per-row subquery): for each click,
    // the most recent purchase by the same user at or before its time.
    "q36_asof_join" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .withColumn("us", expr("unix_micros(ts)"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("us"), col("event_id"),
          lit(null).cast("long").as("anchor_us"), lit(0).as("is_anchor"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us"), col("event_id"),
          col("us").as("anchor_us"), lit(1).as("is_anchor"))
      import org.apache.spark.sql.expressions.Window
      // anchors sort before clicks at equal timestamps (inclusive as-of)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("is_anchor").desc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionAll(purchases)
        .withColumn("last_purchase_us",
          last(col("anchor_us"), ignoreNulls = true).over(w))
        .filter(col("is_anchor") === 0)
        .select(col("event_id").as("click_id"), col("user_id"),
          col("us").as("click_us"), col("last_purchase_us"),
          (col("us") - col("last_purchase_us")).as("gap_us"))
        .orderBy(col("click_id"))
    }),

    // Interval self-join via bucketed banding: pairs of events by the
    // same user within one hour, aggregated per (type_a, type_b). The
    // scale shape: a naive range self-join is a per-user cross product;
    // bucketing timestamps into window-sized bands turns it into an
    // EQUI-join on (user_id, bucket) — the left side explodes to its
    // own and the next bucket (any pair within one window spans at most
    // one boundary, so each qualifying pair matches exactly once), the
    // exact range predicate filters after the hash join. Shuffle volume
    // is 2x the input, never quadratic.
    "q46_interval_join" -> ((s, dir) => {
      val hourUs = 3600L * 1000000L
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("event_id"),
          expr("unix_micros(ts)").as("us"))
      val left = e
        .withColumn("bkt",
          explode(expr(s"array(us div ${hourUs}L, us div ${hourUs}L + 1)")))
        .select(col("user_id"), col("bkt"), col("event_type").as("type_a"),
          col("us").as("us_a"))
      val right = e
        .withColumn("bkt", expr(s"us div ${hourUs}L"))
        .select(col("user_id"), col("bkt"), col("event_type").as("type_b"),
          col("us").as("us_b"))
      left.join(right, Seq("user_id", "bkt"))
        .filter(col("us_b") > col("us_a") && col("us_b") <= col("us_a") + hourUs)
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("us_b") - col("us_a")).as("sum_gap_us"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // Privacy pass: pseudonymize the user identifier with a keyed hash
    // (stable across runs/shards — joinable, but no raw ids leave the
    // pipeline), then a k-anonymity report over the (event_type, day,
    // hour) quasi-identifier: groups with fewer than k distinct
    // pseudonyms are flagged for suppression and their counts withheld.
    // One projection + one hash-aggregate; the distinct-count is the
    // same partial-agg shape as any COUNT(DISTINCT).
    "q51_kanonymity" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_type"),
          expr("cast(ts as date)").as("day"),
          hour(col("ts")).as("hr"),
          expr(Dedup.h60Spark("concat('pii:', cast(user_id as string))"))
            .as("pseudo"))
      e.groupBy(col("event_type"), col("day"), col("hr"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("pseudo")).as("n_users"))
        .withColumn("suppressed",
          expr(s"case when n_users < ${graft.queries.Corpus.kAnon}L then 1 else 0 end"))
        .withColumn("released_n",
          expr("case when suppressed = 1 then cast(null as bigint) else n_events end"))
        .orderBy(col("event_type"), col("day"), col("hr"))
    }),

    // Rate-anomaly detection: per-type hourly event counts flagged when
    // an hour exceeds 2x the average of its trailing 7 OBSERVED hours
    // (rows, not wall-clock hours — hours with zero events produce no
    // row; identical semantics in both engines). The comparison is
    // cross-multiplied to stay in exact integer arithmetic
    // (n * n_hours > 2 * trailing_sum == n > 2 * trailing_avg), so no
    // float threshold can diverge. One shuffle on event_type; the
    // trailing window sorts within partitions — the stream-monitoring
    // shape (per-key ordered state) at batch parity.
    "q57_rate_anomaly" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = Tables.load(s, dir, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hb"))
        .groupBy(col("event_type"), col("hb"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hb"))
        .rowsBetween(-7, -1)
      hourly
        .withColumn("trailing_n", coalesce(sum(col("n")).over(w), lit(0L)))
        .withColumn("trailing_hours", count(col("n")).over(w))
        .withColumn("anomaly", expr(
          "case when trailing_hours >= 3 and n * trailing_hours > 2 * trailing_n then 1 else 0 end"))
        .select(col("event_type"), col("hb"), col("n"),
          col("trailing_n"), col("trailing_hours"), col("anomaly"))
        .orderBy(col("event_type"), col("hb"))
    }),

    // Ordered conversion funnel: per user, first 'view', first 'click'
    // strictly after it, first 'purchase' strictly after that — the
    // event-sequence analysis a product pipeline runs on the same
    // stream the engine windows/sessionizes. Three min-aggregates
    // keyed on user_id (each stage joins the previous stage's tiny
    // per-user table back to the keyed events — same-key shuffles,
    // reusable partitioning); rates are single exact-integer divisions.
    "q64_conversion_funnel" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("vts"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("vts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("cts"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("cts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("pts"))
      v.agg(count(lit(1)).as("n_viewers")).crossJoin(
        c.agg(count(lit(1)).as("n_clicked")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchased")))
        .select(col("n_viewers"), col("n_clicked"), col("n_purchased"),
          expr("cast(n_clicked as double) / cast(n_viewers as double)")
            .as("click_through"),
          expr("cast(n_purchased as double) / cast(n_clicked as double)")
            .as("purchase_through"))
    }),

    // Cohort retention matrix: users grouped by first-seen day (their
    // cohort), tracked for two weeks of day offsets — the
    // product-analytics report behind every retention dashboard. Two
    // aggregates keyed on user_id (first-seen, then the activity join
    // back — same key, so the exchange is reused), then one
    // (cohort, offset) hash-aggregate; the per-cohort size table is one
    // row per DAY, broadcast back for the rate division. At 100 TB the
    // user_id shuffles are the only data-sized exchanges and both hash
    // the same key.
    "q164_cohort_retention" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
      val first = e.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      val sizes = first.groupBy(col("cohort_day"))
        .agg(count(lit(1)).as("cohort_users"))
      e.join(first, "user_id")
        .withColumn("day_offset", col("day") - col("cohort_day"))
        .filter(col("day_offset") <= 13)
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .join(broadcast(sizes), "cohort_day")
        .select(col("cohort_day"), col("day_offset"), col("n_active"),
          col("cohort_users"),
          expr("cast(n_active as double) / cast(cohort_users as double)")
            .as("retention"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // JSON property extraction from the semi-structured props column.
    "q37_json_extract" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
      e.select(col("event_id"), col("event_type"),
        expr("cast(get_json_object(props, '$.k') as int)").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    })
  )

  val oracle: Map[String, String] = Map(
    // q183: the DIRECT windowed bottom-k — live buckets from the max
    // event time ((b+1)·bucket > max − window, all-integer µs
    // arithmetic), the 'bkw:' keyed h60 rank over live rows, rn <= k.
    // Matching the engine's bucket-merge route gates the merge law.
    "q183_windowed_bottomk" ->
      s"""WITH e AS (SELECT event_id AS k, epoch_us(ts) AS us FROM events),
          mx AS (SELECT max(us) AS m FROM e),
          lv AS (SELECT e.k FROM e, mx
            WHERE ((us // 86400000000) + 1) * 86400000000
              > mx.m - 864000000000),
          nn AS (SELECT count(*) AS n FROM lv),
          rk AS (SELECT k, row_number() OVER (ORDER BY
              ${graft.queries.Dedup.h60Duck("'bkw:' || CAST(k AS VARCHAR)")} ASC,
              k ASC) AS rn FROM lv)
          SELECT rk.k AS event_id, nn.n AS n_live
          FROM rk, nn WHERE rn <= 512 ORDER BY event_id""",
    // q184: the DIRECT register chain over live rows (the merged
    // per-bucket form must equal it — register max is idempotent);
    // q73's arithmetic with the live-window restriction.
    "q184_windowed_hll" -> {
      val num = (0.7213 / (1.0 + 1.079 / 1024.0) * 1048576.0
        * 1073741824.0).toString
      s"""WITH e AS (SELECT event_id AS k, epoch_us(ts) AS us FROM events),
          mx AS (SELECT max(us) AS m FROM e),
          lv AS (SELECT e.k FROM e, mx
            WHERE ((us // 86400000000) + 1) * 86400000000
              > mx.m - 864000000000),
          h AS (SELECT ${graft.queries.Dedup.h60Duck("'whll:' || CAST(k AS VARCHAR)")} AS h
            FROM lv),
          b AS (SELECT CAST(h % 1024 AS INT) AS b, h // 1024 AS rest FROM h),
          r AS (SELECT b,
              max(CASE WHEN rest = 0 THEN 51 ELSE 51 - length(bin(rest)) END) AS rho
            FROM b GROUP BY b),
          s AS (SELECT count(*) AS nb,
              sum(CAST(1 AS BIGINT) << CAST(30 - least(rho, 30) AS INT)) AS sp
            FROM r),
          ex AS (SELECT count(DISTINCT k) AS n_exact FROM lv)
          SELECT CAST(1024 - nb AS INT) AS v_empty,
            CAST(sp + (1024 - nb) * 1073741824 AS BIGINT) AS s_scaled,
            CAST('$num' AS DOUBLE)
              / CAST(CAST(sp + (1024 - nb) * 1073741824 AS BIGINT) AS DOUBLE) AS est_raw,
            n_exact,
            (CAST('$num' AS DOUBLE)
                / CAST(CAST(sp + (1024 - nb) * 1073741824 AS BIGINT) AS DOUBLE)
              - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE) AS rel_error
          FROM s, ex"""
    },
    // q185: the DIRECT CMS chain over live rows — q90's positional
    // SHA-256/HUGEINT bucket arithmetic with w/d from the Cms
    // constructor, input restricted to the live window; exact counts
    // from the same lv CTE.
    "q185_windowed_cms" -> {
      val cms = new graft.sketch.Cms(0.01, 0.01)
      val bucket = (0 until 8).map { j =>
        val p1 = 2 * j + 1
        val p2 = 2 * j + 2
        val pair = s"((strpos('0123456789abcdef', substr(hx,$p1,1))-1)*16" +
          s" + (strpos('0123456789abcdef', substr(hx,$p2,1))-1))"
        val mult = java.math.BigInteger.valueOf(256).pow(j)
        s"CAST($pair AS HUGEINT) * CAST('$mult' AS HUGEINT)"
      }.mkString("(", " + ", s") % ${cms.w}")
      s"""WITH ri AS (SELECT unnest(range(${cms.d})) AS i),
          e AS (SELECT event_type AS sv, epoch_us(ts) AS us FROM events),
          mx AS (SELECT max(us) AS m FROM e),
          lv AS (SELECT sv FROM e, mx
            WHERE ((us // 86400000000) + 1) * 86400000000
              > mx.m - 864000000000),
          inp AS (
            SELECT sv, 1 AS isrow FROM lv
            UNION ALL
            SELECT k, 0 FROM (SELECT unnest(
              ['click', 'error', 'purchase']) AS k) tk),
          hashed AS (
            SELECT isrow, sv, i, sha256(sv || CAST(i AS VARCHAR)) AS hx
            FROM inp CROSS JOIN ri),
          bk AS (SELECT isrow, sv, i, $bucket AS c FROM hashed),
          cnt AS (
            SELECT t.sv AS k, t.i, count(r.c) AS n
            FROM (SELECT sv, i, c FROM bk WHERE isrow = 0) t
            LEFT JOIN (SELECT i, c FROM bk WHERE isrow = 1) r
              ON r.i = t.i AND r.c = t.c
            GROUP BY t.sv, t.i),
          est AS (SELECT k, min(n) AS e FROM cnt GROUP BY k),
          ex AS (SELECT sv AS k, count(*) AS n_exact FROM lv
            WHERE sv IN ('click', 'error', 'purchase') GROUP BY sv)
          SELECT est.k, CAST(est.e AS BIGINT) AS est,
            CAST(COALESCE(ex.n_exact, 0) AS BIGINT) AS n_exact
          FROM est LEFT JOIN ex ON est.k = ex.k ORDER BY est.k"""
    },
    // q186: the DIRECT per-grid-bucket counts + decimal sums over the
    // live window (the maintainer's per-bucket fold + additive merge
    // must equal it). The grid expression is the maintainer's verbatim
    // (double-domain clamp, then the int cast).
    "q186_windowed_histogram" ->
      """WITH e AS (SELECT value AS v, epoch_us(ts) AS us FROM events
            WHERE ts IS NOT NULL AND value IS NOT NULL),
          mx AS (SELECT max(us) AS m FROM e),
          lv AS (SELECT v FROM e, mx
            WHERE ((us // 86400000000) + 1) * 86400000000
              > mx.m - 864000000000)
          SELECT CAST(least(CAST(19 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
              floor((CAST(v AS DOUBLE) - 0.0) / 30.0))) AS INT) AS b,
            count(*) AS n,
            CAST(sum(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
          FROM lv GROUP BY 1 ORDER BY b""",
    // q187: the DIRECT grouped stats over the live window (counts and
    // decimal sums add across buckets; min/max re-merge — the
    // maintainer's GroupedStats.merge across live buckets equals
    // this).
    "q187_windowed_grouped_stats" ->
      """WITH e AS (SELECT event_type, value AS v, epoch_us(ts) AS us
            FROM events WHERE ts IS NOT NULL),
          mx AS (SELECT max(us) AS m FROM e),
          lv AS (SELECT event_type, v FROM e, mx
            WHERE ((us // 86400000000) + 1) * 86400000000
              > mx.m - 864000000000)
          SELECT event_type, count(*) AS n, count(v) AS n_value,
            CAST(sum(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
            min(v) AS min_value, max(v) AS max_value
          FROM lv GROUP BY event_type ORDER BY event_type""",
    // q188: q45's KMV estimator chain (h60 bottom-k, (k-1)*2^60/h_k
    // with the exact float association) restricted to the live window
    // — the DIRECT bottom-k the per-bucket union must equal.
    "q188_windowed_kmv" ->
      s"""WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events
            WHERE ts IS NOT NULL),
          mx AS (SELECT max(us) AS m FROM e),
          lv AS (SELECT event_id FROM e, mx
            WHERE ((us // 86400000000) + 1) * 86400000000
              > mx.m - 864000000000),
          hs AS (SELECT DISTINCT ${graft.queries.Dedup.h60Duck("CAST(event_id AS VARCHAR)")} AS h
            FROM lv),
          bot AS (SELECT h FROM hs ORDER BY h LIMIT 256),
          kth AS (SELECT count(*) AS k_used, max(h) AS kth_hash FROM bot),
          ex AS (SELECT count(DISTINCT event_id) AS n_exact FROM lv)
          SELECT CAST(k_used AS BIGINT) AS k_used,
            CAST(COALESCE(kth_hash, 0) AS BIGINT) AS kth_hash,
            est_distinct, n_exact,
            (est_distinct - CAST(n_exact AS DOUBLE))
              / CAST(n_exact AS DOUBLE) AS rel_error
          FROM (SELECT k_used, kth_hash,
              CASE WHEN k_used < 256 THEN CAST(k_used AS DOUBLE)
                   ELSE CAST(255 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
                     / CAST(kth_hash AS DOUBLE) END AS est_distinct,
              n_exact
            FROM kth, ex) t""",
    // q191: the DIRECT per-group register chain over live rows
    // (per-(bucket, group, register) max-merge must equal it —
    // register max is idempotent per group); q184's arithmetic with a
    // GROUP BY event_type.
    "q191_windowed_grouped_hll" -> {
      val num = (0.7213 / (1.0 + 1.079 / 1024.0) * 1048576.0
        * 1073741824.0).toString
      s"""WITH e AS (SELECT event_type AS g, event_id AS k,
              epoch_us(ts) AS us FROM events),
          mx AS (SELECT max(us) AS m FROM e),
          lv AS (SELECT g, k FROM e, mx
            WHERE ((us // 86400000000) + 1) * 86400000000
              > mx.m - 864000000000),
          h AS (SELECT g,
              ${graft.queries.Dedup.h60Duck("'wghll:' || CAST(k AS VARCHAR)")} AS h
            FROM lv),
          b AS (SELECT g, CAST(h % 1024 AS INT) AS b, h // 1024 AS rest
            FROM h),
          r AS (SELECT g, b,
              max(CASE WHEN rest = 0 THEN 51 ELSE 51 - length(bin(rest)) END) AS rho
            FROM b GROUP BY g, b),
          s AS (SELECT g, count(*) AS nb,
              sum(CAST(1 AS BIGINT) << CAST(30 - least(rho, 30) AS INT)) AS sp
            FROM r GROUP BY g),
          ex AS (SELECT g, count(DISTINCT k) AS n_exact FROM lv GROUP BY g)
          SELECT s.g AS event_type,
            CAST(1024 - s.nb AS INT) AS v_empty,
            CAST(s.sp + (1024 - s.nb) * 1073741824 AS BIGINT) AS s_scaled,
            CAST('$num' AS DOUBLE)
              / CAST(CAST(s.sp + (1024 - s.nb) * 1073741824 AS BIGINT) AS DOUBLE) AS est_raw,
            ex.n_exact,
            (CAST('$num' AS DOUBLE)
                / CAST(CAST(s.sp + (1024 - s.nb) * 1073741824 AS BIGINT) AS DOUBLE)
              - CAST(ex.n_exact AS DOUBLE)) / CAST(ex.n_exact AS DOUBLE) AS rel_error
          FROM s JOIN ex ON s.g = ex.g ORDER BY event_type"""
    },
    // q190: the q144 corrected-log2 HDR percentile chain (m=32, the
    // /32 sub-bucket arithmetic, the zero-first walk — events.value is
    // non-negative) restricted to the live window; exact companion
    // through DECIMAL(18,6) (the q74/q144 recipe). Breaks together
    // with q144/q150 if the bucket chain or the walk changes.
    "q190_windowed_hdr" ->
      """WITH base AS (SELECT CAST(value AS DOUBLE) AS v, epoch_us(ts) AS us
            FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
          mx AS (SELECT max(us) AS m FROM base),
          ve AS (SELECT v FROM base, mx
            WHERE ((us // 86400000000) + 1) * 86400000000
              > mx.m - 864000000000),
          ea AS (SELECT v, abs(v) AS av FROM ve),
          eb0 AS (SELECT v, av, CASE WHEN v = 0 THEN 0
              ELSE CAST(floor(log2(av)) AS INTEGER) END AS e0 FROM ea),
          eb1 AS (SELECT v, av, CASE WHEN v = 0 THEN 0
              WHEN pow(2.0, CAST(e0 AS DOUBLE)) > av THEN e0 - 1
              WHEN pow(2.0, CAST(e0 + 1 AS DOUBLE)) <= av THEN e0 + 1
              ELSE e0 END AS e FROM eb0),
          eb2 AS (SELECT CASE WHEN v = 0 THEN 1 ELSE 0 END AS isz,
              CASE WHEN v = 0 THEN 0 ELSE e END AS e,
              CASE WHEN v = 0 THEN 0 ELSE least(31,
                CAST(floor((av / pow(2.0, CAST(e AS DOUBLE)) - 1.0) * 32.0)
                  AS INTEGER)) END AS s
            FROM eb1),
          ebk AS (SELECT isz, e, s, count(*) AS n FROM eb2 GROUP BY 1, 2, 3),
          ecm AS (SELECT isz, e, s, n,
              sum(n) OVER (ORDER BY isz DESC, e, s) - n AS cumb,
              sum(n) OVER () AS total FROM ebk),
          etg AS (SELECT CAST('0.5' AS DOUBLE) * CAST(t.total - 1 AS DOUBLE) AS target
            FROM (SELECT max(total) AS total FROM ecm) t),
          epk AS (SELECT etg.target, ecm.isz, ecm.e, ecm.s, ecm.n, ecm.cumb
            FROM etg, ecm WHERE ecm.cumb + ecm.n > etg.target
            QUALIFY row_number() OVER (ORDER BY ecm.isz DESC, ecm.e, ecm.s) = 1),
          ees AS (SELECT CASE WHEN isz = 1 THEN CAST(0 AS DOUBLE) ELSE
              pow(2.0, CAST(e AS DOUBLE)) * (1.0 + CAST(s AS DOUBLE) / 32.0)
              + (pow(2.0, CAST(e AS DOUBLE)) / 32.0)
                * (CASE WHEN n <= 1 THEN CAST(0 AS DOUBLE)
                        ELSE (target - CAST(cumb AS DOUBLE)) / CAST(n AS DOUBLE) END)
            END AS p50 FROM epk),
          exq AS (SELECT
              CAST(CAST(quantile_cont(v, 0.5) AS DECIMAL(18,6)) AS DOUBLE) AS x50,
              count(*) AS n_live
            FROM ve)
          SELECT ees.p50 AS p50_est, exq.n_live, exq.x50 AS p50_exact,
            ees.p50 - exq.x50 AS err_p50,
            CAST('0.03125' AS DOUBLE) AS rel_bound
          FROM ees, exq""",
    // q189: the DIRECT per-user live-window counts at the threshold
    // (the maintainer's per-bucket partials + additive merge must
    // equal it); (n DESC, user_id ASC) is a total order.
    "q189_windowed_topk" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events
            WHERE ts IS NOT NULL),
          mx AS (SELECT max(us) AS m FROM e),
          lv AS (SELECT user_id FROM e, mx
            WHERE ((us // 86400000000) + 1) * 86400000000
              > mx.m - 864000000000)
          SELECT user_id, count(*) AS n FROM lv
          GROUP BY user_id HAVING count(*) >= 25
          ORDER BY n DESC, user_id""",
    "q164_cohort_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
          f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
          sz AS (SELECT cohort_day, count(*) AS cohort_users FROM f GROUP BY cohort_day),
          act AS (SELECT f.cohort_day, e.day - f.cohort_day AS day_offset,
              count(DISTINCT e.user_id) AS n_active
            FROM e JOIN f ON e.user_id = f.user_id
            WHERE e.day - f.cohort_day <= 13
            GROUP BY 1, 2)
          SELECT act.cohort_day, act.day_offset, act.n_active, sz.cohort_users,
            CAST(act.n_active AS DOUBLE) / CAST(sz.cohort_users AS DOUBLE) AS retention
          FROM act JOIN sz USING (cohort_day)
          ORDER BY cohort_day, day_offset""",
    "q64_conversion_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS vts FROM events
              WHERE event_type = 'view' GROUP BY user_id),
          c AS (SELECT e.user_id, min(e.ts) AS cts FROM events e
              JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts > v.vts GROUP BY e.user_id),
          p AS (SELECT e.user_id, min(e.ts) AS pts FROM events e
              JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.cts GROUP BY e.user_id)
          SELECT (SELECT count(*) FROM v) AS n_viewers,
            (SELECT count(*) FROM c) AS n_clicked,
            (SELECT count(*) FROM p) AS n_purchased,
            CAST((SELECT count(*) FROM c) AS DOUBLE)
              / CAST((SELECT count(*) FROM v) AS DOUBLE) AS click_through,
            CAST((SELECT count(*) FROM p) AS DOUBLE)
              / CAST((SELECT count(*) FROM c) AS DOUBLE) AS purchase_through""",
    "q24_event_window" ->
      """SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS ws_us, event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events GROUP BY ws_us, event_type ORDER BY ws_us, event_type""",
    "q75_sampled_window" ->
      s"""WITH k AS (SELECT ts, event_type, value FROM events
            WHERE ${graft.queries.Dedup.h60Duck("'sw:' || CAST(event_id AS VARCHAR)")} % 10000 < 1000)
          SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS ws_us, event_type,
            count(*) AS n_sampled,
            CAST(count(*) AS DOUBLE) * 10.0 AS est_n,
            CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) * 10.0 AS est_sum_value
          FROM k GROUP BY ws_us, event_type ORDER BY ws_us, event_type""",
    "q25_sessionize" ->
      """WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
          flagged AS (SELECT user_id, event_id, us,
              CASE WHEN us - lag(us) OVER w > 1800000000
                   OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
            FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
          sess AS (SELECT user_id, us,
              sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged),
          per_session AS (SELECT user_id, sid, count(*) AS n_events,
              max(us) - min(us) AS span_us
            FROM sess GROUP BY user_id, sid)
          SELECT user_id, count(*) AS n_sessions,
            CAST(sum(n_events) AS BIGINT) AS n_events,
            max(n_events) AS max_session_events,
            CAST(sum(span_us) AS BIGINT) AS total_span_us
          FROM per_session GROUP BY user_id ORDER BY user_id""",
    "q26_event_type_stats" ->
      """SELECT event_type, count(*) AS n,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           min(value) AS min_value, max(value) AS max_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    // the salted two-stage plan must equal the plain aggregation
    "q35_salted_agg" ->
      """SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q36_asof_join" ->
      """WITH e AS (SELECT event_id, event_type, user_id, epoch_us(ts) AS us FROM events),
          tagged AS (
            SELECT user_id, us, event_id, CAST(NULL AS BIGINT) AS anchor_us, 0 AS is_anchor
            FROM e WHERE event_type = 'click'
            UNION ALL
            SELECT user_id, us, event_id, us AS anchor_us, 1 AS is_anchor
            FROM e WHERE event_type = 'purchase'),
          carried AS (
            SELECT user_id, us, event_id, is_anchor,
              last_value(anchor_us IGNORE NULLS) OVER (
                PARTITION BY user_id
                ORDER BY us ASC, is_anchor DESC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_us
            FROM tagged)
          SELECT event_id AS click_id, user_id, us AS click_us,
            last_purchase_us, us - last_purchase_us AS gap_us
          FROM carried WHERE is_anchor = 0 ORDER BY click_id""",
    // the oracle is the naive range self-join the banding replaces
    "q46_interval_join" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events)
         SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_pairs,
           CAST(sum(b.us - a.us) AS BIGINT) AS sum_gap_us
         FROM e a JOIN e b
           ON a.user_id = b.user_id AND b.us > a.us AND b.us <= a.us + 3600000000
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q51_kanonymity" ->
      s"""WITH p AS (SELECT event_type, CAST(ts AS DATE) AS day,
              CAST(extract(hour FROM ts) AS INT) AS hr,
              ${Dedup.h60Duck("'pii:' || CAST(user_id AS VARCHAR)")} AS pseudo
            FROM events),
          g AS (SELECT event_type, day, hr, count(*) AS n_events,
              count(DISTINCT pseudo) AS n_users
            FROM p GROUP BY event_type, day, hr)
          SELECT event_type, day, hr, n_events, n_users,
            CASE WHEN n_users < ${graft.queries.Corpus.kAnon} THEN 1 ELSE 0 END AS suppressed,
            CASE WHEN n_users < ${graft.queries.Corpus.kAnon} THEN CAST(NULL AS BIGINT)
                 ELSE n_events END AS released_n
          FROM g ORDER BY event_type, day, hr""",
    "q57_rate_anomaly" ->
      """WITH hourly AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hb,
              count(*) AS n
            FROM events GROUP BY event_type, hb),
          win AS (SELECT event_type, hb, n,
              CAST(COALESCE(sum(n) OVER w, 0) AS BIGINT) AS trailing_n,
              count(n) OVER w AS trailing_hours
            FROM hourly
            WINDOW w AS (PARTITION BY event_type ORDER BY hb
              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
          SELECT event_type, hb, n, trailing_n, trailing_hours,
            CASE WHEN trailing_hours >= 3 AND n * trailing_hours > 2 * trailing_n
                 THEN 1 ELSE 0 END AS anomaly
          FROM win ORDER BY event_type, hb""",
    "q37_json_extract" ->
      """SELECT event_type, count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type"""
  )
}
