package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.{MetaCatalog, SampleNaming}
import graft.learn.QueryHistory
import graft.plan._

/** The engine facade — the Spark-native equivalent of the reference's
  * `POST /query` pipeline (/root/reference/app.py:62-163):
  *
  *   parse -> features -> strategy choice (rules + history) -> plan
  *   (exact | sample | sketch | stratified) -> plan-level rewrite
  *   (explicit pre-analysis plan transform) -> Spark execution
  *   -> optional dual-run speedup measurement -> history append.
  *
  * Differences from the reference, all deliberate (SURVEY §4.4, §2.C):
  *  - ONE typed sampling decision flows through (no double rewrite/scale).
  *  - "sketch" really answers COUNT(DISTINCT) with HyperLogLog++ instead
  *    of 30% systematic sampling.
  *  - "stratified" really routes to a registered stratified sample (with
  *    per-stratum Horvitz-Thompson weights) instead of being a no-op.
  *  - the learning loop is closed: measured speedup/error are recorded
  *    and the history adjustment sees real data.
  */
final class QueryEngine(
    val spark: SparkSession,
    val catalog: MetaCatalog,
    val history: QueryHistory = new QueryHistory,
    val seed: Long = 42L,
    parseCacheCap: Int = 1024) {

  // the engine's native SQL functions (cosine_similarity) are available
  // to every query this engine serves, including via POST /query
  graft.functions.GraftFunctions.register(spark)

  /** Miss counter behind [[adviseSketches]]: every sketchable query
    * shape that did NOT serve from a stored sketch is recorded here.
    */
  val sketchAdvisor = new graft.learn.SketchAdvisor()

  case class Options(
      maxRelError: Double = 0.05,
      preferExact: Boolean = false,
      useMl: Boolean = true,
      ciColumns: Boolean = true,
      measureExact: Boolean = false,
      // When set, inline sampling is SYSTEMATIC on this key (keyed-hash
      // lottery, reference ml_optimizer.py:236-240 parity) instead of
      // seeded Bernoulli — reproducible across runs and engines.
      systematicKey: Option[String] = None,
      // Opt-in AQP over joins (beyond the reference, which always runs
      // multi-table queries exact): sample the FACT side (largest table
      // by rowcount) and Horvitz-Thompson scale the aggregates — the
      // q68 semantics routed through the engine. Refused for distinct
      // aggregates (sampling cannot HT-correct a distinct count).
      approximateJoins: Boolean = false,
      // The AUTOMATIC costed variant: when stored AGMS sketches cover a
      // query's join-key pair and their cardinality estimate says
      // sampling meets the tolerance, multi-table aggregates flip from
      // the reference-parity exact default to sampled answers. Default
      // ON (the sketches are built deliberately), but an explicit
      // switch so operators can build AGMS sketches purely for
      // cardinality estimation without changing query semantics.
      autoCostedJoins: Boolean = true)

  case class AqeResult(
      df: DataFrame,
      planType: String,            // "exact" | "sample" | "sketch" | "stratified"
      strategy: String,
      reason: String,
      confidence: Double,
      estimatedSpeedup: Double,
      estimatedError: Double,
      sampleFraction: Option[Double],
      sampleTable: Option[String],
      transformations: Seq[String],
      executionTimeMs: Option[Long] = None,
      actualSpeedup: Option[Double] = None,
      // True ONLY when the answer came from the stored-answer family
      // (catalog blobs, zero scan). The HLL++ rewrite also reports
      // planType "sketch" but SCANS the table — the advisor must treat
      // that as a miss, so miss observation gates on this flag, never
      // on the planType label.
      servedFromCatalog: Boolean = false,
      // The planner's estimated cost for the chosen candidate (the
      // reference plan contract's estimated_cost, planner.py:198/253) —
      // set wherever the cost model ran; None on paths it does not
      // model (joins, preferExact).
      estimatedCost: Option[Double] = None,
      // Which no-scan serve family answered (ReadCatalogServe.kind);
      // None off the serve paths. Surfaces in explain-mode JSON so the
      // response names the serve the engine actually ran.
      serveKind: Option[String] = None)

  /** Parse + feature extraction cached per SQL text: a serving workload
    * repeats query shapes, and the unresolved plan is immutable (every
    * rewrite builds a new tree), so re-parsing per call is pure
    * overhead. Access-ordered LRU under a lock (the critical section is
    * a map probe; parsing runs outside it): a serving engine's hot
    * query shapes stay cached when the 1025th distinct shape arrives,
    * instead of a wholesale flush re-parsing the entire working set.
    */
  private[engine] val parseCacheCapacity = parseCacheCap
  private val parseCache = new java.util.LinkedHashMap[
      String, (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, QueryFeatures)](
      64, 0.75f, /*accessOrder=*/ true) {
    override def removeEldestEntry(e: java.util.Map.Entry[
        String, (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, QueryFeatures)])
        : Boolean = size() > parseCacheCapacity
  }
  private[engine] def parsedCached(sql: String)
      : Option[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, QueryFeatures)] =
    parseCache.synchronized(Option(parseCache.get(sql)))

  def query(sql: String, opts: Options = Options()): AqeResult = {
    val (parsed, features) = parsedCached(sql).getOrElse {
      val p = spark.sessionState.sqlParser.parsePlan(sql)
      val v = (p, QueryFeatures.extract(p, sql))
      parseCache.synchronized(parseCache.put(sql, v))
      v
    }

    def exact(reason: String, confidence: Double = 0.95): AqeResult =
      saltedExact(parsed, features) match {
        case Some(df) =>
          AqeResult(df, "exact", "exact",
            s"$reason; salted two-stage aggregate (catalog key-skew stats)",
            confidence, 1.0, 0.0, None, None,
            Seq("GROUP BY salted into a two-stage aggregate (hot-key spread)"))
        case None =>
          AqeResult(spark.sql(sql), "exact", "exact", reason, confidence,
            1.0, 0.0, None, None, Nil)
      }

    if (opts.preferExact)
      return finish(exact("exact execution (user preference)"), sql, features, opts)
    if (!features.isSingleTable || features.tableName.isEmpty) {
      // Set-operation cardinality from stored KMV sketches: INTERSECT /
      // UNION / EXCEPT distinct counts answer from two bottom-k hash
      // sketches with zero scan — the one multi-table shape the catalog
      // can absorb outright (everything else goes through join AQP).
      storedSetOpAnswer(parsed) match {
        case Some((df, err, op, hint)) if err <= opts.maxRelError =>
          return finish(serveResult(df, features, hint, "kmv_setop", err,
            s"$op cardinality answered from the stored KMV (bottom-k) sketch pair (no scan)",
            Seq(s"COUNT(*) over $op answered from the two sides' stored " +
              "KMV sketches (no scan; exact when the sketches are " +
              "exhaustive, else the k-th-hash estimator with the " +
              "matched-proportion bound)"), opts),
            sql, features, opts)
        case _ =>
      }
      // Star-aggregate serve: GROUP BY dim attributes over fact ⋈ dim
      // answered from the fact's grouped stats blob keyed on the join
      // key — the fact (the expensive side) is never scanned; only the
      // dim is read, restricted to the blob's bounded key set. Exact
      // (merge arithmetic + per-function exactness proof), so it
      // preempts join AQP. ORDER BY / LIMIT / HAVING peel off first
      // (the dashboard form — `GROUP BY nation ORDER BY rev DESC LIMIT
      // 5`) and replay driver-side over the served rows, which is
      // exact because the serve's row set is COMPLETE (every joined
      // group present); key sorts replay when the named column is a
      // string/integral column of either joined table.
      val (starPlan, starPost) = graft.plan.PostAggregate.peel(parsed,
        keySortable = c => features.tables.exists(t =>
          scala.util.Try(spark.table(t).schema.fields.exists { f =>
            import org.apache.spark.sql.types._
            f.name.equalsIgnoreCase(c) && (f.dataType match {
              case StringType | ByteType | ShortType | IntegerType |
                  LongType | DateType | TimestampType => true
              case _ => false
            })
          }).getOrElse(false)))
      storedStarAggAnswer(starPlan, features.tables) match {
        case Some((df, factT, detail, err)) if err <= opts.maxRelError =>
          val served = starPost.fold(df)(_.apply(df))
          return finish(serveResult(served, features, factT, "star_group", err,
            detail,
            Seq("GROUP BY dim attributes over fact ⋈ dim merged from the " +
              "fact's per-join-key stored records (stats exact; distinct " +
              "counts by register-max HLL union; fact never scanned, dim " +
              "read only for the blob's bounded key set)"), opts),
            sql, features, opts)
        case _ =>
      }
      // Star-RANGE serve: the same star shape with a fact-side value
      // band (`WHERE fact.v >= lo AND fact.v < hi`) — the drill-down
      // dashboard. Counts/sums/percentiles interpolate per GROUP BY
      // cell from the fact's fk-keyed histogram (+ sum rider) blobs;
      // the fact is never scanned. Approximate (boundary-mass bound),
      // so it serves only under the caller's error budget.
      storedStarRangeAnswer(starPlan, features.tables) match {
        case Some((df, factT, detail, err)) if err <= opts.maxRelError =>
          val served = starPost.fold(df)(_.apply(df))
          return finish(serveResult(served, features, factT, "star_range",
            err, detail,
            Seq("fact-side range band over fact ⋈ dim interpolated from " +
              "the fact's per-join-key histogram and sum-rider blobs " +
              "(bucket counts and decimal sums merged per dim cell; " +
              "fact never scanned, dim read only for the blob's " +
              "bounded key set)"), opts),
            sql, features, opts)
        case _ =>
      }
      // Join AQP is attempted when the user opted in (approximateJoins,
      // q77's path — unconditional error model on the fact size), OR
      // automatically when stored AGMS sketches cover the join-key pair
      // and their cardinality estimate says sampling meets the
      // tolerance (the costed decision; without sketches the default
      // stays reference-parity exact).
      // hasDistinct no longer refuses outright: sampledJoin serves
      // COUNT(DISTINCT join-key) through the universe key lottery and
      // self-refuses every other distinct shape (round 10).
      if (features.tables.sizeIs > 1 &&
          (features.hasApproximableAgg || features.hasDistinct) &&
          (opts.approximateJoins || opts.autoCostedJoins))
        sampledJoin(parsed, features, opts, auto = !opts.approximateJoins) match {
          case Some(r) => return finish(r, sql, features, opts)
          case None    =>
        }
      return finish(exact("multi-table query: approximation not applied (reference parity)"), sql, features, opts)
    }

    val table = features.tableName.get
    // Direct query on a sample table: run as-is; the user opted into the
    // sample (planner.py:45-60). Fraction recoverable from the name.
    SampleNaming.parse(table) match {
      case Some((_, f)) =>
        val r = exact("direct query on a sample table")
        return finish(r.copy(sampleFraction = Some(f)), sql, features, opts)
      case None =>
    }
    // ORDER BY / LIMIT / HAVING peel (round 10): the dashboard form of
    // a grouped aggregate wraps it in Sort/Limit/Having nodes that
    // don't change what the aggregate computes — only which of its
    // bounded, blob-resident rows are kept and in what order. The
    // serve paths below match the peeled INNER aggregate and the
    // clauses replay driver-side over the served rows (HAVING → ORDER
    // BY → LIMIT, SQL's order), so `GROUP BY g ORDER BY cnt DESC LIMIT
    // k` — the top-k heavy-hitters shape — serves with zero scan.
    // Group-key sort keys are replayed when the source column is
    // string-typed OR integral: the serves emit TYPED key columns
    // (string renderings verbatim; integral keys parsed back through
    // the bijective cast), so the DataFrame sort is the source type's
    // own order. Other key types refuse (the serves refuse them too).
    // Refused peels leave `parsed` untouched.
    val (servePlan, postOps) = graft.plan.PostAggregate.peel(parsed,
      keySortable = c => {
        import org.apache.spark.sql.types._
        spark.table(table).schema.fields.exists(f =>
          f.name.equalsIgnoreCase(c) && (f.dataType match {
            case StringType | ByteType | ShortType | IntegerType |
                LongType | DateType | TimestampType => true
            case _ => false
          }))
      })
    def posted(df: DataFrame): DataFrame = postOps.fold(df)(_.apply(df))
    // Statistics strategy: a bare MIN/MAX/COUNT/SUM/AVG query over
    // columns whose stored histograms recorded exact build statistics
    // answers from the catalog with NO scan and NO error — the
    // metadata-only-query optimization as an engine strategy. Exact, so
    // it preempts every approximate path; the freshness guard retires
    // stats once the base table changes size. A lone COUNT(*) does NOT
    // serve (it must ride a column-anchored stat): bare table counts
    // keep their sampling semantics.
    storedStatsAnswer(servePlan, table) match {
      case Some(df) =>
        return finish(serveResult(posted(df), features, table, "stats", 0.0,
          "aggregate answered from stored histogram build statistics (no scan, exact)",
          Seq("MIN/MAX/COUNT/SUM/AVG answered from stored histogram build " +
            "statistics (no scan; exact as of sketch build)"), opts),
          sql, features, opts)
      case None =>
    }
    // Filtered-group strategy: `SELECT <aggs> FROM t WHERE g = lit`
    // dispatches the equality predicate to the GROUP it names inside
    // the stored grouped sketches — partition pruning at the catalog
    // level. Statistics serve exactly; percentiles within one bucket
    // width of the named group's own grid. Zero scan either way.
    refusing(storedFilteredGroupAnswer(servePlan, table)) match {
      case Some((df, err)) if err <= opts.maxRelError =>
        return finish(serveResult(posted(df), features, table, "filtered_group", err,
          "filtered aggregate answered from grouped sketches (group-pruned, no scan)",
          Seq("WHERE col = value dispatched to that group's stored sketch " +
            "record (group-pruned: no scan; stats exact, percentiles to one " +
            "bucket width)"), opts),
          sql, features, opts)
      case _ =>
    }
    // Histogram strategy: a pure percentile/median query over a table
    // whose columns carry stored equi-width histograms answers from the
    // catalog with NO scan (accuracy = one bucket width) — a strategy
    // the reference's {exact, sample, sketch} set lacks entirely.
    // Honor the caller's error budget like the sample path does: the
    // histogram's bound is one bucket width (1/buckets of the grid), so
    // a tighter requested tolerance falls through to the scan path.
    storedHistogramAnswer(servePlan, table) match {
      case Some((df, err)) if err <= opts.maxRelError =>
        return finish(serveResult(posted(df), features, table, "histogram", err,
          "percentile answered from the stored histogram sketch (no scan)",
          Seq("PERCENTILE/MEDIAN answered from the stored equi-width " +
            "histogram (no scan; accurate to one bucket width)"), opts),
          sql, features, opts)
      case _ =>
    }
    // Log-linear ("HDR") variant: the same percentile shape from the
    // relative-error sketch when no equi-width histogram serves — the
    // heavy-tailed-column dashboard, err = 1/m RELATIVE.
    refusing(storedHdrAnswer(servePlan, table)) match {
      case Some((df, err)) if err <= opts.maxRelError =>
        return finish(serveResult(posted(df), features, table, "hdr", err,
          "percentile answered from the stored log-linear (HDR) sketch (no scan)",
          Seq("PERCENTILE/MEDIAN answered from the stored log-linear " +
            "sketch (no scan; within 1/m RELATIVE error of the true " +
            "order statistic — the heavy-tail-safe bound)"), opts),
          sql, features, opts)
      case _ =>
    }
    // Grouped variant: SELECT g, percentile(x, p) ... GROUP BY g over a
    // stored per-group histogram blob — each group answered on its own
    // [min, max] grid, still with no scan.
    refusing(storedGroupedHistogramAnswer(servePlan, table)) match {
      case Some((df, err)) if err <= opts.maxRelError =>
        return finish(serveResult(posted(df), features, table, "grouped_histogram", err,
          "per-group percentile answered from the stored grouped histogram (no scan)",
          Seq("PERCENTILE/MEDIAN answered per group from the stored grouped " +
            "histogram (no scan; accurate to one bucket width per group)"), opts),
          sql, features, opts)
      case _ =>
    }
    // Grouped log-linear variant: the same per-group percentile shape
    // from "hdr_grouped" when no grouped histogram serves. The log
    // grid is global, so marginal collapse (GROUP BY a over an "a,b"
    // blob) and residual filters merge EXACTLY — the shapes per-group
    // equi-width grids refuse.
    refusing(storedGroupedHdrAnswer(servePlan, table,
        pctCi = opts.ciColumns)) match {
      case Some((df, err)) if err <= opts.maxRelError =>
        return finish(serveResult(posted(df), features, table, "grouped_hdr", err,
          "per-group percentile answered from the stored grouped log-linear (HDR) sketch (no scan)",
          Seq("PERCENTILE/MEDIAN answered per group from the stored grouped " +
            "log-linear sketch (no scan; within 1/m RELATIVE error per " +
            "group — the heavy-tail-safe bound; groups merge exactly)") ++
            (if (opts.ciColumns)
              Seq("per-group rank-based CI companions from each group's " +
                "exact recorded mass (quantiles re-evaluated at " +
                "p ∓ 1.96·√(p(1−p)/n_g))")
            else Nil), opts),
          sql, features, opts)
      case _ =>
    }
    // Grouped statistics strategy: SELECT g, MIN/MAX/COUNT/SUM/AVG(x)
    // ... GROUP BY g over the per-group stats blob the grouped
    // histogram build records — exact, zero scan, the grouped twin of
    // the statistics strategy above (same lone-COUNT(*) refusal).
    refusing(storedGroupedStatsAnswer(servePlan, table)) match {
      case Some(df) =>
        return finish(serveResult(posted(df), features, table, "grouped_stats", 0.0,
          "per-group aggregate answered from stored grouped build statistics (no scan, exact)",
          Seq("per-group MIN/MAX/COUNT/SUM/AVG answered from stored grouped " +
            "build statistics (no scan; exact as of sketch build)"), opts),
          sql, features, opts)
      case None =>
    }
    // Distinct-count strategy: a bare COUNT(DISTINCT g...) over the
    // group columns of a fresh grouped blob is EXACT from the recorded
    // group list (complete by the MaxHllGroups build refusal) —
    // preempting the HLL estimate for exactly these columns.
    refusing(storedDistinctCountAnswer(servePlan, table)) match {
      case Some(df) =>
        return finish(serveResult(posted(df), features, table, "distinct_count", 0.0,
          "count(DISTINCT) answered exactly from a stored grouped sketch's group list (no scan)",
          Seq("COUNT(DISTINCT group columns) answered from the stored " +
            "grouped sketch's recorded group set (no scan; complete and " +
            "exact as of sketch build)"), opts),
          sql, features, opts)
      case None =>
    }
    // Distinct-keys strategy: SELECT DISTINCT g / SELECT g ... GROUP
    // BY g with no aggregates — the key list IS the recorded group
    // set of any fresh grouped blob (complete by the MaxHllGroups
    // build refusal), so the filter-dropdown query every dashboard
    // fires answers with zero scan and zero error.
    refusing(storedDistinctAnswer(servePlan, table)) match {
      case Some(df) =>
        return finish(serveResult(posted(df), features, table, "distinct_keys", 0.0,
          "distinct keys answered from a stored grouped sketch's group list (no scan, exact)",
          Seq("DISTINCT / keys-only GROUP BY answered from the stored " +
            "grouped sketch's recorded group set (no scan; complete and " +
            "exact as of sketch build)"), opts),
          sql, features, opts)
      case None =>
    }
    // Count-Min strategy: a bare COUNT(*) point-frequency query
    // (`WHERE col = 'v'`) over a column with a fresh stored CMS answers
    // from the catalog with NO scan — overestimate-only semantics
    // (estimate >= truth always; within eps*N additive with prob
    // 1-delta). eps is an additive bound relative to the TABLE size,
    // so it is served under the same budget comparison the histogram
    // path uses. Closes the reference's write-only-sketch gap for its
    // third sketch type (its get_sketch has zero callers, SURVEY §4.4).
    storedCmsAnswer(servePlan, table) match {
      case Some((df, eps)) if eps <= opts.maxRelError =>
        return finish(serveResult(posted(df), features, table, "cms", eps,
          "point-frequency answered from the stored Count-Min sketch (no scan)",
          Seq("COUNT(*) with a column=value filter answered from the stored " +
            "Count-Min sketch (no scan; overestimate-only, eps*N additive bound)"), opts),
          sql, features, opts)
      case _ =>
    }
    // Histogram-range strategy: COUNT(*) under a range predicate
    // (BETWEEN / one-sided bounds) answered by interpolating the
    // stored histogram's bucket counts — the classic optimizer-
    // statistics estimate surfaced as a serve, with the boundary
    // buckets' mass as the honest error bound.
    refusing(storedHistogramRangeAnswer(servePlan, table)) match {
      case Some((df, err)) if err <= opts.maxRelError =>
        return finish(serveResult(posted(df), features, table, "histogram_range", err,
          "range-predicate count answered from the stored histogram (no scan)",
          Seq("COUNT(*) with a range predicate interpolated from the stored " +
            "equi-width histogram (no scan; bounded by the boundary buckets' mass)"), opts),
          sql, features, opts)
      case _ =>
    }
    // Log-linear twin: the same range-count shape from the hdr sketch
    // when no equi-width histogram serves — clipped edge buckets carry
    // 1/m-relative mass on heavy-tailed columns instead of one huge
    // equi-width bucket's.
    refusing(storedHdrRangeAnswer(servePlan, table)) match {
      case Some((df, err)) if err <= opts.maxRelError =>
        return finish(serveResult(posted(df), features, table, "hdr_range", err,
          "range-predicate count answered from the stored log-linear (HDR) sketch (no scan)",
          Seq("COUNT(*) with a range predicate interpolated from the stored " +
            "log-linear sketch (no scan; bounded by the clipped edge " +
            "buckets' mass — 1/m-relative on any magnitude)"), opts),
          sql, features, opts)
      case _ =>
    }
    // Grouped twin: GROUP BY g under a range predicate — each recorded
    // group's estimate from its own histogram in the grouped blob.
    refusing(storedGroupedRangeAnswer(servePlan, table)) match {
      case Some((df, err)) if err <= opts.maxRelError =>
        return finish(serveResult(posted(df), features, table, "grouped_histogram_range", err,
          "per-group range-predicate count answered from the stored grouped histogram (no scan)",
          Seq("GROUP BY under a range predicate interpolated per group from " +
            "the stored grouped histogram (no scan; worst group's boundary mass)"), opts),
          sql, features, opts)
      case _ =>
    }
    // Log-linear grouped twin: the same per-group range shape from
    // "hdr_grouped" when no grouped equi-width histogram serves —
    // counts AND range percentiles at 1/m relative error; residuals
    // and marginals merge exactly on the global log grid.
    refusing(storedGroupedHdrRangeAnswer(servePlan, table)) match {
      case Some((df, err)) if err <= opts.maxRelError =>
        return finish(serveResult(posted(df), features, table, "grouped_hdr_range", err,
          "per-group range-predicate count answered from the stored grouped log-linear (HDR) sketch (no scan)",
          Seq("GROUP BY under a range predicate interpolated per group from " +
            "the stored grouped log-linear sketch (no scan; 1/m-relative " +
            "clipped-edge bound per group; groups merge exactly)"), opts),
          sql, features, opts)
      case _ =>
    }
    // Filtered-range twin: a group-equality (or IN) filter AND a range
    // on the value column — the named group(s)' histograms (+ sum
    // riders) answer the band's count/sum/avg/percentile with no scan.
    refusing(storedFilteredRangeAnswer(servePlan, table)) match {
      case Some((df, err)) if err <= opts.maxRelError =>
        return finish(serveResult(posted(df), features, table, "filtered_range", err,
          "group-filtered range aggregate answered from the named groups' stored histograms (no scan)",
          Seq("equality/IN group filter + range predicate interpolated from " +
            "the named groups' grouped histograms and sum riders (no scan; " +
            "merged boundary-mass bound)"), opts),
          sql, features, opts)
      case _ =>
    }
    // Heavy-hitters strategy: `SELECT keys, count(*) GROUP BY keys
    // ORDER BY count DESC LIMIT k` / `HAVING count >= x` over a
    // HIGH-cardinality key answers EXACTLY from the stored "topk"
    // blob (complete above its build threshold) — zero scan, zero
    // error; the iceberg/top-k dashboard shape the MaxHllGroups-
    // bounded grouped blobs refuse. Matches the RAW parsed plan (the
    // clauses themselves decide servability), so it runs after the
    // peel-based serves and never disturbs their plans.
    refusing(storedTopKAnswer(parsed, table)) match {
      case Some((df, detail)) =>
        return finish(serveResult(df, features, table, "topk", 0.0, detail,
          Seq("top-k / iceberg GROUP BY answered from the stored " +
            "heavy-hitters summary (no scan; exact above the stored " +
            "threshold)"), opts),
          sql, features, opts)
      case None =>
    }
    if (!features.hasApproximableAgg && !features.hasDistinct)
      return finish(exact("no approximable aggregate (COUNT/SUM/AVG): exact execution"), sql, features, opts)

    val tableSize = catalog.statsFor(table).map(_.rowCount).getOrElse {
      val n = spark.table(table).count() // live COUNT(*) like ml_optimizer.py:88-93
      catalog.upsertTableStats(table, n)
      n
    }

    val choice =
      if (opts.useMl)
        StrategyChooser.choose(features, tableSize, opts.maxRelError,
          history.forPattern(QueryHistory.pattern(features)))
      else plannerOnlyChoice(features, tableSize, opts.maxRelError,
        sumAvgArgColumns(parsed))

    val result = choice.strategy match {
      case StrategyChooser.Exact =>
        exact(choice.reasoning, choice.confidence)
          .copy(estimatedCost =
            Some(Planner.estimateExactCost(features, tableSize)))

      case StrategyChooser.Sketch if features.hasDistinct =>
        // Fast path: a pre-built catalog sketch answers the whole query
        // with NO scan at all (the capability the reference declares but
        // never wires — its get_sketch has zero callers, SURVEY §4.4).
        // The b=12 HLL standard error is the serve's bound; a budget
        // TIGHTER than it falls through to the HLL++ scan rewrite,
        // whose rsd adapts to the budget — the serve must be a valid
        // planner candidate, never an override of the error contract.
        val hllErr = 1.04 / math.sqrt(4096.0)
        val stored: Option[AqeResult] =
          if (hllErr > opts.maxRelError) None
          else refusing(storedSketchAnswer(servePlan, table)).map { df =>
            serveResult(posted(df), features, table, "hll", hllErr,
              "COUNT(DISTINCT) answered from the stored HyperLogLog sketch (no scan)",
              Seq("COUNT(DISTINCT) answered from the stored HyperLogLog sketch (no scan)"),
              opts)
          }.orElse(refusing(storedGroupedSketchAnswer(servePlan, table)).map { df =>
            serveResult(posted(df), features, table, "grouped_hll", hllErr,
              "per-group COUNT(DISTINCT) answered from the stored grouped HyperLogLog sketch (no scan)",
              Seq("per-group COUNT(DISTINCT) answered from the stored grouped HyperLogLog sketch (no scan)"),
              opts)
          })
        stored.getOrElse {
            val d = SampleRewrite.Directive(table, Planner.ReadExact,
              weight = None, rewriteDistinctToHll = true,
              hllRsd = Some(math.max(0.005, math.min(opts.maxRelError, 0.1))),
              addCiColumns = false)
            val df = SampleRewrite.rewrite(spark, parsed, d)
            val (spd, err) = StrategyChooser.predict(StrategyChooser.Sketch, tableSize, None)
            AqeResult(df, "sketch", "sketch", choice.reasoning, choice.confidence,
              spd, err, None, None,
              Seq("COUNT(DISTINCT) answered by HyperLogLog++ (approx_count_distinct)"),
              // the rewrite scans the table once: the exact candidate's cost
              estimatedCost =
                Some(Planner.estimateExactCost(features, tableSize)))
        }

      case strat @ (StrategyChooser.Sample | StrategyChooser.Sketch |
                    StrategyChooser.Stratified) =>
        // Outlier-indexed sample first (the targeted index): when a
        // fresh __outlier__ sample exists whose value column is the
        // argument of a SUM/AVG in this query, serve from it — the
        // heavy tail reads exactly at weight 1, the rest HT-scales, so
        // the skewed-sum variance the generic sample suffers is gone.
        // Distinct shapes never reach here with it (guarded);
        // percentiles ride the integer-weight frequency rewrite (both
        // weights are integral by construction: 1 and a power of two).
        // MAX serves EXACTLY — the weight-1 part holds the global
        // top-K rows by the measure, so max over the sample IS the
        // true max — but only for an unfiltered, ungrouped query whose
        // every max() argument is the bare measure: a filter can
        // eliminate the entire exact tail (the surviving rest rows are
        // a lottery subsample), a group can hold no tail row, and a
        // derived expression need not attain its maximum on the value
        // tail. MIN serves exactly under the SAME guard when the
        // sample was built TWO-SIDED (`createOutlierSample(lowK > 0)`
        // records an "outlier_low" weight-1 stratum holding the global
        // bottom-k rows); a high-tail-only sample still refuses MIN —
        // its low tail is lottery-sampled and can miss the true min.
        val outlierCandidate = {
          val maxLookup =
            if (features.aggFunctions.contains("max"))
              aggArgColumns(parsed, Seq("max"))
            else Set.empty[String]
          val minLookup =
            if (features.aggFunctions.contains("min"))
              aggArgColumns(parsed, Seq("min"))
            else Set.empty[String]
          if (features.hasDistinct) None
          else (sumAvgArgColumns(parsed) ++ maxLookup ++ minLookup)
            .toSeq.sorted.iterator
            .flatMap(c => catalog.outlierSampleFor(table, c).iterator)
            .nextOption()
            .filter { s =>
              val m = s.strataColumn
                .map(_.stripPrefix("__outlier__")).getOrElse("")
              val hasLowTail = catalog.strataFor(s.sampleTable)
                .exists(_.strataValue == "outlier_low")
              !features.hasMinMax || (
                !features.hasGroupBy &&
                parsed.collectFirst {
                  case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
                }.isEmpty &&
                (!features.aggFunctions.contains("min") ||
                  (hasLowTail && aggArgsAreBare(parsed, m, Seq("min")))) &&
                (!features.aggFunctions.contains("max") ||
                  aggArgsAreBare(parsed, m, Seq("max"))))
            }
        }
        val groupCol = features.groupByColumns.headOption
          .map(c => c.split("\\.").last.stripSuffix("`").stripPrefix("`"))
        // Representation guard: the outlier sample has no per-group
        // guarantee — a rare group whose rows all lose the rest lottery
        // vanishes from a grouped result entirely, which a stratified
        // sample keyed on the group-by column was built to prevent. So
        // when BOTH exist for a grouped query, the stratified sample
        // preempts the outlier sample (regardless of the chooser's
        // strategy label); ungrouped queries keep the outlier route.
        val stratSample = {
          // representation guard (outlier AND plain-bottom-k routes): a
          // grouped query with a dedicated stratified sample on its
          // group column must take it — neither the value-indexed
          // outlier sample nor the 2048-global-hash-winners bottom-k
          // guarantees a rare group any rows at all
          val wanted = choice.strategy == StrategyChooser.Stratified ||
            (features.hasGroupBy && (outlierCandidate.isDefined ||
              catalog.bottomKSampleFor(table).isDefined))
          if (wanted) groupCol.flatMap(c => catalog.stratifiedSampleFor(table, c))
          else None
        }
        val outlierSample =
          if (features.hasGroupBy && stratSample.isDefined) None
          else outlierCandidate
        outlierSample match {
          case Some(s) =>
            // decimal-routed weighted sums ONLY when every SUM/AVG
            // argument IS the bare indexed-measure attribute (a known
            // ≤4-decimal-place column): an expression argument — even
            // one referencing only the measure, like sum(v*v) — can
            // carry more decimal places (systematic rounding bias) or
            // exceed DECIMAL(18,4)'s range (NULL under non-ANSI casts,
            // silently dropping rows), so it must stay on the double
            // product path
            val measure = s.strataColumn
              .map(_.stripPrefix("__outlier__")).getOrElse("")
            val decimalSafe = sumAvgArgsAreBare(parsed, measure)
            val d = SampleRewrite.Directive(table,
              Planner.ReadSampleTable(s.sampleTable, s.fraction),
              weight = Some(SampleRewrite.WeightColumn("graft_weight")),
              rewriteDistinctToHll = false, hllRsd = None,
              addCiColumns = opts.ciColumns,
              weightedPercentiles = true,
              decimalSums = decimalSafe,
              pctCi = pctCiFor(s.sampleTable, intWeights = true,
                opts, features,
                unfiltered = parsed.collectFirst {
                  case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
                }.isEmpty))
            val df = SampleRewrite.rewrite(spark, parsed, d)
            val (spd, err) = StrategyChooser.predict(
              StrategyChooser.Sample, tableSize, Some(s.fraction))
            AqeResult(df, "outlier",
              (strat: StrategyChooser.Strategy).name, choice.reasoning,
              choice.confidence, spd, err, Some(s.fraction),
              Some(s.sampleTable),
              Seq(s"outlier-indexed sample ${s.sampleTable}: heavy tail exact at weight 1, rest Horvitz-Thompson weighted") ++
                (if (features.aggFunctions.contains("max"))
                  Seq("MAX answered exactly from the weight-1 tail (holds the global top-k rows by the measure)")
                else Nil) ++
                (if (features.aggFunctions.contains("min"))
                  Seq("MIN answered exactly from the weight-1 low tail (holds the global bottom-k rows by the measure)")
                else Nil),
              estimatedCost = Some(tableSize * s.fraction *
                Planner.ScanCostPerRow + Planner.SampleSetupCost))
          case None =>
        stratSample match {
          case Some(s) =>
            // frequency-weighted percentiles engage only when every
            // stratum's HT weight — the graft_weight column carries
            // 1/fraction_h, computed here with the SAME division — is a
            // whole number (the deterministic lottery's powers of two
            // qualify; Neyman/odd-fraction weights would truncate in
            // the frequency cast, so their percentiles stay unweighted
            // sample quantiles). StratumInfo.weight itself is NOT the
            // column (proportional allocation records popSize there).
            val intWeights = {
              val fs = catalog.strataFor(s.sampleTable).map(_.fraction)
              fs.nonEmpty && fs.forall(f => f > 0.0 && {
                val w = 1.0 / f
                w >= 1.0 && w == math.rint(w)
              })
            }
            val d = SampleRewrite.Directive(table,
              Planner.ReadSampleTable(s.sampleTable, s.fraction),
              weight = Some(SampleRewrite.WeightColumn("graft_weight")),
              rewriteDistinctToHll = false, hllRsd = None,
              addCiColumns = opts.ciColumns,
              weightedPercentiles = intWeights,
              pctCi = pctCiFor(s.sampleTable, intWeights, opts, features,
                unfiltered = parsed.collectFirst {
                  case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
                }.isEmpty))
            val df = SampleRewrite.rewrite(spark, parsed, d)
            val (spd, err) = StrategyChooser.predict(StrategyChooser.Stratified, tableSize, Some(s.fraction))
            AqeResult(df, "stratified", "stratified", choice.reasoning,
              choice.confidence, spd, err, Some(s.fraction), Some(s.sampleTable),
              Seq(s"stratified sample ${s.sampleTable} with per-stratum HT weights"),
              estimatedCost = Some(tableSize * s.fraction *
                Planner.ScanCostPerRow + Planner.SampleSetupCost))
          case None =>
            // Sample path (also the fallback for sketch/stratified when no
            // better input exists): prefer a materialized sample table if
            // the cost model accepts one, else inline Bernoulli sampling.
            // The inline fraction is the reference's size tier, grown when
            // needed so the sqrt(1/(f*N)) error model meets the requested
            // tolerance (the reference only ever shrinks it and then bails
            // to exact; self-consistent growth keeps sampling applicable).
            val tierF = StrategyChooser.sampleFraction(
              StrategyChooser.Sample, tableSize, opts.maxRelError).get
            val fNeeded = 1.0 /
              (opts.maxRelError * opts.maxRelError * math.max(1L, tableSize))
            val frac = math.min(0.5, math.max(tierF, fNeeded))
            val plan = Planner.plan(features, catalog, tableSize,
              opts.maxRelError, preferExact = false)
            // Bottom-k (fixed-size order-statistic) sample: when no
            // materialized uniform sample serves but a fresh bottom-k
            // sample exists, serve from it instead of re-scanning the
            // table for an inline lottery — the whole point of a
            // pre-paid sample. Fixed-size error is √(1/k) regardless of
            // N. Distinct shapes can't scale from a row sample and a
            // fixed-size sample can miss extremes, so min/max/distinct
            // fall through. Estimates scale ONCE post-aggregation by
            // the constant N/k (Directive.postScale) — count w·n,
            // sum w·Σx, avg Σx/n — with decimal inner sums when every
            // SUM/AVG argument is a bare measure column.
            // GROUPED bottom-k first (the more specific index): a
            // fixed-size per-group sample serves grouped aggregates
            // with guaranteed group representation (rare groups can
            // lose the plain bottom-k's global hash race) — sound only
            // when the query's GROUP BY contains the sample's group
            // column, so every output group has ONE weight. Estimates
            // scale once per group by the graft_gw column (max() of a
            // per-group constant). Error bound: √(1/k_g) over the
            // groups that are actually subsampled; fully-contained
            // groups are exact.
            def norm(c: String): String =
              c.split("\\.").last.stripSuffix("`").stripPrefix("`")
                .toLowerCase
            val bottomKG = {
              if (features.hasDistinct || features.hasMinMax ||
                  !features.hasGroupBy) None
              else catalog.bottomKGroupedSampleFor(table)
                .filter { s =>
                  catalog.bottomKGroupColumn(s).exists(g =>
                    features.groupByColumns.map(norm).contains(g))
                }
                .filter { s =>
                  plan.decision match {
                    case Planner.ReadSampleTable(n, _) => n == s.sampleTable
                    case _                             => true
                  }
                }
                .filter { s =>
                  val errs = catalog.strataFor(s.sampleTable)
                    .filter(st => st.sampleSize < st.popSize)
                    .map(st => math.sqrt(1.0 / math.max(1L, st.sampleSize)))
                  errs.isEmpty ||
                    errs.max <= opts.maxRelError * (1 + 1e-9)
                }
            }
            val bottomK = {
              if (features.hasDistinct || features.hasMinMax ||
                  bottomKG.isDefined) None
              else catalog.bottomKSampleFor(table)
                // when the cost model picked a DIFFERENT materialized
                // sample, that one wins; when it picked THIS one (or no
                // sample table at all), dispatch here so the fixed-size
                // post-scale arithmetic applies instead of per-row HT
                .filter { s =>
                  plan.decision match {
                    case Planner.ReadSampleTable(n, _) => n == s.sampleTable
                    case _                             => true
                  }
                }
                .filter { s =>
                  catalog.strataFor(s.sampleTable).headOption.exists(st =>
                    st.sampleSize > 0 &&
                      math.sqrt(1.0 / st.sampleSize) <=
                        opts.maxRelError * (1 + 1e-9))
                }
                // representation gate for GROUPED shapes: the plain
                // bottom-k guarantees only the GLOBAL √(1/k) bound —
                // a rare group can be thin (noise estimates) or lose
                // the hash race entirely (vanish from the result).
                // Require every group PRESENT in the sample to hold
                // >= BkGroupMinRows rows on the query's group-by
                // columns, and when an HLL for a single group column
                // exists, the sample's group count to cover its
                // estimate (a vanished group is undetectable from the
                // sample alone). Memoized per materialization.
                .filter { s =>
                  !features.hasGroupBy ||
                    bkGroupedServeOk(s, features.groupByColumns.map(norm))
                }
            }
            // decimal routing for bottom-k serves is gated on the
            // rider's BUILD/FOLD-TIME proof: only columns whose every
            // sample value round-trips DECIMAL(18,4) exactly may take
            // the decimal sum path (a bare high-precision or
            // large-magnitude column would be silently rounded or
            // nulled — the outlier route's measure-scope hazard, but
            // bottom-k has no single indexed measure, so the proof is
            // per-column and recomputed on every streaming fold)
            def bkDecimalGate(riderCol: String, riderType: String): Boolean = {
              // the marker carries the column LOWERCASED but the rider
              // is keyed under the builder's original-case column —
              // match case-insensitively or a mixed-case column would
              // silently lose decimal routing (and drift from any
              // oracle authored against the decimal path)
              val safe = catalog.listSketches(Some(table))
                .find(sk => sk.sketchType == riderType &&
                  sk.columnName.equalsIgnoreCase(riderCol))
                .flatMap(r => """"decsafe"\s*:\s*"([^"]*)"""".r
                  .findFirstMatchIn(r.parameters))
                .map(_.group(1).split(",").filter(_.nonEmpty).toSet)
                .getOrElse(Set.empty[String])
              allSumAvgArgsBare(parsed) &&
                sumAvgArgColumns(parsed, includePercentiles = false)
                  .forall(safe.contains)
            }
            bottomKG match {
              case Some(s) =>
                ensureSampleView(s)
                // per-group percentile CIs: the build caps every
                // subsampled group at EXACTLY kPerGroup rows, so the
                // per-group effective n is known at plan time (the
                // q179 argument, per group) — kCap from the rider the
                // builder/maintainer stamps, falling back to the
                // largest achieved stratum. Unfiltered shapes only.
                val kCap = catalog.listSketches(Some(table))
                  .find(sk => sk.sketchType == "bottomkg_rider" &&
                    catalog.bottomKGroupColumn(s)
                      .exists(sk.columnName.equalsIgnoreCase))
                  .flatMap(r => """"k"\s*:\s*(\d+)""".r
                    .findFirstMatchIn(r.parameters))
                  .map(_.group(1).toDouble)
                  .getOrElse(catalog.strataFor(s.sampleTable)
                    .map(_.sampleSize).foldLeft(0L)(math.max).toDouble)
                val d = SampleRewrite.Directive(table,
                  Planner.ReadSampleTable(s.sampleTable, s.fraction),
                  weight = None,
                  rewriteDistinctToHll = false, hllRsd = None,
                  addCiColumns = false,
                  decimalSums = bkDecimalGate(
                    catalog.bottomKGroupColumn(s).getOrElse(""),
                    "bottomkg_rider"),
                  postScaleColumn = Some("graft_gw"),
                  pctCiGrouped = if (opts.ciColumns && kCap > 0 &&
                      parsed.collectFirst {
                        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
                      }.isEmpty)
                    Some((1.96, kCap))
                  else None)
                val df = SampleRewrite.rewrite(spark, parsed, d)
                val (spd, err) = StrategyChooser.predict(
                  StrategyChooser.Stratified, tableSize, Some(s.fraction))
                AqeResult(df, "bottomk_grouped",
                  (strat: StrategyChooser.Strategy).name, choice.reasoning,
                  choice.confidence, spd, err, Some(s.fraction),
                  Some(s.sampleTable),
                  Seq(s"grouped bottom-k sample ${s.sampleTable}: " +
                    "fixed-size per-group sample, every group " +
                    "represented, estimates scale per group by N_g/k_g"),
                  estimatedCost = Some(tableSize * s.fraction *
                    Planner.ScanCostPerRow + Planner.SampleSetupCost))
              case None =>
            bottomK match {
              case Some(s) =>
                ensureSampleView(s)
                val st = catalog.strataFor(s.sampleTable).head
                val w = st.popSize.toDouble / st.sampleSize.toDouble
                val d = SampleRewrite.Directive(table,
                  Planner.ReadSampleTable(s.sampleTable, s.fraction),
                  weight = None,
                  rewriteDistinctToHll = false, hllRsd = None,
                  addCiColumns = false,
                  decimalSums = bkDecimalGate(
                    s.strataColumn.map(_.stripPrefix("__bottomk__"))
                      .getOrElse(""),
                    "bottomk_rider"),
                  postScale = Some(w),
                  // rank-based percentile CIs on the UNWEIGHTED sample
                  // quantile: nEff = k exactly (the fixed-size sample
                  // is the one whose effective n IS known at plan
                  // time); filtered/grouped shapes refuse, q168's
                  // contract
                  pctCi = if (opts.ciColumns && !features.hasGroupBy &&
                      parsed.collectFirst {
                        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
                      }.isEmpty)
                    Some((1.96, st.sampleSize.toDouble))
                  else None)
                val df = SampleRewrite.rewrite(spark, parsed, d)
                val (spd, err) = StrategyChooser.predict(
                  StrategyChooser.Sample, tableSize, Some(s.fraction))
                AqeResult(df, "bottomk",
                  (strat: StrategyChooser.Strategy).name, choice.reasoning,
                  choice.confidence, spd, err, Some(s.fraction),
                  Some(s.sampleTable),
                  Seq(s"bottom-k sample ${s.sampleTable}: fixed-size " +
                    s"order-statistic sample (k=${st.sampleSize}), " +
                    s"estimates scale once by N/k"),
                  estimatedCost = Some(tableSize * s.fraction *
                    Planner.ScanCostPerRow + Planner.SampleSetupCost))
              case None =>
            val decision = plan.decision match {
              // a bottom-k decision that reached here was REFUSED by
              // the typed dispatches above: its weights need the
              // post-scale rewrite, never ConstWeight(1/f) — degrade
              // to inline rather than mis-weight
              case s: Planner.ReadSampleTable
                  if catalog.samplesFor(table).exists(x =>
                    x.sampleTable == s.sampleTable &&
                      x.strataColumn.exists(_.startsWith("__bottomk"))) =>
                opts.systematicKey
                  .map(k => Planner.ReadInlineSystematic(frac, k))
                  .getOrElse(Planner.ReadInlineSample(frac, seed))
              case s: Planner.ReadSampleTable => s
              case _ => opts.systematicKey
                .map(k => Planner.ReadInlineSystematic(frac, k))
                .getOrElse(Planner.ReadInlineSample(frac, seed))
            }
            val f = decision.fraction.get
            val estErr = math.sqrt(1.0 / math.max(1.0, f * tableSize))
            if (estErr > opts.maxRelError * (1 + 1e-9))
              exact(f"estimated sampling error $estErr%.3f exceeds tolerance ${opts.maxRelError}%.3f: exact execution")
            else {
              val d = SampleRewrite.Directive(table, decision,
                weight = Some(SampleRewrite.ConstWeight(f)),
                rewriteDistinctToHll = false, hllRsd = None,
                addCiColumns = opts.ciColumns)
              val df = SampleRewrite.rewrite(spark, parsed, d)
              val (spd, err) = StrategyChooser.predict(StrategyChooser.Sample, tableSize, Some(f))
              val (tbl, desc) = decision match {
                case Planner.ReadSampleTable(n, _) => (Some(n), s"pre-created sample table $n")
                case Planner.ReadInlineSystematic(_, k) =>
                  (None, f"inline systematic (keyed-hash on $k) sample fraction=$f%.4f")
                case _ => (None, f"inline Bernoulli sample fraction=$f%.4f seed=$seed")
              }
              AqeResult(df, "sample",
                (strat: StrategyChooser.Strategy).name, choice.reasoning,
                choice.confidence, spd, err, Some(f), tbl,
                Seq(desc, "aggregates rewritten to Horvitz-Thompson weighted form"),
                // the reference's sample-strategy cost (planner.py:244)
                estimatedCost = Some(tableSize * f *
                  Planner.ScanCostPerRow + Planner.SampleSetupCost))
            }
            }
            }
        }
        }
    }
    finish(result, sql, features, opts)
  }

  /** q65's skew detector, persisted into the catalog — one hash-
    * aggregate to per-key counts, one scalar summary row driver-side.
    * Subsequent exact GROUP BYs on `column` re-plan as the salted
    * two-stage aggregate when the hottest key holds ≥
    * SaltRewrite.SkewPpmThreshold ppm of the rows (the q35 mitigation,
    * chosen automatically). This is the detect → persist → re-plan
    * loop a serving engine runs once per table profile refresh.
    */
  def profileKeySkew(table: String, column: String): catalog.KeySkew = {
    import org.apache.spark.sql.functions.{col, count, expr, lit, max, sum}
    // `column` may be a plain column OR a grouping expression
    // ("date_trunc('DAY', ts)"); the catalog key is the
    // parser-normalized SQL so saltedExact can match it textually
    // against the parsed query's grouping expression.
    val key = normalizeKey(column)
    val row = spark.table(table)
      .groupBy(expr(column)).agg(count(lit(1)).as("c"))
      .agg(sum(col("c")), count(lit(1)), max(col("c")))
      .collect()(0)
    catalog.upsertKeySkew(table, key, row.getLong(0), row.getLong(1),
      row.getLong(2))
    catalog.keySkewFor(table, key).get
  }

  /** (z, nEff) for percentile CI companions from a sample's achieved
    * stratum sizes — nEff = (Σ n_h·w_h)² / Σ n_h·w_h² with w_h = 1/f_h.
    * Every product is integral for the power-of-two lotteries, so the
    * sums are exact doubles regardless of stratum order and an oracle
    * re-derives them from the sample itself. Ungrouped AND unfiltered
    * queries only: a group's — or a WHERE-surviving subset's —
    * effective n is unknowable at plan time, and a whole-sample nEff
    * over a filtered quantile would claim intervals far narrower than
    * the nominal coverage. Those shapes keep their point estimates.
    */
  private def pctCiFor(sampleTable: String, intWeights: Boolean,
      opts: Options, features: QueryFeatures,
      unfiltered: Boolean): Option[(Double, Double)] =
    if (!intWeights || !opts.ciColumns || features.hasGroupBy ||
        !unfiltered) None
    else {
      val strata = catalog.strataFor(sampleTable)
      val ws = strata.filter(a => a.fraction > 0 && a.sampleSize > 0)
        .map(a => (a.sampleSize.toDouble, 1.0 / a.fraction))
      val n1 = ws.map { case (n, w) => n * w }.sum
      val n2 = ws.map { case (n, w) => n * (w * w) }.sum
      if (n1 > 0 && n2 > 0) Some((1.96, n1 * n1 / n2)) else None
    }

  /** Heavy-tail evidence threshold for the outlier-sample advisor: the
    * top-k rows holding ≥ 5% of a measure's total absolute mass is the
    * regime where uniform sampling's SUM variance is dominated by
    * whether those rows land in the sample.
    */
  val OutlierSkewPpmThreshold: Long = 50000L

  /** Measure-skew detector (round 11), the q65 loop's twin for VALUE
    * distributions: the share of `column`'s total absolute mass held by
    * its top-k rows, persisted into the catalog. The advisor then
    * recommends `Samplers.createOutlierSample` for filtered SUM/AVG
    * misses over flagged measures (detect → advise → build → serve).
    * One TakeOrdered top-k pass + one aggregate — metadata-scale
    * driver traffic only.
    */
  def profileMeasureSkew(table: String, column: String,
      k: Int = 500): catalog.MeasureSkew = {
    import org.apache.spark.sql.functions.{abs, col, count, lit, sum}
    val v = spark.table(table)
      .select(abs(col(column)).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val top = v.orderBy(col("v").desc).limit(k)
      .agg(sum(col("v"))).collect()(0)
    val totRow = v.agg(sum(col("v")), count(lit(1))).collect()(0)
    val topSum = if (top.isNullAt(0)) 0.0 else top.getDouble(0)
    val totSum = if (totRow.isNullAt(0)) 0.0 else totRow.getDouble(0)
    val ppm = if (totSum > 0) math.round(topSum / totSum * 1e6) else 0L
    catalog.upsertMeasureSkew(table, column, totRow.getLong(1), k, ppm)
    catalog.measureSkewFor(table, column).get
  }

  private def normalizeKey(column: String): String =
    try spark.sessionState.sqlParser.parseExpression(column).sql
    catch { case scala.util.control.NonFatal(_) => column }

  /** Column names referenced inside non-distinct SUM/AVG/percentile
    * arguments of the parsed plan — the outlier-sample dispatch key
    * (the aggregates whose estimate the indexed measure improves).
    * Ungrouped aggregates still parse as Project (GlobalAggregates runs
    * in the analyzer), so both node shapes contribute.
    */
  private def sumAvgArgColumns(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      includePercentiles: Boolean = true): Set[String] =
    aggArgColumns(plan,
      if (includePercentiles) Seq("sum", "avg", "mean", "percentile", "median")
      else Seq("sum", "avg", "mean"))

  /** Columns referenced inside the first argument of any non-distinct
    * call to one of `fns` in the plan's select lists.
    */
  private def aggArgColumns(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      fns: Seq[String]): Set[String] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project}
    val lists = plan.collect {
      case a: Aggregate => a.aggregateExpressions
      case p: Project   => p.projectList
    }.flatten
    lists.flatMap(_.collect {
      case f: UnresolvedFunction
          if fns.contains(f.nameParts.last.toLowerCase) && !f.isDistinct =>
        f.arguments.headOption.toSeq.flatMap(_.collect {
          case a: UnresolvedAttribute => a.nameParts.last.toLowerCase
        })
    }).flatten.toSet
  }

  /** True iff every non-distinct SUM/AVG/MEAN argument in the plan is
    * the bare attribute `measure` itself — not an expression over it.
    * Gates the DECIMAL(18,4) routing of weighted sums: only the indexed
    * measure column is KNOWN to fit that scale/precision; a derived
    * argument (sum(v*v), sum(v/3)) referencing the same column can
    * round (bias) or overflow (dropped rows) under the decimal cast.
    * Vacuously true when the plan has no SUM/AVG (nothing gets routed).
    */
  private def sumAvgArgsAreBare(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      measure: String): Boolean =
    aggArgsAreBare(plan, measure, Seq("sum", "avg", "mean"))

  /** True iff every non-distinct call to one of `fns` has exactly the
    * bare attribute `measure` as its argument list. Vacuously true when
    * no such call exists.
    */
  private def aggArgsAreBare(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      measure: String, fns: Seq[String]): Boolean = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project}
    val m = measure.toLowerCase
    val lists = plan.collect {
      case a: Aggregate => a.aggregateExpressions
      case p: Project   => p.projectList
    }.flatten
    lists.flatMap(_.collect {
      case f: UnresolvedFunction
          if fns.contains(f.nameParts.last.toLowerCase) && !f.isDistinct =>
        f.arguments match {
          case Seq(a: UnresolvedAttribute) => a.nameParts.last.toLowerCase == m
          case _                           => false
        }
    }).forall(identity)
  }

  /** Registered-sample-view memo: (sampleTable -> createdAt) of the
    * last registration THIS engine performed in its session.
    */
  private val registeredSampleViews =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Make `s.sampleTable` resolvable in this session, reading the
    * CURRENT materialization. A bottom-k sample may have been
    * (re)materialized by a streaming maintainer whose foreachBatch ran
    * on a CLONED session (its temp view is invisible here) or
    * re-folded since this session last registered it — the catalog's
    * `createdAt` changes on every fold, so registering once per
    * (table, createdAt) is both fresh and cheap (no per-query file
    * listing: a steady-state serve pays zero registration cost).
    */
  private def ensureSampleView(s: catalog.SampleInfo): Unit =
    if (!registeredSampleViews.get(s.sampleTable).contains(s.createdAt) ||
        !spark.catalog.tableExists(s.sampleTable)) {
      spark.read.parquet(s.path).createOrReplaceTempView(s.sampleTable)
      registeredSampleViews.put(s.sampleTable, s.createdAt)
    }

  /** A grouped query served from the PLAIN bottom-k sample drops any
    * group whose every row lost the global hash race — per-group error
    * is NOT the advertised √(1/k). Floor: every present group keeps at
    * least this many sample rows (the classical CLT floor; a
    * high-cardinality grouping over a k-row sample yields 1–2 rows per
    * group and refuses here).
    */
  private val BkGroupMinRows = 30L

  /** (sampleTable, createdAt, groupCols) -> (min rows per present
    * group, distinct group count) over the materialized sample — the
    * plain-bottom-k grouped-serve representation stats. Keyed on the
    * materialization stamp so a streaming re-fold invalidates, and a
    * steady-state serve pays zero Spark jobs at plan time.
    */
  private val bkGroupStats = scala.collection.concurrent.TrieMap
    .empty[(String, Long, Seq[String]), (Long, Long)]

  private def bkGroupedServeOk(s: catalog.SampleInfo,
      groupCols: Seq[String]): Boolean = {
    import org.apache.spark.sql.functions.{col, count, lit, min}
    ensureSampleView(s)
    val sdf = spark.table(s.sampleTable)
    val byLower = sdf.schema.fieldNames.map(f => f.toLowerCase -> f).toMap
    // a group-by entry that is not a bare sample column (an expression,
    // or a column this sample never carried) cannot be representation-
    // checked — refuse the serve rather than risk dropped groups
    groupCols.nonEmpty && groupCols.forall(byLower.contains) && {
      val actual = groupCols.map(byLower)
      val (minPerGroup, nGroups) = bkGroupStats.getOrElseUpdate(
        (s.sampleTable, s.createdAt, actual), {
          val r = sdf.groupBy(actual.map(col): _*)
            .agg(count(lit(1)).as("graft_c"))
            .agg(min(col("graft_c")), count(lit(1))).collect()(0)
          (r.getLong(0), r.getLong(1))
        })
      minPerGroup >= BkGroupMinRows && (actual match {
        case Seq(g1) =>
          // vanished groups are invisible in the sample; when a stored
          // HLL knows the base table's distinct count for this column,
          // the sample must cover it within the sketch's 3-sigma band
          catalog.listSketches(Some(s.tableName))
            .find(sk => sk.sketchType == "hyperloglog" &&
              sk.columnName.equalsIgnoreCase(g1))
            .forall { sk =>
              val est = graft.sketch.Hll.deserialize(sk.data).count
              val b = """"b"\s*:\s*(\d+)""".r
                .findFirstMatchIn(sk.parameters)
                .map(_.group(1).toInt).getOrElse(12)
              val rsd = 1.04 / math.sqrt(math.pow(2.0, b.toDouble))
              nGroups >= math.floor(est * math.max(0.0, 1 - 3 * rsd)).toLong
            }
        case _ => true
      })
    }
  }

  /** True iff every non-distinct SUM/AVG call's argument is a single
    * bare attribute (ANY column — the bottom-k decimal gate: a bare
    * measure column is a ≤4-decimal-place quantity under the same data
    * contract every decimal-routed serve in this engine relies on,
    * while an expression argument can carry arbitrary precision and
    * must stay on the double path). Vacuously true with no such calls.
    */
  private def allSumAvgArgsBare(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project}
    val lists = plan.collect {
      case a: Aggregate => a.aggregateExpressions
      case p: Project   => p.projectList
    }.flatten
    lists.flatMap(_.collect {
      case f: UnresolvedFunction
          if Seq("sum", "avg", "mean").contains(f.nameParts.last.toLowerCase) &&
            !f.isDistinct =>
        f.arguments match {
          case Seq(_: UnresolvedAttribute) => true
          case _                           => false
        }
    }).forall(identity)
  }

  /** Opt-in AQP over a join (beyond the reference's single-table
    * planner): pick the largest table by rowcount as the fact side,
    * sample it inline (systematic keyed-hash when a key is given, else
    * seeded Bernoulli), and HT-weight the aggregates. Dims join at
    * full fidelity, so the join runs on ~f of the fact rows — the
    * shuffle/CPU saving join AQP exists for (q68's semantics through
    * the full engine path). Returns None when the error model says the
    * achievable fraction cannot meet the tolerance — or when the plan
    * shape is one fact-side sampling cannot treat soundly: CTEs (the
    * WITH name parses as a relation, and the fact table may also occur
    * inside the CTE body where a second substitution would
    * double-sample), names that do not resolve in the session catalog,
    * and self-joins of the fact table (both occurrences would be
    * substituted at fraction f under a single 1/f weight). Any of
    * those — and any unexpected analysis failure — falls back to the
    * exact path instead of throwing out of engine.query.
    */
  private def sampledJoin(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      features: QueryFeatures, opts: Options,
      auto: Boolean = false): Option[AqeResult] = try {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith
    import scala.util.control.NonFatal
    // Automatic mode pre-gate, BEFORE anything that could cost a scan:
    // without a stored AGMS sketch on at least two of the query's
    // tables there is no cardinality evidence, and a plain multi-table
    // query must not pay plan-time count() scans for a decision that
    // cannot be made anyway.
    if (auto && features.tables.count(t =>
        catalog.listSketches(Some(t)).exists(_.sketchType == "agms")) < 2)
      return None
    if (parsed.collectFirst { case w: UnresolvedWith => w }.isDefined)
      return None
    // DISTINCT aggregates: row sampling cannot serve them (rows of one
    // key sample independently), but the UNIVERSE key-lottery can serve
    // COUNT(DISTINCT key) over the full lottery-key tuple — each
    // distinct key survives with probability exactly p, so the count
    // scales unbiased by 1/p. Collect them here; the universe branch
    // validates the counted columns against the join keys, and every
    // non-universe path refuses when any distinct aggregate exists.
    val distinctFns = parsed.collect { case n => n.expressions }.flatten
      .flatMap(_.collect {
        case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
            if f.isDistinct => f
      })
    // resolve-before-count: an unresolvable name must not cost an
    // AnalysisException (or a scan) at plan time
    val resolvable = features.tables.filter { t =>
      try spark.catalog.tableExists(t) catch { case NonFatal(_) => false }
    }
    if (resolvable.sizeIs < 2) return None
    val sizes = resolvable.map { t =>
      t -> catalog.statsFor(t).map(_.rowCount).getOrElse {
        val n = spark.table(t).count()
        catalog.upsertTableStats(t, n)
        n
      }
    }
    val (fact, factSize) = sizes.maxBy(_._2)
    // Automatic mode: consult the stored AGMS pair for the join-key
    // columns. The decision is costed on the ESTIMATED JOIN OUTPUT J,
    // not the fact size: fact-side sampling at fraction f yields ~f*J
    // join rows, so the HT error model is sqrt(1/(f*J)) — accept only
    // when J is large enough that approximation pays (>= MinAutoJoinRows)
    // and the achievable fraction meets the tolerance; refuse otherwise.
    val agmsJoinRows: Option[Long] =
      if (!auto) None
      else agmsJoinEstimate(parsed, sizes, fact) match {
        case some @ Some(j) if j >= MinAutoJoinRows => some
        case _                                      => return None
      }
    // The relation substitution matches on the LAST name part
    // (SampleRewrite.rewriteRelation); require a plain unqualified fact
    // name with exactly one occurrence so exactly one scan is sampled.
    if (fact.contains(".")) return None
    if (parsed.collect {
      case r: UnresolvedRelation
          if r.multipartIdentifier.last.equalsIgnoreCase(fact) => r
    }.sizeIs != 1) return None
    // Error-model base: the estimated join output when AGMS evidence
    // exists (auto), else the fact size (opt-in — the q77 contract).
    val nEff = agmsJoinRows.getOrElse(factSize)
    val tierF = StrategyChooser.sampleFraction(
      StrategyChooser.Sample, factSize, opts.maxRelError).getOrElse(return None)
    val fNeeded = 1.0 /
      (opts.maxRelError * opts.maxRelError * math.max(1L, nEff))
    val inlineFrac = math.min(0.5, math.max(tierF, fNeeded))
    // Universe (both-side) sampling — the two-big-tables case fact-side
    // sampling cannot help (the other big side would still scan in
    // full): when exactly TWO tables exceed UniverseMinRows (the fact
    // and one partner) and the equi-join pairs are identifiable, put
    // the SAME keyed-hash lottery on both big sides' shared join keys.
    // Equal keys hash identically, so a join row survives iff its key
    // does — the join output is a p-sample of itself under ONE 1/p HT
    // scale, and both big scans shrink to ~p. Any remaining SMALL dims
    // join the fact exact at full fidelity (they broadcast cheaply;
    // every full-join row with a winning key still survives, so the
    // single scale stays unbiased). Deterministic membership keeps it
    // oracle-checkable (q79 two-table, q95 two-big + dim).
    val bigSides = sizes.filter(_._2 >= UniverseMinRows)
    if (bigSides.sizeIs == 2 && bigSides.exists(_._1 == fact)) {
      val partner = bigSides.collectFirst {
        case (t, _) if t != fact => t }.get
      // composite equi-keys hash as one tuple on both sides — the
      // lottery stays join-compatible (joinTreeEdges aligns the pair).
      // The partner must join the fact DIRECTLY (the lottery key is
      // their shared equi-key); small dims may hang off either big
      // side — they join exact, so survival stays key-determined.
      joinTreeEdges(parsed, sizes.map(_._1), fact)
        .flatMap(_.collectFirst {
          case (p, pks, c, cks) if p == fact && c == partner =>
            (pks, cks, c)
        }) match {
        case Some((factKey, partnerKey, _))
            if !partner.contains(".") && parsed.collect {
              case r: UnresolvedRelation
                  if r.multipartIdentifier.last.equalsIgnoreCase(partner) => r
            }.sizeIs == 1 &&
            // every distinct aggregate must be COUNT(DISTINCT <full
            // lottery-key tuple of one side>) — a single component of a
            // composite key (or any non-key column) does NOT scale by
            // 1/p and refuses the whole join AQP attempt below
            {
              val keySets = Seq(factKey, partnerKey)
                .map(_.map(_.toLowerCase).toSet)
              distinctFns.forall { f =>
                f.nameParts.last.equalsIgnoreCase("count") &&
                  f.filter.isEmpty &&
                  f.arguments.forall(_.isInstanceOf[
                    org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute]) && {
                    val cols = f.arguments.map(
                      _.asInstanceOf[org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute]
                        .nameParts.last.toLowerCase).toSet
                    keySets.contains(cols)
                  }
              }
            } =>
          val scaleDistinct = distinctFns.nonEmpty
          // Prefer MATERIALIZED universe samples on both sides (same
          // fraction -> join-compatible membership): the lottery hash
          // is a full-scan cost paid once at sample creation, not per
          // query — the serving shape at 100 TB. Falls back to the
          // inline both-sides filter when no matching pair exists.
          val matPair = universePairFor(fact, factKey, partner, partnerKey)
            .filter { case (a, b) => a.fraction == b.fraction }
            .filter { case (a, _) =>
              math.sqrt(1.0 / math.max(1.0, a.fraction * nEff)) <=
                opts.maxRelError * (1 + 1e-9)
            }
          matPair match {
            case Some((a, b)) =>
              val p = a.fraction
              val plan2 = SampleRewrite.rewriteUniverseMaterialized(parsed,
                Map(fact -> a.sampleTable, partner -> b.sampleTable), p,
                opts.ciColumns, scaleKeyDistinct = scaleDistinct)
              val df = org.apache.spark.sql.GraftPlanExec.ofRows(spark, plan2)
              val (spd, _) = StrategyChooser.predict(
                StrategyChooser.Sample, factSize, Some(p))
              return Some(AqeResult(df, "sample", "sample_universe",
                f"universe join sampling: both big tables exceed $UniverseMinRows%d rows, " +
                  f"answered from materialized universe samples ${a.sampleTable} ⋈ ${b.sampleTable} (p=$p%.4f, single 1/p HT scale" +
                  (if (sizes.sizeIs > 2) "; small dims joined exact)" else ")"),
                0.8, spd, math.sqrt(1.0 / math.max(1.0, p * nEff)), Some(p),
                Some(a.sampleTable),
                Seq(s"both big relations substituted by materialized universe samples (no scan of either base table)",
                  "aggregates rewritten to Horvitz-Thompson weighted form (single 1/p scale)") ++
                  (if (scaleDistinct)
                    Seq("COUNT(DISTINCT join-key) scaled by 1/p (key-lottery membership: each distinct key survives with probability exactly p)")
                  else Nil)))
            case None =>
          }
          val threshold = math.max(1, math.round(inlineFrac * 10000).toInt)
          val p = threshold / 10000.0
          val estErrU = math.sqrt(1.0 / math.max(1.0, p * nEff))
          if (estErrU <= opts.maxRelError * (1 + 1e-9)) {
            val plan2 = SampleRewrite.rewriteUniverse(parsed,
              Map(fact -> factKey, partner -> partnerKey), p, opts.ciColumns,
              scaleKeyDistinct = scaleDistinct)
            val df = org.apache.spark.sql.GraftPlanExec.ofRows(spark, plan2)
            val (spd, _) = StrategyChooser.predict(
              StrategyChooser.Sample, factSize, Some(p))
            return Some(AqeResult(df, "sample", "sample_universe",
              f"universe join sampling: both big tables exceed $UniverseMinRows%d rows, " +
                f"shared join-key lottery p=$p%.4f on both sides (single 1/p HT scale" +
                (if (sizes.sizeIs > 2) "; small dims joined exact)" else ")"),
              0.8, spd, estErrU, Some(p), None,
              Seq(s"both big relations filtered by the shared key lottery " +
                s"graft_h60('uv:'||key) % 10000 < $threshold",
                "aggregates rewritten to Horvitz-Thompson weighted form (single 1/p scale)") ++
                (if (scaleDistinct)
                  Seq("COUNT(DISTINCT join-key) scaled by 1/p (key-lottery membership: each distinct key survives with probability exactly p)")
                else Nil)))
          }
        case _ =>
      }
    }
    // Row sampling cannot serve distinct aggregates — only the universe
    // key lottery above can, and it either served or refused by now.
    if (distinctFns.nonEmpty) return None
    // Prefer a materialized sample of the fact (no fact scan at all —
    // the 100 TB path) when one meets the tolerance; an explicit
    // systematicKey requests deterministic inline membership instead.
    val decision: Planner.SamplingDecision = catalog
      .bestUniformSample(fact)
      .filter(_ => opts.systematicKey.isEmpty)
      .filter(s => math.sqrt(1.0 / math.max(1.0, s.fraction * nEff))
        <= opts.maxRelError * (1 + 1e-9))
      .map(s => Planner.ReadSampleTable(s.sampleTable, s.fraction))
      .getOrElse(opts.systematicKey
        .map(k => Planner.ReadInlineSystematic(inlineFrac, k))
        .getOrElse(Planner.ReadInlineSample(inlineFrac, seed)))
    val frac = decision.fraction.get
    val estErr = math.sqrt(1.0 / math.max(1.0, frac * nEff))
    if (estErr > opts.maxRelError * (1 + 1e-9)) return None
    val d = SampleRewrite.Directive(fact, decision,
      weight = Some(SampleRewrite.ConstWeight(frac)),
      rewriteDistinctToHll = false, hllRsd = None,
      addCiColumns = opts.ciColumns)
    val df = SampleRewrite.rewrite(spark, parsed, d)
    val (spd, err) = StrategyChooser.predict(
      StrategyChooser.Sample, factSize, Some(frac))
    val (tbl, desc) = decision match {
      case Planner.ReadSampleTable(n, _) =>
        (Some(n), s"fact side $fact answered from materialized sample $n")
      case Planner.ReadInlineSystematic(_, k) =>
        (None, f"fact side $fact sampled systematically (keyed-hash on $k) at fraction=$frac%.4f")
      case _ =>
        (None, f"fact side $fact sampled (Bernoulli, seed=$seed) at fraction=$frac%.4f")
    }
    val reason = agmsJoinRows match {
      case Some(j) =>
        f"join AQP (automatic, costed): stored AGMS sketches estimate " +
          f"join size $j%d >= $MinAutoJoinRows%d and error $estErr%.3f fits " +
          f"tolerance ${opts.maxRelError}%.3f; largest table $fact sampled, dims at full fidelity"
      case None =>
        s"join AQP (beyond reference): largest table $fact sampled, dims at full fidelity"
    }
    Some(AqeResult(df, "sample", "sample_join", reason,
      0.8, spd, err, Some(frac), tbl,
      Seq(desc, "aggregates rewritten to Horvitz-Thompson weighted form")))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Smallest AGMS-estimated join output worth approximating — below
    * this, exact is already trivially cheap (the same spirit as the
    * chooser's tableSize<=1000 exact rule).
    */
  private val MinAutoJoinRows = 1000L

  /** Both-sides-big threshold for universe sampling: below this a dim
    * side scans/broadcasts cheaply and fact-side sampling is the better
    * plan (it keeps the dim exact).
    */
  private val UniverseMinRows = 1000000L

  /** The parsed query's equi-join EDGES oriented into a tree rooted at
    * `fact`, attributed via the session catalog's column lists
    * (metadata only, no scan): one (parent, parentKeys, child,
    * childKeys) entry per join, parent = the endpoint nearer the fact,
    * keys ALIGNED pairwise — a composite `ON a.k1 = b.k1 AND
    * a.k2 = b.k2` condition yields multi-element key seqs. Covers the
    * star (every edge touches the fact) AND the snowflake chain
    * (fact → dim → subdim). None on any shape the join-sampling
    * decisions are not sound for: a join count that isn't tables-1, a
    * non-equi conjunct, a key column resolvable on zero or several of
    * the query's tables, a join mixing table pairs, a disconnected or
    * cyclic shape, or a pair joined twice.
    *
    * CANONICAL pair order: aligned pairs are sorted by the key names
    * of the edge's alphabetically-FIRST table — a rule independent of
    * conjunct order, join direction, and which endpoint is the fact,
    * so builders, advisor recipes, and every lookup agree on the same
    * composite sketch/sample name. (For every fact-adjacent edge whose
    * fact sorts first — e.g. lineitem ⋈ orders — this equals the
    * previous fact-keys-sorted rule.)
    */
  private def joinTreeEdges(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      tables: Seq[String], fact: String)
      : Option[Seq[(String, Seq[String], String, Seq[String])]] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val joins = parsed.collect { case j: Join => j }
    if (tables.sizeIs < 2 || joins.sizeIs != tables.size - 1) return None
    def cols(t: String) = spark.table(t).columns.map(_.toLowerCase).toSet
    val colsBy = tables.map(t => t -> cols(t)).toMap
    val perJoin = joins.map { j =>
      j.condition.flatMap { cond =>
        // every conjunct must be attr = attr between exactly one
        // UNAMBIGUOUS pair of the query's tables (the same pair across
        // the join's conjuncts)
        val pairs = conjunctsOf(cond).map {
          case EqualTo(x: UnresolvedAttribute, y: UnresolvedAttribute) =>
            val (a, b) = (x.nameParts.last, y.nameParts.last)
            val aT = tables.filter(t => colsBy(t).contains(a.toLowerCase))
            val bT = tables.filter(t => colsBy(t).contains(b.toLowerCase))
            (aT, bT) match {
              case (Seq(ta), Seq(tb)) if ta != tb => Some((ta, a, tb, b))
              case _                              => None
            }
          case _ => None
        }
        if (pairs.isEmpty || pairs.exists(_.isEmpty)) None
        else {
          val ps = pairs.flatten
          if (ps.map(p => Set(p._1, p._3)).distinct.sizeIs != 1) None
          else {
            // orient each conjunct onto the same (ta, tb) axis, then
            // canonicalize pair order by the alphabetically-first
            // table's key names
            val (ta, tb) = (ps.head._1, ps.head._3)
            val aligned = ps.map { case (x1, k1, _, k2) =>
              if (x1 == ta) (k1, k2) else (k2, k1)
            }
            val (first, firstKeys, other, otherKeys) =
              if (ta.toLowerCase <= tb.toLowerCase)
                (ta, aligned.map(_._1), tb, aligned.map(_._2))
              else (tb, aligned.map(_._2), ta, aligned.map(_._1))
            val sorted = firstKeys.zip(otherKeys).sortBy(_._1.toLowerCase)
            Some((first, sorted.map(_._1), other, sorted.map(_._2)))
          }
        }
      }
    }
    if (perJoin.exists(_.isEmpty)) return None
    val edges = perJoin.flatten
    // BFS from the fact: the edges must form a spanning tree (every
    // table reached exactly once); orientation = parent nearer fact
    val adj = edges
      .flatMap(e => Seq(e._1 -> e, e._3 -> e))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val visited = scala.collection.mutable.Set(fact)
    var frontier = List(fact)
    val oriented = scala.collection.mutable.ArrayBuffer
      .empty[(String, Seq[String], String, Seq[String])]
    while (frontier.nonEmpty) {
      val t = frontier.head
      frontier = frontier.tail
      adj.getOrElse(t, Nil).foreach { case (a, ak, b, bk) =>
        val (child, parentKeys, childKeys) =
          if (a == t) (b, ak, bk) else (a, bk, ak)
        if (!visited.contains(child)) {
          visited += child
          frontier ::= child
          oriented += ((t, parentKeys, child, childKeys))
        }
      }
    }
    if (visited.size != tables.size || oriented.size != edges.size)
      return None
    Some(oriented.toSeq)
  }

  /** The STAR restriction of [[joinTreeEdges]] — every join touches
    * the fact: one (factKeys, dimKeys, dim) entry per dim. The shape
    * the universe-lottery partner lookup and the q93 composite join
    * contract are defined on.
    */
  private def joinKeyPairs(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      tables: Seq[String], fact: String)
      : Option[Seq[(Seq[String], Seq[String], String)]] =
    joinTreeEdges(parsed, tables, fact)
      .filter(_.forall(_._1 == fact))
      .map(_.map { case (_, fks, child, cks) => (fks, cks, child) })

  /** The catalog name an AGMS sketch over a (possibly composite) key
    * is stored under — single keys keep the bare column name,
    * composites the comma-joined list (SketchOps.createAgms).
    */
  private def agmsKeyName(keys: Seq[String]): String = keys.mkString(",")

  /** A fresh stored AGMS pair over the ALIGNED key pair, under ANY
    * shared component order: builders (the HTTP route included) may
    * store composite keys in whatever order the caller listed them, as
    * long as BOTH sides used the SAME aligned order — the tuple hash
    * is order-sensitive, but consistently-permuted pairs hash
    * compatibly. The canonical order is probed first (one lookup, the
    * common case); otherwise each stored fact-side order induces the
    * partner order through the ON-clause alignment and the partner is
    * looked up under it, so an HTTP-built natural-order pair can never
    * become permanently unservable.
    */
  private def agmsPairFor(tableA: String, keysA: Seq[String],
      tableB: String, keysB: Seq[String])
      : Option[(catalog.SketchInfo, catalog.SketchInfo)] = {
    def fresh(t: String, key: String): Option[catalog.SketchInfo] =
      catalog.getSketch(t, key, "agms").filter(sketchIsFresh(t, _))
    val canonical = for {
      sa <- fresh(tableA, agmsKeyName(keysA))
      sb <- fresh(tableB, agmsKeyName(keysB))
    } yield (sa, sb)
    canonical.orElse {
      val pairs = keysA.zip(keysB)
      catalog.listSketches(Some(tableA)).iterator
        .filter(_.sketchType == "agms")
        .filter(sketchIsFresh(tableA, _))
        .flatMap { sa =>
          val order = sa.columnName.split(",").map(_.trim).toSeq
          if (order.map(_.toLowerCase).sorted !=
              keysA.map(_.toLowerCase).sorted) None
          else {
            val alignedB = order.map(k =>
              pairs.find(_._1.equalsIgnoreCase(k)).map(_._2))
            if (alignedB.exists(_.isEmpty)) None
            else fresh(tableB, alignedB.flatten.mkString(","))
              .map(sb => (sa, sb))
          }
        }
        .nextOption()
    }
  }

  /** The universe-sample twin of [[agmsPairFor]]: a fresh materialized
    * pair over the aligned join key under any shared component order
    * (canonical first). Fraction equality is the caller's check.
    */
  private def universePairFor(fact: String, factKeys: Seq[String],
      partner: String, partnerKeys: Seq[String])
      : Option[(catalog.SampleInfo, catalog.SampleInfo)] = {
    val canonical = for {
      a <- catalog.universeSampleFor(fact, agmsKeyName(factKeys))
      b <- catalog.universeSampleFor(partner, agmsKeyName(partnerKeys))
    } yield (a, b)
    canonical.orElse {
      val pairs = factKeys.zip(partnerKeys)
      catalog.samplesFor(fact).iterator
        .filter(_.strataColumn.exists(_.startsWith("__universe__")))
        .filter(catalog.sampleIsFresh)
        .flatMap { a =>
          val order = a.strataColumn.get.stripPrefix("__universe__")
            .split(",").map(_.trim).toSeq
          if (order.map(_.toLowerCase).sorted !=
              factKeys.map(_.toLowerCase).sorted) None
          else {
            val alignedB = order.map(k =>
              pairs.find(_._1.equalsIgnoreCase(k)).map(_._2))
            if (alignedB.exists(_.isEmpty)) None
            else catalog
              .universeSampleFor(partner, alignedB.flatten.mkString(","))
              .map(b => (a, b))
          }
        }
        .nextOption()
    }
  }

  /** Estimate the join output from stored AGMS sketches, with NO scan.
    * Two tables: the classic AGMS dot-product estimate of |F ⋈ D| over
    * the (possibly composite) key pair. A TREE of joins (star,
    * snowflake chain, or both): |F| · Π over oriented edges of
    * (J_edge / |parent(edge)|) — each pairwise size from its own AGMS
    * pair, composed under the independence assumption. For a star
    * every parent is the fact (the standard star-join cardinality
    * model); a fact → dim → subdim chain multiplies the subdim edge's
    * fan-out relative to ITS parent dim. Requires a fresh AGMS sketch
    * per edge endpoint with matching bucket counts and tuple encoding;
    * any missing piece returns None and the decision falls back to
    * reference-parity exact.
    */
  private val agmsEncRe = """"enc"\s*:\s*"([^"]*)"""".r
  private def agmsJoinEstimate(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      sizes: Seq[(String, Long)], fact: String): Option[Long] = {
    val sizeMap = sizes.toMap
    // both sides must have hashed their key tuples under the SAME
    // rendering (composite sketches record "enc"; absent = the
    // single-key raw-cast contract) or the dot product is meaningless
    def enc(s: catalog.SketchInfo): Option[String] =
      agmsEncRe.findFirstMatchIn(s.parameters).map(_.group(1))
    joinTreeEdges(parsed, sizes.map(_._1), fact).flatMap { edges =>
      val ests = edges.map { case (parent, pks, child, cks) =>
        for {
          (sp, sc) <- agmsPairFor(parent, pks, child, cks)
          if enc(sp) == enc(sc)
          est <- graft.sketch.Agms.dotEstimate(sp.data, sc.data)
        } yield (parent, est)
      }
      if (ests.exists(_.isEmpty)) None
      else {
        val j = ests.flatten.foldLeft(
          sizeMap(fact).toDouble) { case (acc, (parent, je)) =>
          acc * (je.toDouble / math.max(1.0, sizeMap(parent).toDouble))
        }
        Some(math.round(j))
      }
    }
  }

  /** The salted-plan gate: a single-table GROUP BY whose grouping
    * column has catalog skew stats above the threshold re-plans via
    * SaltRewrite (exact semantics; see its scaladoc for the supported
    * shape — None falls back to the plain plan).
    */
  private def saltedExact(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      features: QueryFeatures): Option[DataFrame] =
    for {
      table <- features.tableName.filter(_ => features.isSingleTable)
      // a grouping entry matches skew stats either as a bare column
      // (strip any table qualifier/backticks) or as the full normalized
      // expression SQL (profileKeySkew stores expression keys that way)
      if features.groupByColumns
        .flatMap(g => Seq(g,
          g.split("\\.").last.stripPrefix("`").stripSuffix("`")).distinct)
        .exists(c => catalog.keySkewFor(table, c)
          .exists(_.topSharePpm >= SaltRewrite.SkewPpmThreshold))
      plan <- SaltRewrite(parsed)
    } yield org.apache.spark.sql.GraftPlanExec.ofRows(spark, plan)

  /** Staleness guard for catalog-served answers: a sketch that recorded
    * the base-table rowcount at build time ("rows" in its params JSON)
    * is served only while the catalog's table stats agree — an appended
    * or rewritten table falls through to the scan path instead of being
    * answered from stale state. With no recorded rowcount or no table
    * stats there is no evidence of staleness and the sketch serves
    * (the reference's ignore-staleness policy, SURVEY §7.4 — kept as
    * the default, tightened where the evidence exists).
    *
    * ROWCOUNT EQUALITY IS THE STALENESS CONTRACT: an in-place rewrite
    * that preserves the rowcount is NOT detected — the engine reads
    * registered views whose backing storage it cannot fingerprint
    * generically (temp views have no files). Operators who rewrite in
    * place must rebuild the affected sketches (or bump table stats) as
    * part of the rewrite.
    */
  private val sketchRowsRe = """"rows"\s*:\s*(\d+)""".r
  private def sketchIsFresh(table: String, s: catalog.SketchInfo): Boolean =
    (sketchRowsRe.findFirstMatchIn(s.parameters).map(_.group(1).toLong),
      catalog.statsFor(table)) match {
      case (Some(recorded), Some(ts)) => recorded == ts.rowCount
      case _                          => true
    }

  /** Rowcount evidence with NO scan: the catalog's table stats, else
    * the largest build-time rowcount any stored sketch for the table
    * recorded in its params. Feeds the serve-path cost model; with no
    * evidence at all it defaults to 1 row, where the planner breaks
    * the resulting cost tie toward the serve by enumeration order.
    */
  private def tableRowsHint(table: String): Option[Long] =
    catalog.statsFor(table).map(_.rowCount).orElse(
      catalog.listSketches(Some(table))
        .flatMap(s => sketchRowsRe.findFirstMatchIn(s.parameters)
          .map(_.group(1).toLong))
        .maxOption)

  /** Wrap a VERIFIED no-scan catalog serve in the planner's candidate
    * enumeration (the reference explain contract, planner.py:21-78 /
    * app.py:106-111): confidence, speedup, and cost come from the
    * enumerated candidates, not per-path constants, so explain-mode
    * output names the serve the engine actually runs with the cost
    * model's own figures. Every caller has already gated
    * `err <= opts.maxRelError`, so the serve candidate is valid and —
    * costed at CatalogServeCost, below any scan — wins the
    * enumeration. Confidence derives from the serve's reported bound
    * (0.95 at zero error, the exact path's own confidence, shrinking
    * with the bound); the speedup is the exact candidate's cost over
    * the serve's — finite and honest, unlike the old ∞ constant.
    */
  private def serveResult(df: DataFrame, features: QueryFeatures,
      table: String, kind: String, err: Double, detail: String,
      transforms: Seq[String], opts: Options): AqeResult = {
    val rows = tableRowsHint(table).getOrElse(1L)
    val plan = Planner.plan(features, catalog, rows, opts.maxRelError,
      preferExact = false,
      serves = Seq(Planner.ServeCandidate(kind, err, detail)))
    AqeResult(df, "sketch", "sketch", plan.reason,
      confidence = math.max(0.5, 0.95 - err),
      estimatedSpeedup = math.max(1.0,
        Planner.estimateExactCost(features, rows) / plan.estimatedCost),
      estimatedError = err, sampleFraction = None, sampleTable = None,
      transformations = transforms, servedFromCatalog = true,
      estimatedCost = Some(plan.estimatedCost), serveKind = Some(kind))
  }

  /** Whether serving aggregate `fn` of `column` from the given
    * per-group stat records keeps the "exact, 0.0 error" label honest.
    * COUNT always qualifies (nnull is an exact long regardless of the
    * column type). Float/double columns always qualify: their stored
    * min/max ARE the column's values and the stored sum is the repo's
    * canonical decimal-portable sum (the only deterministic
    * cross-engine rendering of a float sum) — what exact execution
    * through this engine's oracle protocol returns too. Integral
    * columns: min/max serve only while |value| < 2^53 (2^53+1 rounds
    * to 2^53, so a stored double at or beyond the limit may have
    * rounded), and the unscaled sum must round-trip through its double
    * rendering (GroupedStats.Stat.sumExactDouble). Decimal columns:
    * min/max refuse (a .05-style fraction has no exact double) and
    * sums additionally require scale <= 4 (a wider scale was rounded
    * per row by the builder's cast). Anything else refuses.
    */
  private def statFnServesExactly(table: String, column: String, fn: String,
      stats: Seq[graft.sketch.GroupedStats.Stat]): Boolean = {
    import org.apache.spark.sql.types._
    val dt = scala.util.Try(spark.table(table).schema
      .find(_.name.equalsIgnoreCase(column)).map(_.dataType)).toOption.flatten
    fn match {
      case "count" => true
      case "min" | "max" => dt match {
        case Some(FloatType | DoubleType) => true
        case Some(ByteType | ShortType | IntegerType | LongType) =>
          val lim = 9007199254740992.0 // 2^53
          stats.forall(st => (st.min ++ st.max).forall(v => math.abs(v) < lim))
        case _ => false
      }
      case "sum" | "avg" | "mean" => dt match {
        case Some(FloatType | DoubleType) => true
        case Some(d: DecimalType) =>
          d.scale <= 4 && stats.forall(_.sumExactDouble)
        case Some(ByteType | ShortType | IntegerType | LongType) =>
          stats.forall(_.sumExactDouble)
        case _ => false
      }
      case _ => false
    }
  }

  /** Flatten a conjunction into its conjuncts (shared by the join-key
    * extractor, the filtered-group predicate parser, and the advisor's
    * shape classifier).
    */
  private def conjunctsOf(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjunctsOf(l) ++ conjunctsOf(r)
    // Spark 4 parses `x BETWEEN a AND b` as the unresolved function
    // 'between (resolved later to the RuntimeReplaceable Between
    // node), not the two comparisons it lowers to at analysis time —
    // expand both spellings here so every conjunct consumer (range
    // serves, key-range dispatch, the advisor's shape classifier)
    // sees the comparison form. Non-literal bounds simply fail the
    // downstream pattern matches, exactly as before.
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.nameParts.last.equalsIgnoreCase("between") &&
          f.arguments.sizeIs == 3 && !f.isDistinct && f.filter.isEmpty =>
      Seq(org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
        f.arguments(0), f.arguments(1)),
        org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(
          f.arguments(0), f.arguments(2)))
    case b: org.apache.spark.sql.catalyst.expressions.Between =>
      Seq(org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
        b.input, b.lower),
        org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(
          b.input, b.upper))
    case x => Seq(x)
  }

  /** Literal → sketch-key rendering, gated on the filter column's
    * ACTUAL data type. Sketch keys are built as `cast(col as string)`,
    * and a literal's toString equals that rendering only for string
    * literals on string columns and integral literals on integral
    * columns: `WHERE g = 5` on a double column renders "5" while the
    * blob keys "5.0" (the serve would silently return the exact-empty-
    * group answer), and an integral literal against a string column
    * holding "05" misses the same way. Any other (column, literal)
    * pairing returns None so the query falls through to the scan path.
    * Schema resolution is a catalog lookup (no scan); an unresolvable
    * table refuses.
    */
  private def typedLitKey(table: String, column: String,
      l: org.apache.spark.sql.catalyst.expressions.Literal): Option[String] = {
    import org.apache.spark.sql.types._
    val dt = scala.util.Try(spark.table(table).schema
      .find(_.name.equalsIgnoreCase(column)).map(_.dataType)).toOption.flatten
    (dt, l.value) match {
      case (Some(StringType), u: org.apache.spark.unsafe.types.UTF8String) =>
        Some(u.toString)
      case (Some(ByteType | ShortType | IntegerType | LongType),
            n @ (_: java.lang.Integer | _: java.lang.Long |
                 _: java.lang.Short | _: java.lang.Byte)) =>
        Some(n.toString)
      case _ => None
    }
  }

  /** IN-list literals → sketch keys. A NULL literal can never match a
    * row (three-valued IN: `col = NULL` is UNKNOWN, and UNKNOWN never
    * turns a non-matching row true), so NULLs are DROPPED rather than
    * refusing the whole serve; any NON-null literal that fails the
    * typed rendering still refuses (it could match rows the sketch
    * keys differently). Some(Nil) = every literal was NULL: the serve
    * answers the empty-match aggregate, exactly like exact execution.
    */
  private def typedInListKeys(table: String, column: String,
      lits: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Option[Seq[String]] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    if (lits.isEmpty || !lits.forall(_.isInstanceOf[Literal])) return None
    val rendered: Seq[Option[Option[String]]] =
      lits.map(_.asInstanceOf[Literal]).map { l =>
        if (l.value == null) Some(None)
        else typedLitKey(table, column, l).map(k => Some(k))
      }
    if (rendered.exists(_.isEmpty)) None
    else Some(rendered.flatten.flatten.distinct)
  }

  /** If the query is a bare global aggregate over `table` whose every
    * output is PERCENTILE(attr, p) / MEDIAN(attr) with a stored
    * histogram sketch for attr, answer all of them by interpolation
    * from the catalog — zero table scan. Returns the answer plus the
    * reported error (one bucket width as a fraction of the grid).
    */
  private def storedHistogramAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String): Option[(DataFrame, Double)] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.functions.lit
    def litDouble(l: Literal): Option[Double] = l.value match {
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case n: Number                             => Some(n.doubleValue())
      case _                                     => None
    }
    parsed match {
      case Project(outs, r: UnresolvedRelation)
          if r.multipartIdentifier.last.equalsIgnoreCase(table) =>
        val answered = outs.map {
          case Alias(f: UnresolvedFunction, name)
              if !f.isDistinct && f.filter.isEmpty =>
            val colP: Option[(String, Double)] =
              (f.nameParts.last.toLowerCase, f.arguments) match {
                case ("percentile" | "percentile_approx" | "approx_percentile",
                    Seq(a: UnresolvedAttribute, l: Literal)) =>
                  litDouble(l).map(p => (a.nameParts.last, p))
                case ("median", Seq(a: UnresolvedAttribute)) =>
                  Some((a.nameParts.last, 0.5))
                case _ => None
              }
            colP.flatMap { case (c, p) =>
              catalog.getSketch(table, c, "histogram")
                .filter(sketchIsFresh(table, _)).map { s =>
                val h = graft.sketch.Histogram.deserialize(s.data)
                (name, h.percentile(p), 1.0 / h.buckets)
              }
            }
          case _ => None
        }
        if (answered.nonEmpty && answered.forall(_.isDefined)) {
          val vals = answered.flatten
          val cols = vals.map { case (n, v, _) => lit(v).as(n) }
          Some((spark.range(1).select(cols: _*), vals.map(_._3).max))
        } else None
      case _ => None
    }
  }

  /** The RELATIVE-error twin of [[storedHistogramAnswer]]: the same
    * bare-percentile shape answered from a fresh log-linear "hdr"
    * sketch (SketchOps.createHdr) when no equi-width histogram serves
    * — the heavy-tailed-column case, where one equi-width bucket can
    * swallow 99% of the mass and the absolute bound degenerates. The
    * reported error is the sketch's 1/m relative bound; an EMPTY
    * column serves NULL exactly like exact execution over zero rows.
    * Dispatches AFTER the equi-width path in query(), so existing
    * histogram serves (and their oracles) are untouched.
    */
  private def storedHdrAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String): Option[(DataFrame, Double)] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.functions.lit
    def litDouble(l: Literal): Option[Double] = l.value match {
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case n: Number                             => Some(n.doubleValue())
      case _                                     => None
    }
    parsed match {
      case Project(outs, r: UnresolvedRelation)
          if r.multipartIdentifier.last.equalsIgnoreCase(table) &&
            outs.nonEmpty =>
        val answered = outs.map {
          case Alias(f: UnresolvedFunction, name)
              if !f.isDistinct && f.filter.isEmpty =>
            val colP: Option[(String, Double)] =
              (f.nameParts.last.toLowerCase, f.arguments) match {
                case ("percentile" | "percentile_approx" | "approx_percentile",
                    Seq(a: UnresolvedAttribute, l: Literal)) =>
                  litDouble(l).map(p => (a.nameParts.last, p))
                case ("median", Seq(a: UnresolvedAttribute)) =>
                  Some((a.nameParts.last, 0.5))
                case _ => None
              }
            colP.flatMap { case (c, p) =>
              catalog.getSketch(table, c, "hdr")
                .filter(sketchIsFresh(table, _)).map { s =>
                val h = graft.sketch.HdrSketch.deserialize(s.data)
                (name, h.percentile(p), h.relErrBound)
              }
            }
          case _ => None
        }
        if (answered.nonEmpty && answered.forall(_.isDefined)) {
          val vals = answered.flatten
          val cols = vals.map { case (n, v, _) =>
            v.map(lit(_)).getOrElse(lit(null)
              .cast(org.apache.spark.sql.types.DoubleType)).as(n)
          }
          Some((spark.range(1).select(cols: _*), vals.map(_._3).max))
        } else None
      case _ => None
    }
  }

  /** If the query is `SELECT count(*)/sum(x)/avg(x)/percentile(x,p)...
    * FROM table WHERE <range on x>` — one NUMERIC column under
    * >=/>/<=/< literal bounds (BETWEEN parses to the same conjunction;
    * one- or two-sided) — and a fresh stored histogram covers x,
    * answer by linear interpolation over the bucket grid with NO scan
    * (Histogram.rangeCount / rangePositions: interior buckets exact,
    * boundary buckets fractional). SUM/AVG additionally need the
    * "histsum" blob the histogram build writes (per-bucket exact
    * decimal sums): interior sums add exactly (unscaled decimal
    * addition, one cast to double), boundary buckets contribute their
    * covered fraction, and AVG is one division of the two estimates.
    * The honest error bound is the boundary buckets' mass (count or
    * |sum|) over the estimate — the truth can differ by at most the
    * buckets the range edges cut through (strict vs inclusive bounds
    * differ only by point mass at the edge, inside those same
    * buckets); AVG reports the first-order combination of both. The
    * serve engages only when the worst output's ratio fits the
    * caller's budget. Rows with NULL x fail the predicate and are
    * outside the histogram alike.
    */
  private def storedHistogramRangeAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String): Option[(DataFrame, Double)] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{Alias, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    import org.apache.spark.sql.functions.lit
    def litDouble(l: Literal): Option[Double] = l.value match {
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case n: Number                             => Some(n.doubleValue())
      case _                                     => None
    }
    sealed trait ROut { def name: String }
    case class CntOut(name: String) extends ROut
    case class SumOut(name: String, col: String) extends ROut
    case class AvgOut(name: String, col: String) extends ROut
    case class PctOut(name: String, col: String, p: Double) extends ROut
    parsed match {
      case Project(outs, Filter(cond, r: UnresolvedRelation))
          if r.multipartIdentifier.last.equalsIgnoreCase(table) &&
            outs.nonEmpty =>
        val classified = outs.map {
          case Alias(f: UnresolvedFunction, name)
              if !f.isDistinct && f.filter.isEmpty =>
            (f.nameParts.last.toLowerCase, f.arguments) match {
              case ("count", Seq(Literal(v: Number, _))) if v.intValue == 1 =>
                Some(CntOut(name))
              case ("count",
                  Seq(_: org.apache.spark.sql.catalyst.analysis.UnresolvedStar)) =>
                Some(CntOut(name))
              case ("sum", Seq(a: UnresolvedAttribute)) =>
                Some(SumOut(name, a.nameParts.last))
              case ("avg" | "mean", Seq(a: UnresolvedAttribute)) =>
                Some(AvgOut(name, a.nameParts.last))
              // percentile RESTRICTED to the range (round 10): the
              // histogram's bucket masses clipped to the range bracket
              // the rank — Histogram.rangePercentile
              case ("percentile" | "percentile_approx" | "approx_percentile",
                  Seq(a: UnresolvedAttribute, l: Literal)) =>
                litDouble(l).map(p => PctOut(name, a.nameParts.last, p))
              case ("median", Seq(a: UnresolvedAttribute)) =>
                Some(PctOut(name, a.nameParts.last, 0.5))
              case _ => None
            }
          case _ => None
        }
        if (classified.exists(_.isEmpty)) return None
        val parts = classified.flatten
        val (c, lowerB, upperB) = rangeBounds(cond).getOrElse(return None)
        // SUM/AVG/PERCENTILE serve only over the RANGE column itself
        // (the histogram models exactly that distribution; the histsum
        // blob records that column's per-bucket sums)
        val sumCols = parts.collect {
          case SumOut(_, cc) => cc
          case AvgOut(_, cc) => cc
          case PctOut(_, cc, _) => cc
        }
        if (sumCols.exists(!_.equalsIgnoreCase(c))) return None
        // the filter column must be numeric — a histogram only exists
        // for castable columns, but the gate keeps intent explicit
        if (!numericColumn(table, c)) return None
        val h = catalog.getSketch(table, c, "histogram")
          .filter(sketchIsFresh(table, _))
          .map(s => graft.sketch.Histogram.deserialize(s.data))
          .getOrElse(return None)
        // per-bucket exact decimal sums, needed only for SUM/AVG
        // (percentiles read the histogram alone)
        val needSums = parts.exists {
          case _: SumOut | _: AvgOut => true
          case _                     => false
        }
        val bsums: Option[Array[BigInt]] =
          if (!needSums) None
          else if (!riderInSync(table, c, "histogram", "histsum"))
            return None // rider a batch behind the counts: refuse sums
          else Some(catalog.getSketch(table, c, "histsum")
            .filter(sketchIsFresh(table, _))
            .flatMap { s =>
              val byKey = graft.sketch.GroupedHll.unpack(s.data)
                .collect { case (Some(k), b) => k.toInt -> BigInt(b) }.toMap
              if (byKey.size == h.buckets)
                Some(Array.tabulate(h.buckets)(byKey))
              else None
            }.getOrElse(return None))
        val (cntEst, cntBoundary) = h.rangeCount(lowerB, upperB)
        val cntRel = cntBoundary.toDouble / math.max(1.0, cntEst)
        // SUM estimate on the SAME grid geometry: interior buckets add
        // exactly (unscaled decimal addition, one cast), boundary
        // buckets contribute their covered fraction
        val (sumEst, sumBoundary): (Option[Double], Double) = bsums match {
          case None => (None, 0.0)
          case Some(bs) =>
            def d(i: Int): Double =
              new java.math.BigDecimal(bs(i).bigInteger, 4).doubleValue
            h.rangePositions(lowerB, upperB) match {
              case None => (None, 0.0) // empty range: SUM of no rows
              case Some((pa, pb, ia, ib)) if ia == ib =>
                (Some(d(ia) * (pb - pa)), math.abs(d(ia)))
              case Some((pa, pb, ia, ib)) =>
                var interior = BigInt(0)
                var j = ia + 1
                while (j < ib) { interior += bs(j); j += 1 }
                val interiorD = new java.math.BigDecimal(
                  interior.bigInteger, 4).doubleValue
                (Some((interiorD + d(ia) * ((ia + 1).toDouble - pa)) +
                  d(ib) * (pb - ib.toDouble)),
                  math.abs(d(ia)) + math.abs(d(ib)))
            }
        }
        val sumRel = sumEst match {
          case Some(s0) if s0 != 0.0 => sumBoundary / math.abs(s0)
          case Some(_) if sumBoundary > 0.0 => Double.PositiveInfinity
          case _ => 0.0
        }
        val avgEst: Option[Double] =
          if (cntEst > 0.0) sumEst.map(_ / cntEst) else None
        val cols = parts.map {
          case CntOut(n) => lit(cntEst).as(n)
          case SumOut(n, _) =>
            sumEst.map(lit(_)).getOrElse(lit(null).cast("double")).as(n)
          case AvgOut(n, _) =>
            avgEst.map(lit(_)).getOrElse(lit(null).cast("double")).as(n)
          case PctOut(n, _, p) =>
            h.rangePercentile(lowerB, upperB, p)
              .map(lit(_)).getOrElse(lit(null).cast("double")).as(n)
        }
        // the worst output's bound: counts/sums their own ratio, AVG a
        // conservative first-order combination of both, percentiles
        // one bucket width of value error plus the boundary mass's
        // rank-shift fraction
        val err = parts.map {
          case _: CntOut => cntRel
          case _: SumOut => sumRel
          case _: AvgOut => cntRel + sumRel
          case _: PctOut => 1.0 / h.buckets + cntRel
        }.foldLeft(0.0)(math.max)
        Some((spark.range(1).select(cols: _*), err))
      case _ => None
    }
  }

  /** The RELATIVE-error twin of [[storedHistogramRangeAnswer]] for
    * COUNT shapes: `SELECT count(*) FROM t WHERE <range on x>` served
    * from a fresh log-linear "hdr" sketch when no equi-width histogram
    * does — fully covered buckets exact, the (≤2) clipped edge buckets
    * interpolated with their mass as the bound, the zero bucket's point
    * mass charged whenever a range bound sits AT 0 (inclusive vs
    * strict differs by exactly that mass). Count-only: the hdr blob has
    * no sum rider.
    */
  private def storedHdrRangeAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String): Option[(DataFrame, Double)] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    import org.apache.spark.sql.functions.lit
    def litDouble(l: Literal): Option[Double] = l.value match {
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case n: Number                             => Some(n.doubleValue())
      case _                                     => None
    }
    sealed trait HOut { def name: String }
    case class HCnt(name: String) extends HOut
    case class HSum(name: String, col: String) extends HOut
    case class HAvg(name: String, col: String) extends HOut
    case class HPct(name: String, col: String, p: Double) extends HOut
    parsed match {
      case Project(outs, Filter(cond, r: UnresolvedRelation))
          if r.multipartIdentifier.last.equalsIgnoreCase(table) &&
            outs.nonEmpty =>
        val classified = outs.map {
          case Alias(f: UnresolvedFunction, name)
              if !f.isDistinct && f.filter.isEmpty =>
            (f.nameParts.last.toLowerCase, f.arguments) match {
              case ("count", Seq(_: UnresolvedStar)) => Some(HCnt(name))
              case ("count", Seq(Literal(v: Number, _))) if v.intValue == 1 =>
                Some(HCnt(name))
              case ("sum", Seq(a: UnresolvedAttribute)) =>
                Some(HSum(name, a.nameParts.last))
              case ("avg" | "mean", Seq(a: UnresolvedAttribute)) =>
                Some(HAvg(name, a.nameParts.last))
              // percentile RESTRICTED to the range: the log grid's
              // clipped bucket masses bracket the rank —
              // HdrSketch.rangePercentile (the q111 shape with a
              // RELATIVE-error sketch behind it)
              case ("percentile" | "percentile_approx" | "approx_percentile",
                  Seq(a: UnresolvedAttribute, l: Literal)) =>
                litDouble(l).map(p => HPct(name, a.nameParts.last, p))
              case ("median", Seq(a: UnresolvedAttribute)) =>
                Some(HPct(name, a.nameParts.last, 0.5))
              case _ => None
            }
          case _ => None
        }
        if (classified.exists(_.isEmpty)) return None
        val parts = classified.flatten
        val (c, lowerB, upperB) = rangeBounds(cond).getOrElse(return None)
        // SUM/AVG/PERCENTILE serve only over the range column itself
        // (the hdr sketch and its hdrsum rider model exactly that
        // column's distribution)
        if (parts.exists {
          case HSum(_, cc) => !cc.equalsIgnoreCase(c)
          case HAvg(_, cc) => !cc.equalsIgnoreCase(c)
          case HPct(_, cc, _) => !cc.equalsIgnoreCase(c)
          case _           => false
        }) return None
        if (!numericColumn(table, c)) return None
        val sk = catalog.getSketch(table, c, "hdr")
          .filter(sketchIsFresh(table, _))
          .map(s => graft.sketch.HdrSketch.deserialize(s.data))
          .getOrElse(return None)
        val (cntEst, cntBoundary) = sk.rangeCount(lowerB, upperB)
        val cntRel = cntBoundary.toDouble / math.max(1.0, cntEst)
        val needSums = parts.exists {
          case _: HSum | _: HAvg => true
          case _                 => false
        }
        // the hdrsum rider: per-(sign, e, s) exact scale-4 decimal
        // sums — interior buckets add exactly (unscaled addition, one
        // cast), clipped edge buckets contribute their covered
        // fraction, |sum| boundary mass is the bound (the histsum
        // discipline on the log grid)
        val (sumEst, sumRel): (Option[Double], Double) =
          if (!needSums) (None, 0.0)
          else if (!riderInSync(table, c, "hdr", "hdrsum"))
            return None // rider a batch behind the counts: refuse sums
          else {
            val bySums = catalog.getSketch(table, c, "hdrsum")
              .filter(sketchIsFresh(table, _))
              .map(s => graft.sketch.GroupedHll.unpack(s.data)
                .collect { case (Some(k), b) => k -> BigInt(b) }.toMap)
              .getOrElse(return None)
            def sumOf(k: (Int, Int, Int)): BigInt =
              bySums.getOrElse(s"${k._1}:${k._2}:${k._3}", BigInt(0))
            hdrClipSum(sk, lowerB, upperB, sumOf)
          }
        val avgEst: Option[Double] =
          if (cntEst > 0.0) sumEst.map(_ / cntEst) else None
        val cols = parts.map {
          case HCnt(n) => lit(cntEst).as(n)
          case HSum(n, _) =>
            sumEst.map(lit(_)).getOrElse(lit(null).cast("double")).as(n)
          case HAvg(n, _) =>
            avgEst.map(lit(_)).getOrElse(lit(null).cast("double")).as(n)
          case HPct(n, _, p) =>
            sk.rangePercentile(lowerB, upperB, p)
              .map(lit(_)).getOrElse(lit(null).cast("double")).as(n)
        }
        // percentiles: 1/m relative value error plus the boundary
        // mass's rank-shift fraction (the equi-width path's rule with
        // the log grid's relative bound)
        val err = parts.map {
          case _: HCnt => cntRel
          case _: HSum => sumRel
          case _: HAvg => cntRel + sumRel
          case _: HPct => sk.relErrBound + cntRel
        }.foldLeft(0.0)(math.max)
        Some((spark.range(1).select(cols: _*), err))
      case _ => None
    }
  }

  /** Parse `cond` as a conjunction of literal comparisons (>=/>/<=/<,
    * both operand orders) on a SINGLE column — the range-predicate
    * shape behind the histogram range serves and their advisor misses.
    * Some((column, lower, upper)) with at most one bound per side and
    * at least one bound; None on any other conjunct, a second column,
    * or stacked bounds.
    */
  private def rangeBounds(
      cond: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[(String, Option[Double], Option[Double])] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
    def litDouble(l: Literal): Option[Double] = l.value match {
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case n: Number                             => Some(n.doubleValue())
      case _                                     => None
    }
    val sides = conjunctsOf(cond).map {
      case GreaterThanOrEqual(a: UnresolvedAttribute, l: Literal) =>
        litDouble(l).map(v => (a.nameParts.last, true, v))
      case GreaterThan(a: UnresolvedAttribute, l: Literal) =>
        litDouble(l).map(v => (a.nameParts.last, true, v))
      case LessThanOrEqual(a: UnresolvedAttribute, l: Literal) =>
        litDouble(l).map(v => (a.nameParts.last, false, v))
      case LessThan(a: UnresolvedAttribute, l: Literal) =>
        litDouble(l).map(v => (a.nameParts.last, false, v))
      case GreaterThanOrEqual(l: Literal, a: UnresolvedAttribute) =>
        litDouble(l).map(v => (a.nameParts.last, false, v))
      case GreaterThan(l: Literal, a: UnresolvedAttribute) =>
        litDouble(l).map(v => (a.nameParts.last, false, v))
      case LessThanOrEqual(l: Literal, a: UnresolvedAttribute) =>
        litDouble(l).map(v => (a.nameParts.last, true, v))
      case LessThan(l: Literal, a: UnresolvedAttribute) =>
        litDouble(l).map(v => (a.nameParts.last, true, v))
      case _ => None
    }
    if (sides.isEmpty || sides.exists(_.isEmpty)) return None
    val bs = sides.flatten
    if (bs.map(_._1.toLowerCase).distinct.sizeIs != 1) return None
    val lowers = bs.filter(_._2).map(_._3)
    val uppers = bs.filterNot(_._2).map(_._3)
    if (lowers.sizeIs > 1 || uppers.sizeIs > 1) return None
    Some((bs.head._1, lowers.headOption, uppers.headOption))
  }

  /** Whether `c` is a numeric column of `table` — the gate both range
    * serves apply before trusting a histogram over it. */
  private def numericColumn(table: String, c: String): Boolean =
    spark.table(table).schema.fields.exists(fld =>
      fld.name.equalsIgnoreCase(c) &&
        fld.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])

  /** Grouped twin of [[storedHistogramRangeAnswer]]: `SELECT g...,
    * count(*) [, sum(x)/avg(x)/percentile(x, p)...] FROM table WHERE
    * <range on x> GROUP BY g...` answers each RECORDED group's
    * estimate from its own histogram in a fresh `histogram_grouped`
    * blob whose value column is x and group set is the query's —
    * per-group interpolation, zero scan. Percentile outputs (round 10
    * third pass) run the q111 segment rule per group over that
    * group's clipped bucket masses — works on per-group OR shared
    * grids (no cross-group merge happens); they must target the range
    * column itself. SUM/AVG outputs (round 10 fifth pass, the q106
    * arithmetic per group) additionally need the "histsum_grouped"
    * rider the grouped build writes (per-(group, bucket) exact
    * decimal sums): interior buckets add exactly (unscaled decimal
    * addition, one cast to double), boundary buckets contribute their
    * covered fraction, AVG is one division of the two per-group
    * estimates. RESIDUAL equality conjuncts on non-group columns
    * (round 10 fifth pass) dispatch to the COMPOSITE blob keyed by
    * group ∪ residual columns and PRUNE on the residual components —
    * `WHERE a = 'x' AND <range> GROUP BY b` serves from an "a,b"
    * blob, each surviving entry exactly one output group (the
    * residual pins a point, so no cross-group merge happens and
    * per-group grids serve too). Contract: one row per recorded
    * group with estimated
    * in-range mass > 0 (a group with true matches always has mass > 0
    * — its rows' buckets overlap the range — so no group exact
    * execution returns is dropped; extra near-range groups may
    * appear, the approximate-count contract like the global case).
    * The reported error is the WORST group's boundary-mass ratio per
    * output kind (AVG the first-order combination of count and sum),
    * plus one bucket width when percentiles are served. Keys serve
    * typed (keyFieldTypes).
    */
  private def storedGroupedRangeAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String): Option[(DataFrame, Double)] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    def litDouble(l: Literal): Option[Double] = l.value match {
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case n: Number                             => Some(n.doubleValue())
      case _                                     => None
    }
    def attrName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case _                      => None
    }
    parsed match {
      case Aggregate(gs, outs, Filter(cond, r: UnresolvedRelation), _)
          if r.multipartIdentifier.last.equalsIgnoreCase(table) &&
            gs.nonEmpty && gs.forall(_.isInstanceOf[UnresolvedAttribute]) =>
        val gNames = gs.map(_.asInstanceOf[UnresolvedAttribute].nameParts.last)
        val lower = gNames.map(_.toLowerCase)
        // outputs: the group keys plus any mix of count(*), sum(x),
        // avg(x), and percentile(x, p)/median(x) over the RANGE column
        // itself — counts/percentiles read each group's histogram,
        // sums the "histsum_grouped" rider (per-(group, bucket) exact
        // decimal sums, the q106 arithmetic per group)
        sealed trait AggOut
        case object CntA extends AggOut
        case object SumA extends AggOut
        case object AvgA extends AggOut
        case class PctA(p: Double) extends AggOut
        var sawAgg = false
        // every value-anchored aggregate (sum/avg/percentile) must
        // target ONE column — checked against the range column below
        var valCol: Option[String] = None
        def anchor(cc: String): Boolean =
          if (valCol.forall(_.equalsIgnoreCase(cc))) { valCol = Some(cc); true }
          else false
        val parts: Seq[Either[(String, Int), (String, AggOut)]] =
          outs.map {
            case a: UnresolvedAttribute
                if lower.contains(a.nameParts.last.toLowerCase) =>
              Left((a.nameParts.last,
                lower.indexOf(a.nameParts.last.toLowerCase)))
            case Alias(e, name)
                if attrName(e).orElse(exprKeyName(e)).exists(n => lower.contains(n.toLowerCase)) =>
              Left((name, lower.indexOf(attrName(e).orElse(exprKeyName(e)).get.toLowerCase)))
            case Alias(f: UnresolvedFunction, name)
                if f.nameParts.last.equalsIgnoreCase("count") &&
                  !f.isDistinct && f.filter.isEmpty && (f.arguments match {
                    case Seq(Literal(v: Number, _)) => v.intValue == 1
                    case Seq(_: UnresolvedStar)     => true
                    case _                          => false
                  }) =>
              sawAgg = true; Right((name, CntA))
            case Alias(f: UnresolvedFunction, name)
                if !f.isDistinct && f.filter.isEmpty &&
                  Set("sum", "avg", "mean").contains(
                    f.nameParts.last.toLowerCase) =>
              f.arguments match {
                case Seq(a: UnresolvedAttribute)
                    if anchor(a.nameParts.last) =>
                  sawAgg = true
                  Right((name,
                    if (f.nameParts.last.equalsIgnoreCase("sum")) SumA
                    else AvgA))
                case _ => return None
              }
            case Alias(f: UnresolvedFunction, name)
                if !f.isDistinct && f.filter.isEmpty &&
                  Set("percentile", "percentile_approx", "approx_percentile",
                    "median").contains(f.nameParts.last.toLowerCase) =>
              val colP = (f.nameParts.last.toLowerCase, f.arguments) match {
                case ("median", Seq(a: UnresolvedAttribute)) =>
                  Some((a.nameParts.last, 0.5))
                case (_, Seq(a: UnresolvedAttribute, l: Literal)) =>
                  litDouble(l).map(p => (a.nameParts.last, p))
                case _ => None
              }
              colP match {
                case Some((cc, p)) if anchor(cc) =>
                  sawAgg = true; Right((name, PctA(p)))
                case _ => return None
              }
            case _ => return None
          }
        if (!sawAgg ||
            parts.collect { case Left((_, i)) => i }.toSet !=
              gNames.indices.toSet) return None
        // the one-column numeric range parse, now tolerating RESIDUAL
        // equality conjuncts on NON-group columns (round 10 fifth
        // pass): `WHERE a = 'x' AND <range on v> GROUP BY b` looks up
        // the COMPOSITE "b,a" blob and prunes on the a component —
        // each surviving entry is exactly one output group (the
        // residual pins a point, so no cross-group merge happens and
        // per-group grids serve too)
        val conj = conjunctsOf(cond)
        val (cmps, eqsRaw) = conj.partition {
          case _: GreaterThan | _: GreaterThanOrEqual | _: LessThan |
               _: LessThanOrEqual => true
          case _ => false
        }
        if (cmps.isEmpty) return None
        val (c, lowerB, upperB) = rangeBounds(cmps.reduce(
          org.apache.spark.sql.catalyst.expressions.And))
          .getOrElse(return None)
        if (lower.contains(c.toLowerCase)) return None // that's a WHERE on the key
        if (!numericColumn(table, c)) return None
        // sums/averages/percentiles serve only over the range column
        // (the per-group histograms and sum riders model exactly that
        // distribution)
        if (valCol.exists(!_.equalsIgnoreCase(c))) return None
        // each residual conjunct contributes a VALUE LIST: a singleton
        // for an equality, several for an all-literal IN — the entries
        // matching any combination merge per output group below (the
        // cross-group merge needs one grid, guarded at merge time)
        val resid: Seq[(String, Seq[String])] = eqsRaw.map {
          case org.apache.spark.sql.catalyst.expressions.EqualTo(
              a: UnresolvedAttribute, l: Literal) =>
            typedLitKey(table, a.nameParts.last, l)
              .map(v => (a.nameParts.last, Seq(v))).getOrElse(return None)
          case org.apache.spark.sql.catalyst.expressions.EqualTo(
              l: Literal, a: UnresolvedAttribute) =>
            typedLitKey(table, a.nameParts.last, l)
              .map(v => (a.nameParts.last, Seq(v))).getOrElse(return None)
          case org.apache.spark.sql.catalyst.expressions.In(
              a: UnresolvedAttribute, lits)
              if lits.nonEmpty && lits.forall(_.isInstanceOf[Literal]) =>
            typedInListKeys(table, a.nameParts.last, lits)
              .map(vs => (a.nameParts.last, vs)).getOrElse(return None)
          case _ => return None
        }
        val residCols = resid.map(_._1)
        if (residCols.map(_.toLowerCase).distinct.sizeIs != residCols.size)
          return None
        if (residCols.exists(rc => rc.equalsIgnoreCase(c) ||
            lower.contains(rc.toLowerCase))) return None
        val lookupCols = gNames ++ residCols
        val kTypes = keyFieldTypes(table, gNames).getOrElse(return None)
        val needSums = parts.exists {
          case Right((_, SumA | AvgA)) => true
          case _                       => false
        }
        groupedBlobFor(table, c, "histogram_grouped", lookupCols)
          .map { full =>
          // prune on the residual components (typed literal match —
          // any value in each conjunct's list); the serve below emits
          // gs-prefix keys, several residual combinations MERGE per
          // output group (same grid required), and sum lookups use the
          // FULL tuple
          val entries: Seq[(Seq[Option[String]], Array[Byte])] =
            full.collect {
              case (k, b) if resid.zipWithIndex.forall { case ((_, vs), i) =>
                  k(gNames.size + i).exists(vs.contains) } =>
                (k, b)
            }
          // per-group bucket sums (unscaled scale-4 decimals), only
          // when SUM/AVG outputs need them; a missing or stale rider
          // refuses the serve rather than inventing zeros
          val sumsByKey: Map[Seq[Option[String]], Map[Int, BigInt]] =
            if (!needSums) Map.empty
            else if (!riderInSync(table, c, "histogram_grouped",
                "histsum_grouped"))
              return None // rider a batch behind the counts
            else groupedBlobFor(table, c, "histsum_grouped", lookupCols) match {
              case Some(se) => se.map { case (k, inner) =>
                  k -> graft.sketch.GroupedHll.unpack(inner)
                    .collect { case (Some(bk), bb) => bk.toInt -> BigInt(bb) }
                    .toMap
                }.toMap
              case None => return None
            }
          val byPrefix = entries.groupBy(_._1.take(gNames.size)).toSeq
            .sortBy(_._1.map(_.getOrElse("")).mkString("\u0000"))
          val served = byPrefix.flatMap { case (pk, es) =>
            val hs = es.collect { case (_, b) if b.nonEmpty =>
              graft.sketch.Histogram.deserialize(b) }
            if (hs.isEmpty) None // all-NULL cell(s): no row passes the range
            else if (hs.sizeIs > 1 && !hs.forall(h0 => h0.lo == hs.head.lo &&
                h0.width == hs.head.width && h0.buckets == hs.head.buckets))
              return None // multi-cell merge needs ONE (shared) grid
            else {
              val h = hs.reduce(_ merge _)
              val (est, bnd) = h.rangeCount(lowerB, upperB)
              if (est <= 0.0) None
              else {
                val cntRel = bnd / math.max(1.0, est)
                val (sumEst, sumBnd): (Option[Double], Double) =
                  if (!needSums) (None, 0.0)
                  else {
                    // riders of the merged cells add EXACTLY (BigInt)
                    var bs = Map.empty[Int, BigInt]
                    es.foreach { case (k, b) =>
                      if (b.nonEmpty) sumsByKey.get(k) match {
                        case None => return None // rider lacks a cell
                        // a cell with in-range mass but an EMPTY sum
                        // map is the streaming overflow poison —
                        // refuse rather than serve a silent zero
                        case Some(m) if m.isEmpty => return None
                        case Some(m) => m.foreach { case (i, v0) =>
                          bs = bs.updated(i, bs.getOrElse(i, BigInt(0)) + v0)
                        }
                      }
                    }
                    def d(i: Int): Double = new java.math.BigDecimal(
                      bs.getOrElse(i, BigInt(0)).bigInteger, 4).doubleValue
                    h.rangePositions(lowerB, upperB) match {
                      case None => (None, 0.0)
                      case Some((pa, pb, ia, ib)) if ia == ib =>
                        (Some(d(ia) * (pb - pa)), math.abs(d(ia)))
                      case Some((pa, pb, ia, ib)) =>
                        var interior = BigInt(0)
                        var j = ia + 1
                        while (j < ib) {
                          interior += bs.getOrElse(j, BigInt(0)); j += 1
                        }
                        val interiorD = new java.math.BigDecimal(
                          interior.bigInteger, 4).doubleValue
                        (Some((interiorD +
                          d(ia) * ((ia + 1).toDouble - pa)) +
                          d(ib) * (pb - ib.toDouble)),
                          math.abs(d(ia)) + math.abs(d(ib)))
                    }
                  }
                val sumRel = sumEst match {
                  case Some(s0) if s0 != 0.0 => sumBnd / math.abs(s0)
                  case Some(_) if sumBnd > 0.0 => Double.PositiveInfinity
                  case _ => 0.0
                }
                Some((pk, h, est, cntRel, sumEst, sumRel))
              }
            }
          }
          val rows = served.map { case (k, h, est, _, sumEst, _) =>
            org.apache.spark.sql.Row.fromSeq(parts.map {
              case Left((_, i))        => typedKeyValue(kTypes(i), k(i))
              case Right((_, CntA))    => Double.box(est)
              case Right((_, SumA))    => sumEst.map(Double.box).orNull
              case Right((_, AvgA))    =>
                sumEst.map(s => Double.box(s / est)).orNull
              case Right((_, PctA(p))) =>
                h.rangePercentile(lowerB, upperB, p)
                  .map(Double.box).orNull
            })
          }
          val schema = StructType(parts.map {
            case Left((n, i)) => StructField(n, kTypes(i), nullable = true)
            case Right((n, a)) =>
              StructField(n, DoubleType, nullable = a != CntA)
          })
          import scala.jdk.CollectionConverters._
          val maxCnt = served.map(_._4).foldLeft(0.0)(math.max)
          val maxSum = served.map(_._6).foldLeft(0.0)(math.max)
          val bucketTerm = parts.collectFirst {
            case Right((_, PctA(_))) => served.map { case (_, h, _, _, _, _) =>
              1.0 / h.buckets }.foldLeft(0.0)(math.max)
          }.getOrElse(0.0)
          val err = parts.map {
            case Right((_, CntA))    => maxCnt
            case Right((_, SumA))    => maxSum
            case Right((_, AvgA))    => maxCnt + maxSum
            case Right((_, PctA(_))) => bucketTerm + maxCnt
            case Left(_)             => 0.0
          }.foldLeft(0.0)(math.max)
          (spark.createDataFrame(rows.asJava, schema), err)
        }
      case _ => None
    }
  }

  /** [[storedGroupedRangeAnswer]]'s RELATIVE-error twin: `SELECT g...,
    * count(*) [, sum(x)/avg(x)/percentile(x, p)...] FROM t WHERE
    * <range on x> GROUP BY g...` from a fresh "hdr_grouped" blob when
    * no grouped equi-width histogram serves — per-group clip counts
    * (HdrSketch.rangeCount) and range percentiles
    * (HdrSketch.rangePercentile), 1/m-RELATIVE on any magnitude.
    * SUM/AVG read the "hdrsum_grouped" rider the build writes
    * (per-(group, log-bucket) exact decimal sums): interior buckets
    * add exactly, clipped edge buckets scale by the covered fraction,
    * AVG is one division — the q148 arithmetic per group. Residual
    * equality/IN conjuncts prune the composite blob, and because the
    * log grid is global, surviving cells of one output group — and
    * full MARGINAL collapses — merge EXACTLY (the shared-grid
    * requirement the equi-width twin imposes does not exist here);
    * rider cells pair with sketch cells so the empty-pack overflow
    * POISON refuses sums while counts keep serving, and all-NULL
    * cells (empty sketches) are never consulted. SUM/AVG require the
    * exact key-set blob (a SUPERSET blob's marginal keeps serving
    * counts/percentiles only). Same row contract as the equi-width
    * twin: one row per recorded group with positive in-range mass.
    */
  private def storedGroupedHdrRangeAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String): Option[(DataFrame, Double)] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    def litDouble(l: Literal): Option[Double] = l.value match {
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case n: Number                             => Some(n.doubleValue())
      case _                                     => None
    }
    def attrName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case _                      => None
    }
    parsed match {
      case Aggregate(gs, outs, Filter(cond, r: UnresolvedRelation), _)
          if r.multipartIdentifier.last.equalsIgnoreCase(table) &&
            gs.nonEmpty && gs.forall(_.isInstanceOf[UnresolvedAttribute]) =>
        val gNames = gs.map(_.asInstanceOf[UnresolvedAttribute].nameParts.last)
        val lower = gNames.map(_.toLowerCase)
        sealed trait AggOut
        case object CntA extends AggOut
        case object SumA extends AggOut
        case object AvgA extends AggOut
        case class PctA(p: Double) extends AggOut
        var sawAgg = false
        var valCol: Option[String] = None
        def anchor(cc: String): Boolean =
          if (valCol.forall(_.equalsIgnoreCase(cc))) { valCol = Some(cc); true }
          else false
        val parts: Seq[Either[(String, Int), (String, AggOut)]] =
          outs.map {
            case a: UnresolvedAttribute
                if lower.contains(a.nameParts.last.toLowerCase) =>
              Left((a.nameParts.last,
                lower.indexOf(a.nameParts.last.toLowerCase)))
            case Alias(e, name)
                if attrName(e).orElse(exprKeyName(e)).exists(n => lower.contains(n.toLowerCase)) =>
              Left((name, lower.indexOf(attrName(e).orElse(exprKeyName(e)).get.toLowerCase)))
            case Alias(f: UnresolvedFunction, name)
                if f.nameParts.last.equalsIgnoreCase("count") &&
                  !f.isDistinct && f.filter.isEmpty && (f.arguments match {
                    case Seq(Literal(v: Number, _)) => v.intValue == 1
                    case Seq(_: UnresolvedStar)     => true
                    case _                          => false
                  }) =>
              sawAgg = true; Right((name, CntA))
            case Alias(f: UnresolvedFunction, name)
                if !f.isDistinct && f.filter.isEmpty &&
                  Set("sum", "avg", "mean").contains(
                    f.nameParts.last.toLowerCase) =>
              f.arguments match {
                case Seq(a: UnresolvedAttribute)
                    if anchor(a.nameParts.last) =>
                  sawAgg = true
                  Right((name,
                    if (f.nameParts.last.equalsIgnoreCase("sum")) SumA
                    else AvgA))
                case _ => return None
              }
            case Alias(f: UnresolvedFunction, name)
                if !f.isDistinct && f.filter.isEmpty &&
                  Set("percentile", "percentile_approx", "approx_percentile",
                    "median").contains(f.nameParts.last.toLowerCase) =>
              val colP = (f.nameParts.last.toLowerCase, f.arguments) match {
                case ("median", Seq(a: UnresolvedAttribute)) =>
                  Some((a.nameParts.last, 0.5))
                case (_, Seq(a: UnresolvedAttribute, l: Literal)) =>
                  litDouble(l).map(p => (a.nameParts.last, p))
                case _ => None
              }
              colP match {
                case Some((cc, p)) if anchor(cc) =>
                  sawAgg = true; Right((name, PctA(p)))
                case _ => return None
              }
            case _ => return None
          }
        if (!sawAgg ||
            parts.collect { case Left((_, i)) => i }.toSet !=
              gNames.indices.toSet) return None
        val conj = conjunctsOf(cond)
        val (cmps, eqsRaw) = conj.partition {
          case _: GreaterThan | _: GreaterThanOrEqual | _: LessThan |
               _: LessThanOrEqual => true
          case _ => false
        }
        if (cmps.isEmpty) return None
        val (c, lowerB, upperB) = rangeBounds(cmps.reduce(
          org.apache.spark.sql.catalyst.expressions.And))
          .getOrElse(return None)
        if (lower.contains(c.toLowerCase)) return None
        if (!numericColumn(table, c)) return None
        if (valCol.exists(!_.equalsIgnoreCase(c))) return None
        val resid: Seq[(String, Seq[String])] = eqsRaw.map {
          case org.apache.spark.sql.catalyst.expressions.EqualTo(
              a: UnresolvedAttribute, l: Literal) =>
            typedLitKey(table, a.nameParts.last, l)
              .map(v => (a.nameParts.last, Seq(v))).getOrElse(return None)
          case org.apache.spark.sql.catalyst.expressions.EqualTo(
              l: Literal, a: UnresolvedAttribute) =>
            typedLitKey(table, a.nameParts.last, l)
              .map(v => (a.nameParts.last, Seq(v))).getOrElse(return None)
          case org.apache.spark.sql.catalyst.expressions.In(
              a: UnresolvedAttribute, lits)
              if lits.nonEmpty && lits.forall(_.isInstanceOf[Literal]) =>
            typedInListKeys(table, a.nameParts.last, lits)
              .map(vs => (a.nameParts.last, vs)).getOrElse(return None)
          case _ => return None
        }
        val residCols = resid.map(_._1)
        if (residCols.map(_.toLowerCase).distinct.sizeIs != residCols.size)
          return None
        if (residCols.exists(rc => rc.equalsIgnoreCase(c) ||
            lower.contains(rc.toLowerCase))) return None
        val lookupCols = gNames ++ residCols
        val kTypes = keyFieldTypes(table, gNames).getOrElse(return None)
        val needSums = parts.exists {
          case Right((_, SumA | AvgA)) => true
          case _                       => false
        }
        // exact key-set match first; a SUPERSET composite blob also
        // serves — the unreferenced components collapse exactly on
        // the global log grid (partialGroupedBlobFor's marginal rule).
        // SUM/AVG need the rider's cells PAIRED with sketch cells to
        // tell overflow poison from all-NULL, so they require the
        // exact-set blob.
        val exactBlob = groupedBlobFor(table, c, "hdr_grouped", lookupCols)
        val blob =
          if (needSums) exactBlob
          else exactBlob.orElse(partialGroupedBlobFor(table, c,
            "hdr_grouped", lookupCols, Nil, hdrMergeBytes))
        blob.map { full =>
          // per-cell rider packs (inner key "sg:e:s" -> unscaled
          // scale-4 decimal bytes; None = the "!" overflow-poison
          // sentinel); a missing or batch-behind rider with SUM/AVG
          // outputs refuses
          val sumsByKey: Map[Seq[Option[String]],
              Option[Map[(Int, Int, Int), BigInt]]] =
            if (!needSums) Map.empty
            else if (!riderInSync(table, c, "hdr_grouped",
                "hdrsum_grouped"))
              return None // rider a batch behind the counts
            else groupedBlobFor(table, c, "hdrsum_grouped", lookupCols) match {
              case Some(se) => se.map { case (k, inner) =>
                  val entries = graft.sketch.GroupedHll.unpack(inner)
                  if (entries.exists(_._1.contains(
                      graft.sketch.SketchOps.HdrSumPoisonKey)))
                    k -> None // per-group overflow poison
                  else k -> Some(entries.map {
                    case (Some(kk), bb) => kk.split(":") match {
                      case Array(sg, e0, s0) =>
                        (sg.toInt, e0.toInt, s0.toInt) -> BigInt(bb)
                      case _ => return None
                    }
                    case _ => return None
                  }.toMap)
                }.toMap
              case None => return None
            }
          val entries: Seq[(Seq[Option[String]], Array[Byte])] =
            full.collect {
              case (k, b) if resid.zipWithIndex.forall { case ((_, vs), i) =>
                  k(gNames.size + i).exists(vs.contains) } =>
                (k, b)
            }
          val byPrefix = entries.groupBy(_._1.take(gNames.size)).toSeq
            .sortBy(_._1.map(_.getOrElse("")).mkString(" "))
          var relBound = 0.0
          val served = byPrefix.flatMap { case (pk, es) =>
            val merged = es.map(_._2).reduce(hdrMergeBytes)
            if (merged.isEmpty) None // all-NULL cell(s): no row passes
            else {
              val sk = graft.sketch.HdrSketch.deserialize(merged)
              relBound = math.max(relBound, sk.relErrBound)
              val (est, bnd) = sk.rangeCount(lowerB, upperB)
              if (est <= 0.0) {
                // boundary-ONLY mass (e.g. the zero bucket sitting AT
                // a range bound): the truth may include this group, so
                // dropping the row would silently understate the result
                // AND its error — refuse the whole serve to the scan,
                // exactly like the global twin's bnd/max(1,0) blow-up
                if (bnd > 0L) return None
                None // genuinely no covered mass: exact returns no row
              }
              else {
                // riders of the in-play cells add EXACTLY (BigInt); a
                // missing rider cell or the overflow-poison sentinel
                // under a massy sketch refuses rather than serving a
                // silent zero (an EMPTY rider map is a legitimate
                // all-zero-valued cell — every nonzero-bucket sum is 0)
                val (sumEst, sumRel): (Option[Double], Double) =
                  if (!needSums) (None, 0.0)
                  else {
                    var bs = Map.empty[(Int, Int, Int), BigInt]
                    es.foreach { case (k, b) =>
                      if (b.nonEmpty) sumsByKey.get(k) match {
                        case None       => return None // rider lacks the cell
                        case Some(None) => return None // overflow poison
                        case Some(Some(m0)) => m0.foreach { case (kk, v0) =>
                          bs = bs.updated(kk,
                            bs.getOrElse(kk, BigInt(0)) + v0)
                        }
                      }
                    }
                    hdrClipSum(sk, lowerB, upperB,
                      kk => bs.getOrElse(kk, BigInt(0)))
                  }
                Some((pk, sk, est, bnd.toDouble / math.max(1.0, est),
                  sumEst, sumRel))
              }
            }
          }
          val rows = served.map { case (k, sk, est, _, sumEst, _) =>
            org.apache.spark.sql.Row.fromSeq(parts.map {
              case Left((_, i))        => typedKeyValue(kTypes(i), k(i))
              case Right((_, CntA))    => Double.box(est)
              case Right((_, SumA))    => sumEst.map(Double.box).orNull
              case Right((_, AvgA))    =>
                sumEst.map(s0 => Double.box(s0 / est)).orNull
              case Right((_, PctA(p))) =>
                sk.rangePercentile(lowerB, upperB, p)
                  .map(Double.box).orNull
            })
          }
          val schema = StructType(parts.map {
            case Left((n, i)) => StructField(n, kTypes(i), nullable = true)
            case Right((n, a)) =>
              StructField(n, DoubleType, nullable = a != CntA)
          })
          import scala.jdk.CollectionConverters._
          val maxCnt = served.map(_._4).foldLeft(0.0)(math.max)
          val maxSum = served.map(_._6).foldLeft(0.0)(math.max)
          val err = parts.map {
            case Right((_, CntA))    => maxCnt
            case Right((_, SumA))    => maxSum
            case Right((_, AvgA))    => maxCnt + maxSum
            case Right((_, PctA(_))) => relBound + maxCnt
            case Left(_)             => 0.0
          }.foldLeft(0.0)(math.max)
          (spark.createDataFrame(rows.asJava, schema), err)
        }
      case _ => None
    }
  }

  /** FILTERED-range serve (round 10 fifth pass): `SELECT count(*) /
    * sum(v) / avg(v) / percentile(v, p) FROM t WHERE g = 'x' [AND h =
    * 'y' ...] AND <range on v>` — the dashboard shape that mixes a
    * group filter with a numeric band. The predicate splits into
    * equality conjuncts on distinct group columns (or ONE all-literal
    * IN list on a single column) plus the usual one-column range; the
    * named group(s)' histograms in the `histogram_grouped` blob keyed
    * by exactly those columns answer by the global range arithmetic —
    * counts from clipped bucket masses, sums from the histsum_grouped
    * rider (interior exact decimal addition, boundary fractional),
    * percentiles by the q111 segment rule. IN-lists merge several
    * groups first: bucket counts add and rider sums add EXACTLY, but
    * only on a shared grid (differing per-group grids refuse, like
    * every other cross-group merge). Literals naming no recorded
    * group contribute zero rows — the same empty answer exact
    * execution returns (count 0, SUM/AVG/percentile NULL). Error =
    * the merged boundary-mass ratios per output kind, plus one bucket
    * width for percentiles.
    */
  private def storedFilteredRangeAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String): Option[(DataFrame, Double)] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{Alias, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    import org.apache.spark.sql.functions.lit
    def litDouble(l: Literal): Option[Double] = l.value match {
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case n: Number                             => Some(n.doubleValue())
      case _                                     => None
    }
    sealed trait ROut { def name: String }
    case class CntOut(name: String) extends ROut
    case class SumOut(name: String, col: String) extends ROut
    case class AvgOut(name: String, col: String) extends ROut
    case class PctOut(name: String, col: String, p: Double) extends ROut
    parsed match {
      case Project(outs, Filter(cond, r: UnresolvedRelation))
          if r.multipartIdentifier.last.equalsIgnoreCase(table) &&
            outs.nonEmpty =>
        val classified = outs.map {
          case Alias(f: UnresolvedFunction, name)
              if !f.isDistinct && f.filter.isEmpty =>
            (f.nameParts.last.toLowerCase, f.arguments) match {
              case ("count", Seq(Literal(v: Number, _))) if v.intValue == 1 =>
                Some(CntOut(name))
              case ("count", Seq(_: UnresolvedStar)) => Some(CntOut(name))
              case ("sum", Seq(a: UnresolvedAttribute)) =>
                Some(SumOut(name, a.nameParts.last))
              case ("avg" | "mean", Seq(a: UnresolvedAttribute)) =>
                Some(AvgOut(name, a.nameParts.last))
              case ("percentile" | "percentile_approx" | "approx_percentile",
                  Seq(a: UnresolvedAttribute, l: Literal)) =>
                litDouble(l).map(p => PctOut(name, a.nameParts.last, p))
              case ("median", Seq(a: UnresolvedAttribute)) =>
                Some(PctOut(name, a.nameParts.last, 0.5))
              case _ => None
            }
          case _ => None
        }
        if (classified.exists(_.isEmpty)) return None
        val parts = classified.flatten
        // split the conjunction: comparisons (the range) vs equality /
        // IN conjuncts (the group filter); anything else refuses
        val conj = conjunctsOf(cond)
        def isCmp(e: Expression): Boolean = e match {
          case _: GreaterThan | _: GreaterThanOrEqual | _: LessThan |
               _: LessThanOrEqual => true
          case _ => false
        }
        val (cmps, eqsRaw) = conj.partition(isCmp)
        if (cmps.isEmpty || eqsRaw.isEmpty) return None
        val (c, lowerB, upperB) = rangeBounds(
          cmps.reduce(org.apache.spark.sql.catalyst.expressions.And))
          .getOrElse(return None)
        if (!numericColumn(table, c)) return None
        // value-anchored outputs must target the range column
        val vCols = parts.collect {
          case SumOut(_, cc) => cc
          case AvgOut(_, cc) => cc
          case PctOut(_, cc, _) => cc
        }
        if (vCols.exists(!_.equalsIgnoreCase(c))) return None
        // group filter: distinct-column equalities (one composite key)
        // or ONE IN list (several single-column keys)
        val colKeys: (Seq[String], Seq[Seq[Option[String]]]) = eqsRaw match {
          case Seq(In(a: UnresolvedAttribute, lits)) =>
            typedInListKeys(table, a.nameParts.last, lits)
              .map(ks => (Seq(a.nameParts.last), ks.map(k => Seq(Some(k)))))
              .getOrElse(return None)
          case es =>
            val parsedEqs = es.map {
              case EqualTo(a: UnresolvedAttribute, l: Literal) =>
                typedLitKey(table, a.nameParts.last, l)
                  .map((a.nameParts.last, _))
              case EqualTo(l: Literal, a: UnresolvedAttribute) =>
                typedLitKey(table, a.nameParts.last, l)
                  .map((a.nameParts.last, _))
              case _ => None
            }
            if (parsedEqs.exists(_.isEmpty)) return None
            val flat = parsedEqs.flatten
            val cols = flat.map(_._1)
            if (cols.map(_.toLowerCase).distinct.sizeIs != cols.size)
              return None // a column equated twice
            if (cols.exists(_.equalsIgnoreCase(c))) return None
            (cols, Seq(flat.map(e => Some(e._2))))
        }
        val (gCols, selKeys) = colKeys
        if (gCols.exists(_.equalsIgnoreCase(c))) return None
        val needSums = parts.exists {
          case _: SumOut | _: AvgOut => true
          case _                     => false
        }
        groupedBlobFor(table, c, "histogram_grouped", gCols).flatMap { entries =>
          val m = entries.toMap
          val selected = selKeys.flatMap(k => m.get(k).map(k -> _))
          val hs = selected.collect { case (_, b) if b.nonEmpty =>
            graft.sketch.Histogram.deserialize(b) }
          // 2+ groups merge only on a shared grid (counts add; the
          // rider's sums add on the same buckets)
          if (hs.sizeIs > 1 && !hs.forall(h => h.lo == hs.head.lo &&
              h.width == hs.head.width && h.buckets == hs.head.buckets))
            return None
          val sums: Map[Int, BigInt] =
            if (!needSums || hs.isEmpty) Map.empty
            else if (!riderInSync(table, c, "histogram_grouped",
                "histsum_grouped"))
              return None // rider a batch behind the counts
            else groupedBlobFor(table, c, "histsum_grouped", gCols) match {
              case None => return None
              case Some(se) =>
                val sm = se.toMap
                var acc = Map.empty[Int, BigInt]
                selected.foreach { case (k, b) =>
                  if (b.nonEmpty) sm.get(k) match {
                    case None => return None // rider lacks the group
                    case Some(inner) =>
                      val im = graft.sketch.GroupedHll.unpack(inner)
                        .collect { case (Some(bk), bb) =>
                          bk.toInt -> BigInt(bb) }.toMap
                      if (im.isEmpty) return None // overflow poison
                      im.foreach { case (i, v0) =>
                        acc = acc.updated(i, acc.getOrElse(i, BigInt(0)) + v0)
                      }
                  }
                }
                acc
            }
          val hOpt = hs.reduceOption(_ merge _)
          val (cntEst, cntRel) = hOpt match {
            case None => (0.0, 0.0) // no recorded group: zero rows
            case Some(h) =>
              val (est, bnd) = h.rangeCount(lowerB, upperB)
              (est, bnd / math.max(1.0, est))
          }
          val (sumEst, sumBnd): (Option[Double], Double) = hOpt match {
            case Some(h) if needSums =>
              def d(i: Int): Double = new java.math.BigDecimal(
                sums.getOrElse(i, BigInt(0)).bigInteger, 4).doubleValue
              h.rangePositions(lowerB, upperB) match {
                case None => (None, 0.0)
                case Some((pa, pb, ia, ib)) if ia == ib =>
                  (Some(d(ia) * (pb - pa)), math.abs(d(ia)))
                case Some((pa, pb, ia, ib)) =>
                  var interior = BigInt(0)
                  var j = ia + 1
                  while (j < ib) {
                    interior += sums.getOrElse(j, BigInt(0)); j += 1
                  }
                  val interiorD = new java.math.BigDecimal(
                    interior.bigInteger, 4).doubleValue
                  (Some((interiorD + d(ia) * ((ia + 1).toDouble - pa)) +
                    d(ib) * (pb - ib.toDouble)),
                    math.abs(d(ia)) + math.abs(d(ib)))
              }
            case _ => (None, 0.0)
          }
          val sumRel = sumEst match {
            case Some(s0) if s0 != 0.0 => sumBnd / math.abs(s0)
            case Some(_) if sumBnd > 0.0 => Double.PositiveInfinity
            case _ => 0.0
          }
          val avgEst: Option[Double] =
            if (cntEst > 0.0) sumEst.map(_ / cntEst) else None
          val cols = parts.map {
            case CntOut(n) => lit(cntEst).as(n)
            case SumOut(n, _) =>
              sumEst.map(lit(_)).getOrElse(lit(null).cast("double")).as(n)
            case AvgOut(n, _) =>
              avgEst.map(lit(_)).getOrElse(lit(null).cast("double")).as(n)
            case PctOut(n, _, p) =>
              hOpt.flatMap(_.rangePercentile(lowerB, upperB, p))
                .map(lit(_)).getOrElse(lit(null).cast("double")).as(n)
          }
          val bucketTerm =
            if (parts.exists(_.isInstanceOf[PctOut]))
              hOpt.map(h => 1.0 / h.buckets).getOrElse(0.0)
            else 0.0
          val err = parts.map {
            case _: CntOut => cntRel
            case _: SumOut => sumRel
            case _: AvgOut => cntRel + sumRel
            case _: PctOut => bucketTerm + cntRel
          }.foldLeft(0.0)(math.max)
          Some((spark.range(1).select(cols: _*), err))
        }
      case _ => None
    }
  }

  /** If the query is a bare global aggregate over `table` whose every
    * output is MIN/MAX/COUNT/SUM/AVG of a column carrying a fresh
    * stored histogram with recorded build statistics (min/max/nnull/
    * sum4 in params — SketchOps.createHistogram since round 8), answer
    * ALL of them from the catalog — zero scan, zero error (exact as of
    * sketch build; the freshness guard retires stale stats). COUNT(*)
    * is answered from the recorded table rowcount but only RIDES ALONG
    * with at least one column-anchored statistic: a lone `SELECT
    * count(*)` keeps its sampling semantics (and its bench window).
    * AVG is served as sum4/nnull — one double division of two recorded
    * exacts, the same bit-portable form the oracle derives.
    */
  private def storedStatsAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String): Option[DataFrame] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.functions.lit
    val minRe = """"min"\s*:\s*([^,}]+)""".r
    val maxRe = """"max"\s*:\s*([^,}]+)""".r
    val nnullRe = """"nnull"\s*:\s*(\d+)""".r
    val sum4Re = """"sum4"\s*:\s*([^,}]+)""".r
    // sx: build-time proof the recorded doubles round-trip the column's
    // exact values (SketchOps.createHistogram) — without it the "no
    // scan, exact" label would be a lie for bigints beyond 2^53 or wide
    // decimals. sx gates MIN/MAX/SUM/AVG; COUNT serves regardless (the
    // recorded nnull/rows are exact longs whatever the column type).
    val sxRe = """"sx"\s*:\s*true""".r
    case class Stats(min: Double, max: Double, nnull: Long,
        sum4: Option[Double], rows: Long, sx: Boolean)
    def statsFor(c: String): Option[Stats] =
      catalog.getSketch(table, c, "histogram")
        .filter(sketchIsFresh(table, _))
        .flatMap { s =>
          for {
            mn <- minRe.findFirstMatchIn(s.parameters)
            mx <- maxRe.findFirstMatchIn(s.parameters)
            nn <- nnullRe.findFirstMatchIn(s.parameters)
            rw <- sketchRowsRe.findFirstMatchIn(s.parameters)
          } yield Stats(
            java.lang.Double.parseDouble(mn.group(1)),
            java.lang.Double.parseDouble(mx.group(1)),
            nn.group(1).toLong,
            sum4Re.findFirstMatchIn(s.parameters)
              .map(m => java.lang.Double.parseDouble(m.group(1))),
            rw.group(1).toLong,
            sxRe.findFirstMatchIn(s.parameters).isDefined)
        }
    def isCountStar(args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Boolean =
      args match {
        case Seq(_: UnresolvedStar) => true
        case Seq(Literal(v: Number, _)) => v.intValue == 1
        case _ => false
      }
    parsed match {
      case Project(outs, r: UnresolvedRelation)
          if r.multipartIdentifier.last.equalsIgnoreCase(table) =>
        // Left(name -> column answer), rides = count(*) outputs
        var anchored = 0
        var countStars = List.empty[String]
        val answered = outs.map {
          case Alias(f: UnresolvedFunction, name)
              if !f.isDistinct && f.filter.isEmpty =>
            (f.nameParts.last.toLowerCase, f.arguments) match {
              case ("count", args) if isCountStar(args) =>
                countStars ::= name
                Some(None) // resolved later from any anchored sketch
              case (fn, Seq(a: UnresolvedAttribute))
                  if Set("min", "max", "count", "sum", "avg", "mean")(fn) =>
                statsFor(a.nameParts.last)
                  // COUNT needs no exactness proof; everything else
                  // serves only under the build-time sx flag (and a
                  // recorded sum, which an overflowed build omits)
                  .filter(st => fn == "count" ||
                    (st.sx && (Set("min", "max")(fn) || st.sum4.isDefined)))
                  .map { st =>
                    anchored += 1
                    Some(name -> (fn match {
                      case "min"          => lit(st.min)
                      case "max"          => lit(st.max)
                      case "count"        => lit(st.nnull)
                      case "sum"          => lit(st.sum4.get)
                      case "avg" | "mean" => lit(st.sum4.get / st.nnull.toDouble)
                    }))
                  }
              case _ => None
            }
          case _ => None
        }
        if (answered.exists(_.isEmpty) || anchored == 0) return None
        // count(*) rides from the rows recorded by any consulted fresh
        // sketch (freshness pins them all to the same base rowcount)
        val rows = outs.collectFirst {
          case Alias(f: UnresolvedFunction, _)
              if !f.isDistinct && f.filter.isEmpty &&
                !isCountStar(f.arguments) =>
            f.arguments.collectFirst { case a: UnresolvedAttribute =>
              statsFor(a.nameParts.last).map(_.rows)
            }.flatten
        }.flatten
        if (countStars.nonEmpty && rows.isEmpty) return None
        val cols = outs.zip(answered).map {
          case (_, Some(Some((n, c)))) => c.as(n)
          case (o, Some(None)) =>
            lit(rows.get).as(o.asInstanceOf[Alias].name)
          case _ => return None
        }
        Some(spark.range(1).select(cols: _*))
      case _ => None
    }
  }

  /** A dispatchable predicate on a grouped blob's (single) group-key
    * component. `KeyIn` holds the typed literal renderings of an
    * equality / IN-list filter; `KeyLongRange` a comparison range over
    * an INTEGRAL group column, evaluated on the key parsed back
    * through the bijective cast-to-string (the typed-key contract) —
    * so pruning recorded keys by the predicate selects EXACTLY the
    * groups exact execution would keep. A NULL key component never
    * matches either form (SQL comparison semantics: `g = lit`,
    * `g IN (...)`, and `g >= lit` are all UNKNOWN on NULL).
    */
  private[engine] sealed trait KeyPred {
    def matches(k: Option[String]): Boolean
  }
  private case class KeyIn(keys: Seq[String]) extends KeyPred {
    override def matches(k: Option[String]): Boolean = k.exists(keys.contains)
  }
  private case class KeyLongRange(
      lo: Option[(Long, Boolean)], hi: Option[(Long, Boolean)],
      decode: String => Option[Long])
      extends KeyPred {
    override def matches(k: Option[String]): Boolean =
      k.flatMap(decode).exists { v =>
        lo.forall { case (b, inc) => if (inc) v >= b else v > b } &&
        hi.forall { case (b, inc) => if (inc) v <= b else v < b }
      }
  }

  /** A comparison literal against a group-key column, widened to the
    * column's Long ORDINAL — the pairings where comparing the
    * parsed-back key against the literal is exactly the column
    * comparison: integral-on-integral (the value itself); a TIMESTAMP
    * literal (Catalyst stores epoch micros) or an ISO date / datetime
    * STRING literal against a timestamp column (micros in the session
    * zone — exactly the cast ANSI comparison applies); a DATE literal
    * (epoch days) or ISO date string against a date column. Free-form
    * strings, floats, and cross-type pairings refuse.
    */
  /** Data type of a group-key spec — a schema column, or (round 10)
    * an EXPRESSION key resolved by analysis (to_date(ts) -> DATE), so
    * key-range dispatch covers the time-bucket keys too.
    */
  private def keyColumnType(table: String, column: String)
      : Option[org.apache.spark.sql.types.DataType] =
    scala.util.Try(spark.table(table).schema
      .find(_.name.equalsIgnoreCase(column)).map(_.dataType)).toOption
      .flatten
      .orElse(scala.util.Try(
        spark.table(table).selectExpr(column).schema.head.dataType).toOption)

  private def keyOrdinalLit(table: String, column: String,
      l: org.apache.spark.sql.catalyst.expressions.Literal): Option[Long] = {
    import org.apache.spark.sql.types._
    val dt = keyColumnType(table, column)
    def sessionMicros(s: String): Option[Long] = scala.util.Try {
      val zone = java.time.ZoneId.of(
        spark.sessionState.conf.sessionLocalTimeZone)
      val ldt =
        if (s.contains(" ") || s.contains("T"))
          java.time.LocalDateTime.parse(s.replaceFirst(" ", "T"))
        else java.time.LocalDate.parse(s).atStartOfDay()
      val i = ldt.atZone(zone).toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }.toOption
    (dt, l.value) match {
      case (Some(ByteType | ShortType | IntegerType | LongType),
            n @ (_: java.lang.Integer | _: java.lang.Long |
                 _: java.lang.Short | _: java.lang.Byte)) =>
        Some(n.asInstanceOf[Number].longValue())
      case (Some(TimestampType), micros: java.lang.Long)
          if l.dataType == TimestampType =>
        Some(micros)
      case (Some(TimestampType), s: org.apache.spark.unsafe.types.UTF8String)
          if l.dataType == StringType =>
        sessionMicros(s.toString)
      case (Some(DateType), days: java.lang.Integer)
          if l.dataType == DateType =>
        Some(days.toLong)
      case (Some(DateType), s: org.apache.spark.unsafe.types.UTF8String)
          if l.dataType == StringType =>
        scala.util.Try(
          java.time.LocalDate.parse(s.toString).toEpochDay).toOption
      case _ => None
    }
  }

  /** The key-string decoder matching [[keyOrdinalLit]]'s ordinal space
    * for a group-key column: parsed-back integral value; epoch days
    * for dates; session-zone epoch micros for timestamps. None for
    * types key ranges don't dispatch on.
    */
  private def keyOrdinalDecoder(table: String, column: String)
      : Option[String => Option[Long]] = {
    import org.apache.spark.sql.types._
    val dt = keyColumnType(table, column)
    dt.collect {
      case ByteType | ShortType | IntegerType | LongType =>
        (s: String) => scala.util.Try(s.toLong).toOption
      case DateType =>
        (s: String) => scala.util.Try(
          java.sql.Date.valueOf(s).toLocalDate.toEpochDay).toOption
      // timestamp ordinals share the serve gate: in a DST zone the
      // local rendering is ambiguous, so range pruning on parsed-back
      // micros could keep/drop the wrong instant — no decoder, the
      // whole key-range dispatch refuses to the scan
      case TimestampType if sessionZoneFixedOffset =>
        (s: String) => scala.util.Try {
          val zone = java.time.ZoneId.of(
            spark.sessionState.conf.sessionLocalTimeZone)
          val i = java.time.LocalDateTime.parse(s.replaceFirst(" ", "T"))
            .atZone(zone).toInstant
          i.getEpochSecond * 1000000L + i.getNano / 1000L
        }.toOption
    }
  }

  /** Parse a conjunction of >=/>/<=/< comparisons between the single
    * group column and integral / date / timestamp literals (widened
    * to the column's Long ordinal) into a [[KeyLongRange]] —
    * `WHERE g BETWEEN a AND b` (which the parser lowers to two
    * comparisons), one-sided bounds, and redundant same-direction
    * bounds (folded to the tightest, exactly as exact execution ANDs
    * them). Any conjunct that is not such a comparison — another
    * column, a non-literal side, a type-mismatched literal — refuses.
    */
  private def keyRangePred(table: String, gName: String,
      conjuncts: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Option[KeyLongRange] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    // the key side may be a bare attribute OR an expression key
    // (round 10 — `to_date(ts) >= DATE '...'`): both render to the
    // canonical name the blobs are keyed on
    def isKey(e: Expression): Boolean = (e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case other                  => exprKeyName(other)
    }).exists(_.equalsIgnoreCase(gName))
    // (bound, inclusive, isLower) per conjunct, key side first
    val parts: Seq[Option[(Long, Boolean, Boolean)]] = conjuncts.map {
      case GreaterThanOrEqual(e, l: Literal) if isKey(e) =>
        keyOrdinalLit(table, gName, l).map((_, true, true))
      case GreaterThan(e, l: Literal) if isKey(e) =>
        keyOrdinalLit(table, gName, l).map((_, false, true))
      case LessThanOrEqual(e, l: Literal) if isKey(e) =>
        keyOrdinalLit(table, gName, l).map((_, true, false))
      case LessThan(e, l: Literal) if isKey(e) =>
        keyOrdinalLit(table, gName, l).map((_, false, false))
      // literal-first spellings mirror with the comparison flipped
      case GreaterThanOrEqual(l: Literal, e) if isKey(e) =>
        keyOrdinalLit(table, gName, l).map((_, true, false))
      case GreaterThan(l: Literal, e) if isKey(e) =>
        keyOrdinalLit(table, gName, l).map((_, false, false))
      case LessThanOrEqual(l: Literal, e) if isKey(e) =>
        keyOrdinalLit(table, gName, l).map((_, true, true))
      case LessThan(l: Literal, e) if isKey(e) =>
        keyOrdinalLit(table, gName, l).map((_, false, true))
      case _ => None
    }
    if (parts.isEmpty || parts.exists(_.isEmpty)) return None
    val ps = parts.flatten
    // fold to the tightest bound per direction: ANDed bounds keep the
    // max lower / min upper; on a tie the strict bound wins
    def tight(bs: Seq[(Long, Boolean)], lower: Boolean)
        : Option[(Long, Boolean)] =
      bs.sortBy { case (b, inc) =>
        (if (lower) -b else b, if (inc) 1 else 0)
      }.headOption
    keyOrdinalDecoder(table, gName).map(dec => KeyLongRange(
      tight(ps.collect { case (b, inc, true) => (b, inc) }, lower = true),
      tight(ps.collect { case (b, inc, false) => (b, inc) }, lower = false),
      dec))
  }

  /** For a `GROUP BY g` over `table`, optionally under `WHERE g = lit`
    * / `g IN (lits)` / an integral comparison range on g: Some(None) =
    * no filter (serve every recorded group), Some(Some(pred)) = serve
    * only the matching groups (equality/IN literals rendered
    * type-safely via typedLitKey; range bounds compared on the parsed
    * integral key — per-group grids don't merge, but a GROUP BY keeps
    * the groups separate, so a multi-group filter is just a union of
    * single-group serves). None = any other child shape (filters on
    * non-group columns, non-literal predicates, type-mismatched
    * literals): refuse, fall through to the scan path. Groups the
    * filter names but the blob doesn't record serve as no row —
    * exactly what exact GROUP BY returns for a key with no rows.
    */
  private def groupKeyFilter(
      child: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String, gName: String): Option[Option[KeyPred]] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, In, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    def isTable(r: UnresolvedRelation): Boolean =
      r.multipartIdentifier.last.equalsIgnoreCase(table)
    child match {
      case r: UnresolvedRelation if isTable(r) => Some(None)
      case Filter(cond, r: UnresolvedRelation) if isTable(r) =>
        val keys: Option[KeyPred] = cond match {
          case EqualTo(a: UnresolvedAttribute, l: Literal)
              if a.nameParts.last.equalsIgnoreCase(gName) =>
            typedLitKey(table, gName, l).map(k => KeyIn(Seq(k)))
          case EqualTo(l: Literal, a: UnresolvedAttribute)
              if a.nameParts.last.equalsIgnoreCase(gName) =>
            typedLitKey(table, gName, l).map(k => KeyIn(Seq(k)))
          case In(a: UnresolvedAttribute, lits)
              if a.nameParts.last.equalsIgnoreCase(gName) =>
            typedInListKeys(table, gName, lits).map(KeyIn)
          case other =>
            keyRangePred(table, gName, conjunctsOf(other))
        }
        keys.map(k => Some(k))
      case _ => None
    }
  }

  /** Decode a blob group key into its per-column components. Single-
    * column sketches key groups as the raw `cast(g as string)`
    * rendering; composite sketches key them as Spark's
    * `to_json(array(cast(g1 as string), ...))` rendering (a JSON array
    * of strings/nulls — escaping handled by to_json at build time, by
    * the JSON parser here). None = malformed key (wrong arity,
    * non-string element): the caller refuses the sketch.
    */
  private def decodeGroupKey(k: Option[String],
      n: Int): Option[Seq[Option[String]]] =
    if (n == 1) Some(Seq(k))
    else k.flatMap { s =>
      graft.api.Json.parse(s) match {
        case Right(graft.api.Json.A(items)) if items.sizeIs == n =>
          val comps = items.map {
            case graft.api.Json.S(v) => Some(Some(v))
            case graft.api.Json.Null => Some(None)
            case _                   => None
          }
          if (comps.exists(_.isEmpty)) None else Some(comps.map(_.get))
        case _ => None
      }
    }

  /** A fresh grouped sketch of `tpe` over `column` whose recorded
    * group-by column SET equals the query's, its blob entries re-keyed
    * as component tuples permuted into the QUERY's group-by order —
    * what lets `GROUP BY a, b` serve from a sketch built with
    * group_by "b,a". None: no matching fresh sketch, or a malformed
    * key.
    */
  private def groupedBlobFor(table: String, column: String, tpe: String,
      queryCols: Seq[String]): Option[Seq[(Seq[Option[String]], Array[Byte])]] = {
    val q = queryCols.map(canonKey)
    catalog.getSketch(table, column, tpe)
      .filter(sketchIsFresh(table, _))
      .flatMap { s =>
        groupByParamRe.findFirstMatchIn(s.parameters)
          .map(_.group(1).split(",").map(canonKey).toSeq)
          .filter(scols => scols.sorted == q.sorted)
          .flatMap { scols =>
            val perm = q.map(scols.indexOf)
            val entries = graft.sketch.GroupedHll.unpack(s.data).map {
              case (k, b) =>
                decodeGroupKey(k, scols.size).map(c => (perm.map(c), b))
            }
            if (entries.exists(_.isEmpty)) None else Some(entries.map(_.get))
          }
      }
  }

  /** How a grouped-serve Aggregate dispatches against grouped blobs:
    * the query-order group columns, an optional key filter ON the
    * (single) group column (`WHERE g = lit` / `g IN`), and an optional
    * RESIDUAL equality/IN filter on NON-group columns — the
    * partial-key shape (`WHERE a = 'x' GROUP BY b` served from an
    * "a,b" composite blob by pruning on the a component and collapsing
    * the a dimension with an exact merge).
    */
  private case class GroupDispatch(
      gNames: Seq[String],
      keyFilter: Option[KeyPred],
      residual: Seq[(String, Seq[String])])

  /** Parse `cond` as a conjunction of `col = lit` / `col IN (lits)`
    * predicates over columns DISJOINT from the group-by set, each
    * literal rendered type-safely (typedLitKey). None on any other
    * predicate shape, a repeated column, or overlap with the group-by
    * columns (those shapes belong to groupKeyFilter / the scan path).
    */
  private def residualEqualityFilter(
      cond: org.apache.spark.sql.catalyst.expressions.Expression,
      table: String, gNames: Seq[String])
      : Option[Seq[(String, Seq[String])]] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, In, Literal}
    val lower = gNames.map(_.toLowerCase).toSet
    val parts = conjunctsOf(cond).map {
      case EqualTo(a: UnresolvedAttribute, l: Literal) =>
        typedLitKey(table, a.nameParts.last, l)
          .map(k => (a.nameParts.last, Seq(k)))
      case EqualTo(l: Literal, a: UnresolvedAttribute) =>
        typedLitKey(table, a.nameParts.last, l)
          .map(k => (a.nameParts.last, Seq(k)))
      case In(a: UnresolvedAttribute, lits) =>
        typedInListKeys(table, a.nameParts.last, lits)
          .map(ks => (a.nameParts.last, ks))
      case _ => None
    }
    if (parts.isEmpty || parts.exists(_.isEmpty)) return None
    val ps = parts.flatten
    val cols = ps.map(_._1.toLowerCase)
    if (cols.distinct.sizeIs != cols.size) None
    else if (cols.exists(lower.contains)) None
    else Some(ps)
  }

  /** The query-order group-by column names of an Aggregate whose every
    * grouping expression is a bare column, plus the dispatchable
    * filter: on the (single) group column itself (keyFilter), or on
    * non-group columns covered by a composite blob (residual —
    * partial-key dispatch). None = not servable from grouped sketches.
    */
  /** Canonical name for an EXPRESSION group key (round 10): a
    * deterministic single-argument function of one base column — the
    * time-bucket shapes (`to_date(ts)`, `year(ts)`, ...) — or a CAST
    * of a column, rendered by Catalyst's own `.sql`. The rendering is
    * comma-free by construction, so the catalog's comma-joined
    * group_by param round-trips; the builder records the caller's
    * spelling and dispatch compares the two case-insensitively (build
    * with the parser's spelling: lowercase function names,
    * `CAST(c AS TYPE)`). Nondeterministic or multi-argument
    * expressions refuse.
    */
  private def exprKeyName(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[String] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions.Cast
    val deterministicFns = Set("to_date", "year", "month", "quarter",
      "day", "dayofmonth", "dayofweek", "weekofyear", "hour", "minute",
      "date", "lower", "upper")
    // alias-fold to ONE canonical spelling per function so spelling
    // variants of the same key (`date(ts)` vs `to_date(ts)`,
    // `dayofmonth(ts)` vs `day(ts)`) render identically and dispatch
    // to the same blob (both sides of every comparison go through
    // canonKey, which routes parsed expressions here)
    val fnAlias = Map("date" -> "to_date", "dayofmonth" -> "day")
    e match {
      case f: UnresolvedFunction
          if !f.isDistinct && f.filter.isEmpty &&
            deterministicFns(f.nameParts.last.toLowerCase) &&
            f.arguments.sizeIs == 1 &&
            f.arguments.head.isInstanceOf[UnresolvedAttribute] =>
        val fn = f.nameParts.last.toLowerCase
        scala.util.Try(
          s"${fnAlias.getOrElse(fn, fn)}(${f.arguments.head.sql})")
          .toOption.filterNot(_.contains(","))
      case c: Cast if c.child.isInstanceOf[UnresolvedAttribute] =>
        scala.util.Try(e.sql).toOption.filterNot(_.contains(","))
      case _ => None
    }
  }

  /** THE canonicalizer for group-key specs: a recorded catalog
    * `group_by` component and a query's grouping-expression rendering
    * both normalize through here before ANY comparison, so equivalent
    * spellings (`date(ts)` vs `to_date(ts)`, CAST spacing variants,
    * case differences) dispatch to the same blob instead of the
    * contract living in a comment. Plain identifiers lowercase;
    * anything else parses with Spark's own SQL parser and re-renders
    * via [[exprKeyName]] (alias-folded); unparseable or non-key
    * expressions fall back to the lowercased raw text — exactly the
    * old behavior, so exotic literal column names keep matching
    * themselves.
    */
  private[graft] def canonKey(spec: String): String = {
    val t = spec.trim
    if (t.matches("[A-Za-z_][A-Za-z0-9_]*")) t.toLowerCase
    else scala.util.Try(spark.sessionState.sqlParser.parseExpression(t))
      .toOption.flatMap(exprKeyName).getOrElse(t).toLowerCase
  }

  private def aggregateGroupKeys(
      gs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      child: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String): Option[GroupDispatch] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val names = gs.map {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      // EXPRESSION group keys (round 10): deterministic comma-free
      // renderings (to_date(ts), year(ts)) match builds keyed on the
      // same text — the time-bucket dashboard shapes
      case e                      => exprKeyName(e)
    }
    if (names.isEmpty || names.exists(_.isEmpty)) return None
    val gNames = names.map(_.get)
    def isTable(r: UnresolvedRelation): Boolean =
      r.multipartIdentifier.last.equalsIgnoreCase(table)
    child match {
      case r: UnresolvedRelation if isTable(r) =>
        Some(GroupDispatch(gNames, None, Nil))
      case Filter(cond, r: UnresolvedRelation) if isTable(r) =>
        val onGroupCol =
          if (gNames.sizeIs == 1)
            groupKeyFilter(child, table, gNames.head)
              .map(f => GroupDispatch(gNames, f, Nil))
          else None
        onGroupCol.orElse(
          residualEqualityFilter(cond, table, gNames)
            .map(res => GroupDispatch(gNames, None, res)))
      case _ => None
    }
  }

  /** [[groupedBlobFor]], partial-key variant: a fresh sketch whose
    * group-by column SET equals queryCols ∪ the residual filter's
    * columns; entries pruned to those whose filter components match an
    * allowed literal rendering (NULL components never match — SQL
    * equality), re-keyed by their projection onto queryCols (query
    * order), payloads collapsed across the filtered-out dimension with
    * `merge` — exact for stats records (min/max monotone, counts and
    * the unscaled decimal sum additive), register-max union for HLLs,
    * bucket-count addition for histograms (shared-grid builds only —
    * the histogram merge throws on differing grids and the caller
    * falls through).
    */
  private def partialGroupedBlobFor(table: String, column: String,
      tpe: String, queryCols: Seq[String],
      residual: Seq[(String, Seq[String])],
      merge: (Array[Byte], Array[Byte]) => Array[Byte])
      : Option[Seq[(Seq[Option[String]], Array[Byte])]] = {
    val q = queryCols.map(canonKey)
    val fcols = residual.map(r => canonKey(r._1))
    val all = q ++ fcols
    // the blob's key set may be a SUPERSET of the referenced columns
    // (round 10): components neither grouped nor filtered collapse
    // unconditionally — summing a complete partition over the unused
    // dimension IS the exact marginal, so one wide composite blob
    // serves every narrower rollup its components span
    catalog.getSketch(table, column, tpe)
      .filter(sketchIsFresh(table, _))
      .flatMap { s =>
        groupByParamRe.findFirstMatchIn(s.parameters)
          .map(_.group(1).split(",").map(canonKey).toSeq)
          .filter(scols => all.distinct.sizeIs == all.size &&
            all.forall(scols.contains))
          .flatMap { scols =>
            val qIdx = q.map(scols.indexOf)
            val fIdx = fcols.map(scols.indexOf)
            val allowed = residual.map(_._2.toSet)
            val entries = graft.sketch.GroupedHll.unpack(s.data).map {
              case (k, b) =>
                decodeGroupKey(k, scols.size)
                  .map(c => (qIdx.map(c), fIdx.map(c), b))
            }
            if (entries.exists(_.isEmpty)) None
            else {
              val kept = entries.map(_.get).filter { case (_, fk, _) =>
                fk.zip(allowed).forall { case (comp, set) =>
                  comp.exists(set.contains) }
              }
              // collapse the filtered dimension; first-seen order keeps
              // the result deterministic for a given blob
              val acc = scala.collection.mutable.LinkedHashMap
                .empty[Seq[Option[String]], Array[Byte]]
              kept.foreach { case (qk, _, b) =>
                acc.updateWith(qk) {
                  case Some(prev) => Some(merge(prev, b))
                  case None       => Some(b)
                }
              }
              Some(acc.toSeq)
            }
          }
      }
  }

  /** Exact collapse of two per-group stat records (partial-key
    * dispatch): min/max monotone, counts and the unscaled decimal sum
    * additive — the same arithmetic the IN-list merge uses.
    */
  private def statsMergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    graft.sketch.GroupedStats.encode(graft.sketch.GroupedStats.merge(
      graft.sketch.GroupedStats.decode(a),
      graft.sketch.GroupedStats.decode(b)))

  /** Served-key typing: the grouped blobs key groups by the builders'
    * cast-to-string rendering. STRING group columns serve the
    * rendering verbatim; INTEGRAL columns parse it back (the cast is
    * bijective there); DATE and TIMESTAMP columns parse their
    * canonical renderings back too (ISO date; the session-zone
    * timestamp string, full microsecond precision — round 10, the
    * time-series dashboard keys), so the served schema matches exact
    * execution — and typed keys make the ORDER BY replay sort
    * natively. Any other group-column type refuses the serve (None):
    * a float/decimal rendering must not silently change the result
    * schema.
    */
  private def keyFieldTypes(table: String, gNames: Seq[String])
      : Option[Seq[org.apache.spark.sql.types.DataType]] = {
    import org.apache.spark.sql.types._
    val fields = spark.table(table).schema.fields
    val ts = gNames.map(c =>
      fields.find(_.name.equalsIgnoreCase(c)).map(_.dataType)
        // EXPRESSION keys resolve their output type by analysis (no
        // scan): to_date(ts) -> DateType, year(ts) -> IntegerType, ...
        .orElse(scala.util.Try(
          spark.table(table).selectExpr(c).schema.head.dataType).toOption))
    if (ts.exists(_.isEmpty)) return None
    val all = ts.flatten
    val ok = all.forall {
      case StringType | ByteType | ShortType | IntegerType | LongType |
          DateType => true
      // timestamp keys only under a FIXED-OFFSET session zone: the
      // zone-local rendering is not bijective through a DST fall-back
      // hour, so a DST-zone serve could merge two distinct instants
      // while reporting zero error — refuse to the exact scan instead
      case TimestampType => sessionZoneFixedOffset
      case _ => false
    }
    if (ok) Some(all) else None
  }

  /** Malformed catalog metadata — an unparseable blob key string, a
    * corrupt parameter — must REFUSE a serve (fall through to the next
    * strategy / the scan), never fail the query. Every decode branch
    * throws IllegalArgumentException subtypes by contract
    * (typedKeyValue rewraps the timestamp parser's DateTimeException),
    * so one narrow catch at each dispatch makes the refusal uniform.
    */
  private def refusing[A](f: => Option[A]): Option[A] =
    try f catch { case _: IllegalArgumentException => None }

  /** Whether the session time zone has one fixed offset (UTC, +02:00,
    * ...). Timestamp group keys are gated on this at build AND serve:
    * the blobs key groups by the zone-LOCAL cast-to-string rendering,
    * and in a DST zone that rendering is ambiguous during the
    * fall-back hour (two instants, one string) and gapped during
    * spring-forward — a build would silently merge distinct groups and
    * the parse back would pick an arbitrary offset. Fixed-offset zones
    * round-trip bijectively at full precision.
    */
  private def sessionZoneFixedOffset: Boolean =
    scala.util.Try(java.time.ZoneId.of(
      spark.sessionState.conf.sessionLocalTimeZone)
      .getRules.isFixedOffset).getOrElse(false)

  private def typedKeyValue(dt: org.apache.spark.sql.types.DataType,
      k: Option[String]): Any = {
    import org.apache.spark.sql.types._
    k.map { s =>
      dt match {
        case ByteType    => java.lang.Byte.valueOf(s)
        case ShortType   => java.lang.Short.valueOf(s)
        case IntegerType => java.lang.Integer.valueOf(s)
        case LongType    => java.lang.Long.valueOf(s)
        case DateType    => java.sql.Date.valueOf(s)
        case TimestampType =>
          // the rendering is Spark's canonical session-zone timestamp
          // string; parse it back IN that zone (never the JVM default).
          // A malformed key string must REFUSE the serve, not fail the
          // query: the call sites' guards catch IllegalArgumentException
          // (every integral/date branch throws IAE subtypes), so the
          // DateTimeParseException this parse raises is rewrapped.
          try
            java.sql.Timestamp.from(
              java.time.LocalDateTime.parse(s.replaceFirst(" ", "T"))
                .atZone(java.time.ZoneId.of(
                  spark.sessionState.conf.sessionLocalTimeZone)).toInstant)
          catch {
            case e: java.time.DateTimeException =>
              throw new IllegalArgumentException(
                s"unparseable timestamp group key '$s'", e)
          }
        case _ => s
      }
    }.orNull
  }

  /** Histogram collapse for partial-key dispatch: empty payloads
    * (all-NULL groups — percentile ignores NULLs) are identities;
    * non-empty payloads add bucket counts, which is EXACT for the
    * union iff both sit on the same grid (`Histogram.merge` throws
    * otherwise — shared-grid builds guarantee a match by construction;
    * per-group grids refuse naturally, the caller catches and falls
    * through to the scan).
    */
  private def histMergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else graft.sketch.Histogram.deserialize(a)
      .merge(graft.sketch.Histogram.deserialize(b)).serialize

  /** HDR collapse for partial-key / marginal dispatch: empty payloads
    * (all-NULL groups) are identities; non-empty payloads add
    * per-bucket counts, which is EXACT for ANY two groups — the log
    * grid is the real line's binades, global by construction, so
    * grouped HDR blobs never have the differing-grid refusal the
    * per-group equi-width histograms do.
    */
  private def hdrMergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    graft.sketch.HdrSketch.mergeBytes(a, b)

  /** The hdrsum clip fold (the q148/q160 arithmetic), shared by the
    * global and grouped serves so the bit-exactness-sensitive
    * associations can never drift: interior decimal sums add exactly
    * (unscaled BigInt addition, ONE cast to double), the <=2 clipped
    * edge terms scale by the covered fraction in partial order, and
    * the |sum| boundary mass bounds the estimate.
    */
  private def hdrClipSum(sk: graft.sketch.HdrSketch,
      lowerB: Option[Double], upperB: Option[Double],
      sumOf: ((Int, Int, Int)) => BigInt): (Option[Double], Double) =
    sk.rangeClip(lowerB, upperB) match {
      case None => (Some(0.0), 0.0) // empty range: SUM of no rows
      case Some(clip) =>
        var interior = BigInt(0)
        clip.interior.foreach { case (kk, _) => interior += sumOf(kk) }
        def d(v: BigInt): Double =
          new java.math.BigDecimal(v.bigInteger, 4).doubleValue
        val terms = clip.partial.map(pt => d(sumOf(pt.key)) * pt.frac)
        val est = (d(interior) + terms.headOption.getOrElse(0.0)) +
          terms.drop(1).headOption.getOrElse(0.0)
        val bMass = clip.partial.map(pt => math.abs(d(sumOf(pt.key)))).sum
        val rel =
          if (est != 0.0) bMass / math.abs(est)
          else if (bMass > 0.0) Double.PositiveInfinity
          else 0.0
        (Some(est), rel)
    }

  private val riderLastBatchRe = """"last_batch"\s*:\s*(-?\d+)""".r

  /** Streaming maintainers fold sum riders AFTER their counts blob, so
    * a crash between the two upserts leaves the rider one batch
    * behind. Sum serves must therefore REFUSE whenever the two blobs
    * disagree on the last folded batch — serving would silently
    * understate sums while counts stay right. Batch builds carry no
    * last_batch on either blob (None == None passes).
    */
  private def riderInSync(table: String, column: String,
      countsType: String, riderType: String): Boolean = {
    def lb(t: String): Option[Long] =
      catalog.getSketch(table, column, t).flatMap(s =>
        riderLastBatchRe.findFirstMatchIn(s.parameters)
          .map(_.group(1).toLong))
    lb(countsType) == lb(riderType)
  }

  /** If the query is `SELECT g..., PERCENTILE(attr, p)... FROM table
    * GROUP BY g...` — optionally under `WHERE g = lit` / `g IN (lits)`
    * (groupKeyFilter: a GROUP BY keeps per-group grids separate, so a
    * multi-literal filter is a union of single-group serves, one row
    * each) — with a fresh stored GROUPED histogram (built by
    * SketchOps.createGroupedHistogram, group-by column set equal to
    * the query's — composite keys welcome, in any column order)
    * covering every percentile output, answer all (named) groups by
    * interpolation from the catalog — zero scan. The reported error is
    * one bucket width (1/buckets of the serving grid). A residual
    * filter on the blob's OTHER key components (`WHERE a = lit GROUP
    * BY b` over an "a,b" blob) collapses the filtered dimension by
    * adding bucket counts — served only from sharedGrid builds, whose
    * groups share one grid by construction (per-group grids refuse and
    * the scan answers). Group keys are served as the string rendering
    * recorded at build time; groups whose value column was all NULL
    * are recorded with an empty payload and served with a NULL
    * percentile — the exact GROUP BY row set, nothing dropped.
    */
  private def storedGroupedHistogramAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String): Option[(DataFrame, Double)] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
    def litDouble(l: Literal): Option[Double] = l.value match {
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case n: Number                             => Some(n.doubleValue())
      case _                                     => None
    }
    def attrName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case _                      => None
    }
    parsed match {
      case Aggregate(gs, outs, child, _) =>
        val d = aggregateGroupKeys(gs, child, table).getOrElse(return None)
        val (gNames, keyFilter) = (d.gNames, d.keyFilter)
        // partial-key (residual) dispatch: the filtered-out dimension
        // collapses by ADDING bucket counts — exact iff the collapsed
        // groups share a grid (sharedGrid builds; per-group grids make
        // Histogram.merge throw and the serve falls through to the
        // scan, the pre-round-10 behavior)
        def histBlobFor(c: String)
            : Option[Seq[(Seq[Option[String]], Array[Byte])]] =
          if (d.residual.isEmpty)
            groupedBlobFor(table, c, "histogram_grouped", gNames)
              .orElse(
                try partialGroupedBlobFor(table, c, "histogram_grouped",
                  gNames, Nil, histMergeBytes)
                catch { case _: IllegalArgumentException => None })
          else
            try partialGroupedBlobFor(table, c, "histogram_grouped",
              gNames, d.residual, histMergeBytes)
            catch { case _: IllegalArgumentException => None }
        val lower = gNames.map(_.toLowerCase)
        val classified = outs.map {
          case a: UnresolvedAttribute
              if lower.contains(a.nameParts.last.toLowerCase) =>
            Some(Left((a.nameParts.last,
              lower.indexOf(a.nameParts.last.toLowerCase))))
          case Alias(e, name)
              if attrName(e).orElse(exprKeyName(e)).exists(n => lower.contains(n.toLowerCase)) =>
            Some(Left((name, lower.indexOf(attrName(e).orElse(exprKeyName(e)).get.toLowerCase))))
          case Alias(f: UnresolvedFunction, name)
              if !f.isDistinct && f.filter.isEmpty =>
            val colP: Option[(String, Double)] =
              (f.nameParts.last.toLowerCase, f.arguments) match {
                case ("percentile" | "percentile_approx" | "approx_percentile",
                    Seq(a: UnresolvedAttribute, l: Literal)) =>
                  litDouble(l).map(p => (a.nameParts.last, p))
                case ("median", Seq(a: UnresolvedAttribute)) =>
                  Some((a.nameParts.last, 0.5))
                case _ => None
              }
            colP.flatMap { case (c, p) =>
              histBlobFor(c)
                .map { entries =>
                  // empty payload = all-NULL group (no grid): served as
                  // a NULL percentile, matching exact GROUP BY output.
                  // A key filter prunes to the named groups (NULL keys
                  // never match a literal — SQL IN semantics).
                  val hs = entries
                    .filter { case (k, _) =>
                      keyFilter.forall(_.matches(k.head)) }
                    .map {
                      case (k, b) =>
                        k -> (if (b.isEmpty) None
                              else Some(graft.sketch.Histogram.deserialize(b)))
                    }
                  Right((name,
                    hs.map { case (k, h) => k -> h.map(_.percentile(p)) },
                    hs.flatMap { case (_, h) => h.map(x => 1.0 / x.buckets) }
                      .foldLeft(0.0)(math.max)))
                }
            }
          case _ => None
        }
        if (classified.exists(_.isEmpty)) return None
        val parts = classified.flatten
        val keyIdx = parts.collect { case Left((_, i)) => i }
        val estCols = parts.collect { case Right(v) => v }
        if (keyIdx.toSet != gNames.indices.toSet || estCols.isEmpty)
          return None
        val keys = estCols.head._2.map(_._1)
        if (!estCols.forall(_._2.map(_._1).toSet == keys.toSet)) return None
        val kTypes = keyFieldTypes(table, gNames).getOrElse(return None)
        val byName = estCols.map { case (n, est, _) => n -> est.toMap }.toMap
        val rows = keys.map { k =>
          org.apache.spark.sql.Row.fromSeq(parts.map {
            case Left((_, i))     => typedKeyValue(kTypes(i), k(i))
            case Right((n, _, _)) => byName(n)(k).map(Double.box).orNull
          })
        }
        val schema = StructType(parts.map {
          case Left((n, i))     => StructField(n, kTypes(i), nullable = true)
          case Right((n, _, _)) => StructField(n, DoubleType, nullable = true)
        })
        import scala.jdk.CollectionConverters._
        Some((spark.createDataFrame(rows.asJava, schema),
          estCols.map(_._3).max))
      case _ => None
    }
  }

  /** [[storedGroupedHistogramAnswer]]'s RELATIVE-error twin: the same
    * `SELECT g..., PERCENTILE(attr, p)... GROUP BY g...` shape served
    * from a fresh "hdr_grouped" blob (SketchOps.createGroupedHdr) when
    * no grouped equi-width histogram does. Error = 1/m RELATIVE per
    * group (heavy-tail safe). Because the log grid is GLOBAL, the
    * partial-key residual collapse AND the marginal collapse (GROUP BY
    * a over an "a,b" blob) merge EXACTLY — the shapes per-group
    * equi-width grids refuse at Histogram.merge. All-NULL groups
    * (empty payloads) serve NULL percentiles; a key filter prunes to
    * the named groups.
    */
  /** With `pctCi` (the caller's ciColumns option), every percentile
    * output gains {name}_ci_low/_ci_high companions: the SAME sketch
    * percentile evaluated at the rank-shifted quantiles
    * p ∓ 1.96·√(p(1−p)/n_g) clamped to [0,1] — q168's distribution-free
    * binomial order-statistic bound, computable PER GROUP here because
    * the blob records each group's exact mass n_g (the plan-time
    * unknowable that makes the sampled paths refuse grouped CIs).
    */
  private def storedGroupedHdrAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String, pctCi: Boolean): Option[(DataFrame, Double)] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    def litDouble(l: Literal): Option[Double] = l.value match {
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case n: Number                             => Some(n.doubleValue())
      case _                                     => None
    }
    def attrName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case _                      => None
    }
    parsed match {
      case Aggregate(gs, outs, child, _) =>
        val d = aggregateGroupKeys(gs, child, table).getOrElse(return None)
        val (gNames, keyFilter) = (d.gNames, d.keyFilter)
        // memoized per value column: a multi-percentile dashboard
        // (p50/p95/p99 over one column) unpacks and collapses the blob
        // ONCE, not once per output
        val blobCache = scala.collection.mutable.Map
          .empty[String, Option[Seq[(Seq[Option[String]], Array[Byte])]]]
        def hdrBlobFor(c: String)
            : Option[Seq[(Seq[Option[String]], Array[Byte])]] =
          blobCache.getOrElseUpdate(c.toLowerCase,
            if (d.residual.isEmpty)
              groupedBlobFor(table, c, "hdr_grouped", gNames)
                .orElse(partialGroupedBlobFor(table, c, "hdr_grouped",
                  gNames, Nil, hdrMergeBytes))
            else
              partialGroupedBlobFor(table, c, "hdr_grouped",
                gNames, d.residual, hdrMergeBytes))
        val lower = gNames.map(_.toLowerCase)
        val classified = outs.map {
          case a: UnresolvedAttribute
              if lower.contains(a.nameParts.last.toLowerCase) =>
            Some(Left((a.nameParts.last,
              lower.indexOf(a.nameParts.last.toLowerCase))))
          case Alias(e, name)
              if attrName(e).orElse(exprKeyName(e)).exists(n => lower.contains(n.toLowerCase)) =>
            Some(Left((name, lower.indexOf(attrName(e).orElse(exprKeyName(e)).get.toLowerCase))))
          case Alias(f: UnresolvedFunction, name)
              if !f.isDistinct && f.filter.isEmpty =>
            val colP: Option[(String, Double)] =
              (f.nameParts.last.toLowerCase, f.arguments) match {
                case ("percentile" | "percentile_approx" | "approx_percentile",
                    Seq(a: UnresolvedAttribute, l: Literal)) =>
                  litDouble(l).map(p => (a.nameParts.last, p))
                case ("median", Seq(a: UnresolvedAttribute)) =>
                  Some((a.nameParts.last, 0.5))
                case _ => None
              }
            colP.flatMap { case (c, p) =>
              hdrBlobFor(c)
                .map { entries =>
                  // empty payload = all-NULL group: NULL percentile,
                  // matching exact GROUP BY output. A key filter
                  // prunes to the named groups (NULL keys never match
                  // a literal — SQL IN semantics).
                  val hs = entries
                    .filter { case (k, _) =>
                      keyFilter.forall(_.matches(k.head)) }
                    .map {
                      case (k, b) =>
                        k -> (if (b.isEmpty) None
                              else Some(graft.sketch.HdrSketch.deserialize(b)))
                    }
                  def vals(h: Option[graft.sketch.HdrSketch])
                      : Seq[Option[Double]] = {
                    val est = h.flatMap(_.percentile(p))
                    if (!pctCi) Seq(est)
                    else {
                      def shifted(sign: Double): Option[Double] =
                        h.flatMap { s =>
                          val n = s.n.toDouble
                          if (n <= 0) None
                          else s.percentile(math.max(0.0, math.min(1.0,
                            p + sign *
                              (1.96 * math.sqrt((p * (1.0 - p)) / n)))))
                        }
                      Seq(est, shifted(-1.0), shifted(1.0))
                    }
                  }
                  Right((name,
                    hs.map { case (k, h) => k -> vals(h) },
                    hs.flatMap { case (_, h) => h.map(_.relErrBound) }
                      .foldLeft(0.0)(math.max)))
                }
            }
          case _ => None
        }
        if (classified.exists(_.isEmpty)) return None
        val parts = classified.flatten
        val keyIdx = parts.collect { case Left((_, i)) => i }
        val estCols = parts.collect { case Right(v) => v }
        if (keyIdx.toSet != gNames.indices.toSet || estCols.isEmpty)
          return None
        val keys = estCols.head._2.map(_._1)
        if (!estCols.forall(_._2.map(_._1).toSet == keys.toSet)) return None
        val kTypes = keyFieldTypes(table, gNames).getOrElse(return None)
        val byName = estCols.map { case (n, est, _) => n -> est.toMap }.toMap
        def outNames(n: String): Seq[String] =
          if (pctCi) Seq(n, s"${n}_ci_low", s"${n}_ci_high") else Seq(n)
        val rows = keys.map { k =>
          org.apache.spark.sql.Row.fromSeq(parts.flatMap {
            case Left((_, i)) => Seq(typedKeyValue(kTypes(i), k(i)))
            case Right((n, _, _)) =>
              byName(n)(k).map(_.map(Double.box).orNull)
          })
        }
        val schema = StructType(parts.flatMap {
          case Left((n, i)) => Seq(StructField(n, kTypes(i), nullable = true))
          case Right((n, _, _)) =>
            outNames(n).map(StructField(_, DoubleType, nullable = true))
        })
        import scala.jdk.CollectionConverters._
        Some((spark.createDataFrame(rows.asJava, schema),
          estCols.map(_._3).max))
      case _ => None
    }
  }

  /** If the query is `SELECT g, MIN/MAX/COUNT/SUM/AVG(attr)... FROM
    * table GROUP BY g` — optionally under `WHERE g = lit` / `g IN
    * (lits)` (groupKeyFilter prunes to the named groups) — with a
    * fresh stored `stats_grouped` blob (the
    * per-group exact statistics `SketchOps.createGroupedHistogram`
    * records in its stats pass, group_by == g) covering every
    * aggregate output, answer all groups from the catalog — zero scan,
    * ZERO error. COUNT(*) per group serves from the recorded group
    * rowcounts but only rides along with ≥1 column-anchored statistic
    * (the same lone-count refusal as the global stats strategy, so
    * bare grouped counts keep their sampling semantics). All-NULL
    * groups serve NULL min/max/sum/avg and exact counts. AVG is
    * sum4/nnull — one double division of two recorded exacts.
    */
  private def storedGroupedStatsAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String): Option[DataFrame] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
    def attrName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case _                      => None
    }
    def isCountStar(args: Seq[Expression]): Boolean = args match {
      case Seq(_: UnresolvedStar)     => true
      case Seq(Literal(v: Number, _)) => v.intValue == 1
      case _                          => false
    }
    parsed match {
      case Aggregate(gs, outs, child, _) =>
        val d = aggregateGroupKeys(gs, child, table).getOrElse(return None)
        val (gNames, keyFilter) = (d.gNames, d.keyFilter)
        // blob lookup: exact-set match, or the partial-key collapse
        // when a residual filter names the blob's other components
        // (WHERE a = 'x' GROUP BY b over an "a,b" blob) — the collapse
        // merge is exact (min/max monotone, counts/sums additive)
        def statsBlobFor(c: String) =
          if (d.residual.isEmpty)
            groupedBlobFor(table, c, "stats_grouped", gNames)
              .orElse(partialGroupedBlobFor(table, c, "stats_grouped",
                gNames, Nil, statsMergeBytes))
          else partialGroupedBlobFor(table, c, "stats_grouped", gNames,
            d.residual, statsMergeBytes)
        val lower = gNames.map(_.toLowerCase)
        // Left((key output name, group idx)) | Right((name, fn, stats))
        val classified = outs.map {
          case a: UnresolvedAttribute
              if lower.contains(a.nameParts.last.toLowerCase) =>
            Some(Left((a.nameParts.last,
              lower.indexOf(a.nameParts.last.toLowerCase))))
          case Alias(e, name)
              if attrName(e).orElse(exprKeyName(e)).exists(n => lower.contains(n.toLowerCase)) =>
            Some(Left((name, lower.indexOf(attrName(e).orElse(exprKeyName(e)).get.toLowerCase))))
          case Alias(f: UnresolvedFunction, name)
              if !f.isDistinct && f.filter.isEmpty =>
            (f.nameParts.last.toLowerCase, f.arguments) match {
              case ("count", args) if isCountStar(args) =>
                Some(Right((name, "count_star", None)))
              case (fn, Seq(a: UnresolvedAttribute))
                  if Set("min", "max", "count", "sum", "avg", "mean")(fn) =>
                // "zero error" must be true: a group sum whose double
                // rendering loses precision (type-aware check) refuses
                // rather than labeling a rounded SUM/AVG exact
                statsBlobFor(a.nameParts.last)
                  .map(_.map { case (k, b) =>
                    k -> graft.sketch.GroupedStats.decode(b) })
                  // a key filter prunes to the named groups before any
                  // exactness check or serve (NULL keys never match a
                  // literal — SQL IN semantics)
                  .map(_.filter { case (k, _) =>
                    keyFilter.forall(_.matches(k.head)) })
                  .filter(stats => statFnServesExactly(table,
                    a.nameParts.last, fn, stats.map(_._2)))
                  .map(stats => Right((name, fn, Some(stats))))
              case _ => None
            }
          case _ => None
        }
        if (classified.exists(_.isEmpty)) return None
        val parts = classified.flatten
        val keyIdx = parts.collect { case Left((_, i)) => i }
        val aggCols = parts.collect { case Right(v) => v }
        val anchored = aggCols.collect { case (_, _, Some(s)) => s }
        if (keyIdx.toSet != gNames.indices.toSet || anchored.isEmpty)
          return None
        val keys = anchored.head.map(_._1)
        if (!anchored.forall(_.map(_._1).toSet == keys.toSet)) return None
        val kTypes = keyFieldTypes(table, gNames).getOrElse(return None)
        val rideRows = anchored.head.toMap.map { case (k, s) => k -> s.nrows }
        // index each aggregate's stats ONCE (closure per output): the
        // value lookup below runs per (group, output) — an inline
        // .toMap there is O(n²) in the group count (the 2.4k-day
        // per-day rollup paid ~2 s of driver time rebuilding maps)
        val getters: Seq[Seq[Option[String]] => Any] = parts.map {
          case Left((_, i)) =>
            (k: Seq[Option[String]]) => typedKeyValue(kTypes(i), k(i))
          case Right((_, "count_star", _)) =>
            (k: Seq[Option[String]]) => rideRows(k)
          case Right((_, fn, Some(stats))) =>
            val byKey = stats.toMap
            (k: Seq[Option[String]]) => {
              val st = byKey(k)
              fn match {
                case "min"          => st.min.map(Double.box).orNull
                case "max"          => st.max.map(Double.box).orNull
                case "count"        => st.nnull
                case "sum"          => st.sumDouble.map(Double.box).orNull
                case "avg" | "mean" => st.avgDouble.map(Double.box).orNull
              }
            }
          case Right((_, _, None)) => return None // unreachable
        }
        val rows = keys.map(k =>
          org.apache.spark.sql.Row.fromSeq(getters.map(_(k))))
        val schema = StructType(parts.map {
          case Left((n, i)) => StructField(n, kTypes(i), nullable = true)
          case Right((n, fn, _)) =>
            if (fn == "count" || fn == "count_star")
              StructField(n, LongType, nullable = false)
            else StructField(n, DoubleType, nullable = true)
        })
        import scala.jdk.CollectionConverters._
        Some(spark.createDataFrame(rows.asJava, schema))
      case _ => None
    }
  }

  /** Star-aggregate serve: `SELECT d.attr..., <aggs over fact cols>
    * FROM fact JOIN dim ON fact.fk = dim.pk GROUP BY d.attr...`
    * answered WITHOUT scanning the fact. The fact side's fresh
    * grouped-stats blob keyed on the join key supplies exact per-key
    * aggregates (COMPLETE: builders refuse past MaxHllGroups), and
    * only the DIM is read — restricted to the blob's bounded key set
    * by a broadcast semi-join and collected under a hard cap. Each
    * collected dim row folds its key's stats into its GROUP BY cell
    * with the partial-key collapse arithmetic (min/max monotone,
    * counts and unscaled decimal sums additive) — which IS inner-join
    * aggregation semantics: a dim row with key k contributes every
    * fact row of group k exactly once, duplicate dim keys contribute
    * once per row (join fan-out), and dim keys matching no fact group
    * never appear (the blob's key list is the fact's complete group
    * set). NULL fact keys never join and drop with the blob's NULL
    * entry; NULL dim keys fail the equi-join the same way. Refusals
    * keep the exact path honest: any WHERE clause (it would change
    * the blob's recorded totals), outer/non-equi joins, composite
    * join keys, expression group keys, mixed join-key types (both
    * must be integral, or both string, so the cast-to-string
    * renderings of equal values agree), non-atomic dim attr types,
    * dim fan-out past 4x the key count, and any merged stat failing
    * the same per-function exactness proof as the single-table serve
    * (statFnServesExactly over the MERGED records). At 100 TB this
    * turns the most common star-schema dashboard (revenue by dim
    * attribute) from a fact scan + shuffle into a dim-only scan: the
    * expensive side is a catalog lookup.
    */
  private def storedStarAggAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      tables: Seq[String]): Option[(DataFrame, String, String, Double)] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
    import org.apache.spark.sql.catalyst.plans.Inner
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, SubqueryAlias}
    import org.apache.spark.sql.types._
    if (tables.sizeIs < 2) return None
    // GROUP BY shapes parse as Aggregate; UNGROUPED aggregates parse
    // as a bare Project over the join (the analyzer's GlobalAggregates
    // rule runs later) — both fold here, the ungrouped form into ONE
    // cell (round 10). Plain projections refuse at classification.
    val (aggOuts, aggChild, grouping) = parsed match {
      case a: Aggregate =>
        (a.aggregateExpressions, a.child, a.groupingExpressions)
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        (p.projectList, p.child,
          Seq.empty[org.apache.spark.sql.catalyst.expressions.Expression])
      case _ => return None
    }
    // the aggregate's child must be inner equi-joins of the relations
    // (aliases allowed), optionally under ONE WHERE clause. DIM-side
    // predicates are safe — the dims are scanned anyway, so they just
    // restrict which dim rows fold, which IS the filtered inner join's
    // aggregation semantics. FACT-side equality/IN conjuncts serve by
    // pruning a COMPOSITE (fk, residCols...) blob and collapsing to
    // per-fk records (round 10); any other fact-side predicate refuses
    // below (a numeric band is storedStarRangeAnswer's job).
    val (whereCond, joinChild) = aggChild match {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(c, ch) =>
        (Some(c), ch)
      case ch => (None, ch)
    }
    val extraneous = joinChild.collect {
      case n if !n.isInstanceOf[Join] && !n.isInstanceOf[SubqueryAlias] &&
        !n.isInstanceOf[UnresolvedRelation] => n
    }
    if (extraneous.nonEmpty) return None
    val joins = joinChild.collect { case j: Join => j }
    if (joins.sizeIs != tables.size - 1 ||
        !joins.forall(j => j.joinType == Inner && j.condition.isDefined))
      return None
    def colSet(t: String) = spark.table(t).columns.map(_.toLowerCase).toSet
    def keyKind(t: String, c: String): Char =
      spark.table(t).schema.fields
        .find(_.name.equalsIgnoreCase(c)).map(_.dataType) match {
        case Some(StringType) => 's'
        case Some(ByteType | ShortType | IntegerType | LongType) => 'i'
        case _ => 'x'
      }
    def attrName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case _                      => None
    }
    def isCountStar(args: Seq[Expression]): Boolean = args match {
      case Seq(_: UnresolvedStar)     => true
      case Seq(Literal(v: Number, _)) => v.intValue == 1
      case _                          => false
    }
    def litDouble(l: Literal): Option[Double] = l.value match {
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case n: Number                             => Some(n.doubleValue())
      case _                                     => None
    }
    import graft.sketch.GroupedStats
    // column ownership across ALL of the query's tables: the serve
    // only handles shapes whose referenced columns resolve to exactly
    // one table (the same rule joinTreeEdges applies to join keys)
    val colSets: Map[String, Set[String]] = tables.map(t => t -> colSet(t)).toMap
    def owner(col: String): Option[String] = {
      val os = tables.filter(t => colSets(t).contains(col.toLowerCase))
      if (os.sizeIs == 1) Some(os.head) else None
    }
    def tryOrient(fact: String): Option[(DataFrame, String, String, Double)] = {
      // the join tree oriented from the candidate fact: exactly ONE
      // single-key edge may leave the fact (a second would need a
      // composite blob key); everything else is the DIM TREE — the
      // snowflake shape, executed as real (small) dim joins below
      val edges = joinTreeEdges(parsed, tables, fact).getOrElse(return None)
      val factEdges = edges.filter(_._1 == fact)
      // one edge may leave the fact — single- OR multi-column (round
      // 10: a composite equi-join serves from a blob keyed on the fk
      // TUPLE); everything else is the dim tree
      val (fkCols, dimRoot, pkCols) = factEdges match {
        case Seq((_, fks, dr, pks))
            if fks.nonEmpty && fks.size == pks.size =>
          (fks, dr, pks)
        case _ => return None
      }
      val dimEdges = edges.filterNot(_._1 == fact)
      val dims = tables.filterNot(_ == fact)
      val fCols = colSet(fact)
      def dimOwned(col: String): Boolean = owner(col).exists(_ != fact)
      val kindsOk = fkCols.zip(pkCols).forall { case (fk0, pk0) =>
        val kk = keyKind(fact, fk0)
        kk != 'x' && kk == keyKind(dimRoot, pk0)
      }
      if (!kindsOk) return None
      // the WHERE splits: FACT-side equality/IN conjuncts on non-key
      // columns serve from a COMPOSITE blob keyed (fk, residCols...) —
      // entries prune on the typed literals and collapse to per-fk
      // records with the exact partial-key merge, so `WHERE fact.flag
      // = 'A' GROUP BY dim.attr` stays a catalog lookup (round 10);
      // every remaining conjunct must be unambiguously a DIM's (it is
      // applied to the dim-side scan below) with no subquery. Any
      // other fact-touching predicate refuses — a numeric band is
      // storedStarRangeAnswer's job.
      import org.apache.spark.sql.catalyst.expressions.{EqualTo, In}
      def factEq(e: Expression): Option[(String, Seq[String])] = e match {
        case EqualTo(a: UnresolvedAttribute, l: Literal) =>
          typedLitKey(fact, a.nameParts.last, l)
            .map(v => (a.nameParts.last, Seq(v)))
        case EqualTo(l: Literal, a: UnresolvedAttribute) =>
          typedLitKey(fact, a.nameParts.last, l)
            .map(v => (a.nameParts.last, Seq(v)))
        case In(a: UnresolvedAttribute, lits)
            if lits.nonEmpty && lits.forall(_.isInstanceOf[Literal]) =>
          typedInListKeys(fact, a.nameParts.last, lits)
            .map(vs => (a.nameParts.last, vs))
        case _ => None
      }
      def touchesFact(e: Expression): Boolean =
        e.collect { case a: UnresolvedAttribute => a.nameParts.last }
          .exists(c => owner(c).contains(fact))
      val conj = whereCond.map(conjunctsOf).getOrElse(Nil)
      val (factConj, rest) = conj.partition(touchesFact)
      val residOpt = factConj.map(factEq)
      if (residOpt.exists(_.isEmpty)) return None
      val resid: Seq[(String, Seq[String])] = residOpt.flatten
      val residCols = resid.map(_._1)
      if (residCols.map(_.toLowerCase).distinct.sizeIs != residCols.size)
        return None
      if (residCols.exists(rc =>
          fkCols.exists(_.equalsIgnoreCase(rc)))) return None
      val whereOk = rest.forall { c =>
        val attrs = c.collect {
          case a: UnresolvedAttribute => a.nameParts.last
        }
        attrs.nonEmpty && attrs.forall(dimOwned) &&
          c.find {
            case _: org.apache.spark.sql.catalyst.expressions.SubqueryExpression => true
            case _: UnresolvedStar => true
            case _ => false
          }.isEmpty
      }
      if (!whereOk) return None
      // group keys: bare unambiguous attributes — DIM keys of any
      // atomic type (the dim is actually read), and, round 10, FACT
      // keys too: a fact-owned group column rides the COMPOSITE blob
      // key (`GROUP BY dim.attr, fact.flag` — the crossed rollup),
      // gated to string/integral types whose cast-to-string rendering
      // parses back bijectively. The join key itself refuses (its
      // groups are the blob's key axis, not a served dimension).
      val gOpt: Seq[Option[(String, Boolean)]] =
        grouping.map {
          case a: UnresolvedAttribute if dimOwned(a.nameParts.last) =>
            Some((a.nameParts.last, false))
          case a: UnresolvedAttribute
              if owner(a.nameParts.last).contains(fact) &&
                !fkCols.exists(_.equalsIgnoreCase(a.nameParts.last)) =>
            Some((a.nameParts.last, true))
          case _ => None
        }
      if (gOpt.exists(_.isEmpty)) return None
      val gKeys: Seq[(String, Boolean)] = gOpt.flatten
      val gNames = gKeys.map(_._1)
      val dimGroupNames = gKeys.collect { case (n, false) => n }
      val factGroupCols = gKeys.collect { case (n, true) => n }
      if (factGroupCols.exists(fg =>
          residCols.exists(_.equalsIgnoreCase(fg))) ||
          factGroupCols.map(_.toLowerCase).distinct.sizeIs !=
            factGroupCols.size) return None
      val lower = gNames.map(_.toLowerCase)
      val attrFields = gKeys.map {
        case (n, false) =>
          dims.iterator
            .flatMap(t => spark.table(t).schema.fields
              .find(_.name.equalsIgnoreCase(n)))
            .nextOption().getOrElse(return None)
        case (n, true) =>
          spark.table(fact).schema.fields
            .find(_.name.equalsIgnoreCase(n)).getOrElse(return None)
      }
      val atomicOk = gKeys.zip(attrFields).forall {
        // fact-side keys serve from the blob's string renderings, so a
        // timestamp key needs the bijective fixed-offset-zone rendering
        // (same gate as keyFieldTypes); dim-side keys are live typed
        // values from the dim scan and never round-trip through strings
        case ((_, true), f) => f.dataType match {
          case StringType | ByteType | ShortType | IntegerType |
              LongType | DateType => true
          case TimestampType => sessionZoneFixedOffset
          case _ => false
        }
        case ((_, false), f) => f.dataType match {
          case StringType | BooleanType | ByteType | ShortType |
              IntegerType | LongType | FloatType | DoubleType | DateType |
              TimestampType => true
          case _: DecimalType => true
          case _              => false
        }
      }
      if (!atomicOk) return None

      // classify outputs: group keys through; count(*); fn(factCol)
      val classified: Seq[Option[Either[(String, Int), (String, String, Option[String])]]] =
        aggOuts.map {
          case a: UnresolvedAttribute
              if lower.contains(a.nameParts.last.toLowerCase) =>
            Some(Left((a.nameParts.last,
              lower.indexOf(a.nameParts.last.toLowerCase))))
          case Alias(e, name)
              if attrName(e).orElse(exprKeyName(e)).exists(n => lower.contains(n.toLowerCase)) =>
            Some(Left((name, lower.indexOf(attrName(e).orElse(exprKeyName(e)).get.toLowerCase))))
          case Alias(f: UnresolvedFunction, name) if f.filter.isEmpty =>
            (f.nameParts.last.toLowerCase, f.arguments) match {
              case ("count", args) if !f.isDistinct && isCountStar(args) =>
                Some(Right((name, "count_star", None)))
              case ("count", Seq(a: UnresolvedAttribute))
                  if f.isDistinct &&
                    owner(a.nameParts.last).contains(fact) =>
                Some(Right((name, "count_distinct", Some(a.nameParts.last))))
              case (fn, Seq(a: UnresolvedAttribute))
                  if !f.isDistinct &&
                    Set("min", "max", "count", "sum", "avg", "mean")(fn) &&
                    owner(a.nameParts.last).contains(fact) =>
                Some(Right((name, fn, Some(a.nameParts.last))))
              // percentiles serve from the fk-keyed grouped histograms:
              // per-cell the fks' bucket counts ADD — exact only when
              // the grids agree (sharedGrid builds; mismatched grids
              // throw at merge time and the serve refuses)
              case ("percentile" | "percentile_approx" | "approx_percentile",
                  Seq(a: UnresolvedAttribute, l: Literal))
                  if !f.isDistinct &&
                    owner(a.nameParts.last).contains(fact) =>
                litDouble(l).map(p =>
                  Right((name, s"percentile:$p", Some(a.nameParts.last))))
              case ("median", Seq(a: UnresolvedAttribute))
                  if !f.isDistinct &&
                    owner(a.nameParts.last).contains(fact) =>
                Some(Right((name, "percentile:0.5", Some(a.nameParts.last))))
              case _ => None
            }
          case _ => None
        }
      if (classified.exists(_.isEmpty)) return None
      val parts = classified.flatten
      val keyIdx = parts.collect { case Left((_, i)) => i }
      val aggParts = parts.collect { case Right(p) => p }
      if (keyIdx.toSet != gNames.indices.toSet || aggParts.isEmpty)
        return None

      // one fresh blob per aggregated fact column, keyed (fk) — or,
      // under a residual fact filter, the COMPOSITE (fk, residCols...)
      // blob: entries whose residual components match the typed
      // literals collapse to per-fk payloads (stats by the exact
      // partial-key merge, HLLs by register-max union == distinct over
      // the filtered union, histograms by bucket addition — one grid
      // required, mismatches throw and the serve refuses). A fk whose
      // every entry is pruned contributes nothing — exactly the rows
      // the filter drops. A count(*)-only query anchors to any fresh
      // stats blob over the same key set.
      // blob key layout: (fk, factGroupCols...) are the QUERY columns
      // (the collapsed key — fact group components become served
      // GROUP BY dimensions), the residual literals prune, and any
      // FURTHER blob components collapse unconditionally (the wide-
      // blob marginal rule: a complete partition summed over an
      // unused dimension is the exact marginal) — all via the same
      // partial-key machinery the single-table serves use
      val nf = fkCols.size
      def collapsed(vc: String, tpe: String,
          merge: (Array[Byte], Array[Byte]) => Array[Byte])
          : Option[Map[(Seq[String], Seq[Option[String]]), Array[Byte]]] =
        partialGroupedBlobFor(fact, vc, tpe, fkCols ++ factGroupCols,
          resid, merge).map(_.collect {
            // NULL fk components never survive the equi-join
            case (k, b) if k.take(nf).forall(_.isDefined) =>
              ((k.take(nf).map(_.get), k.drop(nf)), b)
          }.toMap)
      def hllMergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] =
        graft.sketch.Hll.deserialize(a)
          .merge(graft.sketch.Hll.deserialize(b)).serialize
      val statsCols = aggParts.collect {
        case (_, fn, Some(c))
            if fn != "count_distinct" && !fn.startsWith("percentile:") =>
          c.toLowerCase
      }.distinct
      val distinctCols = aggParts.collect {
        case (_, "count_distinct", Some(c)) => c.toLowerCase
      }.distinct
      val pctCols = aggParts.collect {
        case (_, fn, Some(c)) if fn.startsWith("percentile:") =>
          c.toLowerCase
      }.distinct
      type CellKey = (Seq[String], Seq[Option[String]])
      val blobs: Map[String, Map[CellKey, GroupedStats.Stat]] =
        statsCols.map { vc =>
          collapsed(vc, "stats_grouped", statsMergeBytes) match {
            case Some(m) =>
              vc -> m.view.mapValues(GroupedStats.decode).toMap
            case None => return None
          }
        }.toMap
      val hllBlobs: Map[String, Map[CellKey, Array[Byte]]] =
        distinctCols.map { vc =>
          collapsed(vc, "hll_grouped", hllMergeBytes) match {
            case Some(m) => vc -> m
            case None    => return None
          }
        }.toMap
      val pctBlobs: Map[String, Map[CellKey, Array[Byte]]] =
        pctCols.map { vc =>
          (try collapsed(vc, "histogram_grouped", histMergeBytes)
          catch { case _: IllegalArgumentException => return None }) match {
            case Some(m) => vc -> m
            case None    => return None
          }
        }.toMap
      val hasCountStar = aggParts.exists(_._2 == "count_star")
      val anchorOpt: Option[Map[CellKey, GroupedStats.Stat]] =
        blobs.headOption.map(_._2).orElse {
          if (!hasCountStar) None
          else catalog.listSketches(Some(fact)).iterator
            .filter(_.sketchType == "stats_grouped")
            .map(s => collapsed(s.columnName, "stats_grouped",
              statsMergeBytes))
            .collectFirst { case Some(m) =>
              m.view.mapValues(GroupedStats.decode).toMap
            }
        }
      if (hasCountStar && anchorOpt.isEmpty) return None
      // complete group lists over the same (fact, fk) must agree — a
      // disagreement means a blob is mid-rebuild; refuse
      val keySet: Set[CellKey] =
        (anchorOpt.map(_.keySet) ++ blobs.values.map(_.keySet) ++
          hllBlobs.values.map(_.keySet) ++ pctBlobs.values.map(_.keySet))
          .headOption.getOrElse(return None)
      if (!(blobs.values.map(_.keySet) ++ hllBlobs.values.map(_.keySet) ++
          pctBlobs.values.map(_.keySet) ++
          anchorOpt.map(_.keySet)).forall(_ == keySet)) return None
      // fact group components per join key (the crossed-rollup axis)
      val factKeysByFk: Map[Seq[String], Seq[Seq[Option[String]]]] =
        keySet.toSeq.groupMap(_._1)(_._2)

      // dim scan restricted to the blob's keys (broadcast semi-join on
      // the fk TUPLE components), collected under a hard cap — the
      // fact is never read
      val keys = factKeysByFk.keySet.toSeq
      val dimRows: Seq[org.apache.spark.sql.Row] =
        if (keys.isEmpty) Nil
        else {
          import org.apache.spark.sql.functions.{broadcast, col}
          val keysDf = {
            val schema = StructType(pkCols.indices.map(i =>
              StructField(s"__k$i", StringType, nullable = false)))
            import scala.jdk.CollectionConverters._
            spark.createDataFrame(
              keys.map(t => org.apache.spark.sql.Row.fromSeq(t)).asJava,
              schema)
          }
          val cap = keys.size * 4 + 1
          // the DIM SIDE executes as real Spark joins (dims are the
          // small side — the fact is still never read): the oriented
          // dim-tree edges join parent-first, the dim-side WHERE
          // applies through its SQL rendering, and a shape the dims
          // cannot analyze refuses to the exact path
          val scan = try {
            var dimDf = spark.table(dimRoot)
            dimEdges.foreach { case (p, pks2, c2, cks2) =>
              val cond = pks2.zip(cks2)
                .map { case (a, b) => s"$a = $b" }.mkString(" AND ")
              dimDf = dimDf.join(spark.table(c2),
                org.apache.spark.sql.functions.expr(cond))
            }
            rest.reduceOption(
              org.apache.spark.sql.catalyst.expressions.And)
              .foreach(r => dimDf = dimDf.where(r.sql))
            val kCols = pkCols.indices.map(i => s"__k$i")
            dimDf
              .select(pkCols.zipWithIndex.map { case (p0, i) =>
                col(p0).cast("string").as(s"__k$i")
              } ++ dimGroupNames.map(col): _*)
              .join(broadcast(keysDf), kCols)
              .select(kCols.map(org.apache.spark.sql.functions.col) ++
                dimGroupNames.map(col): _*)
              .limit(cap).collect()
          } catch { case scala.util.control.NonFatal(_) => return None }
          if (scan.length >= cap) return None
          scan.toSeq
        }

      // fold each dim row's key stats (and HLL registers) into its
      // GROUP BY cell — stats merge exactly; HLLs by register-max
      // union, which is EXACTLY distinct-over-union: a value seen
      // under several fks of one cell counts once. Fact group keys
      // expand each dim row into one cell per recorded fact-component
      // tuple under its fk (the crossed rollup); their served values
      // parse back through the bijective key rendering.
      val statsOf: String => Map[CellKey, GroupedStats.Stat] = ck =>
        if (ck == "__anchor") anchorOpt.get else blobs(ck)
      val colKeys = anchorOpt.map(_ => "__anchor").toSeq ++ statsCols
      val cells = scala.collection.mutable.LinkedHashMap
        .empty[Seq[Any], (scala.collection.mutable.Map[String, GroupedStats.Stat],
          scala.collection.mutable.Map[String, graft.sketch.Hll],
          scala.collection.mutable.Map[String, Array[Byte]])]
      // per-group-grid histogram blobs make the bucket-count addition
      // throw on the first multi-fk cell — refuse to the exact path
      // (shared-grid builds merge; a single-fk cell merges trivially)
      try dimRows.foreach { r =>
        val k: Seq[String] = pkCols.indices.map(r.getString)
        factKeysByFk.get(k).toSeq.flatten.foreach { fkt =>
          val ck0: CellKey = (k, fkt)
          var di = nf - 1
          var fi = 0
          val cell: Seq[Any] = gKeys.zipWithIndex.map {
            case ((_, false), _) => di += 1; r.get(di)
            case ((_, true), gi) =>
              val v = typedKeyValue(attrFields(gi).dataType, fkt(fi))
              fi += 1; v
          }
          val (m, h, hg) = cells.getOrElseUpdate(cell,
            (scala.collection.mutable.Map.empty,
              scala.collection.mutable.Map.empty,
              scala.collection.mutable.Map.empty))
          colKeys.foreach { ck =>
            val st = statsOf(ck)(ck0)
            m(ck) = m.get(ck).fold(st)(GroupedStats.merge(_, st))
          }
          distinctCols.foreach { dc =>
            val hll = graft.sketch.Hll.deserialize(hllBlobs(dc)(ck0))
            h(dc) = h.get(dc).fold(hll)(_.merge(hll))
          }
          pctCols.foreach { pc =>
            val b = pctBlobs(pc)(ck0)
            hg(pc) = hg.get(pc).fold(b)(histMergeBytes(_, b))
          }
        }
      } catch { case _: IllegalArgumentException => return None }

      // the merged records must pass the same exactness proof as the
      // single-table grouped serve, per served function
      val mergedByCol: Map[String, Seq[GroupedStats.Stat]] =
        colKeys.map(ck => ck -> cells.values.map(_._1(ck)).toSeq).toMap
      val fnOk = aggParts.forall {
        case (_, "count_star", _)     => true
        case (_, "count_distinct", _) => true
        case (_, fn, _) if fn.startsWith("percentile:") => true
        case (_, fn, Some(vc)) =>
          statFnServesExactly(fact, vc, fn, mergedByCol(vc.toLowerCase))
        case _ => false
      }
      if (!fnOk) return None

      // the UNGROUPED star of zero joined rows is exact execution's
      // one-row answer: COUNTs are 0, everything else NULL
      val emptyUngrouped: Seq[org.apache.spark.sql.Row] =
        if (gKeys.isEmpty && cells.isEmpty)
          Seq(org.apache.spark.sql.Row.fromSeq(parts.map {
            case Right((_, "count_star" | "count" | "count_distinct", _)) =>
              0L
            case _ => null
          }))
        else Nil
      val rows = emptyUngrouped ++ cells.toSeq.map { case (cell, (m, h, hg)) =>
        org.apache.spark.sql.Row.fromSeq(parts.map {
          case Left((_, i))                => cell(i)
          case Right((_, "count_star", _)) => m("__anchor").nrows
          case Right((_, "count_distinct", Some(vc))) =>
            h(vc.toLowerCase).count
          case Right((_, fn, Some(vc))) if fn.startsWith("percentile:") =>
            val p = fn.stripPrefix("percentile:").toDouble
            val b = hg(vc.toLowerCase)
            // empty payload = every contributing fk group was all-NULL:
            // the exact percentile is NULL too
            if (b.isEmpty) null
            else Double.box(graft.sketch.Histogram.deserialize(b)
              .percentile(p))
          case Right((_, fn, Some(vc))) =>
            val st = m(vc.toLowerCase)
            fn match {
              case "min"          => st.min.map(Double.box).orNull
              case "max"          => st.max.map(Double.box).orNull
              case "count"        => st.nnull
              case "sum"          => st.sumDouble.map(Double.box).orNull
              case "avg" | "mean" => st.avgDouble.map(Double.box).orNull
            }
          case Right((_, _, None)) => return None // unreachable
        })
      }
      val schema = StructType(parts.map {
        case Left((n, i)) =>
          StructField(n, attrFields(i).dataType, nullable = true)
        case Right((n, fn, _)) =>
          if (fn == "count" || fn == "count_star" || fn == "count_distinct")
            StructField(n, LongType, nullable = false)
          else StructField(n, DoubleType, nullable = true)
      })
      // distinct estimates carry the grouped HLL's standard error
      // (register-max merges don't change m); merged percentiles one
      // bucket width of the merged grid; everything else is exact
      val hllErr =
        if (distinctCols.isEmpty) 0.0
        else {
          val m0 = hllBlobs.values.headOption.flatMap(_.values.headOption)
            .map(b => graft.sketch.Hll.deserialize(b).m.toDouble)
            .getOrElse(4096.0)
          1.04 / math.sqrt(m0)
        }
      val pctErr = cells.values.iterator
        .flatMap(_._3.values)
        .filter(_.nonEmpty)
        .map(b => 1.0 / graft.sketch.Histogram.deserialize(b).buckets)
        .foldLeft(0.0)(math.max)
      val err = math.max(hllErr, pctErr)
      import scala.jdk.CollectionConverters._
      Some((spark.createDataFrame(rows.asJava, schema), fact,
        s"star aggregate over $fact ⋈ ${dims.mkString(" ⋈ ")} served " +
          s"from the fact's grouped blobs on ${fkCols.mkString(",")} " +
          s"(${keys.size} fact " +
          "groups merged; stats exact, distinct counts by register-max " +
          "HLL union; dim-side-only scan, fact never read)", err))
    }
    tables.view.flatMap(t => tryOrient(t)).headOption
  }

  /** STAR-RANGE serve: `SELECT dim_attr..., count(*) / sum(v) / avg(v)
    * / percentile(v, p) FROM fact ⋈ dim [⋈ subdim...] WHERE <range on
    * fact.v> [AND dim-side predicates] GROUP BY dim_attrs` — the
    * drill-down form of the star dashboard (a value band on the fact
    * measure, grouped by dim attributes) with the FACT never scanned.
    *
    * Mechanism: the fact's fk-keyed `histogram_grouped` blob on the
    * range column supplies per-join-key bucket counts; the dim side
    * executes exactly like [[storedStarAggAnswer]] (real small-table
    * joins restricted to the blob's bounded key set, dim-side WHERE
    * applied there); each GROUP BY cell MERGES its contributing fks'
    * histograms (bucket counts add — one grid required, so per-group-
    * grid builds refuse on multi-fk cells exactly like the star
    * percentile) and the single-table range arithmetic runs once per
    * cell: counts from clipped bucket masses
    * ([[graft.sketch.Histogram.rangeCount]]), sums from the
    * `histsum_grouped` rider (per-cell exact BigInt addition of the
    * per-(fk, bucket) scale-4 decimal sums, boundary buckets
    * fractional), AVG one division, percentiles by the range-segment
    * walk. Error = the merged boundary-mass ratios per output kind
    * (plus one bucket width for percentiles), max over cells — the
    * same bound the grouped-range serve reports.
    *
    * The exact star path ([[storedStarAggAnswer]]) refuses any
    * fact-side predicate because it changes what the blob's totals
    * mean; this path is its approximate complement for the one
    * predicate family histograms model. Cells with no estimated
    * in-range mass emit no row (the grouped-range contract: a
    * superset-of-exact row set is possible near bucket boundaries).
    * At 100 TB the exact side pays the filtered fact scan + join
    * shuffle; the serve stays dim-sized.
    */
  private def storedStarRangeAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      tables: Seq[String]): Option[(DataFrame, String, String, Double)] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
    import org.apache.spark.sql.catalyst.plans.Inner
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, SubqueryAlias}
    import org.apache.spark.sql.types._
    if (tables.sizeIs < 2) return None
    // GROUP BY shapes parse as Aggregate; UNGROUPED aggregates parse
    // as a bare Project over the join (the analyzer's GlobalAggregates
    // rule runs later) — both fold here, the ungrouped form into ONE
    // cell (round 10). Plain projections refuse at classification.
    val (aggOuts, aggChild, grouping) = parsed match {
      case a: Aggregate =>
        (a.aggregateExpressions, a.child, a.groupingExpressions)
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        (p.projectList, p.child,
          Seq.empty[org.apache.spark.sql.catalyst.expressions.Expression])
      case _ => return None
    }
    val (whereCond, joinChild) = aggChild match {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(c, ch) =>
        (Some(c), ch)
      case ch => (None, ch)
    }
    // without a WHERE there is no range — that shape belongs to the
    // exact star serve
    if (whereCond.isEmpty) return None
    val extraneous = joinChild.collect {
      case n if !n.isInstanceOf[Join] && !n.isInstanceOf[SubqueryAlias] &&
        !n.isInstanceOf[UnresolvedRelation] => n
    }
    if (extraneous.nonEmpty) return None
    val joins = joinChild.collect { case j: Join => j }
    if (joins.sizeIs != tables.size - 1 ||
        !joins.forall(j => j.joinType == Inner && j.condition.isDefined))
      return None
    def colSet(t: String) = spark.table(t).columns.map(_.toLowerCase).toSet
    def keyKind(t: String, c: String): Char =
      spark.table(t).schema.fields
        .find(_.name.equalsIgnoreCase(c)).map(_.dataType) match {
        case Some(StringType) => 's'
        case Some(ByteType | ShortType | IntegerType | LongType) => 'i'
        case _ => 'x'
      }
    def attrName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case _                      => None
    }
    def litDouble(l: Literal): Option[Double] = l.value match {
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case n: Number                             => Some(n.doubleValue())
      case _                                     => None
    }
    val colSets: Map[String, Set[String]] = tables.map(t => t -> colSet(t)).toMap
    def owner(col: String): Option[String] = {
      val os = tables.filter(t => colSets(t).contains(col.toLowerCase))
      if (os.sizeIs == 1) Some(os.head) else None
    }
    def tryOrient(fact: String): Option[(DataFrame, String, String, Double)] = {
      val edges = joinTreeEdges(parsed, tables, fact).getOrElse(return None)
      val factEdges = edges.filter(_._1 == fact)
      val (fk, dimRoot, pk) = factEdges match {
        case Seq((_, fks, dr, pks)) if fks.sizeIs == 1 =>
          (fks.head, dr, pks.head)
        case _ => return None
      }
      val dimEdges = edges.filterNot(_._1 == fact)
      val dims = tables.filterNot(_ == fact)
      def dimOwned(col: String): Boolean = owner(col).exists(_ != fact)
      val kk = keyKind(fact, fk)
      if (kk == 'x' || kk != keyKind(dimRoot, pk)) return None
      // split the WHERE: range comparisons on ONE fact-owned numeric
      // column feed the histogram arithmetic; every remaining conjunct
      // must reference only dim columns (it applies to the dim scan,
      // restricting which dim rows fold — inner-join semantics) with
      // no subqueries. Anything else refuses to the exact path.
      val conj = conjunctsOf(whereCond.get)
      def factCmpCol(e: Expression): Option[String] = e match {
        case GreaterThan(a: UnresolvedAttribute, _: Literal) => Some(a.nameParts.last)
        case GreaterThanOrEqual(a: UnresolvedAttribute, _: Literal) => Some(a.nameParts.last)
        case LessThan(a: UnresolvedAttribute, _: Literal) => Some(a.nameParts.last)
        case LessThanOrEqual(a: UnresolvedAttribute, _: Literal) => Some(a.nameParts.last)
        case GreaterThan(_: Literal, a: UnresolvedAttribute) => Some(a.nameParts.last)
        case GreaterThanOrEqual(_: Literal, a: UnresolvedAttribute) => Some(a.nameParts.last)
        case LessThan(_: Literal, a: UnresolvedAttribute) => Some(a.nameParts.last)
        case LessThanOrEqual(_: Literal, a: UnresolvedAttribute) => Some(a.nameParts.last)
        case _ => None
      }
      val (cmps, rest0) = conj.partition(e =>
        factCmpCol(e).exists(c0 => owner(c0).contains(fact)))
      if (cmps.isEmpty) return None
      val (c, lowerB, upperB) = rangeBounds(cmps.reduce(
        org.apache.spark.sql.catalyst.expressions.And))
        .getOrElse(return None)
      if (!numericColumn(fact, c)) return None
      // remaining fact-side conjuncts must be equality/IN on other
      // columns — they prune the COMPOSITE (fk, residCols...) blob
      // and collapse to per-fk histograms + riders (round 10), the
      // `WHERE flag = 'A' AND price band GROUP BY nation` drill-down
      import org.apache.spark.sql.catalyst.expressions.{EqualTo, In}
      def factEq(e: Expression): Option[(String, Seq[String])] = e match {
        case EqualTo(a: UnresolvedAttribute, l: Literal) =>
          typedLitKey(fact, a.nameParts.last, l)
            .map(v => (a.nameParts.last, Seq(v)))
        case EqualTo(l: Literal, a: UnresolvedAttribute) =>
          typedLitKey(fact, a.nameParts.last, l)
            .map(v => (a.nameParts.last, Seq(v)))
        case In(a: UnresolvedAttribute, lits)
            if lits.nonEmpty && lits.forall(_.isInstanceOf[Literal]) =>
          typedInListKeys(fact, a.nameParts.last, lits)
            .map(vs => (a.nameParts.last, vs))
        case _ => None
      }
      val (factRest, rest) = rest0.partition(e =>
        e.collect { case a: UnresolvedAttribute => a.nameParts.last }
          .exists(c0 => owner(c0).contains(fact)))
      val residOpt = factRest.map(factEq)
      if (residOpt.exists(_.isEmpty)) return None
      val resid: Seq[(String, Seq[String])] = residOpt.flatten
      val residCols = resid.map(_._1)
      if (residCols.map(_.toLowerCase).distinct.sizeIs != residCols.size ||
          residCols.exists(rc => rc.equalsIgnoreCase(fk) ||
            rc.equalsIgnoreCase(c))) return None
      val restOk = rest.forall { r =>
        val attrs = r.collect { case a: UnresolvedAttribute => a.nameParts.last }
        attrs.nonEmpty && attrs.forall(dimOwned) &&
          r.find {
            case _: org.apache.spark.sql.catalyst.expressions.SubqueryExpression => true
            case _: UnresolvedStar => true
            case _ => false
          }.isEmpty
      }
      if (!restOk) return None
      // group keys: bare, unambiguous dim attributes of atomic type
      val gOpt = grouping.map {
        case a: UnresolvedAttribute if dimOwned(a.nameParts.last) =>
          Some(a.nameParts.last)
        case _ => None
      }
      if (gOpt.exists(_.isEmpty)) return None
      val gNames = gOpt.flatten
      val lower = gNames.map(_.toLowerCase)
      val attrFields = gNames.map { n =>
        dims.iterator
          .flatMap(t => spark.table(t).schema.fields
            .find(_.name.equalsIgnoreCase(n)))
          .nextOption().getOrElse(return None)
      }
      val atomicOk = attrFields.forall(_.dataType match {
        case StringType | BooleanType | ByteType | ShortType |
            IntegerType | LongType | FloatType | DoubleType | DateType |
            TimestampType => true
        case _: DecimalType => true
        case _              => false
      })
      if (!atomicOk) return None

      // outputs: group keys through; count(*); sum/avg/percentile of
      // the RANGE column itself (the histogram models exactly that
      // distribution — any other value column refuses)
      sealed trait AggOut
      case object CntA extends AggOut
      case object SumA extends AggOut
      case object AvgA extends AggOut
      case class PctA(p: Double) extends AggOut
      var sawAgg = false
      val classified: Seq[Option[Either[(String, Int), (String, AggOut)]]] =
        aggOuts.map {
          case a: UnresolvedAttribute
              if lower.contains(a.nameParts.last.toLowerCase) =>
            Some(Left((a.nameParts.last,
              lower.indexOf(a.nameParts.last.toLowerCase))))
          case Alias(e, name)
              if attrName(e).orElse(exprKeyName(e)).exists(n => lower.contains(n.toLowerCase)) =>
            Some(Left((name, lower.indexOf(attrName(e).orElse(exprKeyName(e)).get.toLowerCase))))
          case Alias(f: UnresolvedFunction, name)
              if f.filter.isEmpty && !f.isDistinct =>
            (f.nameParts.last.toLowerCase, f.arguments) match {
              case ("count", Seq(_: UnresolvedStar)) =>
                sawAgg = true; Some(Right((name, CntA)))
              case ("count", Seq(Literal(v: Number, _))) if v.intValue == 1 =>
                sawAgg = true; Some(Right((name, CntA)))
              case ("sum", Seq(a: UnresolvedAttribute))
                  if a.nameParts.last.equalsIgnoreCase(c) =>
                sawAgg = true; Some(Right((name, SumA)))
              case ("avg" | "mean", Seq(a: UnresolvedAttribute))
                  if a.nameParts.last.equalsIgnoreCase(c) =>
                sawAgg = true; Some(Right((name, AvgA)))
              case ("percentile" | "percentile_approx" | "approx_percentile",
                  Seq(a: UnresolvedAttribute, l: Literal))
                  if a.nameParts.last.equalsIgnoreCase(c) =>
                litDouble(l).map { p => sawAgg = true; Right((name, PctA(p))) }
              case ("median", Seq(a: UnresolvedAttribute))
                  if a.nameParts.last.equalsIgnoreCase(c) =>
                sawAgg = true; Some(Right((name, PctA(0.5))))
              case _ => None
            }
          case _ => None
        }
      if (classified.exists(_.isEmpty) || !sawAgg) return None
      val parts = classified.flatten
      val keyIdx = parts.collect { case Left((_, i)) => i }
      if (keyIdx.toSet != gNames.indices.toSet) return None
      val needSums = parts.exists {
        case Right((_, SumA | AvgA)) => true
        case _                       => false
      }

      // the fact's histogram blob on the range column, keyed (fk) —
      // or, under a residual fact filter, the COMPOSITE (fk,
      // residCols...) blob: matching entries collapse per fk (bucket
      // counts add — one grid required, mismatches refuse; an entry
      // whose rider is missing or overflow-poisoned refuses rather
      // than inventing zeros). A fk whose every entry prunes
      // contributes nothing — the rows the filter drops.
      val lookupCols = fk +: residCols
      def residMatch(k: Seq[Option[String]]): Boolean =
        k.head.isDefined && resid.zipWithIndex.forall {
          case ((_, vs), i) => k(i + 1).exists(vs.contains)
        }
      val prunedHist: Seq[(Seq[Option[String]], Array[Byte])] =
        groupedBlobFor(fact, c, "histogram_grouped", lookupCols) match {
          case Some(entries) => entries.filter(e => residMatch(e._1))
          case None          => return None
        }
      val histMap: Map[String, Array[Byte]] =
        try prunedHist.groupBy(_._1.head.get).view
          .mapValues(es => es.map(_._2).reduce(histMergeBytes)).toMap
        catch { case _: IllegalArgumentException => return None }
      val sumsByKey: Map[String, Map[Int, BigInt]] =
        if (!needSums) Map.empty
        else if (!riderInSync(fact, c, "histogram_grouped",
            "histsum_grouped"))
          return None // rider a batch behind the counts
        else groupedBlobFor(fact, c, "histsum_grouped", lookupCols) match {
          case Some(se) =>
            val byTuple = se.toMap
            prunedHist.filter(_._2.nonEmpty).groupBy(_._1.head.get)
              .view.mapValues { es =>
                var bs = Map.empty[Int, BigInt]
                es.foreach { case (k, _) =>
                  byTuple.get(k) match {
                    case None => return None // rider lacks the cell
                    case Some(inner) =>
                      val m = graft.sketch.GroupedHll.unpack(inner)
                        .collect { case (Some(bk), bb) =>
                          bk.toInt -> BigInt(bb)
                        }
                      // empty sums under positive mass = the streaming
                      // overflow poison — refuse, never a silent zero
                      if (m.isEmpty) return None
                      m.foreach { case (i, v0) =>
                        bs = bs.updated(i, bs.getOrElse(i, BigInt(0)) + v0)
                      }
                  }
                }
                bs
              }.toMap
          case None => return None
        }
      val keySet = histMap.keySet

      // dim scan restricted to the blob's keys, exactly like the star
      // serve: real dim-tree joins, dim-side WHERE, broadcast
      // semi-join on the key set, hard collect cap
      val keys = keySet.toSeq
      val dimRows: Seq[org.apache.spark.sql.Row] =
        if (keys.isEmpty) Nil
        else {
          import org.apache.spark.sql.functions.{broadcast, col}
          val keysDf = {
            import spark.implicits._
            keys.toDF("__k")
          }
          val cap = keys.size * 4 + 1
          val scan = try {
            var dimDf = spark.table(dimRoot)
            dimEdges.foreach { case (p, pks2, c2, cks2) =>
              val cond2 = pks2.zip(cks2)
                .map { case (a, b) => s"$a = $b" }.mkString(" AND ")
              dimDf = dimDf.join(spark.table(c2),
                org.apache.spark.sql.functions.expr(cond2))
            }
            rest.reduceOption(
              org.apache.spark.sql.catalyst.expressions.And)
              .foreach(r => dimDf = dimDf.where(r.sql))
            dimDf
              .select(col(pk).cast("string").as("__k") +:
                gNames.map(col): _*)
              .join(broadcast(keysDf), "__k")
              .select(org.apache.spark.sql.functions.col("__k") +:
                gNames.map(col): _*)
              .limit(cap).collect()
          } catch { case scala.util.control.NonFatal(_) => return None }
          if (scan.length >= cap) return None
          scan.toSeq
        }

      // fold each dim row's fk histogram (and rider) into its cell:
      // bucket counts add on ONE grid (Histogram.merge throws on a
      // grid mismatch — per-group-grid builds refuse multi-fk cells),
      // rider sums add exactly (BigInt). An all-NULL fk (empty
      // payload) contributes nothing; a poisoned rider (empty sum map
      // under positive mass) refuses the serve.
      val cells = scala.collection.mutable.LinkedHashMap
        .empty[Seq[Any], (Array[Byte], Map[Int, BigInt])]
      try dimRows.foreach { r =>
        val k = r.getString(0)
        if (keySet.contains(k)) {
          val cell: Seq[Any] = (1 to gNames.size).map(r.get)
          val (hb, sb) = cells.getOrElse(cell, (Array.emptyByteArray,
            Map.empty[Int, BigInt]))
          val b = histMap(k)
          val merged = histMergeBytes(hb, b)
          val sums =
            if (!needSums || b.isEmpty) sb
            else sumsByKey.get(k) match {
              case None                     => return None
              case Some(m) if m.isEmpty     => return None
              case Some(m) =>
                m.foldLeft(sb) { case (acc, (i, v0)) =>
                  acc.updated(i, acc.getOrElse(i, BigInt(0)) + v0)
                }
            }
          cells(cell) = (merged, sums)
        }
      } catch { case _: IllegalArgumentException => return None }

      // one range-arithmetic pass per cell — the single-table
      // grouped-range serve's estimates over the merged masses
      val served = cells.toSeq.flatMap { case (cell, (hb, bs)) =>
        if (hb.isEmpty) None
        else {
          val h = graft.sketch.Histogram.deserialize(hb)
          val (est, bnd) = h.rangeCount(lowerB, upperB)
          if (est <= 0.0) None
          else {
            val cntRel = bnd / math.max(1.0, est)
            val (sumEst, sumBnd): (Option[Double], Double) =
              if (!needSums) (None, 0.0)
              else {
                def d(i: Int): Double = new java.math.BigDecimal(
                  bs.getOrElse(i, BigInt(0)).bigInteger, 4).doubleValue
                h.rangePositions(lowerB, upperB) match {
                  case None => (None, 0.0)
                  case Some((pa, pb, ia, ib)) if ia == ib =>
                    (Some(d(ia) * (pb - pa)), math.abs(d(ia)))
                  case Some((pa, pb, ia, ib)) =>
                    var interior = BigInt(0)
                    var j = ia + 1
                    while (j < ib) {
                      interior += bs.getOrElse(j, BigInt(0)); j += 1
                    }
                    val interiorD = new java.math.BigDecimal(
                      interior.bigInteger, 4).doubleValue
                    (Some((interiorD +
                      d(ia) * ((ia + 1).toDouble - pa)) +
                      d(ib) * (pb - ib.toDouble)),
                      math.abs(d(ia)) + math.abs(d(ib)))
                }
              }
            val sumRel = sumEst match {
              case Some(s0) if s0 != 0.0   => sumBnd / math.abs(s0)
              case Some(_) if sumBnd > 0.0 => Double.PositiveInfinity
              case _                       => 0.0
            }
            Some((cell, h, est, cntRel, sumEst, sumRel))
          }
        }
      }
      // ungrouped band with no estimated in-range mass: exact
      // execution still returns one row (count 0, sums NULL)
      val emptyUngrouped: Seq[org.apache.spark.sql.Row] =
        if (gNames.isEmpty && served.isEmpty)
          Seq(org.apache.spark.sql.Row.fromSeq(parts.map {
            case Right((_, CntA)) => Double.box(0.0)
            case _                => null
          }))
        else Nil
      val rows = emptyUngrouped ++ served.map { case (cell, h, est, _, sumEst, _) =>
        org.apache.spark.sql.Row.fromSeq(parts.map {
          case Left((_, i))        => cell(i)
          case Right((_, CntA))    => Double.box(est)
          case Right((_, SumA))    => sumEst.map(Double.box).orNull
          case Right((_, AvgA))    =>
            sumEst.map(s0 => Double.box(s0 / est)).orNull
          case Right((_, PctA(p))) =>
            h.rangePercentile(lowerB, upperB, p).map(Double.box).orNull
        })
      }
      val schema = StructType(parts.map {
        case Left((n, i)) =>
          StructField(n, attrFields(i).dataType, nullable = true)
        case Right((n, a)) =>
          StructField(n, DoubleType, nullable = a != CntA)
      })
      val maxCnt = served.map(_._4).foldLeft(0.0)(math.max)
      val maxSum = served.map(_._6).foldLeft(0.0)(math.max)
      val bucketTerm = parts.collectFirst {
        case Right((_, PctA(_))) => served.map { case (_, h, _, _, _, _) =>
          1.0 / h.buckets }.foldLeft(0.0)(math.max)
      }.getOrElse(0.0)
      val err = parts.map {
        case Right((_, CntA))    => maxCnt
        case Right((_, SumA))    => maxSum
        case Right((_, AvgA))    => maxCnt + maxSum
        case Right((_, PctA(_))) => bucketTerm + maxCnt
        case Left(_)             => 0.0
      }.foldLeft(0.0)(math.max)
      import scala.jdk.CollectionConverters._
      Some((spark.createDataFrame(rows.asJava, schema), fact,
        s"star range aggregate over $fact ⋈ ${dims.mkString(" ⋈ ")}: " +
          s"$c band interpolated from the fact's fk-keyed histogram" +
          (if (needSums) " + sum rider" else "") +
          s" blobs on $fk (${keys.size} fact groups; bucket counts and " +
          "decimal sums merged per cell; dim-side-only scan, fact " +
          "never read)", err))
    }
    tables.view.flatMap(t => tryOrient(t)).headOption
  }

  /** The star-aggregate SHAPE as advisor candidates: the same match as
    * [[storedStarAggAnswer]] minus the blob requirement. When a
    * fact ⋈ dim aggregate GROUPs BY dim attributes and aggregates fact
    * columns with servable functions, a grouped-histogram build on the
    * FACT keyed by its join key flips the query to the (exact) star
    * serve — strictly better advice than an AGMS pair for this shape.
    * Orientation comes from the shape itself: group keys live on one
    * side only, aggregated columns on the other. count(*)-only queries
    * advise nothing here (no canonical value column to build on); the
    * generic join-AQP advice still applies.
    */
  private def starAdviceCandidates(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      tables: Seq[String]): Seq[graft.learn.SketchAdvisor.Candidate] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
    import org.apache.spark.sql.catalyst.plans.Inner
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, SubqueryAlias}
    import org.apache.spark.sql.types._
    import graft.learn.SketchAdvisor.Candidate
    if (tables.sizeIs < 2) return Nil
    // UNGROUPED aggregates parse as a bare Project (round 10): the
    // headline-KPI star misses advise too
    val (aggOuts, aggChild, grouping) = parsed match {
      case a: Aggregate =>
        (a.aggregateExpressions, a.child, a.groupingExpressions)
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        (p.projectList, p.child,
          Seq.empty[org.apache.spark.sql.catalyst.expressions.Expression])
      case _ => return Nil
    }
    // optional WHERE: advisable only when dim-side (the serve's rule)
    val (whereCond, joinChild) = aggChild match {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(c, ch) =>
        (Some(c), ch)
      case ch => (None, ch)
    }
    val extraneous = joinChild.collect {
      case n if !n.isInstanceOf[Join] && !n.isInstanceOf[SubqueryAlias] &&
        !n.isInstanceOf[UnresolvedRelation] => n
    }
    if (extraneous.nonEmpty) return Nil
    val joins = joinChild.collect { case j: Join => j }
    if (joins.sizeIs != tables.size - 1 ||
        !joins.forall(j => j.joinType == Inner && j.condition.isDefined))
      return Nil
    def colSet(t: String) = spark.table(t).columns.map(_.toLowerCase).toSet
    def keyKind(t: String, c: String): Char =
      spark.table(t).schema.fields
        .find(_.name.equalsIgnoreCase(c)).map(_.dataType) match {
        case Some(StringType) => 's'
        case Some(ByteType | ShortType | IntegerType | LongType) => 'i'
        case _ => 'x'
      }
    def attrName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case _                      => None
    }
    val statsFns = Set("min", "max", "count", "sum", "avg", "mean")
    val colSets: Map[String, Set[String]] = tables.map(t => t -> colSet(t)).toMap
    def owner(col: String): Option[String] = {
      val os = tables.filter(t => colSets(t).contains(col.toLowerCase))
      if (os.sizeIs == 1) Some(os.head) else None
    }
    def orient(fact: String): Seq[Candidate] = {
      val edges = joinTreeEdges(parsed, tables, fact).getOrElse(return Nil)
      val (fk, dimRoot) = edges.filter(_._1 == fact) match {
        case Seq((_, fks, dr, _)) if fks.sizeIs == 1 => (fks.head, dr)
        case _                                       => return Nil
      }
      val pk = edges.find(_._1 == fact).get._4.head
      def dimOwned(col: String): Boolean = owner(col).exists(_ != fact)
      val fCols = colSet(fact)
      val kk = keyKind(fact, fk)
      if (kk == 'x' || kk != keyKind(dimRoot, pk)) return Nil
      // fact-side RANGE conjuncts on one numeric column make this the
      // star-RANGE shape: the advisable build is the SHARED-GRID
      // grouped histogram (its sum rider feeds the band's sums and
      // the shared grid lets multi-fk cells merge); every remaining
      // conjunct must be dim-side, as for the exact star
      import org.apache.spark.sql.catalyst.expressions.{GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
      def factCmpCol(e: Expression): Option[String] = e match {
        case GreaterThan(a: UnresolvedAttribute, _: Literal) => Some(a.nameParts.last)
        case GreaterThanOrEqual(a: UnresolvedAttribute, _: Literal) => Some(a.nameParts.last)
        case LessThan(a: UnresolvedAttribute, _: Literal) => Some(a.nameParts.last)
        case LessThanOrEqual(a: UnresolvedAttribute, _: Literal) => Some(a.nameParts.last)
        case GreaterThan(_: Literal, a: UnresolvedAttribute) => Some(a.nameParts.last)
        case GreaterThanOrEqual(_: Literal, a: UnresolvedAttribute) => Some(a.nameParts.last)
        case LessThan(_: Literal, a: UnresolvedAttribute) => Some(a.nameParts.last)
        case LessThanOrEqual(_: Literal, a: UnresolvedAttribute) => Some(a.nameParts.last)
        case _ => None
      }
      val conj = whereCond.map(conjunctsOf).getOrElse(Nil)
      val (cmps, rest) = conj.partition(e =>
        factCmpCol(e).exists(c0 => owner(c0).contains(fact)))
      val rangeCol: Option[String] =
        if (cmps.isEmpty) None
        else Some(rangeBounds(cmps.reduce(
          org.apache.spark.sql.catalyst.expressions.And))
          .map(_._1).filter(numericColumn(fact, _)).getOrElse(return Nil))
      val whereOk = rest.forall { c =>
        val attrs = c.collect {
          case a: UnresolvedAttribute => a.nameParts.last
        }
        attrs.nonEmpty && attrs.forall(dimOwned)
      }
      if (!whereOk) return Nil
      val gOk = grouping.forall {
        case a: UnresolvedAttribute => dimOwned(a.nameParts.last)
        case _                      => false
      }
      if (!gOk) return Nil
      val lower = grouping.collect {
        case a: UnresolvedAttribute => a.nameParts.last.toLowerCase
      }
      // value col -> advised build type: stats fns need the grouped
      // histogram (its stats_grouped rider feeds the serve); distinct
      // counts need the grouped HLL
      val vcs = rangeCol match {
        // star-RANGE shape: only count(*) / sum / avg / percentile OF
        // THE RANGE COLUMN are servable (the histogram models exactly
        // that distribution), all from the shared-grid build on it —
        // count(*)-only queries DO advise here (the band itself names
        // the value column to build on)
        case Some(rc) => aggOuts.map {
          case a: UnresolvedAttribute
              if lower.contains(a.nameParts.last.toLowerCase) => Some(None)
          case Alias(e, _)
              if attrName(e).orElse(exprKeyName(e)).exists(n => lower.contains(n.toLowerCase)) =>
            Some(None)
          case Alias(f: UnresolvedFunction, _)
              if f.filter.isEmpty && !f.isDistinct =>
            (f.nameParts.last.toLowerCase, f.arguments) match {
              case ("count", Seq(_: UnresolvedStar)) =>
                Some(Some((rc, "histogram_grouped_shared")))
              case ("count", Seq(Literal(v: Number, _))) if v.intValue == 1 =>
                Some(Some((rc, "histogram_grouped_shared")))
              case ("sum" | "avg" | "mean", Seq(a: UnresolvedAttribute))
                  if a.nameParts.last.equalsIgnoreCase(rc) =>
                Some(Some((rc, "histogram_grouped_shared")))
              case ("percentile" | "percentile_approx" | "approx_percentile",
                  Seq(a: UnresolvedAttribute, _: Literal))
                  if a.nameParts.last.equalsIgnoreCase(rc) =>
                Some(Some((rc, "histogram_grouped_shared")))
              case ("median", Seq(a: UnresolvedAttribute))
                  if a.nameParts.last.equalsIgnoreCase(rc) =>
                Some(Some((rc, "histogram_grouped_shared")))
              case _ => None
            }
          case _ => None
        }
        case None => aggOuts.map {
          case a: UnresolvedAttribute
              if lower.contains(a.nameParts.last.toLowerCase) => Some(None)
          case Alias(e, _)
              if attrName(e).orElse(exprKeyName(e)).exists(n => lower.contains(n.toLowerCase)) =>
            Some(None)
          case Alias(f: UnresolvedFunction, _) if f.filter.isEmpty =>
            (f.nameParts.last.toLowerCase, f.arguments) match {
              case ("count", Seq(_: UnresolvedStar)) if !f.isDistinct =>
                Some(None)
              case ("count", Seq(Literal(v: Number, _)))
                  if !f.isDistinct && v.intValue == 1 =>
                Some(None)
              case ("count", Seq(a: UnresolvedAttribute))
                  if f.isDistinct &&
                    owner(a.nameParts.last).contains(fact) =>
                Some(Some((a.nameParts.last, "hll_grouped")))
              case (fn, Seq(a: UnresolvedAttribute))
                  if !f.isDistinct && statsFns(fn) &&
                    owner(a.nameParts.last).contains(fact) =>
                Some(Some((a.nameParts.last, "histogram_grouped")))
              // star percentiles merge fk histograms per dim cell, which
              // only a SHARED-GRID build supports
              case ("percentile" | "percentile_approx" | "approx_percentile",
                  Seq(a: UnresolvedAttribute, _: Literal))
                  if !f.isDistinct &&
                    owner(a.nameParts.last).contains(fact) =>
                Some(Some((a.nameParts.last, "histogram_grouped_shared")))
              case ("median", Seq(a: UnresolvedAttribute))
                  if !f.isDistinct &&
                    owner(a.nameParts.last).contains(fact) =>
                Some(Some((a.nameParts.last, "histogram_grouped_shared")))
              case _ => None
            }
          case _ => None
        }
      }
      if (vcs.exists(_.isEmpty)) return Nil
      vcs.flatten.flatten.distinct.map { case (vc, tpe) =>
        Candidate(fact, vc, tpe, Some(fk))
      }
    }
    tables.view.map(orient).find(_.nonEmpty).getOrElse(Nil)
  }

  /** If the query is `SELECT g... FROM table GROUP BY g...` or
    * `SELECT DISTINCT g... FROM table` with NO aggregate outputs, the
    * distinct key tuples are exactly the recorded group set of any
    * fresh grouped blob over the same column SET — zero scan, ZERO
    * error: the builders refuse to build past MaxHllGroups, so a
    * stored blob always holds the COMPLETE group list (incl. the NULL
    * group), and the freshness guard retires it when the table
    * changes size. Served keys are the builders' string renderings,
    * so every queried column must be string-typed in the base table
    * (a numeric column would change the result schema — refuse to the
    * scan). A key filter (`WHERE g = lit` / `g IN`) prunes to the
    * named keys; a residual filter on a composite blob's other
    * components prunes entries then projects (the partial-key
    * dispatch — payloads are irrelevant here, only keys survive).
    */
  private def storedDistinctAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String): Option[DataFrame] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, NamedExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Distinct, LogicalPlan, Project}
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    def attrName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case _                      => None
    }
    val shape: Option[(Seq[Expression], Seq[NamedExpression], LogicalPlan)] =
      parsed match {
        case Aggregate(gs, outs, child, _) if gs.nonEmpty =>
          Some((gs, outs, child))
        // SELECT DISTINCT over plain attributes == GROUP BY them
        case Distinct(Project(outs, child))
            if outs.nonEmpty && outs.forall(o =>
              attrName(o).isDefined || o.isInstanceOf[Alias]) =>
          Some((outs.map(identity[Expression]), outs, child))
        case _ => None
      }
    val (gs, outs, child) = shape.getOrElse(return None)
    val d = aggregateGroupKeys(gs, child, table).getOrElse(return None)
    val lower = d.gNames.map(_.toLowerCase)
    // every output must be a bare group key (attr or alias of one)
    val parts: Seq[(String, Int)] = outs.map {
      case a: UnresolvedAttribute
          if lower.contains(a.nameParts.last.toLowerCase) =>
        (a.nameParts.last, lower.indexOf(a.nameParts.last.toLowerCase))
      case Alias(e, name)
          if attrName(e).orElse(exprKeyName(e)).exists(n => lower.contains(n.toLowerCase)) =>
        (name, lower.indexOf(attrName(e).orElse(exprKeyName(e)).get.toLowerCase))
      case _ => return None
    }
    if (parts.map(_._2).toSet != d.gNames.indices.toSet) return None
    // key typing gate: string keys verbatim, integral keys parsed back
    // (bijective rendering); other types refuse
    val kTypes = keyFieldTypes(table, d.gNames).getOrElse(return None)
    // any fresh grouped blob over the right column set carries the
    // complete key list — search the catalog across value columns
    val groupedTypes =
      Set("stats_grouped", "hll_grouped", "histogram_grouped", "hdr_grouped")
    val keys: Seq[Seq[Option[String]]] = catalog.listSketches(Some(table))
      .iterator
      .filter(s => groupedTypes.contains(s.sketchType))
      .map { s =>
        if (d.residual.isEmpty)
          groupedBlobFor(table, s.columnName, s.sketchType, d.gNames)
            .orElse(partialGroupedBlobFor(table, s.columnName,
              s.sketchType, d.gNames, Nil, (_, b) => b))
        else
          partialGroupedBlobFor(table, s.columnName, s.sketchType, d.gNames,
            d.residual, (_, b) => b) // keys only: any payload stands in
      }
      .collectFirst { case Some(entries) =>
        entries.map(_._1)
          .filter(k => d.keyFilter.forall(_.matches(k.head)))
          .distinct
      }
      .getOrElse(return None)
    val rows = keys.map(k =>
      org.apache.spark.sql.Row.fromSeq(parts.map { case (_, i) =>
        typedKeyValue(kTypes(i), k(i))
      }))
    val schema = StructType(parts.map { case (n, i) =>
      StructField(n, kTypes(i), nullable = true)
    })
    import scala.jdk.CollectionConverters._
    Some(spark.createDataFrame(rows.asJava, schema))
  }

  /** If the query is a bare `SELECT count(DISTINCT g...) FROM table`
    * over the group column(s) of ANY fresh grouped blob, the answer is
    * EXACT with zero scan: the builders refuse to build past
    * MaxHllGroups, so the recorded group list is complete — the
    * distinct count is the number of keys whose components are all
    * non-NULL (COUNT DISTINCT skips rows with any NULL argument),
    * preempting the HLL estimate for exactly these columns. Multiple
    * count(DISTINCT) outputs serve together when each one's column set
    * has a covering blob.
    */
  private def storedDistinctCountAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String): Option[DataFrame] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.functions.lit
    val groupedTypes =
      Set("stats_grouped", "hll_grouped", "histogram_grouped", "hdr_grouped")
    def exactCountFor(cols: Seq[String]): Option[Long] =
      catalog.listSketches(Some(table)).iterator
        .filter(s => groupedTypes.contains(s.sketchType))
        .map(s => groupedBlobFor(table, s.columnName, s.sketchType, cols))
        .collectFirst { case Some(entries) =>
          entries.map(_._1).distinct.count(_.forall(_.isDefined)).toLong
        }
    parsed match {
      case Project(outs, r: UnresolvedRelation)
          if r.multipartIdentifier.last.equalsIgnoreCase(table) &&
            outs.nonEmpty =>
        val answered = outs.map {
          case Alias(f: UnresolvedFunction, name)
              if f.isDistinct && f.filter.isEmpty &&
                f.nameParts.last.equalsIgnoreCase("count") &&
                f.arguments.nonEmpty &&
                f.arguments.forall(_.isInstanceOf[UnresolvedAttribute]) =>
            exactCountFor(f.arguments
              .map(_.asInstanceOf[UnresolvedAttribute].nameParts.last))
              .map(n => (name, n))
          case _ => None
        }
        if (answered.nonEmpty && answered.forall(_.isDefined)) {
          val cols = answered.flatten.map { case (n, v) => lit(v).as(n) }
          Some(spark.range(1).select(cols: _*))
        } else None
      case _ => None
    }
  }

  /** The top-k / iceberg dashboard shape: optional LIMIT + optional
    * ORDER BY + optional HAVING around `SELECT keys..., count(*) AS c
    * FROM t GROUP BY keys` — every key projected exactly once, exactly
    * one plain count(*) output. Extracted WITHOUT a catalog probe so
    * the advisor classifies misses with the same matcher the serve
    * uses. `havingMin` is the inclusive count lower bound when the
    * HAVING is a single supported comparison (None = no HAVING;
    * unsupported forms refuse the whole shape); `sorts` are the
    * replayable sort keys (count output or key outputs only);
    * `topCountSort` marks a sort led by the count descending — the
    * condition under which a LIMIT keeps only heavy rows.
    */
  private def topKShape(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String): Option[TopKShape] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedHaving, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Descending, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, NullsFirst, SortOrder}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, Sort}
    val (limit, afterLimit) = parsed match {
      case GlobalLimit(Literal(n: Int, _), LocalLimit(Literal(m: Int, _), c))
          if n == m && n >= 0 => (Some(n), c)
      case p => (None, p)
    }
    val (sortOrders, afterSort) = afterLimit match {
      case Sort(so, true, c, _) => (so, c)
      case p                    => (Seq.empty[SortOrder], p)
    }
    val (having, inner) = afterSort match {
      case UnresolvedHaving(cond, a: Aggregate) => (Some(cond), a)
      case a: Aggregate                         => (None, a)
      case _                                    => return None
    }
    val (gs, outsRaw) = inner match {
      case Aggregate(g, o, r: UnresolvedRelation, _)
          if r.multipartIdentifier.last.equalsIgnoreCase(table) => (g, o)
      case _ => return None
    }
    if (gs.isEmpty || !gs.forall(_.isInstanceOf[UnresolvedAttribute]))
      return None
    val gNames = gs.map(_.asInstanceOf[UnresolvedAttribute].nameParts.last)
    val lower = gNames.map(_.toLowerCase)
    def isCountStar(e: Expression): Boolean = e match {
      case f: UnresolvedFunction =>
        f.nameParts.last.equalsIgnoreCase("count") && !f.isDistinct &&
          f.filter.isEmpty && (f.arguments match {
            case Seq(l: Literal) => l.value != null
            case _               => false
          })
      case _ => false
    }
    // metric = a lone count(*) (count blobs) OR a lone sum(attr)
    // (sum blobs — the revenue-dashboard shape)
    def isSumOf(e: Expression): Option[String] = e match {
      case f: UnresolvedFunction
          if f.nameParts.last.equalsIgnoreCase("sum") && !f.isDistinct &&
            f.filter.isEmpty =>
        f.arguments match {
          case Seq(a: UnresolvedAttribute) => Some(a.nameParts.last)
          case _                           => None
        }
      case _ => None
    }
    var metricOut: Option[(String, String, Option[String])] = None
    val outs: Seq[(String, Option[Int])] = outsRaw.map {
      case a: UnresolvedAttribute
          if lower.contains(a.nameParts.last.toLowerCase) =>
        (a.nameParts.last, Some(lower.indexOf(a.nameParts.last.toLowerCase)))
      case Alias(a: UnresolvedAttribute, name)
          if lower.contains(a.nameParts.last.toLowerCase) =>
        (name, Some(lower.indexOf(a.nameParts.last.toLowerCase)))
      case Alias(f, name) if isCountStar(f) && metricOut.isEmpty =>
        metricOut = Some((name, f.sql, None)); (name, None)
      case Alias(f, name)
          if isSumOf(f).isDefined && metricOut.isEmpty &&
            !lower.contains(isSumOf(f).get.toLowerCase) =>
        metricOut = Some((name, f.sql, isSumOf(f))); (name, None)
      case _ => return None
    }
    val (metricName, metricSql, sumCol) = metricOut.getOrElse(return None)
    val keyIdxs = outs.flatMap(_._2)
    if (keyIdxs.toSet != gNames.indices.toSet ||
        keyIdxs.sizeIs != gNames.size) return None
    def isMetricRef(e: Expression): Boolean = e match {
      case a: UnresolvedAttribute =>
        a.nameParts.last.equalsIgnoreCase(metricName)
      case other => other.sql == metricSql
    }
    def litD(v: Any): Option[Double] = v match {
      case n: java.lang.Integer => Some(n.doubleValue)
      case n: java.lang.Long    => Some(n.doubleValue)
      case n: java.lang.Short   => Some(n.doubleValue)
      case n: java.lang.Byte    => Some(n.doubleValue)
      case n: java.lang.Double  => Some(n.doubleValue)
      case n: java.lang.Float   => Some(n.doubleValue)
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case _                    => None
    }
    // (bound, strict): the count/sum lower bound the HAVING applies —
    // either comparison form qualifies iff bound >= the blob threshold
    // (every unstored group totals strictly below the threshold)
    val havingMin: Option[Option[(Double, Boolean)]] = having.map {
      case GreaterThanOrEqual(l, Literal(v, _)) if isMetricRef(l) =>
        litD(v).map((_, false))
      case GreaterThan(l, Literal(v, _)) if isMetricRef(l) =>
        litD(v).map((_, true))
      case LessThanOrEqual(Literal(v, _), r) if isMetricRef(r) =>
        litD(v).map((_, false))
      case LessThan(Literal(v, _), r) if isMetricRef(r) =>
        litD(v).map((_, true))
      case _ => None
    }
    if (havingMin.exists(_.isEmpty)) return None
    val sorts = sortOrders.map { so =>
      val name =
        if (isMetricRef(so.child)) Some(metricName)
        else so.child match {
          case a: UnresolvedAttribute =>
            outs.find(o => o._2.isDefined &&
              o._1.equalsIgnoreCase(a.nameParts.last)).map(_._1)
          case _ => None
        }
      name.map(n =>
        (n, so.direction == Descending, so.nullOrdering == NullsFirst))
    }
    if (sorts.exists(_.isEmpty)) return None
    val ss = sorts.flatten
    val topCountSort = ss.headOption.exists(s => s._1 == metricName && s._2)
    Some(TopKShape(gNames, outs, metricName, sumCol, havingMin.flatten, ss,
      topCountSort, limit))
  }

  /** Heavy-hitters serve (round 10, beyond reference): a stored "topk"
    * blob holds the EXACT counts of every group reaching its build
    * threshold over a HIGH-cardinality key — the shape the
    * MaxHllGroups-bounded grouped blobs refuse. Completeness above the
    * threshold is the guarantee: every unstored group counts strictly
    * below it, so `ORDER BY count DESC LIMIT k` with k within the
    * stored list, and `HAVING count >= x` with x at or above the
    * threshold, answer EXACTLY (zero scan, zero error — the iceberg
    * query). A LIMIT past the stored list, a HAVING reaching below the
    * threshold, or the bare full GROUP BY refuse to the scan — the
    * blob cannot name the light groups. Sort/limit/having replay
    * driver-side over the served rows with typed keys. Stream-
    * maintained blobs (EventStreams.maintainTopKSketch) carry an
    * `unknown_bound` — the accumulated per-batch maximum mass any
    * UNSTORED group could have gained — and the serve honors the
    * inflated completeness bound threshold + unknown_bound: stored
    * counts stay exact (additive increments), HAVING bounds below the
    * inflated threshold refuse, and top-k serves only when the k-th
    * stored metric clears it.
    */
  private val topkThresholdRe = """"threshold"\s*:\s*([0-9.eE+-]+)""".r
  private val topkAggRe = """"agg"\s*:\s*"([^"]*)"""".r
  private val topkValueColRe = """"value_col"\s*:\s*"([^"]*)"""".r
  // streaming maintenance inflates the completeness bound: any group
  // the blob cannot name totals strictly below threshold + this
  // accumulated per-batch unknown-group mass (EventStreams
  // .maintainTopKSketch); absent on batch-built blobs = 0
  private val topkUnknownRe = """"unknown_bound"\s*:\s*([0-9.eE+-]+)""".r
  private def storedTopKAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String): Option[(DataFrame, String)] = {
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val sh = topKShape(parsed, table).getOrElse(return None)
    val kTypes = keyFieldTypes(table, sh.gNames).getOrElse(return None)
    val q = sh.gNames.map(canonKey)
    val wantAgg = if (sh.sumCol.isDefined) "sum" else "count"
    val blob = catalog.listSketches(Some(table)).iterator
      .filter(s => s.sketchType == "topk" && sketchIsFresh(table, s))
      // metric match: count blobs (absent "agg" = legacy count) for
      // count(*) shapes; sum blobs whose value_col is the summed
      // column for sum(x) shapes
      .filter { s =>
        val agg = topkAggRe.findFirstMatchIn(s.parameters)
          .map(_.group(1)).getOrElse("count")
        agg == wantAgg && sh.sumCol.forall(c =>
          topkValueColRe.findFirstMatchIn(s.parameters)
            .exists(_.group(1).equalsIgnoreCase(c)))
      }
      .flatMap { s =>
        groupByParamRe.findFirstMatchIn(s.parameters)
          .map(_.group(1).split(",").map(canonKey).toSeq)
          .filter(scols => scols.sorted == q.sorted)
          .flatMap { scols =>
            topkThresholdRe.findFirstMatchIn(s.parameters)
              .map(_.group(1).toDouble)
              .flatMap { t =>
                val perm = q.map(scols.indexOf)
                // metric values: count blobs hold LE longs, sum blobs
                // the unscaled scale-4 decimal (its double rendering
                // reproduces CAST(DECIMAL AS DOUBLE) in any engine)
                val es = graft.sketch.GroupedHll.unpack(s.data).map {
                  case (k, b) =>
                    decodeGroupKey(k, scols.size).map { c =>
                      val v: Either[Long, Double] =
                        if (wantAgg == "count")
                          Left(java.nio.ByteBuffer.wrap(b)
                            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong)
                        else
                          Right(new java.math.BigDecimal(
                            new java.math.BigInteger(b), 4).doubleValue)
                      (perm.map(c), v)
                    }
                }
                if (es.exists(_.isEmpty)) None
                else {
                  val ub = topkUnknownRe.findFirstMatchIn(s.parameters)
                    .map(_.group(1).toDouble).getOrElse(0.0)
                  Some((t, ub, es.map(_.get)))
                }
              }
          }
      }.nextOption().getOrElse(return None)
    val (threshold, unknownBound, entries) = blob
    // completeness holds only above the stream-inflated bound: a group
    // absent from the blob had < threshold before the build and gained
    // at most unknownBound through the maintained stream
    val effThreshold = threshold + unknownBound
    def cmp(v: Either[Long, Double]): Double =
      v.fold(_.toDouble, identity)
    val served: Seq[(Seq[Option[String]], Either[Long, Double])] =
      sh.havingMin match {
        case Some((min, strict)) =>
          // a bound below the (inflated) threshold needs groups the
          // blob cannot name (either comparison form: unstored totals
          // are strictly below effThreshold <= bound, so they fail the
          // predicate)
          if (min < effThreshold) return None
          entries.filter(e =>
            if (strict) cmp(e._2) > min else cmp(e._2) >= min)
        case None =>
          // top-k: only a metric-DESC-led sort with a limit inside the
          // stored list keeps heavy rows exclusively; under stream
          // inflation the k-th stored metric must also clear the
          // inflated bound, or an unstored group could belong in the
          // top k (unstored totals are strictly below effThreshold)
          if (!sh.topCountSort || !sh.limit.exists(_ <= entries.size))
            return None
          if (unknownBound > 0) {
            val desc = entries.map(e => cmp(e._2))
              .sorted(Ordering[Double].reverse)
            if (desc(sh.limit.get - 1) < effThreshold) return None
          }
          entries
      }
    val metricType = if (sh.sumCol.isDefined) DoubleType else LongType
    val fields = sh.outs.map {
      case (n, Some(i)) => StructField(n, kTypes(i), nullable = true)
      case (n, None)    => StructField(n, metricType, nullable = false)
    }
    val rows = served.map { case (k, v) =>
      org.apache.spark.sql.Row.fromSeq(sh.outs.map {
        case (_, Some(i)) => typedKeyValue(kTypes(i), k(i))
        case (_, None)    => v.fold(identity[Long], identity[Double])
      })
    }
    import scala.jdk.CollectionConverters._
    var df = spark.createDataFrame(rows.asJava, StructType(fields))
    if (sh.sorts.nonEmpty) {
      val cols = sh.sorts.map { case (n, desc, nullsFirst) =>
        val c = org.apache.spark.sql.functions
          .col("`" + n.replace("`", "``") + "`")
        (desc, nullsFirst) match {
          case (true, true)   => c.desc_nulls_first
          case (true, false)  => c.desc_nulls_last
          case (false, true)  => c.asc_nulls_first
          case (false, false) => c.asc_nulls_last
        }
      }
      df = df.orderBy(cols: _*)
    }
    sh.limit.foreach(n => df = df.limit(n))
    val inflated =
      if (unknownBound > 0)
        s" + stream unknown-mass bound $unknownBound = $effThreshold"
      else ""
    Some((df,
      s"top-k/iceberg GROUP BY answered from the stored heavy-hitters " +
        s"summary (threshold $threshold$inflated, ${entries.size} stored " +
        "groups; no scan, exact)"))
  }

  /** If the query is `SELECT <aggs> FROM table WHERE g = lit` (or
    * `g IN (lits)`, or a CONJUNCTION `a = lit AND b = lit` over
    * distinct columns — a point lookup of one COMPOSITE group) whose
    * predicate column set is the group-by set of fresh stored GROUPED
    * sketches, dispatch to the group(s) the literals name —
    * catalog-level partition pruning.
    * Statistics (MIN/MAX/COUNT/SUM/AVG from the stats_grouped blob)
    * serve EXACTLY, and IN-lists merge the named groups' records
    * exactly (min/max monotone, counts and the unscaled decimal sum
    * additive); COUNT(DISTINCT c) serves from the hll_grouped blob,
    * IN-lists by register-max HLL union; PERCENTILE/MEDIAN (from the
    * histogram_grouped blob) serve within one bucket width —
    * single-group on any build, and IN-lists too when the named
    * groups' histograms share a grid (sharedGrid builds: bucket
    * counts add exactly; per-group grids refuse the multi-group
    * serve); COUNT(*) rides from the groups' recorded rowcounts
    * (≥1 column-anchored aggregate required — a lone filtered COUNT(*)
    * keeps its Count-Min / sampling semantics). Literals naming NO
    * recorded group serve the exact empty-group aggregate (counts 0,
    * everything else NULL). Returns the answer plus the worst
    * estimate error (0.0 when all outputs are statistics).
    */
  private def storedFilteredGroupAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String): Option[(DataFrame, Double)] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{Alias, EqualTo, In, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    // column-type-aware literal rendering (typedLitKey): a numeric-but-
    // not-integral group column or a type-mismatched literal refuses
    // rather than serving the wrong (usually empty) group
    def litKey(c: String, l: Literal): Option[String] =
      typedLitKey(table, c, l)
    def litDouble(l: Literal): Option[Double] = l.value match {
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case n: Number                             => Some(n.doubleValue())
      case _                                     => None
    }
    sealed trait Part
    case class PctPart(name: String, value: Option[Double], err: Double) extends Part
    case class StatPart(name: String, fn: String,
        stat: graft.sketch.GroupedStats.Stat) extends Part
    case class DistinctPart(name: String, est: Long, err: Double) extends Part
    case class CountStarPart(name: String) extends Part
    parsed match {
      case Project(outs, Filter(cond, r: UnresolvedRelation))
          if r.multipartIdentifier.last.equalsIgnoreCase(table) && outs.nonEmpty =>
        // Served predicate shapes: ONE column under = / IN (several
        // named groups merge), or a CONJUNCTION of equalities on
        // DISTINCT columns — a point lookup of exactly one COMPOSITE
        // group (`WHERE a = 'x' AND b = 'y'` against a sketch built
        // with group_by "a,b"). Selection compares DECODED component
        // tuples against the typed literal renderings — never a
        // string-encoding round-trip, so to_json escaping can't drift.
        val colKeys: Option[(Seq[String], Seq[Seq[Option[String]]])] =
          cond match {
            case EqualTo(a: UnresolvedAttribute, l: Literal) =>
              litKey(a.nameParts.last, l)
                .map(k => (Seq(a.nameParts.last), Seq(Seq(Some(k)))))
            case EqualTo(l: Literal, a: UnresolvedAttribute) =>
              litKey(a.nameParts.last, l)
                .map(k => (Seq(a.nameParts.last), Seq(Seq(Some(k)))))
            case In(a: UnresolvedAttribute, lits) =>
              typedInListKeys(table, a.nameParts.last, lits)
                .map(ks => (Seq(a.nameParts.last),
                  ks.map(k => Seq(Some(k)))))
            case andExpr: org.apache.spark.sql.catalyst.expressions.And =>
              val eqs = conjunctsOf(andExpr).map {
                case EqualTo(a: UnresolvedAttribute, l: Literal) =>
                  litKey(a.nameParts.last, l).map((a.nameParts.last, _))
                case EqualTo(l: Literal, a: UnresolvedAttribute) =>
                  litKey(a.nameParts.last, l).map((a.nameParts.last, _))
                case _ => None
              }
              if (eqs.exists(_.isEmpty)) None
              else {
                val es = eqs.flatten
                val cols = es.map(_._1)
                if (cols.map(_.toLowerCase).distinct.sizeIs != cols.size)
                  None // a column equated twice: not a group lookup
                else Some((cols, Seq(es.map(e => Some(e._2)))))
              }
            case _ => None
          }
        // RANGE branch (round 10): every conjunct an integral
        // comparison on ONE column → prune recorded groups by the
        // parsed-key range. The group list is complete (MaxHllGroups
        // build refusal), so the pruned set is EXACTLY the groups
        // exact execution keeps, and the merges below stay exact/
        // estimate per part as for IN-lists.
        val rangeSel: Option[(String, KeyPred)] =
          if (colKeys.isDefined) None
          else {
            val conj = conjunctsOf(cond)
            val names = conj.flatMap(_.collect {
              case a: UnresolvedAttribute => a.nameParts.last.toLowerCase
            }).distinct
            names match {
              case Seq(c) => keyRangePred(table, c, conj).map(p => (c, p))
              case _      => None
            }
          }
        // payloads of the selected group(s) from a fresh sketch whose
        // group-by column set equals the predicate's (groupedBlobFor:
        // components permuted into predicate order); None = no usable
        // sketch, empty = literals/range naming no recorded group
        val (predCols, select): (Seq[String],
            Seq[(Seq[Option[String]], Array[Byte])] => Seq[Array[Byte]]) =
          (colKeys, rangeSel) match {
            case (Some((cols, selKeys)), _) =>
              (cols, entries => {
                val m = entries.toMap
                selKeys.flatMap(m.get)
              })
            case (None, Some((c, p))) =>
              (Seq(c), entries => entries.collect {
                case (k, b) if p.matches(k.head) => b
              })
            case _ => return None
          }
        def matchedPayloads(c: String, tpe: String)
            : Option[Seq[Array[Byte]]] =
          groupedBlobFor(table, c, tpe, predCols).map(select)
        val emptyStat =
          graft.sketch.GroupedStats.Stat(None, None, 0L, 0L, BigInt(0))
        // exact merge of the named groups' stat records (missing
        // groups contribute the empty record); None = no usable sketch
        def statFor(c: String): Option[graft.sketch.GroupedStats.Stat] =
          matchedPayloads(c, "stats_grouped").map {
            _.map(graft.sketch.GroupedStats.decode)
              .foldLeft(emptyStat)(graft.sketch.GroupedStats.merge)
          }
        // named groups' histograms: empty payloads (all-NULL groups)
        // drop — percentile ignores NULLs; none left = NULL percentile
        // (inner None), the exact empty/all-NULL answer. 2+ histograms
        // merge by adding bucket counts ONLY when they share a grid
        // (sharedGrid builds) — differing grids refuse the serve
        // (outer None) and the scan answers, as before round 10.
        def mergedHistogram(ps: Seq[Array[Byte]])
            : Option[Option[graft.sketch.Histogram]] = {
          val hs = ps.filter(_.nonEmpty).map(graft.sketch.Histogram.deserialize)
          if (hs.isEmpty) Some(None)
          else if (hs.forall(h => h.lo == hs.head.lo &&
              h.width == hs.head.width && h.buckets == hs.head.buckets))
            Some(Some(hs.reduce(_ merge _)))
          else None
        }
        // the HDR fallback for the same shape: the log grid is GLOBAL,
        // so ANY set of named groups merges exactly — including from a
        // COMPOSITE blob collapsed over its unfiltered components
        // (partialGroupedBlobFor), the two cases the per-group-grid
        // equi-width family refuses. None = no usable sketch; inner
        // None = no non-empty group named (NULL percentile).
        def matchedHdrPayloads(c: String): Option[Seq[Array[Byte]]] =
          groupedBlobFor(table, c, "hdr_grouped", predCols)
            .orElse(partialGroupedBlobFor(table, c, "hdr_grouped",
              predCols, Nil, hdrMergeBytes))
            .map(select)
        def mergedHdr(ps: Seq[Array[Byte]])
            : Option[graft.sketch.HdrSketch] = {
          val hs = ps.filter(_.nonEmpty)
            .map(graft.sketch.HdrSketch.deserialize)
          if (hs.isEmpty) None else Some(hs.reduce(_ merge _))
        }
        var statsRows: Option[Long] = None // rows of the named group(s)
        val classified: Seq[Option[Part]] = outs.map {
          case Alias(f: UnresolvedFunction, name)
              if f.isDistinct && f.filter.isEmpty &&
                f.nameParts.last.equalsIgnoreCase("count") &&
                f.arguments.sizeIs == 1 &&
                f.arguments.head.isInstanceOf[UnresolvedAttribute] =>
            val c = f.arguments.head
              .asInstanceOf[UnresolvedAttribute].nameParts.last
            matchedPayloads(c, "hll_grouped").map { ps =>
              val matched = ps.map(graft.sketch.Hll.deserialize)
              if (matched.isEmpty) DistinctPart(name, 0L, 0.0)
              else {
                val merged = matched.reduce(_ merge _)
                DistinctPart(name, merged.count, merged.standardError)
              }
            }
          case Alias(f: UnresolvedFunction, name)
              if !f.isDistinct && f.filter.isEmpty =>
            (f.nameParts.last.toLowerCase, f.arguments) match {
              case ("count", Seq(l: Literal)) if l.value != null =>
                Some(CountStarPart(name)) // count(*) parses as count(1)
              case (fn, Seq(a: UnresolvedAttribute))
                  if Set("min", "max", "count", "sum", "avg", "mean")(fn) =>
                // the merged record (IN-lists add group records) must
                // still serve exactly per function — type-aware gate
                // (statFnServesExactly) before it carries the exact
                // label
                statFor(a.nameParts.last)
                  .filter(st =>
                    statFnServesExactly(table, a.nameParts.last, fn, Seq(st)))
                  .map { st =>
                    if (statsRows.isEmpty) statsRows = Some(st.nrows)
                    StatPart(name, fn, st)
                  }
              case ("percentile" | "percentile_approx" | "approx_percentile",
                  Seq(a: UnresolvedAttribute, l: Literal)) =>
                litDouble(l).flatMap { p =>
                  (for {
                    ps <- matchedPayloads(a.nameParts.last, "histogram_grouped")
                    h <- mergedHistogram(ps)
                  } yield PctPart(name, h.map(_.percentile(p)),
                    h.map(x => 1.0 / x.buckets).getOrElse(0.0)))
                    .orElse(matchedHdrPayloads(a.nameParts.last).map { ps =>
                      val h = mergedHdr(ps)
                      PctPart(name, h.flatMap(_.percentile(p)),
                        h.map(_.relErrBound).getOrElse(0.0))
                    })
                }
              case ("median", Seq(a: UnresolvedAttribute)) =>
                (for {
                  ps <- matchedPayloads(a.nameParts.last, "histogram_grouped")
                  h <- mergedHistogram(ps)
                } yield PctPart(name, h.map(_.percentile(0.5)),
                  h.map(x => 1.0 / x.buckets).getOrElse(0.0)))
                  .orElse(matchedHdrPayloads(a.nameParts.last).map { ps =>
                    val h = mergedHdr(ps)
                    PctPart(name, h.flatMap(_.percentile(0.5)),
                      h.map(_.relErrBound).getOrElse(0.0))
                  })
              case _ => None
            }
          case _ => None
        }
        if (classified.exists(_.isEmpty)) return None
        val parts = classified.flatten
        val anchored = parts.count(!_.isInstanceOf[CountStarPart])
        if (anchored == 0) return None
        // count(*) needs the groups' recorded rowcounts: from a stats
        // blob consulted above, else from the percentile column's own
        // stats blob (createGroupedHistogram writes both together)
        val rideRows: Option[Long] =
          if (!parts.exists(_.isInstanceOf[CountStarPart])) Some(0L)
          else statsRows match {
            case Some(n) => Some(n)
            case None =>
              val pctCol = outs.collectFirst {
                case Alias(f: UnresolvedFunction, _)
                    if f.arguments.headOption.exists(_.isInstanceOf[UnresolvedAttribute]) =>
                  f.arguments.head.asInstanceOf[UnresolvedAttribute].nameParts.last
              }
              pctCol.flatMap(statFor).map(_.nrows)
          }
        if (parts.exists(_.isInstanceOf[CountStarPart]) && rideRows.isEmpty)
          return None
        val row = org.apache.spark.sql.Row.fromSeq(parts.map {
          case CountStarPart(_)       => rideRows.get
          case PctPart(_, value, _)   => value.map(Double.box).orNull
          case DistinctPart(_, e, _)  => e
          case StatPart(_, fn, st)    => fn match {
            case "min"          => st.min.map(Double.box).orNull
            case "max"          => st.max.map(Double.box).orNull
            case "count"        => st.nnull
            case "sum"          => st.sumDouble.map(Double.box).orNull
            case "avg" | "mean" => st.avgDouble.map(Double.box).orNull
          }
        })
        val schema = StructType(parts.map {
          case CountStarPart(n)      => StructField(n, LongType, nullable = false)
          case PctPart(n, _, _)      => StructField(n, DoubleType, nullable = true)
          case DistinctPart(n, _, _) => StructField(n, LongType, nullable = false)
          case StatPart(n, fn, _) =>
            if (fn == "count") StructField(n, LongType, nullable = false)
            else StructField(n, DoubleType, nullable = true)
        })
        import scala.jdk.CollectionConverters._
        Some((spark.createDataFrame(java.util.List.of(row), schema),
          parts.collect {
            case PctPart(_, _, e)      => e
            case DistinctPart(_, _, e) => e
          }.foldLeft(0.0)(math.max)))
      case _ => None
    }
  }

  /** If the query is `SELECT count(*) ... FROM table WHERE col = lit`
    * or `col IN (lits)` (any number of count(*) outputs, one
    * single-column literal predicate) and the catalog holds a fresh
    * Count-Min sketch for `col`, answer the point frequency from the
    * sketch — zero table scan; IN-lists serve the sum of per-literal
    * estimates over the distinct keys (overestimate-only survives
    * addition). Returns the answer plus the error bound: eps for an
    * equality, |list|*eps for an IN (additive, as a fraction of the
    * table size). The literal is rendered exactly as
    * the sketch builder keyed it (`cast(col as string)`), so only
    * string-on-string and integral-on-integral (column, literal) pairs
    * are answerable (typedLitKey) — anything else falls through to the
    * scan path.
    */
  private val cmsEpsRe = """"epsilon"\s*:\s*([0-9.eE+-]+)""".r
  private def storedCmsAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String): Option[(DataFrame, Double)] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{Alias, EqualTo, In, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    import org.apache.spark.sql.functions.lit
    def isCountStar(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = e match {
      case f: UnresolvedFunction =>
        f.nameParts.last.equalsIgnoreCase("count") && !f.isDistinct &&
          f.filter.isEmpty && (f.arguments match {
            case Seq(l: Literal) => l.value != null // count(*) parses as count(1)
            case _               => false
          })
      case _ => false
    }
    parsed match {
      case Project(outs, Filter(cond, r: UnresolvedRelation))
          if r.multipartIdentifier.last.equalsIgnoreCase(table) &&
            outs.nonEmpty && outs.forall {
              case Alias(f, _) => isCountStar(f)
              case _           => false
            } =>
        // typedLitKey: only (string column, string literal) and
        // (integral column, integral literal) render the same string
        // the CMS builder keyed; other pairings fall through to a scan.
        // An all-literal IN-list is the SUM of per-literal estimates
        // over the distinct keys: each term is overestimate-only, and
        // addition preserves that (truth of the IN is the sum of the
        // disjoint per-key truths), under a widened |list|*eps bound.
        def litKeys(c: org.apache.spark.sql.catalyst.expressions.Expression)
            : Option[(String, Seq[String])] = c match {
          case EqualTo(a: UnresolvedAttribute, l: Literal) =>
            typedLitKey(table, a.nameParts.last, l)
              .map(k => (a.nameParts.last, Seq(k)))
          case EqualTo(l: Literal, a: UnresolvedAttribute) =>
            typedLitKey(table, a.nameParts.last, l)
              .map(k => (a.nameParts.last, Seq(k)))
          case In(a: UnresolvedAttribute, lits) =>
            typedInListKeys(table, a.nameParts.last, lits)
              .map(ks => (a.nameParts.last, ks))
          case _ => None
        }
        // a conjunction of equality/IN predicates over DISTINCT columns
        // is a COMPOSITE point/IN frequency: served from a composite
        // CMS keyed on the to_json tuple rendering, estimates summed
        // over the cross-product of per-column key lists (overestimate-
        // only survives the sum — the per-tuple truths are disjoint)
        val parts: Option[Seq[(String, Seq[String])]] = cond match {
          case a: org.apache.spark.sql.catalyst.expressions.And =>
            val cs = conjunctsOf(a).map(litKeys)
            if (cs.exists(_.isEmpty)) None
            else {
              val v = cs.flatten
              if (v.map(_._1.toLowerCase).distinct.sizeIs != v.size) None
              else Some(v)
            }
          case other => litKeys(other).map(Seq(_))
        }
        parts.flatMap {
          case Seq((c, keys)) =>
            catalog.getSketch(table, c, "countmin")
              .filter(sketchIsFresh(table, _))
              .flatMap { s =>
                cmsEpsRe.findFirstMatchIn(s.parameters)
                  .map(_.group(1).toDouble)
                  .map { eps =>
                    val cms = graft.sketch.Cms.deserialize(s.data)
                    val est = keys.map(cms.estimateString).sum
                    val cols = outs.map(o => lit(est).as(o.name))
                    (spark.range(1).select(cols: _*), keys.size * eps)
                  }
              }
          case many =>
            val want = many.map(_._1.toLowerCase).toSet
            catalog.listSketches(Some(table))
              .find { s =>
                s.sketchType == "countmin" &&
                  s.parameters.contains("\"enc\":\"j1\"") && {
                    val cols = s.columnName.split(",").map(_.trim)
                    cols.length == many.size &&
                      cols.map(_.toLowerCase).toSet == want
                  }
              }
              .filter(sketchIsFresh(table, _))
              .flatMap { s =>
                cmsEpsRe.findFirstMatchIn(s.parameters)
                  .map(_.group(1).toDouble)
                  .map { eps =>
                    // render each literal tuple in the SKETCH's stored
                    // column order — the order the builder hashed
                    val order = s.columnName.split(",").map(_.trim)
                    val byCol = many
                      .map { case (c2, ks) => c2.toLowerCase -> ks }.toMap
                    val tuples = order.map(o => byCol(o.toLowerCase))
                      .foldLeft(Seq(Seq.empty[String])) { (acc, ks) =>
                        acc.flatMap(t => ks.map(k => t :+ k))
                      }
                    val cms = graft.sketch.Cms.deserialize(s.data)
                    val est = tuples.map(t => cms.estimateString(
                      graft.sketch.SketchOps.jsonTupleKey(t))).sum
                    val cols = outs.map(o => lit(est).as(o.name))
                    (spark.range(1).select(cols: _*),
                      math.max(1, tuples.size) * eps)
                  }
              }
        }
      case _ => None
    }
  }

  /** Set-operation cardinality from stored KMV sketches (round 10,
    * beyond reference — the Theta-sketch use case): `SELECT count(*)
    * FROM (SELECT a FROM t1 INTERSECT|UNION|EXCEPT SELECT b FROM t2) x`
    * answers from the two sides' bottom-k hash sketches with NO scan.
    * The estimates are deterministic given the data (the portable h60
    * hash), so the q107/q108 oracles re-derive them bit-for-bit — an
    * approximate multi-table operator with an exact cross-engine gate.
    * Sketches must share k and pass the freshness guard on BOTH sides;
    * an unsaturated union means both hash lists were exhaustive and
    * the answer is EXACT (error 0). INTERSECT/EXCEPT bounds add the
    * matched-proportion binomial term (Kmv.proportionError) — a tiny
    * overlap reports a wide bound and falls through to exact execution
    * instead of serving noise. Returns (df, error, op label, the
    * larger side's table for the cost model's rows hint).
    */
  private val kmvKRe = """"k"\s*:\s*(\d+)""".r

  /** The set-op count shape: `SELECT count(*) AS c FROM (SELECT a FROM
    * t1 <INTERSECT|UNION|EXCEPT> SELECT b FROM t2) x`. Returns (count
    * alias, op label, (left table, left column), (right table, right
    * column)) — the input to both the KMV serve and the advisor's miss
    * classification.
    */
  private def setOpCountShape(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Option[(String, String, (String, String), (String, String))] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.{Distinct, Except, Intersect, Project, SubqueryAlias, Union}
    def strip(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = p match {
      case SubqueryAlias(_, c) => strip(c)
      case other               => other
    }
    def side(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Option[(String, String)] = strip(p) match {
      case Project(Seq(a: UnresolvedAttribute), r: UnresolvedRelation) =>
        Some((r.multipartIdentifier.last, a.nameParts.last))
      case _ => None
    }
    def isCountStar(f: UnresolvedFunction): Boolean =
      f.nameParts.last.equalsIgnoreCase("count") && !f.isDistinct &&
        f.filter.isEmpty && (f.arguments match {
          case Seq(l: Literal) => l.value != null
          case _               => false
        })
    def countDistinctArg(f: UnresolvedFunction): Option[String] =
      if (f.nameParts.last.equalsIgnoreCase("count") && f.isDistinct &&
          f.filter.isEmpty)
        f.arguments match {
          case Seq(a: UnresolvedAttribute) => Some(a.nameParts.last)
          case _                           => None
        }
      else None
    parsed match {
      case Project(Seq(Alias(f: UnresolvedFunction, name)), child)
          if isCountStar(f) =>
        val setOp = strip(child) match {
          case Intersect(l, r, false)                   => Some(("intersect", l, r))
          case Except(l, r, false)                      => Some(("except", l, r))
          case Distinct(Union(Seq(l, r), false, false)) => Some(("union", l, r))
          case _                                        => None
        }
        for {
          (op, l, r) <- setOp
          ls <- side(l)
          rs <- side(r)
        } yield (name, op, ls, rs)
      // `count(DISTINCT x) FROM (a UNION ALL b)` is the same union
      // cardinality — the DISTINCT collapses the bag, so UNION ALL and
      // UNION children serve alike; x must be the combined column
      // (the first branch's projected name)
      case Project(Seq(Alias(f: UnresolvedFunction, name)), child)
          if countDistinctArg(f).isDefined =>
        val arg = countDistinctArg(f).get
        val pair = strip(child) match {
          case Union(Seq(l, r), false, false)           => Some((l, r))
          case Distinct(Union(Seq(l, r), false, false)) => Some((l, r))
          case _                                        => None
        }
        for {
          (l, r) <- pair
          ls <- side(l)
          rs <- side(r)
          if ls._2.equalsIgnoreCase(arg)
        } yield (name, "union", ls, rs)
      case _ => None
    }
  }

  private def storedSetOpAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Option[(DataFrame, Double, String, String)] = {
    import org.apache.spark.sql.functions.lit
    for {
      (name, op, (lt, lc), (rt, rc)) <- setOpCountShape(parsed)
      ls <- catalog.getSketch(lt, lc, "kmv").filter(sketchIsFresh(lt, _))
      rs <- catalog.getSketch(rt, rc, "kmv").filter(sketchIsFresh(rt, _))
      lk <- kmvKRe.findFirstMatchIn(ls.parameters).map(_.group(1).toInt)
      rk <- kmvKRe.findFirstMatchIn(rs.parameters).map(_.group(1).toInt)
      if lk == rk
    } yield {
      val se = graft.sketch.Kmv.setEstimate(
        graft.sketch.Kmv.deserialize(ls.data),
        graft.sketch.Kmv.deserialize(rs.data))
      val (est, err) = op match {
        case "intersect" =>
          (se.intersectEst,
            if (se.exact) 0.0 else graft.sketch.Kmv.proportionError(lk, se.matched))
        case "except" =>
          (se.exceptEst,
            if (se.exact) 0.0 else graft.sketch.Kmv.proportionError(lk, se.aOnly))
        case _ =>
          (se.unionEst,
            if (se.exact) 0.0 else graft.sketch.Kmv.unionError(lk))
      }
      val hint = Seq(lt, rt)
        .maxBy(t => tableRowsHint(t).getOrElse(0L))
      (spark.range(1).select(lit(est).as(name)), err, op, hint)
    }
  }

  /** If the query is a bare global aggregate over `table` whose every
    * output is COUNT(DISTINCT attr) with a stored HyperLogLog sketch in
    * the catalog, answer all of them from the catalog — zero table scan.
    */
  private def storedSketchAnswer(parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String): Option[DataFrame] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.functions.lit
    parsed match {
      case Project(outs, r: UnresolvedRelation)
          if r.multipartIdentifier.last.equalsIgnoreCase(table) =>
        val answered = outs.map {
          case Alias(f: UnresolvedFunction, name)
              if f.nameParts.last.equalsIgnoreCase("count") && f.isDistinct &&
                f.arguments.sizeIs == 1 =>
            f.arguments.head match {
              case a: UnresolvedAttribute =>
                catalog.getSketch(table, a.nameParts.last, "hyperloglog")
                  .filter(sketchIsFresh(table, _))
                  .map(s => name -> graft.sketch.Hll.deserialize(s.data).count)
              case _ => None
            }
          case _ => None
        }
        if (answered.nonEmpty && answered.forall(_.isDefined)) {
          val cols = answered.flatten.map { case (n, v) => lit(v).as(n) }
          Some(spark.range(1).select(cols: _*))
        } else None
      case _ => None
    }
  }

  /** If the query is `SELECT g, count(DISTINCT attr)... FROM table
    * GROUP BY g` with a fresh stored GROUPED HyperLogLog (built by
    * SketchOps.createGroupedHll with group_by == g) covering every
    * distinct-counted column, answer all groups from the catalog —
    * zero table scan. Group keys are served as the string rendering
    * recorded at build time (the Count-Min string-key contract), and
    * every consulted sketch must carry the same group-key set (they
    * were built from the same table state or not at all).
    */
  private val groupByParamRe = """"group_by"\s*:\s*"([^"]*)"""".r
  private def storedGroupedSketchAnswer(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      table: String): Option[DataFrame] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    def attrName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case _                      => None
    }
    parsed match {
      case Aggregate(gs, outs, child, _) =>
        val d = aggregateGroupKeys(gs, child, table).getOrElse(return None)
        val (gNames, keyFilter) = (d.gNames, d.keyFilter)
        // partial-key dispatch: WHERE a = 'x' GROUP BY b over an "a,b"
        // blob collapses the a dimension by register-max HLL union
        // (distinct-over-union — exactly the filtered query's ask)
        def hllBlobFor(c: String) =
          if (d.residual.isEmpty)
            groupedBlobFor(table, c, "hll_grouped", gNames)
              .orElse(partialGroupedBlobFor(table, c, "hll_grouped",
                gNames, Nil, (x, y) => graft.sketch.Hll.deserialize(x)
                  .merge(graft.sketch.Hll.deserialize(y)).serialize))
          else partialGroupedBlobFor(table, c, "hll_grouped", gNames,
            d.residual, (x, y) => graft.sketch.Hll.deserialize(x)
              .merge(graft.sketch.Hll.deserialize(y)).serialize)
        val lower = gNames.map(_.toLowerCase)
        def countDistinctCol(e: Expression): Option[String] = e match {
          case f: UnresolvedFunction
              if f.nameParts.last.equalsIgnoreCase("count") && f.isDistinct &&
                f.filter.isEmpty && f.arguments.sizeIs == 1 =>
            attrName(f.arguments.head)
          case _ => None
        }
        // classify outputs: Left((outName, group idx)) = a group key,
        // Right((outName, per-group estimates)) = an answered
        // count-distinct
        val classified = outs.map {
          case a: UnresolvedAttribute
              if lower.contains(a.nameParts.last.toLowerCase) =>
            Some(Left((a.nameParts.last,
              lower.indexOf(a.nameParts.last.toLowerCase))))
          case Alias(e, name)
              if attrName(e).orElse(exprKeyName(e)).exists(n => lower.contains(n.toLowerCase)) =>
            Some(Left((name, lower.indexOf(attrName(e).orElse(exprKeyName(e)).get.toLowerCase))))
          case Alias(e, name) =>
            countDistinctCol(e).flatMap { c =>
              hllBlobFor(c).map { entries =>
                val est = entries
                  .filter { case (k, _) =>
                    keyFilter.forall(_.matches(k.head)) }
                  .map { case (k, b) =>
                    k -> graft.sketch.Hll.deserialize(b).count }
                Right((name, est))
              }
            }
          case _ => None
        }
        if (classified.exists(_.isEmpty)) return None
        val parts = classified.flatten
        val keyIdx = parts.collect { case Left((_, i)) => i }
        val estCols = parts.collect { case Right(v) => v }
        if (keyIdx.toSet != gNames.indices.toSet || estCols.isEmpty)
          return None
        // all sketches must agree on the group-key set
        val keys = estCols.head._2.map(_._1)
        if (!estCols.forall(_._2.map(_._1).toSet == keys.toSet)) return None
        val kTypes = keyFieldTypes(table, gNames).getOrElse(return None)
        val byName = estCols.map { case (n, est) => n -> est.toMap }.toMap
        // rows in the parsed output order (key and counts interleave as
        // the select list wrote them)
        val rows = keys.map { k =>
          org.apache.spark.sql.Row.fromSeq(parts.map {
            case Left((_, i))  => typedKeyValue(kTypes(i), k(i))
            case Right((n, _)) => byName(n)(k)
          })
        }
        val schema = StructType(parts.map {
          case Left((n, i))  => StructField(n, kTypes(i), nullable = true)
          case Right((n, _)) => StructField(n, LongType, nullable = false)
        })
        import scala.jdk.CollectionConverters._
        Some(spark.createDataFrame(rows.asJava, schema))
      case _ => None
    }
  }

  /** Non-ML mode: the reference's cost-model-only planner path
    * (use_ml_optimization=false): exact vs pre-created sample by cost.
    */
  private def plannerOnlyChoice(f: QueryFeatures, tableSize: Long,
      maxRelError: Double,
      measureCols: Set[String] = Set.empty): StrategyChooser.Choice = {
    val p = Planner.plan(f, catalog, tableSize, maxRelError,
      preferExact = false, measureCols = measureCols)
    p.decision match {
      case _: Planner.ReadSampleTable =>
        StrategyChooser.Choice(StrategyChooser.Sample, 0.85, p.reason)
      case _ =>
        StrategyChooser.Choice(StrategyChooser.Exact, 0.95, p.reason)
    }
  }

  /** Realized error for multi-row (grouped) results: identify the
    * grouping-key output columns from the parsed select list (outputs
    * whose expression contains no aggregate call), join approx rows to
    * exact rows on those keys, and average |rel error| over the numeric
    * measure cells. CI companion columns (absent on the exact side) are
    * excluded by intersecting schemas; an exact group the sample missed
    * entirely counts as a full miss (rel error 1.0 per measure) so
    * sampled-out small groups are not silently flattering. Returns 0.0
    * when no key columns can be identified (no evidence — matches the
    * reference's measure-nothing behavior rather than inventing a
    * pairing).
    */
  private val aggCallNames = Set("count", "sum", "avg", "mean", "min",
    "max", "stddev", "stddev_samp", "var_samp", "variance", "percentile",
    "percentile_approx", "approx_percentile", "median",
    "approx_count_distinct")
  private def groupedError(sql: String,
      approxNames: Array[String], approxRows: Array[org.apache.spark.sql.Row],
      exactNames: Array[String], exactRows: Array[org.apache.spark.sql.Row]): Double = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, UnaryNode}
    def selectList(p: LogicalPlan): Seq[NamedExpression] = p match {
      case a: Aggregate => a.aggregateExpressions
      case pr: Project  => pr.projectList
      case u: UnaryNode => selectList(u.child)
      case _            => Nil
    }
    def hasAggCall(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
      e.collectFirst {
        case f: UnresolvedFunction
            if aggCallNames.contains(f.nameParts.last.toLowerCase) => f
      }.isDefined
    val outs = parsedCached(sql).map(p => selectList(p._1)).getOrElse(Nil)
    val keyNames = outs.collect {
      case a @ Alias(child, _) if !hasAggCall(child) => a.name
      case ne if !hasAggCall(ne)                     => ne.name
    }
    val exactIdx = exactNames.zipWithIndex.toMap
    val approxIdx = approxNames.zipWithIndex.toMap
    if (keyNames.isEmpty ||
        !keyNames.forall(k => exactIdx.contains(k) && approxIdx.contains(k)))
      return 0.0
    val measureNames = exactNames.filter(n =>
      !keyNames.contains(n) && approxIdx.contains(n))
    if (measureNames.isEmpty) return 0.0

    def key(row: org.apache.spark.sql.Row, idx: Map[String, Int]): Seq[String] =
      keyNames.map(k => String.valueOf(row.get(idx(k)))).toSeq
    val approxByKey = approxRows.map(r => key(r, approxIdx) -> r).toMap
    val pairs = exactRows.iterator.flatMap { e =>
      val a = approxByKey.get(key(e, exactIdx))
      measureNames.iterator.flatMap { m =>
        e.get(exactIdx(m)) match {
          case v: Number if v.doubleValue() != 0 =>
            a.flatMap(ar => Option(ar.get(approxIdx(m)))) match {
              case Some(x: Number) => Some(
                math.abs(x.doubleValue() - v.doubleValue()) / math.abs(v.doubleValue()))
              case Some(_) => None
              case None    => Some(1.0) // group absent from the sample
            }
          case _ => None
        }
      }
    }.toSeq
    if (pairs.nonEmpty) pairs.sum / pairs.size else 0.0
  }

  /** Sketchable shapes in a parsed single-table query: which stored
    * sketch WOULD have answered each output had it existed. Mirrors the
    * serve paths' classifications (HLL count-distinct, histogram
    * percentiles + build stats, grouped twins, filtered-group dispatch,
    * CMS point frequency) WITHOUT consulting the catalog — the advisor
    * counts misses; freshness/coverage filtering happens at advise
    * time.
    */
  private def sketchCandidates(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      features: QueryFeatures): Seq[graft.learn.SketchAdvisor.Candidate] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{Alias, EqualTo, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, NamedExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Project}
    import graft.learn.SketchAdvisor.Candidate
    if (!features.isSingleTable) {
      // set-op cardinality misses: a COUNT(*) over INTERSECT / UNION /
      // EXCEPT that ran exact advises the KMV pair that would serve it
      // from the catalog (storedSetOpAnswer's shape, verbatim)
      setOpCountShape(parsed) match {
        case Some((_, _, (lt, lc), (rt, rc))) =>
          return Seq(Candidate(lt, lc, "kmv", None),
            Candidate(rt, rc, "kmv", None)).distinct
        case None =>
      }
      // join-AQP misses: an aggregate join that ran WITHOUT the
      // sampled path (the finish gate skips sample_join/universe
      // serves) becomes automatically costed once fresh AGMS pairs
      // exist over its equi-keys — so each EDGE endpoint's (table,
      // key) is a sketchable candidate. Stars and snowflake chains
      // alike: joinTreeEdges succeeds from any root, and the canonical
      // edge key order is root-independent, so the advised names match
      // what execution will look up.
      // star-aggregate misses advise the grouped build that flips the
      // query to the EXACT star serve (fact never scanned) — strictly
      // better than an AGMS pair for this shape, advised alongside it
      // (the generic advice still helps if the fact's key cardinality
      // makes the grouped build refuse past MaxHllGroups). Computed
      // BEFORE the approximable-agg gate: a percentile-only star query
      // has no sampler-approximable aggregate but the shared-grid
      // build still serves it.
      val star = try starAdviceCandidates(parsed, features.tables)
        catch { case scala.util.control.NonFatal(_) => Nil }
      if (features.tables.sizeIs < 2 ||
          !(features.hasApproximableAgg || features.hasDistinct))
        return star
      return try {
        val ts = features.tables
        (star ++ ts.iterator
          .map(f => joinTreeEdges(parsed, ts, f))
          .collectFirst { case Some(v) => v }
          .map { edges =>
            // metadata-only size evidence: catalog stats, never a scan
            def bigByStats(t: String): Boolean =
              catalog.statsFor(t).exists(_.rowCount >= UniverseMinRows)
            val agms = edges.map { case (p, pks, _, _) =>
              Candidate(p, agmsKeyName(pks), "agms", None)
            } ++ edges.map { case (_, _, c, cks) =>
              Candidate(c, agmsKeyName(cks), "agms", None)
            }
            // two-big edges additionally advise a MATERIALIZED
            // universe-sample pair: the per-query inline lottery is
            // itself a full scan of both big sides, which the pair
            // amortizes to one build
            val universe = edges.collect {
              case (p, pks, c, cks) if bigByStats(p) && bigByStats(c) =>
                Seq(Candidate(p, agmsKeyName(pks), "universe", None),
                  Candidate(c, agmsKeyName(cks), "universe", None))
            }.flatten
            // distinct aggregates: the universe key lottery is the ONLY
            // strategy that can serve them (count over a full edge-key
            // tuple), so advise exactly when that shape holds on a
            // two-big edge — anything else has no build that would
            // flip it, so advise nothing rather than dead recipes
            val distinctFns = parsed.collect { case n => n.expressions }
              .flatten.flatMap(_.collect {
                case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
                    if f.isDistinct => f
              })
            val keySets = edges
              .flatMap { case (_, pks, _, cks) => Seq(pks, cks) }
              .map(_.map(_.toLowerCase).toSet)
            val distinctOk = distinctFns.forall { f =>
              f.nameParts.last.equalsIgnoreCase("count") &&
                f.filter.isEmpty &&
                f.arguments.forall(_.isInstanceOf[UnresolvedAttribute]) && {
                  val cols = f.arguments.map(
                    _.asInstanceOf[UnresolvedAttribute]
                      .nameParts.last.toLowerCase).toSet
                  keySets.contains(cols)
                }
            }
            if (distinctFns.isEmpty) (agms ++ universe).distinct
            else if (distinctOk && universe.nonEmpty)
              (agms ++ universe).distinct
            else Nil
          }
          .getOrElse(Nil)).distinct
      } catch { case scala.util.control.NonFatal(_) => star }
    }
    val table = features.tableName.getOrElse(return Nil)
    def rel(r: UnresolvedRelation): Boolean =
      r.multipartIdentifier.last.equalsIgnoreCase(table)
    val statsFns = Set("min", "max", "count", "sum", "avg", "mean")
    val pctFns = Set("percentile", "percentile_approx", "approx_percentile",
      "median")
    def classify(e: NamedExpression, g: Option[String]): Seq[Candidate] =
      e match {
        case Alias(f: UnresolvedFunction, _) if f.filter.isEmpty =>
          val fn = f.nameParts.last.toLowerCase
          (f.isDistinct, f.arguments) match {
            case (true, Seq(a: UnresolvedAttribute)) if fn == "count" =>
              Seq(Candidate(table, a.nameParts.last,
                if (g.isDefined) "hll_grouped" else "hll", g))
            case (false, Seq(a: UnresolvedAttribute))
                if statsFns(fn) || pctFns(fn) =>
              Seq(Candidate(table, a.nameParts.last,
                if (g.isDefined) "histogram_grouped" else "histogram", g))
            case (false, Seq(a: UnresolvedAttribute, _: Literal))
                if pctFns(fn) =>
              Seq(Candidate(table, a.nameParts.last,
                if (g.isDefined) "histogram_grouped" else "histogram", g))
            case _ => Nil
          }
        case _ => Nil
      }
    def countStarOnly(outs: Seq[NamedExpression]): Boolean =
      outs.nonEmpty && outs.forall {
        case Alias(f: UnresolvedFunction, _) =>
          f.nameParts.last.equalsIgnoreCase("count") && !f.isDistinct &&
            f.arguments.forall(_.isInstanceOf[Literal])
        case _ => false
      }
    // top-k / iceberg misses: keys + a lone count(*) under ORDER BY
    // count DESC LIMIT k or HAVING count >= x — the shape only the
    // heavy-hitters blob serves (grouped blobs refuse a lone grouped
    // COUNT(*), and high-cardinality keys refuse the build outright)
    topKShape(parsed, table) match {
      case Some(sh)
          if sh.havingMin.isDefined ||
            (sh.limit.isDefined && sh.topCountSort) =>
        val g = sh.gNames.mkString(",")
        return sh.sumCol match {
          case Some(v) => Seq(Candidate(table, v, "topk_sum", Some(g)))
          case None    => Seq(Candidate(table, g, "topk", Some(g)))
        }
      case _ =>
    }
    // the ORDER BY / LIMIT / HAVING wrappers don't change which blob
    // would serve the inner aggregate — classify the peeled shape so
    // sorted/limited dashboards record the same misses (sortability is
    // irrelevant to WHAT to build, so the permissive peel is fine here)
    val shapeCands = graft.plan.PostAggregate.peel(parsed, _ => true)._1 match {
      // composite GROUP BYs advise composite-key grouped sketches (the
      // comma-joined column list is the build recipe's group_by)
      case Aggregate(gs, outs, r: UnresolvedRelation, _)
          if rel(r) && gs.nonEmpty &&
            gs.forall(e => e.isInstanceOf[UnresolvedAttribute] ||
              exprKeyName(e).isDefined) =>
        // expression keys advise builds keyed on their canonical
        // rendering — the builder parses the text back (round 10)
        val g = gs.map {
          case a: UnresolvedAttribute => a.nameParts.last
          case e                      => exprKeyName(e).get
        }.mkString(",")
        outs.flatMap(classify(_, Some(g))).distinct
      // partial-key shape: WHERE a = lit ... GROUP BY b advises the
      // COMPOSITE "a,b" blob (the engine's residual dispatch serves
      // stats/HLL from it by pruning + exact collapse)
      case Aggregate(gs, outs, Filter(cond, r: UnresolvedRelation), _)
          if rel(r) && gs.nonEmpty &&
            gs.forall(_.isInstanceOf[UnresolvedAttribute]) =>
        val gcols = gs.map(_.asInstanceOf[UnresolvedAttribute].nameParts.last)
        residualEqualityFilter(cond, table, gcols) match {
          case Some(res) =>
            val g = (gcols ++ res.map(_._1)).mkString(",")
            // a PERCENTILE residual collapse adds bucket counts, which
            // only a SHARED-GRID build reliably serves (per-group
            // grids refuse multi-entry merges) — advise that variant;
            // stats-only shapes serve from any build
            val hasPct = outs.exists {
              case Alias(f: UnresolvedFunction, _) =>
                pctFns(f.nameParts.last.toLowerCase)
              case _ => false
            }
            outs.flatMap(classify(_, Some(g))).distinct
              .map(c =>
                if (hasPct && c.sketchType == "histogram_grouped")
                  c.copy(sketchType = "histogram_grouped_shared")
                else c)
          case None =>
            // GROUP BY keys + count(*)/percentile outputs under a
            // RANGE on one numeric non-key column: the grouped range
            // serve's miss — advise the grouped histogram over
            // (keys → range column). Percentile outputs must target
            // the range column itself (the serve's own gate).
            val lowerG = gcols.map(_.toLowerCase).toSet
            def aggFor(range: String): PartialFunction[
                org.apache.spark.sql.catalyst.expressions.Expression, Boolean] = {
              case f: UnresolvedFunction
                  if !f.isDistinct && f.filter.isEmpty =>
                (f.nameParts.last.toLowerCase, f.arguments) match {
                  case ("count", Seq(_: Literal)) => true
                  case ("sum" | "avg" | "mean",
                      Seq(a: UnresolvedAttribute)) =>
                    a.nameParts.last.equalsIgnoreCase(range)
                  case ("median", Seq(a: UnresolvedAttribute)) =>
                    a.nameParts.last.equalsIgnoreCase(range)
                  case ("percentile" | "percentile_approx" |
                      "approx_percentile",
                      Seq(a: UnresolvedAttribute, _: Literal)) =>
                    a.nameParts.last.equalsIgnoreCase(range)
                  case _ => false
                }
            }
            rangeBounds(cond) match {
              case Some((c, _, _))
                  if !lowerG.contains(c.toLowerCase) &&
                    numericColumn(table, c) && {
                      val af = aggFor(c)
                      val aggOuts = outs.count {
                        case Alias(f: UnresolvedFunction, _)
                            if af.isDefinedAt(f) => af(f)
                        case _ => false
                      }
                      aggOuts >= 1 && outs.forall {
                        case a: UnresolvedAttribute =>
                          lowerG.contains(a.nameParts.last.toLowerCase)
                        case Alias(a: UnresolvedAttribute, _) =>
                          lowerG.contains(a.nameParts.last.toLowerCase)
                        case Alias(f: UnresolvedFunction, _)
                            if af.isDefinedAt(f) => af(f)
                        case _ => false
                      }
                    } =>
                Seq(Candidate(table, c, "histogram_grouped",
                  Some(gcols.mkString(","))))
              case _ =>
                // RANGE on the (single) GROUP column itself (round
                // 10): the grouped serves prune recorded keys by the
                // parsed integral comparison, so the miss advises the
                // same grouped blob a filterless GROUP BY would
                if (gcols.sizeIs == 1 &&
                    keyRangePred(table, gcols.head,
                      conjunctsOf(cond)).isDefined)
                  outs.flatMap(classify(_, Some(gcols.mkString(","))))
                    .distinct
                else {
                  // RESIDUAL equality + range (round 10 fifth pass):
                  // `WHERE a = lit AND <range on v> GROUP BY b` —
                  // the partial-key grouped range serve's miss:
                  // advise the COMPOSITE "b,a" grouped histogram
                  // over the range column
                  val conj2 = conjunctsOf(cond)
                  val (cmps2, eqs2) = conj2.partition {
                    case _: GreaterThan | _: GreaterThanOrEqual |
                         _: LessThan | _: LessThanOrEqual => true
                    case _ => false
                  }
                  val eqCols = eqs2.map {
                    case EqualTo(a: UnresolvedAttribute, _: Literal) =>
                      Some(a.nameParts.last)
                    case EqualTo(_: Literal, a: UnresolvedAttribute) =>
                      Some(a.nameParts.last)
                    case _ => None
                  }
                  if (cmps2.isEmpty || eqs2.isEmpty ||
                      eqCols.exists(_.isEmpty)) Nil
                  else {
                    val ec = eqCols.flatten
                    rangeBounds(cmps2.reduce(
                      org.apache.spark.sql.catalyst.expressions.And)) match {
                      case Some((c, _, _))
                          if numericColumn(table, c) &&
                            !lowerG.contains(c.toLowerCase) &&
                            !ec.exists(e => e.equalsIgnoreCase(c) ||
                              lowerG.contains(e.toLowerCase)) &&
                            ec.map(_.toLowerCase).distinct.sizeIs ==
                              ec.size && {
                              val af = aggFor(c)
                              outs.exists {
                                case Alias(f: UnresolvedFunction, _)
                                    if af.isDefinedAt(f) => af(f)
                                case _ => false
                              } && outs.forall {
                                case a: UnresolvedAttribute =>
                                  lowerG.contains(
                                    a.nameParts.last.toLowerCase)
                                case Alias(a: UnresolvedAttribute, _) =>
                                  lowerG.contains(
                                    a.nameParts.last.toLowerCase)
                                case Alias(f: UnresolvedFunction, _)
                                    if af.isDefinedAt(f) => af(f)
                                case _ => false
                              }
                            } =>
                        Seq(Candidate(table, c, "histogram_grouped",
                          Some((gcols ++ ec).mkString(","))))
                      case _ => Nil
                    }
                  }
                }
            }
        }
      case Project(outs, r: UnresolvedRelation) if rel(r) =>
        outs.flatMap(classify(_, None)).distinct
      case Project(outs, Filter(cond, r: UnresolvedRelation)) if rel(r) =>
        val gcol = cond match {
          case EqualTo(a: UnresolvedAttribute, _: Literal) =>
            Some(a.nameParts.last)
          case EqualTo(_: Literal, a: UnresolvedAttribute) =>
            Some(a.nameParts.last)
          case In(a: UnresolvedAttribute, ls)
              if ls.nonEmpty && ls.forall(_.isInstanceOf[Literal]) =>
            Some(a.nameParts.last)
          // a conjunction of equalities over distinct columns is the
          // composite point-lookup shape
          case andExpr: org.apache.spark.sql.catalyst.expressions.And =>
            val cols = conjunctsOf(andExpr).map {
              case EqualTo(a: UnresolvedAttribute, _: Literal) =>
                Some(a.nameParts.last)
              case EqualTo(_: Literal, a: UnresolvedAttribute) =>
                Some(a.nameParts.last)
              case _ => None
            }
            if (cols.exists(_.isEmpty) ||
                cols.flatten.map(_.toLowerCase).distinct.sizeIs != cols.size)
              None
            else Some(cols.flatten.mkString(","))
          case _ => None
        }
        gcol match {
          // a lone filtered COUNT(*) is the CMS point-frequency shape;
          // a conjunction over distinct columns advises the COMPOSITE
          // tuple-key CMS, name canonicalized to sorted order so `a AND
          // b` and `b AND a` accumulate (and retire) as one miss —
          // serve dispatch is set-based, so the build order is free
          case Some(g) if countStarOnly(outs) =>
            val name =
              if (g.contains(",")) g.split(",").map(_.trim).sorted.mkString(",")
              else g
            Seq(Candidate(table, name, "cms", None))
          // anchored aggregates under the filter = the filtered-group
          // dispatch shape (grouped blobs keyed by the filter columns).
          // A multi-literal IN percentile serves only by MERGING the
          // named groups' histograms, which needs a shared grid —
          // advise that variant so the advice can actually retire.
          case Some(g) if !countStarOnly(outs) =>
            val multiLit = cond match {
              case In(_, ls) => ls.sizeIs > 1
              case _         => false
            }
            val hasPct = outs.exists {
              case Alias(f: UnresolvedFunction, _) =>
                pctFns(f.nameParts.last.toLowerCase)
              case _ => false
            }
            outs.flatMap(classify(_, Some(g))).distinct
              .map(c =>
                if (multiLit && hasPct && c.sketchType == "histogram_grouped")
                  c.copy(sketchType = "histogram_grouped_shared")
                else c)
          // a lone COUNT(*) under RANGE bounds on one numeric column
          // is the histogram range-count serve's miss — the plain
          // histogram build covers it
          case None if countStarOnly(outs) =>
            rangeBounds(cond) match {
              case Some((c, _, _)) if numericColumn(table, c) =>
                Seq(Candidate(table, c, "histogram", None))
              case _ => Nil
            }
          // count/sum/avg/percentile outputs anchored on the RANGE
          // column itself are the range serve's other miss shapes —
          // the same plain histogram (plus its histsum rider) covers
          // them all
          case None =>
            rangeBounds(cond) match {
              case Some((c, _, _))
                  if numericColumn(table, c) && outs.nonEmpty &&
                    outs.forall {
                      case Alias(f: UnresolvedFunction, _)
                          if !f.isDistinct && f.filter.isEmpty =>
                        (f.nameParts.last.toLowerCase, f.arguments) match {
                          case ("count", Seq(_: Literal)) => true
                          case ("sum" | "avg" | "mean",
                              Seq(a: UnresolvedAttribute)) =>
                            a.nameParts.last.equalsIgnoreCase(c)
                          case ("percentile" | "percentile_approx" |
                              "approx_percentile",
                              Seq(a: UnresolvedAttribute, _: Literal)) =>
                            a.nameParts.last.equalsIgnoreCase(c)
                          case ("median", Seq(a: UnresolvedAttribute)) =>
                            a.nameParts.last.equalsIgnoreCase(c)
                          case _ => false
                        }
                      case _ => false
                    } =>
                Seq(Candidate(table, c, "histogram", None))
              case _ =>
                // integral RANGE on one column with aggregates
                // anchored on OTHER columns = the filtered-group
                // range dispatch's miss (round 10) — advise grouped
                // blobs KEYED by the range column over each
                // aggregate's own column
                val conj = conjunctsOf(cond)
                val names = conj.flatMap(_.collect {
                  case a: UnresolvedAttribute =>
                    a.nameParts.last.toLowerCase
                }).distinct
                names match {
                  case Seq(c) if keyRangePred(table, c, conj).isDefined =>
                    outs.flatMap(classify(_, Some(c))).distinct
                  case _ =>
                    // equality/IN group filter + range on the value
                    // column = the FILTERED-range serve's miss: advise
                    // the grouped histogram keyed by the filter columns
                    // over the range column (shared grid when an
                    // IN-list would have to MERGE groups)
                    def isCmp(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
                      e match {
                        case _: org.apache.spark.sql.catalyst.expressions.GreaterThan |
                             _: org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual |
                             _: org.apache.spark.sql.catalyst.expressions.LessThan |
                             _: org.apache.spark.sql.catalyst.expressions.LessThanOrEqual => true
                        case _ => false
                      }
                    val (cmps, eqs) = conj.partition(isCmp)
                    def vAnchored(v: String): Boolean = outs.forall {
                      case Alias(f: UnresolvedFunction, _)
                          if !f.isDistinct && f.filter.isEmpty =>
                        (f.nameParts.last.toLowerCase, f.arguments) match {
                          case ("count", Seq(_: Literal)) => true
                          case ("sum" | "avg" | "mean",
                              Seq(a: UnresolvedAttribute)) =>
                            a.nameParts.last.equalsIgnoreCase(v)
                          case ("percentile" | "percentile_approx" |
                              "approx_percentile",
                              Seq(a: UnresolvedAttribute, _: Literal)) =>
                            a.nameParts.last.equalsIgnoreCase(v)
                          case ("median", Seq(a: UnresolvedAttribute)) =>
                            a.nameParts.last.equalsIgnoreCase(v)
                          case _ => false
                        }
                      case _ => false
                    }
                    if (cmps.isEmpty || eqs.isEmpty) Nil
                    else rangeBounds(cmps.reduce(
                      org.apache.spark.sql.catalyst.expressions.And)) match {
                      case Some((v, _, _))
                          if numericColumn(table, v) && vAnchored(v) =>
                        val gm: Option[(Seq[String], Boolean)] = eqs match {
                          case Seq(In(a: UnresolvedAttribute, ls))
                              if ls.nonEmpty &&
                                ls.forall(_.isInstanceOf[Literal]) =>
                            Some((Seq(a.nameParts.last), ls.sizeIs > 1))
                          case es =>
                            val cols = es.map {
                              case EqualTo(a: UnresolvedAttribute, _: Literal) =>
                                Some(a.nameParts.last)
                              case EqualTo(_: Literal, a: UnresolvedAttribute) =>
                                Some(a.nameParts.last)
                              case _ => None
                            }
                            if (cols.exists(_.isEmpty) ||
                                cols.flatten.map(_.toLowerCase)
                                  .distinct.sizeIs != cols.size) None
                            else Some((cols.flatten, false))
                        }
                        gm match {
                          case Some((gcols, multiLit))
                              if !gcols.exists(_.equalsIgnoreCase(v)) =>
                            Seq(Candidate(table, v,
                              if (multiLit) "histogram_grouped_shared"
                              else "histogram_grouped",
                              Some(gcols.mkString(","))))
                          case _ => Nil
                        }
                      case _ => Nil
                    }
                }
            }
          case _ => Nil
        }
      case _ => Nil
    }
    // OUTLIER-sample advice (round 11): a FILTERED SUM/AVG/percentile
    // over a measure the catalog's skew profile flags heavy-tailed is
    // the outlier-indexed sample's miss — no blob family serves an
    // arbitrary WHERE, but the sample does (predicates evaluate per-row
    // on it; membership is predicate-independent, so HT stays
    // unbiased). Unfiltered bare aggregates are deliberately excluded:
    // the histogram build's exact stats serve is strictly better there,
    // and is already advised above.
    val outlierCands =
      if (features.hasDistinct || features.hasMinMax ||
          parsed.collectFirst { case f: Filter => f }.isEmpty) Nil
      else sumAvgArgColumns(parsed).toSeq.sorted
        .filter(c => catalog.measureSkewFor(table, c)
          .exists(_.topSharePpm >= OutlierSkewPpmThreshold))
        .map(c => Candidate(table, c, "outlier", None))
    (shapeCands ++ outlierCands).distinct
  }

  /** Build recommendations from accumulated misses: sketchable shapes
    * that did not serve from a sketch at least `minMisses` times and
    * are not already covered by a FRESH stored sketch of the right
    * type (and group-by). Most-missed first. Running the recommended
    * build flips those query shapes to the no-scan catalog path.
    */
  def adviseSketches(minMisses: Int = 3): Seq[graft.learn.SketchAdvisor.Advice] = {
    import graft.learn.SketchAdvisor
    sketchAdvisor.snapshot.toSeq
      .filter(_._2 >= minMisses)
      .filterNot { case (c, _) =>
        // "universe" candidates are SAMPLES, not sketches: covered by
        // a fresh materialized universe sample over the same key
        if (c.sketchType == "universe")
          catalog.universeSampleFor(c.table, c.column).isDefined
        else if (c.sketchType == "outlier")
          // samples, not sketches: covered by a fresh outlier-indexed
          // sample over the same measure column
          catalog.outlierSampleFor(c.table, c.column).isDefined
        else if (c.sketchType == "bottomk")
          // covered by any fresh fixed-size sample on the table
          catalog.bottomKSampleFor(c.table).isDefined
        else if (c.sketchType == "bottomk_grouped")
          catalog.bottomKGroupedSampleFor(c.table).exists(s =>
            catalog.bottomKGroupColumn(s) == c.groupBy)
        else if (c.sketchType == "topk" || c.sketchType == "topk_sum")
          // topk blobs key themselves by BUILD order; coverage is
          // group-by SET equality plus, for the sum variant, the
          // summed value column (the serve dispatches by params)
          catalog.listSketches(Some(c.table)).exists { s =>
            val keySet =
              if (c.sketchType == "topk") c.column else c.groupBy.getOrElse("")
            s.sketchType == "topk" && sketchIsFresh(c.table, s) &&
              topkAggRe.findFirstMatchIn(s.parameters).map(_.group(1))
                .getOrElse("count") ==
                (if (c.sketchType == "topk") "count" else "sum") &&
              (c.sketchType == "topk" ||
                topkValueColRe.findFirstMatchIn(s.parameters)
                  .exists(_.group(1).equalsIgnoreCase(c.column))) &&
              groupByParamRe.findFirstMatchIn(s.parameters).exists(m =>
                m.group(1).split(",").map(canonKey).toSet ==
                  keySet.split(",").map(canonKey).toSet)
          }
        else {
          // candidate types use the advisor's vocabulary; the catalog
          // stores the builders' names ("hll" -> "hyperloglog",
          // "cms" -> "countmin"; the grouped types match verbatim)
          val catalogType = c.sketchType match {
            case "hll" => "hyperloglog"
            case "cms" => "countmin"
            case "histogram_grouped_shared" => "histogram_grouped"
            case other => other
          }
          catalog.getSketch(c.table, c.column, catalogType)
            .filter(sketchIsFresh(c.table, _))
            // a shared-grid miss is covered only by a shared-grid
            // build — a per-group-grid blob of the same shape cannot
            // serve the merge, so it must not retire the advice
            .filter(s => c.sketchType != "histogram_grouped_shared" ||
              s.parameters.contains("\"grid\":\"shared\""))
            .exists(s => c.groupBy.forall(g =>
              // SET comparison: a sketch built as "a,b" covers a miss
              // recorded from a GROUP BY b, a (dispatch is set-equality)
              groupByParamRe.findFirstMatchIn(s.parameters).exists(m =>
                m.group(1).split(",").map(canonKey).toSet ==
                  g.split(",").map(canonKey).toSet)))
        }
      }
      .map { case (c, n) =>
        SketchAdvisor.Advice(c, n, SketchAdvisor.buildRecipe(c))
      }
      .sortBy(a => (-a.misses, a.candidate.toString))
  }

  /** Optional dual-run measurement + history append
    * (/root/reference/app.py:119-138 + the loop the reference never
    * closes, SURVEY §2.B11).
    */
  private def finish(r: AqeResult, sql: String, features: QueryFeatures,
      opts: Options): AqeResult = {
    // advisor: every sketchable shape that did NOT serve from a stored
    // sketch is a miss (the query paid a scan/sample the catalog could
    // have absorbed); only genuine catalog serves are not misses. The
    // gate is servedFromCatalog, NOT planType: the HLL++ fallback also
    // labels itself "sketch" but scans the table. Join-AQP serves
    // (sample_join/universe — AGMS evidence already paid off) are not
    // misses either.
    if (!r.servedFromCatalog && r.strategy != "sample_join" &&
        r.strategy != "sample_universe" && r.planType != "outlier") {
      parsedCached(sql).foreach { case (p, _) =>
        sketchAdvisor.observe(sketchCandidates(p, features))
      }
      // INLINE sampling re-paid the full scan + lottery: a bottom-k
      // sample (fixed-size, mergeable, stream-maintainable) would
      // answer the same shape from k cached rows — surface the build.
      // Grouped queries surface the grouped form keyed on their single
      // group column (per-group representation guaranteed).
      if (r.planType == "sample" && r.sampleTable.isEmpty &&
          features.isSingleTable && !features.hasDistinct &&
          !features.hasMinMax)
        features.tableName.foreach { t =>
          import graft.learn.SketchAdvisor.Candidate
          val c = features.groupByColumns match {
            case Seq(g) => Candidate(t, "", "bottomk_grouped",
              Some(g.split("\\.").last.stripSuffix("`").stripPrefix("`")
                .toLowerCase))
            case Seq() => Candidate(t, "", "bottomk", None)
            case _     => Candidate(t, "", "bottomk", None)
          }
          sketchAdvisor.observe(Seq(c))
        }
    }
    // an INLINE universe serve answers well but still pays the lottery
    // hash over BOTH big scans per query — observe only the
    // universe-pair candidates, so repeated two-big joins surface the
    // materialized-pair build that amortizes the hash to one pass
    else if (r.strategy == "sample_universe" && r.sampleTable.isEmpty)
      parsedCached(sql).foreach { case (p, _) =>
        sketchAdvisor.observe(
          sketchCandidates(p, features).filter(_.sketchType == "universe"))
      }
    if (!opts.measureExact) return r
    val t0 = System.nanoTime()
    val approxRows = r.df.collect()
    val tApprox = (System.nanoTime() - t0) / 1e6
    val t1 = System.nanoTime()
    val exactDf = spark.sql(sql)
    val exactRows = exactDf.collect()
    val tExact = (System.nanoTime() - t1) / 1e6
    val speedup = if (tApprox > 0) tExact / tApprox else 1.0

    // Realized mean |rel error| across numeric cells. Single-row results
    // compare positionally (the only shape the reference measures);
    // multi-row results join approx/exact on the grouping-key output
    // columns — without this, every sampled GROUP BY would record 0.0
    // and the history adjustment (score = 0.6*speedup - 0.4*error)
    // would systematically flatter sampling on grouped workloads.
    val err: Double =
      if (approxRows.length == 1 && exactRows.length == 1) {
        val pairs = exactRows.head.toSeq.zipWithIndex.collect {
          case (v: Number, i) if v.doubleValue() != 0 &&
              i < approxRows.head.length && approxRows.head.get(i) != null =>
            approxRows.head.get(i) match {
              case a: Number =>
                math.abs(a.doubleValue() - v.doubleValue()) / math.abs(v.doubleValue())
            }
        }
        if (pairs.nonEmpty) pairs.sum / pairs.size else 0.0
      } else groupedError(sql, r.df.schema.fieldNames, approxRows,
        exactDf.schema.fieldNames, exactRows)

    history.append(QueryHistory.Record(
      queryPattern = QueryHistory.pattern(features),
      tableSize = features.tableName.flatMap(t => catalog.statsFor(t).map(_.rowCount)).getOrElse(0L),
      strategy = r.strategy,
      actualSpeedup = speedup,
      actualError = err,
      predictedSpeedup = r.estimatedSpeedup,
      predictedError = r.estimatedError,
      executionTimeMs = tApprox.toLong,
      errorTolerance = opts.maxRelError,
      timestampMs = System.currentTimeMillis()))

    r.copy(executionTimeMs = Some(tApprox.toLong), actualSpeedup = Some(speedup))
  }
}

/** See [[QueryEngine!.topKShape]] (top-level so the synthesized equals
  * carries no outer reference).
  */
private[engine] final case class TopKShape(
    gNames: Seq[String],
    outs: Seq[(String, Option[Int])], // (output name, Some(key idx) | None = metric)
    metricName: String,
    sumCol: Option[String],           // None = count(*); Some(x) = sum(x)
    havingMin: Option[(Double, Boolean)], // (bound, strict >)
    sorts: Seq[(String, Boolean, Boolean)], // (output, descending, nulls first)
    topCountSort: Boolean,            // first sort key = metric DESC
    limit: Option[Int])
