package graft.plan

import graft.catalog.{MetaCatalog, SampleNaming}

/** Cost-based physical-input planner — decides exact vs pre-created-sample
  * execution. Cost model and selection logic ported from the reference
  * (/root/reference/planner.py:14-19,187-272): exact cost = N * 1.0
  * (+ min(N,10000) * 2.0 for GROUP BY); sample cost = N*f + 5.0; sample
  * error = sqrt(1/(f*N)); strategies violating maxRelError are filtered,
  * then minimum cost wins.
  *
  * This produces the single typed SamplingDecision that flows through the
  * whole pipeline — one sampling decision, one scaling step, by
  * construction (fixes the reference's double-sampling hazard, SURVEY §2.C1).
  */
object Planner {

  val ScanCostPerRow = 1.0
  val HashCostPerGroup = 2.0
  val SampleSetupCost = 5.0
  /** Cost of answering from a stored catalog sketch/stat blob: a
    * driver-side map lookup, no scan. The reference DECLARES
    * `sketch_query_cost: 10.0` in its cost model
    * (/root/reference/planner.py:17) but never enumerates a sketch
    * strategy — the constant is dead. Here the capability is real, and
    * a no-scan serve is costed at one row's scan: strictly below any
    * exact scan (>= rowCount) or sample scan (>= SampleSetupCost) of a
    * non-empty table, so a serve that meets the error budget always
    * wins the enumeration — which is exactly the engine's dispatch
    * order, keeping explain-mode output and execution in agreement.
    */
  val CatalogServeCost = 1.0

  /** The single source of truth for how the query's input is read. */
  sealed trait SamplingDecision {
    def fraction: Option[Double]
    def isSampled: Boolean = fraction.isDefined
  }
  /** Read the base table as-is. */
  case object ReadExact extends SamplingDecision { val fraction = None }
  /** Substitute a pre-materialized sample table for the base table. */
  case class ReadSampleTable(sampleTable: String, f: Double)
      extends SamplingDecision { def fraction = Some(f) }
  /** Inject a Sample node over the base relation (no materialized sample
    * exists) — the Spark-native form of the reference's inline
    * `ROWID % k = 0` rewrite (/root/reference/ml_optimizer.py:236-240).
    */
  case class ReadInlineSample(f: Double, seed: Long)
      extends SamplingDecision { def fraction = Some(f) }
  /** Systematic (keyed-hash) inline sampling — the faithful form of the
    * reference's deterministic `ROWID % k = 0` rewrite
    * (/root/reference/ml_optimizer.py:236-240): membership is a pure
    * function of `key`, so the sample is reproducible across runs,
    * partitionings, and engines (and therefore oracle-checkable), and
    * co-keyed rows (e.g. the lines of one order) share fate — cluster
    * sampling, which keeps HT estimates unbiased per row.
    */
  case class ReadInlineSystematic(f: Double, key: String)
      extends SamplingDecision { def fraction = Some(f) }
  /** Answer from a stored catalog artifact (sketch / stat blob) with no
    * scan at all. `kind` names the serve family the engine verified is
    * available ("stats", "grouped_stats", "histogram",
    * "grouped_histogram", "filtered_group", "cms", "hll",
    * "grouped_hll").
    */
  case class ReadCatalogServe(kind: String)
      extends SamplingDecision { val fraction = None }

  /** A no-scan catalog serve the ENGINE has already verified is
    * available for this query (the sketch exists, is fresh, and covers
    * every output): the planner's job is to enumerate it against
    * exact/sample with its cost and reported error bound, so
    * explain-mode output names the strategy that will actually run.
    */
  case class ServeCandidate(kind: String, error: Double, detail: String)

  case class Plan(
      planType: String,            // "exact" | "sample"
      decision: SamplingDecision,
      table: Option[String],
      estimatedCost: Double,
      estimatedError: Double,
      reason: String)

  def plan(features: QueryFeatures, catalog: MetaCatalog,
      rowCount: Long, maxRelError: Double,
      preferExact: Boolean,
      serves: Seq[ServeCandidate] = Nil,
      // measure columns referenced by the query's SUM/AVG/percentile
      // arguments (QueryEngine.sumAvgArgColumns): when an OUTLIER-
      // indexed sample exists over one, it enumerates as a sample
      // candidate — the cost model must know every input the engine
      // can actually serve from, or explain-mode (and the
      // use_ml_optimization=false route) misstate the plan.
      measureCols: Set[String] = Set.empty): Plan = {

    val table = features.tableName
    val exactCost = estimateExactCost(features, rowCount)
    val exact = Plan("exact", ReadExact, table, exactCost, 0.0,
      "exact execution")

    if (preferExact) return exact.copy(reason = "exact execution (user preference)")
    // Catalog serves enumerate like any other candidate: cost
    // CatalogServeCost, error = the serve's own reported bound. Listed
    // FIRST so a cost tie (only possible on a 1-row table) breaks
    // toward the no-scan serve. They are deliberately NOT gated on
    // hasApproximableAgg: the serve families cover shapes (percentiles,
    // COUNT(DISTINCT)) the reference's sampling model does not.
    val validServes = serves
      .map(s => Plan("sketch", ReadCatalogServe(s.kind), table,
        CatalogServeCost, s.error, s"catalog serve (${s.kind}): ${s.detail}"))
      .filter(_.estimatedError <= maxRelError)

    // Reference parity: only single-table COUNT/SUM/AVG queries are
    // candidates for approximation; joins and MIN/MAX-only queries run
    // exact (planner.py:107-112; README.md:111-115).
    if (table.isEmpty || !features.isSingleTable || !features.hasApproximableAgg)
      return (validServes :+ exact).minBy(_.estimatedCost)

    // Querying a sample table directly: run exact on it, caller scales
    // knowing the fraction from the name (planner.py:45-60).
    if (SampleNaming.parse(table.get).isDefined)
      return (validServes :+
        exact.copy(reason = "direct query on a sample table"))
        .minBy(_.estimatedCost)

    // a fresh outlier-indexed sample over a referenced measure is a
    // sample candidate too (the engine's dispatch will prefer it over
    // the plain-sample rewrite); the uniform-sample error formula is a
    // CONSERVATIVE bound for it — the heavy tail reads exactly, so the
    // true variance is strictly smaller on the skewed measures the
    // sample exists for
    // guarded exactly like the engine dispatch: distinct/min-max shapes
    // must never see a sample plan here — plannerOnlyChoice would route
    // them to the generic sample path, where an un-rewritable MAX over
    // sampled rows silently underestimates
    val outlierCand = (if (features.hasDistinct || features.hasMinMax) Nil
      else measureCols.toSeq.sorted).iterator
      .flatMap(c => catalog.outlierSampleFor(table.get, c).iterator)
      .nextOption()
      .map { s =>
        val err = math.sqrt(1.0 / math.max(1.0, s.fraction * rowCount))
        val cost = rowCount * s.fraction * ScanCostPerRow + SampleSetupCost
        Plan("sample", ReadSampleTable(s.sampleTable, s.fraction), table,
          cost, err,
          s"outlier-indexed sample ${s.sampleTable} (heavy tail exact at weight 1)")
      }.toSeq

    // a fresh bottom-k (fixed-size order-statistic) sample is a sample
    // candidate too: cost scales with k (not the table), error is the
    // fixed-size √(1/k). Guarded exactly like the outlier candidate —
    // a fixed-size row sample can miss extremes and cannot scale
    // distincts. The engine's dispatch recognizes the chosen table and
    // applies the post-aggregation N/k scale instead of per-row HT.

    // a fresh GROUPED bottom-k sample is a candidate for grouped
    // queries whose GROUP BY contains its group column (one weight per
    // output group); error = √(1/k_g) over the actually-subsampled
    // groups. Same distinct/min-max guard.
    val bottomKGCand = (if (features.hasDistinct || features.hasMinMax ||
        !features.hasGroupBy) None
      else catalog.bottomKGroupedSampleFor(table.get)
        .filter { s =>
          def norm(c: String): String =
            c.split("\\.").last.stripSuffix("`").stripPrefix("`").toLowerCase
          catalog.bottomKGroupColumn(s).exists(g =>
            features.groupByColumns.map(norm).contains(g))
        }).map { s =>
        val strata = catalog.strataFor(s.sampleTable)
        val errs = strata.filter(st => st.sampleSize < st.popSize)
          .map(st => math.sqrt(1.0 / math.max(1L, st.sampleSize)))
        val err = if (errs.isEmpty) 0.0 else errs.max
        val k = strata.map(_.sampleSize).sum
        val cost = k * ScanCostPerRow + SampleSetupCost
        Plan("sample", ReadSampleTable(s.sampleTable, s.fraction), table,
          cost, err,
          s"grouped bottom-k sample ${s.sampleTable} (fixed-size per group)")
      }.toSeq

    // a grouped query with a MATCHING grouped bottom-k sample must not
    // fall to the plain one on cost alone: the grouped form's whole
    // point is per-group representation, so it preempts (the
    // stratified-over-outlier precedence, again).
    val bottomKCand = (if (features.hasDistinct || features.hasMinMax ||
        bottomKGCand.nonEmpty) None
      else catalog.bottomKSampleFor(table.get)).map { s =>
        val k = catalog.strataFor(s.sampleTable).headOption
          .map(_.sampleSize).getOrElse(0L)
        val err = math.sqrt(1.0 / math.max(1.0, k.toDouble))
        val cost = k * ScanCostPerRow + SampleSetupCost
        Plan("sample", ReadSampleTable(s.sampleTable, s.fraction), table,
          cost, err,
          s"bottom-k sample ${s.sampleTable} (fixed-size order-statistic, k=$k)")
      }.toSeq

    val candidates = validServes ++ outlierCand ++ bottomKGCand ++ bottomKCand ++ (exact +: catalog.bestUniformSample(table.get).map { s =>
      val err = math.sqrt(1.0 / (s.fraction * rowCount))
      val cost = rowCount * s.fraction * ScanCostPerRow + SampleSetupCost
      Plan("sample", ReadSampleTable(s.sampleTable, s.fraction), table,
        cost, err, f"using ${s.fraction * 100}%.1f%% sample")
    }.toSeq)

    val valid = candidates.filter(_.estimatedError <= maxRelError)
    if (valid.isEmpty) exact
    else valid.minBy(_.estimatedCost)
  }

  def estimateExactCost(features: QueryFeatures, rowCount: Long): Double = {
    var cost = rowCount * ScanCostPerRow
    if (features.hasGroupBy)
      cost += math.min(rowCount, 10000L) * HashCostPerGroup
    cost
  }
}
