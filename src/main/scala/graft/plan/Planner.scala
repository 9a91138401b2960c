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

  case class Plan(
      planType: String,            // "exact" | "sample"
      decision: SamplingDecision,
      table: Option[String],
      estimatedCost: Double,
      estimatedError: Double,
      reason: String)

  def plan(features: QueryFeatures, catalog: MetaCatalog,
      rowCount: Long, maxRelError: Double,
      preferExact: Boolean): Plan = {

    val table = features.tableName
    val exactCost = estimateExactCost(features, rowCount)
    val exact = Plan("exact", ReadExact, table, exactCost, 0.0,
      "exact execution")

    if (preferExact) return exact.copy(reason = "exact execution (user preference)")
    // Reference parity: only single-table COUNT/SUM/AVG queries are
    // candidates for approximation; joins and MIN/MAX-only queries run
    // exact (planner.py:107-112; README.md:111-115).
    if (table.isEmpty || !features.isSingleTable || !features.hasApproximableAgg)
      return exact

    // Querying a sample table directly: run exact on it, caller scales
    // knowing the fraction from the name (planner.py:45-60).
    if (SampleNaming.parse(table.get).isDefined)
      return exact.copy(reason = "direct query on a sample table")

    val candidates = exact +: catalog.bestUniformSample(table.get).map { s =>
      val err = math.sqrt(1.0 / (s.fraction * rowCount))
      val cost = rowCount * s.fraction * ScanCostPerRow + SampleSetupCost
      Plan("sample", ReadSampleTable(s.sampleTable, s.fraction), table,
        cost, err, f"using ${s.fraction * 100}%.1f%% sample")
    }.toSeq

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
