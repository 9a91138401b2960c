package graft.plan

import graft.learn.QueryHistory

/** Rule-based strategy chooser with a learning adjustment — the
  * reference's "ML optimizer" (/root/reference/ml_optimizer.py:115-179),
  * rule table and formulas ported verbatim so behavior on an empty
  * history is identical. Unlike the reference (whose history table is
  * never written — SURVEY.md §2.B11), our history loop is actually closed
  * by QueryEngine recording measured speedup/error after each query.
  */
object StrategyChooser {

  sealed trait Strategy { def name: String }
  case object Exact extends Strategy { val name = "exact" }
  case object Sample extends Strategy { val name = "sample" }
  case object Sketch extends Strategy { val name = "sketch" }
  case object Stratified extends Strategy { val name = "stratified" }

  case class Choice(strategy: Strategy, confidence: Double,
      reasoning: String)

  /** Base rule table (/root/reference/ml_optimizer.py:152-178). */
  def chooseBase(f: QueryFeatures, tableSize: Long,
      errorTolerance: Double): Choice = {
    if (tableSize <= 1000)
      Choice(Exact, 0.95, "small table: exact execution is already fast")
    else if (f.hasDistinct && f.hasCount && errorTolerance > 0.001)
      Choice(Sketch, 0.90, "COUNT DISTINCT: probabilistic sketch (HLL)")
    else if (f.hasGroupBy && errorTolerance > 0.001) {
      if (tableSize > 10000 && f.groupByArity > 1)
        Choice(Stratified, 0.85, "multi-column GROUP BY on large table: stratified sampling reduces variance")
      else
        Choice(Sketch, 0.80, "GROUP BY: sketch-backed approximation")
    }
    else if (tableSize > 5000 && errorTolerance > 0.001 && f.hasApproximableAgg)
      Choice(Sample, 0.85, "large aggregation: uniform sampling")
    else if (tableSize > 1000 && errorTolerance > 0.001 && (f.hasCount || f.hasSum))
      Choice(Sample, 0.75, "medium table with basic aggregation: uniform sampling")
    else
      Choice(Exact, 0.60, "no approximation rule matched: exact execution")
  }

  /** History adjustment (/root/reference/ml_optimizer.py:120-150):
    * per-strategy composite score 0.6*avgSpeedup - 0.4*avgError; switch if
    * a strategy scores higher AND its avg error fits 1.2x the tolerance;
    * confidence = min(0.6 + 0.3*(n/10), 0.95).
    */
  def choose(f: QueryFeatures, tableSize: Long, errorTolerance: Double,
      history: Seq[QueryHistory.Record]): Choice = {
    val base = chooseBase(f, tableSize, errorTolerance)
    if (history.isEmpty) return base

    val byStrategy = history.groupBy(_.strategy)
    var bestScore = 0.0
    var best = base
    byStrategy.foreach { case (name, recs) =>
      val n = recs.size
      val avgSpeedup = recs.map(_.actualSpeedup).sum / n
      val avgError = recs.map(_.actualError).sum / n
      val score = avgSpeedup * 0.6 - avgError * 0.4
      if (score > bestScore && avgError <= errorTolerance * 1.2) {
        bestScore = score
        val strat = name match {
          case "sample"     => Sample
          case "sketch"     => Sketch
          case "stratified" => Stratified
          case _            => Exact
        }
        best = Choice(strat, math.min(0.6 + 0.3 * (n / 10.0), 0.95),
          f"history: $name averaged $avgSpeedup%.1fx speedup at $avgError%.3f error over $n queries")
      }
    }
    best
  }

  /** Strategy -> sampling fraction (/root/reference/ml_optimizer.py:203-214,
    * 258-263): size-tiered for `sample`, flat 30% for `sketch` (the
    * reference's "sketch" strategy is systematic 30% sampling — SURVEY §4.4).
    * Halved when the caller tolerates >10% error.
    */
  def sampleFraction(strategy: Strategy, tableSize: Long,
      errorTolerance: Double): Option[Double] = strategy match {
    case Sample =>
      val base =
        if (tableSize > 100000) 0.01
        else if (tableSize > 50000) 0.02
        else 0.05
      Some(if (errorTolerance > 0.1) base * 0.5 else base)
    case Sketch => Some(0.3)
    case _      => None
  }

  /** Predicted speedup/error for the decision, reference formulas
    * (/root/reference/ml_optimizer.py:236-274).
    */
  def predict(strategy: Strategy, tableSize: Long, fraction: Option[Double])
      : (Double, Double) = strategy match {
    case Sample =>
      val f = fraction.getOrElse(0.05)
      val sampleSize = math.max(100, (tableSize * f).toInt)
      val err = math.max(0.01, math.min(0.50, 1.0 / math.sqrt(sampleSize.toDouble)))
      (1.0 / f, err)
    case Sketch =>
      if (tableSize > 5000) {
        val sampleSize = (tableSize * 0.3).toInt
        val err = math.max(0.02, math.min(0.30, 1.0 / math.sqrt(sampleSize.toDouble)))
        (tableSize.toDouble / sampleSize, err)
      } else (3.0, 0.05)
    case Stratified => (8.0, 0.02)
    case Exact      => (1.0, 0.0)
  }
}
