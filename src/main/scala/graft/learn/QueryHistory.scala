package graft.learn

import scala.collection.mutable.ArrayBuffer

/** Query-performance history — the reference declares this learning loop
  * but never writes to it (/root/reference/ml_optimizer.py:305-321 creates
  * `ml_query_performance_history`; nothing INSERTs — SURVEY §2.B11). Here
  * the loop is closed: QueryEngine appends a record after each measured
  * query, and StrategyChooser's history adjustment actually sees data.
  */
object QueryHistory {
  case class Record(
      queryPattern: String,
      tableSize: Long,
      strategy: String,
      actualSpeedup: Double,
      actualError: Double,
      predictedSpeedup: Double,
      predictedError: Double,
      executionTimeMs: Long,
      errorTolerance: Double,
      timestampMs: Long)

  /** Normalized query pattern used to match "similar" queries — feature
    * signature instead of the reference's raw-SQL pattern matching.
    */
  def pattern(f: graft.plan.QueryFeatures): String = {
    val aggs = f.aggFunctions.sorted.mkString(",")
    s"t=${f.tableName.getOrElse("?")};aggs=$aggs;gb=${f.groupByArity};d=${f.hasDistinct}"
  }
}

final class QueryHistory {
  import QueryHistory._
  private val records = ArrayBuffer.empty[Record]

  def append(r: Record): Unit = synchronized { records += r }

  /** Records matching a query pattern, most recent first (cap like the
    * reference's LIMIT on its history SELECT).
    */
  def forPattern(p: String, limit: Int = 50): Seq[Record] = synchronized {
    records.filter(_.queryPattern == p).sortBy(-_.timestampMs).take(limit).toSeq
  }

  def all: Seq[Record] = synchronized { records.toSeq }

  /** Per-strategy learning stats over the trailing window — the
    * reference's GET /ml/stats (/root/reference/ml_optimizer.py:406-438):
    * query_count / avg_speedup / avg_error per strategy, 30-day window.
    */
  def learningStats(windowDays: Int = 30,
      nowMs: Long = System.currentTimeMillis()): Map[String, (Long, Double, Double)] = synchronized {
    val cutoff = nowMs - windowDays.toLong * 24 * 3600 * 1000
    records.filter(_.timestampMs >= cutoff).groupBy(_.strategy).map {
      case (s, rs) =>
        s -> ((rs.size.toLong,
          rs.map(_.actualSpeedup).sum / rs.size,
          rs.map(_.actualError).sum / rs.size))
    }.toMap
  }
}
