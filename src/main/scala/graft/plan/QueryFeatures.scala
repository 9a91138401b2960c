package graft.plan

import org.apache.spark.sql.catalyst.analysis.{UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Expression, Or}
import org.apache.spark.sql.catalyst.plans.logical._

/** Query features driving strategy selection — same feature set as the
  * reference's regex extraction (/root/reference/ml_optimizer.py:65-113,
  * planner.py:80-105), but computed from the PARSED Catalyst plan, which
  * eliminates the reference's regex bugs by construction (its group-by
  * char-class truncation, substring table matches; SURVEY.md §2.C3).
  */
case class QueryFeatures(
    tables: Seq[String],
    aggFunctions: Seq[String],    // lower-cased: count/sum/avg/min/max/...
    hasCount: Boolean,
    hasSum: Boolean,
    hasAvg: Boolean,
    hasMinMax: Boolean,
    hasDistinct: Boolean,
    hasGroupBy: Boolean,
    groupByArity: Int,
    groupByColumns: Seq[String],
    whereComplexity: Int,         // number of AND/OR in filter predicates
    hasOrderBy: Boolean,
    hasLimit: Boolean,
    hasJoin: Boolean,
    queryLength: Int) {
  def tableName: Option[String] = tables.headOption
  def isSingleTable: Boolean = tables.size == 1 && !hasJoin
  /** Aggregations the reference is willing to approximate: COUNT/SUM/AVG
    * only, never MIN/MAX (/root/reference/README.md:111-114).
    */
  def hasApproximableAgg: Boolean = hasCount || hasSum || hasAvg
}

object QueryFeatures {

  def extract(plan: LogicalPlan, sql: String): QueryFeatures = {
    val tables = plan.collect {
      case r: UnresolvedRelation => r.multipartIdentifier.mkString(".")
    }.distinct

    // NOTE: at parse time an aggregate WITHOUT group-by is still a
    // Project (the analyzer's GlobalAggregates rule converts it later),
    // so aggregate calls must be collected from both Project and
    // Aggregate select lists.
    val aggNodes = plan.collect { case a: Aggregate => a }
    val selectLists = plan.collect {
      case a: Aggregate => a.aggregateExpressions
      case p: Project   => p.projectList
    }.flatten
    val knownAggs = Set("count", "sum", "avg", "mean", "min", "max",
      "stddev", "stddev_samp", "var_samp", "variance")
    val aggFns = selectLists.flatMap(_.collect {
      case f: UnresolvedFunction
          if knownAggs.contains(f.nameParts.last.toLowerCase) => f
    })
    val names = aggFns.map(_.nameParts.last.toLowerCase)
    val distinct = aggFns.exists(_.isDistinct) ||
      plan.collectFirst { case d: Distinct => d }.isDefined

    val groupCols = aggNodes.headOption.map(_.groupingExpressions).getOrElse(Nil)

    val whereComplexity = plan.collect { case f: Filter => f.condition }
      .map(countBool).sum

    val joins = plan.collect { case j: Join => j }

    QueryFeatures(
      tables = tables,
      aggFunctions = names,
      hasCount = names.contains("count"),
      hasSum = names.contains("sum"),
      hasAvg = names.contains("avg") || names.contains("mean"),
      hasMinMax = names.contains("min") || names.contains("max"),
      hasDistinct = distinct,
      hasGroupBy = groupCols.nonEmpty,
      groupByArity = groupCols.size,
      groupByColumns = groupCols.map(_.sql),
      whereComplexity = whereComplexity,
      hasOrderBy = plan.collectFirst { case s: Sort => s }.isDefined,
      hasLimit = plan.collectFirst {
        case l: GlobalLimit => l
        case l: LocalLimit => l
      }.isDefined,
      hasJoin = joins.nonEmpty || tables.size > 1,
      queryLength = sql.length)
  }

  private def countBool(e: Expression): Int = e match {
    case And(l, r) => 1 + countBool(l) + countBool(r)
    case Or(l, r)  => 1 + countBool(l) + countBool(r)
    case other     => other.children.map(countBool).sum
  }
}
