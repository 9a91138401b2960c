package graft.plan

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical._

/** Skew-aware two-stage ("salted") aggregation rewrite — the automatic
  * form of the q35 pattern, driven by the q65 detector's statistics
  * persisted in the MetaCatalog (`QueryEngine.profileKeySkew` closes
  * the loop).
  *
  * A GROUP BY whose hottest key holds a large share of the rows puts
  * that key's entire reduce-side state on ONE task. The rewrite splits
  * the aggregate:
  *
  *   stage 1: GROUP BY (keys…, salt)  — partials per salt bucket
  *   stage 2: GROUP BY (keys…)        — merge the ≤`salts` partials
  *
  * so the hot key's work spreads over up to `salts` reducers. The salt
  * is `pmod(hash(spark_partition_id(), monotonically_increasing_id()),
  * salts)` — row-varying, so it also splits the stage-1 hash-map state,
  * which is where skew actually hurts once map-side combine stops
  * collapsing rows (many-distinct-values states; plain COUNT/SUM
  * partials already collapse per map task). The analyzer's
  * PullOutNondeterministic rule hoists the nondeterministic salt into a
  * Project below the aggregate; the merged result is exactly the
  * single-stage aggregate for COUNT/MIN/MAX and integral SUM/AVG
  * (floating-point SUM/AVG may differ in the last ulp, the same
  * reassociation any repartitioning already implies).
  *
  * Supported shapes: single Aggregate over attribute-only grouping
  * keys whose outputs are grouping passthroughs plus either (a)
  * unfiltered, non-distinct COUNT/SUM/MIN/MAX/AVG calls (salted
  * two-stage merge), or (b) COUNT(DISTINCT x) over one attribute
  * (dedup-then-count two-stage, [[distinctTwoStage]]) — anything else
  * returns None and the caller runs the plain plan. Caveat: SUM over a
  * DECIMAL column re-sums the partials, widening the result type by 10
  * digits; the engine's registered tables carry doubles/longs, where
  * re-summing is type-preserving.
  */
object SaltRewrite {

  /** Salt fan-out: the hot key's reduce state spreads over this many
    * tasks. 16 covers a 32-slot local run and is a sane executor-count
    * divisor at cluster scale.
    */
  val DefaultSalts = 16

  /** Skew gate: salt when the hottest key holds ≥10% of the table
    * (1e5 ppm). Below that, the plain hash aggregate's per-key reduce
    * state is within a task's normal share.
    */
  val SkewPpmThreshold = 100000L

  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(Seq(name), args.toSeq, isDistinct = false)

  private def isAgg(f: UnresolvedFunction, names: String*): Boolean =
    names.contains(f.nameParts.last.toLowerCase) && !f.isDistinct &&
      f.filter.isEmpty

  /** Rewrite `plan`'s topmost Aggregate (descending through ORDER BY /
    * LIMIT / HAVING wrappers) into the two-stage salted form, or None
    * if any output shape is unsupported.
    */
  def apply(plan: LogicalPlan, salts: Int = DefaultSalts): Option[LogicalPlan] =
    plan match {
      case a: Aggregate =>
        saltAggregate(a, salts).orElse(distinctTwoStage(a))
      case u @ (_: Sort | _: GlobalLimit | _: LocalLimit | _: Filter |
                _: Distinct | _: Offset) =>
        val un = u.asInstanceOf[UnaryNode]
        apply(un.child, salts).map(c => un.withNewChildren(Seq(c)))
      case _ => None
    }

  /** COUNT(DISTINCT x) under a hot grouping key — the skew shape
    * map-side combine does NOT fix (the per-key distinct state grows
    * with the key's row count, all on one reduce task). Rewritten as
    * dedup-then-count:
    *
    *   stage 1: GROUP BY (keys…, x)   — distinct pairs, spread by
    *                                    hash(keys…, x) over ALL tasks
    *   stage 2: GROUP BY (keys…) COUNT(x)
    *
    * Exact by construction (COUNT over deduped non-null x = COUNT
    * DISTINCT x). Applies when every aggregate output is
    * COUNT(DISTINCT x) over the same single attribute.
    */
  private def distinctTwoStage(a: Aggregate): Option[LogicalPlan] = {
    val groupAttrs: Seq[UnresolvedAttribute] = a.groupingExpressions.map {
      case u: UnresolvedAttribute => u
      case _                      => return None
    }
    if (groupAttrs.isEmpty) return None
    def isGroupRef(u: UnresolvedAttribute): Boolean =
      groupAttrs.exists(_.nameParts == u.nameParts)

    var arg: Option[UnresolvedAttribute] = None
    val outs: Seq[NamedExpression] = a.aggregateExpressions.map { ne =>
      val (inner, name) = ne match {
        case Alias(child, n)        => (child, n)
        case u: UnresolvedAttribute => (u: Expression, u.nameParts.last)
        case other                  => (other: Expression, other.sql)
      }
      inner match {
        case u: UnresolvedAttribute if isGroupRef(u) => ne
        case f: UnresolvedFunction
            if f.nameParts.last.equalsIgnoreCase("count") && f.isDistinct &&
              f.filter.isEmpty && f.arguments.sizeIs == 1 =>
          f.arguments.head match {
            case x: UnresolvedAttribute
                if arg.forall(_.nameParts == x.nameParts) =>
              arg = Some(x)
              Alias(fn("count", UnresolvedAttribute(x.nameParts)), name)()
            case _ => return None
          }
        case _ => return None
      }
    }
    arg.map { x =>
      val inner = Aggregate(
        (groupAttrs: Seq[Expression]) :+ x,
        (groupAttrs: Seq[NamedExpression]) :+ x,
        a.child)
      Aggregate(
        groupAttrs.map(g => UnresolvedAttribute(g.nameParts): Expression),
        outs, inner)
    }
  }

  private def saltAggregate(a: Aggregate, salts: Int): Option[LogicalPlan] = {
    val groupAttrs: Seq[UnresolvedAttribute] = a.groupingExpressions.map {
      case u: UnresolvedAttribute => u
      case _                      => return None // expression keys: skip
    }
    if (groupAttrs.isEmpty) return None

    val partials = Seq.newBuilder[NamedExpression]
    var tmpIdx = 0
    def tmp(): String = { tmpIdx += 1; s"__graft_p$tmpIdx" }

    def isGroupRef(u: UnresolvedAttribute): Boolean =
      groupAttrs.exists(_.nameParts == u.nameParts)

    val outerOutputs: Seq[NamedExpression] = a.aggregateExpressions.map { ne =>
      val (inner, name) = ne match {
        case Alias(child, n)        => (child, n)
        case u: UnresolvedAttribute => (u: Expression, u.nameParts.last)
        case other                  => (other: Expression, other.sql)
      }
      inner match {
        case u: UnresolvedAttribute if isGroupRef(u) => ne
        case f: UnresolvedFunction if isAgg(f, "count") =>
          val t = tmp(); partials += Alias(f, t)()
          Alias(fn("sum", UnresolvedAttribute(t)), name)()
        case f: UnresolvedFunction if isAgg(f, "sum") =>
          val t = tmp(); partials += Alias(f, t)()
          Alias(fn("sum", UnresolvedAttribute(t)), name)()
        case f: UnresolvedFunction if isAgg(f, "min") =>
          val t = tmp(); partials += Alias(f, t)()
          Alias(fn("min", UnresolvedAttribute(t)), name)()
        case f: UnresolvedFunction if isAgg(f, "max") =>
          val t = tmp(); partials += Alias(f, t)()
          Alias(fn("max", UnresolvedAttribute(t)), name)()
        case f: UnresolvedFunction if isAgg(f, "avg", "mean") =>
          val x = f.arguments.head
          val ts = tmp(); partials += Alias(fn("sum", x), ts)()
          val tc = tmp(); partials += Alias(fn("count", x), tc)()
          Alias(Divide(fn("sum", UnresolvedAttribute(ts)),
            fn("sum", UnresolvedAttribute(tc))), name)()
        case _ => return None // window/UDF/distinct/filtered: skip
      }
    }

    val salt = CatalystSqlParser.parseExpression(
      s"pmod(hash(spark_partition_id(), monotonically_increasing_id()), $salts)")
    val inner = Aggregate(
      (groupAttrs: Seq[Expression]) :+ salt,
      (groupAttrs: Seq[NamedExpression]) ++ partials.result(),
      a.child)
    Some(Aggregate(
      groupAttrs.map(g => UnresolvedAttribute(g.nameParts): Expression),
      outerOutputs, inner))
  }
}
