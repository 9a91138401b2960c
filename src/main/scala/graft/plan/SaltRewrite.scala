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
  * Supported shapes: single Aggregate whose grouping keys are
  * attributes or deterministic scalar expressions (an expression key
  * like `date_trunc('day', ts)` is aliased into the stage-1 output and
  * stage 2 groups by the alias), and whose outputs are grouping
  * passthroughs plus either (a) unfiltered, non-distinct
  * COUNT/SUM/MIN/MAX/AVG calls (salted two-stage merge), or (b)
  * COUNT(DISTINCT x) over ONE attribute, optionally MIXED with plain
  * COUNT/SUM/MIN/MAX/AVG calls (keyed dedup two-stage,
  * [[distinctTwoStage]]: stage 1 groups by (keys…, x) computing plain
  * partials over the raw rows, stage 2 counts the deduped x and merges
  * the partials) — anything else returns None and the caller runs the
  * plain plan. Caveat: SUM over a DECIMAL column re-sums the partials,
  * widening the result type by 10 digits; the engine's registered
  * tables carry doubles/longs, where re-summing is type-preserving.
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

  /** One normalized grouping key: `expr` is the original grouping
    * expression, `out` is what stage 1 outputs for it (the attribute
    * itself, or the expression aliased to a synthetic name), and `ref`
    * is how stage 2 (and outputs referencing the key) refer to it.
    */
  private case class GroupKey(expr: Expression, out: NamedExpression,
      ref: UnresolvedAttribute)

  /** Normalize grouping expressions, or None for shapes we don't salt
    * (star expansion, aggregate-bearing keys). Attribute keys pass
    * through; expression keys get a synthetic stage-1 alias.
    */
  private def groupKeys(a: Aggregate): Option[Seq[GroupKey]] = {
    var i = 0
    val keys = a.groupingExpressions.map {
      case u: UnresolvedAttribute =>
        GroupKey(u, u, UnresolvedAttribute(u.nameParts))
      // a bare literal is a GROUP BY ordinal before analysis — aliasing
      // it would turn positional grouping into grouping by a constant
      case _: Literal => return None
      case e if e.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.analysis.UnresolvedStar]) =>
        return None
      case e =>
        i += 1
        val n = s"__graft_g$i"
        GroupKey(e, Alias(e, n)(), UnresolvedAttribute(Seq(n)))
    }
    if (keys.isEmpty) None else Some(keys)
  }

  /** An output expression that IS one of the grouping keys (same
    * attribute, or a structurally/textually identical expression).
    */
  private def keyFor(keys: Seq[GroupKey], e: Expression): Option[GroupKey] =
    e match {
      case u: UnresolvedAttribute =>
        keys.find(k => k.expr match {
          case g: UnresolvedAttribute => g.nameParts == u.nameParts
          case _                      => false
        })
      case other =>
        keys.find(k => k.expr == other || k.expr.sql == other.sql)
    }

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
    * with the key's row count, all on one reduce task). Rewritten as a
    * keyed dedup two-stage:
    *
    *   stage 1: GROUP BY (keys…, x)   — distinct pairs, spread by
    *                                    hash(keys…, x) over ALL tasks,
    *                                    plus plain-aggregate partials
    *                                    over the RAW rows of each pair
    *   stage 2: GROUP BY (keys…)      — COUNT(x) for the distinct
    *                                    output; SUM/MIN/MAX/avg-ratio
    *                                    merge for the plain partials
    *
    * Exact by construction (COUNT over deduped non-null x = COUNT
    * DISTINCT x; partials computed before dedup merge to the plain
    * aggregates). Applies when every COUNT(DISTINCT …) shares ONE
    * attribute argument; plain unfiltered COUNT/SUM/MIN/MAX/AVG may
    * mix freely (the `SELECT k, count(DISTINCT u), count(*), sum(v)`
    * shape).
    */
  private def distinctTwoStage(a: Aggregate): Option[LogicalPlan] = {
    val keys = groupKeys(a).getOrElse(return None)

    val partials = Seq.newBuilder[NamedExpression]
    var tmpIdx = 0
    def tmp(): String = { tmpIdx += 1; s"__graft_d$tmpIdx" }

    var arg: Option[UnresolvedAttribute] = None
    var sawDistinct = false
    val outs: Seq[NamedExpression] = a.aggregateExpressions.map { ne =>
      val (inner, name) = ne match {
        case Alias(child, n)        => (child, n)
        case u: UnresolvedAttribute => (u: Expression, u.nameParts.last)
        case other                  => (other: Expression, other.sql)
      }
      keyFor(keys, inner) match {
        case Some(k) =>
          if (k.out eq k.expr) ne else Alias(k.ref, name)()
        case None => inner match {
          case f: UnresolvedFunction
              if f.nameParts.last.equalsIgnoreCase("count") && f.isDistinct &&
                f.filter.isEmpty && f.arguments.sizeIs == 1 =>
            f.arguments.head match {
              case x: UnresolvedAttribute
                  if arg.forall(_.nameParts == x.nameParts) =>
                arg = Some(x); sawDistinct = true
                Alias(fn("count", UnresolvedAttribute(x.nameParts)), name)()
              case _ => return None
            }
          case f: UnresolvedFunction if isAgg(f, "count", "sum") =>
            val t = tmp(); partials += Alias(f, t)()
            Alias(fn("sum", UnresolvedAttribute(Seq(t))), name)()
          case f: UnresolvedFunction if isAgg(f, "min", "max") =>
            val t = tmp(); partials += Alias(f, t)()
            Alias(fn(f.nameParts.last.toLowerCase,
              UnresolvedAttribute(Seq(t))), name)()
          case f: UnresolvedFunction if isAgg(f, "avg", "mean") =>
            val x = f.arguments.head
            val ts = tmp(); partials += Alias(fn("sum", x), ts)()
            val tc = tmp(); partials += Alias(fn("count", x), tc)()
            Alias(Divide(fn("sum", UnresolvedAttribute(Seq(ts))),
              fn("sum", UnresolvedAttribute(Seq(tc)))), name)()
          case _ => return None
        }
      }
    }
    if (!sawDistinct) return None
    arg.map { x =>
      val inner = Aggregate(
        keys.map(_.expr) :+ x,
        (keys.map(_.out): Seq[NamedExpression]) ++ (x +: partials.result()),
        a.child)
      Aggregate(keys.map(_.ref): Seq[Expression], outs, inner)
    }
  }

  private def saltAggregate(a: Aggregate, salts: Int): Option[LogicalPlan] = {
    val keys = groupKeys(a).getOrElse(return None)

    val partials = Seq.newBuilder[NamedExpression]
    var tmpIdx = 0
    def tmp(): String = { tmpIdx += 1; s"__graft_p$tmpIdx" }

    val outerOutputs: Seq[NamedExpression] = a.aggregateExpressions.map { ne =>
      val (inner, name) = ne match {
        case Alias(child, n)        => (child, n)
        case u: UnresolvedAttribute => (u: Expression, u.nameParts.last)
        case other                  => (other: Expression, other.sql)
      }
      keyFor(keys, inner) match {
        case Some(k) =>
          if (k.out eq k.expr) ne else Alias(k.ref, name)()
        case None => inner match {
          case f: UnresolvedFunction if isAgg(f, "count", "sum") =>
            val t = tmp(); partials += Alias(f, t)()
            Alias(fn("sum", UnresolvedAttribute(Seq(t))), name)()
          case f: UnresolvedFunction if isAgg(f, "min", "max") =>
            val t = tmp(); partials += Alias(f, t)()
            Alias(fn(f.nameParts.last.toLowerCase,
              UnresolvedAttribute(Seq(t))), name)()
          case f: UnresolvedFunction if isAgg(f, "avg", "mean") =>
            val x = f.arguments.head
            val ts = tmp(); partials += Alias(fn("sum", x), ts)()
            val tc = tmp(); partials += Alias(fn("count", x), tc)()
            Alias(Divide(fn("sum", UnresolvedAttribute(Seq(ts))),
              fn("sum", UnresolvedAttribute(Seq(tc)))), name)()
          case _ => return None // window/UDF/distinct/filtered: skip
        }
      }
    }

    val salt = CatalystSqlParser.parseExpression(
      s"pmod(hash(spark_partition_id(), monotonically_increasing_id()), $salts)")
    val inner = Aggregate(
      keys.map(_.expr) :+ salt,
      (keys.map(_.out): Seq[NamedExpression]) ++ partials.result(),
      a.child)
    Some(Aggregate(keys.map(_.ref): Seq[Expression], outerOutputs, inner))
  }
}
