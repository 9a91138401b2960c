package graft.plan

import org.apache.spark.sql.{DataFrame, GraftPlanExec, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types.DoubleType

/** Plan-level approximate-query rewriting, applied to the PARSED
  * (still-unresolved) logical plan before it is handed to the analyzer.
  *
  * This is the Spark-native form of the reference's two SQL-string
  * rewrites — pre-created-sample table substitution
  * (/root/reference/planner.py:242) and inline `ROWID % k = 0` sampling
  * (/root/reference/ml_optimizer.py:236-240) — plus its post-hoc result
  * scaling (/root/reference/executor.py:65-84) folded INTO the query as a
  * Horvitz-Thompson weighted aggregate:
  *
  *   COUNT(x)  ->  SUM(w)            (w = 1/fraction; per-stratum for
  *   SUM(x)    ->  SUM(x * w)         stratified samples via the
  *   AVG(x)    ->  SUM(x*w)/SUM(w)    materialized graft_weight column)
  *
  * Rewriting structurally at the expression level fixes, by construction,
  * the reference's substring-replace corruption (SURVEY §2.C2), its
  * name-keyword scaling false-positives (§2.C4 — a raw column named
  * `total` would be scaled), and its double-sampling/double-scaling hazard
  * (§2.C1 — exactly one Directive flows through, and the weight is applied
  * exactly where the aggregate is computed).
  *
  * The "sketch" strategy rewrite makes the reference's DECLARED capability
  * real (SURVEY §4.4): COUNT(DISTINCT x) -> approx_count_distinct(x)
  * (HyperLogLog++), instead of the reference's actual behavior of 30%
  * systematic sampling.
  *
  * Confidence intervals (the reference's `{col}_ci_low/_ci_high/_rel_error`
  * contract, /root/reference/executor.py:87-114) are computed from proper
  * per-element variance companions in the SAME aggregation pass:
  *   Var[HT count] = Σ_s w(w-1);  Var[HT sum] = Σ_s x²·w(w-1);
  *   se[avg] = stddev_samp(x)/√n_s — not from the returned result rows.
  *
  * Scale note: everything here is a logical-plan transform; execution
  * stays whole-stage-codegen'd Spark aggregates. Inline Bernoulli `Sample`
  * evaluates per-partition with no shuffle; materialized sample tables
  * skip the scan entirely (the 100 TB path: sampling cost is paid once at
  * sample-creation time, not per query).
  */
object SampleRewrite {

  /** How the sampled relation's weight is obtained. */
  sealed trait WeightSpec
  /** Constant 1/f (uniform sample — inline or materialized). */
  case class ConstWeight(f: Double) extends WeightSpec
  /** Per-row weight column materialized with the sample (stratified). */
  case class WeightColumn(name: String) extends WeightSpec

  /** One rewrite instruction — the single sampling decision that flows
    * through the whole pipeline.
    */
  final case class Directive(
      table: String,
      decision: Planner.SamplingDecision,
      weight: Option[WeightSpec],
      rewriteDistinctToHll: Boolean,
      hllRsd: Option[Double],
      addCiColumns: Boolean,
      ciZ: Double = 1.96,
      // UNIVERSE-only (key-lottery) semantics: COUNT(DISTINCT key) over
      // the lottery-filtered join scales by the same 1/p weight — each
      // distinct key tuple survives with probability exactly p, so the
      // scaled count is unbiased. The CALLER must have verified every
      // distinct aggregate targets a full lottery-key tuple; under
      // Bernoulli row sampling this rewrite would be WRONG (rows of one
      // key sample independently), which is why it is opt-in here and
      // never set by the uniform-sample paths.
      scaleKeyDistinct: Boolean = false,
      // INTEGER-weight samples only (the deterministic stratified
      // lottery, whose per-stratum weights are powers of two by
      // construction): rewrite percentile(x, p) to Spark's
      // frequency-weighted form percentile(x, p, CAST(w AS BIGINT)) —
      // each sampled row replays w times, exactly the weighted
      // empirical CDF the HT estimator implies. The CALLER must have
      // verified integrality (a fractional weight would truncate);
      // uniform samples skip it — equal weights cancel in the rank.
      weightedPercentiles: Boolean = false,
      // INTEGER-weight samples only (outlier-indexed samples, whose two
      // weights are 1 and a power of two): route SUM/AVG numerators
      // through DECIMAL(18,4) arithmetic — sum(cast(x as decimal(18,4))
      // * cast(w as decimal(18,0))) cast back to double. Decimal sums
      // are exact and order-independent, so the weighted estimate of a
      // 2-decimal-place MEASURE column (a price) is bit-portable to a
      // DuckDB oracle, which the plain double product sum (last-ulp
      // association drift across 10^4+ terms) is not. COUNT keeps its
      // double weight sum (integral values, already exact).
      decimalSums: Boolean = false,
      // Distribution-free CONFIDENCE INTERVALS for weighted sample
      // percentiles (set only with weightedPercentiles, ungrouped
      // queries): (z, nEff) where nEff = (Σw)²/Σw² is the effective
      // sample size from the catalog's achieved stratum sizes (exact
      // integer sums — deterministic, oracle-mirrorable). Each
      // percentile(x, p) output gains {name}_ci_low/_ci_high
      // companions: the SAME weighted percentile evaluated at the
      // rank-shifted quantiles p ∓ z·√(p(1−p)/nEff) clamped to [0,1] —
      // the binomial order-statistic bound, which needs no variance of
      // x at all (quantile CIs come from ranks, not moments).
      pctCi: Option[(Double, Double)] = None,
      // FIXED-SIZE (bottom-k) samples: the expansion weight N/k is one
      // CONSTANT for the whole sample, so estimates scale ONCE after
      // aggregation — count → w·Σ(indicator), sum → w·Σx, avg →
      // Σx/Σ(indicator) (the constant cancels) — never a per-row
      // NON-INTEGER product whose double-sum association would drift
      // across engines/runs. The inner Σx routes through DECIMAL(18,4)
      // when decimalSums is set (the outlier route's portability
      // contract). Mutually exclusive with `weight` (caller contract);
      // CI companions don't engage (they need a per-row weight).
      postScale: Option[Double] = None,
      // GROUPED bottom-k samples: the expansion weight is constant PER
      // GROUP, not per table — it rides the sample as a column (every
      // row of a group holds the same N_g/k_g value), and estimates
      // scale once per OUTPUT group via max(col): count max(w)·Σind,
      // sum max(w)·Σx, avg Σx/Σind. Sound only when the query's GROUP
      // BY determines the sample's group column (caller contract —
      // mixing groups would aggregate incomparable weights). Mutually
      // exclusive with `weight` and `postScale`.
      postScaleColumn: Option[String] = None,
      // PER-GROUP percentile CIs on the grouped bottom-k serve
      // (round 13): (z, kCap) with kCap = the build's kPerGroup. The
      // per-group effective n is known AT PLAN TIME because the
      // builder caps every subsampled group at EXACTLY kCap rows
      // (k_g = min(kCap, N_g)), so only two cases exist per output
      // group, both with foldable percentages: a CAPPED group
      // (max(graft_gn) > count(1), i.e. N_g > k_g) gets the rank-shift
      // bound at nEff = kCap — percentile re-evaluated at
      // p ∓ z·√(p(1−p)/kCap) — and a COMPLETE group (fully contained
      // in the sample) gets the point estimate back as both bounds:
      // exact, zero-width. Requires postScaleColumn (the graft_gn
      // companion column rides the same sample); caller sets it only
      // for unfiltered shapes (a filter makes post-filter per-group
      // counts unknowable at plan time — q168's contract).
      pctCiGrouped: Option[(Double, Double)] = None)

  /** Rewrite the parsed plan per the directive and hand it to Spark for
    * analysis + execution.
    */
  def rewrite(spark: SparkSession, parsed: LogicalPlan, d: Directive): DataFrame =
    GraftPlanExec.ofRows(spark, apply(parsed, d))

  /** Pure plan-to-plan form (exposed for tests). */
  def apply(plan: LogicalPlan, d: Directive): LogicalPlan =
    rewriteSelectLists(rewriteRelation(plan, d), d)

  // ---- expression builders (all unresolved; the analyzer resolves) ----

  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(Seq(name), args.toSeq, isDistinct = false)

  private def weightExpr(w: WeightSpec): Expression = w match {
    case ConstWeight(f)    => Literal(1.0 / f)
    case WeightColumn(col) => UnresolvedAttribute(col)
  }

  /** w if x is not null else 0 — COUNT semantics under weighting. */
  private def weightIfNotNull(arg: Expression, w: Expression): Expression =
    arg match {
      case _: Literal => w // COUNT(*) / COUNT(1)
      case x          => If(IsNull(x), Literal(0.0), w)
    }

  private def isAgg(e: Expression, names: String*): Boolean = e match {
    case f: UnresolvedFunction =>
      names.contains(f.nameParts.last.toLowerCase) && !f.isDistinct &&
        f.filter.isEmpty
    case _ => false
  }

  /** Rewrite COUNT/SUM/AVG calls under `e` into HT-weighted forms.
    * `decimalSums` (Directive contract) swaps the SUM/AVG numerator to
    * exact decimal arithmetic, cast back to double at the end so the
    * output schema is unchanged.
    */
  private def weightAggs(e: Expression, w: Expression,
      decimalSums: Boolean = false): Expression = {
    def sumProduct(x: Expression): Expression =
      if (decimalSums)
        Cast(fn("sum", Multiply(
          Cast(x, org.apache.spark.sql.types.DecimalType(18, 4)),
          Cast(w, org.apache.spark.sql.types.DecimalType(18, 0)))),
          DoubleType)
      else fn("sum", Multiply(Cast(x, DoubleType), w))
    e.transformUp {
      case f: UnresolvedFunction if isAgg(f, "count") =>
        fn("sum", weightIfNotNull(f.arguments.head, w))
      case f: UnresolvedFunction if isAgg(f, "sum") =>
        sumProduct(f.arguments.head)
      case f: UnresolvedFunction if isAgg(f, "avg", "mean") =>
        val x = f.arguments.head
        Divide(sumProduct(x), fn("sum", weightIfNotNull(x, w)))
    }
  }

  /** Rewrite COUNT/SUM/AVG under `e` into the fixed-size-sample form:
    * one constant post-aggregation scale (Directive.postScale contract).
    */
  private def scaleAggs(e: Expression, w: Expression,
      decimalSums: Boolean): Expression = {
    def innerSum(x: Expression): Expression =
      if (decimalSums)
        Cast(fn("sum", Cast(x, org.apache.spark.sql.types.DecimalType(18, 4))),
          DoubleType)
      else fn("sum", Cast(x, DoubleType))
    def cnt(arg: Expression): Expression =
      fn("sum", weightIfNotNull(arg, Literal(1.0)))
    e.transformUp {
      case f: UnresolvedFunction if isAgg(f, "count") =>
        Multiply(w, cnt(f.arguments.head))
      case f: UnresolvedFunction if isAgg(f, "sum") =>
        Multiply(w, innerSum(f.arguments.head))
      case f: UnresolvedFunction if isAgg(f, "avg", "mean") =>
        Divide(innerSum(f.arguments.head), cnt(f.arguments.head))
    }
  }

  /** percentile/median -> Spark's frequency-weighted exact percentile
    * (see Directive.weightedPercentiles for the contract).
    */
  private def weightPcts(e: Expression, w: Expression): Expression =
    e.transformUp {
      case f: UnresolvedFunction
          if isAgg(f, "percentile") && f.arguments.sizeIs == 2 =>
        fn("percentile", f.arguments.head, f.arguments(1),
          Cast(w, org.apache.spark.sql.types.LongType))
      case f: UnresolvedFunction
          if isAgg(f, "median") && f.arguments.sizeIs == 1 =>
        fn("percentile", f.arguments.head, Literal(0.5),
          Cast(w, org.apache.spark.sql.types.LongType))
    }

  /** COUNT(DISTINCT x) -> approx_count_distinct(x[, rsd]). */
  private def sketchAggs(e: Expression, rsd: Option[Double]): Expression =
    e.transformUp {
      case f: UnresolvedFunction
          if f.nameParts.last.equalsIgnoreCase("count") && f.isDistinct =>
        val args = f.arguments ++ rsd.map(r => Literal(r)).toSeq
        UnresolvedFunction(Seq("approx_count_distinct"), args,
          isDistinct = false)
    }

  /** Standard-error expression for a top-level aggregate call, or None if
    * the output is not a plain COUNT/SUM/AVG call.
    */
  private def seExpr(e: Expression, w: Expression): Option[Expression] = e match {
    case f: UnresolvedFunction if isAgg(f, "count") =>
      // Var = Σ_s w(w-1) over counted rows
      val contrib = weightIfNotNull(f.arguments.head,
        Multiply(w, Subtract(w, Literal(1.0))))
      Some(fn("sqrt", fn("sum", contrib)))
    case f: UnresolvedFunction if isAgg(f, "sum") =>
      val x = Cast(f.arguments.head, DoubleType)
      Some(fn("sqrt", fn("sum",
        Multiply(Multiply(x, x), Multiply(w, Subtract(w, Literal(1.0)))))))
    case f: UnresolvedFunction if isAgg(f, "avg", "mean") =>
      // se[avg] = stddev_samp(x)/√n, written as explicit moment sums
      // with FIXED association: sqrt(((Σx² − (Σx·Σx)/n) / (n−1)) / n).
      // Equal to the stddev form, but every intermediate is a single
      // correctly-rounded IEEE op over exact sums when x is
      // integer-valued — so a DuckDB oracle writing the same tree
      // reproduces it bit-for-bit, which stddev_samp (merge-order-
      // dependent) cannot guarantee.
      val x = Cast(f.arguments.head, DoubleType)
      val n = Cast(fn("count", f.arguments.head), DoubleType)
      val sx = fn("sum", x)
      val sxx = fn("sum", Multiply(x, x))
      // greatest(0, ·) guards catastrophic cancellation (large-mean /
      // low-variance columns can push the one-pass moment form a hair
      // negative → NaN CIs); the n>1 gate guards the 0/0 at a single
      // sampled row. Both are identity ops on well-conditioned inputs,
      // so oracle SQL mirroring the same tree still bit-matches.
      val varS = fn("greatest", Literal(0.0),
        Divide(Subtract(sxx, Divide(Multiply(sx, sx), n)),
          Subtract(n, Literal(1.0))))
      Some(If(GreaterThan(n, Literal(1.0)),
        fn("sqrt", Divide(varS, n)),
        Literal(null, DoubleType)))
    case _ => None
  }

  private def named(e: Expression, name: String): NamedExpression =
    Alias(e, name)()

  /** Numeric literal → Double (SQL "0.5" parses as a Decimal literal). */
  private def litDouble(e: Expression): Option[Double] = e match {
    case Literal(v, _) => v match {
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case n: java.lang.Number => Some(n.doubleValue())
      case _ => None
    }
    case _ => None
  }

  /** The rank-shifted-quantile CI companions for one percentile output
    * (Directive.pctCi contract): the same frequency-weighted percentile
    * at p ∓ z·√(p(1−p)/nEff), clamped to [0,1]. The shifted quantiles
    * are plan-time Doubles (Spark's Percentile requires a foldable
    * percentage), computed with a FIXED association an oracle mirrors:
    * p − (z · sqrt((p · (1 − p)) / nEff)).
    */
  private def pctCiCompanions(inner: Expression, name: String,
      w: Option[Expression], z: Double, nEff: Double): Seq[NamedExpression] = {
    val parsed: Option[(Expression, Double)] = inner match {
      case f: UnresolvedFunction
          if isAgg(f, "percentile") && f.arguments.sizeIs == 2 =>
        litDouble(f.arguments(1)).map(p => (f.arguments.head, p))
      case f: UnresolvedFunction
          if isAgg(f, "median") && f.arguments.sizeIs == 1 =>
        Some((f.arguments.head, 0.5))
      case _ => None
    }
    parsed.toSeq.flatMap { case (x, p) =>
      if (nEff <= 0) Nil
      else {
        val shift = z * math.sqrt((p * (1.0 - p)) / nEff)
        val pLo = math.max(0.0, math.min(1.0, p - shift))
        val pHi = math.max(0.0, math.min(1.0, p + shift))
        def at(q: Double): Expression = w match {
          // weighted form: the frequency rewrite's integer weights
          case Some(wx) => fn("percentile", x, Literal(q),
            Cast(wx, org.apache.spark.sql.types.LongType))
          // unweighted form (bottom-k: equal weights cancel in the
          // rank, so the bound applies to the plain sample quantile)
          case None => fn("percentile", x, Literal(q))
        }
        Seq(named(at(pLo), s"${name}_ci_low"),
          named(at(pHi), s"${name}_ci_high"))
      }
    }
  }

  /** Rewrite one SELECT list: weight the aggregates, preserve output
    * names, and append `{col}_ci_low/_ci_high/_rel_error` companions.
    */
  private[plan] def rewriteSelectList(
      exprs: Seq[NamedExpression], d: Directive): Seq[NamedExpression] = {
    val w = d.weight.map(weightExpr)

    val rewritten = exprs.map { ne =>
      val (inner, name) = ne match {
        case Alias(child, n) => (child, n)
        case other           => (other: Expression, prettyName(other))
      }
      var out = inner
      if (d.rewriteDistinctToHll) out = sketchAggs(out, d.hllRsd)
      w.foreach { wx => out = weightAggs(out, wx, d.decimalSums) }
      d.postScale.foreach { s =>
        out = scaleAggs(out, Literal(s), d.decimalSums)
      }
      d.postScaleColumn.foreach { c =>
        out = scaleAggs(out, fn("max", UnresolvedAttribute(c)),
          d.decimalSums)
      }
      if (d.weightedPercentiles) w.foreach { wx => out = weightPcts(out, wx) }
      if (d.scaleKeyDistinct) w.foreach { wx =>
        out = out.transformUp {
          case f: UnresolvedFunction
              if f.nameParts.last.equalsIgnoreCase("count") && f.isDistinct &&
                f.filter.isEmpty =>
            Multiply(Cast(f, DoubleType), wx)
        }
      }
      if (out eq inner) ne else named(out, name)
    }

    val companions: Seq[NamedExpression] =
      if (!d.addCiColumns || w.isEmpty) Nil
      else exprs.flatMap { ne =>
        val (inner, name) = ne match {
          case Alias(child, n) => (child, n)
          case other           => (other: Expression, prettyName(other))
        }
        val moments = seExpr(inner, w.get).toSeq.flatMap { se =>
          val est = weightAggs(inner, w.get, d.decimalSums)
          val z = Literal(d.ciZ)
          Seq(
            named(Subtract(est, Multiply(z, se)), s"${name}_ci_low"),
            named(Add(est, Multiply(z, se)), s"${name}_ci_high"),
            named(Divide(Multiply(z, se), fn("abs", est)),
              s"${name}_rel_error"))
        }
        val pct =
          if (d.weightedPercentiles) d.pctCi.toSeq.flatMap { case (z, nEff) =>
            pctCiCompanions(inner, name, Some(w.get), z, nEff)
          }
          else Nil
        moments ++ pct
      }

    // Unweighted percentile CIs — the fixed-size (bottom-k) sample
    // path: every row weighs the same, so the binomial rank bound
    // applies to the PLAIN sample quantile, and nEff is the sample
    // size k — known exactly at plan time (the one sample where that
    // is true; the caller sets pctCi only for unfiltered ungrouped
    // shapes, q168's contract).
    val pctUnweighted: Seq[NamedExpression] =
      if (w.isDefined || d.pctCi.isEmpty) Nil
      else exprs.flatMap { ne =>
        val (inner, name) = ne match {
          case Alias(child, n) => (child, n)
          case other           => (other: Expression, prettyName(other))
        }
        d.pctCi.toSeq.flatMap { case (z, nEff) =>
          pctCiCompanions(inner, name, None, z, nEff)
        }
      }

    // Per-group percentile CIs for the grouped bottom-k serve
    // (Directive.pctCiGrouped): every aggregate below evaluates within
    // the output group, so max(graft_gn) is N_g and count(1) is k_g —
    // a capped group (N_g > k_g, hence k_g == kCap by construction)
    // takes the rank-shifted quantile at nEff = kCap, a complete group
    // returns its exact quantile as both bounds (zero width).
    val pctGroupedBk: Seq[NamedExpression] =
      if (d.postScaleColumn.isEmpty || d.pctCiGrouped.isEmpty) Nil
      else exprs.flatMap { ne =>
        val (inner, name) = ne match {
          case Alias(child, n) => (child, n)
          case other           => (other: Expression, prettyName(other))
        }
        val parsedPct: Option[(Expression, Double)] = inner match {
          case f: UnresolvedFunction
              if isAgg(f, "percentile") && f.arguments.sizeIs == 2 =>
            litDouble(f.arguments(1)).map(p => (f.arguments.head, p))
          case f: UnresolvedFunction
              if isAgg(f, "median") && f.arguments.sizeIs == 1 =>
            Some((f.arguments.head, 0.5))
          case _ => None
        }
        parsedPct.toSeq.flatMap { case (x, p) =>
          d.pctCiGrouped.toSeq.flatMap { case (z, kCap) =>
            if (kCap <= 0) Nil
            else {
              val shift = z * math.sqrt((p * (1.0 - p)) / kCap)
              val pLo = math.max(0.0, math.min(1.0, p - shift))
              val pHi = math.max(0.0, math.min(1.0, p + shift))
              val capped = GreaterThan(
                fn("max", UnresolvedAttribute("graft_gn")),
                fn("count", Literal(1)))
              def bound(q: Double): Expression = CaseWhen(
                Seq((capped, fn("percentile", x, Literal(q)))),
                Some(fn("percentile", x, Literal(p))))
              Seq(named(bound(pLo), s"${name}_ci_low"),
                named(bound(pHi), s"${name}_ci_high"))
            }
          }
        }
      }

    rewritten ++ companions ++ pctUnweighted ++ pctGroupedBk
  }

  private def prettyName(e: Expression): String =
    org.apache.spark.sql.catalyst.util.toPrettySQL(e)

  /** Substitute the target relation per the sampling decision. */
  private[plan] def rewriteRelation(
      plan: LogicalPlan, d: Directive): LogicalPlan =
    plan.transformUp {
      case r: UnresolvedRelation
          if r.multipartIdentifier.last.equalsIgnoreCase(d.table) =>
        d.decision match {
          case Planner.ReadSampleTable(sample, _) =>
            UnresolvedRelation(Seq(sample))
          case Planner.ReadInlineSample(f, seed) =>
            Sample(0.0, f, withReplacement = false, seed, r)
          case Planner.ReadInlineSystematic(f, key) =>
            // graft_h60 of the salted key is uniform on [0, 2^60); taking
            // it mod 10000 gives a per-key inclusion lottery with exactly
            // round(f*10000)/10000 win probability — evaluates scan-local
            // (no shuffle), and deterministically (unlike Sample's
            // per-partition seeded stream, which changes with the split).
            val threshold = math.round(f * 10000).toInt
            Filter(org.apache.spark.sql.catalyst.parser.CatalystSqlParser
              .parseExpression(
                s"graft_h60(concat('sys:', cast($key as string))) % 10000 < $threshold"),
              r)
          // a catalog serve never reaches a relation rewrite (the serve
          // paths answer without a plan), but pattern-completeness
          // demands a case: read as-is
          case Planner.ReadExact | Planner.ReadCatalogServe(_) => r
        }
    }

  /** Universe (both-side) join sampling: apply the SAME keyed-hash
    * lottery (`graft_h60('uv:' || key) % 10000 < t`) to EVERY listed
    * relation on its own join-key column, then Horvitz-Thompson weight
    * the aggregates ONCE at 1/p (p = t/10000, the exact realized
    * rate). Because equal join keys hash identically, a join row
    * survives iff its KEY survives — both sides of each surviving key
    * arrive in full, so the join output is an unbiased p-sample of
    * itself under a single 1/p scale. This is the two-big-tables case
    * fact-side sampling cannot help: there, the dim side still scans
    * in full; here BOTH scans shrink to ~p (Vengerov et al., VLDB'15
    * "Join Size Estimation Subject to Filter Conditions" call this
    * universe sampling). Deterministic membership keeps the estimates
    * oracle-checkable like q28/q77.
    *
    * `keys`: relation name (matched on the LAST name part, like
    * rewriteRelation) -> its join-key column.
    */
  /** Salted hash input for a (possibly composite) key tuple — the ONE
    * rendering every tuple-keyed artifact shares (universe lotteries
    * here, AGMS counters in SketchOps.createAgms). A single key renders
    * as the raw `cast(k as string)` (the original byte-stable
    * contract); a COMPOSITE key renders as
    * `to_json(array(cast(k as string)...))` — the collision-free
    * encoding the grouped sketch builders already use
    * (SketchOps.groupKeyExpr), replacing the earlier U+0001-joined
    * concat whose distinct tuples could alias whenever a component
    * contained the separator. Any NULL component renders the whole key
    * NULL: a NULL hash never wins a lottery and never lands in a
    * counter, matching equi-join semantics (NULL keys never join). Two
    * tables rendering value-equal tuples hash identically, which is
    * what keeps membership join-compatible.
    */
  def tupleKeyExpr(salt: String, keys: Seq[String]): String =
    if (keys.sizeIs == 1)
      s"concat('$salt', cast(${keys.head} as string))"
    else {
      val arr = keys.map(k => s"cast($k as string)")
        .mkString("to_json(array(", ", ", "))")
      val anyNull = keys.map(k => s"$k is null").mkString(" or ")
      s"case when $anyNull then cast(null as string) " +
        s"else concat('$salt', $arr) end"
    }

  /** The shared 'uv:' lottery hash input for a universe sample's
    * (possibly composite) join key — see [[tupleKeyExpr]].
    */
  def universeKeyExpr(keys: Seq[String]): String =
    tupleKeyExpr("uv:", keys)

  def rewriteUniverse(plan: LogicalPlan, keys: Map[String, Seq[String]],
      fraction: Double, addCiColumns: Boolean,
      ciZ: Double = 1.96, scaleKeyDistinct: Boolean = false): LogicalPlan = {
    val threshold = math.max(1, math.round(fraction * 10000).toInt)
    val p = threshold / 10000.0
    val filtered = plan.transformUp {
      case r: UnresolvedRelation if keys.keys.exists(
          _.equalsIgnoreCase(r.multipartIdentifier.last)) =>
        val key = keys.find(_._1.equalsIgnoreCase(r.multipartIdentifier.last)).get._2
        Filter(org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseExpression(
            s"graft_h60(${universeKeyExpr(key)}) % 10000 < $threshold"),
          r)
    }
    val d = Directive("", Planner.ReadExact,
      weight = Some(ConstWeight(p)), rewriteDistinctToHll = false,
      hllRsd = None, addCiColumns = addCiColumns, ciZ = ciZ,
      scaleKeyDistinct = scaleKeyDistinct)
    rewriteSelectLists(filtered, d)
  }

  /** Materialized form of [[rewriteUniverse]]: substitute each listed
    * relation by its pre-materialized universe sample
    * (Samplers.createUniverse — the lottery was paid ONCE at creation)
    * and apply the single 1/p HT scale. Both samples must have been
    * built at the SAME fraction with the same salt, which is what makes
    * them join-compatible; membership is identical to the inline form,
    * so results (and oracles) are unchanged — only the per-query scan +
    * hash cost disappears.
    */
  def rewriteUniverseMaterialized(plan: LogicalPlan,
      samples: Map[String, String], fraction: Double,
      addCiColumns: Boolean, ciZ: Double = 1.96,
      scaleKeyDistinct: Boolean = false): LogicalPlan = {
    val substituted = plan.transformUp {
      case r: UnresolvedRelation if samples.keys.exists(
          _.equalsIgnoreCase(r.multipartIdentifier.last)) =>
        UnresolvedRelation(Seq(
          samples.find(_._1.equalsIgnoreCase(r.multipartIdentifier.last)).get._2))
    }
    val d = Directive("", Planner.ReadExact,
      weight = Some(ConstWeight(fraction)), rewriteDistinctToHll = false,
      hllRsd = None, addCiColumns = addCiColumns, ciZ = ciZ,
      scaleKeyDistinct = scaleKeyDistinct)
    rewriteSelectLists(substituted, d)
  }

  /** Rewrite the topmost SELECT list (the query's output). At parse time
    * an aggregate without GROUP BY is still a `Project` (the analyzer's
    * GlobalAggregates rule converts it later); ORDER BY / LIMIT / HAVING /
    * DISTINCT wrap it in unary nodes we descend through.
    */
  private def rewriteSelectLists(plan: LogicalPlan, d: Directive): LogicalPlan =
    plan match {
      case p: Project =>
        p.copy(projectList = rewriteSelectList(p.projectList, d))
      case a: Aggregate =>
        a.copy(aggregateExpressions = rewriteSelectList(a.aggregateExpressions, d))
      case u: UnaryNode =>
        u.withNewChildren(Seq(rewriteSelectLists(u.child, d)))
      case other => other
    }
}
