package graft.sketch

import java.nio.{ByteBuffer, ByteOrder}

/** KMV (k-minimum-values, "bottom-k") distinct-value sketch — q45's
  * estimator persisted as a catalog sketch, plus the SET-OPERATION
  * estimates that are KMV's real payoff over HLL: two sketches over the
  * same value domain support INTERSECT / UNION / EXCEPT cardinality
  * estimates (Beyer et al., SIGMOD'07 "On synopses for distinct-value
  * estimation under multiset operations"), the Theta-sketch use case.
  * The reference has no counterpart: its set operations always run
  * exact (app.py routes only single-table sketches).
  *
  * The sketch is the k smallest DISTINCT 60-bit portable hashes
  * (`graft_h60`, the repo's md5-derived cross-engine hash) of a
  * column's values — fully deterministic given the data, so unlike HLL
  * the ESTIMATES are oracle-checkable bit-for-bit (q45's property,
  * extended to set ops by q107/q108).
  *
  * Estimator conventions (fixed float associations, oracle-portable):
  *  - NDV: fewer than k hashes means the sketch saw EVERY distinct
  *    value — exact count; else `(k-1) * 2^60 / h_(k)` (q45's formula,
  *    left-to-right association).
  *  - Set ops: U = bottom-k of (A ∪ B)'s hash union; θ = U's k-th
  *    value. Every h ∈ U is ≤ both sides' k-th values, so membership
  *    of h in a side's FULL hash set equals membership in its stored
  *    bottom-k. matched = |{h ∈ U : h ∈ A ∧ h ∈ B}| estimates
  *    |A ∩ B| as `(matched / k) * estU`; A-only tuples give EXCEPT the
  *    same way. When U is NOT saturated both sketches were exhaustive
  *    and every set-op count is exact (error 0).
  *
  * Error contract (what the engine serves under the caller's budget):
  * the NDV/union estimate's CV is ~1/sqrt(k-2) (Beyer et al. §4); the
  * intersection/except proportion adds a binomial term ~1/sqrt(m)
  * where m is the matched tuple count. Honest and conservative — a
  * tiny overlap (m small) reports a wide bound and falls through to
  * exact execution instead of serving noise.
  *
  * Layout: `[k: u32 LE][n: u32 LE][n hashes: i64 LE, ascending]`.
  * Merge (union) is idempotent/commutative/associative — bottom-k of a
  * set union — so streams maintain it replay-safely with no batch
  * guard (the maintainHllSketch discipline).
  */
object Kmv {

  /** 2^60 — exactly representable as a Double (q45's pow60). */
  val Pow60: Double = 1152921504606846976.0

  final case class Sketch(k: Int, hashes: Array[Long]) {
    require(k >= 2, s"k must be >= 2, got $k")

    /** Saw every distinct value (the hash list is exhaustive). */
    def exhaustive: Boolean = hashes.length < k

    /** NDV estimate — exact when exhaustive; q45's formula otherwise. */
    def estimate: Double =
      if (exhaustive) hashes.length.toDouble
      else (k - 1).toDouble * Pow60 / hashes.last.toDouble

    def contains(h: Long): Boolean =
      java.util.Arrays.binarySearch(hashes, h) >= 0

    /** Bottom-k of the hash-set union — the streaming/batch merge. */
    def union(o: Sketch): Sketch = {
      require(k == o.k, s"KMV k mismatch: $k vs ${o.k}")
      Sketch(k, (hashes ++ o.hashes).distinct.sorted.take(k))
    }

    def serialize: Array[Byte] = {
      val buf = ByteBuffer.allocate(8 + hashes.length * 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(k)
      buf.putInt(hashes.length)
      hashes.foreach(buf.putLong)
      buf.array()
    }
  }

  def deserialize(data: Array[Byte]): Sketch = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val k = buf.getInt
    val n = buf.getInt
    require(n >= 0 && n <= k && data.length == 8 + n * 8,
      s"corrupt KMV blob (k=$k, n=$n, len=${data.length})")
    Sketch(k, Array.fill(n)(buf.getLong))
  }

  /** Set-operation estimates over two same-k sketches. `exact` means
    * the union was not saturated — both hash lists were exhaustive and
    * every figure is the true distinct count. `matched` / `aOnly` /
    * `bOnly` are the tuple counts inside the union's bottom-k (the
    * proportions' denominators, for error bounds).
    */
  final case class SetEstimate(unionEst: Double, intersectEst: Double,
      exceptEst: Double, matched: Int, aOnly: Int, exact: Boolean)

  def setEstimate(a: Sketch, b: Sketch): SetEstimate = {
    require(a.k == b.k, s"KMV k mismatch: ${a.k} vs ${b.k}")
    val u = a.union(b)
    val matched = u.hashes.count(h => a.contains(h) && b.contains(h))
    val aOnly = u.hashes.count(h => a.contains(h) && !b.contains(h))
    if (u.exhaustive)
      SetEstimate(u.hashes.length.toDouble, matched.toDouble,
        aOnly.toDouble, matched, aOnly, exact = true)
    else {
      val estU = u.estimate
      val kd = a.k.toDouble
      // one division then one multiply — the oracle mirrors the
      // association exactly (CAST(m AS DOUBLE)/CAST(k AS DOUBLE))*estU
      SetEstimate(estU,
        matched.toDouble / kd * estU,
        aOnly.toDouble / kd * estU,
        matched, aOnly, exact = false)
    }
  }

  /** Relative-error bound for the saturated union/NDV estimate (CV of
    * the (k-1)/U_(k) estimator, Beyer et al. §4).
    */
  def unionError(k: Int): Double = 1.0 / math.sqrt((k - 2).toDouble)

  /** Bound for a proportion-scaled estimate (intersect/except): the
    * union CV plus the binomial term of an m-of-k proportion. m == 0
    * has no relative bound (the estimate is 0) — callers refuse.
    */
  def proportionError(k: Int, m: Int): Double =
    if (m <= 0) Double.PositiveInfinity
    else unionError(k) + 1.0 / math.sqrt(m.toDouble)
}
