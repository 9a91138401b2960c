package graft.sketch

import java.nio.{ByteBuffer, ByteOrder}

/** AGMS (AMS "tug-of-war") join-size sketch serde — the planner's
  * join-cardinality primitive (q62's estimator, persisted). Each relation
  * compresses to B signed bucket counters over its join key (bucket =
  * h60 % B, sign = ±1 from the next hash bit); the inner product of two
  * sketches over the SAME key domain is an unbiased estimator of
  * |R ⋈ S| (Alon-Gilbert-Matias-Szegedy, STOC'99 / the sketch-partition
  * variant of Dobra et al., SIGMOD'02).
  *
  * The reference has no counterpart: its planner never estimates join
  * sizes because it refuses multi-table queries outright
  * (/root/reference/planner.py:107-112). Here a stored AGMS pair is what
  * lets the engine DECIDE join AQP automatically (QueryEngine
  * .agmsJoinEstimate) instead of requiring the blind opt-in flag.
  *
  * Layout: `[B: u32 LE][B counters: i64 LE]`.
  */
object Agms {

  def serialize(counters: Array[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + counters.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(counters.length)
    counters.foreach(buf.putLong)
    buf.array()
  }

  def deserialize(data: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val b = buf.getInt
    require(b >= 1 && data.length == 4 + b * 8, s"corrupt AGMS blob (B=$b)")
    Array.fill(b)(buf.getLong)
  }

  /** Join-size estimate <a, b>; None when the sketches were built with
    * different bucket counts (not comparable). Clamped at 0 — the raw
    * inner product is unbiased but can go negative on tiny inputs, and
    * a negative cardinality is useless to a cost model.
    */
  def dotEstimate(a: Array[Byte], b: Array[Byte]): Option[Long] = {
    val ca = deserialize(a)
    val cb = deserialize(b)
    if (ca.length != cb.length) None
    else {
      var i = 0
      var s = 0L
      while (i < ca.length) { s += ca(i) * cb(i); i += 1 }
      Some(math.max(0L, s))
    }
  }
}
