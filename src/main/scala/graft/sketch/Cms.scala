package graft.sketch

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-Min Sketch with byte-format parity to the reference
  * (/root/reference/sketches.py:154-237): `w = ceil(e/eps)`,
  * `d = ceil(ln(1/delta))`, row hash i = first 8 bytes LE of
  * SHA-256(key ++ ascii(i)) mod w, point estimate = min over rows; serde
  * layout `[w: u32][d: u32][eps: f64][delta: f64][d*w counters: u64 LE]`.
  *
  * The reference builds sketches from an exact GROUP BY on the driver
  * (/root/reference/app.py:265-275); here construction is a distributed
  * [[Aggregator]] whose counter matrices add element-wise at merge —
  * counts are associative, so the sketch is exact over any partitioning.
  */
final class Cms(val epsilon: Double, val delta: Double) extends Serializable {
  val w: Int = math.ceil(math.E / epsilon).toInt
  val d: Int = math.ceil(math.log(1.0 / delta)).toInt
  val table: Array[Array[Long]] = Array.ofDim[Long](d, w)

  private def col(key: Array[Byte], row: Int): Int = {
    val seeded = key ++ row.toString.getBytes(StandardCharsets.UTF_8)
    // Python's % is non-negative; reproduce with floorMod on the
    // unsigned-interpreted 64-bit hash.
    val h = Hll.hash64(seeded)
    java.lang.Long.remainderUnsigned(h, w.toLong).toInt
  }

  def add(key: Array[Byte], count: Long = 1L): Unit = {
    var i = 0
    while (i < d) {
      table(i)(col(key, i)) += count
      i += 1
    }
  }

  def addString(key: String, count: Long = 1L): Unit =
    add(key.getBytes(StandardCharsets.UTF_8), count)

  def estimate(key: Array[Byte]): Long = {
    var min = Long.MaxValue
    var i = 0
    while (i < d) {
      val v = table(i)(col(key, i))
      if (v < min) min = v
      i += 1
    }
    min
  }

  def estimateString(key: String): Long =
    estimate(key.getBytes(StandardCharsets.UTF_8))

  def merge(other: Cms): Cms = {
    require(other.w == w && other.d == d, "incompatible CMS dimensions")
    var i = 0
    while (i < d) {
      var j = 0
      while (j < w) {
        table(i)(j) += other.table(i)(j)
        j += 1
      }
      i += 1
    }
    this
  }

  def serialize: Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 4 + 8 + 8 + d * w * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(w)
    buf.putInt(d)
    buf.putDouble(epsilon)
    buf.putDouble(delta)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < w) { buf.putLong(table(i)(j)); j += 1 }
      i += 1
    }
    buf.array()
  }
}

object Cms {
  def deserialize(data: Array[Byte]): Cms = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val w = buf.getInt
    val d = buf.getInt
    val epsilon = buf.getDouble
    val delta = buf.getDouble
    val cms = new Cms(epsilon, delta)
    require(cms.w == w && cms.d == d, "parameter/dimension mismatch")
    var i = 0
    while (i < d) {
      var j = 0
      while (j < w) { cms.table(i)(j) = buf.getLong; j += 1 }
      i += 1
    }
    cms
  }

  /** Distributed CMS construction: one sketch per task partition,
    * element-wise matrix addition at merge.
    */
  class CmsAggregator(epsilon: Double, delta: Double)
      extends Aggregator[String, Cms, Array[Byte]] {
    def zero: Cms = new Cms(epsilon, delta)
    def reduce(acc: Cms, v: String): Cms = {
      if (v != null) acc.addString(v)
      acc
    }
    def merge(a: Cms, other: Cms): Cms = a.merge(other)
    def finish(acc: Cms): Array[Byte] = acc.serialize
    def bufferEncoder: Encoder[Cms] = Encoders.kryo[Cms]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Column function: builds the serialized sketch as an aggregate. */
  def sketchAgg(column: Column, epsilon: Double = 0.01,
      delta: Double = 0.01): Column =
    udaf(new CmsAggregator(epsilon, delta)).apply(column)
}
