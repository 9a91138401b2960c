package graft.sketch

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** HyperLogLog with byte-format parity to the reference sketch store
  * (/root/reference/sketches.py:10-151): serde layout
  * `[b: u8][m: u32 LE][registers: m bytes]`, hash = first 8 bytes of
  * SHA-256 read little-endian, register = low b bits, rank = (trailing
  * zeros of the remaining bits) + 1 capped at 64-b+1.
  *
  * Reference quirks reproduced deliberately for estimate parity:
  *  - a remaining-bits value of 0 yields rank 1 (not the max rank);
  *  - the small-range (linear counting) and 32-bit large-range
  *    corrections use the constants at sketches.py:70-80.
  *
  * Unlike the reference — which feeds the sketch from an exact
  * `SELECT DISTINCT` capped at 1M values on the driver
  * (/root/reference/app.py:248-258) — the Spark build adds values inside
  * a partial-aggregating [[Aggregator]]: registers merge associatively
  * across partitions, so sketch construction is one distributed pass
  * with no driver bottleneck (the 100 TB path).
  */
final class Hll(val b: Int) extends Serializable {
  require(b >= 4 && b <= 16, "b must be in [4,16]")
  val m: Int = 1 << b
  val registers: Array[Byte] = new Array[Byte](m)

  private def alpha: Double =
    if (m >= 128) 0.7213 / (1 + 1.079 / m)
    else if (m >= 64) 0.709
    else if (m >= 32) 0.697
    else if (m >= 16) 0.673
    else 0.5

  def add(value: Array[Byte]): Unit = {
    val hash = Hll.hash64(value)
    val j = (hash & ((1L << b) - 1)).toInt
    var w = hash >>> b
    var rank = 1
    while (w > 0 && rank <= 64 - b && (w & 1L) == 0L) {
      rank += 1
      w >>>= 1
    }
    if (rank > registers(j)) registers(j) = rank.toByte
  }

  def addString(value: String): Unit =
    add(value.getBytes(StandardCharsets.UTF_8))

  def count: Long = {
    var harm = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      harm += math.pow(2.0, -registers(i).toDouble)
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m.toDouble * m.toDouble / harm
    if (raw <= 2.5 * m && zeros != 0)
      (m * math.log(m.toDouble / zeros)).toLong
    else if (raw <= (1.0 / 30.0) * (1L << 32))
      raw.toLong
    else
      (-1.0 * (1L << 32) * math.log(1 - raw / (1L << 32))).toLong
  }

  def standardError: Double = 1.04 / math.sqrt(m.toDouble)

  def confidenceInterval(confidence: Double = 0.95): (Long, Long) = {
    val est = count.toDouble
    val z =
      if (math.abs(confidence - 0.90) < 1e-9) 1.645
      else if (math.abs(confidence - 0.99) < 1e-9) 2.576
      else 1.96
    val margin = z * standardError * est
    (math.max(0, est - margin).toLong, (est + margin).toLong)
  }

  def merge(other: Hll): Hll = {
    require(other.b == b, "cannot merge HLLs with different parameters")
    var i = 0
    while (i < m) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
    this
  }

  def serialize: Array[Byte] = {
    val buf = ByteBuffer.allocate(5 + m).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(b.toByte)
    buf.putInt(m)
    buf.put(registers)
    buf.array()
  }
}

object Hll {
  def deserialize(data: Array[Byte]): Hll = {
    require(data.length >= 5, "insufficient data")
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val b = buf.get().toInt
    val m = buf.getInt
    require(data.length == 5 + m, "data length mismatch")
    val hll = new Hll(b)
    buf.get(hll.registers)
    hll
  }

  /** First 8 bytes of SHA-256, little-endian (sketches.py:140-143). */
  def hash64(data: Array[Byte]): Long = {
    val d = MessageDigest.getInstance("SHA-256").digest(data)
    ByteBuffer.wrap(d, 0, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
  }

  /** Distributed HLL construction as a Spark typed aggregate: per-task
    * partial registers, associative max-merge at the exchange.
    */
  class HllAggregator(b: Int) extends Aggregator[String, Hll, Array[Byte]] {
    def zero: Hll = new Hll(b)
    def reduce(acc: Hll, v: String): Hll = {
      if (v != null) acc.addString(v)
      acc
    }
    def merge(a: Hll, other: Hll): Hll = a.merge(other)
    def finish(acc: Hll): Array[Byte] = acc.serialize
    def bufferEncoder: Encoder[Hll] = Encoders.kryo[Hll]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Column function: builds the serialized sketch as an aggregate. */
  def sketchAgg(column: Column, b: Int = 12): Column =
    udaf(new HllAggregator(b)).apply(column)
}
