package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{Percentile, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Exact interpolated percentile over DOUBLE inputs with a PRIMITIVE
  * growable buffer — a drop-in replacement for `percentile(col, p)` /
  * `percentile(col, array(p...))` on the exact-companion hot path.
  *
  * Why it exists (round 16, guide §1.2 "per-task work"): Spark's
  * `Percentile` buffers through `OpenHashMap[AnyRef, Long]` — every
  * update boxes the double and pays a hash probe (~µs/row), and on a
  * mostly-distinct 600 K-row column the map degenerates to one entry
  * per row anyway. This aggregate appends to a primitive Array[Double]
  * (~ns/row) and sorts ONCE at eval. Measured on the q144 exact
  * companion at sf0.1: the percentile stage drops ~5×.
  *
  * Result parity is BY CONSTRUCTION, not by reimplementation: eval
  * run-length-encodes the sorted array into exactly the
  * (value, cumulative count) sequence `PercentileBase.getPercentiles`
  * builds from its map, then calls Spark's own PUBLIC
  * `PercentileBase.getPercentile(seq, p)` for the rank walk and the
  * `(higher−pos)·lowerKey + (pos−lower)·higherKey` interpolation — the
  * same compiled code path the builtin runs, so outputs are
  * bit-identical for any input multiset. (The one theoretical
  * divergence: a column containing BOTH -0.0 and 0.0 collapses to one
  * run here but two map keys there — identical ordering, equal
  * magnitudes, so only the sign of an interpolated zero could differ.
  * No gated column contains negative zeros.) FunctionsSpec pins the
  * parity against the builtin on every gated percentile shape.
  *
  * Scalar/array percentage forms mirror the builtin: array in → array
  * out. NULL inputs are skipped; an empty group returns NULL.
  */
case class ExactPercentile(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ExactPercentile.Buf]
    with BinaryLike[Expression] {

  def this(child: Expression, percentage: Expression) = this(child, percentage, 0, 0)

  private def returnArray: Boolean = right.dataType.isInstanceOf[ArrayType]

  @transient private lazy val percentages: Array[Double] = right.eval() match {
    case null          => Array.empty[Double]
    case d: Double     => Array(d)
    case a: ArrayData  => a.toDoubleArray()
  }

  /** The builtin instance whose getPercentile does the rank walk and
    * interpolation — dummy children, only the math is borrowed. The
    * method is Scala-`protected` (public in bytecode), so the call goes
    * through a cached Method handle; a handful of invocations per eval.
    */
  @transient private lazy val builtinMath =
    new Percentile(Literal(0.0, DoubleType), Literal(0.5, DoubleType))
  @transient private lazy val builtinGetPercentile =
    classOf[Percentile].getMethod("getPercentile",
      classOf[scala.collection.immutable.Seq[_]], java.lang.Double.TYPE)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_percentile needs a DOUBLE value column, got ${left.dataType}")
    else if (right.dataType != DoubleType &&
        right.dataType != ArrayType(DoubleType, containsNull = false) &&
        right.dataType != ArrayType(DoubleType, containsNull = true))
      TypeCheckResult.TypeCheckFailure(
        s"graft_percentile needs DOUBLE percentage(s), got ${right.dataType}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_percentile percentages must be foldable")
    else {
      // Analysis-time VALUE checks (round 17, mirroring the builtin
      // Percentile): graft_percentile is SQL-exposed, so an out-of-range
      // or null percentage must fail here with a clear message, not
      // reach getPercentile's rank arithmetic at runtime. Also resolve
      // the reflected builtin method EAGERLY: it is Scala-protected and
      // only incidentally public in bytecode — a Spark upgrade that
      // renames/privatizes it must fail at analysis on the driver, not
      // at eval time on an executor (pinned against the Spark 4.1.2
      // jars this repo builds on).
      val methodOk =
        try { builtinGetPercentile; true } catch { case _: Throwable => false }
      if (!methodOk)
        TypeCheckResult.TypeCheckFailure(
          "graft_percentile requires Percentile.getPercentile(Seq, double) " +
            "from the pinned Spark version; this Spark build does not expose it")
      else right.eval() match {
        case null =>
          TypeCheckResult.TypeCheckFailure(
            "graft_percentile percentage must not be null")
        case d: Double =>
          if (d >= 0.0 && d <= 1.0) TypeCheckResult.TypeCheckSuccess
          else TypeCheckResult.TypeCheckFailure(
            s"Percentage(s) must be between 0.0 and 1.0, but got $d")
        case a: ArrayData =>
          val n = a.numElements()
          var i = 0
          var failure: TypeCheckResult = null
          while (i < n && failure == null) {
            if (a.isNullAt(i))
              failure = TypeCheckResult.TypeCheckFailure(
                "graft_percentile percentage array must not contain nulls")
            else {
              val p = a.getDouble(i)
              if (!(p >= 0.0 && p <= 1.0))
                failure = TypeCheckResult.TypeCheckFailure(
                  s"Percentage(s) must be between 0.0 and 1.0, but got $p")
            }
            i += 1
          }
          if (failure != null) failure else TypeCheckResult.TypeCheckSuccess
        case other =>
          TypeCheckResult.TypeCheckFailure(
            s"graft_percentile percentage evaluated to unexpected $other")
      }
    }

  override def dataType: DataType =
    if (returnArray) ArrayType(DoubleType, containsNull = false) else DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_percentile"

  override def createAggregationBuffer(): ExactPercentile.Buf =
    new ExactPercentile.Buf(new Array[Double](64), 0)

  override def update(buf: ExactPercentile.Buf, input: InternalRow): ExactPercentile.Buf = {
    val v = left.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: ExactPercentile.Buf, b2: ExactPercentile.Buf): ExactPercentile.Buf = {
    b1.addAll(b2); b1
  }

  override def eval(buf: ExactPercentile.Buf): Any = {
    if (buf.n == 0 || percentages.isEmpty) return null
    java.util.Arrays.sort(buf.arr, 0, buf.n)
    // run-length encode into the builtin's (boxed value, CUMULATIVE
    // count) shape — ordering-equal doubles collapse exactly as the
    // map keys do after its sortBy
    val seqB = Seq.newBuilder[(Any, Long)]
    var i = 0
    var cum = 0L
    while (i < buf.n) {
      val v = buf.arr(i)
      var j = i + 1
      while (j < buf.n && buf.arr(j) == v) j += 1
      cum += (j - i)
      seqB += ((java.lang.Double.valueOf(v), cum))
      i = j
    }
    val cumSeq = seqB.result()
    val out = percentages.map { p =>
      builtinGetPercentile.invoke(builtinMath, cumSeq,
        java.lang.Double.valueOf(p)).asInstanceOf[java.lang.Double].doubleValue()
    }
    if (returnArray) new GenericArrayData(out) else out(0)
  }

  override def serialize(buf: ExactPercentile.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ExactPercentile.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val arr = new Array[Double](math.max(n, 64))
    var i = 0
    while (i < n) { arr(i) = bb.getDouble; i += 1 }
    new ExactPercentile.Buf(arr, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactPercentile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactPercentile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExactPercentile =
    copy(left = newLeft, right = newRight)
}

object ExactPercentile {
  /** Growable primitive buffer (no boxing on the per-row path). */
  final class Buf(var arr: Array[Double], var n: Int) {
    def add(v: Double): Unit = {
      if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
      arr(n) = v
      n += 1
    }
    def addAll(o: Buf): Unit = {
      if (n + o.n > arr.length)
        arr = java.util.Arrays.copyOf(arr, math.max(arr.length * 2, n + o.n))
      System.arraycopy(o.arr, 0, arr, n, o.n)
      n += o.n
    }
  }
}
