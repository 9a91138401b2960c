package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: the oracle-portable quantized dot product
  * of two float vectors — `Σ (long) floor(double(a_i) * double(b_i) *
  * 1e6)` — with whole-stage-codegen support.
  *
  * Bit-for-bit identical to the SQL fragment it replaces in the hot
  * rescoring paths (`aggregate(zip_with(a, b, (x, y) -> cast(floor(
  * cast(x as double) * cast(y as double) * 1000000) as bigint)), 0L,
  * (acc, v) -> acc + v)`): same element order of operations
  * ((x·y)·1e6, left-associative), same floor-then-truncate, same BIGINT
  * accumulation — so every DuckDB oracle stays valid while the per-pair
  * cost drops from an interpreted higher-order lambda (CodegenFallback,
  * per-element boxing) to a fused primitive loop inside the generated
  * stage.
  *
  * Returns null if either input is null or lengths differ (the zip_with
  * fragment also degenerates to null on ragged inputs).
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantized_dot expects two array<float> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var acc = 0L
    var i = 0
    val n = x.numElements()
    while (i < n) {
      acc += math.floor(
        x.getFloat(i).toDouble * y.getFloat(i).toDouble * 1000000.0).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (long) java.lang.Math.floor(
         |      (double) $x.getFloat($i) * (double) $y.getFloat($i) * 1000000.0);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
}
