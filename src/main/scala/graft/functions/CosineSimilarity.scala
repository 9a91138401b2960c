package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float vectors,
  * with whole-stage-codegen support (`doGenCode` emits the fused
  * dot/norm loop — no per-row boxing, no UDF serialization, stays
  * inside the generated stage).
  *
  * This is the custom-Expression tier of the extension ladder (compose
  * built-ins > native Expression > UDF): the SQL-expressible quantized
  * form in queries.Similarity exists for DuckDB-oracle parity; this
  * expression is the performance path a similarity-heavy pipeline uses
  * when cross-engine bit-parity is not required.
  *
  * Returns null if either input is null or lengths differ; 0.0 when a
  * vector has zero norm.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects two array<float> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $x.getFloat($i);
         |    double $yi = (double) $y.getFloat($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  ${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |    ? 0.0 : $dot / java.lang.Math.sqrt($nx * $ny);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Column API for the native expression (wraps via the sql-package
    * shim; Column<->Expression bridges are private[sql] in Spark 4).
    */
  def cosineSimilarity(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftPlanExec.toColumn(
      CosineSimilarity(
        org.apache.spark.sql.GraftPlanExec.toExpression(a),
        org.apache.spark.sql.GraftPlanExec.toExpression(b)))

  /** Function-registry descriptor shared by [[GraftExtensions]] (the
    * spark.sql.extensions path for new sessions) and [[register]] (an
    * already-running session, e.g. the engine behind POST /query).
    */
  val cosineSimilarityDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[CosineSimilarity].getName, "cosine_similarity"),
    { children =>
      require(children.length == 2,
        s"cosine_similarity expects 2 arguments, got ${children.length}")
      CosineSimilarity(children(0), children(1))
    })

  /** Column API for the quantized-dot expression (see [[QuantizedDot]]). */
  def quantizedDot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftPlanExec.toColumn(
      QuantizedDot(
        org.apache.spark.sql.GraftPlanExec.toExpression(a),
        org.apache.spark.sql.GraftPlanExec.toExpression(b)))

  val quantizedDotDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("quantized_dot"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[QuantizedDot].getName, "quantized_dot"),
    { children =>
      require(children.length == 2,
        s"quantized_dot expects 2 arguments, got ${children.length}")
      QuantizedDot(children(0), children(1))
    })

  /** Column API for the 60-bit portable hash (see [[H60]]). */
  def h60(e: Column): Column =
    org.apache.spark.sql.GraftPlanExec.toColumn(
      H60(org.apache.spark.sql.GraftPlanExec.toExpression(e)))

  val h60Descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_h60"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[H60].getName, "graft_h60"),
    { children =>
      require(children.length == 1,
        s"graft_h60 expects 1 argument, got ${children.length}")
      H60(children.head)
    })

  val exactPercentileDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_percentile"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[ExactPercentile].getName, "graft_percentile"),
    { children =>
      require(children.length == 2,
        s"graft_percentile expects 2 arguments, got ${children.length}")
      ExactPercentile(children(0), children(1))
    })

  /** Make the engine's native functions callable from SQL on an existing
    * session (idempotent — re-registration replaces).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(cosineSimilarityDescriptor, quantizedDotDescriptor, h60Descriptor,
        exactPercentileDescriptor)
      .foreach { case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
      }
}

/** SparkSessionExtensions entry point: enable the engine's native SQL
  * functions on any session via
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.cosineSimilarityDescriptor)
    ext.injectFunction(GraftFunctions.quantizedDotDescriptor)
    ext.injectFunction(GraftFunctions.h60Descriptor)
    ext.injectFunction(GraftFunctions.exactPercentileDescriptor)
  }
}
