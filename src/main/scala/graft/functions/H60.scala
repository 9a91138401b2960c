package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable 60-bit hash:
  * the value of the first 15 hex chars of md5(input) — bit-identical to
  * the SQL fragment `conv(substring(md5(e), 1, 15), 16, 10)` that every
  * DuckDB oracle mirrors (`Dedup.h60Duck`), but computed digest->long
  * directly: no 32-char hex string materialization, no base-16 string
  * parse, and a thread-local MessageDigest instead of per-row
  * allocation. This is the hottest scalar in the engine (shingle
  * hashing, MinHash, bloom probes, deterministic splits/samples/
  * pseudonyms all go through it), so it gets the native-Expression
  * tier like CosineSimilarity/QuantizedDot, with `doGenCode` keeping
  * it inside whole-stage codegen.
  */
case class H60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_h60 expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h60"

  override def nullSafeEval(input: Any): Any =
    H60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): H60 =
    copy(child = newChild)
}

object H60 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Value of the first 15 hex chars of the md5 digest: bytes 0-6 give
    * 14 nibbles, the 15th is the high nibble of byte 7 — big-endian
    * nibble order, exactly the integer `conv` parses from the hex text.
    */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }
}
