package graft.api

import org.apache.spark.sql.Row

import graft.engine.QueryEngine

/** JSON response shaping — the reference's `POST /query` contract
  * (/root/reference/app.py:146-156):
  * {status, plan, result, meta{execution_time_ms, actual_speedup},
  *  ml_optimization}.
  *
  * Hand-rolled serializer (no JSON library in the dependency set);
  * result rows are the collected DataFrame limited by `maxRows` —
  * collection is the one deliberate driver-side step, exactly like the
  * reference materializes rows for Flask.
  */
object Response {

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def jval(v: Any): String = v match {
    case null                => "null"
    case s: String           => "\"" + esc(s) + "\""
    case b: Boolean          => b.toString
    case n: java.lang.Number => n.toString
    case t: java.sql.Timestamp => "\"" + t.toString + "\""
    case d: java.sql.Date    => "\"" + d.toString + "\""
    case other               => "\"" + esc(other.toString) + "\""
  }

  private def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => "\"" + esc(k) + "\": " + v }
      .mkString("{", ", ", "}")

  private def rowsJson(rows: Seq[Row]): String =
    rows.map { r =>
      obj(r.schema.fieldNames.toSeq.zipWithIndex.map { case (f, i) =>
        f -> jval(r.get(i))
      })
    }.mkString("[", ", ", "]")

  /** Render an engine result in the reference response shape. */
  def render(r: QueryEngine#AqeResult, maxRows: Int = 1000): String = {
    val rows = r.df.limit(maxRows).collect().toSeq
    val plan = obj(Seq(
      "type" -> jval(r.planType),
      "reason" -> jval(r.reason),
      "sample_table" -> r.sampleTable.map(jval).getOrElse("null"),
      "sample_fraction" -> r.sampleFraction.map(jval).getOrElse("null")))
    val meta = obj(Seq(
      "rows" -> rows.size.toString,
      "plan_type" -> jval(r.planType),
      "execution_time_ms" -> r.executionTimeMs.map(_.toString).getOrElse("null"),
      "actual_speedup" -> r.actualSpeedup.map(jval).getOrElse("null")))
    val ml = obj(Seq(
      "strategy" -> jval(r.strategy),
      "confidence" -> jval(r.confidence),
      "estimated_speedup" -> jval(r.estimatedSpeedup),
      "estimated_error" -> jval(r.estimatedError),
      "reasoning" -> jval(r.reason),
      "transformations" -> r.transformations.map(jval).mkString("[", ", ", "]")))
    obj(Seq(
      "status" -> jval("success"),
      "plan" -> plan,
      "result" -> rowsJson(rows),
      "meta" -> meta,
      "ml_optimization" -> ml))
  }
}
