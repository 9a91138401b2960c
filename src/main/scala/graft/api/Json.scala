package graft.api

/** Minimal recursive-descent JSON parser for request bodies (the
  * dependency set has no JSON library; the reference parses with Flask's
  * request.get_json(), /root/reference/app.py:80). Supports the full
  * JSON grammar; numbers surface as Double.
  */
object Json {
  sealed trait V {
    def str: Option[String] = this match { case S(s) => Some(s); case _ => None }
    def num: Option[Double] = this match { case N(d) => Some(d); case _ => None }
    def bool: Option[Boolean] = this match { case B(b) => Some(b); case _ => None }
    def apply(key: String): Option[V] = this match {
      case O(f) => f.get(key); case _ => None
    }
  }
  final case class S(s: String) extends V
  final case class N(d: Double) extends V
  final case class B(b: Boolean) extends V
  case object Null extends V
  final case class A(items: List[V]) extends V
  final case class O(fields: Map[String, V]) extends V

  def parse(input: String): Either[String, V] =
    try {
      val p = new Parser(input)
      val v = p.value()
      p.ws()
      if (p.pos != input.length) Left(s"trailing input at ${p.pos}") else Right(v)
    } catch {
      case e: IllegalArgumentException => Left(String.valueOf(e.getMessage))
      case _: IndexOutOfBoundsException => Left("unexpected end of input")
    }

  private final class Parser(s: String) {
    var pos = 0
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"$msg at $pos")
    def ws(): Unit =
      while (pos < s.length && " \t\r\n".indexOf(s.charAt(pos)) >= 0) pos += 1
    private def expect(c: Char): Unit = {
      if (pos >= s.length || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }
    def value(): V = {
      ws()
      if (pos >= s.length) fail("unexpected end of input")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => S(string())
        case 't' => lit("true", B(true))
        case 'f' => lit("false", B(false))
        case 'n' => lit("null", Null)
        case _   => number()
      }
    }
    private def lit(word: String, v: V): V = {
      if (!s.startsWith(word, pos)) fail(s"expected $word")
      pos += word.length; v
    }
    private def obj(): V = {
      expect('{'); ws()
      if (pos < s.length && s.charAt(pos) == '}') { pos += 1; return O(Map.empty) }
      val b = Map.newBuilder[String, V]
      var done = false
      while (!done) {
        ws(); val k = string(); ws(); expect(':')
        b += k -> value(); ws()
        if (pos < s.length && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      O(b.result())
    }
    private def arr(): V = {
      expect('['); ws()
      if (pos < s.length && s.charAt(pos) == ']') { pos += 1; return A(Nil) }
      val b = List.newBuilder[V]
      var done = false
      while (!done) {
        b += value(); ws()
        if (pos < s.length && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      A(b.result())
    }
    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          s.charAt(pos) match {
            case '"'  => sb += '"'
            case '\\' => sb += '\\'
            case '/'  => sb += '/'
            case 'b'  => sb += '\b'
            case 'f'  => sb += '\f'
            case 'n'  => sb += '\n'
            case 'r'  => sb += '\r'
            case 't'  => sb += '\t'
            case 'u' =>
              sb += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case other => fail(s"bad escape \\$other")
          }
        } else sb += c
        pos += 1
      }
      pos += 1
      sb.result()
    }
    private def number(): V = {
      val start = pos
      if (pos < s.length && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      while (pos < s.length && ("0123456789.eE+-".indexOf(s.charAt(pos)) >= 0)) pos += 1
      if (pos == start) fail("expected value")
      try N(s.substring(start, pos).toDouble)
      catch { case _: NumberFormatException => fail("bad number") }
    }
  }
}
