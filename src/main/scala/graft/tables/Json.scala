package graft.tables

import scala.collection.mutable

/** Minimal dependency-free JSON codec for snapshot metadata files.
  * Supports objects, arrays, strings, longs, doubles, booleans, null —
  * everything the snapshot schema needs. Deterministic output (insertion
  * order preserved) so snapshot files are byte-stable for a given state.
  */
object Json {
  sealed trait Value {
    def render(sb: StringBuilder): Unit
    override def toString: String = { val sb = new StringBuilder; render(sb); sb.toString }
  }
  final case class JStr(v: String) extends Value {
    def render(sb: StringBuilder): Unit = {
      sb.append('"')
      v.foreach {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"')
    }
  }
  /** Numbers carry their exact text form so 64-bit longs (e.g. url hashes)
    * never round-trip through double precision.
    */
  final case class JNum(raw: String) extends Value {
    def render(sb: StringBuilder): Unit = sb.append(raw)
    def toLong: Long = raw.toLong
    def toDouble: Double = raw.toDouble
  }
  final case class JBool(v: Boolean) extends Value {
    def render(sb: StringBuilder): Unit = sb.append(if (v) "true" else "false")
  }
  case object JNull extends Value { def render(sb: StringBuilder): Unit = sb.append("null") }
  final case class JArr(v: Vector[Value]) extends Value {
    def render(sb: StringBuilder): Unit = {
      sb.append('[')
      var first = true
      v.foreach { e => if (!first) sb.append(','); e.render(sb); first = false }
      sb.append(']')
    }
  }
  final case class JObj(v: Vector[(String, Value)]) extends Value {
    def render(sb: StringBuilder): Unit = {
      sb.append('{')
      var first = true
      v.foreach { case (k, e) =>
        if (!first) sb.append(',')
        JStr(k).render(sb); sb.append(':'); e.render(sb); first = false
      }
      sb.append('}')
    }
    def apply(key: String): Value = v.find(_._1 == key).map(_._2)
      .getOrElse(throw new NoSuchElementException(s"missing key '$key'"))
    def get(key: String): Option[Value] = v.find(_._1 == key).map(_._2)
    def str(key: String): String = apply(key).asInstanceOf[JStr].v
    def long(key: String): Long = apply(key).asInstanceOf[JNum].toLong
    def arr(key: String): Vector[Value] = apply(key).asInstanceOf[JArr].v
  }

  def obj(fields: (String, Value)*): JObj = JObj(fields.toVector)
  def arr(items: Value*): JArr = JArr(items.toVector)
  def s(v: String): Value = if (v == null) JNull else JStr(v)
  def n(v: Long): JNum = JNum(v.toString)
  def d(v: Double): JNum = JNum(v.toString)

  def parse(input: String): Value = new Parser(input).parseValue()

  private final class Parser(in: String) {
    private var i = 0
    private def ws(): Unit = while (i < in.length && in.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      ws()
      if (i >= in.length || in.charAt(i) != c)
        throw new IllegalArgumentException(s"expected '$c' at $i in: ${in.take(80)}…")
      i += 1
    }
    def parseValue(): Value = {
      ws()
      if (i >= in.length) throw new IllegalArgumentException("unexpected end of input")
      in.charAt(i) match {
        case '{' => parseObj()
        case '[' => parseArr()
        case '"' => JStr(parseString())
        case 't' => i += 4; JBool(true)
        case 'f' => i += 5; JBool(false)
        case 'n' => i += 4; JNull
        case _   => parseNum()
      }
    }
    private def parseObj(): JObj = {
      expect('{'); ws()
      val buf = mutable.ArrayBuffer.empty[(String, Value)]
      if (i < in.length && in.charAt(i) == '}') { i += 1; return JObj(buf.toVector) }
      while (true) {
        ws()
        val k = parseString()
        expect(':')
        buf += ((k, parseValue()))
        ws()
        if (i < in.length && in.charAt(i) == ',') i += 1
        else { expect('}'); return JObj(buf.toVector) }
      }
      JObj(buf.toVector)
    }
    private def parseArr(): JArr = {
      expect('['); ws()
      val buf = mutable.ArrayBuffer.empty[Value]
      if (i < in.length && in.charAt(i) == ']') { i += 1; return JArr(buf.toVector) }
      while (true) {
        buf += parseValue()
        ws()
        if (i < in.length && in.charAt(i) == ',') i += 1
        else { expect(']'); return JArr(buf.toVector) }
      }
      JArr(buf.toVector)
    }
    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < in.length && in.charAt(i) != '"') {
        val c = in.charAt(i)
        if (c == '\\') {
          i += 1
          in.charAt(i) match {
            case '"'  => sb.append('"')
            case '\\' => sb.append('\\')
            case '/'  => sb.append('/')
            case 'n'  => sb.append('\n')
            case 'r'  => sb.append('\r')
            case 't'  => sb.append('\t')
            case 'b'  => sb.append('\b')
            case 'f'  => sb.append('\f')
            case 'u'  =>
              sb.append(Integer.parseInt(in.substring(i + 1, i + 5), 16).toChar); i += 4
            case other => throw new IllegalArgumentException(s"bad escape \\$other")
          }
        } else sb.append(c)
        i += 1
      }
      i += 1
      sb.toString
    }
    private def parseNum(): JNum = {
      val start = i
      while (i < in.length && (in.charAt(i).isDigit || "+-.eE".contains(in.charAt(i)))) i += 1
      JNum(in.substring(start, i))
    }
  }
}
