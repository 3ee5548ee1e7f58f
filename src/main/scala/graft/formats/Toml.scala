package graft.formats

import scala.collection.mutable
import graft.tables.Json

/** Minimal TOML parser (C14 — the reference parses manifests with tomli,
  * manifest.py:74-75). Offline build forbids new deps (SURVEY §7.4 risk 3),
  * so this implements the subset OKH manifests use: top-level and dotted
  * `[section]` tables, `[[array-of-table]]` entries, basic strings, ints,
  * floats, booleans, arrays, and inline tables. Output is a
  * `graft.tables.Json.Value` tree; the Spark boundary converts it to a JSON
  * string consumed by the builtin `from_json`.
  */
object Toml {

  def parse(input: String): Json.JObj = {
    val root = mutable.LinkedHashMap.empty[String, Any]
    var current: mutable.LinkedHashMap[String, Any] = root
    for (rawLine <- input.split("\n")) {
      val line = stripComment(rawLine).trim
      if (line.nonEmpty) {
        if (line.startsWith("[[") && line.endsWith("]]")) {
          val path = line.substring(2, line.length - 2).trim.split("\\.").map(unquoteKey)
          current = appendArrayTable(root, path.toIndexedSeq)
        } else if (line.startsWith("[") && line.endsWith("]")) {
          val path = line.substring(1, line.length - 1).trim.split("\\.").map(unquoteKey)
          current = openTable(root, path.toIndexedSeq)
        } else {
          val eq = indexOfTopLevel(line, '=')
          if (eq < 0) throw new IllegalArgumentException(s"bad TOML line: $rawLine")
          val key = unquoteKey(line.substring(0, eq).trim)
          current(key) = parseValue(line.substring(eq + 1).trim)
        }
      }
    }
    toJson(root).asInstanceOf[Json.JObj]
  }

  /** Render straight to a JSON string (the UDF boundary). */
  def toJsonString(input: String): String = parse(input).toString

  private def stripComment(line: String): String = {
    var inStr = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') inStr = !inStr
      else if (c == '#' && !inStr) return line.substring(0, i)
      i += 1
    }
    line
  }

  private def unquoteKey(k: String): String = {
    val t = k.trim
    if (t.length >= 2 && ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1)
    else t
  }

  private def openTable(root: mutable.LinkedHashMap[String, Any],
      path: Seq[String]): mutable.LinkedHashMap[String, Any] = {
    var cur = root
    for (seg <- path) {
      cur = cur.getOrElseUpdate(seg, mutable.LinkedHashMap.empty[String, Any]) match {
        case m: mutable.LinkedHashMap[String @unchecked, Any @unchecked] => m
        case buf: mutable.ArrayBuffer[Any @unchecked] =>
          buf.last.asInstanceOf[mutable.LinkedHashMap[String, Any]]
        case other => throw new IllegalArgumentException(s"key conflict at $seg: $other")
      }
    }
    cur
  }

  private def appendArrayTable(root: mutable.LinkedHashMap[String, Any],
      path: Seq[String]): mutable.LinkedHashMap[String, Any] = {
    val parent = openTable(root, path.dropRight(1))
    val buf = parent.getOrElseUpdate(path.last, mutable.ArrayBuffer.empty[Any])
      .asInstanceOf[mutable.ArrayBuffer[Any]]
    val tbl = mutable.LinkedHashMap.empty[String, Any]
    buf += tbl
    tbl
  }

  private def indexOfTopLevel(s: String, target: Char): Int = {
    var depth = 0; var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"') inStr = !inStr
      else if (!inStr) {
        if (c == '[' || c == '{') depth += 1
        else if (c == ']' || c == '}') depth -= 1
        else if (c == target && depth == 0) return i
      }
      i += 1
    }
    -1
  }

  private[formats] def parseValue(v: String): Any = {
    val t = v.trim
    if (t.startsWith("\"\"\"")) t.stripPrefix("\"\"\"").stripSuffix("\"\"\"")
    else if (t.startsWith("\"")) unescape(t.substring(1, t.length - 1))
    else if (t.startsWith("'")) t.substring(1, t.length - 1)
    else if (t.startsWith("[")) {
      val inner = t.substring(1, t.length - 1).trim
      if (inner.isEmpty) mutable.ArrayBuffer.empty[Any]
      else mutable.ArrayBuffer(splitTopLevel(inner, ',').map(parseValue): _*)
    } else if (t.startsWith("{")) {
      val inner = t.substring(1, t.length - 1).trim
      val m = mutable.LinkedHashMap.empty[String, Any]
      if (inner.nonEmpty) splitTopLevel(inner, ',').foreach { kv =>
        val eq = indexOfTopLevel(kv, '=')
        m(unquoteKey(kv.substring(0, eq).trim)) = parseValue(kv.substring(eq + 1).trim)
      }
      m
    } else if (t == "true") true
    else if (t == "false") false
    else if (IntPattern.matcher(t).matches()) t.replace("_", "").toLong
    else if (FloatPattern.matcher(t).matches()) t.replace("_", "").toDouble
    else t // bare value (dates etc.) kept as string
  }

  // precompiled: String.matches re-compiles its pattern per call, and
  // parseValue runs once per TOML line of every manifest on the hot path
  private val IntPattern = java.util.regex.Pattern.compile("[+-]?[0-9_]+")
  private val FloatPattern =
    java.util.regex.Pattern.compile("[+-]?[0-9_]*\\.[0-9_]+([eE][+-]?[0-9]+)?")

  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var depth = 0; var inStr = false; var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"') inStr = !inStr
      else if (!inStr) {
        if (c == '[' || c == '{') depth += 1
        else if (c == ']' || c == '}') depth -= 1
        else if (c == sep && depth == 0) { out += s.substring(start, i); start = i + 1 }
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        i += 1
        s.charAt(i) match {
          case 'n' => sb.append('\n')
          case 't' => sb.append('\t')
          case 'r' => sb.append('\r')
          case '"' => sb.append('"')
          case '\\' => sb.append('\\')
          case 'u' => sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar); i += 4
          case o => sb.append(o)
        }
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }

  private[formats] def toJson(v: Any): Json.Value = v match {
    case m: mutable.LinkedHashMap[String @unchecked, Any @unchecked] =>
      Json.JObj(m.toVector.map { case (k, x) => k -> toJson(x) })
    case buf: mutable.ArrayBuffer[Any @unchecked] => Json.JArr(buf.toVector.map(toJson))
    case s: String => Json.JStr(s)
    case l: Long => Json.n(l)
    case d: Double => Json.d(d)
    case b: Boolean => Json.JBool(b)
    case null => Json.JNull
    case other => Json.JStr(other.toString)
  }
}
