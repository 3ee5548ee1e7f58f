package graft.serialize

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import graft.tables.Json

/** Output serializers (SURVEY §2.8 C22-C24): canonical JSON, TOML with
  * empty-stripping, and RDF triple emission + Turtle text. All deterministic
  * pure functions of the Project row; the Spark shape is a typed map /
  * flatMap + explode (the Generator equivalent, C24).
  */
object Serializers {

  // ---- C22: canonical JSON (reference: serializer/util.py:18-37 — orjson
  // with sorted keys, 2-space indent, trailing newline) ----

  def canonicalJson(v: Json.Value): String = {
    val sb = new StringBuilder
    render(v, sb, 0)
    sb.append('\n')
    sb.toString
  }

  private def render(v: Json.Value, sb: StringBuilder, indent: Int): Unit = v match {
    case Json.JObj(fields) if fields.isEmpty => sb.append("{}")
    case Json.JObj(fields) =>
      sb.append("{\n")
      val sorted = fields.sortBy(_._1)
      sorted.zipWithIndex.foreach { case ((k, x), i) =>
        sb.append("  " * (indent + 1))
        Json.JStr(k).render(sb)
        sb.append(": ")
        render(x, sb, indent + 1)
        if (i < sorted.length - 1) sb.append(',')
        sb.append('\n')
      }
      sb.append("  " * indent).append('}')
    case Json.JArr(items) if items.isEmpty => sb.append("[]")
    case Json.JArr(items) =>
      sb.append("[\n")
      items.zipWithIndex.foreach { case (x, i) =>
        sb.append("  " * (indent + 1))
        render(x, sb, indent + 1)
        if (i < items.length - 1) sb.append(',')
        sb.append('\n')
      }
      sb.append("  " * indent).append(']')
    case other => other.render(sb)
  }

  // ---- C23: TOML emission with empty-stripping (reference:
  // serializer/toml_serializer.py:35-110 — recursive null/empty pruning) ----

  def stripEmpty(v: Json.Value): Option[Json.Value] = v match {
    case Json.JNull => None
    case Json.JStr("") => None
    case Json.JArr(items) =>
      val kept = items.flatMap(stripEmpty)
      if (kept.isEmpty) None else Some(Json.JArr(kept))
    case Json.JObj(fields) =>
      val kept = fields.flatMap { case (k, x) => stripEmpty(x).map(k -> _) }
      if (kept.isEmpty) None else Some(Json.JObj(kept))
    case other => Some(other)
  }

  def toToml(obj: Json.JObj): String = {
    val stripped = stripEmpty(obj).collect { case o: Json.JObj => o }
      .getOrElse(Json.JObj(Vector.empty))
    val sb = new StringBuilder
    // scalars and arrays first, tables after (TOML requirement)
    val (tables, scalars) = stripped.v.partition {
      case (_, _: Json.JObj) => true
      case (_, Json.JArr(items)) if items.nonEmpty &&
        items.forall(_.isInstanceOf[Json.JObj]) => true
      case _ => false
    }
    scalars.foreach { case (k, x) => sb.append(tomlKey(k)).append(" = ").append(tomlValue(x)).append('\n') }
    tables.foreach {
      case (k, o: Json.JObj) =>
        sb.append('\n').append('[').append(tomlKey(k)).append("]\n")
        o.v.foreach { case (k2, x2) =>
          sb.append(tomlKey(k2)).append(" = ").append(tomlValue(x2)).append('\n')
        }
      case (k, Json.JArr(items)) =>
        items.foreach { case o: Json.JObj =>
          sb.append('\n').append("[[").append(tomlKey(k)).append("]]\n")
          o.v.foreach { case (k2, x2) =>
            sb.append(tomlKey(k2)).append(" = ").append(tomlValue(x2)).append('\n')
          }
        }
      case _ => ()
    }
    sb.toString
  }

  private def tomlKey(k: String): String =
    if (k.matches("[A-Za-z0-9_-]+")) k else "\"" + k.replace("\"", "\\\"") + "\""

  private def tomlValue(v: Json.Value): String = v match {
    case Json.JStr(s) =>
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\t' => "\\t"
        case c => c.toString
      } + "\""
    case n: Json.JNum => n.raw
    case Json.JBool(b) => b.toString
    case Json.JArr(items) => items.map(tomlValue).mkString("[", ", ", "]")
    case other => "\"" + other.toString + "\""
  }

  // ---- C24: RDF triple emission + Turtle (reference:
  // serializer/rdf_serializer.py:42-70 namespaces, 117-203 dataset,
  // 620-686 module, 699-759 files) ----

  final case class Triple(s: String, p: String, o: String, isLiteral: Boolean)

  val Namespaces: Seq[(String, String)] = Seq(
    "okh" -> "https://w3id.org/oseg/ont/okh#",
    "otrl" -> "https://w3id.org/oseg/ont/otrl#",
    "spdxl" -> "https://spdx.org/licenses/",
    "rdfs" -> "http://www.w3.org/2000/01/rdf-schema#")

  private def lit(v: String): String =
    "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n") + "\""

  /** One Project row → its triple set (deterministic order). Row fields are
    * the Normalizers output schema.
    */
  def projectTriples(r: Row): Seq[Triple] = {
    def str(name: String): Option[String] =
      if (r.schema.fieldNames.contains(name) && !r.isNullAt(r.fieldIndex(name)))
        Some(r.getString(r.fieldIndex(name)))
      else None
    val subject = s"<urn:okh:${str("project_id").getOrElse("unknown")}>"
    val base = Seq(
      Some(Triple(subject, "a", "okh:Module", isLiteral = false)),
      str("name").map(v => Triple(subject, "okh:name", lit(v), isLiteral = true)),
      str("repo").map(v => Triple(subject, "okh:repo", s"<$v>", isLiteral = false)),
      str("version").map(v => Triple(subject, "okh:version", lit(v), isLiteral = true)),
      str("license_spdx").map(v =>
        Triple(subject, "okh:spdxLicense", s"spdxl:$v", isLiteral = false)),
      str("function").map(v => Triple(subject, "okh:function", lit(v), isLiteral = true)),
      str("trl").map(v => Triple(subject, "okh:technologyReadinessLevel",
        s"otrl:$v", isLiteral = false)),
      str("drl").map(v => Triple(subject, "okh:documentationReadinessLevel",
        s"otrl:$v", isLiteral = false)),
      str("cpc_patent_class").map(v =>
        Triple(subject, "okh:cpcPatentClass", lit(v), isLiteral = true))).flatten

    def arrOf(name: String): Seq[Row] =
      if (r.schema.fieldNames.contains(name) && !r.isNullAt(r.fieldIndex(name)))
        r.getSeq[Row](r.fieldIndex(name))
      else Seq.empty
    val licensors = arrOf("licensor").zipWithIndex.flatMap { case (a, i) =>
      val node = s"<urn:okh:${str("project_id").getOrElse("unknown")}:licensor:$i>"
      Seq(Triple(subject, "okh:licensor", node, isLiteral = false)) ++
        Option(a.getAs[String]("name")).map(v =>
          Triple(node, "rdfs:label", lit(v), isLiteral = true))
    }
    val images = arrOf("image").flatMap { img =>
      Option(img.getAs[String]("url")).map(u =>
        Triple(subject, "okh:image", s"<$u>", isLiteral = false))
    }
    val sources = arrOf("source").flatMap { f =>
      Option(f.getAs[String]("url")).map(u =>
        Triple(subject, "okh:source", s"<$u>", isLiteral = false))
    }
    val exports = arrOf("export").flatMap { f =>
      Option(f.getAs[String]("url")).map(u =>
        Triple(subject, "okh:export", s"<$u>", isLiteral = false))
    }
    base ++ licensors ++ images ++ sources ++ exports
  }

  /** Project rows → exploded triple table (the C24 generator as flatMap). */
  def triples(projects: DataFrame): DataFrame = {
    import projects.sparkSession.implicits._
    projects.flatMap(projectTriples _).toDF()
  }

  /** Deterministic Turtle text for one project's triples. */
  def turtle(ts: Seq[Triple]): String = {
    val sb = new StringBuilder
    Namespaces.foreach { case (p, iri) => sb.append(s"@prefix $p: <$iri> .\n") }
    sb.append('\n')
    ts.foreach { t => sb.append(s"${t.s} ${t.p} ${t.o} .\n") }
    sb.toString
  }
}
