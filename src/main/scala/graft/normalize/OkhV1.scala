package graft.normalize

import graft.tables.Json

/** OKH v1 → LOSH manifest conversion (C16).
  *
  * The reference delegates this to the external `okh-tool conv` binary
  * (fetcher/util.py:84-150, triggered when a manifest has no `okhv` key —
  * normalizer/manifest.py:194-200); the binary's code is not part of the
  * reference repo, so this is a from-the-public-spec field mapping (OKH
  * standard v1.0.0 → OKH-LOSH), NOT a port of okh-tool. The mapping covers
  * the v1 fields the LOSH model can express; v1 fields with no LOSH
  * counterpart (made, intended-use, tool-list, …) are dropped, exactly like
  * a lossy spec upgrade. okh-tool edge-case behavior beyond this documented
  * mapping stays a declared boundary (SURVEY §7.5).
  *
  * | OKH v1                        | LOSH                            |
  * |-------------------------------|---------------------------------|
  * | title                         | name                            |
  * | description                   | function                        |
  * | version                       | version                         |
  * | documentation-home ∥ project-link | repo                        |
  * | license.hardware ∥ .documentation ∥ .software | license         |
  * | licensor.name [+ email]       | licensor ("Name <email>")       |
  * | licensor.affiliation          | organization                    |
  * | documentation-language        | documentation-language (list)   |
  * | image                         | image (single entry)            |
  * | bom                           | bom                             |
  * | making-instructions[0].path   | manufacturing-instructions      |
  * | operating-instructions[0].path| user-manual                     |
  * | standards-used[].standard-title | standard-compliance           |
  * | date-updated ∥ date-created   | release (fallback version info) |
  * | (constant)                    | okhv = "OKH-LOSHv1.0"           |
  */
object OkhV1 {

  /** A manifest JSON is v1 iff it has no `okhv` key (the reference's
    * trigger, manifest.py:194-196).
    */
  def isV1(m: Json.JObj): Boolean = m.get("okhv").forall(_ == Json.JNull)

  private def strOf(v: Json.Value): Option[String] = v match {
    case Json.JStr(s) if s.nonEmpty => Some(s)
    case n: Json.JNum => Some(n.raw)
    case _ => None
  }

  private def getStr(m: Json.JObj, key: String): Option[String] =
    m.get(key).flatMap(strOf)

  private def getObj(m: Json.JObj, key: String): Option[Json.JObj] =
    m.get(key).collect { case o: Json.JObj => o }

  private def getArr(m: Json.JObj, key: String): Vector[Json.Value] =
    m.get(key) match {
      case Some(Json.JArr(v)) => v
      case Some(other) => Vector(other) // scalar where a list is expected
      case None => Vector.empty
    }

  /** First `path` (or plain-string) entry of a v1 document-reference list
    * (`[{path, title}]` in the spec; bare strings occur in the wild).
    */
  private def firstPath(m: Json.JObj, key: String): Option[String] =
    getArr(m, key).view.flatMap {
      case o: Json.JObj => getStr(o, "path").orElse(getStr(o, "url"))
      case v => strOf(v)
    }.headOption

  /** Convert a parsed v1 manifest object to the LOSH-shaped object the
    * manifest normalizer consumes. Returns the input unchanged when it is
    * not a v1 manifest.
    */
  def convertToLosh(m: Json.JObj): Json.JObj = {
    if (!isV1(m)) return m
    val fields = Vector.newBuilder[(String, Json.Value)]
    def put(key: String, v: Option[String]): Unit =
      v.foreach(s => fields += key -> Json.s(s))

    fields += "okhv" -> Json.s("OKH-LOSHv1.0")
    put("name", getStr(m, "title"))
    put("function", getStr(m, "description"))
    put("version", getStr(m, "version"))
    put("repo", getStr(m, "documentation-home").orElse(getStr(m, "project-link")))
    put("release", getStr(m, "date-updated").orElse(getStr(m, "date-created")))

    val lic = getObj(m, "license")
    put("license", lic.flatMap(l => getStr(l, "hardware")
      .orElse(getStr(l, "documentation")).orElse(getStr(l, "software")))
      // v1 in the wild also carries a bare string license
      .orElse(getStr(m, "license")))

    val licensor = getObj(m, "licensor")
    val licensorStr = licensor.flatMap { l =>
      getStr(l, "name").map { n =>
        getStr(l, "email").map(e => s"$n <$e>").getOrElse(n)
      }
    }.orElse(getStr(m, "licensor"))
    put("licensor", licensorStr)
    put("organization", licensor.flatMap(getStr(_, "affiliation")))

    getStr(m, "documentation-language").foreach(lang =>
      fields += "documentation-language" -> Json.arr(Json.s(lang)))
    getStr(m, "image").foreach(img =>
      fields += "image" -> Json.arr(Json.s(img)))
    put("bom", getStr(m, "bom"))
    put("manufacturing-instructions", firstPath(m, "making-instructions"))
    put("user-manual", firstPath(m, "operating-instructions"))

    val standards = getArr(m, "standards-used").flatMap {
      case o: Json.JObj => getStr(o, "standard-title")
      case v => strOf(v)
    }
    if (standards.nonEmpty)
      fields += "standard-compliance" -> Json.JArr(standards.map(Json.s))

    Json.JObj(fields.result())
  }

  /** String-level form for the normalizer's JSON seam: parse, convert,
    * re-render. Non-object / unparseable input passes through unchanged
    * (errors stay data — the downstream from_json yields null and the row
    * drops, the reference raises NormalizerError).
    */
  def convertJson(json: String): String =
    if (json == null) null
    else
      try Json.parse(json) match {
        case o: Json.JObj => convertToLosh(o).toString
        case _ => json
      } catch { case _: Exception => json }
}
