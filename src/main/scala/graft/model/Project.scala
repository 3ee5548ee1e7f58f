package graft.model

import org.apache.spark.sql.Row

/** Typed Project model — the full breadth of the reference's data model
  * (/root/reference/krawl/model/project.py:21-69, part.py:13-33,
  * software.py:14-23, file.py:19-60,178-210, agent.py, data_set.py:17-39),
  * re-expressed as Spark-encodable case classes so pipelines can work with
  * `Dataset[ProjectModel]` and serializers get a total, typed input.
  *
  * Field names are snake_case so the Dataset columns line up with the
  * Normalizers DataFrame output (the two representations interconvert via
  * `ProjectModel.fromRow` / `.toDS`).
  */
final case class FileRef(
    name: Option[String],
    path: Option[String],
    url: Option[String],
    frozen_url: Option[String],
    mime_type: Option[String]) {
  /** reference: model/file.py:37-39 */
  def valid: Boolean = path.nonEmpty || url.nonEmpty
  /** reference: model/file.py:41-47 */
  def extension: String = {
    val p = path.orElse(url).getOrElse("")
    val dot = p.lastIndexOf('.')
    if (dot < 0) "" else p.substring(dot + 1).toLowerCase
  }
  /** reference: model/file.py:48-60 (mimetypes.guess_type) */
  def evaluateMimeType: Option[String] =
    mime_type.orElse(graft.functions.ScalarFunctions.mimeTypes.get(extension))
}

object FileRef {
  def url(u: String, name: Option[String] = None): FileRef =
    FileRef(name, None, Option(u), None, None)
  val empty: FileRef = FileRef(None, None, None, None, None)
}

/** RDF language-tagged string (reference: model/language_string.py:12-20) —
  * serializes as `"text"@language`.
  */
final case class LangStr(text: String, language: String)

/** reference: model/file.py:178-210 (Image = File + slots/tags/depicts). */
final case class ImageRef(
    name: Option[String],
    path: Option[String],
    url: Option[String],
    frozen_url: Option[String],
    mime_type: Option[String],
    slots: Seq[String],
    tags: Seq[String],
    depicts: Seq[LangStr]) {
  def toFile: FileRef = FileRef(name, path, url, frozen_url, mime_type)
}

/** Person/Organization/AgentRef collapsed to one encodable row
  * (reference: model/agent.py); `iri` set ⇒ AgentRef semantics.
  */
final case class AgentRow(
    name: Option[String],
    email: Option[String],
    url: Option[String],
    iri: Option[String],
    is_organization: Boolean)

/** reference: model/outer_dimensions.py */
final case class OuterDims(
    width: Option[Double],
    height: Option[Double],
    depth: Option[Double])

/** reference: model/part.py:13-33 */
final case class PartRow(
    name_clean: String,
    name: Option[String],
    image: Seq[ImageRef],
    source: Seq[FileRef],
    export: Seq[FileRef],
    auxiliary: Seq[FileRef],
    material: Option[String],
    manufacturing_instructions: Seq[FileRef],
    mass: Option[Double],
    outer_dimensions: Option[OuterDims],
    tsdc: Option[String])

/** reference: model/software.py:14-23 */
final case class SoftwareRow(
    release: String,
    installation_guide: Option[FileRef],
    documentation_language: Seq[String],
    license_spdx: Option[String],
    licensor: Seq[AgentRow],
    organization: Seq[AgentRow])

/** reference: model/data_set.py:17-39 (CrawlingMeta) + DataSet okhv/hosting.
  * Timestamps are ISO-8601 strings (virtual-clock friendly, avro/parquet
  * portable); `visits`/`changes` are the re-visit counters.
  */
final case class CrawlMeta(
    hosting_id: String,
    sourcing_procedure: String, // api | manifest | generated-manifest | direct
    manifest_url: Option[String],
    okhv_fetched: Option[String],
    created_at: Option[String],
    first_visited: Option[String],
    last_visited: Option[String],
    last_successfully_visited: Option[String],
    last_detected_change: Option[String],
    visits: Long,
    changes: Long)

object CrawlMeta {
  def initial(hostingId: String, procedure: String,
      manifest: Option[String] = None, okhv: Option[String] = None,
      visitedAt: Option[String] = None): CrawlMeta =
    CrawlMeta(hostingId, procedure, manifest, okhv,
      created_at = visitedAt, first_visited = visitedAt, last_visited = visitedAt,
      last_successfully_visited = visitedAt, last_detected_change = None,
      visits = 1L, changes = 0L)
}

/** reference: model/project.py:21-69 */
final case class ProjectModel(
    project_id: String,
    name: String,
    repo: String,
    version: Option[String],
    release: Option[String],
    license_spdx: Option[String],
    licensor: Seq[AgentRow],
    organization: Seq[AgentRow],
    readme: Seq[FileRef],
    contribution_guide: Option[FileRef],
    image: Seq[ImageRef],
    documentation_language: Seq[String],
    trl: Option[String], // technology_readiness_level, e.g. "OTRL-4"
    drl: Option[String], // documentation_readiness_level, e.g. "ODRL-3*"
    attestation: Seq[String],
    publication: Seq[String],
    function: Option[String],
    standard_compliance: Seq[String],
    cpc_patent_class: Option[String],
    tsdc: Option[String],
    bom: Seq[FileRef],
    manufacturing_instructions: Seq[FileRef],
    user_manual: Seq[FileRef],
    mass: Option[Double],
    outer_dimensions: Option[OuterDims],
    part: Seq[PartRow],
    software: Seq[SoftwareRow],
    source: Seq[FileRef],
    export: Seq[FileRef],
    auxiliary: Seq[FileRef],
    normalized_toml: Option[String]) {

  /** reference: model/project.py:66-69 (strip special chars). */
  def nameClean: String = ProjectModel.cleanName(name)
}

object ProjectModel {

  /** reference: model/project.py:18 `pat_special_chars` + dict_utils
    * clean_name: drop everything outside [a-zA-Z0-9_-].
    */
  def cleanName(s: String): String =
    if (s == null) "" else s.replaceAll("[^a-zA-Z0-9_-]+", "")

  def minimal(projectId: String, name: String, repo: String): ProjectModel =
    ProjectModel(projectId, name, repo,
      version = None, release = None, license_spdx = None,
      licensor = Seq.empty, organization = Seq.empty, readme = Seq.empty,
      contribution_guide = None, image = Seq.empty,
      documentation_language = Seq.empty, trl = None, drl = None,
      attestation = Seq.empty, publication = Seq.empty, function = None,
      standard_compliance = Seq.empty, cpc_patent_class = None, tsdc = None,
      bom = Seq.empty, manufacturing_instructions = Seq.empty,
      user_manual = Seq.empty, mass = None, outer_dimensions = None,
      part = Seq.empty, software = Seq.empty, source = Seq.empty,
      export = Seq.empty, auxiliary = Seq.empty, normalized_toml = None)

  // ---- Row → model (tolerates any column subset; missing = empty) ----

  // field lookups go through a per-thread identity-keyed memo (rows in a
  // partition share schema INSTANCES, and a project row alternates between
  // its outer schema and the nested agent/file/part/software schemas, so a
  // single-slot cache would thrash) — `fieldNames.contains` would allocate
  // and linearly scan a fresh array per field per ROW, dominating fromRow
  // cost at serializer throughput
  private val schemaIdx = new ThreadLocal[
      java.util.IdentityHashMap[org.apache.spark.sql.types.StructType, Map[String, Int]]] {
    override def initialValue() = new java.util.IdentityHashMap()
  }

  private def idxOf(r: Row, n: String): Int = {
    val s = r.schema
    if (s == null) return -1
    val cache = schemaIdx.get()
    var m = cache.get(s)
    if (m == null) {
      if (cache.size > 64) cache.clear() // bound growth across schemas
      m = s.fieldNames.zipWithIndex.toMap
      cache.put(s, m)
    }
    m.getOrElse(n, -1)
  }

  private def hasField(r: Row, n: String): Boolean = {
    val i = idxOf(r, n)
    i >= 0 && !r.isNullAt(i)
  }

  private def optStr(r: Row, n: String): Option[String] = {
    val i = idxOf(r, n)
    if (i >= 0 && !r.isNullAt(i)) Option(r.getString(i)) else None
  }

  private def optDouble(r: Row, n: String): Option[Double] = {
    val i = idxOf(r, n)
    if (i >= 0 && !r.isNullAt(i)) Some(r.get(i).asInstanceOf[Number].doubleValue())
    else None
  }

  private def strSeq(r: Row, n: String): Seq[String] = {
    val i = idxOf(r, n)
    if (i >= 0 && !r.isNullAt(i))
      r.getSeq[String](i).filter(_ != null)
    else Seq.empty
  }

  private def rowSeq(r: Row, n: String): Seq[Row] = {
    val i = idxOf(r, n)
    if (i >= 0 && !r.isNullAt(i))
      r.getSeq[Row](i).filter(_ != null)
    else Seq.empty
  }

  private def fileOf(f: Row): FileRef = FileRef(
    optStr(f, "name"), optStr(f, "path"), optStr(f, "url"),
    optStr(f, "frozen_url"), optStr(f, "mime_type"))

  private def langStrSeq(r: Row, n: String): Seq[LangStr] = {
    val i = idxOf(r, n)
    if (i < 0 || r.isNullAt(i)) Seq.empty
    else r.getSeq[Row](i).filter(_ != null).flatMap { d =>
      // missing text → entry dropped (the reference raises; errors-as-data
      // here); missing language defaults to 'en' (manifest.py:284-305)
      optStr(d, "text").map(t => LangStr(t, optStr(d, "language").getOrElse("en")))
    }
  }

  private def imageOf(f: Row): ImageRef = ImageRef(
    optStr(f, "name"), optStr(f, "path"), optStr(f, "url"),
    optStr(f, "frozen_url"), optStr(f, "mime_type"),
    strSeq(f, "slots"), strSeq(f, "tags"), langStrSeq(f, "depicts"))

  private def agentOf(a: Row): AgentRow = AgentRow(
    optStr(a, "name"), optStr(a, "email"), optStr(a, "url"), optStr(a, "iri"),
    is_organization = hasField(a, "is_organization") && a.getAs[Boolean]("is_organization"))

  private def dimsOf(r: Row, n: String): Option[OuterDims] =
    if (hasField(r, n)) {
      val d = r.getAs[Row](n)
      val od = OuterDims(optDouble(d, "width"), optDouble(d, "height"), optDouble(d, "depth"))
      if (od.width.isEmpty && od.height.isEmpty && od.depth.isEmpty) None else Some(od)
    } else None

  private def partOf(p: Row): PartRow = PartRow(
    name_clean = optStr(p, "name_clean")
      .getOrElse(cleanName(optStr(p, "name").getOrElse(""))),
    name = optStr(p, "name"),
    image = rowSeq(p, "image").map(imageOf),
    source = rowSeq(p, "source").map(fileOf),
    export = rowSeq(p, "export").map(fileOf),
    auxiliary = rowSeq(p, "auxiliary").map(fileOf),
    material = optStr(p, "material"),
    manufacturing_instructions = rowSeq(p, "manufacturing_instructions").map(fileOf),
    mass = optDouble(p, "mass"),
    outer_dimensions = dimsOf(p, "outer_dimensions"),
    tsdc = optStr(p, "tsdc"))

  private def softwareOf(s: Row): SoftwareRow = SoftwareRow(
    release = optStr(s, "release").getOrElse(""),
    installation_guide =
      if (hasField(s, "installation_guide")) Some(fileOf(s.getAs[Row]("installation_guide")))
      else None,
    documentation_language = strSeq(s, "documentation_language"),
    license_spdx = optStr(s, "license_spdx"),
    licensor = rowSeq(s, "licensor").map(agentOf),
    organization = rowSeq(s, "organization").map(agentOf))

  /** Normalizer output Row → typed model. Any column the row lacks becomes
    * empty — the serializer is total over partial platform schemas.
    */
  def fromRow(r: Row): ProjectModel = ProjectModel(
    project_id = optStr(r, "project_id").getOrElse("unknown"),
    name = optStr(r, "name").getOrElse(""),
    repo = optStr(r, "repo").getOrElse(""),
    version = optStr(r, "version"),
    release = optStr(r, "release"),
    license_spdx = optStr(r, "license_spdx"),
    licensor = rowSeq(r, "licensor").map(agentOf),
    organization = rowSeq(r, "organization").map(agentOf),
    readme = rowSeq(r, "readme").map(fileOf),
    contribution_guide =
      if (hasField(r, "contribution_guide")) Some(fileOf(r.getAs[Row]("contribution_guide")))
      else None,
    image = rowSeq(r, "image").map(imageOf),
    documentation_language = strSeq(r, "documentation_language"),
    trl = optStr(r, "trl"),
    drl = optStr(r, "drl"),
    attestation = strSeq(r, "attestation"),
    publication = strSeq(r, "publication"),
    function = optStr(r, "function"),
    standard_compliance = strSeq(r, "standard_compliance"),
    cpc_patent_class = optStr(r, "cpc_patent_class"),
    tsdc = optStr(r, "tsdc"),
    bom = rowSeq(r, "bom").map(fileOf),
    manufacturing_instructions = rowSeq(r, "manufacturing_instructions").map(fileOf),
    user_manual = rowSeq(r, "user_manual").map(fileOf),
    mass = optDouble(r, "mass"),
    outer_dimensions = dimsOf(r, "outer_dimensions"),
    part = rowSeq(r, "part").map(partOf),
    software = rowSeq(r, "software").map(softwareOf),
    source = rowSeq(r, "source").map(fileOf),
    export = rowSeq(r, "export").map(fileOf),
    auxiliary = rowSeq(r, "auxiliary").map(fileOf),
    normalized_toml = optStr(r, "normalized_toml"))
}
