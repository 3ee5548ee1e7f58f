package graft.serialize

import scala.collection.mutable
import graft.functions.ScalarFunctions
import graft.model._

/** Three-graph RDF serialization — full parity with the reference's largest
  * module (/root/reference/krawl/serializer/rdf_serializer.py:75-869): every
  * project serializes to THREE Turtle graphs, stored as separate sink
  * columns/files (repository/fetch_result_repository_workdir.py:105-110):
  *
  *   - `normalized.okh_toml.ttl` — the normalized manifest TOML,
  *     zlib-deflated + base64 (rdf_serializer.py:827-832)
  *   - `meta.ttl`   — the data-set/source graph: provider, sourcing
  *     procedure, visit metadata, manifest file (rdf_serializer.py:117-203)
  *   - `data.okh.ttl` — the OKH module graph: module fields, parts,
  *     software, files, image slots/tags (rdf_serializer.py:620-779)
  *
  * Everything here is a deterministic pure function of (ProjectModel,
  * CrawlMeta) — the Spark shape is a typed map (one row in, three strings
  * out) or a flatMap to the exploded triple table; no shuffle, no state.
  */
object RdfSerializer {

  // ---- namespaces (rdf_serializer.py:42-70) ----

  val MIME = "http://www.iana.org/assignments/media-types/"
  val SCHEMA = "https://schema.org/"
  val SPDXL = "http://spdx.org/licenses/"
  val ODS = "http://w3id.org/oseg/ont/ods#"
  val OKH = "http://w3id.org/oseg/ont/okh#"
  val OKHKRAWL = "http://w3id.org/oseg/ont/okhkrawl#"
  val OKHIMG = "http://w3id.org/oseg/ont/okhimg#"
  val OTRL = "http://w3id.org/oseg/ont/otrl#"
  val TSDC = "http://w3id.org/oseg/ont/tsdc#"
  val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val RDFS = "http://www.w3.org/2000/01/rdf-schema#"
  val OWL = "http://www.w3.org/2002/07/owl#"
  val XSD = "http://www.w3.org/2001/XMLSchema#"
  val VOID = "http://rdfs.org/ns/void#"
  val FOAF = "http://xmlns.com/foaf/0.1/"
  val DCTERMS = "http://purl.org/dc/terms/"

  /** Prefix bindings (rdf_serializer.py:787-804 `_setup_graph`): data graphs
    * additionally bind mime/okhimg/otrl/tsdc.
    */
  private val metaPrefixes: Seq[(String, String)] = Seq(
    "ods" -> ODS, "rdfs" -> RDFS, "okh" -> OKH, "okhkrawl" -> OKHKRAWL,
    "owl" -> OWL, "schema" -> SCHEMA, "spdxl" -> SPDXL, "xsd" -> XSD,
    "rdf" -> RDF, "void" -> VOID, "foaf" -> FOAF, "dcterms" -> DCTERMS)
  private val dataPrefixes: Seq[(String, String)] =
    Seq("mime" -> MIME, "okhimg" -> OKHIMG, "otrl" -> OTRL, "tsdc" -> TSDC) ++ metaPrefixes

  // ---- naming conventions (rdf_serializer.py:252-290) ----

  def capitalize(s: String): String =
    if (s.isEmpty) s else s.substring(0, 1).toUpperCase + s.substring(1)

  def decapitalize(s: String): String =
    if (s.isEmpty) s else s.substring(0, 1).toLowerCase + s.substring(1)

  /** rdf_serializer.py:266-270: split on spaces, capitalize each part,
    * keep only [alnum_-].
    */
  def titleCase(s: String): String = {
    val capitalized = s.split(" ").filter(_.nonEmpty).map(capitalize).mkString
    capitalized.filter(c => c.isLetterOrDigit || c == '_' || c == '-')
  }

  /** rdf_serializer.py:272-276: individuals start lower-case. */
  def individualCase(s: String): String = {
    val t = titleCase(s)
    if (t.isEmpty) t else t.substring(0, 1).toLowerCase + t.substring(1)
  }

  /** rdf_serializer.py:278-284: '_'/'-' runs → word breaks → camelCase. */
  def camelCase(s: String): String = {
    val spaced = s.replaceAll("[_-]+", " ")
    val titled = spaced.split(" ").filter(_.nonEmpty)
      .map(w => capitalize(w.toLowerCase)).mkString
    if (titled.isEmpty) titled else titled.substring(0, 1).toLowerCase + titled.substring(1)
  }

  def upperCamelCase(s: String): String = capitalize(camelCase(s))

  // ---- graph: an insertion-ordered SET of triples (rdflib semantics) ----

  final case class Triple(s: String, p: String, o: String)

  final class TripleGraph(val prefixes: Seq[(String, String)], val base: String) {
    private val order = mutable.ArrayBuffer.empty[Triple]
    private val set = mutable.HashSet.empty[Triple]
    private val subjects = mutable.HashSet.empty[String]

    def addTriple(t: Triple): Unit =
      if (!set.contains(t)) { set += t; order += t; subjects += t.s }

    /** rdflib `(subj, None, None) in graph` */
    def hasSubject(s: String): Boolean = subjects.contains(s)

    def triples: Vector[Triple] = order.toVector

    /** Deterministic Turtle: sorted @prefix header (incl. the project base
      * as the empty prefix), then subject-grouped blocks in first-insertion
      * order with predicate-object lines in insertion order.
      */
    def toTurtle: String = {
      val sb = new StringBuilder
      (prefixes.sortBy(_._1) :+ ("" -> base)).foreach { case (p, iri) =>
        sb.append(s"@prefix $p: <$iri> .\n")
      }
      sb.append('\n')
      val bySubject = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[Triple]]
      order.foreach(t => bySubject.getOrElseUpdate(t.s, mutable.ArrayBuffer.empty) += t)
      bySubject.foreach { case (s, ts) =>
        sb.append(s).append('\n')
        ts.foreach(t => sb.append("  ").append(t.p).append(' ').append(t.o).append(" ;\n"))
        sb.append("  .\n\n")
      }
      sb.toString
    }
  }

  // ---- term rendering ----

  private val knownNamespaces: Seq[(String, String)] = dataPrefixes

  /** PN_LOCAL-safe check for prefix compression (conservative subset). */
  private def safeLocal(l: String): Boolean =
    l.nonEmpty && l.forall(c => c.isLetterOrDigit || c == '_' || c == '-' || c == '.')

  /** Full IRI → prefixed name when a bound namespace matches, else <iri>. */
  def iri(full: String, base: String = ""): String = {
    if (base.nonEmpty && full.startsWith(base) && safeLocal(full.substring(base.length)))
      return ":" + full.substring(base.length)
    knownNamespaces.collectFirst {
      case (p, ns) if full.startsWith(ns) && safeLocal(full.substring(ns.length)) =>
        s"$p:${full.substring(ns.length)}"
    }.getOrElse(s"<$full>")
  }

  def lit(v: String): String =
    "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r") + "\""

  def typedLit(v: String, datatype: String): String = s"${lit(v)}^^$datatype"

  /** Language-tagged literal `"text"@lang` — a LangStr ALWAYS serializes
    * with its tag, even when the text is URL-shaped (rdf_serializer.py:
    * 292-299: the LangStr branch never reaches the URIRef promotion).
    */
  def langLit(v: String, lang: String): String =
    if (lang == null || lang.isEmpty) lit(v) else s"${lit(v)}@$lang"

  /** The reference's polymorphic `add` (rdf_serializer.py:291-310): falsy
    * objects are SKIPPED (None, "", 0 — a quirk we preserve: `changes=0`
    * emits no triple); plain strings that are valid http(s) URLs become
    * resources, everything else a literal.
    */
  private def addStr(g: TripleGraph, s: String, p: String, v: Option[String],
      datatype: Option[String] = None): Unit =
    v.filter(_.nonEmpty).foreach { x =>
      val o =
        if (datatype.isDefined) typedLit(x, datatype.get)
        else if (x.startsWith("http") && UrlCanonHook.isValidUrl(x)) iri(x, g.base)
        else lit(x)
      g.addTriple(Triple(s, p, o))
    }

  private def addRes(g: TripleGraph, s: String, p: String, o: String): Unit =
    g.addTriple(Triple(s, p, o))

  private def addInt(g: TripleGraph, s: String, p: String, v: Long): Unit =
    if (v != 0L) g.addTriple(Triple(s, p, v.toString)) // 0 is falsy (py quirk)

  private def addFloat(g: TripleGraph, s: String, p: String, v: Option[Double]): Unit =
    v.filter(_ != 0.0).foreach(x =>
      g.addTriple(Triple(s, p, typedLit(x.toString, "xsd:float"))))

  private def addDate(g: TripleGraph, s: String, p: String, v: Option[String]): Unit =
    v.filter(_.nonEmpty).foreach(x =>
      g.addTriple(Triple(s, p, typedLit(x, "xsd:dateTime"))))

  /** Indirection so this object stays import-light. */
  private object UrlCanonHook {
    def isValidUrl(u: String): Boolean = graft.model.UrlCanonicalizer.isValidUrl(u)
  }

  // ---- project namespace (rdf_serializer.py:207-235) ----

  /** path → single path part: strip leading '/', '/' → '__'. */
  def asSinglePathPart(raw: String): String =
    (if (raw.startsWith("/")) raw.substring(1) else raw).replace("/", "__")

  /** Namespace base from (repo, version): scheme://host/<version>/<path__>/ */
  def projectNamespace(repo: String, version: Option[String]): String = {
    val (scheme, host, path) =
      graft.model.UrlCanonicalizer.parseUrl(repo) match {
        case Some(u) if u.host != null =>
          (Option(u.scheme).getOrElse("https"), u.host, u.parts.mkString("/"))
        case _ => ("https", "unknown.invalid", repo.replaceAll("[^A-Za-z0-9_/.-]", "_"))
      }
    val single = asSinglePathPart(path)
    val p = version match {
      case Some(v) if v.nonEmpty => s"${v.replace(" ", "_")}/$single/"
      case _ => s"$single/"
    }
    s"$scheme://$host/$p"
  }

  // ---- OTRL/ODRL IRIs (rdf_serializer.py:237-250) ----

  def otrlIri(v: String): String = (OTRL + v).replace("OTRL-", "OTRL")
  def odrlIri(v: String): String =
    (OTRL + v).replace("ODRL-", "ODRL").replace("*", "Star") // ODRL lives in OTRL too

  // ---- data provider / sourcing procedure (rdf_serializer.py:96-115,134-148) ----

  def dataProvider(hostingId: String): Option[String] = hostingId match {
    case "appropedia.org" => Some("okhkrawl:dataProviderAppropedia")
    case "codeberg.org" => Some("okhkrawl:dataProviderCodeberg")
    case "github.com" => Some("okhkrawl:dataProviderGithub")
    case "gitlab.com" => Some("okhkrawl:dataProviderGitlab")
    case "oshwa.org" => Some("okhkrawl:dataProviderOshwa")
    case "thingiverse.com" => Some("okhkrawl:dataProviderThingiverse")
    case _ => None
  }

  def sourcingProcedureIri(p: String): String = p match {
    case "api" => "okhkrawl:dataSourcingProcedureApi"
    case "manifest" => "okhkrawl:dataSourcingProcedureManifest"
    case "generated-manifest" => "okhkrawl:dataSourcingProcedureGeneratedManifest"
    case _ => "okhkrawl:dataSourcingProcedureDirect"
  }

  // ---- licenses (rdf_serializer.py:573-594) ----

  /** SPDX-id check (model/licenses.py `is_spdx_id` analogue): exact
    * membership in the shipped license dimension (the same asset
    * `LicenseDim` loads — covers digit-less ids like Unlicense/WTFPL),
    * falling back to the id-shaped-token heuristic for SPDX ids outside
    * the curated subset.
    */
  private lazy val knownSpdxIds: Set[String] = {
    def idsOf(resource: String): Set[String] =
      Option(getClass.getResourceAsStream(resource)).map { in =>
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        graft.tables.Json.parse(txt) match {
          case o: graft.tables.Json.JObj =>
            o.arr("licenses").collect {
              case lic: graft.tables.Json.JObj => lic.str("licenseId")
            }.toSet
          case _ => Set.empty[String]
        }
      }.getOrElse(Set.empty)
    idsOf("/graft/assets/spdx-licenses.json") ++
      idsOf("/graft/assets/spdx-licenses-extra.json")
  }

  /** Digit-less SPDX ids outside the curated dimension (the heuristic
    * below requires a digit, which these real ids lack).
    */
  private val digitlessSpdxIds = Set(
    "NTP", "Xnet", "ICU", "OML", "Ruby", "curl", "Fair", "Vim", "TCL",
    "X11", "Zed", "Zlib", "ISC", "MIT", "JSON", "Libpng", "OpenSSL",
    "PostgreSQL", "Python", "Unlicense", "WTFPL", "Xerox", "libtiff")

  def isSpdxId(id: String): Boolean =
    knownSpdxIds.contains(id) || digitlessSpdxIds.contains(id) ||
      (id.nonEmpty && !id.startsWith("LicenseRef-") &&
        id.forall(c => c.isLetterOrDigit || c == '.' || c == '-' || c == '+') &&
        id.exists(_.isDigit))

  private def addLicenseAndLicensor(g: TripleGraph, storeAgents: Boolean,
      subj: String, licenseSpdx: Option[String], licensors: Seq[AgentRow],
      organizations: Seq[AgentRow]): Unit = {
    licenseSpdx.filter(_.nonEmpty).foreach { id =>
      if (id == "LicenseRef-NONE" || id == "LicenseRef-NOASSERTION")
        addRes(g, subj, "ods:license", "okhkrawl:NoAssertionLicense")
      else if (id == "LicenseRef-AllRightsReserved")
        addRes(g, subj, "ods:license", "okhkrawl:AllRightsReservedLicense")
      else if (isSpdxId(id) && safeLocal(id))
        addRes(g, subj, "ods:license", s"spdxl:$id")
      else
        addStr(g, subj, "ods:licenseExpression", Some(id))
    }
    licensors.zipWithIndex.foreach { case (a, i) =>
      val node = createAgent(g, s"licensor$i", a, storeAgents)
      addRes(g, subj, "ods:licensor", node)
    }
    organizations.zipWithIndex.foreach { case (o, i) =>
      val node = createOrganization(g, s"organization$i", o, storeAgents)
      addRes(g, subj, "okh:organization", node)
    }
  }

  // ---- agents (rdf_serializer.py:489-558) ----

  private def createPerson(g: TripleGraph, rdfName: String, a: AgentRow,
      store: Boolean): String = a.iri match {
    case Some(ref) => s"<$ref>"
    case None =>
      val subj = s":$rdfName"
      if (store && !g.hasSubject(subj)) {
        addRes(g, subj, "a", "schema:Person")
        addStr(g, subj, "schema:name", a.name)
        addStr(g, subj, "schema:email", a.email)
        addStr(g, subj, "schema:url", a.url)
        addRes(g, subj, "a", "foaf:Person")
        addStr(g, subj, "foaf:name", a.name)
        addStr(g, subj, "foaf:mbox", a.email)
        addStr(g, subj, "foaf:weblog", a.url)
        addRes(g, subj, "a", "dcterms:Agent")
      }
      subj
  }

  private def createOrganization(g: TripleGraph, rdfName: String, a: AgentRow,
      store: Boolean): String = a.iri match {
    case Some(ref) => s"<$ref>"
    case None =>
      val subj = s":$rdfName"
      if (store && !g.hasSubject(subj)) {
        addRes(g, subj, "a", "schema:Organization")
        addStr(g, subj, "schema:name", a.name)
        addStr(g, subj, "schema:email", a.email)
        addStr(g, subj, "schema:url", a.url)
        addRes(g, subj, "a", "foaf:Organization")
        addStr(g, subj, "foaf:name", a.name)
        addStr(g, subj, "foaf:mbox", a.email)
        addStr(g, subj, "foaf:weblog", a.url)
        addRes(g, subj, "a", "dcterms:Agent")
      }
      subj
  }

  private def createAgent(g: TripleGraph, rdfName: String, a: AgentRow,
      store: Boolean): String =
    if (a.is_organization) createOrganization(g, rdfName, a, store)
    else createPerson(g, rdfName, a, store)

  // ---- files (rdf_serializer.py:312-328, 699-759) ----

  private def addFileLink(g: TripleGraph, subj: String, f: FileRef): Unit = {
    addStr(g, subj, "ods:relativePath", f.path)
    addStr(g, subj, "ods:url", f.url)
    f.evaluateMimeType.foreach(mt => addRes(g, subj, "ods:fileFormat", s"mime:$mt"))
  }

  /** rdf_serializer.py:761-779: image slots/tags/depicts. */
  private def imageExtras(g: TripleGraph, subj: String, img: ImageRef): Unit = {
    img.slots.foreach(s =>
      addRes(g, subj, "okh:fillsSlot", s"okhimg:slot${upperCamelCase(s)}"))
    img.tags.foreach(t =>
      addRes(g, subj, "okh:hasTag", s"okhimg:tag${upperCamelCase(t)}"))
    img.depicts.foreach(d =>
      if (d.text.nonEmpty)
        g.addTriple(Triple(subj, "okh:depicts", langLit(d.text, d.language))))
  }

  private def addFileInfo(g: TripleGraph, f: FileRef, entityName: String,
      parentName: Option[String], rdfType: String,
      extras: Option[ImageRef] = None): String = {
    val subj = s":$entityName"
    if (!g.hasSubject(subj)) {
      addRes(g, subj, "a", rdfType)
      addStr(g, subj, "rdfs:label",
        Some(parentName.fold(entityName)(p => s"$entityName of $p")))
      addFileLink(g, subj, f)
      extras.foreach(img => imageExtras(g, subj, img))
    }
    subj
  }

  /** rdf_serializer.py:736-759 `_add_files`. */
  private def addFiles(g: TripleGraph, parentSubj: String, property: String,
      files: Seq[FileRef], entityName: String, parentName: Option[String],
      rdfType: String = "ods:File", images: Seq[ImageRef] = Seq.empty): Unit = {
    val base = parentName match {
      case Some(p) => s"${decapitalize(p)}${capitalize(entityName)}"
      case None => decapitalize(entityName)
    }
    files.zipWithIndex.foreach { case (f, i) =>
      val extras = images.lift(i)
      val subj = addFileInfo(g, f, individualCase(s"$base${i + 1}"), parentName,
        rdfType, extras)
      addRes(g, parentSubj, property, subj)
    }
  }

  // ---- parts (rdf_serializer.py:335-436) ----

  private def fillPart(g: TripleGraph, project: ProjectModel, partName: String,
      partSubject: String, docLang: Seq[String], material: Option[String],
      mass: Option[Double], dims: Option[OuterDims], tsdc: Option[String],
      thingName: Option[String], source: Seq[FileRef], export: Seq[FileRef],
      auxiliary: Seq[FileRef], image: Seq[ImageRef]): Unit = {
    val langs = if (docLang.nonEmpty) docLang else project.documentation_language
    langs.foreach(l => addStr(g, partSubject, "okh:documentationLanguage", Some(l)))
    addStr(g, partSubject, "okh:material", material)
    addFloat(g, partSubject, "okh:hasMass", mass)
    dims.foreach { d =>
      val dimSubj = s":${individualCase(s"${partName}OuterDimensions")}"
      addRes(g, partSubject, "okh:hasOuterDimensions", dimSubj)
      addRes(g, dimSubj, "a", "okh:Dimensions")
      addStr(g, dimSubj, "rdfs:label",
        Some(s"Outer Dimensions of ${thingName.getOrElse("")}"))
      addFloat(g, dimSubj, "okh:width", d.width)
      addFloat(g, dimSubj, "okh:height", d.height)
      addFloat(g, dimSubj, "okh:depth", d.depth)
    }
    tsdc.filter(_.nonEmpty).foreach(t =>
      addRes(g, partSubject, "okh:tsdc", iri(s"$TSDC$t")))
    addFiles(g, partSubject, "okh:hasSource", source, "SourceFile", Some(partName))
    addFiles(g, partSubject, "okh:hasExport", export, "ExportFile", Some(partName))
    addFiles(g, partSubject, "okh:hasAuxiliary", auxiliary, "AuxiliaryFile", Some(partName))
    addFiles(g, partSubject, "okh:hasImage", image.map(_.toFile), "Image",
      Some(partName), rdfType = "okh:Image", images = image)
  }

  private def addParts(g: TripleGraph, project: ProjectModel): Seq[String] =
    project.part.map { part =>
      val nameClean =
        if (part.name_clean == "project") part.name_clean + "_part" else part.name_clean
      val subj = s":${individualCase(nameClean)}"
      addRes(g, subj, "a", "okh:Part")
      addStr(g, subj, "okh:name", part.name)
      fillPart(g, project, individualCase(nameClean), subj,
        docLang = Seq.empty, part.material, part.mass, part.outer_dimensions,
        part.tsdc, part.name, part.source, part.export, part.auxiliary, part.image)
      subj
    }

  // ---- publications / standards / software (rdf_serializer.py:438-474) ----

  private def createPublication(g: TripleGraph, rdfName: String,
      doiOrUrl: String): String = {
    val subj = s":$rdfName"
    if (!g.hasSubject(subj)) {
      if (ScalarFunctions.isDoi(doiOrUrl)) {
        addStr(g, subj, "okh:doi", Some(doiOrUrl))
        addRes(g, subj, "a", "okh:Publication")
      } else if (ScalarFunctions.isWebUrl(doiOrUrl)) {
        addStr(g, subj, "ods:url", Some(doiOrUrl))
        addRes(g, subj, "a", "okh:Publication")
      } // neither → no triples (reference logs + skips)
    }
    subj
  }

  private def createStandard(g: TripleGraph, rdfName: String, standard: String): String = {
    val subj = s":$rdfName"
    if (!g.hasSubject(subj)) {
      addRes(g, subj, "a", "okh:Standard")
      addStr(g, subj, "okh:standardID", Some(standard))
    }
    subj
  }

  private def createSoftware(g: TripleGraph, rdfName: String, sw: SoftwareRow): String = {
    val subj = s":$rdfName"
    if (!g.hasSubject(subj)) {
      addRes(g, subj, "a", "okh:Software")
      addStr(g, subj, "okh:release", Some(sw.release))
      sw.documentation_language.foreach(l =>
        addStr(g, subj, "okh:documentationLanguage", Some(l)))
      addLicenseAndLicensor(g, storeAgents = true, subj, sw.license_spdx,
        sw.licensor, sw.organization)
    }
    subj
  }

  // ---- data-set / meta graph (rdf_serializer.py:117-203) ----

  private def addDataSet(meta: TripleGraph, project: ProjectModel,
      cm: CrawlMeta): (String, String) = {
    val subj = ":projectDataSet"
    addRes(meta, subj, "a", "ods:Dataset")
    addStr(meta, subj, "rdfs:label", Some("Covers all the data in this namespace"))
    val subjSrc = ":projectDataSetSource"
    addRes(meta, subjSrc, "a", "ods:Source")
    addStr(meta, subjSrc, "rdfs:label", Some("Info related to the source of a data-set"))
    dataProvider(cm.hosting_id).foreach(dp => addRes(meta, subjSrc, "ods:primaryHost", dp))
    addRes(meta, subjSrc, "ods:dataSourcingProcedure",
      sourcingProcedureIri(cm.sourcing_procedure))
    // data-set license/licensor default to the docu (project) license
    // (rdf_serializer.py:150-153 with the Ref indirection resolved)
    addLicenseAndLicensor(meta, storeAgents = false, subj, project.license_spdx,
      project.licensor, project.organization)
    addLicenseAndLicensor(meta, storeAgents = false, subjSrc, project.license_spdx,
      project.licensor, project.organization)
    cm.manifest_url.foreach { mu =>
      // mime type resolved inside addFileLink via evaluateMimeType
      val mf = FileRef(Some("OKH Manifest"), None, Some(mu), None, None)
      if (mf.valid) {
        val mfSubj = addFileInfo(meta, mf, "manifestFile", None, "okh:ManifestFile")
        addRes(meta, subjSrc, "okh:hasManifestFile", mfSubj)
      }
    }
    addDate(meta, subjSrc, "ods:lastVisited", cm.last_visited)
    addDate(meta, subjSrc, "ods:firstVisited", cm.first_visited)
    addDate(meta, subjSrc, "ods:lastSuccessfullyVisited", cm.last_successfully_visited)
    addInt(meta, subjSrc, "ods:visits", cm.visits)
    addDate(meta, subj, "ods:lastChanged", cm.last_detected_change)
    addDate(meta, subj, "ods:created", cm.created_at)
    addInt(meta, subj, "ods:changes", cm.changes) // 0 → no triple (py falsy quirk)
    addStr(meta, subjSrc, "okh:okhv", cm.okhv_fetched)
    addStr(meta, subjSrc, "ods:schemaVersion", cm.okhv_fetched)
    addStr(meta, subjSrc, "okh:hasManifestFile", cm.manifest_url)
    addRes(meta, subj, "ods:hasSource", subjSrc)
    (subj, subjSrc)
  }

  // ---- module / data graph (rdf_serializer.py:620-686) ----

  private def addProject(g: TripleGraph, project: ProjectModel): String = {
    val moduleName = "project"
    val subj = s":$moduleName"
    addRes(g, subj, "a", "okh:Module")
    addStr(g, subj, "okh:name", Some(project.name))
    addStr(g, subj, "ods:source", Some(project.repo))
    addStr(g, subj, "okh:version", project.version)
    addStr(g, subj, "okh:release", project.release)
    addLicenseAndLicensor(g, storeAgents = true, subj, project.license_spdx,
      project.licensor, project.organization)
    project.documentation_language.foreach(l =>
      addStr(g, subj, "okh:documentationLanguage", Some(l)))
    project.drl.foreach(v =>
      addRes(g, subj, "okh:documentationReadinessLevel", iri(odrlIri(v))))
    project.trl.foreach(v =>
      addRes(g, subj, "okh:technologyReadinessLevel", iri(otrlIri(v))))
    addStr(g, subj, "okh:function", project.function)
    addStr(g, subj, "okh:cpcPatentClass", project.cpc_patent_class)
    project.attestation.foreach(a =>
      addStr(g, subj, "okh:attestation", Some(a), datatype = Some("xsd:anyURI")))
    project.tsdc.filter(_.nonEmpty).foreach(t =>
      addRes(g, subj, "okh:tsdc", iri(s"$TSDC$t")))
    project.publication.zipWithIndex.foreach { case (p, i) =>
      // NOTE parity quirk: the reference links hasPublication even when the
      // entry is neither DOI nor URL (the node stays property-less) —
      // rdf_serializer.py:659-661 adds the link unconditionally after
      // _create_publication warned and returned the bare subject
      addRes(g, subj, "okh:hasPublication", createPublication(g, s"publication$i", p))
    }
    project.standard_compliance.zipWithIndex.foreach { case (st, i) =>
      addRes(g, subj, "okh:compliesWith", createStandard(g, s"standard$i", st))
    }
    project.software.zipWithIndex.foreach { case (sw, i) =>
      addRes(g, subj, "okh:hasSoftware", createSoftware(g, s"software$i", sw))
    }
    fillPart(g, project, moduleName, subj, project.documentation_language,
      material = None, project.mass, project.outer_dimensions, project.tsdc,
      Some(project.name), project.source, project.export, project.auxiliary,
      project.image)
    addFiles(g, subj, "okh:hasManufacturingInstructions",
      project.manufacturing_instructions, "ManufacturingInstructions", Some(moduleName))
    subj
  }

  // ---- the three graphs (rdf_serializer.py:806-869 `_make_graph`) ----

  final case class ThreeGraphs(toml: TripleGraph, meta: TripleGraph, data: TripleGraph,
      moduleSubject: String)

  def makeGraphs(project: ProjectModel, cm: CrawlMeta): ThreeGraphs = {
    val base = projectNamespace(project.repo, project.version)
    val tomlG = new TripleGraph(metaPrefixes, base)
    val metaG = new TripleGraph(metaPrefixes, base)
    val dataG = new TripleGraph(dataPrefixes, base)

    val (dataSetSubj, subjSrc) = addDataSet(metaG, project, cm)
    val moduleSubject = addProject(dataG, project)

    project.normalized_toml.filter(_.nonEmpty).foreach { toml =>
      // zlib best-compression + base64 (rdf_serializer.py:827-832; C17)
      addStr(tomlG, moduleSubject, "okh:normalizedManifestContent",
        Some(ScalarFunctions.deflateB64(toml)))
    }
    addRes(metaG, dataSetSubj, "void:rootResource", moduleSubject)
    addRes(dataG, moduleSubject, "ods:hasSource", subjSrc)

    addFiles(dataG, moduleSubject, "okh:hasReadme", project.readme, "readme",
      Some(project.name))
    addFiles(dataG, moduleSubject, "okh:hasBoM", project.bom, "billOfMaterials",
      Some(project.name))
    addFiles(dataG, moduleSubject, "okh:hasUserManual", project.user_manual,
      "userManual", Some(project.name))

    addParts(dataG, project).foreach(p =>
      addRes(dataG, moduleSubject, "okh:hasComponent", p))

    ThreeGraphs(tomlG, metaG, dataG, moduleSubject)
  }

  /** The store_final payload (fetch_result_repository_workdir.py:93-111):
    * three Turtle documents per project.
    */
  final case class RdfDocs(project_id: String, normalized_okh_toml_ttl: String,
      meta_ttl: String, data_okh_ttl: String)

  def serialize(project: ProjectModel, cm: CrawlMeta): RdfDocs = {
    val g = makeGraphs(project, cm)
    RdfDocs(project.project_id, g.toml.toTurtle, g.meta.toTurtle, g.data.toTurtle)
  }

  /** Exploded triple row for the queryable triple table. */
  final case class TripleRow(project_id: String, graph: String, s: String,
      p: String, o: String)

  def tripleRows(project: ProjectModel, cm: CrawlMeta): Seq[TripleRow] = {
    val g = makeGraphs(project, cm)
    g.toml.triples.map(t => TripleRow(project.project_id, "toml", t.s, t.p, t.o)) ++
      g.meta.triples.map(t => TripleRow(project.project_id, "meta", t.s, t.p, t.o)) ++
      g.data.triples.map(t => TripleRow(project.project_id, "data", t.s, t.p, t.o))
  }
}
