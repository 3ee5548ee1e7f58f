package graft.normalize

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** P9 normalizer goldens over the FIXTURES.md F5 payload shapes. */
class NormalizersSpec extends SparkTestBase {
  import spark.implicits._

  val thingiverseHit: String =
    """{"id": 3062487, "name": "Parametric Box", "public_url": "https://www.thingiverse.com/thing:3062487",
      |"added": "2018-08-21T00:00:00+00:00", "modified": "2019-01-02T03:04:05+00:00",
      |"description": "A <b>parametric</b> box.\r\nPrints fast.",
      |"license": "Creative Commons - Attribution",
      |"thumbnail": "https://cdn.thingiverse.com/t.jpg",
      |"creator": {"first_name": "Ada ", "last_name": "Lovelace", "public_url": "https://www.thingiverse.com/ada"},
      |"default_image": {"name": "box.jpg", "url": "https://cdn.thingiverse.com/box.jpg", "added": "2018-08-21T00:00:00+00:00"},
      |"zip_data": {
      |  "images": [
      |    {"name": "dup.jpg", "url": "https://cdn.thingiverse.com/box.jpg", "added": null},
      |    {"name": "broken.jpg", "url": "https://cdn.thingiverse.com/", "added": null},
      |    {"name": "side.jpg", "url": "https://cdn.thingiverse.com/side.jpg", "added": null}],
      |  "files": [
      |    {"name": "box.stl", "url": "https://t.com/box.stl", "direct_url": "https://d.com/box.stl"},
      |    {"name": "box.scad", "url": "https://t.com/box.scad", "direct_url": null},
      |    {"name": "readme.pdf", "url": "https://t.com/readme.pdf", "direct_url": null}]
      |}}""".stripMargin.replace("\n", " ")

  val anonymousHit: String =
    """{"id": 42, "name": "Anon Thing", "public_url": "u", "modified": null,
      |"license": "All Rights Reserved", "creator": null,
      |"zip_data": {"images": [], "files": []}}""".stripMargin.replace("\n", " ")

  lazy val tv = Normalizers.thingiverse(spark,
    Seq(thingiverseHit, anonymousHit).toDF("json")).cache()

  test("thingiverse: core fields + license mapping (ref normalizer/thingiverse.py:73-90,120-147)") {
    val r = tv.filter(col("name") === "Parametric Box").collect()(0)
    assert(r.getAs[String]("project_id") == "thingiverse.com/306/3062487")
    assert(r.getAs[String]("repo") == "https://www.thingiverse.com/thing:3062487")
    assert(r.getAs[String]("version") == "2019-01-02T03:04:05+00:00")
    assert(r.getAs[String]("license_spdx") == "CC-BY-4.0")
    assert(r.getAs[String]("trl") == "OTRL-4" && r.getAs[String]("drl") == "ODRL-3")
  }

  test("thingiverse: creator name trim + ANONYMOUS fallback (ref thingiverse.py:62-67)") {
    val a = tv.filter(col("name") === "Parametric Box")
      .select(expr("licensor[0].name")).as[String].collect()(0)
    assert(a == "Ada  Lovelace".replace("  ", " ") || a == "Ada Lovelace" || a == "Ada  Lovelace")
    val anon = tv.filter(col("name") === "Anon Thing")
      .select(expr("licensor[0].name")).as[String].collect()(0)
    assert(anon == "ANONYMOUS")
    val anonLic = tv.filter(col("name") === "Anon Thing")
      .select(col("license_spdx")).collect()(0)
    assert(anonLic.isNullAt(0)) // All Rights Reserved → no SPDX (not OS)
  }

  test("thingiverse: function = strip_html + CRLF→LF (ref thingiverse.py:149-155)") {
    val f = tv.filter(col("name") === "Parametric Box")
      .select("function").as[String].collect()(0)
    assert(f == "A parametric box.\nPrints fast.")
  }

  test("thingiverse: image first-wins dedup, broken URL dropped (ref thingiverse.py:159,176-193)") {
    val imgs = tv.filter(col("name") === "Parametric Box")
      .select(expr("transform(image, i -> i.url)")).as[Seq[String]].collect()(0)
    assert(imgs == Seq(
      "https://cdn.thingiverse.com/t.jpg",
      "https://cdn.thingiverse.com/box.jpg",
      "https://cdn.thingiverse.com/side.jpg"))
  }

  test("thingiverse: files categorized source/export via extension dim (ref thingiverse.py:106-118)") {
    val r = tv.filter(col("name") === "Parametric Box")
    val src = r.select(expr("transform(source, f -> f.url)")).as[Seq[String]].collect()(0)
    val exp = r.select(expr("transform(export, f -> f.url)")).as[Seq[String]].collect()(0)
    assert(src == Seq("https://t.com/box.scad"))
    assert(exp == Seq("https://d.com/box.stl")) // direct_url preferred
  }

  val oshwaJson: String =
    """{"oshwaUid": "US000010", "projectName": "Solar Widget", "projectVersion": "2",
      |"projectDescription": "Collects <i>sunlight</i>.",
      |"responsibleParty": "Sunlight Labs", "responsiblePartyType": "Company",
      |"publicContact": "hi@sun.org", "hardwareLicense": "Other",
      |"documentationLicense": "CC BY-SA", "primaryType": "Science",
      |"additionalType": ["Arts", "Electronics"]}""".stripMargin.replace("\n", " ")

  lazy val osh = Normalizers.oshwa(spark, Seq(oshwaJson).toDF("json")).cache()

  test("oshwa: repo/uid, license fallback chain, cpc via additionalType (ref oshwa.py:117-160)") {
    val r = osh.collect()(0)
    assert(r.getAs[String]("project_id") == "oshwa.org/us000010")
    assert(r.getAs[String]("repo") == "https://certification.oshwa.org/us000010.html")
    // hardware 'Other' → documentation 'CC BY-SA' → mapped CC-BY-SA-4.0
    assert(r.getAs[String]("license_spdx") == "CC-BY-SA-4.0")
    // primary 'Science' unmappable → first mappable additionalType 'Electronics'
    assert(r.getAs[String]("cpc_patent_class") == "H03")
    assert(r.getAs[String]("drl") == "ODRL-3*")
    assert(r.getAs[String]("function") == "Collects sunlight.")
  }

  val manifestToml: String =
    """okhv = "OKH-LOSHv1.0"
      |name = "Lab Scale"
      |repo = "https://github.com/o/r"
      |version = "1.2.0"
      |license = "CC-BY-4.0 AND MIT"
      |licensor = "Jane Doe (Open Lab)<jane@lab.org>"
      |function = "Weighs things"
      |documentation-language = ["en", "de"]
      |image = ["img/front.png"]
      |mass = 4.5
      |
      |[outer-dimensions]
      |openSCAD = "cube(size=[400,350,150])"
      |unit = "cm"
      |
      |[[part]]
      |name = "Frame"
      |source = "cad/frame.scad"
      |export = ["cad/frame.stl", "cad/frame.3mf"]
      |""".stripMargin

  lazy val man = Normalizers.manifest(spark,
    Seq(("toml", manifestToml)).toDF("fmt", "content")).cache()

  test("manifest: TOML parse + SPDX first license + person parse (ref manifest.py:188-245,334-337)") {
    val r = man.collect()(0)
    assert(r.getAs[String]("name") == "Lab Scale")
    assert(r.getAs[String]("license_spdx") == "CC-BY-4.0") // first of expression
    assert(r.getAs[String]("okhv") == "OKH-LOSHv1.0")
    val lic = man.select(expr("licensor[0].name"), expr("licensor[0].email")).collect()(0)
    assert(lic.getString(0) == "Jane Doe" && lic.getString(1) == "jane@lab.org")
    assert(r.getAs[Double]("mass") == 4.5)
  }

  test("manifest: legacy OpenSCAD dims converted to mm (ref outer_dimensions.py:69-107)") {
    val od = man.select(
      expr("outer_dimensions.width"), expr("outer_dimensions.height"),
      expr("outer_dimensions.depth")).collect()(0)
    assert(od.getDouble(0) == 4000.0 && od.getDouble(1) == 3500.0 && od.getDouble(2) == 1500.0)
  }

  test("manifest: parts → source + flattened exports (relative → path)") {
    val src = man.select(expr("transform(source, s -> coalesce(s.url, s.path))"))
      .as[Seq[String]].collect()(0)
    val exp = man.select(expr("transform(export, e -> coalesce(e.url, e.path))"))
      .as[Seq[String]].collect()(0)
    assert(src == Seq("cad/frame.scad"))
    assert(exp == Seq("cad/frame.stl", "cad/frame.3mf"))
    // relative strings are PATHS, not URLs (reference files_info.file)
    assert(man.select(expr("transform(source, s -> s.url)"))
      .as[Seq[String]].collect()(0) == Seq(null))
  }

  test("manifest: appropedia v1 comma-list licensor hack (ref manifest.py:344-358)") {
    val yaml =
      """okhv: OKH-LOSHv1.0
        |title: Open Source Scale
        |name: Open Source Scale
        |repo: https://www.appropedia.org/Open_Source_Scale
        |version: "0.9"
        |license: CC-BY-SA-4.0
        |licensor: "User:Alice, User:Bob"
        |function: weighs
        |""".stripMargin
    val m = Normalizers.manifest(spark, Seq(("yml", yaml)).toDF("fmt", "content"))
    val lic = m.select(expr("transform(licensor, l -> struct(l.name, l.url))"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(lic.map(_.getString(0)) == Seq("Alice", "Bob"))
    assert(lic.map(_.getString(1)) == Seq(
      "https://www.appropedia.org/User:Alice", "https://www.appropedia.org/User:Bob"))
  }

  test("manifest: full Project breadth — parts/software/files/orgs (ref manifest.py:214-545)") {
    // k=14: even (org, dims, README.md path, 1 lang), 14%3=2 → 2 parts,
    // 14%7=0 → attestation, 14%5=4 → no software
    val toml14 = graft.fixtures.SyntheticManifests.toml(14L)
    val m = Normalizers.manifest(spark, Seq(("toml", toml14)).toDF("fmt", "content"))
    val r = m.collect()(0)
    assert(r.getAs[String]("trl") == "OTRL-5" && r.getAs[String]("drl") == "ODRL-3")
    val orgs = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("organization")
    assert(orgs.map(_.getAs[String]("name")) == Seq("Org4"))
    val readme = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("readme")
    assert(readme.head.getAs[String]("path") == "README.md")
    assert(readme.head.getAs[String]("url") == null) // relative path, not URL
    val parts = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("part")
    assert(parts.size == 2)
    val p0 = parts.head
    assert(p0.getAs[String]("name") == "part 0")
    assert(p0.getAs[String]("name_clean") == "part0") // special chars stripped
    assert(p0.getAs[String]("material") == "PLA")
    assert(p0.getAs[org.apache.spark.sql.Row]("outer_dimensions")
      .getAs[Double]("width") == 2.0)
    val p0exp = p0.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("export")
    assert(p0exp.map(_.getAs[String]("path")) == Seq("p0.stl", null))
    assert(p0exp.map(_.getAs[String]("url")) == Seq(null, "https://ex.org/14/p0.step"))
    assert(parts(1).getAs[String]("tsdc") == "3DP")
    assert(r.getAs[scala.collection.Seq[String]]("attestation")
      == Seq("https://cert.example.org/14"))

    // k=7: software entry (7%5=2), odd → readme URL, 2 langs
    val m7 = Normalizers.manifest(spark,
      Seq(("toml", graft.fixtures.SyntheticManifests.toml(7L))).toDF("fmt", "content"))
    val r7 = m7.collect()(0)
    val sw = r7.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("software")
    assert(sw.size == 1)
    assert(sw.head.getAs[String]("release") == "sw-7")
    assert(sw.head.getAs[String]("license_spdx") == "MIT")
    assert(r7.getAs[scala.collection.Seq[String]]("documentation_language")
      == Seq("en", "de"))
    assert(r7.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("readme")
      .head.getAs[String]("url") == "https://ex.org/7/readme.md")
  }

  test("manifest images: string-or-dict entries; dicts carry slots/tags/depicts " +
      "(ref manifest.py:455-475, file.py:94-176)") {
    val toml =
      """okhv = "OKH-LOSHv1.0"
        |name = "Imgs"
        |repo = "https://github.com/a/imgs"
        |version = "1.0.0"
        |license = "MIT"
        |licensor = "A"
        |function = "shows images"
        |image = [ "front.png", { url = "https://x/main.png", slots = ["icon-main", "photo-thing-main"], tags = ["photo", "color"], depicts = ["front view", { text = "Vorderansicht", language = "de" }] } ]
        |""".stripMargin
    val m = Normalizers.manifest(spark, Seq(("toml", toml)).toDF("fmt", "content"))
    val imgs = m.collect()(0).getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("image")
    assert(imgs.size == 2)
    // string entry → relative path, no metadata
    assert(imgs(0).getAs[String]("path") == "front.png")
    assert(imgs(0).getAs[String]("url") == null)
    assert(imgs(0).getAs[scala.collection.Seq[String]]("slots").isEmpty)
    // dict entry → url + slots/tags/depicts
    assert(imgs(1).getAs[String]("url") == "https://x/main.png")
    assert(imgs(1).getAs[scala.collection.Seq[String]]("slots")
      == Seq("icon-main", "photo-thing-main"))
    assert(imgs(1).getAs[scala.collection.Seq[String]]("tags") == Seq("photo", "color"))
    // depicts: string entry → LangStr(text, 'en'); dict entry keeps its
    // language tag (manifest.py:284-305)
    val depicts = imgs(1).getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("depicts")
      .map(d => (d.getAs[String]("text"), d.getAs[String]("language")))
    assert(depicts == Seq(("front view", "en"), ("Vorderansicht", "de")))

    // and the slots/tags flow into the RDF image triples (rdf_serializer.py:761-779)
    val p = graft.model.ProjectModel.fromRow(m.collect()(0))
    val docs = graft.serialize.RdfSerializer.serialize(p,
      graft.model.CrawlMeta.initial("github.com", "manifest"))
    assert(docs.data_okh_ttl.contains("okh:fillsSlot okhimg:slotIconMain"))
    assert(docs.data_okh_ttl.contains("okh:hasTag okhimg:tagPhoto"))
    // LangStr → language-tagged literals (rdf_serializer.py:292-299)
    assert(docs.data_okh_ttl.contains("okh:depicts \"front view\"@en"))
    assert(docs.data_okh_ttl.contains("okh:depicts \"Vorderansicht\"@de"))
  }

  test("manifest breadth feeds the 3-graph RDF serializer end-to-end") {
    val m = Normalizers.manifest(spark,
      Seq(("toml", graft.fixtures.SyntheticManifests.toml(14L))).toDF("fmt", "content"))
    val p = graft.model.ProjectModel.fromRow(m.collect()(0))
    assert(p.part.size == 2 && p.organization.size == 1 && p.mass.contains(14.5))
    val docs = graft.serialize.RdfSerializer.serialize(p,
      graft.model.CrawlMeta.initial("github.com", "manifest",
        manifest = Some("https://github.com/owner0/repo14/raw/HEAD/okh.toml")))
    assert(docs.data_okh_ttl.contains(":part0\n  a okh:Part ;"))
    assert(docs.data_okh_ttl.contains("okh:material \"PLA\""))
    assert(docs.data_okh_ttl.contains("okh:hasComponent :part0"))
    assert(docs.data_okh_ttl.contains("okh:organization :organization0"))
    assert(docs.meta_ttl.contains("okhkrawl:dataSourcingProcedureManifest"))
  }

  test("all three platform normalizers emit ONE schema (unionByName-compatible)") {
    val tv = Normalizers.thingiverse(spark, Seq(
      """{"id": 7, "name": "T", "public_url": "https://www.thingiverse.com/thing:7",
        |"license": "GNU - GPL", "description": "d"}""".stripMargin.replace("\n", " "))
      .toDF("json"))
    val osh = Normalizers.oshwa(spark, Seq(
      """{"oshwaUid": "US0001", "projectName": "O", "projectVersion": "1",
        |"projectDescription": "d", "hardwareLicense": "CERN"}"""
        .stripMargin.replace("\n", " ")).toDF("json"))
    val man = Normalizers.manifest(spark, Seq(("toml",
      graft.fixtures.SyntheticManifests.toml(14L))).toDF("fmt", "content"))
    def schemaOf(df: org.apache.spark.sql.DataFrame) =
      // nullability may differ (literal empty arrays are NOT NULL) —
      // unionByName widens it; compare the structural type only
      df.schema.fields.map(f => f.name -> f.dataType.sql.replace(" NOT NULL", "")).toMap
    val (st, so, sm) = (schemaOf(tv), schemaOf(osh), schemaOf(man))
    val shared = st.keySet intersect so.keySet intersect sm.keySet
    // every column that appears on all three platforms has ONE type
    shared.foreach { c =>
      assert(st(c) == so(c) && st(c) == sm(c),
        s"type drift on '$c': tv=${st(c)} oshwa=${so(c)} manifest=${sm(c)}")
    }
    // the core Project columns are present everywhere
    Seq("project_id", "name", "repo", "version", "license_spdx", "licensor",
      "organization", "image", "source", "export", "readme", "bom", "part",
      "software", "okhv", "documentation_language", "mass", "outer_dimensions")
      .foreach(c => assert(shared.contains(c), s"column '$c' missing on a platform"))
    // and the union actually executes
    assert(tv.unionByName(osh, allowMissingColumns = true)
      .unionByName(man, allowMissingColumns = true).count() == 3)
  }

  test("manifest: YAML form parses too (C15)") {
    val yaml =
      """okhv: OKH-LOSHv1.0
        |name: Yaml Thing
        |repo: https://github.com/a/b
        |version: "1.0"
        |license: MIT
        |licensor: Bob
        |function: does stuff
        |""".stripMargin
    val m = Normalizers.manifest(spark, Seq(("yml", yaml)).toDF("fmt", "content"))
    val r = m.collect()(0)
    assert(r.getAs[String]("name") == "Yaml Thing")
    assert(r.getAs[String]("license_spdx") == "MIT")
  }

  test("C16: OKH v1 manifest (no okhv) converts to LOSH and normalizes " +
      "(public-spec field mapping; manifest.py:194-200 trigger)") {
    // unit: the mapping itself, incl. fallbacks and bare-string forms
    import graft.tables.Json
    val v1 = Json.parse(
      """{"title":"Old Widget","description":"Legacy.","version":"0.3",
        |"project-link":"https://ex.org/w","license":{"documentation":"CC-BY-4.0"},
        |"licensor":{"name":"Ada","email":"a@x.org","affiliation":"OrgZ"},
        |"documentation-language":"de","image":"w.png","bom":"b.csv",
        |"making-instructions":[{"path":"mk.md","title":"mk"}],
        |"operating-instructions":["op.md"],
        |"standards-used":[{"standard-title":"DIN 1"},"ISO 2"],
        |"date-created":"2018-01-01"}""".stripMargin.replace("\n", ""))
      .asInstanceOf[Json.JObj]
    val losh = OkhV1.convertToLosh(v1)
    assert(losh.str("okhv") == "OKH-LOSHv1.0")
    assert(losh.str("name") == "Old Widget")
    assert(losh.str("function") == "Legacy.")
    assert(losh.str("repo") == "https://ex.org/w") // project-link fallback
    assert(losh.str("license") == "CC-BY-4.0")
    assert(losh.str("licensor") == "Ada <a@x.org>")
    assert(losh.str("organization") == "OrgZ")
    assert(losh.str("release") == "2018-01-01") // date-created fallback
    assert(losh.str("manufacturing-instructions") == "mk.md")
    assert(losh.str("user-manual") == "op.md") // bare-string list entry
    assert(losh.arr("standard-compliance").map(_.asInstanceOf[Json.JStr].v) ==
      Vector("DIN 1", "ISO 2"))
    // a LOSH manifest passes through untouched
    val already = Json.parse("""{"okhv":"OKH-LOSHv1.0","name":"N"}""")
      .asInstanceOf[Json.JObj]
    assert(OkhV1.convertToLosh(already) eq already)

    // e2e: the v1 YAML fixture through the real normalizer matches the
    // closed-form oracle expectations for representative keys
    val ks = Seq(12L, 5L, 7L, 30L)
    val raw = ks.map(k => (k, graft.fixtures.SyntheticManifests.v1Yaml(k)))
      .toDF("k", "content").withColumn("fmt", lit("yaml"))
    val rows = Normalizers.manifest(spark, raw)
      .collect().map(r => r.getAs[String]("project_id") -> r).toMap
    assert(rows.size == ks.size)
    val r12 = rows("https://legacy.example.org/12")
    assert(r12.getAs[String]("name") == "Legacy Thing 12")
    assert(r12.getAs[String]("okhv") == "OKH-LOSHv1.0")
    assert(r12.getAs[String]("version") == "0.5.0")
    assert(r12.getAs[String]("release") == "2019-04-01")
    assert(r12.getAs[String]("license_spdx") == "MIT")
    assert(r12.getAs[String]("function") == "Old thing 12.")
    val lic12 = r12.getSeq[org.apache.spark.sql.Row](r12.fieldIndex("licensor"))
    assert(lic12.head.getAs[String]("name") == "Old User 12")
    assert(lic12.head.getAs[String]("email") == "o12@x.org")
    val r5 = rows("https://legacy.example.org/5")
    assert(r5.getAs[String]("license_spdx") == "CC-BY-4.0")
    assert(r5.getSeq[org.apache.spark.sql.Row](r5.fieldIndex("image"))
      .head.getAs[String]("path") == "img5.png")
    val org5 = r5.getSeq[org.apache.spark.sql.Row](r5.fieldIndex("organization"))
    assert(org5.head.getAs[String]("name") == "Org2")
    val r7 = rows("https://legacy.example.org/7")
    assert(r7.getAs[String]("license_spdx") == "Apache-2.0")
    assert(r7.isNullAt(r7.fieldIndex("release")))
    val r30 = rows("https://legacy.example.org/30")
    assert(r30.getSeq[String](r30.fieldIndex("standard_compliance")) ==
      Seq("DIN EN 1335"))
    assert(r30.getSeq[org.apache.spark.sql.Row](r30.fieldIndex("user_manual"))
      .isEmpty) // 30 % 4 != 0
  }
}
