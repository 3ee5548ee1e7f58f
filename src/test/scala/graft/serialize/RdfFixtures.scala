package graft.serialize

import graft.model._

/** Shared maximal serializer fixture (exercises every branch of
  * rdf_serializer.py:75-869) + its golden-generation main.
  *
  * Regenerate the byte-goldens after an INTENDED serializer change with:
  * `sbt "Test/runMain graft.serialize.RdfGoldenGen"` (writes the three
  * .ttl files under src/test/resources/goldens/).
  */
object RdfFixtures {

  def fixtureProject: ProjectModel = ProjectModel.minimal(
    "github.com/o/widget", "Widget One", "https://github.com/o/widget").copy(
    version = Some("1.2.0"),
    release = Some("https://github.com/o/widget/releases/tag/v1.2.0"),
    license_spdx = Some("GPL-3.0-or-later"),
    licensor = Seq(AgentRow(Some("Ada L"), Some("ada@x.org"), None, None, false)),
    organization = Seq(AgentRow(Some("Widget Org"), None,
      Some("https://widgets.example.org"), None, true)),
    readme = Seq(FileRef.url("https://github.com/o/widget/raw/HEAD/README.md")),
    image = Seq(ImageRef(Some("front"), None, Some("https://x/front.png"), None,
      None, slots = Seq("icon-main"), tags = Seq("photo", "color"),
      depicts = Seq(LangStr("the widget from the front", "en")))),
    documentation_language = Seq("en", "de"),
    trl = Some("OTRL-4"), drl = Some("ODRL-3*"),
    attestation = Seq("https://certifier.example.org/widget"),
    publication = Seq("10.1000/xyz123", "https://journal.example.org/widget"),
    function = Some("Widgets things."),
    standard_compliance = Seq("DIN EN 1335"),
    cpc_patent_class = Some("B25J9/00"),
    tsdc = Some("MEC"),
    bom = Seq(FileRef.url("https://github.com/o/widget/raw/HEAD/bom.csv")),
    manufacturing_instructions = Seq(FileRef.url("https://x/build.md")),
    user_manual = Seq(FileRef.url("https://x/manual.pdf")),
    mass = Some(1.2),
    outer_dimensions = Some(OuterDims(Some(40.0), Some(20.0), Some(10.0))),
    part = Seq(PartRow("frame", Some("frame"),
      image = Seq(ImageRef(None, None, Some("https://x/frame.jpg"), None, None,
        Seq.empty, Seq("photo"), Seq.empty)),
      source = Seq(FileRef.url("https://x/frame.scad")),
      export = Seq(FileRef.url("https://x/frame.stl")),
      auxiliary = Seq.empty, material = Some("PLA"),
      manufacturing_instructions = Seq.empty, mass = Some(0.3),
      outer_dimensions = Some(OuterDims(Some(10.0), Some(10.0), Some(2.0))),
      tsdc = Some("3DP"))),
    software = Seq(SoftwareRow("v2.1", None, Seq("en"), Some("MIT"),
      Seq(AgentRow(Some("Ada L"), None, None, None, false)), Seq.empty)),
    source = Seq(FileRef.url("https://x/main.scad")),
    export = Seq(FileRef.url("https://x/main.stl")))

  /** The reference chain sets normalized_toml AFTER TOML serialization of
    * the project itself (factory.py:49-59) — the fixture mirrors that.
    */
  def fixtureWithToml: ProjectModel = {
    val p = fixtureProject
    p.copy(normalized_toml = Some(Serializers.projectToToml(p)))
  }

  def fixtureMeta: CrawlMeta = CrawlMeta(
    hosting_id = "github.com", sourcing_procedure = "manifest",
    manifest_url = Some("https://github.com/o/widget/raw/HEAD/okh.toml"),
    okhv_fetched = Some("OKH-LOSHv1.0"),
    created_at = Some("2020-01-01T00:00:00"),
    first_visited = Some("2021-01-01T00:00:00"),
    last_visited = Some("2021-03-01T00:00:00"),
    last_successfully_visited = Some("2021-03-01T00:00:00"),
    last_detected_change = Some("2021-02-01T00:00:00"),
    visits = 3L, changes = 1L)

  def goldenDocs: RdfSerializer.RdfDocs =
    RdfSerializer.serialize(fixtureWithToml, fixtureMeta)

  def goldenToml: String = Serializers.projectToToml(fixtureProject)
}

object RdfGoldenGen {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get("src/test/resources/goldens")
    java.nio.file.Files.createDirectories(dir)
    val docs = RdfFixtures.goldenDocs
    def write(name: String, content: String): Unit =
      java.nio.file.Files.writeString(dir.resolve(name), content)
    write("widget.normalized.okh_toml.ttl", docs.normalized_okh_toml_ttl)
    write("widget.meta.ttl", docs.meta_ttl)
    write("widget.data.okh.ttl", docs.data_okh_ttl)
    write("widget.normalized.toml", RdfFixtures.goldenToml)
    println(s"goldens written to $dir")
  }
}
