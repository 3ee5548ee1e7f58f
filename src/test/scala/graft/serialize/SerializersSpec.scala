package graft.serialize

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.normalize.Normalizers
import graft.tables.Json

class SerializersSpec extends SparkTestBase {
  import spark.implicits._

  test("C22 canonical JSON: sorted keys, 2-indent, trailing newline (ref serializer/util.py:18-37)") {
    val v = Json.obj("b" -> Json.n(2), "a" -> Json.s("x"),
      "c" -> Json.JArr(Vector(Json.n(1), Json.n(2))))
    val out = Serializers.canonicalJson(v)
    assert(out ==
      """{
        |  "a": "x",
        |  "b": 2,
        |  "c": [
        |    1,
        |    2
        |  ]
        |}
        |""".stripMargin)
  }

  test("C23 TOML emit with empty-stripping (ref toml_serializer.py:35-110)") {
    val v = Json.obj(
      "name" -> Json.s("Widget"),
      "empty_str" -> Json.s(""),
      "none" -> Json.JNull,
      "empty_arr" -> Json.JArr(Vector.empty),
      "langs" -> Json.JArr(Vector(Json.s("en"))),
      "dims" -> Json.obj("w" -> Json.n(4), "junk" -> Json.JNull),
      "part" -> Json.JArr(Vector(
        Json.obj("name" -> Json.s("frame")),
        Json.obj("name" -> Json.s("beam")))))
    val toml = Serializers.toToml(v)
    assert(toml.contains("name = \"Widget\""))
    assert(!toml.contains("empty_str") && !toml.contains("none") && !toml.contains("empty_arr"))
    assert(toml.contains("langs = [\"en\"]"))
    assert(toml.contains("[dims]\nw = 4"))
    assert(toml.split("\\[\\[part\\]\\]").length == 3)
    // emitted TOML parses back (round-trip through our own parser)
    val back = graft.formats.Toml.parse(toml)
    assert(back.str("name") == "Widget")
    assert(back.arr("part").length == 2)
  }

  test("C24 triples + turtle from a normalized project (ref rdf_serializer.py:620-686)") {
    val hit =
      """{"id": 77, "name": "Tri Thing", "public_url": "https://www.thingiverse.com/thing:77",
        |"modified": "2020-01-01T00:00:00+00:00", "license": "GNU - GPL",
        |"description": "desc", "creator": {"first_name": "A", "last_name": "B", "public_url": "u"},
        |"zip_data": {"images": [{"name": "i", "url": "https://x/i.jpg", "added": null}],
        |"files": [{"name": "m.stl", "url": "https://x/m.stl", "direct_url": null}]}}"""
        .stripMargin.replace("\n", " ")
    val proj = Normalizers.thingiverse(spark, Seq(hit).toDF("json"))
    val ts = Serializers.triples(proj).collect()
    val subj = "<urn:okh:thingiverse.com/0/77>"
    def has(p: String, o: String) = ts.exists(r =>
      r.getAs[String]("s") == subj && r.getAs[String]("p") == p && r.getAs[String]("o") == o)
    assert(has("a", "okh:Module"))
    assert(has("okh:name", "\"Tri Thing\""))
    assert(has("okh:spdxLicense", "spdxl:GPL-3.0-or-later"))
    assert(has("okh:image", "<https://x/i.jpg>"))
    assert(has("okh:export", "<https://x/m.stl>"))
    assert(has("okh:technologyReadinessLevel", "otrl:OTRL-4"))
    val text = Serializers.turtle(Serializers.projectTriples(proj.collect()(0)))
    assert(text.startsWith("@prefix okh:"))
    assert(text.contains(s"$subj okh:name \"Tri Thing\" ."))
  }

  test("C17+C22 compose: deflate+b64 of canonical TOML round-trips") {
    val toml = Serializers.toToml(Json.obj("name" -> Json.s("X"), "v" -> Json.n(1)))
    val packed = graft.functions.ScalarFunctions.deflateB64(toml)
    assert(graft.functions.ScalarFunctions.inflateB64(packed) == toml)
  }
}
