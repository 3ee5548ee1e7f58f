package graft.formats

import org.scalatest.funsuite.AnyFunSuite
import graft.tables.Json

/** Fixture-scope parser tests (FIXTURES.md F5 manifest shapes). */
class FormatsSpec extends AnyFunSuite {

  val okhToml: String =
    """# OKH LOSH manifest (fixture, shapes per normalizer/manifest.py:214-245)
      |okhv = "OKH-LOSHv1.0"
      |name = "Lab Scale"
      |repo = "https://github.com/o/r"
      |version = "1.2.0"
      |license = "CC-BY-4.0 AND MIT"
      |licensor = "Jane Doe (Open Lab) <jane@lab.org>"
      |function = "Weighs things <b>accurately</b>"
      |documentation-language = ["en", "de"]
      |image = ["img/front.png", "img/side.png"]
      |mass = 4.5
      |attestation = []
      |
      |[outer-dimensions]
      |openSCAD = "cube(size=[400,350,150])"
      |unit = "mm"
      |
      |[[part]]
      |name = "Frame"
      |source = "cad/frame.scad"
      |export = ["cad/frame.stl"]
      |
      |[[part]]
      |name = "Frame"
      |source = "cad/frame2.scad"
      |""".stripMargin

  test("TOML: OKH manifest parses with sections, array tables, arrays, floats") {
    val j = Toml.parse(okhToml)
    assert(j.str("name") == "Lab Scale")
    assert(j.str("license") == "CC-BY-4.0 AND MIT")
    assert(j.arr("documentation-language").map(_.asInstanceOf[Json.JStr].v) == Vector("en", "de"))
    assert(j("mass").asInstanceOf[Json.JNum].toDouble == 4.5)
    assert(j.arr("attestation").isEmpty)
    val od = j("outer-dimensions").asInstanceOf[Json.JObj]
    assert(od.str("openSCAD") == "cube(size=[400,350,150])")
    val parts = j.arr("part").map(_.asInstanceOf[Json.JObj])
    assert(parts.length == 2)
    assert(parts(0).str("name") == "Frame")
    assert(parts(0).arr("export").map(_.asInstanceOf[Json.JStr].v) == Vector("cad/frame.stl"))
  }

  test("TOML: inline tables, comments, quoted keys, escapes") {
    val j = Toml.parse(
      """a = { x = 1, y = "two" } # trailing comment
        |"quoted key" = 'literal'
        |esc = "line\nbreak A"
        |neg = -7
        |""".stripMargin)
    val a = j("a").asInstanceOf[Json.JObj]
    assert(a.long("x") == 1 && a.str("y") == "two")
    assert(j.str("quoted key") == "literal")
    assert(j.str("esc") == "line\nbreak A")
    assert(j.long("neg") == -7)
  }

  val okhV1Yaml: String =
    """# OKH v1 manifest (Appropedia generated shape)
      |title: Open Source Scale
      |repo: https://www.appropedia.org/Open_Source_Scale
      |version: "0.9"
      |license:
      |  hardware: CERN-OHL-S-2.0
      |  documentation: CC-BY-SA-4.0
      |licensor: "User:X, User:Y"
      |keywords:
      |  - scale
      |  - measurement
      |sub-parts:
      |  - name: platform
      |    source: platform.scad
      |  - name: beam
      |    source: beam.scad
      |development-stage: prototype
      |made-independently: true
      |""".stripMargin

  test("YAML: OKH v1 manifest parses with nested maps, lists, list-of-maps") {
    val j = Yaml.parse(okhV1Yaml).asInstanceOf[Json.JObj]
    assert(j.str("title") == "Open Source Scale")
    assert(j.str("version") == "0.9")
    assert(j("license").asInstanceOf[Json.JObj].str("hardware") == "CERN-OHL-S-2.0")
    assert(j.str("licensor") == "User:X, User:Y")
    assert(j.arr("keywords").map(_.asInstanceOf[Json.JStr].v) == Vector("scale", "measurement"))
    val parts = j.arr("sub-parts").map(_.asInstanceOf[Json.JObj])
    assert(parts.map(_.str("name")) == Vector("platform", "beam"))
    assert(j("made-independently") == Json.JBool(true))
  }

  test("YAML: scalars, inline lists, nulls") {
    val j = Yaml.parse(
      """a: [1, 2, 3]
        |b: ~
        |c: 3.25
        |d: 'single quoted: with colon'
        |""".stripMargin).asInstanceOf[Json.JObj]
    assert(j.arr("a").map(_.asInstanceOf[Json.JNum].toLong) == Vector(1L, 2L, 3L))
    assert(j("b") == Json.JNull)
    assert(j("c").asInstanceOf[Json.JNum].toDouble == 3.25)
    assert(j.str("d") == "single quoted: with colon")
  }

  test("TOML/YAML → JSON string is consumable by the JSON codec (from_json boundary)") {
    val round = Json.parse(Toml.toJsonString(okhToml)).asInstanceOf[Json.JObj]
    assert(round.str("name") == "Lab Scale")
    val roundY = Json.parse(Yaml.toJsonString(okhV1Yaml)).asInstanceOf[Json.JObj]
    assert(roundY.str("title") == "Open Source Scale")
  }
}
