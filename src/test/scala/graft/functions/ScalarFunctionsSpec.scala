package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ScalarFunctions => F}

class ScalarFunctionsSpec extends AnyFunSuite {

  test("C5 slugify (ref util.py:31-45)") {
    assert(F.slugify("Hello World") == "hello-world")
    assert(F.slugify("  Héllo -- Wörld!  ") == "héllo-wörld")
    assert(F.slugify("a_b c") == "a_b-c")
    assert(F.slugify("--x--") == "x")
  }

  test("C9 datetime parse incl. sentinel (ref dict_utils.py:68-86)") {
    assert(F.strToEpochMicros("2023-04-05T06:07:08+00:00").contains(1680674828000000L))
    assert(F.strToEpochMicros("2023-04-05T06:07:08+02:00").contains(1680667628000000L))
    // reference sentinel -001-11-30 → 1971-01-01
    assert(F.strToEpochMicros("-001-11-30T00:00:00+00:00").contains(31536000000000L))
    // naive ISO treated as UTC
    assert(F.strToEpochMicros("2023-04-05T06:07:08").contains(1680674828000000L))
    assert(F.strToEpochMicros("not a date").isEmpty)
  }

  test("C11 OpenSCAD dims: cube, cylinder, units (ref outer_dimensions.py:69-107)") {
    assert(F.openScadDims("cube(size=[400,350,150])", "mm")
      .contains(F.DimsMm(400, 350, 150)))
    assert(F.openScadDims("cube(size = [40, 35, 15])", "cm")
      .contains(F.DimsMm(400, 350, 150)))
    assert(F.openScadDims("cylinder(h=10,r=2.5)", "m")
      .contains(F.DimsMm(2500, 10000, 2500)))
    assert(F.openScadDims("sphere(r=3)", "mm").isEmpty)
    assert(F.openScadDims("cube(size=[1,2,3])", "furlong").isEmpty)
  }

  test("C12 SPDX split incl. the reference's WITH quirk (ref licenses.py:229-256)") {
    assert(F.spdxSplit("MIT") == Seq("MIT"))
    assert(F.spdxSplit("MIT AND CC-BY-4.0 OR GPL-3.0-or-later") ==
      Seq("MIT", "CC-BY-4.0", "GPL-3.0-or-later"))
    // WITH leaves last_license set in the reference → next token = error
    assert(F.spdxSplit("GPL-2.0-only WITH Classpath-exception-2.0").isEmpty)
    assert(F.spdxSplit("MIT CC0-1.0").isEmpty) // two licenses w/o connector
    assert(F.spdxSplit("").isEmpty)
  }

  test("C21 person parse (ref manifest.py:41,366-381; regex quirks verified vs Python)") {
    assert(F.parsePerson("Jane Doe") == F.PersonParts("Jane Doe", null, null))
    assert(F.parsePerson("Jane Doe <j@x.org>") == F.PersonParts("Jane Doe", null, "j@x.org"))
    // reference regex: a space between (org) and <email> stops the match —
    // email is dropped (verified against Python re on the reference pattern)
    assert(F.parsePerson("Jane Doe (Open Lab) <j@x.org>") ==
      F.PersonParts("Jane Doe", "Open Lab", null))
    assert(F.parsePerson("Jane Doe (Open Lab)<j@x.org>") ==
      F.PersonParts("Jane Doe", "Open Lab", "j@x.org"))
  }

  test("C17 deflate+base64 roundtrip (ref rdf_serializer.py:827-832)") {
    val s = "name = \"Lab Scale\"\n" * 20
    val packed = F.deflateB64(s)
    assert(packed.length < s.length) // level-9 deflate compresses repetition
    assert(F.inflateB64(packed) == s)
  }

  test("C4 url encode/decode (ref util.py:75-80)") {
    assert(F.urlEncode("a b/ü") == "a+b%2F%C3%BC")
    assert(F.urlDecode("a+b%2F%C3%BC") == "a b/ü")
  }

  test("C19 validation regexes (ref validator/__init__.py:16-26)") {
    assert("1.2.3".matches(F.SemverPattern))
    assert("1.2.3-rc.1+b42".matches(F.SemverPattern))
    assert(!"1.2".matches(F.SemverPattern))
    assert("a" * 40 == "a" * 40 && "0123456789abcdef0123456789abcdef01234567".matches(F.Sha1Pattern))
    assert("en".matches(F.Bcp47Pattern) && "pt-BR".matches(F.Bcp47Pattern))
    assert(!"e".matches(F.Bcp47Pattern))
  }
}
