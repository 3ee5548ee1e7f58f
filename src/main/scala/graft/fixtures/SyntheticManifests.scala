package graft.fixtures

/** Deterministic full-breadth OKH manifest TOML per key — the fixture input
  * for the widened manifest normalizer (every Project field from
  * /root/reference/krawl/model/project.py:21-69 appears for some residue
  * class). Pure function of `k`, so the DuckDB oracle can compute the
  * expected normalized projection with closed-form CASE arithmetic on the
  * same key without ever parsing TOML.
  */
object SyntheticManifests {

  /** The k%4 license expressions (shared shape with q_spdx_split). */
  def licenseExpr(k: Long): String = (k % 4) match {
    case 0 => "MIT"
    case 1 => "MIT AND CC-BY-4.0"
    case 2 => "GPL-3.0-or-later OR MIT"
    case _ => "GPL-2.0-only WITH Classpath-exception-2.0" // splits to [] (C12 quirk)
  }

  def toml(k: Long): String = {
    val sb = new StringBuilder
    def line(s: String): Unit = { sb.append(s); sb.append('\n') }
    line("okhv = \"OKH-LOSHv1.0\"")
    line(s"""name = "Thing $k"""")
    line(s"""repo = "https://github.com/owner${k % 7}/repo$k"""")
    line(s"""version = "1.${k % 10}.${k % 5}"""")
    if (k % 3 == 0) line(s"""release = "v1.${k % 10}"""")
    line(s"""license = "${licenseExpr(k)}"""")
    line(s"""licensor = "User $k <u$k@x.org>"""")
    if (k % 2 == 0) line(s"""organization = "Org${k % 5}"""")
    line(s"""function = "Does thing $k."""")
    if (k % 2 == 0) line("""documentation-language = ["en"]""")
    else line("""documentation-language = ["en", "de"]""")
    line(s"""technology-readiness-level = "OTRL-${k % 5 + 1}"""")
    line(s"""documentation-readiness-level = "ODRL-${k % 4 + 1}"""")
    if (k % 5 == 0) line("""cpc-patent-class = "B25J9/00"""")
    if (k % 3 == 1) line("""tsdc = "MEC"""")
    if (k % 2 == 0) line("""readme = "README.md"""")
    else line(s"""readme = "https://ex.org/$k/readme.md"""")
    line("""bom = "bom.csv"""")
    if (k % 4 == 0) line("""user-manual = "manual.pdf"""")
    if (k % 4 == 1) line("""manufacturing-instructions = "build.md"""")
    if (k % 7 == 0) line(s"""attestation = ["https://cert.example.org/$k"]""")
    if (k % 6 == 0) line(s"""publication = ["10.1000/j$k"]""")
    if (k % 8 == 0) line("""standard-compliance = ["DIN EN 1335"]""")
    line(s"mass = ${k % 100}.5")
    if (k % 2 == 0) {
      line("")
      line("[outer-dimensions]")
      line(s"width = ${k % 50 + 1}.0")
      line(s"height = ${k % 30 + 1}.0")
      line(s"depth = ${k % 20 + 1}.0")
    }
    val nParts = (k % 3).toInt
    (0 until nParts).foreach { i =>
      line("")
      line("[[part]]")
      line(s"""name = "part $i"""")
      line(s"""source = "p$i.scad"""")
      line(s"""export = ["p$i.stl", "https://ex.org/$k/p$i.step"]""")
      if (i == 0) {
        line("""material = "PLA"""")
        line(s"outer-dimensions = { width = ${i + 2}.0, height = ${i + 3}.0, depth = ${i + 4}.0 }")
      }
      if (i == 1) line("""tsdc = "3DP"""")
      line(s"mass = $i.25")
    }
    if (k % 5 == 2) {
      line("")
      line("[[software]]")
      line(s"""release = "sw-${k % 9}"""")
      line("""license = "MIT"""")
      line(s"""licensor = "User $k"""")
      line("""documentation-language = ["en"]""")
    }
    sb.toString
  }

  /** OKH v1 YAML manifest per key (C16 fixture): no `okhv` key — the
    * v1-detection trigger — with fields per the public v1 spec, pure
    * function of `k` so the DuckDB oracle computes the converted LOSH
    * projection in closed form (mapping: `normalize/OkhV1`).
    */
  def v1Yaml(k: Long): String = {
    val sb = new StringBuilder
    def line(s: String): Unit = { sb.append(s); sb.append('\n') }
    line(s"title: Legacy Thing $k")
    line(s"description: Old thing $k.")
    line(s"version: 0.${k % 7}.${k % 3}")
    line(s"documentation-home: https://legacy.example.org/$k")
    if (k % 3 == 0) line(s"date-updated: 2019-0${k % 9 + 1}-01")
    line("license:")
    (k % 4) match {
      case 0 => line("  hardware: MIT")
      case 1 => line("  documentation: CC-BY-4.0")
      case 2 => line("  software: GPL-3.0-or-later")
      case _ => line("  hardware: Apache-2.0")
    }
    line("licensor:")
    line(s"  name: Old User $k")
    if (k % 2 == 0) line(s"  email: o$k@x.org")
    if (k % 5 == 0) line(s"  affiliation: Org${k % 3}")
    line("documentation-language: en")
    if (k % 2 == 1) line(s"image: img$k.png")
    line("bom: bom.csv")
    line("making-instructions:")
    line("  - path: build.md")
    line("    title: Build")
    if (k % 4 == 0) {
      line("operating-instructions:")
      line("  - path: manual.pdf")
    }
    if (k % 6 == 0) {
      line("standards-used:")
      line("  - standard-title: DIN EN 1335")
    }
    sb.toString
  }
}
