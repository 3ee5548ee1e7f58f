package graft.model

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class RobotsSpec extends SparkTestBase {
  import spark.implicits._

  private val txt =
    """# robots for example.org
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/public-note.html
      |Disallow: /tmp/*
      |Disallow: /*.pdf$
      |Crawl-delay: 2
      |
      |User-agent: okh-krawler
      |Disallow: /krawler-trap/
      |Crawl-delay: 5
      |
      |User-agent: other-bot
      |Disallow: /
      |""".stripMargin

  test("group selection: longest agent prefix wins over '*' (RFC 9309 §2.2.1)") {
    val p = Robots.parse(txt, "okh-krawler/2.0")
    // the specific group applies, NOT the '*' group
    assert(!Robots.isAllowed(p, "/krawler-trap/x"))
    assert(Robots.isAllowed(p, "/private/secret.html")) // '*' rules not merged
    assert(p.crawlDelayMs.contains(5000L))
    // an unrelated agent falls back to '*'
    val g = Robots.parse(txt, "somebody-else")
    assert(!Robots.isAllowed(g, "/private/secret.html"))
    assert(g.crawlDelayMs.contains(2000L))
  }

  test("longest-match rules; Allow wins ties; wildcards + '$' anchor (§2.2.2-3)") {
    val p = Robots.parse(txt, "generic")
    assert(!Robots.isAllowed(p, "/private/secret.html"))
    // the longer Allow overrides the shorter Disallow
    assert(Robots.isAllowed(p, "/private/public-note.html"))
    assert(!Robots.isAllowed(p, "/tmp/anything/here"))
    // '$' anchors: .pdf blocked only at end-of-path
    assert(!Robots.isAllowed(p, "/docs/manual.pdf"))
    assert(Robots.isAllowed(p, "/docs/manual.pdf.html"))
    // unmatched paths are allowed
    assert(Robots.isAllowed(p, "/okay/page"))
    // empty Disallow = allow all; empty/blank robots = allow all
    assert(Robots.isAllowed(Robots.parse("User-agent: *\nDisallow:\n", "x"), "/a"))
    assert(Robots.isAllowed(Robots.parse("", "x"), "/a"))
  }

  test("tie between Allow and Disallow of equal specificity → Allow (§2.2.2)") {
    val p = Robots.parse(
      "User-agent: *\nAllow: /page\nDisallow: /page\n", "x")
    assert(Robots.isAllowed(p, "/page"))
  }

  test("allowedCol: per-host broadcast predicate gates the frontier (R5)") {
    val robots = Map(
      "thingiverse.com" -> "User-agent: *\nDisallow: /thing:13\n",
      "oshwa.org" -> "User-agent: *\nDisallow: /\n")
    val frontier = Seq(
      ("thingiverse.com", "/thing:12"),
      ("thingiverse.com", "/thing:13"),
      ("oshwa.org", "/us000042"),
      ("appropedia.org", "/Project_X") // no robots.txt known → allowed
    ).toDF("host", "path")
    val kept = frontier
      .filter(Robots.allowedCol(spark, robots, col("host"), col("path")))
      .as[(String, String)].collect().toSet
    assert(kept == Set(
      ("thingiverse.com", "/thing:12"), ("appropedia.org", "/Project_X")))
  }

  test("Crawl-delay folds into the politeness interval") {
    val p = Robots.parse(txt, "okh-krawler")
    assert(Robots.effectiveIntervalMs(1000L, p) == 5000L) // robots wins
    assert(Robots.effectiveIntervalMs(10000L, p) == 10000L) // platform wins
    assert(Robots.effectiveIntervalMs(1000L, Robots.Allowed) == 1000L)
  }
}
