package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.fixtures.PlantedFixtures

/** Sitemap-protocol ingestion (sitemaps.org): robots discovery, urlset /
  * sitemapindex parsing via the built-in XML reader, field normalization,
  * and the two-level frontier assembly over the planted corpus.
  */
class SitemapsSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("sitemapRefs: case-insensitive key, padding tolerated, non-records ignored") {
    val robots = Seq(
      ("a.example",
        "User-agent: *\nDisallow: /x\nSitemap: https://a.example/s.xml\n" +
          "sitemap:   https://a.example/t.xml  \nNotSitemap: https://no\n"),
      ("b.example", "User-agent: *\nDisallow: /\n")
    ).toDF("host", "robots_txt")
    val refs = Sitemaps.sitemapRefs(robots).orderBy("sitemap_url")
      .as[(String, String)].collect()
    assert(refs.toSeq == Seq(
      ("a.example", "https://a.example/s.xml"),
      ("a.example", "https://a.example/t.xml")))
  }

  test("parse: urlset entries — unescape, trim, field normalization, null fields") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>https://h/p/1?a=1&amp;b=2</loc><lastmod>2020-02-01</lastmod><changefreq>WEEKLY</changefreq><priority>0.3</priority></url>
        |<url><loc>  https://h/p/2  </loc><changefreq>quarterly</changefreq><priority>1.5</priority></url>
        |<url><loc>https://h/p/3</loc><lastmod>not-a-date</lastmod><lastmod-typo>x</lastmod-typo></url>
        |</urlset>""".stripMargin
    val out = Sitemaps.parse(Seq(("https://h/sm.xml", xml)).toDF("sitemap_url", "xml"))
      .orderBy("url")
      .select("kind", "url", "lastmod_day", "changefreq", "priority_permille")
      .as[(String, String, Option[Long], Option[String], Option[Long])].collect()
    assert(out.toSeq == Seq(
      ("url", "https://h/p/1?a=1&b=2", Some(18293L), Some("weekly"), Some(300L)),
      ("url", "https://h/p/2", None, None, None),
      ("url", "https://h/p/3", None, None, None)))
  }

  test("parse: sitemapindex entries; unknown root produces no rows") {
    val idx =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<sitemap><loc>https://h/sm_0.xml</loc><lastmod>2020-01-01</lastmod></sitemap>
        |<sitemap><loc>https://h/sm_1.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val out = Sitemaps.parse(Seq(
      ("https://h/sitemap_index.xml", idx),
      ("https://h/other.xml", "<rss version=\"2.0\"><channel/></rss>"))
      .toDF("sitemap_url", "xml"))
      .orderBy("url")
      .select("kind", "url", "lastmod_day")
      .as[(String, String, Option[Long])].collect()
    assert(out.toSeq == Seq(
      ("sitemap", "https://h/sm_0.xml", Some(18262L)),
      ("sitemap", "https://h/sm_1.xml", None)))
  }

  test("sitemapFrontier over the planted corpus matches the closed form per key") {
    val (robots, docs) = PlantedFixtures.sitemapCorpus(spark, sfDir)
    val out = Sitemaps.sitemapFrontier(robots, docs)

    val expected = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey").as("k"))
      .select(
        concat(lit("site"), pmod(col("k"), lit(8)), lit(".example")).as("host"),
        concat(lit("https://site"), pmod(col("k"), lit(8)), lit(".example/p/"),
          col("k"),
          when(pmod(col("k"), lit(11)) === 0, lit("?a=1&b=2")).otherwise(lit("")))
          .as("url"),
        when(pmod(col("k"), lit(5)) =!= 0, pmod(col("k"), lit(365)) + 18262L)
          .as("lastmod_day"),
        element_at(
          array(lit("daily"), lit("weekly"), lit("monthly"), lit(null).cast("string")),
          pmod(col("k"), lit(4)).cast("int") + 1).as("changefreq"),
        when(pmod(col("k"), lit(7)) =!= 0, pmod(col("k"), lit(10)) * 100L)
          .as("priority_permille"),
        concat(lit("https://site"), pmod(col("k"), lit(8)), lit(".example/sm_"),
          pmod(floor(col("k") / 8).cast("long"), lit(4)), lit(".xml"))
          .as("sitemap_url"))

    assert(out.count() == expected.count())
    assert(out.select(expected.columns.map(col): _*)
      .exceptAll(expected).isEmpty, "rows not in the closed form")
    assert(expected.exceptAll(out.select(expected.columns.map(col): _*)).isEmpty,
      "closed-form rows missing")
  }

  test("decodeDocs: gzip magic → gunzip, plain bytes → UTF-8, corrupt gzip → " +
    "null doc (skipped, never a task failure)") {
    val xml = "<urlset><url><loc>https://h/p/1</loc></url></urlset>"
    val gz = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(xml.getBytes("UTF-8")); g.close()
      bo.toByteArray
    }
    val corrupt = gz.take(8) ++ Array.fill[Byte](4)(0x7) // magic intact, body broken
    val docs = Seq(
      ("https://h/sm.xml.gz", gz),
      ("https://h/sm.xml", xml.getBytes("UTF-8")),
      ("https://h/broken.xml.gz", corrupt))
      .toDF("sitemap_url", "bytes")
    val out = Sitemaps.parse(Sitemaps.decodeDocs(docs))
      .select("sitemap_url", "url").as[(String, String)].collect().toSet
    // both readable routes parse to the same entry; the corrupt doc is absent
    assert(out == Set(
      ("https://h/sm.xml.gz", "https://h/p/1"),
      ("https://h/sm.xml", "https://h/p/1")))
  }

  test("parse survives malformed XML: truncated, non-XML, empty, wrong " +
    "nesting — bad docs yield no rows, good docs in the same frame still parse") {
    val good = "<urlset><url><loc>https://h/p/9</loc></url></urlset>"
    val docs = Seq(
      ("t", "<urlset><url><loc>https://h/p/1</loc>"), // truncated
      ("n", "this is not xml at all"),
      ("e", ""),
      ("w", "<urlset><sitemap><loc>https://h/x.xml</loc></sitemap></urlset>"),
      ("g", good)).toDF("sitemap_url", "xml")
    val out = Sitemaps.parse(docs).select("sitemap_url", "url")
      .as[(String, String)].collect().toSet
    assert(out == Set(("g", "https://h/p/9")))
  }

  test("frontier plan: parse fuses into the scan; only join + dedup shuffles") {
    val (robots, docs) = PlantedFixtures.sitemapCorpus(spark, sfDir)
    val plan = Sitemaps.sitemapFrontier(robots, docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BatchEvalPython"))
  }
}
