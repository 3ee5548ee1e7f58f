package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-src").toString

  test("S1 seed list: line order = seq; blocklist flagged (ref manifests_list_flat.py:45-52,180-191)") {
    val dir = tmp()
    Files.writeString(Paths.get(dir, "seeds.txt"),
      """https://github.com/a/b/blob/main/okh.toml
        |https://projects.openhardware.science/x
        |https://www.thingiverse.com/thing:7
        |""".stripMargin)
    val df = Sources.seedList(spark, s"$dir/seeds.txt").orderBy("seq").collect()
    assert(df.length == 3)
    assert(df(0).getAs[String]("url").contains("github") && !df(0).getAs[Boolean]("blocked"))
    assert(df(1).getAs[Boolean]("blocked"))
    assert(df(2).getAs[Long]("seq") == 2L)
  }

  test("S1 appropedia index: JSON list sorted ascending defines seq (ref appropedia.py:241-262)") {
    val dir = tmp()
    Files.writeString(Paths.get(dir, "list.json"),
      """["https://www.appropedia.org/Zebra", "https://www.appropedia.org/Apple"]""")
    val rows = Sources.appropediaIndex(spark, s"$dir/list.json").orderBy("seq")
      .select("url").as[String].collect()
    assert(rows.toSeq == Seq("https://www.appropedia.org/Apple", "https://www.appropedia.org/Zebra"))
  }

  test("P10: auto-translated pages (/xx language suffix) dropped before ranking " +
      "(ref appropedia.py:40)") {
    val dir = tmp()
    Files.writeString(Paths.get(dir, "list.json"),
      """["https://www.appropedia.org/Zebra/de", "https://www.appropedia.org/Apple",
        | "https://www.appropedia.org/Mango/fr", "https://www.appropedia.org/Zebra"]"""
        .stripMargin.replace("\n", ""))
    val rows = Sources.appropediaIndex(spark, s"$dir/list.json").orderBy("seq")
      .select("seq", "url").as[(Long, String)].collect()
    assert(rows.map(_._2).toSeq ==
      Seq("https://www.appropedia.org/Apple", "https://www.appropedia.org/Zebra"))
    // seq is contiguous over the KEPT pages
    assert(rows.map(_._1).toSeq == Seq(0L, 1L))
  }

  test("S6 manifest tree: 4 globs, glob_rank, P1 filter, first-wins across globs (ref manifests_repo.py:36-41,154-204)") {
    val dir = tmp()
    Files.createDirectories(Paths.get(dir, "projA"))
    Files.createDirectories(Paths.get(dir, "projB"))
    Files.writeString(Paths.get(dir, "projA", "okh.toml"), "name = \"A\"")
    Files.writeString(Paths.get(dir, "projB", "widget.okh.toml"), "name = \"B\"")
    Files.writeString(Paths.get(dir, "projB", "gadget.okh.yml"), "name: G")
    Files.writeString(Paths.get(dir, "projB", "readme.toml"), "name = \"no\"") // P1 reject
    Files.writeString(Paths.get(dir, "projB", "empty.okh.toml"), "") // P2 reject
    val df = Sources.manifestTree(spark, dir)
    val rows = df.select("file_name", "glob_rank", "fmt").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(rows == Set(("okh.toml", 0, "toml"), ("widget.okh.toml", 1, "toml"),
      ("gadget.okh.yml", 2, "yml")))
  }

  test("S2/S3 paged API: page enumeration, explicit (page, idx) order, R3 incomplete-page retry") {
    // deterministic transport: page 3 returns short twice, then full
    val fetch: (Long, Int) => Seq[String] = { (page, attempt) =>
      val expected = math.min(10L, 47L - page * 10).toInt
      val n = if (page == 3 && attempt < 2) expected - 4 else expected
      (0 until n).map(i => s"item-${page * 10 + i}")
    }
    val df = Sources.pagedApi(spark, totalItems = 47, pageSize = 10, fetch)
    assert(df.count() == 47)
    val retry = df.filter(col("page") === 3).select(max("retries")).as[Int].collect()(0)
    assert(retry == 2)
    val ordered = df.orderBy("page", "idx_in_page").select("item").as[String].collect()
    assert(ordered.take(3).toSeq == Seq("item-0", "item-1", "item-2"))
    assert(ordered.last == "item-46")
  }

  test("S5/J2 thingiverse store: CSV slices joined with per-thing JSON payloads (ref shared/thingiverse.py:217-248)") {
    val dir = tmp()
    Files.createDirectories(Paths.get(dir, "things"))
    Files.writeString(Paths.get(dir, "open_source.csv"),
      "id,state\n11,OPEN_SOURCE\n12,OPEN_SOURCE\n13,DELETED\n")
    Files.writeString(Paths.get(dir, "things", "11.json"), """{"name":"t11"}""")
    Files.writeString(Paths.get(dir, "things", "13.json"), "") // empty → P2 reject
    val df = Sources.thingiverseStore(spark, s"$dir/open_source.csv", s"$dir/things")
    val rows = df.select("id", "json").collect()
    assert(rows.length == 1) // 12 has no payload, 13 empty, 11 joins
    assert(rows(0).getLong(0) == 11L && rows(0).getString(1).contains("t11"))
  }
}
