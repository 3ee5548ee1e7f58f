package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Predicates

/** Scan/source operators (SURVEY §2.1). Each mirrors one of the reference's
  * discovery inputs, re-expressed as a Spark reader whose ORDER is data
  * (explicit seq/page/idx/glob_rank columns — never execution order, F4/W1).
  */
object Sources {

  /** S1 (flat list flavor): one-URL-per-line seed file
    * (manifests_list_flat.py:45-52, "CSV file with one column and no
    * header"). Line order becomes the `seq` column via wholetext +
    * posexplode — deterministic, unlike monotonically_increasing_id.
    * Blocklisted prefixes are dropped (P5) and recorded.
    */
  def seedList(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.option("wholetext", "true").text(path)
      .select(posexplode(split(col("value"), "\n")).as(Seq("seq", "url")))
      .withColumn("seq", col("seq").cast("long"))
      .withColumn("url", trim(col("url")))
      .filter(col("url") =!= "")
    val blockFilter = Predicates.BlockedUrlPrefixes
      .map(p => col("url").startsWith(p))
      .reduce(_ || _)
    lines.withColumn("blocked", blockFilter)
  }

  /** S1 (Appropedia flavor): JSON index of manifest URLs
    * (appropedia.py:241-262). The reference SORTS the URL list ascending and
    * that sort DEFINES its crawl order (F1) — seq is the post-sort rank.
    */
  /** P10: auto-translated Appropedia pages end in a "/xx" language suffix
    * and are skipped by the reference (appropedia.py:40
    * `_re_auto_translated_page_title`).
    */
  val AutoTranslatedTitlePattern = ".*/[a-z]{2}$"

  def appropediaIndex(spark: SparkSession, path: String): DataFrame = {
    spark.read.option("wholetext", "true").text(path)
      .select(from_json(col("value"), org.apache.spark.sql.types.DataType.fromDDL("array<string>")).as("urls"))
      // P10: drop auto-translated pages BEFORE ranking so the crawl order
      // covers exactly the kept pages
      .select(posexplode(expr(
        s"filter(array_sort(urls), u -> NOT regexp_like(u, '$AutoTranslatedTitlePattern'))"))
        .as(Seq("seq", "url")))
      .withColumn("seq", col("seq").cast("long"))
  }

  /** S6: recursive manifest-tree scan — the reference's four fixed globs in
    * order (manifests_repo.py:36-41,154-204), each scan tagged with its
    * glob_rank, unioned (U1), filtered by the accepted-name predicate (P1)
    * and first-wins deduplicated by path across overlapping globs (W2).
    */
  val ManifestGlobs: Seq[String] =
    Seq("okh.toml", "*.okh.toml", "*okh.yml", "*okh.yaml")

  def manifestTree(spark: SparkSession, dir: String): DataFrame = {
    val scans = ManifestGlobs.zipWithIndex.map { case (glob, rank) =>
      spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .load(dir)
        .select(col("path"), col("content"), lit(rank).as("glob_rank"))
    }
    val unioned = scans.reduce(_ unionByName _)
      .withColumn("file_name", element_at(split(col("path"), "/"), -1))
      .withColumn("stem", regexp_replace(col("file_name"), "\\.[^.]*$", ""))
      .withColumn("suffix", regexp_extract(col("file_name"), "(\\.[^.]*)$", 1))
      // P1 + P2: accepted manifest name, non-empty content
      .filter(col("stem").rlike(Predicates.ManifestNamePattern) &&
        col("suffix").rlike(Predicates.ManifestSuffixPattern) &&
        length(col("content")) > 0)
    val w = Window.partitionBy(col("path")).orderBy(col("glob_rank"))
    unioned.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .withColumn("fmt",
        when(col("suffix") === ".toml", "toml")
          .when(col("suffix").isin(".yml", ".yaml"), "yml")
          .otherwise("json"))
  }

  /** S2/S3 shape: paginated API scan as a page-enumeration Dataset
    * (oshwa.py:146-194 offset loop; github.py:372-499 page loop). Pages are
    * fetched in `mapPartitions` with the incomplete-page retry policy (R3:
    * retry ≤ maxRetries when a page returns fewer rows than expected, then
    * accept). Output order is data: (page, idx_in_page).
    *
    * `fetchPage(page, attempt)` is the transport seam (zero-egress: tests
    * inject a deterministic function, production injects HTTP).
    */
  def pagedApi(
      spark: SparkSession,
      totalItems: Long,
      pageSize: Int,
      fetchPage: (Long, Int) => Seq[String],
      maxRetries: Int = 10): DataFrame = {
    import spark.implicits._
    val numPages = (totalItems + pageSize - 1) / pageSize
    val expectedOf = (page: Long) =>
      math.min(pageSize.toLong, totalItems - page * pageSize).toInt
    spark.range(0, numPages, 1, math.min(numPages, 64).toInt.max(1))
      .as[Long]
      .mapPartitions { pages =>
        pages.flatMap { page =>
          val expected = expectedOf(page)
          var attempt = 0
          var items = fetchPage(page, attempt)
          // R3: incomplete page → bounded retry (github.py:381,448-457)
          while (items.length < expected && attempt < maxRetries) {
            attempt += 1
            items = fetchPage(page, attempt)
          }
          items.zipWithIndex.map { case (item, idx) =>
            (page, idx.toLong, attempt, item)
          }
        }
      }
      .toDF("page", "idx_in_page", "retries", "item")
  }

  /** S5/J2: Thingiverse-style local store scan — CSV metadata slices joined
    * with per-thing JSON payloads on id (shared/thingiverse.py:217-248).
    */
  def thingiverseStore(spark: SparkSession, csvGlob: String, jsonDir: String): DataFrame = {
    val meta = spark.read.option("header", "true").csv(csvGlob)
      .withColumn("id", col("id").cast("long"))
    val payloads = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.json")
      .load(jsonDir)
      .select(
        regexp_extract(element_at(split(col("path"), "/"), -1), "^(\\d+)\\.json$", 1)
          .cast("long").as("id"),
        col("content").cast("string").as("json"))
      .filter(length(col("json")) > 0) // P2
    meta.join(payloads, Seq("id")) // inner: meta row ↔ payload present
  }
}
