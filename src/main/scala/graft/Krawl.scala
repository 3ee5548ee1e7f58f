package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fetch.FetchStage
import graft.functions.UrlFunctions
import graft.model.HostingId
import graft.normalize.Normalizers
import graft.pipeline.CrawlPipeline
import graft.serialize.Serializers
import graft.tables.Json

/** Library facade mirroring the reference's command surface (SURVEY §3):
  * `krawl fetch url …` (§3.1), `krawl fetch <platform>` (§3.2 — that is
  * `CrawlPipeline.run`), `krawl list fetchers` (§3.3), and the
  * documented-but-unwired `krawl convert` / `krawl validate`
  * (README.md:149-154 of the reference; machinery at serializer/factory.py
  * and validator/strict.py).
  */
object Krawl {

  /** `krawl list fetchers` (cli/command/list/fetchers.py:17-19): the
    * registry keys (fetcher/factory.py:31-38).
    */
  def listFetchers: Seq[String] = HostingId.all.map(_.id)

  /** `krawl fetch url <url…>` (§3.1): canonicalize the given URLs, restrict
    * the frontier to exactly those units, run the full fetch→normalize→
    * commit pipeline against the local store. Unknown-platform URLs surface
    * as parse_error rows in the returned frame, mirroring the reference's
    * per-URL error reporting (url.py:110-112 exit code = failures).
    */
  def fetchUrls(spark: SparkSession, urls: Seq[String], storeDir: String,
      tableRoot: String): DataFrame = {
    import spark.implicits._
    val parsed = urls.toDF("url")
      .withColumn("canon", UrlFunctions.canonicalize(col("url")))
      .select(col("url"), col("canon.unit_path").as("unit_path"),
        col("canon.parse_error").as("parse_error"))
    val wanted = parsed.filter(col("parse_error").isNull).select("unit_path")

    val frontier = CrawlPipeline.robotsAllowed(CrawlPipeline.frontier(spark, storeDir))
      .join(broadcast(wanted), Seq("unit_path"), "left_semi")
    val log = FetchStage.run(spark, FetchStage.toTasks(spark, frontier))
    val statusCounts = log.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    CrawlPipeline.urlSeenStore(tableRoot).append(spark,
      log.filter(col("status").isin("ok", "not_found", "robots_denied"))
        .select("unit_path", "hosting_id", "id", "status", "url_hash", "bucket"),
      "bucket", statusCounts, clusterBeforeWrite = true)
    // report: per input URL, its outcome (missing from store → not_in_store)
    parsed.join(log.select(col("unit_path"), col("status")), Seq("unit_path"), "left_outer")
      .withColumn("status",
        coalesce(col("status"),
          when(col("parse_error").isNotNull, concat(lit("parse_error: "), col("parse_error")))
            .otherwise(lit("not_in_store"))))
      .select("url", "unit_path", "status")
  }

  /** `krawl convert` equivalent: read manifests (TOML/YAML/JSON) → normalize
    * → emit the requested serialization(s) as columns (toml / canonical
    * json / turtle), the read→normalize→write trace of §3.3.
    */
  def convert(spark: SparkSession, manifests: DataFrame): DataFrame = {
    val projects = Normalizers.manifest(spark, manifests)
    val emit = udf { (projectId: String, name: String, repo: String, version: String,
        license: String, function: String) =>
      val obj = Json.obj(
        "name" -> Json.s(name), "repo" -> Json.s(repo),
        "version" -> Json.s(version), "license" -> Json.s(license),
        "function" -> Json.s(function))
      val stripped = Serializers.stripEmpty(obj)
        .collect { case o: Json.JObj => o }.getOrElse(Json.JObj(Vector.empty))
      (Serializers.toToml(stripped), Serializers.canonicalJson(stripped))
    }
    projects
      .withColumn("emitted",
        emit(col("project_id"), col("name"), col("repo"), col("version"),
          col("license_spdx"), col("function")))
      .select(col("project_id"), col("name"),
        col("emitted._1").as("toml"), col("emitted._2").as("json"))
  }

  /** `krawl validate` equivalent (validator/strict.py:24-67 subset): rule
    * columns over normalized projects; ok = no failure reasons.
    */
  def validate(projects: DataFrame): DataFrame = {
    import graft.functions.ScalarFunctions
    val reasons = concat_ws(",",
      when(col("name").isNull || length(col("name")) < 1 || length(col("name")) > 256,
        lit("bad-name")),
      when(col("repo").isNull || !col("repo").rlike("^https?://"), lit("bad-repo")),
      when(length(col("function")) > 100000, lit("function-too-long")),
      when(col("version").isNull, lit("missing-version")),
      when(col("license_spdx").isNull, lit("unknown-license")))
    projects
      .withColumn("reasons", reasons)
      .withColumn("ok", col("reasons") === "")
  }
}
