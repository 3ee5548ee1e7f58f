package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fetch.FetchStage
import graft.fixtures.SyntheticStore
import graft.pipeline.CrawlPipeline

/** Scratch profiler: times each crawl phase separately at a given
  * parallelism to locate serial bottlenecks. Not part of the driver
  * contract.
  */
object ProfileCrawl {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("8").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_CRAWL_N", "200000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // binary-payload scans: split small files aggressively so image-decode
      // stages get one task per core instead of ~3 x 128MB coalesced tasks
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val storeDir = s"/tmp/graft_bench_store_${n}_px160"
    SyntheticStore.ensureOnDisk(spark, storeDir, n, minPx = 32, maxPx = 160)
    spark.range(1000).count()

    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val frontier = CrawlPipeline.robotsAllowed(CrawlPipeline.frontier(spark, storeDir)).cache()
    t("frontier materialize")(frontier.count())
    val allowed = frontier.filter(!col("robots_denied"))
    val tasks = FetchStage.toTasks(spark, allowed)
    val log = FetchStage.run(spark, tasks, salts = Map("thingiverse.com" -> 32)).cache()
    t("fetch log materialize")(log.count())

    val store = spark.read.parquet(storeDir)
      .withColumn("id", regexp_extract(col("image_id"), "^thing:(\\d+)/", 1).cast("long"))
    val fetched = log.filter(col("status") === "ok")
      .select(col("unit_path"), col("id"), col("pos"), col("scheduled_ms"))
    val joined = store.join(org.apache.spark.sql.functions.broadcast(fetched), Seq("id"))
    t("store join (no decode)")(
      joined.select("image_id", "w", "h").write.format("noop").mode("overwrite").save())
    val withDecode = joined
      .withColumn("caption", graft.functions.TextNormalize.normalizeCaptionUdf(col("caption")))
      .withColumn("phash_check", graft.functions.ImageFunctions.phash64(col("bytes")))
      .withColumn("id_group", (col("id") / 10000).cast("long"))
    t("decode+normalize to noop")(
      withDecode.write.format("noop").mode("overwrite").save())
    val root = java.nio.file.Files.createTempDirectory(s"graft-prof-$threads").toString
    t("results append (parquet)")(
      CrawlPipeline.resultsStore(root).append(spark, withDecode
        .select("image_id", "bytes", "w", "h", "fmt", "caption", "phash",
          "phash_check", "unit_path", "id_group"), "id_group"))
    t("fetch_log append")(
      CrawlPipeline.fetchLogStore(root).append(spark, log.toDF(), "hosting_id"))
    t("url_seen append")(
      CrawlPipeline.urlSeenStore(root).append(spark,
        log.filter(col("status").isin("ok", "not_found"))
          .select("unit_path", "hosting_id", "id", "status")
          .join(frontier.select("unit_path", "url_hash", "bucket"), Seq("unit_path")),
        "bucket"))
    spark.stop()
  }
}
