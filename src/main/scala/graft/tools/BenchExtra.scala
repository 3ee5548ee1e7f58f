package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extra stage-isolation benchmarks for the optimization round (guide §1.4:
  * noop-sink isolation of sub-stages). NOT part of the driver contract —
  * `graft.Bench` stays the frozen measurement harness; numbers from here are
  * cited in OPTIMIZATION_r06.md only.
  *
  * Usage: runMain graft.tools.BenchExtra [stage1,stage2,...] [repeats]
  */
object BenchExtra {

  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def stages(spark: SparkSession, d: String): Map[String, () => DataFrame] = {
    import spark.implicits._
    def thingiverseHits = spark.read.parquet(s"$d/part.parquet").select(to_json(struct(
      col("p_partkey").as("id"), col("p_name").as("name"),
      concat(lit("https://www.thingiverse.com/thing:"), col("p_partkey")).as("public_url"),
      lit("2020-01-02T03:04:05+00:00").as("modified"),
      concat(lit("Makes "), col("p_type"), lit(" parts.")).as("description"),
      lit("GNU - GPL").as("license"),
      struct(lit("A").as("first_name"), lit("B").as("last_name"),
        lit("https://www.thingiverse.com/a_b").as("public_url")).as("creator"),
      struct(
        array(struct(lit("i.png").as("name"),
          concat(lit("https://cdn.thingiverse.test/"), col("p_partkey"), lit(".png")).as("url"),
          lit(null).cast("string").as("added"))).as("images"),
        array(struct(lit("m.stl").as("name"),
          concat(lit("https://cdn.thingiverse.test/"), col("p_partkey"), lit(".stl")).as("url"),
          lit(null).cast("string").as("direct_url"))).as("files")).as("zip_data"))).as("json"))
    Map(
      // q_rdf_triples split: the thingiverse normalizer alone vs the full
      // normalizer + flatMap serialization
      "rdf_normalize_only" -> (() =>
        graft.normalize.Normalizers.thingiverse(spark, thingiverseHits)),
      "rdf_full" -> (() => {
        val projects = graft.normalize.Normalizers.thingiverse(spark, thingiverseHits)
        projects.flatMap { r =>
          val p = graft.model.ProjectModel.fromRow(r)
          val cm = graft.model.CrawlMeta.initial("thingiverse.com", "api")
          graft.serialize.RdfSerializer.tripleRows(p, cm)
        }.toDF()
      }),
      // shared sub-stage of every frontier query
      "seeds_only" -> (() => graft.operators.Seeds.seeds(spark, d)),
      "canonicalized_only" -> (() => graft.operators.CrawlOps.canonicalized(spark, d)),
      // minhash signature build (cold, uncached twin of the cached path)
      "minhash_sig_only" -> (() => graft.operators.TextOps.minhashSignaturesOf(
        spark.read.parquet(s"$d/documents.parquet"))),
      "shingles_only" -> (() => graft.operators.TextOps.shinglesOf(
        spark.read.parquet(s"$d/documents.parquet"), hashed = true)),
      // the crawl results-append decode in isolation: phash of every
      // payload in the bench store (set SPARK_GRAFT_CRAWL_N to match an
      // existing /tmp/graft_bench_store_<n>_px160)
      "crawl_decode_only" -> (() => {
        val n = sys.env.getOrElse("SPARK_GRAFT_CRAWL_N", "300000")
        spark.read.parquet(s"/tmp/graft_bench_store_${n}_px160")
          .select(col("image_id"),
            graft.functions.ImageFunctions.phash64(col("bytes")).as("p"))
      }),
      // the crawl run's pre-decode phases in isolation (the "status counts"
      // materialization of CrawlPipeline.run): frontier scan alone, then
      // frontier + fetch-stage window/fold
      "crawl_frontier_only" -> (() => {
        val n = sys.env.getOrElse("SPARK_GRAFT_CRAWL_N", "300000")
        val storeDir = s"/tmp/graft_bench_store_${n}_px160"
        graft.pipeline.CrawlPipeline.ensureBucketedStore(spark, storeDir)
        graft.pipeline.CrawlPipeline.frontier(spark, storeDir)
      }),
      // q_minhash_lsh warm-run decomposition (sig cache built by the first
      // repeat): band buckets alone, candidates (self-join + distinct),
      // then the full verify chain
      "mh_buckets" -> (() => {
        val docs = graft.PlanCache.memo(spark, s"planted-neardup:$d")(
          graft.fixtures.PlantedFixtures.nearDupDocs(spark, d))
        val sig = graft.PlanCache.cached(spark, s"minhash-sig:planted:$d:64")(
          graft.operators.TextOps.minhashSignaturesOf(docs, 64))
        val bandCols = (0 until 16).map { b =>
          val cols = (0 until 4).map(r => col("mh").getItem(b * 4 + r))
          struct(lit(b).as("band"), xxhash64(cols: _*).as("bucket"))
        }
        sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
          .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      }),
      "mh_cand" -> (() => {
        val docs = graft.PlanCache.memo(spark, s"planted-neardup:$d")(
          graft.fixtures.PlantedFixtures.nearDupDocs(spark, d))
        val sig = graft.PlanCache.cached(spark, s"minhash-sig:planted:$d:64")(
          graft.operators.TextOps.minhashSignaturesOf(docs, 64))
        val bandCols = (0 until 16).map { b =>
          val cols = (0 until 4).map(r => col("mh").getItem(b * 4 + r))
          struct(lit(b).as("band"), xxhash64(cols: _*).as("bucket"))
        }
        val buckets = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
          .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
        buckets.as("x").join(buckets.as("y"), Seq("band", "bucket"))
          .filter(col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
      }),
      "mh_full" -> (() => {
        val docs = graft.PlanCache.memo(spark, s"planted-neardup:$d")(
          graft.fixtures.PlantedFixtures.nearDupDocs(spark, d))
        graft.operators.TextOps.minhashLshOf(spark, docs, s"planted:$d")
      }),
      // results-append decomposition: everything the append computes EXCEPT
      // the parquet write (payload join + caption normalize + phash) — the
      // write cost is the full-run phase time minus this
      "crawl_results_nowrite" -> (() => {
        val n = sys.env.getOrElse("SPARK_GRAFT_CRAWL_N", "300000")
        val storeDir = s"/tmp/graft_bench_store_${n}_px160"
        graft.pipeline.CrawlPipeline.ensureBucketedStore(spark, storeDir)
        val f = graft.pipeline.CrawlPipeline.robotsAllowed(
          graft.pipeline.CrawlPipeline.frontier(spark, storeDir))
        val salts = graft.pipeline.CrawlPipeline.autoSalts(f)
        val log = graft.fetch.FetchStage.run(spark,
          graft.fetch.FetchStage.toTasks(spark, f), salts = salts).toDF()
        val fetched = log.filter(col("status") === "ok")
          .select(col("unit_path"), col("id"), col("pos"), col("scheduled_ms"))
        graft.pipeline.CrawlPipeline.payloadJoin(spark, storeDir, fetched, None)
          .withColumn("caption",
            graft.functions.TextNormalize.normalizeCaptionUdf(col("caption")))
          .withColumn("phash_check",
            graft.functions.ImageFunctions.phash64(col("bytes")))
          .withColumn("id_group", (col("id") / 10000).cast("long"))
          .select(col("image_id"), col("bytes"), col("w"), col("h"), col("fmt"),
            col("caption"), col("phash"), col("phash_check"), col("unit_path"),
            col("id_group"))
      }),
      "crawl_fetch_stage" -> (() => {
        val n = sys.env.getOrElse("SPARK_GRAFT_CRAWL_N", "300000")
        val storeDir = s"/tmp/graft_bench_store_${n}_px160"
        val f = graft.pipeline.CrawlPipeline.robotsAllowed(
          graft.pipeline.CrawlPipeline.frontier(spark, storeDir))
        val salts = graft.pipeline.CrawlPipeline.autoSalts(f)
        graft.fetch.FetchStage.run(spark,
          graft.fetch.FetchStage.toTasks(spark, f), salts = salts).toDF()
      })
    )
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeats = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = stages(spark, sfDir)
    val names =
      if (args.nonEmpty && args(0).nonEmpty) args(0).split(",").toSeq else all.keys.toSeq.sorted
    val unknown = names.filterNot(all.contains)
    require(unknown.isEmpty,
      s"unknown stages: ${unknown.mkString(",")} (known: ${all.keys.toSeq.sorted.mkString(",")})")
    val out = names.map { name =>
      val fn = all(name)
      spark.sparkContext.setJobDescription(s"extra:$name")
      val samples = (0 until repeats).map(_ => time(exec(fn())))
      name -> samples
    }
    spark.sparkContext.setJobDescription(null)
    out.foreach { case (n, ss) =>
      println(f"[extra] $n%-24s min=${ss.min}%6.3f  samples=${ss.map(s => f"$s%.3f").mkString(",")}")
    }
    graft.PlanCache.clear(spark)
    spark.stop()
  }
}
