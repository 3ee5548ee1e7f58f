package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: isolate the results-store WRITE cost (the tail of the crawl
  * run's dominant phase). Prepares the exact results projection once into
  * an in-memory cache, then times parquet writes to tmpfs under different
  * shapes: current (partitionBy id_group, session codec = snappy),
  * uncompressed codec, and flat (no partitionBy). Not part of the driver
  * contract.
  */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("8").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_CRAWL_N", "300000")
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val storeDir = s"/tmp/graft_bench_store_${n}_px160"
    graft.pipeline.CrawlPipeline.ensureBucketedStore(spark, storeDir)
    val f = graft.pipeline.CrawlPipeline.robotsAllowed(
      graft.pipeline.CrawlPipeline.frontier(spark, storeDir))
    val salts = graft.pipeline.CrawlPipeline.autoSalts(f)
    val log = graft.fetch.FetchStage.run(spark,
      graft.fetch.FetchStage.toTasks(spark, f), salts = salts).toDF()
    val fetched = log.filter(col("status") === "ok")
      .select(col("unit_path"), col("id"), col("pos"), col("scheduled_ms"))
    val results = graft.pipeline.CrawlPipeline.payloadJoin(spark, storeDir, fetched, None)
      .withColumn("caption",
        graft.functions.TextNormalize.normalizeCaptionUdf(col("caption")))
      .withColumn("phash_check",
        graft.functions.ImageFunctions.phash64(col("bytes")))
      .withColumn("id_group", (col("id") / 10000).cast("long"))
      .select(col("image_id"), col("bytes"), col("w"), col("h"), col("fmt"),
        col("caption"), col("phash"), col("phash_check"), col("unit_path"),
        col("id_group"))
      .cache()
    println(s"[probe] rows cached: ${results.count()}") // materialize upstream once
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val base = "/dev/shm/graft-writeprobe"
    (1 to 2).foreach { rep =>
      t(s"partitionBy+snappy #$rep")(results.write.mode("overwrite")
        .partitionBy("id_group").parquet(s"$base-a"))
      t(s"partitionBy+uncompressed #$rep")(results.write.mode("overwrite")
        .option("compression", "uncompressed")
        .partitionBy("id_group").parquet(s"$base-b"))
      t(s"flat+snappy #$rep")(results.write.mode("overwrite")
        .parquet(s"$base-c"))
      t(s"flat+uncompressed #$rep")(results.write.mode("overwrite")
        .option("compression", "uncompressed")
        .parquet(s"$base-d"))
    }
    Seq("a", "b", "c", "d").foreach { s =>
      val d = new java.io.File(s"$base-$s")
      def size(f: java.io.File): Long =
        if (f.isFile) f.length else Option(f.listFiles).map(_.map(size).sum).getOrElse(0L)
      def count(f: java.io.File): Long =
        if (f.isFile && f.getName.endsWith(".parquet")) 1L
        else Option(f.listFiles).map(_.map(count).sum).getOrElse(0L)
      println(f"[probe] layout $s: ${size(d) / 1e6}%.0f MB in ${count(d)} files")
      scala.reflect.io.Directory(d).deleteRecursively()
    }
    spark.stop()
  }
}
