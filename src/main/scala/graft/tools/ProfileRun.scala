package graft.tools

import org.apache.spark.sql.SparkSession
import graft.fixtures.SyntheticStore
import graft.pipeline.CrawlPipeline

/** Scratch: time the real CrawlPipeline.run at a given thread count (set
  * GRAFT_PROFILE=1 for per-phase timings). Not part of the driver contract.
  */
object ProfileRun {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("8").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_CRAWL_N", "800000").toLong
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
    SyntheticStore.ensureOnDisk(spark, storeDir, n, minPx = 32, maxPx = 160)
    spark.range(1000).count()
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/dev/shm"), s"graft-prof-$threads").toString
    val t0 = System.nanoTime()
    val s = CrawlPipeline.run(spark, storeDir, root,
      salts = Map("thingiverse.com" -> 32))
    println(f"[crawl-profile] TOTAL                    ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($s)")
    scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
    spark.stop()
  }
}
