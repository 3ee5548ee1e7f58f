package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Frontier-cardinality smoke at 10^8 URLs (VERDICT r5 next-round item 8):
  * a payload-free synthetic frontier — ids only, the six-family URL shapes
  * of the production pipeline — driven through the REAL frontier operators
  * (codegen URL canonicalize → first-wins dedup aggregation → per-host
  * politeness window), proving the parse/agg/window posture empirically
  * beyond sf0.1. Reports wall time per stage-group and total shuffle
  * read/write bytes; completing at all demonstrates no driver OOM at the
  * default forked-JVM heap.
  *
  * Not part of the driver contract. Usage:
  *   SPARK_GRAFT_FRONTIER_N=100000000 sbt "runMain graft.tools.FrontierScale"
  */
object FrontierScale {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_N", "100000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-frontier-scale")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var shuffleWrite = 0L
    @volatile var shuffleRead = 0L
    @volatile var spillDisk = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          shuffleRead += m.shuffleReadMetrics.totalBytesRead
          spillDisk += m.diskBytesSpilled
        }
      }
    })

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[frontier-scale] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the production pipeline's own seed shapes + codegen canonicalize
    val frontier = spark.range(n).toDF("id")
      .withColumn("url", graft.pipeline.CrawlPipeline.seedUrlCol(col("id")))
      .withColumn("unit_path", graft.functions.CanonicalUnitPath(col("url")))
      .filter(col("unit_path").isNotNull)
      .withColumn("hosting_id", substring_index(col("unit_path"), "/", 1))
      .withColumn("url_hash", graft.functions.UrlFunctions.urlHash(col("unit_path")))
      .select("id", "unit_path", "hosting_id", "url_hash")

    timed("canonicalize scan")(noop(frontier))

    // first-wins dedup: ONE shuffle keyed on the unit path (hash agg)
    val deduped = frontier
      .groupBy("unit_path", "hosting_id")
      .agg(min("id").as("first_seq"), count(lit(1)).as("n_aliases"))
    timed("dedup aggregation")(noop(deduped))

    // politeness schedule: per-host window over the deduped frontier
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hosting_id")).orderBy(col("first_seq"))
    val schedule = deduped
      .withColumn("pos", row_number().over(w).cast("long"))
      .join(broadcast(graft.operators.CrawlOps.politenessDf(spark)), Seq("hosting_id"))
      .withColumn("scheduled_ms", (col("pos") - 1) * col("min_interval_ms"))
      .select("unit_path", "hosting_id", "pos", "scheduled_ms")
    timed("politeness schedule")(noop(schedule))

    val heapMax = Runtime.getRuntime.maxMemory() / (1024.0 * 1024 * 1024)
    println(f"[frontier-scale] n=$n shuffle_write=${shuffleWrite / 1e9}%.2f GB " +
      f"shuffle_read=${shuffleRead / 1e9}%.2f GB disk_spill=${spillDisk / 1e9}%.2f GB " +
      f"driver_heap_max=$heapMax%.1f GiB (no OOM)")
    spark.stop()
  }
}
