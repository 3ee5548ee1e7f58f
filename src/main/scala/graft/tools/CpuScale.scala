package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: pure-CPU scaling ceiling of this box (hash 400M longs). */
object CpuScale {
  def main(args: Array[String]): Unit = {
    for (threads <- Seq(8, 32)) {
      val spark = SparkSession.builder()
        .master(s"local[$threads]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      spark.range(0, 4000000000L, 1, threads * 4).selectExpr("xxhash64(id) h")
        .selectExpr("sum(h % 100000)").collect() // warm
      val t0 = System.nanoTime()
      spark.range(0, 4000000000L, 1, threads * 4).selectExpr("xxhash64(id) h")
        .selectExpr("sum(h % 100000)").collect()
      println(f"[cpu] threads=$threads%2d  ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.stop()
    }
  }
}
