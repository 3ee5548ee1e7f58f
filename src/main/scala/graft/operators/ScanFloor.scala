package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism floor for CPU-bound per-row stages (guide §6:
  * `spark.sql.files.minPartitionNum` is the conf-level floor on scan
  * parallelism; the frozen harness session tunes split sizing for
  * binary-payload stores, which leaves a small columnar key/text table —
  * part.parquet at sf0.1 is 180 KB — as ONE task feeding a parse/decode
  * stage that then runs single-threaded on a 32-core session).
  *
  * Guarded: a no-op whenever the input already carries at least
  * `defaultParallelism` partitions — at production scale file splits
  * exceed core count, so NO shuffle is ever added there; locally it
  * round-robins only the tiny pre-parse rows (deterministic under task
  * retry via Spark's sort-before-repartition). The target derives from
  * the session (`defaultParallelism`), never a constant.
  *
  * Deliberately NOT applied to the pure scan-stage operators whose
  * shuffle-free plans are load-bearing properties (token/quality/lang-id
  * gates, visionPrep, trainingMix — PlanSpec pins them): their per-row
  * work is cheap column arithmetic, and the shuffle-free shape is worth
  * more than local scan parallelism.
  */
object ScanFloor {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
