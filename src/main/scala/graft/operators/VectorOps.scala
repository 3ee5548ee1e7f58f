package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`embedding:
  * Array[Float]`). Brute-force cosine top-k is the exact baseline; the
  * LSH-bucketed variant is the 100 TB scale path (candidates from
  * sign-pattern buckets, exact re-rank within buckets only).
  *
  * Dot products run through `aggregate`/`zip_with` builtin higher-order
  * functions (codegen'd, sequential left-to-right accumulation in double —
  * deterministic and matching the DuckDB oracle's accumulation order).
  */
object VectorOps {

  private def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("emb", expr("transform(embedding, x -> cast(x as double))"))

  private def norm(a: String): Column =
    sqrt(expr(s"aggregate(transform($a, x -> x * x), 0D, (acc, v) -> acc + v)"))

  /** Brute-force cosine top-k: queries = vec_id < nQueries; exact ranking
    * over all vectors. O(Q×N) — the correctness baseline the LSH path is
    * validated against. Output (qid, neighbor_id, rank), rank 1..k,
    * deterministic tie-break on neighbor id.
    */
  def annBruteForce(spark: SparkSession, sfDir: String,
      nQueries: Int = 20, k: Int = 3): DataFrame = {
    val emb = embeddings(spark, sfDir)
      .withColumn("nrm", norm("emb"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"), col("nrm").as("qnrm"))
    val sim = queries.crossJoin(broadcast(emb.select(
        col("vec_id").as("neighbor_id"), col("emb").as("nemb"), col("nrm").as("nnrm"))))
      .filter(col("qid") =!= col("neighbor_id"))
      .withColumn("sim",
        expr("aggregate(zip_with(qemb, nemb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)") /
          (col("qnrm") * col("nnrm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("neighbor_id"))
    sim.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /** Sign-pattern LSH bucketing with `nPlanes` hyperplanes (random ±1
    * components): bucket id = bit pattern of sign(v · plane_p). The scale
    * path for ANN — candidates only within equal buckets, then exact cosine
    * re-rank. Recall is tested against `annBruteForce` in VectorOpsSpec.
    */
  def lshBuckets(spark: SparkSession, sfDir: String, nPlanes: Int = 8): DataFrame =
    lshBucketsOf(embeddings(spark, sfDir), nPlanes)

  /** `lshBuckets` over an explicit embeddings DataFrame (`vec_id`,
    * `embedding: array<float>`).
    */
  def lshBucketsOf(embDf: DataFrame, nPlanes: Int = 8): DataFrame = {
    val proj = (0 until nPlanes).map { p =>
      // v · plane_p  with plane components ±1 derived from (p, dim index)
      val s = expr(
        s"""aggregate(
           |  zip_with(emb, sequence(0, size(emb) - 1), (x, j) ->
           |    x * (CASE WHEN pmod(xxhash64($p, j), 2) = 0 THEN 1.0D ELSE -1.0D END)),
           |  0D, (acc, v) -> acc + v)""".stripMargin)
      when(s >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    embDf
      .withColumn("emb", expr("transform(embedding, x -> cast(x as double))"))
      .select(col("vec_id"), col("emb"), proj.as("bucket"))
  }

  /** Embedding-cosine near-duplicate pairs — the dedup-family member over
    * vectors: candidates blocked by the SIGN PATTERN of the first `nBits`
    * embedding components (a deterministic, engine-replicable blocking key —
    * near-identical vectors share component signs), exact cosine within
    * blocks, pairs kept at `minPermille` similarity. One shuffle on the
    * block key; no all-pairs join ever materializes (the blocking is the
    * same family as SimHash block keys for text).
    */
  def embedNearDup(spark: SparkSession, sfDir: String,
      nBits: Int = 8, minPermille: Int = 900): DataFrame = {
    val blockKey = (0 until nBits).map { i =>
      when(expr(s"emb[$i]") >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val emb = embeddings(spark, sfDir)
      .withColumn("nrm", norm("emb"))
      .withColumn("block", blockKey)
    val a = emb.select(col("block"), col("vec_id").as("id_a"),
      col("emb").as("emb_a"), col("nrm").as("nrm_a"))
    val b = emb.select(col("block"), col("vec_id").as("id_b"),
      col("emb").as("emb_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        expr("aggregate(zip_with(emb_a, emb_b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)") /
          (col("nrm_a") * col("nrm_b")))
      .withColumn("cos_permille", floor(col("cos") * 1000).cast("long"))
      .filter(col("cos_permille") >= minPermille)
      .select(col("id_a"), col("id_b"), col("cos_permille"))
  }

  /** LSH-accelerated ANN: same output shape as `annBruteForce` but
    * candidates restricted to the query's bucket. At 10^10 vectors the
    * bucket key is the shuffle key; no cross join ever materializes.
    */
  def annLsh(spark: SparkSession, sfDir: String,
      nQueries: Int = 20, k: Int = 3, nPlanes: Int = 8): DataFrame =
    annLshOf(spark, spark.read.parquet(s"$sfDir/embeddings.parquet"),
      s"dir:$sfDir", nQueries, k, nPlanes)

  /** `annLsh` over an explicit embeddings DataFrame; `cacheKey` names the
    * session-memoized bucketed-vector cache.
    */
  def annLshOf(spark: SparkSession, embDf: DataFrame, cacheKey: String,
      nQueries: Int = 20, k: Int = 3, nPlanes: Int = 8): DataFrame = {
    val b = graft.PlanCache.cached(spark, s"ann-lsh-buckets:$cacheKey:$nPlanes")(
      lshBucketsOf(embDf, nPlanes)
        .withColumn("nrm", sqrt(expr("aggregate(transform(emb, x -> x * x), 0D, (acc, v) -> acc + v)"))))
    val queries = b.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"),
        col("nrm").as("qnrm"), col("bucket"))
    val sim = queries.join(b.select(col("vec_id").as("neighbor_id"),
        col("emb").as("nemb"), col("nrm").as("nnrm"), col("bucket")), Seq("bucket"))
      .filter(col("qid") =!= col("neighbor_id"))
      .withColumn("sim",
        expr("aggregate(zip_with(qemb, nemb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)") /
          (col("qnrm") * col("nnrm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("neighbor_id"))
    sim.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }
}
