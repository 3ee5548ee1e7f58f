package graft.frontier

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Per-partition Bloom filters over the URL-seen set (SURVEY §2.11, J6).
  *
  * At 10^10 frontier scale the exact URL-seen anti-join is the dominant
  * shuffle; a Bloom pre-filter eliminates the overwhelmingly common negative
  * case (never-seen URL) without shuffling the url_seen table. Design sizing
  * (SURVEY §7.4): ~1.2 GB per 10^9 keys at 1% fpp, held per partition group
  * (host bucket), so each frontier partition consults only its own bucket's
  * filter. Correctness by construction: Bloom has no false negatives and
  * Bloom-positive candidates continue into the exact anti-join.
  */
object BloomSeen {

  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  /** Catalyst typed-imperative aggregate building a Bloom filter over a LONG
    * column. Mutable buffer (no per-row serialization), partial aggregation
    * map-side, filters merged via bitwise OR at the reducer — one
    * distributed pass per bucket group:
    * `urlSeen.groupBy("bucket").agg(bloom_agg(col("url_hash")))`.
    */
  case class BloomFilterAgg(
      child: Expression,
      expectedItems: Long,
      fpp: Double,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

    override def createAggregationBuffer(): BloomFilter =
      BloomFilter.create(expectedItems, fpp)

    override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
      val v = child.eval(input)
      if (v != null) buffer.putLong(v.asInstanceOf[Long])
      buffer
    }

    override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
      buffer.mergeInPlace(other)
      buffer
    }

    override def eval(buffer: BloomFilter): Any = serialize(buffer)

    override def serialize(buffer: BloomFilter): Array[Byte] =
      BloomSeen.serialize(buffer)

    override def deserialize(bytes: Array[Byte]): BloomFilter =
      BloomSeen.deserialize(bytes)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "bloom_filter_agg"

    override def withNewMutableAggBufferOffset(offset: Int): BloomFilterAgg =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): BloomFilterAgg =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
      copy(child = newChild)
  }

  def bloomAgg(hashCol: Column, expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): Column = {
    import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
    columnOf(BloomFilterAgg(expressionOf(hashCol), expectedItems, fpp)
      .toAggregateExpression())
  }

  /** Executor-side cached might-contain predicate over a broadcast filter
    * (deserialized once per executor, not per row).
    */
  final class MightContain(bc: Broadcast[Array[Byte]])
      extends (Long => Boolean) with Serializable {
    @transient private lazy val bf = deserialize(bc.value)
    def apply(h: Long): Boolean = bf.mightContainLong(h)
  }

  /** Build a Bloom over `hashCol` of `seen`, broadcast it, return a
    * might-contain predicate Column for frontier pre-filtering. (Single-
    * filter form; the per-bucket form groups with `bloomAgg` and broadcasts
    * the bucket→filter map.)
    */
  def mightContainPredicate(spark: SparkSession, seen: DataFrame, hashCol: String,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): Column = {
    val bf = seen.stat.bloomFilter(hashCol, expectedItems, fpp)
    val bc = spark.sparkContext.broadcast(serialize(bf))
    udf(new MightContain(bc)).apply(org.apache.spark.sql.functions.col(hashCol))
  }

  /** Executor-side cached per-bucket might-contain over a broadcast
    * bucket→filter map (filters deserialized once per executor).
    */
  final class MightContainBucketed(bc: Broadcast[Map[Long, Array[Byte]]])
      extends ((Long, Long) => Boolean) with Serializable {
    @transient private lazy val filters: Map[Long, BloomFilter] =
      bc.value.map { case (b, bytes) => b -> deserialize(bytes) }
    def apply(bucket: Long, h: Long): Boolean =
      filters.get(bucket).forall(_.mightContainLong(h)) // unknown bucket → keep (no FN)
  }

  /** The 10^10-scale form (SURVEY §7.4: ~1.2 GB per 10^9 keys at 1% fpp PER
    * PARTITION GROUP): one Bloom filter per host bucket, built in a single
    * distributed pass with the custom `bloom_filter_agg`, broadcast as a
    * bucket→filter map, consulted per row so each frontier partition only
    * reads its own bucket's bits.
    */
  def perBucketPredicate(spark: SparkSession, seen: DataFrame,
      bucketCol: String, hashCol: String,
      expectedItemsPerBucket: Long = 1L << 18, fpp: Double = 0.01): Column = {
    import org.apache.spark.sql.functions.col
    // partition-inferred bucket columns read back as int32 — normalize
    val filters = seen
      .groupBy(col(bucketCol).cast("long").as("b"))
      .agg(bloomAgg(col(hashCol), expectedItemsPerBucket, fpp).as("bloom"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bloom"))
      .toMap
    val bc = spark.sparkContext.broadcast(filters)
    udf(new MightContainBucketed(bc))
      .apply(col(bucketCol).cast("long"), col(hashCol))
  }
}
