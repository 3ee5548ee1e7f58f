package graft.frontier

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class BloomSeenSpec extends SparkTestBase {
  import spark.implicits._

  test("bloom_filter_agg: no false negatives; per-bucket filters merge map-side") {
    val seen = (1L to 2000L).map(i => (i % 4, i * 31 + 7)).toDF("bucket", "url_hash")
    val filters = seen.groupBy("bucket")
      .agg(BloomSeen.bloomAgg(col("url_hash"), 4096, 0.01).as("bloom"))
      .collect()
      .map(r => r.getLong(0) -> BloomSeen.deserialize(r.getAs[Array[Byte]](1)))
      .toMap
    assert(filters.size == 4)
    // every inserted key must be might-contain in its bucket's filter
    (1L to 2000L).foreach { i =>
      assert(filters(i % 4).mightContainLong(i * 31 + 7), s"false negative for $i")
    }
    // fpp sanity: unseen keys mostly rejected
    val fp = (100000L to 101000L).count(k => filters(0L).mightContainLong(k))
    assert(fp < 100, s"false positive rate too high: $fp/1000")
  }

  test("file-per-bucket filters: no false negatives, incremental merge, bounded loads " +
      "(each routed partition touches only its own buckets' filters)") {
    val nBuckets = 8
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString + "/bloom"
    def keys(r: Range) = r.map(i => (i.toLong % nBuckets, i.toLong * 31 + 7))
      .toDF("bucket", "url_hash")

    // initial build at version 0, incremental merge at version 1
    BloomSeen.updateBucketFilters(spark, keys(1 to 1000), "bucket", "url_hash",
      dir, version = 0L, expectedItemsPerBucket = 4096, fpp = 0.01)
    assert(BloomSeen.filtersVersion(dir).contains(0L))
    BloomSeen.updateBucketFilters(spark, keys(1001 to 2000), "bucket", "url_hash",
      dir, version = 1L, expectedItemsPerBucket = 4096, fpp = 0.01)
    assert(BloomSeen.filtersVersion(dir).contains(1L))

    // route candidates by bucket (the scale layout), then apply the predicate
    val candidates = keys(1 to 6000)
    val counter = spark.sparkContext.longAccumulator("filters_loaded")
    val routed = candidates.repartition(nBuckets, col("bucket"))
    val kept = routed.filter(BloomSeen.fileBucketPredicate(dir, Some(counter)))
      .select("url_hash").as[Long].collect().toSet

    // no false negatives across BOTH commits (incremental merge preserved v0)
    (1 to 2000).foreach(i => assert(kept.contains(i.toLong * 31 + 7),
      s"false negative for $i"))
    // selective on the unseen tail
    assert(kept.size < 2600, s"prefilter not selective: ${kept.size}")
    // residency bound: every bucket's filter loaded at most once per task
    // that OWNS it — routed by bucket, that is ≤ nBuckets total loads
    // (not nBuckets × nPartitions)
    assert(counter.value <= nBuckets, s"loaded ${counter.value} > $nBuckets filters")
  }

  test("file-per-bucket rebuild: VERSION mismatch recovery drops stale files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom2").toString + "/bloom"
    val k1 = Seq((0L, 11L), (1L, 22L)).toDF("bucket", "url_hash")
    BloomSeen.updateBucketFilters(spark, k1, "bucket", "url_hash", dir, 0L, 1024, 0.01)
    val k2 = Seq((2L, 33L)).toDF("bucket", "url_hash")
    BloomSeen.rebuildBucketFilters(spark, k2, "bucket", "url_hash", dir, 5L, 1024, 0.01)
    assert(BloomSeen.filtersVersion(dir).contains(5L))
    // bucket 0/1 files were dropped by the rebuild → absent bucket is
    // conservatively might-contain (no false negatives under any state)
    val probe = Seq((0L, 11L), (2L, 33L), (2L, 999L)).toDF("bucket", "url_hash")
    val kept = probe.filter(BloomSeen.fileBucketPredicate(dir))
      .select("url_hash").as[Long].collect().toSet
    assert(kept.contains(11L)) // absent bucket → keep
    assert(kept.contains(33L)) // present key → keep
    assert(!kept.contains(999L)) // unseen key in present bucket → dropped
  }

  test("mightContainPredicate prefilter: keeps all seen, drops most unseen") {
    val seen = (1L to 1000L).map(i => i * 7).toDF("url_hash")
    val candidates = (1L to 3000L).map(i => i * 7).toDF("url_hash")
    val pred = BloomSeen.mightContainPredicate(spark, seen, "url_hash", 2048, 0.01)
    val kept = candidates.filter(pred).as[Long].collect().toSet
    (1L to 1000L).foreach(i => assert(kept.contains(i * 7), "bloom dropped a seen key"))
    assert(kept.size < 1300, s"prefilter not selective: ${kept.size}")
  }
}
