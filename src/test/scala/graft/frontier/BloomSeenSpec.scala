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

  test("mightContainPredicate prefilter: keeps all seen, drops most unseen") {
    val seen = (1L to 1000L).map(i => i * 7).toDF("url_hash")
    val candidates = (1L to 3000L).map(i => i * 7).toDF("url_hash")
    val pred = BloomSeen.mightContainPredicate(spark, seen, "url_hash", 2048, 0.01)
    val kept = candidates.filter(pred).as[Long].collect().toSet
    (1L to 1000L).foreach(i => assert(kept.contains(i * 7), "bloom dropped a seen key"))
    assert(kept.size < 1300, s"prefilter not selective: ${kept.size}")
  }
}
