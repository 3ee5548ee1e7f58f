package graft.frontier

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Cuckoo URL-seen sketch: the Bloom twin's contract (no false negatives,
  * per-bucket files, bounded residency) PLUS deletion — the targeted-
  * invalidation capability that motivates the cuckoo option.
  */
class CuckooSeenSpec extends SparkTestBase {
  import spark.implicits._

  test("CuckooFilter: insert/lookup no false negatives; low fpp; delete " +
      "un-sees a key; merge == union; saturation degrades to always-true") {
    val f = CuckooFilter.create(50000)
    (1L to 50000L).foreach(i => f.insert(i * 31 + 7))
    assert(!f.saturated)
    (1L to 50000L).foreach(i =>
      assert(f.mightContain(i * 31 + 7), s"false negative for $i"))
    // fpp: disjoint probe set (16-bit fingerprints → ~0.01% expected)
    val fp = (10000000L to 10100000L).count(f.mightContain)
    assert(fp < 200, s"false positive rate too high: $fp/100001")

    // delete: removed keys report unseen, the rest stay seen
    (1L to 1000L).foreach(i => assert(f.delete(i * 31 + 7), s"delete missed $i"))
    val resurrected = (1L to 1000L).count(i => f.mightContain(i * 31 + 7))
    // only fingerprint-collisions with surviving keys may still answer true
    assert(resurrected < 20, s"deleted keys still present: $resurrected/1000")
    (1001L to 50000L).foreach(i =>
      assert(f.mightContain(i * 31 + 7), s"delete damaged unrelated key $i"))

    // idempotent re-insert: same key twice occupies one slot
    val g = CuckooFilter.create(1000)
    g.insert(42L); g.insert(42L)
    assert(g.occupiedSlots == 1)
    assert(g.delete(42L) && !g.mightContain(42L))

    // merge re-homes every fingerprint: union contract, no false negatives
    val a = CuckooFilter.create(4000)
    val b = CuckooFilter.create(4000)
    (1L to 2000L).foreach(i => a.insert(i))
    (2001L to 4000L).foreach(i => b.insert(i))
    a.mergeInPlace(b)
    (1L to 4000L).foreach(i => assert(a.mightContain(i), s"merge lost $i"))

    // serialization round-trip preserves contents + saturation flag
    val rt = CuckooFilter.deserialize(a.serialized)
    (1L to 4000L).foreach(i => assert(rt.mightContain(i)))
    assert(!rt.saturated)

    // saturation: overfill far past capacity → always-true, never FN
    val tiny = CuckooFilter.create(64)
    (1L to 10000L).foreach(i => tiny.insert(i))
    assert(tiny.saturated)
    (1L to 10000L).foreach(i => assert(tiny.mightContain(i)))
    assert(tiny.mightContain(987654321L)) // degraded fpp=1, by contract
    assert(CuckooFilter.deserialize(tiny.serialized).saturated)
  }

  test("file-per-bucket filters: no false negatives, incremental merge, " +
      "bounded loads (same protocol as the Bloom twin)") {
    val nBuckets = 8
    val dir = java.nio.file.Files.createTempDirectory("graft-cuckoo").toString + "/cuckoo"
    def keys(r: Range) = r.map(i => (i.toLong % nBuckets, i.toLong * 31 + 7))
      .toDF("bucket", "url_hash")

    CuckooSeen.updateBucketFilters(spark, keys(1 to 1000), "bucket", "url_hash",
      dir, version = 0L, expectedItemsPerBucket = 4096)
    assert(CuckooSeen.filtersVersion(dir).contains(0L))
    CuckooSeen.updateBucketFilters(spark, keys(1001 to 2000), "bucket", "url_hash",
      dir, version = 1L, expectedItemsPerBucket = 4096)
    assert(CuckooSeen.filtersVersion(dir).contains(1L))

    val candidates = keys(1 to 6000)
    val counter = spark.sparkContext.longAccumulator("cuckoo_loaded")
    val routed = candidates.repartition(nBuckets, col("bucket"))
    val kept = routed.filter(CuckooSeen.fileBucketPredicate(dir, Some(counter)))
      .select("url_hash").as[Long].collect().toSet

    (1 to 2000).foreach(i => assert(kept.contains(i.toLong * 31 + 7),
      s"false negative for $i"))
    assert(kept.size < 2600, s"prefilter not selective: ${kept.size}")
    assert(counter.value <= nBuckets, s"loaded ${counter.value} > $nBuckets filters")

    // targeted invalidation: remove 200 keys → they fall out of the
    // prefilter (re-fetchable) while every surviving key stays present
    assert(CuckooSeen.removeKeys(spark, keys(1 to 200), "bucket", "url_hash", dir) == 0L,
      "healthy filters must report zero failed deletions")
    val kept2 = candidates.repartition(nBuckets, col("bucket"))
      .filter(CuckooSeen.fileBucketPredicate(dir))
      .select("url_hash").as[Long].collect().toSet
    val stillSeen = (1 to 200).count(i => kept2.contains(i.toLong * 31 + 7))
    assert(stillSeen < 10, s"invalidated keys still prefiltered: $stillSeen/200")
    (201 to 2000).foreach(i => assert(kept2.contains(i.toLong * 31 + 7),
      s"invalidation damaged unrelated key $i"))
    // VERSION not advanced: filters still cover the same url_seen snapshot
    assert(CuckooSeen.filtersVersion(dir).contains(1L))

    // a SATURATED bucket filter cannot honor deletions — removeKeys must
    // SAY so (non-zero return), not silently under-invalidate
    val satDir = java.nio.file.Files.createTempDirectory("graft-cuckoo-sat")
      .toString + "/cuckoo"
    CuckooSeen.updateBucketFilters(spark, keys(1 to 2000), "bucket", "url_hash",
      satDir, version = 0L, expectedItemsPerBucket = 16) // far undersized
    val failed = CuckooSeen.removeKeys(spark, keys(1 to 80), "bucket", "url_hash", satDir)
    assert(failed > 0L, "saturated filters must report failed deletions")
  }
}
