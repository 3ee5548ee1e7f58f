package graft.frontier

/** Cuckoo filter over 64-bit keys (Fan, Andersen, Kaminsky, Mitzenmacher:
  * "Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014) — the
  * alternative URL-seen sketch the north rule names next to Bloom. Same
  * no-false-negative contract for inserted keys, comparable space at 1%
  * fpp, plus one capability Bloom structurally lacks: **deletion**, which
  * backs targeted frontier invalidation (re-crawl one host / one bucket)
  * without rebuilding the whole filter set.
  *
  * Layout: `numBuckets` (power of two) buckets × 4 slots × 16-bit
  * fingerprints (0 = empty slot; fingerprints are never 0). An item's two
  * candidate buckets are `i1 = spread(key)` and `i2 = i1 ^ spread(fp)`
  * (partial-key cuckoo hashing — `i2 ^ spread(fp)` recovers `i1`, so any
  * stored fingerprint can be displaced without the original key; this is
  * also what makes two same-shape filters mergeable slot-by-slot).
  *
  * Degradation contract: when an insert exhausts `MaxKicks` displacements
  * the filter marks itself `saturated` and `mightContain` answers true for
  * everything from then on — identical conservative failure mode to an
  * over-full Bloom (false positives rise, false negatives stay impossible).
  *
  * Duplicate semantics: inserting an already-present fingerprint at the
  * same bucket pair is a no-op (idempotent re-insert, like
  * `BloomFilter.putLong`). Consequently `delete` removes the single stored
  * copy for ALL keys sharing (fp, bucket-pair) — a deliberate trade
  * documented at the call site: deletion is an INVALIDATION primitive (the
  * collateral key is merely re-fetched / re-visited, never lost), not a
  * multiset count.
  */
final class CuckooFilter private (
    val numBuckets: Int,
    private val slots: Array[Short], // numBuckets * SlotsPerBucket
    private var saturatedFlag: Boolean) extends Serializable {

  import CuckooFilter._

  def saturated: Boolean = saturatedFlag

  private def mask: Int = numBuckets - 1

  @inline private def slotBase(bucket: Int): Int = bucket * SlotsPerBucket

  private def bucketHas(bucket: Int, fp: Short): Boolean = {
    val base = slotBase(bucket)
    var i = 0
    while (i < SlotsPerBucket) {
      if (slots(base + i) == fp) return true
      i += 1
    }
    false
  }

  private def tryInsertAt(bucket: Int, fp: Short): Boolean = {
    val base = slotBase(bucket)
    var i = 0
    while (i < SlotsPerBucket) {
      if (slots(base + i) == 0) { slots(base + i) = fp; return true }
      i += 1
    }
    false
  }

  private def removeAt(bucket: Int, fp: Short): Boolean = {
    val base = slotBase(bucket)
    var i = 0
    while (i < SlotsPerBucket) {
      if (slots(base + i) == fp) { slots(base + i) = 0; return true }
      i += 1
    }
    false
  }

  /** Insert; returns false only when the filter had to declare saturation
    * (the key is still treated as present afterwards — mightContain is
    * always-true once saturated, so no false negative either way).
    */
  def insert(key: Long): Boolean = {
    if (saturatedFlag) return true
    val fp = fingerprint(key)
    val i1 = spread(key) & mask
    val i2 = altIndex(i1, fp, mask)
    // idempotent re-insert: already present at either home → done
    if (bucketHas(i1, fp) || bucketHas(i2, fp)) return true
    if (tryInsertAt(i1, fp) || tryInsertAt(i2, fp)) return true
    // evict loop: displace a random-ish victim slot along the cuckoo path
    var cur = if ((spread(key ^ 0x632be5abL) & 1) == 0) i1 else i2
    var f = fp
    var kick = 0
    var rnd: Long = spread(key).toLong | 1L
    while (kick < MaxKicks) {
      val base = slotBase(cur)
      rnd = rnd * 0x5DEECE66DL + 0xBL // LCG: deterministic victim choice
      val victim = ((rnd >>> 16) & (SlotsPerBucket - 1)).toInt
      val displaced = slots(base + victim)
      slots(base + victim) = f
      f = displaced
      cur = altIndex(cur, f, mask)
      if (tryInsertAt(cur, f)) return true
      kick += 1
    }
    // table effectively full: degrade loudly-but-safely (like a Bloom past
    // its sizing, fpp → 1) — `f` stays displaced, which is fine because
    // saturation makes every lookup positive
    saturatedFlag = true
    false
  }

  def mightContain(key: Long): Boolean = {
    if (saturatedFlag) return true
    val fp = fingerprint(key)
    val i1 = spread(key) & mask
    bucketHas(i1, fp) || bucketHas(altIndex(i1, fp, mask), fp)
  }

  /** Remove one stored copy of the key's fingerprint (see class doc for the
    * shared-fingerprint invalidation semantics). Returns false when the key
    * was not present (or the filter is saturated — a saturated filter has
    * lost slot fidelity and can only be rebuilt).
    */
  def delete(key: Long): Boolean = {
    if (saturatedFlag) return false
    val fp = fingerprint(key)
    val i1 = spread(key) & mask
    removeAt(i1, fp) || removeAt(altIndex(i1, fp, mask), fp)
  }

  /** Merge `other` into this (same numBuckets required): re-home every
    * stored fingerprint via its (slot index, fp) pair. Saturation is
    * sticky; an overflow during the merge saturates too.
    */
  def mergeInPlace(other: CuckooFilter): CuckooFilter = {
    require(other.numBuckets == numBuckets,
      s"cuckoo sizing mismatch: $numBuckets vs ${other.numBuckets} buckets")
    if (other.saturatedFlag) saturatedFlag = true
    if (saturatedFlag) return this
    var bucket = 0
    while (bucket < other.numBuckets && !saturatedFlag) {
      val base = other.slotBase(bucket)
      var i = 0
      while (i < SlotsPerBucket && !saturatedFlag) {
        val fp = other.slots(base + i)
        if (fp != 0) insertFingerprintAt(bucket, fp)
        i += 1
      }
      bucket += 1
    }
    this
  }

  /** Insert a bare (bucket, fingerprint) pair — the merge path, where the
    * original key is gone but both homes are recoverable from the pair.
    */
  private def insertFingerprintAt(bucket: Int, fp: Short): Unit = {
    val alt = altIndex(bucket, fp, mask)
    if (bucketHas(bucket, fp) || bucketHas(alt, fp)) return
    if (tryInsertAt(bucket, fp) || tryInsertAt(alt, fp)) return
    var cur = bucket
    var f = fp
    var kick = 0
    var rnd: Long = ((bucket.toLong << 17) ^ (fp & 0xFFFFL)) | 1L
    while (kick < MaxKicks) {
      val base = slotBase(cur)
      rnd = rnd * 0x5DEECE66DL + 0xBL
      val victim = ((rnd >>> 16) & (SlotsPerBucket - 1)).toInt
      val displaced = slots(base + victim)
      slots(base + victim) = f
      f = displaced
      cur = altIndex(cur, f, mask)
      if (tryInsertAt(cur, f)) return
      kick += 1
    }
    saturatedFlag = true
  }

  def occupiedSlots: Int = {
    var n = 0; var i = 0
    while (i < slots.length) { if (slots(i) != 0) n += 1; i += 1 }
    n
  }

  def serialized: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 1 + slots.length * 2)
    bb.putInt(Magic)
    bb.putInt(numBuckets)
    bb.put(if (saturatedFlag) 1.toByte else 0.toByte)
    slots.foreach(bb.putShort)
    bb.array()
  }
}

object CuckooFilter {
  val SlotsPerBucket = 4
  val MaxKicks = 500
  private val Magic = 0x43554b46 // "CUKF"

  /** Sized like `BloomFilter.create(expectedItems, fpp)`: 4 slots/bucket at
    * ≤95% target load → buckets = next power of two of expectedItems/3.2.
    * 16-bit fingerprints give ~2×4/2^16 ≈ 0.012% per-lookup collision rate,
    * well under the 1% the Bloom twin is sized for.
    */
  def create(expectedItems: Long): CuckooFilter = {
    val wanted = math.max(1L, math.ceil(expectedItems / 3.2).toLong)
    val buckets = math.max(2L, java.lang.Long.highestOneBit(wanted - 1 max 1) * 2)
    // fail loudly instead of overflowing Int: the slots array holds
    // buckets × 4 Shorts and `serialized` allocates 2 bytes per slot + 9,
    // so the safe ceiling is 2^27 buckets (2^29 slots, 1 GiB serialized) ≈
    // 5×10^8 items — beyond that, shard across MORE buckets (the
    // file-per-bucket layout), not bigger filters
    require(buckets <= (1L << 27),
      s"cuckoo filter for $expectedItems items exceeds single-filter " +
        s"capacity (~5e8); shard across more buckets instead")
    val n = buckets.toInt
    new CuckooFilter(n, new Array[Short](n * SlotsPerBucket), false)
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.getInt() == Magic, "not a cuckoo filter blob")
    val n = bb.getInt()
    val sat = bb.get() == 1
    val slots = new Array[Short](n * SlotsPerBucket)
    var i = 0
    while (i < slots.length) { slots(i) = bb.getShort(); i += 1 }
    new CuckooFilter(n, slots, sat)
  }

  /** 64→32 bit mix (splitmix64 finalizer) — bucket index base. */
  @inline private[frontier] def spread(h: Long): Int = {
    var z = h + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)).toInt
  }

  /** Non-zero 16-bit fingerprint from an INDEPENDENT mix of the key. */
  @inline private[frontier] def fingerprint(h: Long): Short = {
    var z = (h ^ 0xC2B2AE3D27D4EB4FL) * 0x165667B19E3779F9L
    z ^= z >>> 29
    val fp = (z & 0xFFFF).toInt
    (if (fp == 0) 1 else fp).toShort
  }

  /** Partial-key cuckoo: the other home of (index, fp); involutive. */
  @inline private[frontier] def altIndex(index: Int, fp: Short, mask: Int): Int =
    (index ^ spread(fp & 0xFFFFL)) & mask
}
