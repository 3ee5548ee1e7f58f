package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memoization of cached DataFrames.
  *
  * Operators that reuse an intermediate several times inside one plan
  * (LSH signatures, the license dimension) mark it `.cache()`. Calling the
  * operator again in the same session used to build an EQUAL plan and ask
  * the CacheManager to cache it again — harmless but noisy
  * ("Asked to cache already cached data" per invocation) and, for a
  * long-lived session, an unbounded pile of storage-memory entries that
  * nothing ever unpersists.
  *
  * This registry makes the cache a session-level singleton per logical
  * key: the FIRST invocation builds and caches; later invocations get the
  * same DataFrame instance back (no new CacheManager entry, no warning).
  * `clear(spark)` unpersists everything the session built — called by the
  * drivers (Verify/Bench) between sessions or at shutdown.
  *
  * Sessions are identified by a UUID held in a WEAK identity map — never
  * by `identityHashCode` (address hashes are reused after GC, which could
  * serve a dead session's DataFrame to a new session). Entries whose
  * session has been STOPPED are swept on the next entry-point call — any
  * of `cached`/`memo`/`memoValue`, not just `cached` (the cached
  * DataFrames strongly reference their session, so GC-based eviction can
  * never fire — liveness is checked via the SparkContext stop flag
  * instead; plain `values` hold no session reference, so their liveness
  * comes from a UUID → WeakReference side map consulted the same way).
  * A session that is abandoned without being stopped still needs an
  * explicit `clear`.
  *
  * Caveats:
  *  - Spark's CacheManager keys entries by CANONICAL PLAN, so external
  *    code calling `.unpersist()` on an equivalent plan evicts this entry
  *    too (the memoized DataFrame silently recomputes — a perf
  *    regression, never a correctness one).
  *  - Keys carry NO data-version component: a key like `shingles:<dir>`
  *    assumes the files under that path are immutable for the session's
  *    lifetime. Callers that rewrite a keyed input mid-session must use a
  *    new key (or `clear`) — otherwise later invocations serve the cached
  *    pre-rewrite epoch. The drivers honor this by treating every input
  *    dir as write-once per session.
  */
object PlanCache {

  // session object → stable UUID; weak keys let collected sessions drop
  // out (String values hold no back-reference to the key)
  private val sessionIds =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  // UUID → weak session reference: lets the `values` sweep check the stop
  // flag of a session its entries (by design) hold no reference to. A
  // collected referent counts as dead, so abandoned-and-GC'd sessions
  // sweep too.
  private val sessionRefs = new java.util.concurrent.ConcurrentHashMap[
    String, java.lang.ref.WeakReference[SparkSession]]()

  private def sessionKey(spark: SparkSession): String = {
    val k = sessionIds.computeIfAbsent(spark, _ => java.util.UUID.randomUUID().toString)
    sessionRefs.putIfAbsent(k, new java.lang.ref.WeakReference(spark))
    k
  }

  /** Drop entries whose owning session has been STOPPED (a cached
    * DataFrame strongly references its session, so a weak-map sweep could
    * never fire — the stop flag is the reliable liveness signal). Plain
    * `values` entries check the same flag through `sessionRefs`, so a
    * stopped-but-still-referenced session's values sweep exactly like its
    * DataFrames (they previously lingered until the session was GC'd).
    */
  private def sweep(): Unit = {
    entries.entrySet().removeIf { e =>
      try e.getValue.sparkSession.sparkContext.isStopped
      catch { case _: Throwable => true }
    }
    val dead = new java.util.HashSet[String]()
    sessionRefs.forEach { (k, ref) =>
      val s = ref.get()
      val stopped =
        s == null || (try s.sparkContext.isStopped catch { case _: Throwable => true })
      if (stopped) dead.add(k)
    }
    if (!dead.isEmpty) {
      values.keySet().removeIf(e => dead.contains(e._1))
      dead.forEach(k => sessionRefs.remove(k))
    }
  }

  /** Memoized `.cache()`: builds + caches on first use of `k` in this
    * session, returns the same cached instance afterwards.
    */
  def cached(spark: SparkSession, k: String)(build: => DataFrame): DataFrame = {
    sweep()
    entries.computeIfAbsent((sessionKey(spark), k), _ => build.cache())
  }

  /** Memoize WITHOUT caching (plan reuse only — keeps repeated query
    * invocations operating on the identical DataFrame instance so their
    * derived `cached` keys stay stable).
    */
  def memo(spark: SparkSession, k: String)(build: => DataFrame): DataFrame = {
    sweep()
    entries.computeIfAbsent((sessionKey(spark), k), _ => build)
  }

  // plain per-session values (collected dimension rows, anchor arrays…) —
  // session-scoped so a new session NEVER sees another epoch's data, and
  // sweepable by the weak session map (values hold no session reference,
  // so GC of an abandoned session does drop its weak entry)
  private val values =
    new java.util.concurrent.ConcurrentHashMap[(String, String), AnyRef]()

  /** Test seam: clear a session's weak reference so the next sweep sees
    * it as dead (specs share one JVM-wide SparkContext and can't stop a
    * real session; only the liveness INPUT is faked — the sweep logic
    * under test is the production path).
    */
  private[graft] def simulateSessionDeath(spark: SparkSession): Unit = {
    val k = sessionKey(spark)
    Option(sessionRefs.get(k)).foreach(_.clear())
  }

  /** Memoize a driver-side value per (session, key). */
  def memoValue[T <: AnyRef](spark: SparkSession, k: String)(build: => T): T = {
    sweep()
    values.computeIfAbsent((sessionKey(spark), k), _ => build).asInstanceOf[T]
  }

  /** Unpersist and forget every entry this session built. Safe only when
    * no returned DataFrame is still pending lazy execution (see the
    * globalRank lesson: unpersisting under a lazy consumer re-runs
    * sampling-dependent stages) — the drivers call it after their last
    * action.
    */
  def clear(spark: SparkSession): Unit = {
    val sk = sessionKey(spark)
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == sk) {
        try e.getValue.unpersist(false) catch { case _: Throwable => () }
        it.remove()
      }
    }
    values.keySet().removeIf(_._1 == sk)
  }
}
