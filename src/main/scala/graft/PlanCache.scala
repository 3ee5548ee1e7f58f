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
  */
object PlanCache {

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), DataFrame]()

  private def key(spark: SparkSession, k: String): (Int, String) =
    (System.identityHashCode(spark), k)

  /** Memoized `.cache()`: builds + caches on first use of `k` in this
    * session, returns the same cached instance afterwards.
    *
    * Caveat: Spark's CacheManager keys entries by CANONICAL PLAN, so
    * external code calling `.unpersist()` on an equivalent plan evicts
    * this entry too (the memoized DataFrame silently recomputes — a
    * perf regression, never a correctness one).
    */
  def cached(spark: SparkSession, k: String)(build: => DataFrame): DataFrame =
    entries.computeIfAbsent(key(spark, k), _ => build.cache())

  /** Memoize WITHOUT caching (plan reuse only — keeps repeated query
    * invocations operating on the identical DataFrame instance so their
    * derived `cached` keys stay stable).
    */
  def memo(spark: SparkSession, k: String)(build: => DataFrame): DataFrame =
    entries.computeIfAbsent(key(spark, k), _ => build)

  /** Unpersist and forget every entry this session built. Safe only when
    * no returned DataFrame is still pending lazy execution (see the
    * globalRank lesson: unpersisting under a lazy consumer re-runs
    * sampling-dependent stages) — the drivers call it after their last
    * action.
    */
  def clear(spark: SparkSession): Unit = {
    val id = System.identityHashCode(spark)
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == id) {
        try e.getValue.unpersist(false) catch { case _: Throwable => () }
        it.remove()
      }
    }
  }
}
