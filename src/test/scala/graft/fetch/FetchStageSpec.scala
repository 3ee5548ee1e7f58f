package graft.fetch

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class FetchStageSpec extends SparkTestBase {
  import spark.implicits._

  private def tasks(n: Int, host: String) =
    (1 to n).map(i => FetchTask(s"$host/u$i", host, i.toLong, 1, i.toLong,
      i.toLong * 31, i % 4, content_hash = i.toLong * 7,
      robots_denied = false)).toDS()

  test("robots Crawl-delay raises the per-host politeness interval") {
    val base = Map("a.com" -> FetchStage.Politeness(1000L, 3),
      "b.com" -> FetchStage.Politeness(8000L, 3))
    val robots = Map(
      "a.com" -> graft.model.Robots.parse("User-agent: *\nDisallow:\nCrawl-delay: 5\n"),
      "b.com" -> graft.model.Robots.parse("User-agent: *\nCrawl-delay: 2\n"))
    val merged = FetchStage.politenessWithRobots(base, robots)
    assert(merged("a.com").minIntervalMs == 5000L) // robots wins
    assert(merged("b.com").minIntervalMs == 8000L) // platform wins
  }

  test("robots Crawl-delay for a host ABSENT from the platform map still applies") {
    val base = Map("a.com" -> FetchStage.Politeness(1000L, 3))
    val robots = Map(
      "new-host.org" -> graft.model.Robots.parse("User-agent: *\nCrawl-delay: 7\n"))
    val merged = FetchStage.politenessWithRobots(base, robots)
    // synthesized from the fetch-stage fallback (1000ms, 3 retries), raised
    // to the robots-mandated 7s — previously silently dropped
    assert(merged("new-host.org").minIntervalMs == 7000L)
    assert(merged("new-host.org").maxRetries == 3)
    assert(merged("a.com").minIntervalMs == 1000L)
  }

  test("R1 window budget: exhausted budget sleeps to the window reset (ref rate_limit.py:15-34)") {
    // 100ms interval, 5 requests per 1000ms window → requests 6.. jump to
    // the next window even though the interval alone would allow them
    val pol = Map("api.test" -> FetchStage.Politeness(100L, 3,
      budgetRequests = 5, windowMs = 1000L))
    val log = FetchStage.run(spark, tasks(12, "api.test"), pol,
      outcome = _ => FetchStage.Outcome("ok", 0))
      .orderBy("pos").collect()
    // within every 1000ms window at most 5 fetches start
    val byWindow = log.groupBy(_.scheduled_ms / 1000L).view.mapValues(_.length).toMap
    assert(byWindow.values.max <= 5, s"window overflow: $byWindow")
    // the 6th fetch waited for the reset, not just the interval
    assert(log(5).scheduled_ms == 1000L,
      s"6th fetch started at ${log(5).scheduled_ms}, expected window reset at 1000")
    // and fetches within a window still honor the fixed interval
    log.sliding(2).foreach { case Array(a, b) =>
      assert(b.scheduled_ms >= a.completed_ms)
    }
  }

  test("R1+R3: retries count against the window budget") {
    // every request needs 2 attempts → only 2 fetches (4 attempts ≤ 5) fit
    // per window; the 3rd fetch of a window must wait for the reset
    val pol = Map("api.test" -> FetchStage.Politeness(100L, 3,
      budgetRequests = 5, windowMs = 1000L))
    val log = FetchStage.run(spark, tasks(6, "api.test"), pol,
      outcome = _ => FetchStage.Outcome("ok", 1))
      .orderBy("pos").collect()
    assert(log.forall(_.retries == 1))
    val byWindow = log.groupBy(_.scheduled_ms / 1000L).view
      .mapValues(_.map(_.retries + 1).sum).toMap
    assert(byWindow.values.max <= 5, s"attempt budget overflow: $byWindow")
  }

  test("R2 salted budget split: k buckets each fetch every k x interval (aggregate rate preserved)") {
    val pol = Map("big.host" -> FetchStage.Politeness(1000L, 3))
    val log = FetchStage.run(spark, tasks(40, "big.host"), pol,
      outcome = _ => FetchStage.Outcome("ok", 0),
      salts = Map("big.host" -> 4))
      .collect()
    // per salt bucket: gaps of 4 x 1000ms
    val bySalt = log.groupBy(_.id % 4)
    bySalt.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.pos)
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(b.scheduled_ms - a.scheduled_ms >= 4000L, "salted bucket over-fetched")
      case _ => ()
      }
    }
    // aggregate: ≤ 4 fetch starts in any 4-second span ⇒ ~1 req/s host-wide
    val starts = log.map(_.scheduled_ms).sorted
    starts.sliding(5).foreach { w =>
      if (w.length == 5) assert(w.last - w.head >= 4000L, "aggregate host rate exceeded")
    }
  }
}
