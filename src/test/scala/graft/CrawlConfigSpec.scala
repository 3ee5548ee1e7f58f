package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.fetch.FetchStage.Politeness
import graft.fixtures.SyntheticStore
import graft.pipeline.CrawlPipeline

/** The validated config layer (reference `config.py:35-117` CONFIG_SCHEMA
  * parity): rule-by-rule rejection, JSON parse with unknown-key errors,
  * schedule equivalence under the default config, and budget changes
  * actually driving the politeness schedule.
  */
class CrawlConfigSpec extends SparkTestBase {
  import spark.implicits._

  test("default config is valid and reproduces the shipped constants") {
    assert(CrawlConfig.default.validate.isEmpty)
    assert(CrawlConfig.default.politeness == graft.fetch.FetchStage.defaultPoliteness)
    assert(CrawlConfig.default.seenFilters == graft.frontier.SeenFilters.bloom)
  }

  test("validation reports EVERY violation, cerberus-style") {
    val bad = CrawlConfig(
      politeness = Map(
        "GitHub.com" -> Politeness(5000L, 3), // upper-case host
        "ok.org" -> Politeness(0L, 99, budgetRequests = 5, windowMs = 0L)),
      fallbackPoliteness = Politeness(1000L, 3, budgetRequests = 0, windowMs = 7L),
      maxErrorRetries = 0,
      seenKind = "xor",
      autoCompactAlpha = -1.0)
    val errs = bad.validate
    assert(errs.exists(_.contains("GitHub.com")), errs.mkString("; "))
    assert(errs.exists(_.contains("minIntervalMs")), errs.mkString("; "))
    assert(errs.exists(_.contains("maxRetries")), errs.mkString("; "))
    assert(errs.exists(_.contains("windowMs must be >= 1")), errs.mkString("; "))
    assert(errs.exists(_.contains("windowMs requires budgetRequests")))
    assert(errs.exists(_.contains("maxErrorRetries")))
    assert(errs.exists(_.contains("seenKind")))
    assert(errs.exists(_.contains("autoCompactAlpha")))
    assert(errs.size >= 8)
    val thrown = intercept[IllegalArgumentException](bad.validated)
    assert(thrown.getMessage.contains("seenKind"))
  }

  test("host validation is a full hostname grammar, not a character " +
      "blocklist (VERDICT r4 wrong-list #2)") {
    def hostErrs(h: String): Seq[String] =
      CrawlConfig(politeness = Map(h -> Politeness(1000L, 3))).validate
    // the silent-misconfiguration class: typo'd hosts that would never
    // match a real hosting_id
    for (bad <- Seq("github .com", "user@github.com", "g#h.com", "",
        "-lead.com", "trail-.com", "a..b", ".dot.com", "dot.com."))
      assert(hostErrs(bad).exists(_.contains("bare lowercase hostname")),
        s"'$bad' must be rejected")
    for (ok <- Seq("github.com", "certification.oshwa.org", "a-b.co", "x",
        "0digit.net"))
      assert(hostErrs(ok).isEmpty, s"'$ok' must be accepted: ${hostErrs(ok)}")
  }

  test("fromJson: defaults-merged parse; unknown keys are errors") {
    val Right(cfg) = CrawlConfig.fromJson(
      """{"politeness": {"thingiverse.com": {"min_interval_ms": 2000}},
        |  "seen_kind": "cuckoo", "auto_compact_alpha": 2.5}""".stripMargin)
    assert(cfg.politeness("thingiverse.com").minIntervalMs == 2000L)
    // unspecified politeness fields keep the host's defaults
    assert(cfg.politeness("thingiverse.com").maxRetries == 3)
    // unmentioned hosts keep their default budgets (defaults-merged)
    assert(cfg.politeness("github.com") ==
      graft.fetch.FetchStage.defaultPoliteness("github.com"))
    assert(cfg.seenKind == "cuckoo" && cfg.autoCompactAlpha == 2.5)

    val Left(errs) = CrawlConfig.fromJson(
      """{"politness": {}, "politeness": {"x.org": {"min_intervalms": 9}}}""")
    assert(errs.exists(_.contains("unknown config key 'politness'")))
    assert(errs.exists(_.contains("unknown key 'min_intervalms'")))
    val Left(malformed) = CrawlConfig.fromJson("{nope")
    assert(malformed.exists(_.contains("malformed")))

    // wrong-typed sections/fields are per-field errors, never silently the
    // defaults and never a blanket "malformed JSON"
    val Left(typed) = CrawlConfig.fromJson(
      """{"politeness": ["github.com"], "fallback": 1000,
        |  "seen_kind": 5, "max_error_retries": 4294967299,
        |  "auto_compact_alpha": "x"}""".stripMargin)
    assert(typed.exists(_.contains("politeness must be an object")))
    assert(typed.exists(_.contains("fallback must be an object")))
    assert(typed.exists(_.contains("seen_kind must be a string")))
    assert(typed.exists(_.contains("max_error_retries out of range")))
    assert(typed.exists(_.contains("auto_compact_alpha must be a number")))
    val Left(frac) = CrawlConfig.fromJson(
      """{"politeness": {"x.org": {"min_interval_ms": 2.5}}}""")
    assert(frac.exists(_.contains("must be an integer")))
    // integral decimal/exponent forms (what json emitters produce for
    // whole numbers) are ACCEPTED, not spuriously rejected
    val Right(deci) = CrawlConfig.fromJson(
      """{"fallback": {"min_interval_ms": 2000.0, "max_retries": 1e1}}""")
    assert(deci.fallbackPoliteness.minIntervalMs == 2000L)
    assert(deci.fallbackPoliteness.maxRetries == 10)
  }

  test("fromYaml: the reference's YAML user-config shape parses to the " +
      "same config as its JSON twin (sample-config.yml parity)") {
    // sample-config.yml shape: nested per-host mappings, inline comments
    val yaml =
      """# crawl budgets
        |politeness:
        |  github.com:
        |    min_interval_ms: 9000   # (opt) secondary rate limit
        |    budget_requests: 10
        |    window_ms: 60000
        |  thingiverse.com:
        |    min_interval_ms: 2000
        |fallback:
        |  min_interval_ms: 1500
        |max_error_retries: 5
        |seen_kind: cuckoo
        |rdf_sink: true
        |auto_compact_alpha: 2.0
        |""".stripMargin
    val json =
      """{"politeness": {
        |   "github.com": {"min_interval_ms": 9000, "budget_requests": 10,
        |                  "window_ms": 60000},
        |   "thingiverse.com": {"min_interval_ms": 2000}},
        | "fallback": {"min_interval_ms": 1500},
        | "max_error_retries": 5, "seen_kind": "cuckoo", "rdf_sink": true,
        | "auto_compact_alpha": 2.0}""".stripMargin
    val Right(fromY) = CrawlConfig.fromYaml(yaml)
    val Right(fromJ) = CrawlConfig.fromJson(json)
    assert(fromY == fromJ)
    assert(fromY.politeness("github.com") ==
      Politeness(9000L, 3, budgetRequests = 10, windowMs = 60000L))
    assert(fromY.politeness("github.com").maxRetries == 3) // defaults-merged
    assert(fromY.seenKind == "cuckoo" && fromY.rdfSink)

    // unknown keys are errors in YAML exactly like JSON
    val Left(errs) = CrawlConfig.fromYaml(
      """politeness:
        |  github.com:
        |    min_intervalms: 9
        |fetchers: {}
        |""".stripMargin)
    assert(errs.exists(_.contains("unknown key 'min_intervalms'")))
    assert(errs.exists(_.contains("unknown config key 'fetchers'")))
    // validation runs on the parsed result too
    val Left(v) = CrawlConfig.fromYaml("politeness:\n  BAD HOST:\n    min_interval_ms: 1\n")
    assert(v.exists(_.contains("bare lowercase hostname")))
  }

  test("seenFilters throws on an unknown kind instead of silently " +
      "falling back to bloom") {
    intercept[IllegalArgumentException](
      CrawlConfig(seenKind = "cuckooo").seenFilters)
    assert(CrawlConfig(seenKind = "cuckoo").seenFilters ==
      graft.frontier.SeenFilters.cuckoo)
  }

  test("runConfigured: default config ≡ default run; a changed interval " +
      "re-paces exactly that host's schedule") {
    val n = 120L
    val store = Files.createTempDirectory("graft-store-cfg").toString
    SyntheticStore.ensureOnDisk(spark, store, n)
    def fetchLog(root: String) =
      CrawlPipeline.fetchLogStore(root).read(spark).get
        .select("unit_path", "hosting_id", "pos", "scheduled_ms",
          "completed_ms", "retries", "status")
        .as[(String, String, Long, Long, Long, Int, String)].collect().toSet

    val rootDefault = Files.createTempDirectory("graft-cfg-a").toString
    val rootConfigured = Files.createTempDirectory("graft-cfg-b").toString
    CrawlPipeline.run(spark, store, rootDefault)
    CrawlPipeline.runConfigured(spark, store, rootConfigured, CrawlConfig.default)
    assert(fetchLog(rootDefault) == fetchLog(rootConfigured),
      "default config changed the schedule")

    // double thingiverse's interval → thingiverse completions pace at
    // 2000 ms × attempts; every other host's schedule is untouched
    val cfg = CrawlConfig.default.copy(politeness =
      CrawlConfig.default.politeness.updated("thingiverse.com",
        Politeness(2000L, 3)))
    val rootSlow = Files.createTempDirectory("graft-cfg-c").toString
    CrawlPipeline.runConfigured(spark, store, rootSlow, cfg)
    val slow = fetchLog(rootSlow)
    val thingi = slow.filter(r => r._2 == "thingiverse.com" && r._7 != "robots_denied")
    assert(thingi.nonEmpty)
    thingi.foreach { case (_, _, _, scheduled, completed, retries, _) =>
      assert(completed - scheduled == 2000L * (retries + 1),
        s"interval not re-paced: $scheduled..$completed retries=$retries")
    }
    assert(slow.filter(_._2 != "thingiverse.com") ==
      fetchLog(rootDefault).filter(_._2 != "thingiverse.com"),
      "other hosts' schedules must be unchanged")
  }
}
