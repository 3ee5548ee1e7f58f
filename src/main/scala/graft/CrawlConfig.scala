package graft

import graft.fetch.FetchStage.Politeness
import graft.tables.Json

/** Typed, validated crawl configuration — the engine twin of the
  * reference's validated user config (`config.py:35-117` `CONFIG_SCHEMA`,
  * cerberus-checked before any fetcher starts): politeness budgets, retry
  * bounds, the URL-seen sketch kind, sink toggles, and the compaction
  * policy stop being code constants and become data the user supplies and
  * the engine REJECTS when invalid (schema-style rule list, every
  * violation reported, not just the first).
  *
  * `CrawlConfig.default` reproduces exactly the constants the pipeline has
  * shipped with since round 1 (ConfigSpec pins schedule equality), so the
  * config layer is purely additive surface.
  */
final case class CrawlConfig(
    politeness: Map[String, Politeness] = graft.fetch.FetchStage.defaultPoliteness,
    fallbackPoliteness: Politeness = graft.fetch.FetchStage.FallbackPoliteness,
    maxErrorRetries: Int = 3,
    seenKind: String = "bloom",
    rdfSink: Boolean = false,
    rawSink: Boolean = false,
    autoCompactAlpha: Double = 1.0) {

  /** Every rule violation (empty = valid). Mirrors the reference schema's
    * per-field constraint style: min/max bounds, allowed enums, dependent
    * fields (a request budget requires a window).
    */
  def validate: Seq[String] = {
    def checkPoliteness(where: String, p: Politeness): Seq[String] = Seq(
      Option.when(p.minIntervalMs < 1)(
        s"$where.minIntervalMs must be >= 1 (got ${p.minIntervalMs})"),
      Option.when(p.maxRetries < 0 || p.maxRetries > 10)(
        s"$where.maxRetries must be in [0, 10] (got ${p.maxRetries})"),
      Option.when(p.budgetRequests < 0)(
        s"$where.budgetRequests must be >= 0 (got ${p.budgetRequests})"),
      Option.when(p.budgetRequests > 0 && p.windowMs < 1)(
        s"$where.windowMs must be >= 1 when budgetRequests is set"),
      Option.when(p.budgetRequests == 0 && p.windowMs != 0)(
        s"$where.windowMs requires budgetRequests")).flatten
    val hostRules = politeness.toSeq.sortBy(_._1).flatMap { case (host, p) =>
      val hostErr = Option.when(
        host.isEmpty || host.exists(c => c == '/' || c == ':' || c.isUpper))(
        s"politeness host '$host' must be a bare lowercase hostname")
      hostErr.toSeq ++ checkPoliteness(s"politeness['$host']", p)
    }
    hostRules ++ checkPoliteness("fallbackPoliteness", fallbackPoliteness) ++ Seq(
      Option.when(maxErrorRetries < 1 || maxErrorRetries > 100)(
        s"maxErrorRetries must be in [1, 100] (got $maxErrorRetries)"),
      Option.when(!CrawlConfig.SeenKinds.contains(seenKind))(
        s"seenKind must be one of ${CrawlConfig.SeenKinds.mkString("/")} (got '$seenKind')"),
      Option.when(autoCompactAlpha < 0 || autoCompactAlpha.isNaN)(
        s"autoCompactAlpha must be >= 0 (got $autoCompactAlpha)")).flatten
  }

  /** Validate-or-throw, every violation in the message (the reference
    * raises on its cerberus errors dict the same way).
    */
  def validated: CrawlConfig = {
    val errs = validate
    require(errs.isEmpty, s"invalid crawl config:\n  ${errs.mkString("\n  ")}")
    this
  }

  def seenFilters: graft.frontier.SeenFilterStore = seenKind match {
    case "cuckoo" => graft.frontier.SeenFilters.cuckoo
    case _        => graft.frontier.SeenFilters.bloom
  }
}

object CrawlConfig {
  val SeenKinds: Set[String] = Set("bloom", "cuckoo")

  val default: CrawlConfig = CrawlConfig()

  /** Parse the JSON user-config shape (all fields optional — omitted
    * fields keep their defaults, exactly like the reference's
    * defaults-merged config dict):
    *
    * ```json
    * {"politeness": {"github.com": {"min_interval_ms": 5000,
    *    "max_retries": 3, "budget_requests": 30, "window_ms": 60000}},
    *  "fallback": {"min_interval_ms": 1000},
    *  "max_error_retries": 3, "seen_kind": "bloom",
    *  "rdf_sink": false, "raw_sink": false, "auto_compact_alpha": 1.0}
    * ```
    *
    * Unknown top-level or politeness keys are ERRORS (cerberus rejects
    * unknown fields rather than silently ignoring a typo'd budget).
    */
  def fromJson(input: String): Either[Seq[String], CrawlConfig] = {
    val topKeys = Set("politeness", "fallback", "max_error_retries",
      "seen_kind", "rdf_sink", "raw_sink", "auto_compact_alpha")
    val polKeys = Set("min_interval_ms", "max_retries", "budget_requests",
      "window_ms")
    try {
      val j = Json.parse(input).asInstanceOf[Json.JObj]
      val unknownTop = j.v.map(_._1).filterNot(topKeys)
        .map(k => s"unknown config key '$k'")
      def politenessOf(o: Json.JObj, where: String,
          base: Politeness): (Politeness, Seq[String]) = {
        val unknown = o.v.map(_._1).filterNot(polKeys)
          .map(k => s"unknown key '$k' in $where")
        def num(k: String, dflt: Long): Long =
          o.get(k).map(_.asInstanceOf[Json.JNum].toLong).getOrElse(dflt)
        (Politeness(
          minIntervalMs = num("min_interval_ms", base.minIntervalMs),
          maxRetries = num("max_retries", base.maxRetries.toLong).toInt,
          budgetRequests = num("budget_requests", base.budgetRequests.toLong).toInt,
          windowMs = num("window_ms", base.windowMs)), unknown)
      }
      val d = default
      val (pol, polErrs) = j.get("politeness") match {
        case Some(po: Json.JObj) =>
          val entries = po.v.map { case (host, v) =>
            val (p, errs) = politenessOf(v.asInstanceOf[Json.JObj],
              s"politeness['$host']",
              d.politeness.getOrElse(host, d.fallbackPoliteness))
            (host -> p, errs)
          }
          // hosts present in the defaults but absent from the user map keep
          // their default budgets (defaults-merged, like the reference)
          (d.politeness ++ entries.map(_._1).toMap, entries.flatMap(_._2))
        case _ => (d.politeness, Nil)
      }
      val (fb, fbErrs) = j.get("fallback") match {
        case Some(o: Json.JObj) =>
          politenessOf(o, "fallback", d.fallbackPoliteness)
        case _ => (d.fallbackPoliteness, Nil)
      }
      def bool(k: String, dflt: Boolean): Boolean =
        j.get(k).map(_.asInstanceOf[Json.JBool].v).getOrElse(dflt)
      val cfg = CrawlConfig(
        politeness = pol,
        fallbackPoliteness = fb,
        maxErrorRetries = j.get("max_error_retries")
          .map(_.asInstanceOf[Json.JNum].toLong.toInt)
          .getOrElse(d.maxErrorRetries),
        seenKind = j.get("seen_kind")
          .map(_.asInstanceOf[Json.JStr].v).getOrElse(d.seenKind),
        rdfSink = bool("rdf_sink", d.rdfSink),
        rawSink = bool("raw_sink", d.rawSink),
        autoCompactAlpha = j.get("auto_compact_alpha")
          .map(_.asInstanceOf[Json.JNum].toDouble)
          .getOrElse(d.autoCompactAlpha))
      val errs = unknownTop ++ polErrs ++ fbErrs ++ cfg.validate
      if (errs.nonEmpty) Left(errs.toSeq) else Right(cfg)
    } catch {
      case e: Exception => Left(Seq(s"malformed config JSON: ${e.getMessage}"))
    }
  }
}
