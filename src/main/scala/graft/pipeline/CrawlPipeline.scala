package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fetch.FetchStage
import graft.fixtures.SyntheticStore
import graft.functions.{ImageFunctions, TextNormalize, UrlFunctions}
import graft.tables.SnapshotStore

/** The end-to-end crawl (SURVEY §3.4, §7.2): seed → canonicalize →
  * URL-seen anti-join (Bloom-prefiltered) → robots gate → politeness fetch →
  * normalize (caption + image invariants) → snapshot-committed sinks
  * (`results`, `url_seen`, `fetch_log`), resumable from the latest snapshot.
  *
  * Table layout under `tableRoot`:
  *   url_seen/   (unit_path, url_hash, bucket, status)   partitioned by bucket
  *   results/    north-rule schema + invariants           partitioned by id_group
  *   fetch_log/  FetchLogRow                              partitioned by hosting_id
  *
  * Scale posture: all joins key on unit_path/url_hash; the store join is an
  * equi-join on unit_path (storage-partitioned by the same id_group at
  * scale); the only global sort is the optional fixture-scale `limit` slice
  * of the golden order.
  */
object CrawlPipeline {

  final case class RunSummary(
      version: Long,
      attempted: Long,
      ok: Long,
      notFound: Long,
      error: Long,
      robotsDenied: Long,
      resultRows: Long)

  val NBuckets = 32

  def urlSeenStore(tableRoot: String) = new SnapshotStore(s"$tableRoot/url_seen")
  def resultsStore(tableRoot: String) = new SnapshotStore(s"$tableRoot/results")
  def fetchLogStore(tableRoot: String) = new SnapshotStore(s"$tableRoot/fetch_log")
  /** S10 final sink: the three RDF graphs per project (reference
    * store_final, fetch_result_repository_workdir.py:93-111). Flag-gated in
    * `run` like the reference's raw sink (S9).
    */
  def projectsStore(tableRoot: String) = new SnapshotStore(s"$tableRoot/projects")
  /** S9 raw sink (reference store_raw, gated by `write_raw=False` —
    * fetch_result_repository_workdir.py:79-91): per fetched unit, the
    * data-set metadata as canonical JSON plus the original payload bytes.
    */
  def rawStore(tableRoot: String) = new SnapshotStore(s"$tableRoot/raw")
  /** Resolved-summary twin of the url_seen event log: ONE row per unit
    * (`bucket, unit_path, perm, n_err`) folded from all events up to the
    * `covered_version` metric. The sustained-10^10 maintenance path: the
    * per-run exclusion aggregate reads this summary plus only the DELTA
    * events (`run_seq > covered_version`), so exclusion cost stays
    * proportional to candidates + recent activity instead of re-aggregating
    * the full attempt history every run.
    */
  def urlSeenSummaryStore(tableRoot: String) =
    new SnapshotStore(s"$tableRoot/url_seen_summary")

  /** Per-unit resolution counters from an event-log slice: `perm` = unit has
    * a permanent outcome, `n_err` = retryable-error attempts. The SAME fold
    * whether it runs over raw events (compaction, first runs) or over
    * summary ∪ delta rows (`perm`/`n_err` re-aggregate associatively:
    * max-of-max, sum-of-sum).
    */
  private def foldResolution(events: DataFrame,
      groupCols: Seq[String] = Seq("unit_path")): DataFrame = {
    val aggs = graft.operators.CrawlOps.resolutionAggs
    events.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The committed summary pinned to the SNAPSHOT its covered_version came
    * from (`readAt`, not `read` — a compaction committing between the two
    * calls must not pair a new summary with a stale covered version, which
    * would double-count the events in between). Shared by the exclusion
    * fold and the compacted CrawlingMeta view.
    */
  private def summaryWithCovered(spark: SparkSession,
      tableRoot: String): Option[(DataFrame, Long)] =
    for {
      snap <- urlSeenSummaryStore(tableRoot).currentSnapshot
      covered <- snap.metrics.get("covered_version")
      df <- urlSeenSummaryStore(tableRoot).readAt(spark, snap.version)
    } yield (df, covered)

  /** Periodic compaction job (run between crawls, like Iceberg table
    * maintenance): fold the whole url_seen event log into the resolved
    * summary, stamped with the url_seen version it covers. Each compaction
    * REPLACES the summary in ONE commit (`SnapshotStore.replace` — the
    * summary is derived state; the event log stays the source of truth for
    * CrawlingMeta history). Crash-safe: a crash at any point leaves either
    * the fully-old or fully-new summary, so the old covered_version stays
    * readable until the new one commits. The prior summary's files are
    * physically expired right after the commit.
    */
  def compactUrlSeen(spark: SparkSession, tableRoot: String): Option[Long] = {
    val seen = urlSeenStore(tableRoot)
    for {
      // events pinned to the SAME snapshot that defines covered_version
      // (`readAt`): a crawl committing mid-compaction must not leak its
      // events into a summary stamped with the older version — that would
      // permanently double-count them in every summary+delta merge
      snap <- seen.currentSnapshot
      events <- seen.readAt(spark, snap.version)
    } yield {
      val coveredVersion = snap.version
      // ONE aggregation pass carries the resolution counters (shared
      // CrawlOps.resolutionAggs — the per-run delta fold uses the same
      // expressions, so summary and delta can never disagree), the routing
      // bucket (partition layout), and the full mergeable CrawlingMeta
      // state: both event-log consumers absorb compacted history
      val summary = graft.operators.CrawlOps.metaStateWithResolution(events)
      replaceSummary(spark, tableRoot, summary, coveredVersion)
      coveredVersion
    }
  }

  /** Commit a freshly-computed summary state (shared by the full-fold and
    * incremental compaction paths): one atomic `replace` stamped with the
    * url_seen version it covers, prior summary files expired right after.
    */
  private def replaceSummary(spark: SparkSession, tableRoot: String,
      summary: DataFrame, coveredVersion: Long): Unit = {
    val store = urlSeenSummaryStore(tableRoot)
    store.replace(spark, summary, "bucket",
      Map("covered_version" -> coveredVersion), clusterBeforeWrite = true)
    store.expire(keepLast = 1)
  }

  /** Seed URL per store id: all SIX platform families by id residue — the
    * multi-host seed list whose cross-host interleaving the golden crawl
    * order (priority, seq) defines. Pure function, shared with the spec's
    * golden expectations. The gitlab/codeberg forge families exercise the
    * forge URL parser's `-/blob` and `raw` branches e2e
    * (hosting_unit_forge.py:74-149 parity).
    */
  def seedUrl(id: Long): String = (id % 7) match {
    case 1 => s"https://github.com/owner${id % 10}/repo$id/blob/main/okh.toml"
    case 2 => f"https://certification.oshwa.org/us$id%06d.html"
    case 3 => s"https://www.appropedia.org/Project_$id"
    case 5 => s"https://gitlab.com/group${id % 3}/proj$id/-/blob/main/okh.toml"
    case 6 => s"https://codeberg.org/org${id % 4}/unit$id/raw/main/okh.toml"
    case _ => s"https://www.thingiverse.com/thing:$id" // 0, 4
  }

  /** Canonical unit path each seed resolves to (golden expectation). */
  def expectedUnitPath(id: Long): String = (id % 7) match {
    case 1 => s"github.com/owner${id % 10}/repo$id/main/okh.toml"
    case 2 => f"oshwa.org/us$id%06d"
    case 3 => s"appropedia.org/Project_$id"
    case 5 => s"gitlab.com/group${id % 3}/proj$id/main/okh.toml"
    case 6 => s"codeberg.org/org${id % 4}/unit$id/main/okh.toml"
    case _ => SyntheticStore.unitPath(id)
  }

  /** `seedUrl` as a codegen'd column expression (VERDICT r1 #9: the frontier
    * hot path must stay inside whole-stage codegen — no Scala UDF).
    * Semantics identical to `seedUrl(id)`; PlanSpec asserts parity.
    */
  def seedUrlCol(id: Column): Column = {
    val m = pmod(id, lit(7L))
    when(m === 1, concat(lit("https://github.com/owner"), pmod(id, lit(10L)),
        lit("/repo"), id, lit("/blob/main/okh.toml")))
      // format_string pads WITHOUT truncating (lpad would silently truncate
      // ids past 6 digits — exact parity with the f"us$id%06d" driver form)
      .when(m === 2, concat(lit("https://certification.oshwa.org/"),
        format_string("us%06d", id), lit(".html")))
      .when(m === 3, concat(lit("https://www.appropedia.org/Project_"), id))
      .when(m === 5, concat(lit("https://gitlab.com/group"), pmod(id, lit(3L)),
        lit("/proj"), id, lit("/-/blob/main/okh.toml")))
      .when(m === 6, concat(lit("https://codeberg.org/org"), pmod(id, lit(4L)),
        lit("/unit"), id, lit("/raw/main/okh.toml")))
      .otherwise(concat(lit("https://www.thingiverse.com/thing:"), id))
  }

  /** Frontier from the synthetic store dir: one URL per store row (the
    * store's image_id encodes the payload id; the platform family comes
    * from the id residue). Seeds are (url, seq=id).
    */
  /** The lightweight key projection of a payload store (guide §8: every
    * decision pass reads small rows; only the decode/join stage touches
    * payload bytes). Written by `ensureBucketedStore` as part of the same
    * one-time ingest prep that builds the bucketed byte layout; when
    * present, the frontier scan reads ~50 bytes/row instead of splitting
    * the multi-GB payload files into hundreds of tasks to extract two
    * columns. Identical rows either way — it is a projection of the store,
    * not a computed result.
    */
  def storeKeysDir(storeDir: String): String =
    storeDir.stripSuffix("/") + "_keys"

  def frontier(spark: SparkSession, storeDir: String): DataFrame = {
    val keysDir = storeKeysDir(storeDir)
    val src =
      if (new java.io.File(s"$keysDir/_SUCCESS").exists())
        spark.read.parquet(keysDir)
      else spark.read.parquet(storeDir)
    val ids = src
      .select(regexp_extract(col("image_id"), "^thing:(\\d+)/", 1).cast("long").as("id"),
        // payload fingerprint delivered with the fetch — drives the
        // CrawlingMeta change detection on re-visits (data_set.py:17-39)
        col("phash").as("content_hash"))
    ids
      .withColumn("url", seedUrlCol(col("id")))
      .withColumn("seq", col("id"))
      // codegen'd custom Expression (one parse); hosting id = path prefix
      .withColumn("unit_path", graft.functions.CanonicalUnitPath(col("url")))
      .filter(col("unit_path").isNotNull)
      .withColumn("hosting_id", substring_index(col("unit_path"), "/", 1))
      .withColumn("priority", UrlFunctions.hostPriority(col("hosting_id")))
      .withColumn("url_hash", UrlFunctions.urlHash(col("unit_path")))
      .withColumn("bucket", pmod(col("url_hash"), lit(NBuckets.toLong)))
  }

  /** Skew-aware salting (SURVEY §7.4 risk 2): hosts whose frontier share
    * exceeds `threshold` of the total get one politeness bucket per
    * `saltUnit` rows (budget split in FetchStage keeps per-host rates).
    */
  def autoSalts(frontier: DataFrame, threshold: Double = 0.25,
      maxSalts: Int = 32): Map[String, Int] = {
    val counts = frontier.groupBy("hosting_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = math.max(1L, counts.values.sum)
    counts.collect {
      case (host, n) if n.toDouble / total > threshold =>
        host -> math.min(maxSalts, math.max(2, (n.toDouble / total * maxSalts).toInt))
    }
  }

  /** Robots disallow rules for the pipeline: deterministic id-based fixture
    * (every 103rd thing disallowed) standing in for per-host robots.txt
    * caches joined into the frontier (R5).
    */
  def robotsAllowed(df: DataFrame): DataFrame =
    df.withColumn("robots_denied", pmod(col("id"), lit(103)) === 0)

  /** R5 with REAL robots.txt documents: per-host policies (RFC 9309 parser,
    * `model/Robots`) broadcast and evaluated against each URL's path.
    * Empty map → the deterministic fixture above.
    */
  def robotsAllowed(df: DataFrame, robotsTxtByHost: Map[String, String]): DataFrame =
    if (robotsTxtByHost.isEmpty) robotsAllowed(df)
    else df.withColumn("robots_denied",
      !graft.model.Robots.allowedCol(df.sparkSession, robotsTxtByHost,
        col("hosting_id"), regexp_replace(col("url"), "^https?://[^/]+", "")))

  /** One-time ingest of the payload store into an id-bucketed table — the
    * shared storage layout that makes the payload join storage-partitioned.
    *
    * At 10^10 scale the store is ingested ONCE into this layout (bytes are
    * written exactly once, hashed onto `NBuckets` id buckets); every
    * subsequent payload join then shuffles only the small fetched-key side
    * into the store's bucketing while the image bytes never move and
    * nothing flows through the driver. Idempotent: reuses the bucketed
    * files across sessions (re-registering the external table when a fresh
    * catalog doesn't know it yet).
    */
  /** Catalog table name for a bucketed store dir: a 128-bit SHA-256 prefix
    * of the full path (dir.hashCode is 32-bit — two distinct store dirs
    * colliding would silently join the wrong payload bytes).
    */
  def storeTableName(dir: String): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes("UTF-8")).take(16).map("%02x".format(_)).mkString
    s"graft_store_b$digest"
  }

  def ensureBucketedStore(spark: SparkSession, storeDir: String): String = {
    val dir = storeDir.stripSuffix("/") + "_bucketed"
    val tbl = storeTableName(dir)
    // key projection sidecar (same prep step, same write-once idempotency):
    // a few small files the frontier scan reads instead of splitting the
    // payload files into hundreds of byte-sized tasks to extract two
    // columns. Sharded to the session's parallelism so the scan (and the
    // per-row URL derivation on top of it) still parallelizes — a single
    // file would serialize the frontier parse into one task, which is the
    // exact failure mode the sidecar exists to avoid. ~10^-4 of the store
    // bytes; at 10^10 rows the ingest shards it like any columnar table.
    val keysDir = storeKeysDir(storeDir)
    if (!new java.io.File(s"$keysDir/_SUCCESS").exists()) synchronized {
      if (!new java.io.File(s"$keysDir/_SUCCESS").exists())
        spark.read.parquet(storeDir).select(col("image_id"), col("phash"))
          .repartition(math.max(spark.sparkContext.defaultParallelism, 16))
          .write.mode("overwrite").parquet(keysDir)
    }
    if (!spark.catalog.tableExists(tbl)) synchronized {
      if (!spark.catalog.tableExists(tbl)) {
        if (new java.io.File(s"$dir/_SUCCESS").exists()) {
          // files already in the bucketed layout → register, don't rewrite
          val schema = spark.read.parquet(dir).schema
          spark.sql(s"CREATE TABLE $tbl (${schema.toDDL}) USING parquet " +
            s"CLUSTERED BY (id) INTO $NBuckets BUCKETS LOCATION '$dir'")
        } else {
          val df = spark.read.parquet(storeDir)
            .withColumn("id",
              regexp_extract(col("image_id"), "^thing:(\\d+)/", 1).cast("long"))
          // pre-cluster on the bucket hash so each task writes exactly one
          // bucket file (otherwise: tasks × buckets small files)
          df.repartition(NBuckets, col("id"))
            .write.mode("overwrite").format("parquet")
            .bucketBy(NBuckets, "id")
            .option("path", dir)
            .saveAsTable(tbl)
        }
      }
    }
    tbl
  }

  /** Attach store payload to the fetched keys. Join strategy by run shape:
    *  - bounded slice (`limit=Some`): the fetched side is ≤ limit rows →
    *    broadcast it; bytes never shuffle, no table prep needed.
    *  - full run (`limit=None`): broadcasting the run slice is unbounded
    *    (driver/executor OOM at frontier scale) → storage-partitioned join
    *    against the id-bucketed store table: only the small fetched side
    *    shuffles (into the store's bucketing); the bytes side has no
    *    Exchange and no broadcast (asserted in PlanSpec).
    */
  def payloadJoin(spark: SparkSession, storeDir: String, fetched: DataFrame,
      limit: Option[Long]): DataFrame = limit match {
    case Some(_) =>
      val store = spark.read.parquet(storeDir)
        .withColumn("id",
          regexp_extract(col("image_id"), "^thing:(\\d+)/", 1).cast("long"))
      store.join(broadcast(fetched), Seq("id"))
    case None =>
      val store = spark.table(ensureBucketedStore(spark, storeDir))
      // shuffle_hash (not broadcast) on the fetched side: build a hash map
      // per bucket from the keys, stream the bytes through unshuffled
      store.join(fetched.hint("shuffle_hash"), Seq("id"))
  }

  /** One crawl run: process up to `limit` frontier units not yet in
    * url_seen, commit snapshots, return counters. Re-invoking continues
    * from the committed snapshot (resume, R6).
    */
  /** The OKH manifest the synthetic transport delivers per store id (the
    * TOML twin of SyntheticStore's image payload).
    */
  private val manifestTomlUdf =
    udf((id: Long) => graft.fixtures.SyntheticManifests.toml(id))

  private val profile = sys.env.get("GRAFT_PROFILE").contains("1")
  private def timed[A](name: String)(f: => A): A = {
    if (!profile) f
    else {
      val t0 = System.nanoTime()
      val r = f
      println(f"[crawl-profile] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
  }

  /** Retryable errors are excluded from slice selection after this many
    * recorded attempts (CrawlingMeta-style re-visit bookkeeping replacing
    * the retry-forever behavior — reference tracks visits in
    * data_set.py:17-39).
    */
  val MaxErrorRetries = 3

  /** Frontier units eligible for this run: the URL-seen exclusion dataflow.
    * Bucket-routed frontier → Bloom/cuckoo file prefilter → resolved-set
    * fold over ONLY the prefilter-positive candidates' state (semi-join
    * first) → exact anti-join. Summary-first (the sustained-10^10
    * maintenance path): with a compacted summary present the fold reads the
    * summary row plus only events NEWER than its covered version, so
    * per-run cost is proportional to candidates + activity since the last
    * compaction, never the full attempt history.
    *
    * Extracted from `run` so PlanSpec can pin the exclusion plan shape
    * (no CartesianProduct / no nested-loop join anywhere in the subtree).
    */
  def selectCandidates(spark: SparkSession, tableRoot: String,
      fullFrontier: DataFrame, seenOpt: Option[DataFrame],
      seenFilters: graft.frontier.SeenFilterStore,
      maxErrorRetries: Int = MaxErrorRetries): DataFrame = seenOpt match {
    case None => fullFrontier
    case Some(seenDf) =>
      // the filter directory is a pure function of (tableRoot, kind) —
      // derived here so a caller can never pair a kind with the wrong dir
      val filterDir = s"$tableRoot/${seenFilters.dirName}"
      val routed = fullFrontier.repartition(NBuckets, col("bucket"))
      val might = seenFilters.predicate(filterDir)
      val maybeSeen = routed.filter(might)
      val candSet = maybeSeen.select("unit_path").distinct()
      val perUnit = summaryWithCovered(spark, tableRoot) match {
        case None =>
          foldResolution(seenDf.join(candSet, Seq("unit_path"), "left_semi"))
        case Some((summaryDf, covered)) =>
          val base = summaryDf.select("unit_path", "perm", "n_err")
            .join(candSet, Seq("unit_path"), "left_semi")
          val delta = foldResolution(seenDf
            .filter(col("run_seq") > covered)
            .join(candSet, Seq("unit_path"), "left_semi"))
          // perm re-aggregates as max-of-max, n_err as sum-of-sum
          base.unionByName(delta).groupBy("unit_path")
            .agg(max("perm").as("perm"), sum("n_err").as("n_err"))
      }
      val resolved = perUnit
        .filter(col("perm") === 1 || col("n_err") >= maxErrorRetries)
        .select("unit_path")
      val definitelyNew = routed.filter(!might)
      definitelyNew.unionByName(
        maybeSeen.join(resolved, Seq("unit_path"), "left_anti"))
  }

  def run(spark: SparkSession, storeDir: String, tableRoot: String,
      limit: Option[Long] = None,
      salts: Map[String, Int] = Map.empty,
      rdfSink: Boolean = false, // S10: emit the 3-graph RDF projects table
      rawSink: Boolean = false, // S9: emit meta-json + original payload bytes
      revisit: Boolean = false, // re-crawl resolved units (change detection)
      robotsTxt: Map[String, String] = Map.empty, // real per-host robots.txt
      crashBeforeSeenCommit: Boolean = false, // test hook: injected crash
      // URL-seen sketch kind (north rule: "Bloom/cuckoo"): bloom is the
      // default; cuckoo adds targeted invalidation (CuckooSeen.removeKeys).
      // Each kind owns its directory, so switching kinds on an existing
      // table root just builds the new kind fresh.
      seenFilters: graft.frontier.SeenFilterStore = graft.frontier.SeenFilters.bloom,
      // self-triggering table maintenance (reference parity: the state
      // rewrite happens on every store, fetcher_state.py:26-51): compact
      // the url_seen event log into the resolved summary whenever the
      // uncompacted delta exceeds autoCompactAlpha × summary rows, so the
      // summary-first exclusion fold's input stays bounded WITHOUT any
      // caller opting in. <= 0 disables (explicit-maintenance mode).
      autoCompactAlpha: Double = 1.0,
      // budgets from the (validated) config layer — defaults reproduce the
      // shipped constants exactly (CrawlConfig.default)
      politenessBase: Map[String, FetchStage.Politeness] = FetchStage.defaultPoliteness,
      fallbackPoliteness: FetchStage.Politeness = FetchStage.FallbackPoliteness,
      maxErrorRetries: Int = MaxErrorRetries,
      // restrict the run to ONE hosting family (the reference's
      // FetcherXCommand fetches only the named hosting, fetcher.py:84-86);
      // None = the whole frontier
      hostingFilter: Option[String] = None
      ): RunSummary = {
    import spark.implicits._

    val seen = urlSeenStore(tableRoot)
    val bloomDir = s"$tableRoot/${seenFilters.dirName}"
    val fullFrontier = hostingFilter.foldLeft(
      robotsAllowed(frontier(spark, storeDir), robotsTxt))(
      (f, h) => f.filter(col("hosting_id") === h))

    // URL-seen anti-join with per-bucket Bloom pre-filter (no false
    // negatives by construction; exact anti-join on unit_path settles the
    // Bloom positives). Scale layout (VERDICT r1 #2): one Bloom FILE per
    // bucket, frontier ROUTED by bucket, so each task loads only its own
    // buckets' filters — no driver collect, no whole-map broadcast.
    // url_seen is an append-only EVENT LOG (one row per attempt); a unit is
    // excluded from future slices once it has a permanent outcome or
    // MaxErrorRetries failed attempts. `revisit` ignores the exclusion and
    // re-crawls the whole frontier (visit counters + change detection).
    val seenOpt = seen.read(spark)
    // reconcile the filter files with the committed url_seen BEFORE this
    // run uses or updates them — for EVERY run shape (a revisit run also
    // stamps a new VERSION at commit, so skipping the reconcile here would
    // permanently hide keys lost to a crash → Bloom false negatives)
    seenOpt.foreach { seenDf =>
      val curV = seen.currentVersion.get
      if (!seenFilters.filtersVersion(bloomDir).contains(curV)) {
        // crash between url_seen commit and filter update (or first read
        // of a pre-existing table): rebuild so filters can't be stale
        seenFilters.rebuild(spark,
          seenDf.select(col("bucket"), col("url_hash")),
          "bucket", "url_hash", bloomDir, curV)
      }
    }
    val candidates =
      if (revisit) fullFrontier
      else selectCandidates(spark, tableRoot, fullFrontier, seenOpt,
        seenFilters, maxErrorRetries)

    // fixture-scale run slice of the golden order (kill/resume simulation)
    val sliced = limit match {
      case Some(n) => candidates.orderBy(col("priority"), col("seq")).limit(n.toInt)
      case None    => candidates
    }

    // robots-denied units flow THROUGH the fetch stage as pre-resolved
    // status rows (no request, no politeness slot) — one pass, one log.
    // robots Crawl-delay raises the per-host interval to
    // max(platform, robots) (model/Robots.effectiveIntervalMs).
    val politeness =
      if (robotsTxt.isEmpty) politenessBase
      else FetchStage.politenessWithRobots(politenessBase,
        robotsTxt.map { case (h, t) => h -> graft.model.Robots.parse(t) },
        fallbackPoliteness)
    val tasks = FetchStage.toTasks(spark, sliced)
    val log = FetchStage.run(spark, tasks, politeness = politeness,
      salts = salts, fallback = fallbackPoliteness).cache()

    // normalize + invariants for fetched units: attach the store payload
    // (broadcast for bounded slices, storage-partitioned at limit=None —
    // see payloadJoin)
    val fetched = log.filter(col("status") === "ok")
      .select(col("unit_path"), col("id"), col("pos"), col("scheduled_ms"))
    val results = payloadJoin(spark, storeDir, fetched, limit)
      .withColumn("caption", TextNormalize.normalizeCaptionUdf(col("caption")))
      .withColumn("phash_check", ImageFunctions.phash64(col("bytes")))
      .withColumn("id_group", (col("id") / 10000).cast("long"))
      .select(col("image_id"), col("bytes"), col("w"), col("h"), col("fmt"),
        col("caption"), col("phash"), col("phash_check"), col("unit_path"),
        col("id_group"))

    val statusCounts = timed("status counts")(log.groupBy("status").count().collect())
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nDenied = statusCounts.getOrElse("robots_denied", 0L)

    // commits (order matters for crash safety: payload sinks before the
    // url_seen commit that makes units invisible to the next run). Resume
    // idempotency: the slice is a deterministic function of the committed
    // url_seen version (same store + same seen state → same candidate
    // slice), so each payload commit is tagged with slice_id = that
    // version. A crash between the payload commits and the url_seen commit
    // re-runs the same slice — and any payload append whose store already
    // carries this slice_id is SKIPPED instead of appended twice.
    // results and fetch_log are independent tables → submit their write
    // jobs concurrently (Spark schedules parallel jobs from threads)
    val sliceId = seen.currentVersion.getOrElse(-1L)
    val rStore = resultsStore(tableRoot)
    val lStore = fetchLogStore(tableRoot)
    def alreadyCommitted(s: SnapshotStore): Option[SnapshotStore#Snapshot] =
      s.currentSnapshot.filter(_.metrics.get("slice_id").contains(sliceId))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val resultsF = Future(alreadyCommitted(rStore).getOrElse(
      timed("results append")(rStore.append(spark, results, "id_group",
        Map("slice_id" -> sliceId)))))
    val fetchLogF = Future(alreadyCommitted(lStore).getOrElse(
      timed("fetch_log append")(lStore.append(spark, log.toDF(), "hosting_id",
        statusCounts.updated("slice_id", sliceId), clusterBeforeWrite = true))))
    // S10: 3-graph RDF sink — the FULL normalize→TOML→RDF chain per fetched
    // unit, mirroring the reference's NormalizationListener
    // (fetcher/factory.py:49-59): the delivered manifest payload runs
    // through Normalizers.manifest, the normalized project serializes to
    // the empty-stripped manifest TOML (toml_serializer.py:88-110) stored
    // on normalized_toml, then RdfSerializer emits the three turtle graphs
    // (normalized.okh_toml carries the deflate+base64 TOML,
    // rdf_serializer.py:827-832). Everything after the normalize transform
    // is one typed map — pure per-row serialization, no shuffle — committed
    // with the same slice_id idempotency.
    val projectsF = if (!rdfSink) None else Some {
      val pStore = projectsStore(tableRoot)
      Future(alreadyCommitted(pStore).getOrElse(timed("projects append") {
        // the manifest the platform delivers for a unit: deterministic
        // function of the store id (the fixture transport's payload twin,
        // like SyntheticStore for the image bytes)
        val raws = results
          .select(col("image_id"), col("unit_path"), col("caption"), col("id_group"))
          .withColumn("id",
            regexp_extract(col("image_id"), "^thing:(\\d+)/", 1).cast("long"))
          .withColumn("fmt", lit("toml"))
          .withColumn("content", manifestTomlUdf(col("id")))
        val normalized = graft.normalize.Normalizers.manifest(spark, raws,
          passthrough = Seq("image_id", "unit_path", "caption", "id_group", "id"))
        val docs = normalized.map { r =>
          val imageId = r.getAs[String]("image_id")
          val unitPath = r.getAs[String]("unit_path")
          val idGroup = r.getAs[Long]("id_group")
          val id = r.getAs[Long]("id")
          val hosting = unitPath.takeWhile(_ != '/')
          val p0 = graft.model.ProjectModel.fromRow(r)
          // the fetched payload image, its caption as the depicts LangStr
          // (image+caption pairs are the north-rule payload)
          val lang = p0.documentation_language.headOption.getOrElse("en")
          val img = graft.model.ImageRef(Some(imageId), None,
            Some(s"img://$imageId"), None, None, Seq.empty, Seq.empty,
            Seq(graft.model.LangStr(r.getAs[String]("caption"), lang)))
          val p1 = p0.copy(image = p0.image :+ img)
          val p = p1.copy(normalized_toml =
            Some(graft.serialize.Serializers.projectToToml(p1)))
          // sourcing procedure by platform family (factory.py fetcher kinds:
          // forges deliver manifests, appropedia generates one, the API
          // platforms are API-sourced); forge units record the manifest URL
          val proc = hosting match {
            case "github.com" | "gitlab.com" | "codeberg.org" => "manifest"
            case "appropedia.org" => "generated-manifest"
            case _ => "api"
          }
          val manifestUrl = if (proc == "manifest") Some(seedUrl(id)) else None
          val cm = graft.model.CrawlMeta.initial(hosting, proc,
            manifest = manifestUrl, okhv = Option(r.getAs[String]("okhv")))
          val d = graft.serialize.RdfSerializer.serialize(p, cm)
          (unitPath, d.normalized_okh_toml_ttl, d.meta_ttl, d.data_okh_ttl, idGroup)
        }.toDF("project_id", "normalized_okh_toml_ttl", "meta_ttl",
          "data_okh_ttl", "id_group")
        pStore.append(spark, docs, "id_group", Map("slice_id" -> sliceId))
      }))
    }
    // S9 raw sink: data-set metadata as canonical JSON + the original
    // payload bytes, straight from the result rows (to_json is builtin —
    // no UDF; bytes ride in the same partition layout as results)
    val rawF = if (!rawSink) None else Some {
      val store9 = rawStore(tableRoot)
      Future(alreadyCommitted(store9).getOrElse(timed("raw append") {
        val raw = results.select(
          col("unit_path"),
          to_json(struct(
            col("unit_path"), col("image_id"),
            substring_index(col("unit_path"), "/", 1).as("hosting_id"),
            lit("api").as("sourcing_procedure"),
            lit("OKH-LOSHv1.0").as("okhv_fetched"),
            col("phash").as("content_hash"),
            lit(sliceId + 1).as("run_seq"))).as("meta_json"),
          col("bytes").as("orig"), col("fmt"), col("id_group"))
        store9.append(spark, raw, "id_group", Map("slice_id" -> sliceId))
      }))
    }
    val resultsSnap = Await.result(resultsF, Duration.Inf)
    Await.result(fetchLogF, Duration.Inf)
    projectsF.foreach(Await.result(_, Duration.Inf))
    rawF.foreach(Await.result(_, Duration.Inf))
    val resultRows = resultsSnap.metrics("commit_rows")

    if (crashBeforeSeenCommit)
      throw new RuntimeException("injected crash between payload and url_seen commits")

    // url_hash/bucket/content_hash rode through the fetch stage — no
    // re-join needed. EVERY attempt is recorded (CrawlingMeta event log):
    // errors accumulate a retry count and stop being selected after
    // MaxErrorRetries; re-visits accumulate visit/change counters.
    val seenRows = log
      .select(col("unit_path"), col("hosting_id"), col("id"), col("status"),
        col("url_hash"), col("bucket"), col("content_hash"))
      .withColumn("run_seq", lit(sliceId + 1))
    val snap = timed("url_seen append")(seen.append(spark, seenRows,
      "bucket", statusCounts, clusterBeforeWrite = true))
    // the filter merge and the compaction below are independent post-commit
    // maintenance on disjoint state (per-bucket filter files vs the summary
    // table), each crash-safe on its own (a lost filter stamp → reconcile
    // rebuild next run; a lost summary → next compaction), so they run as
    // concurrent jobs — the serial tail of every run shrinks by the
    // smaller of the two.
    val bloomF = Future(timed("bloom update")(seenFilters.update(spark,
      seenRows.select(col("bucket"), col("url_hash")),
      "bucket", "url_hash", bloomDir, snap.version)))

    // auto-compaction policy: events appended since the summary's covered
    // version, counted from snapshot-manifest metrics alone (no table
    // scan — one small JSON per commit since the last compaction, a count
    // the policy itself keeps bounded)
    if (autoCompactAlpha > 0) {
      val summarySnap = urlSeenSummaryStore(tableRoot).currentSnapshot
      val covered = summarySnap.flatMap(_.metrics.get("covered_version")).getOrElse(-1L)
      val summaryRows = summarySnap.map(_.files.map(_.rows).sum).getOrElse(0L)
      val deltaRows = ((covered + 1) to snap.version)
        .map(v => seen.readSnapshot(v).metrics.getOrElse("commit_rows", 0L)).sum
      if (deltaRows > autoCompactAlpha * math.max(1L, summaryRows))
        timed("auto compact") {
          // INCREMENTAL compaction: this run's events are still cached (the
          // seenRows projection of `log`), so when the summary already
          // covers everything before this commit — or this commit IS the
          // whole event log — the new summary folds only this run's events
          // and merges with the stored state (`mergeMetaStatesWithResolution`,
          // associative re-aggregation). Compaction cost is then ∝ this
          // run's events, never the table's history — the maintenance twin
          // of the summary-first exclusion fold. Any other gap shape
          // (skipped compactions, a start-over rewrite, a pre-widening
          // summary schema) falls back to the full event-log fold.
          val runState = graft.operators.CrawlOps.metaStateWithResolution(seenRows)
          if (snap.parentVersion == -1L)
            replaceSummary(spark, tableRoot, runState, snap.version)
          else summaryWithCovered(spark, tableRoot) match {
            case Some((summaryDf, c)) if c == snap.parentVersion &&
                summaryDf.columns.contains("visits") =>
              replaceSummary(spark, tableRoot,
                graft.operators.CrawlOps.mergeMetaStatesWithResolution(
                  summaryDf, runState),
                snap.version)
            case _ => compactUrlSeen(spark, tableRoot)
          }
        }
    }
    Await.result(bloomF, Duration.Inf)

    log.unpersist()
    RunSummary(
      version = snap.version,
      attempted = statusCounts.values.sum,
      ok = statusCounts.getOrElse("ok", 0L),
      notFound = statusCounts.getOrElse("not_found", 0L),
      error = statusCounts.getOrElse("error", 0L),
      robotsDenied = nDenied,
      resultRows = resultRows)
  }

  /** Config-driven run: every knob from a VALIDATED `CrawlConfig` (the
    * reference's config-dict path, `config.py:35-117` → `factory.py`) —
    * budgets, retry bounds, sketch kind, sink toggles, and the compaction
    * policy all come from user config instead of code constants. Throws on
    * an invalid config with every violation listed, before any job runs.
    */
  def runConfigured(spark: SparkSession, storeDir: String, tableRoot: String,
      config: graft.CrawlConfig,
      limit: Option[Long] = None,
      salts: Map[String, Int] = Map.empty,
      revisit: Boolean = false,
      robotsTxt: Map[String, String] = Map.empty,
      hostingFilter: Option[String] = None): RunSummary = {
    val c = config.validated
    run(spark, storeDir, tableRoot, limit, salts,
      rdfSink = c.rdfSink, rawSink = c.rawSink, revisit = revisit,
      robotsTxt = robotsTxt, seenFilters = c.seenFilters,
      autoCompactAlpha = c.autoCompactAlpha,
      politenessBase = c.politeness,
      fallbackPoliteness = c.fallbackPoliteness,
      maxErrorRetries = c.maxErrorRetries,
      hostingFilter = hostingFilter)
  }

  /** Scope a `--start-over` reset to ONE hosting family (the reference
    * resets only the named fetcher's saved state, fetcher.py:44-47 +
    * 84-86): url_seen/fetch_log/results keep every OTHER hosting's rows;
    * the derived url_seen summary is dropped entirely (rebuilt by the
    * next compaction) and the per-bucket seen-filter files reconcile
    * automatically on the next run (their stamped version no longer
    * matches the rewritten url_seen).
    */
  def startOverHosting(spark: SparkSession, tableRoot: String,
      hostingId: String): Unit = {
    // the DERIVED summary drops FIRST: a crash after the url_seen rewrite
    // but before a trailing summary truncate would leave stale summary
    // rows still marking the reset hosting's units as resolved — the next
    // run's summary-first exclusion would then silently skip them.
    // Dropping the summary first is crash-safe in both orders of failure:
    // worst case the next run pays one full event-log fold (correct, just
    // uncompacted) until the next compaction rebuilds it.
    urlSeenSummaryStore(tableRoot).read(spark)
      .foreach(_ => urlSeenSummaryStore(tableRoot).truncate())
    // clusterBeforeWrite on every rewrite — same write policy as the
    // append path (the partition keys are hash-random per task; without
    // clustering each read task writes a file per partition value)
    def rewrite(store: SnapshotStore, partitionCol: String,
        keep: DataFrame => DataFrame): Unit =
      store.read(spark).foreach { df =>
        val remaining = keep(df)
        if (remaining.isEmpty) store.truncate()
        else store.replace(spark, remaining, partitionCol,
          clusterBeforeWrite = true)
      }
    rewrite(urlSeenStore(tableRoot), "bucket",
      _.filter(col("hosting_id") =!= hostingId))
    rewrite(fetchLogStore(tableRoot), "hosting_id",
      _.filter(col("hosting_id") =!= hostingId))
    // NOTE scale trade-off: results is partitioned by id_group, so this
    // predicate cannot prune — resetting one hosting rewrites the other
    // hostings' payload rows too. At fixture/operator scale that is fine;
    // a 10^10-row deployment would instead apply a per-hosting tombstone
    // at read time and fold it into the next compaction.
    rewrite(resultsStore(tableRoot), "id_group",
      _.filter(substring_index(col("unit_path"), "/", 1) =!= hostingId))
  }

  /** The CrawlingMeta view over this table root's url_seen event log. */
  def crawlingMeta(spark: SparkSession, tableRoot: String): Option[DataFrame] =
    urlSeenStore(tableRoot).read(spark)
      .map(graft.operators.CrawlOps.crawlingMeta)

  /** CrawlingMeta with the compacted summary absorbing history: identical
    * output to `crawlingMeta`, but only events NEWER than the summary's
    * covered version are window-folded — the compacted past comes from the
    * summary's stored meta state, merged across the seam by
    * `CrawlOps.mergeMetaStates` (cross-boundary hash changes included). At
    * sustained 10^10 scale this is the reporting twin of the summary-first
    * exclusion: neither consumer ever re-folds compacted events.
    */
  def crawlingMetaCompacted(spark: SparkSession, tableRoot: String): Option[DataFrame] =
    urlSeenStore(tableRoot).read(spark).map { events =>
      summaryWithCovered(spark, tableRoot) match {
        // a summary written before the meta-state widening carries only the
        // resolution columns — fall back to the full fold instead of
        // failing resolution on the missing state columns (the next
        // compaction rewrites the summary at the full schema)
        case Some((summaryDf, covered)) if summaryDf.columns.contains("visits") =>
          val delta = graft.operators.CrawlOps.metaState(
            events.filter(col("run_seq") > covered))
          graft.operators.CrawlOps.mergeMetaStates(
            summaryDf.drop("bucket", "perm", "n_err"), delta)
            .select(graft.operators.CrawlOps.MetaPublicCols.map(col): _*)
        case _ => graft.operators.CrawlOps.crawlingMeta(events)
      }
    }

  /** Run to exhaustion (all frontier units either seen or error),
    * `limit`-sized slices per run. Returns the per-run summaries.
    */
  def runUntilDone(spark: SparkSession, storeDir: String, tableRoot: String,
      limit: Long, compactEvery: Int = 0,
      autoCompactAlpha: Double = 1.0): Seq[RunSummary] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[RunSummary]
    var keepGoing = true
    while (keepGoing) {
      val s = run(spark, storeDir, tableRoot, Some(limit),
        autoCompactAlpha = autoCompactAlpha)
      out += s
      // periodic table maintenance: fold the event log into the resolved
      // summary every `compactEvery` runs (0 = never)
      if (compactEvery > 0 && out.size % compactEvery == 0)
        compactUrlSeen(spark, tableRoot)
      // retryable errors leave the frontier after MaxErrorRetries recorded
      // attempts, so an empty slice (attempted == 0) means true exhaustion —
      // slices always advance into fresh frontier instead of re-fetching
      // known-permanent failures forever
      keepGoing = s.attempted > 0
    }
    out.toSeq
  }
}
