package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4/J3 — GitHub repo-info enrichment (reference fetcher/github.py:501-550:
  * a memoized per-(owner, repo) GraphQL lookup whose `defaultBranchRef.name`
  * fills the missing ref), plus the bare-repo manifest probe order
  * (github.py:43,362-368).
  *
  * Spark shape of the memoization: `dropDuplicates(owner, repo)` IS the
  * cache (each repo looked up exactly once per run, however many units point
  * at it), the lookup runs in `mapPartitions` behind an injectable seam
  * (zero-egress: tests and fixtures inject a deterministic function,
  * production injects the GraphQL client), and the enriched dimension —
  * small by construction — broadcasts back onto the frontier. The frontier
  * never shuffles (PlanSpec asserts the broadcast).
  */
object RepoEnrich {

  /** Deterministic default-branch stand-in for the GraphQL boundary —
    * closed-form so the DuckDB oracle can replicate it.
    */
  def defaultBranchOf(owner: String, repo: String): String =
    Seq("main", "master", "develop")(
      Math.floorMod(owner.length * 7 + repo.length, 3))

  /** Enrich forge-frontier rows (owner, repo, ref?) with the repo's default
    * branch; rows without an explicit ref get `ref = default_branch`
    * (github.py:501-506 `_edit_hosting_unit_id`).
    */
  def enrich(spark: SparkSession, frontier: DataFrame,
      lookup: (String, String) => String = defaultBranchOf): DataFrame = {
    import spark.implicits._
    val repos = frontier.select(col("owner"), col("repo"))
      .dropDuplicates("owner", "repo") // the memoization: one lookup per repo
    val lookupFn = lookup
    val infos = repos.as[(String, String)]
      .mapPartitions(_.map { case (o, r) => (o, r, lookupFn(o, r)) })
      .toDF("owner", "repo", "default_branch")
    frontier.join(broadcast(infos), Seq("owner", "repo"), "left_outer")
      .withColumn("ref", coalesce(col("ref"), col("default_branch")))
  }

  /** Manifest probe order for path-less forge units (github.py:43):
    * `okh.<ext>` tried in this exact order until one exists.
    */
  val ManifestProbeExtensions: Seq[String] =
    Seq("toml", "yaml", "yml", "json", "ttl", "rdf", "jsonld")

  /** Resolve each path-less unit to its manifest file: candidates =
    * unit × probe list (with rank), semi-joined against the repo's existing
    * files, first-by-probe-order wins (github.py:362-368 — the sequential
    * try/except loop as one set-oriented pass). Units with no hit are kept
    * with a null manifest (the FetcherError channel as data).
    */
  def probeManifest(units: DataFrame, files: DataFrame): DataFrame = {
    val probes = ManifestProbeExtensions.zipWithIndex
      .map { case (e, i) => struct(lit(i).as("rank"), lit(s"okh.$e").as("file_name")) }
    val candidates = units
      .select(col("unit_path"), explode(array(probes: _*)).as("probe"))
      .select(col("unit_path"), col("probe.rank").as("rank"),
        col("probe.file_name").as("file_name"))
    val hits = candidates
      .join(files, Seq("unit_path", "file_name"), "left_semi")
      .groupBy("unit_path").agg(min(col("rank")).as("best_rank"))
    units.join(hits, Seq("unit_path"), "left_outer")
      .withColumn("manifest_file",
        // when-guarded: element_at must not be evaluated for the no-hit
        // (null best_rank) branch
        when(col("best_rank").isNotNull, element_at(
          array(ManifestProbeExtensions.map(e => lit(s"okh.$e")): _*),
          (col("best_rank") + 1).cast("int"))))
      .drop("best_rank")
  }
}
