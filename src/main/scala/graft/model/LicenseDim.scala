package graft.model

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The full license dimension (reference model/licenses.py:113-226): SPDX
  * license list + a curated extra overlay, loaded from SPDX-shaped asset
  * JSON with `spark.read.json` (S14 — dimension loads are reads of asset
  * files, not hard-coded Seqs), merged on the NFKD-casefolded id, with a
  * normalized-name → id fallback map for inputs that carry the full license
  * NAME instead of the SPDX id.
  *
  * Scale posture: the dimension is tiny (SPDX list ≈ 600 rows) — both
  * resolution joins broadcast it; the fact side never shuffles.
  */
object LicenseDim {

  /** `_normalize_name` (licenses.py:113-114): NFKD → casefold → drop
    * non-ASCII → strip. Java's upper-then-lower round-trip reproduces
    * Python's full casefold for the cases that survive the ASCII filter
    * (e.g. 'ß' → 'ss').
    */
  def normalizeName(s: String): String = {
    if (s == null) return null
    val nfkd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD)
    val folded = nfkd.toUpperCase(java.util.Locale.ROOT).toLowerCase(java.util.Locale.ROOT)
    folded.filter(_ < 128).trim
  }

  val normalizeNameUdf = udf(normalizeName _)

  /** `normalizeName` as a column: all-ASCII inputs (the overwhelmingly
    * common case — SPDX ids and English license names) resolve through a
    * codegen'd fast path (NFKD is the identity and casefold == lowercase on
    * ASCII); only non-ASCII strings pay the Scala UDF. Keeps the
    * per-document validate path inside whole-stage codegen. The trim must
    * match `String.trim` (strips ALL chars ≤ U+0020, not just spaces), so
    * the fast path uses a regex strip, not Spark's space-only `trim`.
    */
  def normalizeNameCol(c: Column): Column =
    when(c.rlike("^[\\x00-\\x7F]*$"),
      lower(regexp_replace(c, "^[\\x00-\\x20]+|[\\x00-\\x20]+$", "")))
      .otherwise(normalizeNameUdf(c))

  /** Classpath asset → a real file path spark.read can open (on a cluster
    * the assets directory would live on shared storage; here the jar is the
    * distribution channel).
    */
  def assetPath(name: String): String = {
    // the extracted copy is keyed by a digest of the RESOURCE BYTES: after a
    // jar upgrade changes the bundled asset, the key changes too, so a stale
    // copy from an older jar can never be silently reused (and two users'
    // differing jars never collide on a shared tmpdir)
    val in0 = getClass.getResourceAsStream(s"/graft/assets/$name")
    require(in0 != null, s"missing asset $name")
    val bytes = try in0.readAllBytes() finally in0.close()
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).take(8).map("%02x".format(_)).mkString
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_assets")
    Files.createDirectories(dir)
    val target = dir.resolve(s"$digest-$name")
    if (!Files.exists(target)) {
      val tmp = dir.resolve(s"$digest-$name.tmp-${java.util.UUID.randomUUID()}")
      Files.write(tmp, bytes)
      try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp) }
    }
    target.toString
  }

  private def readLicenseFile(spark: SparkSession, name: String): DataFrame =
    spark.read.option("multiLine", "true").json(assetPath(name))
      .select(explode(col("licenses")).as("lic"))
      .select(col("lic.*"))
      .withColumn("norm_id", normalizeNameUdf(trim(col("licenseId"))))

  /** Base ∪ extra merged by normalized id, extra fields winning
    * (licenses.py:117-159 `_init_licenses`; U2 merge as a full outer join).
    * Columns: license_id, name, reference, details_url, is_osi_approved,
    * is_fsf_libre, is_blocked, license_type, norm_id, norm_name.
    */
  def licenses(spark: SparkSession): DataFrame = {
    val base = readLicenseFile(spark, "spdx-licenses.json")
    val extra = readLicenseFile(spark, "spdx-licenses-extra.json")
      .select(col("norm_id").as("x_norm_id"), col("licenseId").as("x_id"),
        col("name").as("x_name"), col("type").as("x_type"),
        col("isBlocked").as("x_blocked"))
    base.join(extra, col("norm_id") === col("x_norm_id"), "full_outer")
      .select(
        coalesce(col("licenseId"), col("x_id")).as("license_id"),
        coalesce(col("x_name"), col("name")).as("name"),
        col("reference"),
        col("detailsUrl").as("details_url"),
        coalesce(col("isOsiApproved"), lit(false)).as("is_osi_approved"),
        coalesce(col("isFsfLibre"), lit(false)).as("is_fsf_libre"),
        coalesce(col("x_blocked"), lit(false)).as("is_blocked"),
        col("x_type").as("license_type"),
        coalesce(col("norm_id"), col("x_norm_id")).as("norm_id"),
        normalizeNameUdf(coalesce(col("x_name"), col("name"))).as("norm_name"))
  }

  /** Resolve raw license strings (SPDX ids in any casing/width, or full
    * license names) to the dimension row (licenses.py:197-226
    * `get_by_id_or_name`): normalized-id match first, then the
    * normalized-NAME → id fallback. Adds `spdx_id`, `is_blocked`,
    * `is_osi_approved` (null spdx_id = unresolvable). Both joins broadcast
    * the tiny dimension; `df` never shuffles.
    */
  def resolve(spark: SparkSession, df: DataFrame, rawCol: String): DataFrame = {
    // session-scoped singleton: the dimension is cached ONCE per session
    // (repeated resolve calls used to re-ask the CacheManager per call —
    // warning noise + storage entries nothing unpersisted)
    val dim = graft.PlanCache.cached(spark, "license-dim")(licenses(spark))
    val byId = dim.select(col("norm_id"), col("license_id").as("spdx_by_id"),
      col("is_blocked").as("blocked_by_id"), col("is_osi_approved").as("osi_by_id"))
    val byName = dim.select(col("norm_name"), col("license_id").as("spdx_by_name"),
      col("is_blocked").as("blocked_by_name"), col("is_osi_approved").as("osi_by_name"))
    df.withColumn("norm_license", normalizeNameCol(col(rawCol)))
      .join(broadcast(byId), col("norm_license") === col("norm_id"), "left_outer")
      .join(broadcast(byName), col("norm_license") === col("norm_name"), "left_outer")
      .withColumn("spdx_id", coalesce(col("spdx_by_id"), col("spdx_by_name")))
      .withColumn("is_blocked",
        when(col("spdx_id").isNotNull,
          coalesce(col("blocked_by_id"), col("blocked_by_name"))))
      .withColumn("is_osi_approved",
        when(col("spdx_id").isNotNull, coalesce(col("osi_by_id"), col("osi_by_name"))))
      .drop("norm_id", "norm_name", "spdx_by_id", "spdx_by_name",
        "blocked_by_id", "blocked_by_name", "osi_by_id", "osi_by_name")
  }
}
