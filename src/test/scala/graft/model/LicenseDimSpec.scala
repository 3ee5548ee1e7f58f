package graft.model

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class LicenseDimSpec extends SparkTestBase {
  import spark.implicits._

  test("normalize_name: NFKD + casefold + ascii-ignore + strip (ref licenses.py:113-114)") {
    assert(LicenseDim.normalizeName("MIT") == "mit")
    assert(LicenseDim.normalizeName("ＭＩＴ") == "mit") // fullwidth → NFKD → ascii
    assert(LicenseDim.normalizeName("  Apache License 2.0 ") == "apache license 2.0")
    assert(LicenseDim.normalizeName("Straße") == "strasse") // casefold ß → ss
    assert(LicenseDim.normalizeName("Café") == "cafe") // combining accent dropped
    assert(LicenseDim.normalizeName(null) == null)
  }

  test("licenses dim: base ∪ extra merged by normalized id, extra wins (licenses.py:117-159)") {
    val dim = LicenseDim.licenses(spark).cache()
    // normalized keys are unique → resolution joins can't fan out
    assert(dim.groupBy("norm_id").count().filter(col("count") > 1).count() == 0)
    assert(dim.groupBy("norm_name").count().filter(col("count") > 1).count() == 0)
    val byId = dim.collect().map(r => r.getAs[String]("license_id") -> r).toMap
    // extra-only entry present
    assert(byId.contains("SHL-2.1"))
    // overlay fields won the merge
    assert(byId("CC-BY-NC-4.0").getAs[Boolean]("is_blocked"))
    assert(byId("CC-BY-NC-4.0").getAs[String]("license_type") == "documentation")
    assert(byId("CERN-OHL-S-2.0").getAs[String]("license_type") == "hardware")
    // base fields survive where extra has none
    assert(byId("MIT").getAs[Boolean]("is_osi_approved"))
    assert(!byId("MIT").getAs[Boolean]("is_blocked"))
    assert(byId("MIT").getAs[String]("reference") == "https://spdx.org/licenses/MIT.html")
    dim.unpersist()
  }

  test("resolve: id casing/width, name fallback, blocklist, unknown (licenses.py:197-226)") {
    val raw = Seq("MIT", "mit", "Apache License 2.0", "ＭＩＴ",
      "GNU General Public License v3.0 or later", "CC-BY-NC-4.0", "Nope License")
      .toDF("raw_license")
    val out = LicenseDim.resolve(spark, raw, "raw_license")
      .select("raw_license", "spdx_id", "is_blocked").collect()
      .map(r => r.getString(0) -> (r.getString(1), Option(r.get(2)))).toMap
    assert(out("MIT") == ("MIT", Some(false)))
    assert(out("mit") == ("MIT", Some(false)))
    assert(out("ＭＩＴ") == ("MIT", Some(false)))
    assert(out("Apache License 2.0") == ("Apache-2.0", Some(false)))
    assert(out("GNU General Public License v3.0 or later") ==
      ("GPL-3.0-or-later", Some(false)))
    assert(out("CC-BY-NC-4.0") == ("CC-BY-NC-4.0", Some(true)))
    assert(out("Nope License") == (null, None))
  }

  test("normalizeNameCol (ASCII fast path + UDF fallback) ≡ normalizeName") {
    val inputs = Seq("MIT", "mit", "  Apache License 2.0 ", "ＭＩＴ",
      "Straße", "Café", "CC-BY-4.0", "", "  ", "ǅungla")
    val viaCol = inputs.toDF("s")
      .select(LicenseDim.normalizeNameCol(col("s"))).as[String].collect()
    assert(viaCol.toSeq == inputs.map(LicenseDim.normalizeName))
    // null rides through both paths
    val nullOut = Seq[String](null).toDF("s")
      .select(LicenseDim.normalizeNameCol(col("s"))).collect()(0)
    assert(nullOut.isNullAt(0))
  }

  test("assetPath is content-hash keyed (stale copies can't be reused)") {
    val a = LicenseDim.assetPath("spdx-licenses.json")
    val b = LicenseDim.assetPath("spdx-licenses.json")
    assert(a == b) // idempotent within a jar version
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(a)))
    // key embeds a digest of the resource bytes, not just the name
    assert(java.nio.file.Paths.get(a).getFileName.toString
      .matches("[0-9a-f]{16}-spdx-licenses\\.json"))
  }

  test("resolution joins broadcast the dimension (fact side unshuffled)") {
    val raw = Seq("MIT", "mit").toDF("raw_license")
    val plan = LicenseDim.resolve(spark, raw, "raw_license")
      .queryExecution.executedPlan.toString
    // scope to the resolution joins (the cached dim BUILD below
    // InMemoryRelation is a one-time tiny full-outer merge — irrelevant)
    val resolution = plan.split("InMemoryRelation").head
    assert(resolution.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin") >= 2, s"license dim not broadcast:\n$plan")
    assert(!resolution.contains("SortMergeJoin"))
  }

  test("S14 asset csv dims agree with the row-level constants") {
    import graft.functions.ScalarFunctions
    val csvFormats = ScalarFunctions.fileFormatsDf(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(csvFormats == ScalarFunctions.fileFormats.toSet)
    val csvMimes = ScalarFunctions.mimeTypesDf(spark).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(csvMimes == ScalarFunctions.mimeTypes)
  }
}
