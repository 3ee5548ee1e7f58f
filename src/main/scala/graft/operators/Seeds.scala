package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic seed-list construction from the driver's `part` table.
  *
  * The reference consumes a flat one-column URL list
  * (manifests_list_flat.py:45-52); our oracle-checked queries need the SAME
  * seed list constructible in both Spark and DuckDB, so seeds are derived
  * arithmetically from `p_partkey` — five platform URL shapes by
  * `p_partkey % 5` (thingiverse, github, oshwa, gitlab, codeberg), each with
  * a duplicate alias row (same canonical unit via a different URL where the
  * platform has one) to exercise URL-seen dedup, exactly like the fixture
  * contract in FIXTURES.md §F2. The forge aliases cover the parser branches
  * of hosting_unit_forge.py:74-149: github blob ↔ raw.githubusercontent,
  * gitlab `-/blob` ↔ `-/raw`, codeberg `raw` ↔ `blob`.
  *
  * `seq` is the file-order column (W1): primary rows get `2*k`, alias rows
  * `2*k+1`, so first-wins dedup always keeps the primary form.
  */
object Seeds {

  /** Spark side. Columns: url, seq. */
  def seeds(spark: SparkSession, sfDir: String): DataFrame = {
    // scan floor: the key table is a single tiny split, but every frontier
    // query funnels these rows through the canonicalize UDF — see ScanFloor
    val part = ScanFloor(
      spark.read.parquet(s"$sfDir/part.parquet").select(col("p_partkey").as("k")))
    val kStr = col("k").cast("string")
    def shape(aliasForm: Boolean) = {
      val gh =
        if (aliasForm) // same unit via raw.githubusercontent.com
          concat(lit("https://raw.githubusercontent.com/owner"),
            pmod(col("k"), lit(10)).cast("string"),
            lit("/repo"), kStr, lit("/main/okh.toml"))
        else
          concat(lit("https://github.com/owner"), pmod(col("k"), lit(10)).cast("string"),
            lit("/repo"), kStr, lit("/blob/main/okh.toml"))
      val gl = concat(lit("https://gitlab.com/group"), pmod(col("k"), lit(4)).cast("string"),
        lit("/proj"), kStr, lit(if (aliasForm) "/-/raw/main/okh.toml" else "/-/blob/main/okh.toml"))
      val cb = concat(lit("https://codeberg.org/org"), pmod(col("k"), lit(3)).cast("string"),
        lit("/unit"), kStr, lit(if (aliasForm) "/blob/main/okh.toml" else "/raw/main/okh.toml"))
      when(pmod(col("k"), lit(5)) === 0,
        concat(lit("https://www.thingiverse.com/thing:"), kStr))
        .when(pmod(col("k"), lit(5)) === 1, gh)
        .when(pmod(col("k"), lit(5)) === 2,
          concat(lit("https://certification.oshwa.org/"),
            format_string("us%06d", col("k")), lit(".html")))
        .when(pmod(col("k"), lit(5)) === 3, gl)
        .otherwise(cb)
    }
    // one scan: primary + alias emitted via explode from the same pass
    // (the previous union of two projections scanned part.parquet twice);
    // the (url, seq) row multiset is identical
    part.select(explode(array(
      struct(shape(aliasForm = false).as("url"), (col("k") * 2).as("seq")),
      struct(shape(aliasForm = true).as("url"), (col("k") * 2 + 1).as("seq")))).as("r"))
      .select(col("r.url").as("url"), col("r.seq").as("seq"))
  }

  /** DuckDB oracle CTE producing the identical (url, seq) rows. */
  val seedsSql: String =
    """seeds AS (
      |  SELECT CASE p_partkey % 5
      |      WHEN 0 THEN 'https://www.thingiverse.com/thing:' || p_partkey
      |      WHEN 1 THEN 'https://github.com/owner' || (p_partkey % 10) || '/repo' || p_partkey || '/blob/main/okh.toml'
      |      WHEN 2 THEN 'https://certification.oshwa.org/' || printf('us%06d', p_partkey) || '.html'
      |      WHEN 3 THEN 'https://gitlab.com/group' || (p_partkey % 4) || '/proj' || p_partkey || '/-/blob/main/okh.toml'
      |      ELSE 'https://codeberg.org/org' || (p_partkey % 3) || '/unit' || p_partkey || '/raw/main/okh.toml'
      |    END AS url,
      |    p_partkey * 2 AS seq
      |  FROM part
      |  UNION ALL
      |  SELECT CASE p_partkey % 5
      |      WHEN 0 THEN 'https://www.thingiverse.com/thing:' || p_partkey
      |      WHEN 1 THEN 'https://raw.githubusercontent.com/owner' || (p_partkey % 10) || '/repo' || p_partkey || '/main/okh.toml'
      |      WHEN 2 THEN 'https://certification.oshwa.org/' || printf('us%06d', p_partkey) || '.html'
      |      WHEN 3 THEN 'https://gitlab.com/group' || (p_partkey % 4) || '/proj' || p_partkey || '/-/raw/main/okh.toml'
      |      ELSE 'https://codeberg.org/org' || (p_partkey % 3) || '/unit' || p_partkey || '/blob/main/okh.toml'
      |    END AS url,
      |    p_partkey * 2 + 1 AS seq
      |  FROM part
      |)""".stripMargin

  /** DuckDB oracle CTE: canonical (unit_path, hosting_id, priority, seq) for
    * the seed rows — the arithmetic mirror of what
    * `graft.model.UrlCanonicalizer` computes structurally. Keeping both in
    * one query proves the Scala parser against the closed-form expectation.
    */
  val canonSql: String = {
    val unitCase =
      """CASE p_partkey % 5
        |      WHEN 0 THEN 'thingiverse.com/' || CAST(p_partkey // 10000 AS VARCHAR) || '/' || p_partkey
        |      WHEN 1 THEN 'github.com/owner' || (p_partkey % 10) || '/repo' || p_partkey || '/main/okh.toml'
        |      WHEN 2 THEN 'oshwa.org/' || printf('us%06d', p_partkey)
        |      WHEN 3 THEN 'gitlab.com/group' || (p_partkey % 4) || '/proj' || p_partkey || '/main/okh.toml'
        |      ELSE 'codeberg.org/org' || (p_partkey % 3) || '/unit' || p_partkey || '/main/okh.toml'
        |    END AS unit_path,
        |    CASE p_partkey % 5
        |      WHEN 0 THEN 'thingiverse.com' WHEN 1 THEN 'github.com'
        |      WHEN 2 THEN 'oshwa.org' WHEN 3 THEN 'gitlab.com' ELSE 'codeberg.org'
        |    END AS hosting_id,
        |    CASE p_partkey % 5 WHEN 0 THEN 4 WHEN 1 THEN 2 WHEN 2 THEN 3
        |      WHEN 3 THEN 5 ELSE 6 END AS priority""".stripMargin
    s"""canon AS (
       |  SELECT $unitCase,
       |    p_partkey * 2 AS seq
       |  FROM part
       |  UNION ALL
       |  SELECT $unitCase,
       |    p_partkey * 2 + 1 AS seq
       |  FROM part
       |)""".stripMargin
  }
}
