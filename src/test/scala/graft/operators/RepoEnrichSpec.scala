package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class RepoEnrichSpec extends SparkTestBase {
  import spark.implicits._

  test("S4/J3: one lookup per distinct repo (memoization), broadcast-back join") {
    val frontier = (1 to 300).map(i =>
      (s"owner${i % 3}", s"repo${i % 5}",
        if (i % 4 == 0) Some(s"v$i") else None))
      .toDF("owner", "repo", "ref")
    val calls = spark.sparkContext.longAccumulator("lookups")
    val out = RepoEnrich.enrich(spark, frontier, (o, r) => {
      calls.add(1); RepoEnrich.defaultBranchOf(o, r)
    })
    val rows = out.collect()
    assert(rows.length == 300)
    // memoization: 15 distinct (owner, repo) pairs → exactly 15 lookups
    assert(calls.value == 15, s"lookup called ${calls.value} times")
    // explicit refs survive; missing refs take the default branch
    rows.foreach { r =>
      val expected = Option(r.getAs[String]("ref"))
      assert(expected.nonEmpty)
      if (!r.getAs[String]("ref").startsWith("v"))
        assert(r.getAs[String]("ref") == r.getAs[String]("default_branch"))
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"repo dim not broadcast back:\n$plan")
  }

  test("manifest probe order: first existing okh.<ext> wins; no hit → null (github.py:43,362-368)") {
    val units = Seq("u1", "u2", "u3").toDF("unit_path")
    val files = Seq(
      ("u1", "okh.jsonld"), ("u1", "okh.yml"), // yml (rank 2) beats jsonld (6)
      ("u2", "readme.md") // no manifest at all
      // u3 has no files row
    ).toDF("unit_path", "file_name")
    val out = RepoEnrich.probeManifest(units, files)
      .select("unit_path", "manifest_file").as[(String, String)].collect().toMap
    assert(out("u1") == "okh.yml")
    assert(out("u2") == null)
    assert(out("u3") == null)
  }
}
