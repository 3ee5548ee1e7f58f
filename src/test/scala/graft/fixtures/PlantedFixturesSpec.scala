package graft.fixtures

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.operators.{TextOps, VectorOps}

/** The planted-duplicate corpora's closed-form guarantees, asserted at the
  * operator level (the driver gate asserts the same sets via DuckDB):
  * detection is exactly the planted pair set — no misses, no false
  * positives — and the normalization-equivalent variants pin the metric
  * values bit-exactly.
  */
class PlantedFixturesSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("minhash LSH over the planted corpus: detected == planted, " +
      "exact variants at eq=1000") {
    val docs = PlantedFixtures.nearDupDocs(spark, sfDir)
    val got = TextOps.minhashLshOf(spark, docs, "spec-planted")
      .select("doc_a", "doc_b", "eq_permille")
      .as[(Long, Long, Long)].collect()
    val planted = PlantedFixtures.nearDupPairs(spark, sfDir)
      .as[(Long, Long, String)].collect()
      .map { case (a, b, v) => (a, b) -> v }.toMap
    assert(got.map(r => (r._1, r._2)).toSet == planted.keySet,
      "LSH output differs from the planted pair set")
    got.foreach { case (a, b, eq) =>
      planted((a, b)) match {
        case "upper" | "space" => assert(eq == 1000L, s"($a,$b) eq=$eq")
        case "append" => assert(eq >= 500L, s"($a,$b) append eq=$eq")
      }
    }
  }

  test("simhash over the bag-preserving corpus: clone signatures are " +
      "bit-identical; pair detection == planted") {
    val docs = PlantedFixtures.bagDupDocs(spark, sfDir)
    val sig = TextOps.simhashOf(docs)
      .as[(Long, Long)].collect().toMap
    val planted = PlantedFixtures.bagDupPairs(spark, sfDir)
      .as[(Long, Long, String)].collect()
    assert(planted.nonEmpty)
    planted.foreach { case (a, b, v) =>
      assert(sig(a) == sig(b), s"variant $v changed the simhash of $a")
    }
    val pairs = TextOps.simhashPairsOf(spark, docs, "spec-planted")
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Int)].collect()
    assert(pairs.map(r => (r._1, r._2)).toSet ==
      planted.map(p => (p._1, p._2)).toSet)
    assert(pairs.forall(_._3 == 0))
  }

  test("dedup clustering: LSH pairs over chain corpus collapse to " +
      "closed-form 3-member components with min-id canonicals") {
    val docs = PlantedFixtures.chainDupDocs(spark, sfDir)
    val pairs = TextOps.minhashLshOf(spark, docs, "spec-chain")
      .select("doc_a", "doc_b")
    val comp = TextOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val evens = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey").as[Long].collect().filter(_ % 2 == 0)
    assert(evens.nonEmpty)
    assert(comp.size == evens.length * 3,
      s"expected ${evens.length * 3} clustered docs, got ${comp.size}")
    evens.foreach { k =>
      assert(comp(k) == k)
      assert(comp(k + PlantedFixtures.CloneOffset) == k)
      assert(comp(k + 2 * PlantedFixtures.CloneOffset) == k)
    }
  }

  test("hyperplane-LSH ANN over planted neighbors: exact and ×2 clones " +
      "occupy ranks 1 and 2 for every query") {
    val emb = PlantedFixtures.plantedEmbeddings(spark, sfDir)
    val got = VectorOps.annLshOf(spark, emb, "spec-planted", nQueries = 20, k = 2)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(got.keySet == (0L until 20L).toSet)
    got.foreach { case (qid, neighbors) =>
      assert(neighbors == Seq(qid + PlantedFixtures.CloneExact,
        qid + PlantedFixtures.CloneScaled), s"qid=$qid got $neighbors")
    }
  }
}
