package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-6 optimization equivalence pins: every rewrite that changed an
  * operator's internals is checked against the formulation it replaced,
  * on inputs that exercise the edge cases the rewrite could move.
  */
class OptimizedOpsSpec extends SparkTestBase {

  test("minhash_sig kernel ≡ the builtin expression pipeline it replaced " +
      "(bit-identical XXH64 composition, array_distinct a no-op under min)") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again today",
      "a b c d e", // exactly n words
      "  Mixed   CASE words \t with   odd   whitespace runs here ok then ",
      ("w " * 300).trim, // many duplicate shingles — distinct-vs-not must not matter
      (1 to 80).map(i => s"tok$i").mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val k = 64
    val n = 5
    val words = split(trim(lower(col("text"))), "\\s+")
    val legacy = docs
      .select(col("doc_id"), words.as("words"))
      .filter(size(col("words")) >= n)
      .withColumn("hs", expr(
        s"array_distinct(transform(sequence(1, size(words) - ${n - 1}), i -> xxhash64(concat_ws(' ', slice(words, i, $n)))))"))
      .select(col("doc_id") +: (0 until k).map(i =>
        expr(s"array_min(transform(hs, h -> xxhash64($i, h)))").as(s"mh_$i")): _*)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong(_)).toVector).toMap
    val native = TextOps.minhashSignaturesOf(docs, k)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(native.keySet == legacy.keySet)
    native.foreach { case (id, sig) => assert(sig == legacy(id), s"doc $id") }
  }

  test("metaState single-pass rewrite: ok/non-ok interleavings, all-non-ok " +
      "units, and null content hashes match the two-branch semantics") {
    import spark.implicits._
    // (unit, status, run_seq, content_hash) — unit u3 has NO ok rows; u4's
    // first ok hash is null (the lag-over-ok-rows semantics: a present-but-
    // null previous hash means NOT changed)
    val events = Seq(
      ("u1", "ok", 1L, Some(10L)), ("u1", "error", 2L, Some(99L)),
      ("u1", "ok", 3L, Some(11L)), ("u1", "ok", 4L, Some(11L)),
      ("u2", "ok", 5L, Some(7L)),
      ("u3", "error", 1L, Some(1L)), ("u3", "not_found", 2L, Some(2L)),
      ("u4", "ok", 1L, None), ("u4", "ok", 2L, Some(5L)), ("u4", "ok", 3L, Some(6L)))
      .toDF("unit_path", "status", "run_seq", "content_hash")
    val got = CrawlOps.metaState(events)
      .orderBy("unit_path")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), r.getLong(5), Option(r.get(6)),
        Option(r.get(7)), Option(r.get(8)), Option(r.get(9))))
    // (unit, visits, first, last, last_ok, changes, last_change,
    //  first_ok_hash, first_ok_seq, last_ok_hash)
    assert(got(0) == ("u1", 4L, 1L, 4L, Some(4L), 1L, Some(3L),
      Some(10L), Some(1L), Some(11L)))
    assert(got(1) == ("u2", 1L, 5L, 5L, Some(5L), 0L, None,
      Some(7L), Some(5L), Some(7L)))
    assert(got(2) == ("u3", 2L, 1L, 2L, None, 0L, None, None, None, None))
    // u4: run 1 has a null hash (prev for run 2 is null → NOT changed,
    // matching lag semantics); run 3 changes vs run 2's hash 5
    assert(got(3) == ("u4", 3L, 1L, 3L, Some(3L), 1L, Some(3L),
      None, Some(1L), Some(6L)))
  }

  test("simhash_sig kernel ≡ the explode → groupBy vote pipeline it replaced") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "THE  Quick   brown\tfox dog dog dog", // bag changes, repeated words
      "x", "", // single word / empty-string word
      (1 to 200).map(i => s"w${i % 37}").mkString(" ")) // heavy repeats
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val legacyWords = docs
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .withColumn("h", xxhash64(col("word")))
    val bitVotes = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, col("tf"))
        .otherwise(-col("tf"))).as(s"v_$i")
    }
    val votes = legacyWords.groupBy("doc_id").agg(bitVotes.head, bitVotes.tail: _*)
    val hashExpr = (0 until 64).map { i =>
      when(col(s"v_$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val legacy = votes.select(col("doc_id"), hashExpr.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = TextOps.simhashOf(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == legacy)
  }

  test("pixelsOf raster fast paths ≡ getRGB on every store format " +
      "(png/bmp/gif/jpg round-trips and a synthetic INT_RGB image)") {
    import graft.functions.ImageFunctions
    val rnd = new scala.util.Random(7)
    val w = 37; val h = 23 // odd sizes: catches any stride assumption
    val pixels = Array.fill(w * h)(rnd.nextInt(1 << 24))
    def reference(img: java.awt.image.BufferedImage): Array[Int] = {
      val out = new Array[Int](img.getWidth * img.getHeight)
      img.getRGB(0, 0, img.getWidth, img.getHeight, out, 0, img.getWidth)
      out.map(_ & 0xFFFFFF)
    }
    for (fmt <- Seq("png", "bmp", "gif", "jpg")) {
      val bytes = ImageFunctions.encode(pixels, w, h, fmt)
      val img = ImageFunctions.decode(bytes).get
      assert(ImageFunctions.pixelsOf(img).toSeq == reference(img).toSeq,
        s"fmt=$fmt type=${img.getType}")
    }
    // our own encode() path produces TYPE_INT_RGB before writing
    val direct = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    direct.setRGB(0, 0, w, h, pixels, 0, w)
    assert(ImageFunctions.pixelsOf(direct).toSeq == reference(direct).toSeq)
  }

  test("allocateBudget distributed rewrite ≡ the driver-side " +
      "largest-remainder apportionment it replaced") {
    import spark.implicits._
    // reference reimplementation of the replaced driver-side algorithm
    def legacy(counts: Seq[(String, Long)], budget: Long,
        cap: Long): Map[String, (Long, Long)] = {
      val demands = counts.map { case (h, n) => (h, math.min(n, cap)) }
      val total = demands.map(_._2).sum
      val alloc: Map[String, Long] =
        if (total <= budget) demands.toMap
        else {
          val base = demands.map { case (h, d) =>
            val prod = BigInt(budget) * d
            (h, (prod / total).toLong, (prod % total).toLong)
          }
          val leftover = budget - base.map(_._2).sum
          val bonus = base.sortBy { case (h, _, rem) => (-rem, h) }
            .take(leftover.toInt).map(_._1).toSet
          base.map { case (h, b, _) => h -> (b + (if (bonus(h)) 1L else 0L)) }.toMap
        }
      counts.map { case (h, n) => h -> (n, alloc(h)) }.toMap
    }
    // hosts with remainder ties, a capped giant, an under-budget case
    val hostRows = Seq.tabulate(9)(i => (s"h$i.org", (i % 4) * 7L + 1L)) :+
      ("giant.org", 1000L)
    val due = hostRows.flatMap { case (h, n) => Seq.fill(n.toInt)(h) }
      .toDF("host")
    for ((budget, cap) <- Seq((100L, 20L), (37L, Long.MaxValue),
        (5000L, Long.MaxValue), (0L, 5L), (7L, 3L))) {
      val got = graft.frontier.Recrawl.allocateBudget(due, budget, cap)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == legacy(hostRows, budget, cap), s"budget=$budget cap=$cap")
      assert(got.values.map(_._2).sum ==
        math.min(budget, hostRows.map(c => math.min(c._2, cap)).sum))
    }
  }

  test("minhashLshOf array-signature verify: eq_permille matches the " +
      "per-component fraction") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base), // exact clone → 1000
      (3L, base + " tail extra words appended here")) // near clone
      .toDF("doc_id", "text")
    val pairs = TextOps.minhashLshOf(spark, docs, "opt-spec-mh", minEqPermille = 300)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) == 1000L)
    assert(pairs.keySet.contains((1L, 3L)) || pairs.keySet.contains((2L, 3L)))
    pairs.values.foreach(v => assert(v >= 300L && v <= 1000L))
  }
}
