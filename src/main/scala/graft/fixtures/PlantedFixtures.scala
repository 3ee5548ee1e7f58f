package graft.fixtures

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted-duplicate corpora for the near-dup/LSH operator family
  * (VERDICT r3 next-round #1): synthetic documents/embeddings where the
  * near-duplicate pairs exist BY CONSTRUCTION, so the expected output of
  * MinHash-LSH / SimHash / hyperplane-LSH ANN is a closed-form set —
  * engine-independent, expressible in DuckDB without replicating Spark's
  * xxhash64.
  *
  * Construction rules that make the expectation exact:
  *  - Base documents use pairwise-DISJOINT vocabularies (every word embeds
  *    its key), so no two base docs share a shingle, a minhash component,
  *    or a band bucket: false-positive candidates are impossible (only a
  *    64-bit hash collision between different strings could create one).
  *  - `upper` / `space` clones are IDENTICAL to their base after the
  *    operators' own normalization (lower + \s+ split) → identical shingle
  *    sets → identical signatures: eq_permille = 1000 and Hamming = 0
  *    exactly, for any hash function.
  *  - `reverse` clones (simhash corpus) permute word ORDER only: the
  *    unigram bag is unchanged → identical SimHash, Hamming = 0 exactly.
  *  - `append` clones (minhash corpus) add `AppendWords` fresh words to a
  *    `BaseWords`-word doc: true Jaccard = (BaseWords-4)/(BaseWords+
  *    AppendWords-4) ≈ 0.92, so every 4-row band matches with p ≈ 0.71 and
  *    the 16-band miss probability is (1-0.71)^16 ≈ 2.6e-9 — plus the
  *    corpus is FIXED (deterministic hashes), so detection is verified
  *    once per scale and then stable forever.
  *  - Embedding clones are the exact vector (offset `CloneExact`) and the
  *    vector scaled by 2.0f (offset `CloneScaled`). Scaling by a power of
  *    two is EXACT in IEEE float/double, and every operator intermediate
  *    (elementwise products, running sums, sqrt of a 4×-scaled sum) scales
  *    by the same exact power of two — so both clones land in the query's
  *    bucket with BIT-IDENTICAL cosine ≈ 1.0, and the (sim desc,
  *    neighbor_id) tie-break puts CloneExact at rank 1, CloneScaled at
  *    rank 2, deterministically.
  */
object PlantedFixtures {

  /** doc_id offset of a clone relative to its base key (beyond any
    * p_partkey/vec_id in the test data).
    */
  val CloneOffset = 10000000L
  /** vec_id offsets for the two embedding clones. */
  val CloneExact = 10000000L
  val CloneScaled = 20000000L
  /** doc_id offset of the brightness-shifted image clone (+8 to every
    * channel of every pixel — a TRUE perceptual near-dup, PSNR ≈ 30 dB,
    * not pixel-identical).
    */
  val CloneShifted = 30000000L

  /** Channel headroom of noise-image pixels: values are in [0, 248) so the
    * +8 brightness shift never clamps — the shift is exactly uniform, and
    * aHash (sign of block gray vs the image mean) is exactly invariant.
    */
  val NoiseChannelCap = 248
  val BrightnessShift = 8

  val BaseWords = 60
  val AppendWords = 5

  private def partKeys(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/part.parquet").select(col("p_partkey").as("k"))

  /** Base text for key k: `BaseWords` words `w<k>x<i>` — vocabulary
    * disjoint across keys.
    */
  private val baseTextExpr =
    expr(s"array_join(transform(sequence(0, ${BaseWords - 1}), " +
      "i -> concat('w', k, 'x', i)), ' ')")

  /** `text` plus `AppendWords` fresh words — ONE definition of the
    * bounded perturbation (the Jaccard ≈ 0.92 reasoning in both the
    * near-dup and chain corpora rests on exactly this construction).
    */
  private def appendedText(text: Column): Column =
    concat(text, lit(" "),
      expr(s"array_join(transform(sequence(0, ${AppendWords - 1}), " +
        "i -> concat('z', k, 'a', i)), ' ')"))

  private def withVariant(variants: Seq[String]) =
    element_at(array(variants.map(lit): _*),
      (pmod(floor(col("k") / 2), lit(variants.size)).cast("int") + 1))

  private def corpus(spark: SparkSession, sfDir: String,
      variants: Seq[String], cloneText: Column): DataFrame = {
    val base = partKeys(spark, sfDir).withColumn("text", baseTextExpr)
    val clones = base.filter(pmod(col("k"), lit(2)) === 0)
      .withColumn("variant", withVariant(variants))
      .select((col("k") + CloneOffset).as("doc_id"), cloneText.as("text"))
    base.select(col("k").as("doc_id"), col("text")).unionByName(clones)
  }

  /** Shingle-family corpus (MinHash/LSH): order-preserving variants
    * upper / space / append. Clones exist for even keys only — odd keys
    * are the planted NEGATIVES (must never pair with anything).
    */
  def nearDupDocs(spark: SparkSession, sfDir: String): DataFrame =
    corpus(spark, sfDir, Seq("upper", "space", "append"),
      when(col("variant") === "upper", upper(col("text")))
        .when(col("variant") === "space",
          regexp_replace(col("text"), " ", "  "))
        .otherwise(appendedText(col("text"))))

  /** Bag-of-words corpus (SimHash): variants upper / space / reverse —
    * all three preserve the unigram bag exactly, so clone SimHash ==
    * base SimHash bit-for-bit.
    */
  def bagDupDocs(spark: SparkSession, sfDir: String): DataFrame =
    corpus(spark, sfDir, Seq("upper", "space", "reverse"),
      when(col("variant") === "upper", upper(col("text")))
        .when(col("variant") === "space",
          regexp_replace(col("text"), " ", "  "))
        .otherwise(expr("array_join(reverse(split(text, ' ')), ' ')")))

  /** The planted pair set (doc_a = base key, doc_b = its clone, variant). */
  def plantedPairs(spark: SparkSession, sfDir: String,
      variants: Seq[String]): DataFrame =
    partKeys(spark, sfDir).filter(pmod(col("k"), lit(2)) === 0)
      .select(col("k").as("doc_a"), (col("k") + CloneOffset).as("doc_b"),
        withVariant(variants).as("variant"))

  def nearDupPairs(spark: SparkSession, sfDir: String): DataFrame =
    plantedPairs(spark, sfDir, Seq("upper", "space", "append"))

  def bagDupPairs(spark: SparkSession, sfDir: String): DataFrame =
    plantedPairs(spark, sfDir, Seq("upper", "space", "reverse"))

  /** Chain corpus for dedup CLUSTERING: per even key, a 3-member chain —
    * base k, an exact-after-normalization clone at k+CloneOffset (upper),
    * and an append-perturbed clone at k+2·CloneOffset. Edge guarantees:
    * k↔clone1 is CERTAIN (identical shingle sets → identical signatures);
    * k↔clone2 and clone1↔clone2 are each near-certain (clone2 differs
    * from BOTH by the same `AppendWords` appended words → Jaccard ≈ 0.92,
    * 16-band miss probability ≈ 2.6e-9, fixed by corpus determinism).
    * Any of the {k↔clone2, clone1↔clone2} edges connects clone2, so the
    * component is {k, k+1e7, k+2e7} with canonical = k (min id) —
    * closed-form in DuckDB regardless of WHICH of the probabilistic edges
    * LSH emits, as long as at least one does (verified at every scale).
    */
  def chainDupDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val base = partKeys(spark, sfDir).withColumn("text", baseTextExpr)
    val even = base.filter(pmod(col("k"), lit(2)) === 0)
    val clone1 = even.select((col("k") + CloneOffset).as("doc_id"),
      upper(col("text")).as("text"))
    val clone2 = even.select((col("k") + 2 * CloneOffset).as("doc_id"),
      appendedText(col("text")).as("text"))
    base.select(col("k").as("doc_id"), col("text"))
      .unionByName(clone1).unionByName(clone2)
  }

  /** Noise-textured query images for the image near-dup corpus
    * (`q_image_neardup`). The synthetic store's gradient images are
    * aHash-DEGENERATE by construction — the sign pattern depends only on
    * the gradient direction (~16 classes), so store images collide at
    * Hamming 0 en masse and no closed-form pair oracle can be built over
    * them. Per-pixel hash noise is the image analogue of the disjoint-
    * vocabulary rule above: every aHash bit is an independent coin flip
    * per doc_id, so distinct noise images sit at pairwise Hamming ≈ 32
    * (P[≤ 3] ≈ 7e-15 per pair), and noise-vs-gradient distances are just
    * as far — deterministic content, so the separation is verified once
    * in the spec and stable forever. Channels stay under
    * `NoiseChannelCap` so the `CloneShifted` brightness shift never
    * clamps (see `brightnessShifted`).
    */
  def noiseImagePixels(id: Long, w: Int = 32, h: Int = 32): Array[Int] = {
    val out = new Array[Int](w * h)
    var i = 0
    while (i < out.length) {
      val m = SyntheticStore.mix64(id * 1000003L + i)
      val r = Math.floorMod(m, NoiseChannelCap.toLong).toInt
      val g = Math.floorMod(m >>> 20, NoiseChannelCap.toLong).toInt
      val b = Math.floorMod(m >>> 40, NoiseChannelCap.toLong).toInt
      out(i) = (r << 16) | (g << 8) | b
      i += 1
    }
    out
  }

  /** (doc_id, bytes) noise images for ids 1 until n — lossless PNG, so
    * decoded pixels are exactly `noiseImagePixels(id)`.
    */
  def noiseImages(spark: SparkSession, n: Int): DataFrame = {
    val pngUdf = udf { id: Long =>
      graft.functions.ImageFunctions.encode(noiseImagePixels(id), 32, 32, "png")
    }
    spark.range(1L, n.toLong).select(col("id").as("doc_id"),
      pngUdf(col("id")).as("bytes"))
  }

  /** The brightness-shifted near-dup clone: decode, +`BrightnessShift` to
    * every channel of every pixel, lossless re-encode. Clamp-free by the
    * `NoiseChannelCap` construction, so the shift is exactly uniform:
    * every aHash block gray AND the image mean move by exactly the same
    * amount and the sign bits are unchanged — Hamming 0 against the base,
    * while the pixels differ everywhere (PSNR ≈ 30 dB).
    */
  def brightnessShifted(bytes: Array[Byte]): Array[Byte] = {
    val img = graft.functions.ImageFunctions.decode(bytes).get
    val px = graft.functions.ImageFunctions.pixelsOf(img).map { p =>
      val r = ((p >> 16) & 0xFF) + BrightnessShift
      val g = ((p >> 8) & 0xFF) + BrightnessShift
      val b = (p & 0xFF) + BrightnessShift
      require(r <= 255 && g <= 255 && b <= 255, "shift clamped — corpus bug")
      (r << 16) | (g << 8) | b
    }
    graft.functions.ImageFunctions.encode(px, img.getWidth, img.getHeight, "png")
  }
  val brightnessShiftedUdf = udf(brightnessShifted _)

  /** The planted image near-dup corpus shared by `q_image_neardup` and
    * `q_image_dedup_clusters` (one definition — the two queries share a
    * PlanCache phash key, so their corpora must never drift apart):
    * the dumped store's gradient images (ids ≥ 20) as aHash-degenerate
    * distractors, the noise-textured query images, and the three clone
    * classes per query — exact byte copy (+CloneExact), lossless
    * re-encode through the real resize operator at identity scale
    * (+CloneScaled), and the uniform +8 brightness shift (+CloneShifted).
    */
  def imageNearDupCorpus(spark: SparkSession, dumpDir: String): DataFrame = {
    val background = spark.read.parquet(dumpDir).select(
      regexp_extract(col("image_id"), "^thing:(\\d+)/", 1).cast("long")
        .as("doc_id"),
      col("bytes")).filter(col("doc_id") >= 20)
    val q = noiseImages(spark, 20)
    background.unionByName(q)
      .unionByName(q.select((col("doc_id") + CloneExact).as("doc_id"),
        col("bytes")))
      .unionByName(q.select((col("doc_id") + CloneScaled).as("doc_id"),
        graft.operators.MultimodalOps.resizeUdf(4096)(col("bytes"))
          .as("bytes")))
      .unionByName(q.select((col("doc_id") + CloneShifted).as("doc_id"),
        brightnessShiftedUdf(col("bytes")).as("bytes")))
  }

  /** Planted sitemap corpus for the sitemap source family
    * (`sources/Sitemaps.scala`): per part key k, one `<url>` entry in the
    * urlset of host `site(k%8).example`, child sitemap `sm_((k/8)%4).xml`;
    * per host a `<sitemapindex>` listing its four children and a
    * robots.txt referencing the index (hosts s ≥ 4 ALSO reference `sm_0`
    * directly — the same URLs arrive via both paths and must collapse in
    * the first-wins dedup). Field grammar exercised closed-form:
    *
    *   - k%11 == 0 → the loc carries `?a=1&amp;b=2` (entity-escaped per
    *     protocol) → expected URL has the UNESCAPED `&`
    *   - k%13 == 0 → the loc text is whitespace-padded → trimmed
    *   - k%5  == 0 → no lastmod → null; else lastmod day = 18262 + k%365
    *   - k%4: daily / WEEKLY (→ lowercased) / monthly / quarterly
    *     (invalid → null)
    *   - k%7 == 0 → priority "1.5" (out of range → null); else "0.(k%10)"
    *     → permille (k%10)·100
    *
    * Every expectation is pure key arithmetic → the DuckDB oracle never
    * touches XML.
    */
  def sitemapCorpus(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val keyed = partKeys(spark, sfDir)
      .withColumn("s", pmod(col("k"), lit(8)))
      .withColumn("c", pmod(floor(col("k") / 8).cast("long"), lit(4)))
      .withColumn("host", concat(lit("site"), col("s"), lit(".example")))

    val loc = concat(lit("https://"), col("host"), lit("/p/"), col("k"),
      when(pmod(col("k"), lit(11)) === 0, lit("?a=1&amp;b=2")).otherwise(lit("")))
    val locPadded =
      when(pmod(col("k"), lit(13)) === 0, concat(lit("  "), loc, lit("  ")))
        .otherwise(loc)
    val lastmod =
      when(pmod(col("k"), lit(5)) =!= 0,
        concat(lit("<lastmod>"),
          date_format(date_add(to_date(lit("2020-01-01")),
            pmod(col("k"), lit(365)).cast("int")), "yyyy-MM-dd"),
          lit("</lastmod>"))).otherwise(lit(""))
    val changefreq = concat(lit("<changefreq>"),
      element_at(array(lit("daily"), lit("WEEKLY"), lit("monthly"), lit("quarterly")),
        pmod(col("k"), lit(4)).cast("int") + 1),
      lit("</changefreq>"))
    val priority = concat(lit("<priority>"),
      when(pmod(col("k"), lit(7)) === 0, lit("1.5"))
        .otherwise(concat(lit("0."), pmod(col("k"), lit(10)))),
      lit("</priority>"))
    val entry = concat(lit("<url><loc>"), locPadded, lit("</loc>"),
      lastmod, changefreq, priority, lit("</url>"))

    val docs = keyed
      .withColumn("entry", struct(col("k"), entry.as("e")))
      .groupBy(col("s"), col("c"), col("host"))
      .agg(array_sort(collect_list(col("entry"))).as("entries"))
      .select(
        concat(lit("https://"), col("host"), lit("/sm_"), col("c"), lit(".xml"))
          .as("sitemap_url"),
        concat(
          lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
            "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
          array_join(expr("transform(entries, x -> x.e)"), ""),
          lit("</urlset>")).as("xml"))

    val hosts = keyed.select(col("s"), col("host")).distinct()
    val indexDocs = hosts.select(
      concat(lit("https://"), col("host"), lit("/sitemap_index.xml"))
        .as("sitemap_url"),
      concat(
        lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
          "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
        array_join(expr(
          "transform(sequence(0, 3), c -> concat('<sitemap><loc>https://', host, " +
            "'/sm_', c, '.xml</loc><lastmod>2020-01-0', c + 1, '</lastmod></sitemap>'))"),
          ""),
        lit("</sitemapindex>")).as("xml"))

    val robots = hosts.select(col("host"),
      concat(lit("User-agent: *\nDisallow: /private\nSitemap: https://"),
        col("host"), lit("/sitemap_index.xml\n"),
        when(col("s") >= 4,
          concat(lit("sitemap:   https://"), col("host"), lit("/sm_0.xml  \n")))
          .otherwise(lit(""))).as("robots_txt"))

    (robots, docs.unionByName(indexDocs))
  }

  /** Embeddings ∪ planted neighbors for the first `nQueries` vectors:
    * the exact copy and the ×2.0f copy (see object doc for why both are
    * bit-deterministic through the LSH + cosine path).
    */
  def plantedEmbeddings(spark: SparkSession, sfDir: String,
      nQueries: Int = 20): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q = emb.filter(col("vec_id") < nQueries)
    emb
      .unionByName(q.select((col("vec_id") + CloneExact).as("vec_id"),
        col("embedding")))
      .unionByName(q.select((col("vec_id") + CloneScaled).as("vec_id"),
        expr("transform(embedding, x -> x * cast(2.0 as float))")
          .as("embedding")))
  }
}
