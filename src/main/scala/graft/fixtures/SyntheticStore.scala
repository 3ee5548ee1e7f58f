package graft.fixtures

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.functions.ImageFunctions

/** Deterministic synthetic image+caption store (FIXTURES.md §F1) — the
  * BASELINE.json `input_hint` table, generated with seed-derived pure
  * functions of the row id (no RNG state, so generation is embarrassingly
  * parallel and identical at any parallelism level).
  *
  * Schema: (image_id:string, bytes:binary, w:int, h:int, fmt:string,
  * caption:string, phash:long) — exactly the north-rule shape. The fetch
  * stage "downloads" from this table, mirroring how the reference's
  * Thingiverse fetcher reads a local store (thingiverse.py:344-373).
  */
object SyntheticStore {

  /** splitmix64 — tiny deterministic hash for fixture generation. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  val formats: Array[String] = Array("png", "bmp", "gif", "jpg")

  final case class StoreRow(image_id: String, bytes: Array[Byte], w: Int, h: Int,
      fmt: String, caption: String, phash: Long)

  /** Default 8..64 px (FIXTURES.md F1 unit/e2e scale); the bench store uses
    * a larger range so decode cost is realistic for an image crawl.
    */
  def dims(id: Long, minPx: Int = 8, maxPx: Int = 64): (Int, Int) = {
    val h1 = mix64(id * 31 + 7)
    val span = (maxPx - minPx + 1).toLong
    (minPx + Math.floorMod(h1, span).toInt, minPx + Math.floorMod(h1 >>> 8, span).toInt)
  }

  def fmtOf(id: Long): String = formats((id % 4).toInt)

  /** Smooth per-id gradient pixels (JPEG-friendly: low spatial frequency so
    * quality-0.92 encoding stays above the 40 dB invariant). GIF rows are
    * grayscale (≤256 distinct colors) so palette quantization is lossless.
    */
  def pixels(id: Long, w: Int, h: Int, fmt: String): Array[Int] = {
    val h1 = mix64(id)
    val r0 = ((h1 >>> 0) & 0xFF).toInt
    val g0 = ((h1 >>> 8) & 0xFF).toInt
    val b0 = ((h1 >>> 16) & 0xFF).toInt
    val dirX = ((h1 >>> 24) & 0x3).toInt - 1 // -1, 0, 1, 2
    val dirY = ((h1 >>> 26) & 0x3).toInt - 1
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val t = (dirX * x * 127 / math.max(1, w - 1) + dirY * y * 127 / math.max(1, h - 1))
        def ch(c0: Int, k: Int): Int = math.max(0, math.min(255, c0 + t * k / 2))
        val (r, g, b) =
          if (fmt == "gif") { val v = ch((r0 + g0 + b0) / 3, 1); (v, v, v) }
          else (ch(r0, 1), ch(g0, 1), ch(b0, 1))
        out(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    out
  }

  private val loremWords = Array(
    "open", "hardware", "design", "assembly", "frame", "sensor", "module",
    "bracket", "mount", "printed", "laser", "cut", "board", "housing",
    "gear", "motor", "arduino", "chassis", "filament", "enclosure")

  /** Caption with deterministic HTML markup and mojibake samples
    * (FIXTURES.md F1: exercises strip_html / fix_encoding goldens).
    */
  def caption(id: Long): String = {
    val h1 = mix64(id * 17 + 3)
    val words = (0 until 6).map(i => loremWords(Math.floorMod(h1 >>> (i * 8), loremWords.length.toLong).toInt))
    val base = s"Project $id — ${words.mkString(" ")}"
    (id % 10) match {
      case 3 => s"<b>Project $id</b> — <i>${words.mkString(" ")}</i>" // HTML to strip
      case 7 => base.replace("—", "â€”") // UTF-8-as-latin1 mojibake to fix
      case _ => base
    }
  }

  def row(id: Long, minPx: Int = 8, maxPx: Int = 64): StoreRow = {
    val (w, h) = dims(id, minPx, maxPx)
    val fmt = fmtOf(id)
    val px = pixels(id, w, h, fmt)
    val bytes = ImageFunctions.encode(px, w, h, fmt)
    // phash over the *decoded* pixels so the stored hash matches what a
    // consumer recomputes from `bytes` (jpg/gif decode ≠ source pixels).
    val decoded = ImageFunctions.decode(bytes).get
    val phash = ImageFunctions.aHash64(
      ImageFunctions.pixelsOf(decoded), decoded.getWidth, decoded.getHeight)
    StoreRow(s"thing:$id/img:0", bytes, w, h, fmt, caption(id), phash)
  }

  /** The unit path the crawl frontier uses for this store row — Thingiverse
    * id/10000 grouping (hosting_unit_web.py:28-33).
    */
  def unitPath(id: Long): String = s"thingiverse.com/${id / 10000}/$id"

  /** Distributed deterministic generation: ids 1..n. */
  def generate(spark: SparkSession, n: Long, partitions: Int = 32,
      minPx: Int = 8, maxPx: Int = 64): DataFrame = {
    import spark.implicits._
    spark.range(1, n + 1, 1, partitions).as[Long].map(id => row(id, minPx, maxPx)).toDF()
  }

  /** Materialize to parquet once; reuse across runs (id-stable). The
    * marker alone is NOT trusted: a partial dump (files deleted under a
    * surviving _SUCCESS, or a crashed overwrite) would silently serve a
    * truncated corpus to every consumer — the row count is re-verified
    * from the parquet footers and a mismatching dump is rewritten.
    */
  def ensureOnDisk(spark: SparkSession, dir: String, n: Long,
      minPx: Int = 8, maxPx: Int = 64): String = {
    val marker = new java.io.File(s"$dir/_SUCCESS")
    val intact = marker.exists() &&
      (try spark.read.parquet(dir).count() == n
       catch { case _: Throwable => false })
    if (!intact) {
      // 128 output files: parquet row groups are the split unit for the
      // binary payload, so file count bounds downstream scan parallelism
      generate(spark, n, 128, minPx, maxPx).write.mode(SaveMode.Overwrite).parquet(dir)
    }
    dir
  }
}
