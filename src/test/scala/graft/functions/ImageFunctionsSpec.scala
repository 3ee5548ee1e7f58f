package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.SyntheticStore

/** North-rule row invariants (BASELINE.json input_hint): decoded-pixel
  * allclose — bit-exact for lossless formats, PSNR ≥ 40 dB for lossy —
  * plus pHash determinism, over the deterministic fixture generator.
  */
class ImageFunctionsSpec extends AnyFunSuite {

  test("png/bmp encode-decode is bit-exact") {
    for (id <- Seq(4L, 5L, 8L, 13L, 100L)) { // ids hitting png (0) / bmp (1)
      val fmt = SyntheticStore.fmtOf(id)
      if (fmt == "png" || fmt == "bmp") {
        val (w, h) = SyntheticStore.dims(id)
        val px = SyntheticStore.pixels(id, w, h, fmt)
        val bytes = ImageFunctions.encode(px, w, h, fmt)
        val img = ImageFunctions.decode(bytes).get
        assert(img.getWidth == w && img.getHeight == h)
        assert(ImageFunctions.pixelsOf(img).sameElements(px), s"id=$id fmt=$fmt not bit-exact")
      }
    }
  }

  test("gif (grayscale palette) decode is bit-exact") {
    for (id <- Seq(2L, 6L, 10L, 42L)) {
      assert(SyntheticStore.fmtOf(id) == "gif")
      val (w, h) = SyntheticStore.dims(id)
      val px = SyntheticStore.pixels(id, w, h, "gif")
      val bytes = ImageFunctions.encode(px, w, h, "gif")
      val img = ImageFunctions.decode(bytes).get
      val psnr = ImageFunctions.psnr(ImageFunctions.pixelsOf(img), px)
      assert(psnr >= 99.0, s"gif id=$id PSNR=$psnr (palette not lossless)")
    }
  }

  test("jpg decode PSNR >= 40 dB (lossy invariant)") {
    for (id <- Seq(3L, 7L, 11L, 43L, 103L)) {
      assert(SyntheticStore.fmtOf(id) == "jpg")
      val (w, h) = SyntheticStore.dims(id)
      val px = SyntheticStore.pixels(id, w, h, "jpg")
      val bytes = ImageFunctions.encode(px, w, h, "jpg")
      val img = ImageFunctions.decode(bytes).get
      val psnr = ImageFunctions.psnr(ImageFunctions.pixelsOf(img), px)
      assert(psnr >= 40.0, s"jpg id=$id PSNR=$psnr < 40 dB")
    }
  }

  test("phash deterministic + stable under lossy round-trip") {
    for (id <- Seq(1L, 2L, 3L, 4L)) {
      val r1 = SyntheticStore.row(id)
      val r2 = SyntheticStore.row(id)
      assert(r1.phash == r2.phash, "generation not deterministic")
      val recomputed = ImageFunctions.phashOfBytes(r1.bytes).get
      assert(recomputed == r1.phash, s"stored phash != recomputed for id=$id")
    }
  }

  test("phash separates different images, survives small distortion") {
    val a = SyntheticStore.row(1L)
    val b = SyntheticStore.row(2L)
    assert(ImageFunctions.hamming(a.phash, b.phash) > 4,
      "distinct gradient images should have distant hashes")
  }

  test("psnr: identical images capped at 99; known noise level computes") {
    val px = SyntheticStore.pixels(1L, 16, 16, "png")
    assert(ImageFunctions.psnr(px, px) == 99.0)
    val noisy = px.clone()
    noisy(0) = noisy(0) ^ 0x000004 // tweak one blue channel by 4
    val p = ImageFunctions.psnr(px, noisy)
    assert(p > 50 && p < 99)
  }
}
