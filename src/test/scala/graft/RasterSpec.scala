package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Raster
import graft.agg.PhashCentroid

class RasterSpec extends AnyFunSuite {

  test("storedBytes deterministic and fmt-sized") {
    val a = Raster.storedBytes(12345L, 8, 9, "raw")
    val b = Raster.storedBytes(12345L, 8, 9, "raw")
    assert(a.sameElements(b))
    assert(a.length == 8 * 9 * 3)
  }

  test("raw decode is identity; psnr(identical) == 99") {
    val a = Raster.storedBytes(7L, 8, 8, "raw")
    assert(Raster.decode(a, "raw") eq a)
    assert(Raster.psnrDb(a, a) == 99.0)
  }

  test("lossy bytes hold the north-rule PSNR >= 40 dB invariant") {
    (1L to 200L).foreach { k =>
      val truth = Raster.truthRaster(k, 12, 10)
      val lossy = Raster.storedBytes(k, 12, 10, "lossy")
      val p = Raster.psnrDb(truth, lossy)
      assert(p >= 40.0, s"k=$k psnr=$p")
      assert(p < 99.0) // noise actually applied
    }
  }

  test("unknown codec is a clearly-marked stub boundary") {
    intercept[UnsupportedOperationException](Raster.decode(Array[Byte](1), "jpeg"))
  }

  test("resize nearest-neighbor preserves corners") {
    val src = Raster.truthRaster(3L, 8, 8)
    val dst = Raster.resize(src, 8, 8, 4, 4)
    assert(dst.length == 4 * 4 * 3)
    // top-left pixel preserved
    assert(dst(0) == src(0) && dst(1) == src(1) && dst(2) == src(2))
  }

  test("chk is layout-sensitive; rot90 x4 is the identity") {
    // hand value: bytes [3, 0, 5] -> 1*3 + 2*0 + 3*5 = 18
    assert(Raster.chk(Array[Byte](3, 0, 5)) == 18L)
    val img = Raster.truthRaster(11L, 4, 4)
    val r1 = Raster.rot90(img, 4, 4)
    // a rotation permutes bytes: same multiset (channel sums equal),
    // different positions (chk differs)
    assert(r1.sorted.sameElements(img.sorted))
    assert(Raster.chk(r1) != Raster.chk(img))
    val r4 = Raster.rot90(Raster.rot90(Raster.rot90(r1, 4, 4), 4, 4), 4, 4)
    assert(r4.sameElements(img))
  }

  test("rot90 geometry: src (y,x) lands at dst (x, g-1-y)") {
    val g = 4
    val img = Raster.truthRaster(5L, g, g)
    val rot = Raster.rot90(img, g, g)
    for (y <- 0 until g; x <- 0 until g; c <- 0 until 3) {
      val dst = (x * g + (g - 1 - y)) * 3 + c
      assert(rot(dst) == img((y * g + x) * 3 + c), s"(y=$y,x=$x,c=$c)")
    }
  }

  test("phash centroid: strict bit majority, ties -> 0") {
    // three hashes: bit0 set in 2/3 -> majority; bit1 set in 1/3 -> not;
    // with 4 hashes bit2 set in 2/4 -> tie -> 0
    val bits3 = Seq.fill(65)(0L).updated(0, 2L).updated(1, 1L).updated(64, 3L)
    assert(PhashCentroid.centroidOf(bits3) == 1L)
    val bits4 = Seq.fill(65)(0L).updated(2, 2L).updated(64, 4L)
    assert(PhashCentroid.centroidOf(bits4) == 0L)
  }

  test("dhash: 56-bit range, determinism, noise robustness, sensitivity") {
    val ks = (1L to 64L).map(_ * 97 + 13)
    val hashes = ks.map { k =>
      val (w, h) = (12, 10)
      val dRaw = Raster.dhash(Raster.storedBytes(k, w, h, "raw"), w, h)
      val dLossy = Raster.dhash(Raster.storedBytes(k, w, h, "lossy"), w, h)
      // 56-bit: always a non-negative long below 2^56
      assert(dRaw >= 0 && dRaw < (1L << 56))
      // deterministic
      assert(dRaw == Raster.dhash(Raster.storedBytes(k, w, h, "raw"), w, h))
      (dRaw, dLossy)
    }
    // lossy re-encode stays NEAR its truth: mean hamming well under the
    // ~28 expected of unrelated hashes (the ±2 noise flips only the
    // comparisons whose gray margin is small)
    val noise = hashes.map { case (a, b) => java.lang.Long.bitCount(a ^ b) }
    assert(noise.sum.toDouble / noise.length < 12.0,
      s"noise hamming too high: ${noise.sum.toDouble / noise.length}")
    // unrelated images are FAR apart: min pairwise hamming of distinct
    // keys stays above the near-dup threshold
    val raws = hashes.map(_._1)
    val minPair = (for {
      i <- raws.indices; j <- raws.indices if i < j
    } yield java.lang.Long.bitCount(raws(i) ^ raws(j))).min
    assert(minPair > 6, s"unrelated hashes too close: $minPair")
  }

  test("augmentation: hflip involution + corners; rot90 cycle + multiset") {
    val (w, h) = (12, 10)
    val src = Raster.truthRaster(5L, w, h)
    val f = Raster.hflip(src, w, h)
    // corner remap: out(0,0) <- in(0, w-1); out(0,w-1) <- in(0,0)
    assert(f.slice(0, 3).toSeq == src.slice((w - 1) * 3, w * 3).toSeq)
    assert(f.slice((w - 1) * 3, w * 3).toSeq == src.slice(0, 3).toSeq)
    // involution: flip twice == identity
    assert(Raster.hflip(f, w, h).toSeq == src.toSeq)
    // rot90: out is h wide x w tall; out(0,0) <- in(h-1, 0)
    val r = Raster.rot90(src, w, h)
    assert(r.slice(0, 3).toSeq ==
      src.slice((h - 1) * w * 3, ((h - 1) * w + 1) * 3).toSeq)
    // byte multiset preserved (stats invariance) and 4-cycle == identity
    assert(r.sorted.toSeq == src.sorted.toSeq)
    val r4 = Raster.rot90(Raster.rot90(Raster.rot90(r, h, w), w, h), h, w)
    assert(r4.toSeq == src.toSeq)
  }

  test("sobel energy: flat image scores 0, step edge scores exactly") {
    // 8x8 image: sampling is identity (sy = oy, sx = ox), gray = R+G+B.
    def img(px: (Int, Int) => Int): Array[Byte] = {
      val b = new Array[Byte](8 * 8 * 3)
      for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3)
        b((y * 8 + x) * 3 + c) = px(y, x).toByte
      b
    }
    // constant surface: every gradient is 0
    assert(Raster.sobelEnergy(img((_, _) => 77), 8, 8) == 0L)
    // vertical step at x=4 (0 -> 100 per channel, gray 0 -> 300): gy = 0
    // everywhere; gx = 4*300 = 1200 at the 2 columns straddling the step
    // (cx = 3, 4) for all 6 interior rows -> 12 * 1200 = 14400
    assert(Raster.sobelEnergy(img((_, x) => if (x >= 4) 100 else 0), 8, 8)
      == 14400L)
    // determinism on a seeded raster + sharper-than-flat ordering
    val k = 99L
    val r = Raster.storedBytes(k, 12, 10, "raw")
    assert(Raster.sobelEnergy(r, 12, 10) ==
      Raster.sobelEnergy(Raster.storedBytes(k, 12, 10, "raw"), 12, 10))
    assert(Raster.sobelEnergy(r, 12, 10) > 0L)
  }

  test("video frame sampling: length, stride slices, distinct frames") {
    import graft.multimodal.Raster
    val fb = 8 * 6 * 3
    val v = Raster.videoBytes(42L, 8, 6, 8)
    assert(v.length == fb * 8)
    val s2 = Raster.sampleFrames(v, fb, 2)
    assert(s2.length == 4)
    s2.zipWithIndex.foreach { case (f, i) =>
      assert(f.toSeq == v.slice(2 * i * fb, (2 * i + 1) * fb).toSeq,
        s"sampled frame $i is not the ${2 * i}-th slice")
    }
    assert(s2(0).toSeq != s2(1).toSeq, "frames must differ")
    assert(Raster.sampleFrames(v, fb, 3).length == 3) // frames 0, 3, 6
    // determinism
    assert(Raster.videoBytes(42L, 8, 6, 8).toSeq == v.toSeq)
  }

  test("raster_hist4 kernel: hand bins, conservation, unsigned bytes") {
    val expr = graft.multimodal.RasterHist4(
      org.apache.spark.sql.catalyst.expressions.Literal(
        Array[Byte](0, 63, 64, 127, -128, -1, -64, 10),
        org.apache.spark.sql.types.BinaryType))
    val bins = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    // -1 = 255 -> bin 3; -64 = 192 -> bin 3 (sign-safe & 0xFF)
    assert(bins.toSeq == Seq(3L, 2L, 1L, 2L))
    assert(bins.sum == 8L)
  }

  test("raster_channel_sums kernel: interleaved R/G/B sums, unsigned bytes") {
    // 2 pixels: (1, 2, 3) and (255 as -1, 0, 10)
    val expr = graft.multimodal.RasterChannelSums(
      org.apache.spark.sql.catalyst.expressions.Literal(
        Array[Byte](1, 2, 3, -1, 0, 10),
        org.apache.spark.sql.types.BinaryType))
    val sums = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    assert(sums.toSeq == Seq(256L, 2L, 13L))
  }

  test("lbpCodes: constant image -> all 255; brute replay on an 8x8 " +
    "raster; clockwise bit order pinned on a single-bright-neighbor cell") {
    // Constant gray: every neighbor >= center -> all 36 codes are 255,
    // which is a uniform pattern (0 transitions).
    val flat = Array.fill[Byte](8 * 8 * 3)(17)
    assert(Raster.lbpCodes(flat, 8, 8).forall(_ == 255))
    // Real raster at w=h=8: the grid sampling is the identity, so a brute
    // per-pixel replay must match exactly.
    val bytes = Raster.decode(Raster.storedBytes(42L, 8, 8, "lossy"), "lossy")
    val g = Array.tabulate(8, 8) { (y, x) =>
      val b = (y * 8 + x) * 3
      (bytes(b) & 0xff) + (bytes(b + 1) & 0xff) + (bytes(b + 2) & 0xff)
    }
    val want = for (cy <- 1 to 6; cx <- 1 to 6) yield {
      Raster.lbpOffsets.zipWithIndex.map { case ((dy, dx), i) =>
        if (g(cy + dy)(cx + dx) >= g(cy)(cx)) 1 << i else 0
      }.sum
    }
    assert(Raster.lbpCodes(bytes, 8, 8).toSeq == want)
    // Bit order: center brighter than all neighbors except the one due
    // EAST (bit 3 in the clockwise-from-NW order).
    val img = Array.fill[Byte](8 * 8 * 3)(0)
    for (c <- 0 until 3) {
      img((1 * 8 + 1) * 3 + c) = 50 // center (1,1)
      img((1 * 8 + 2) * 3 + c) = 90 // east neighbor (1,2)
    }
    assert(Raster.lbpCodes(img, 8, 8)(0) == (1 << 3))
  }

  test("sobelSectors: flat -> 8 everywhere; x-ramp -> all sector 0 (E); " +
    "y-ramp -> all sector 2; agrees with sobelEnergy's zero set") {
    val flat = Array.fill[Byte](8 * 8 * 3)(99)
    assert(Raster.sobelSectors(flat, 8, 8).forall(_ == 8))
    def ramp(f: (Int, Int) => Int): Array[Byte] = {
      val b = new Array[Byte](8 * 8 * 3)
      for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3)
        b((y * 8 + x) * 3 + c) = f(x, y).toByte
      b
    }
    assert(Raster.sobelSectors(ramp((x, _) => 10 * x), 8, 8).forall(_ == 0))
    assert(Raster.sobelSectors(ramp((_, y) => 10 * y), 8, 8).forall(_ == 2))
    // a real raster: sector 8 exactly where the Sobel pair is (0, 0)
    val bytes = Raster.decode(Raster.storedBytes(7L, 8, 8, "lossy"), "lossy")
    val secs = Raster.sobelSectors(bytes, 8, 8)
    val g = Array.tabulate(8, 8) { (y, x) =>
      val b = (y * 8 + x) * 3
      (bytes(b) & 0xff) + (bytes(b + 1) & 0xff) + (bytes(b + 2) & 0xff)
    }
    var i = 0
    for (cy <- 1 to 6; cx <- 1 to 6) {
      val gx = (g(cy - 1)(cx + 1) + 2 * g(cy)(cx + 1) + g(cy + 1)(cx + 1)) -
        (g(cy - 1)(cx - 1) + 2 * g(cy)(cx - 1) + g(cy + 1)(cx - 1))
      val gy = (g(cy + 1)(cx - 1) + 2 * g(cy + 1)(cx) + g(cy + 1)(cx + 1)) -
        (g(cy - 1)(cx - 1) + 2 * g(cy - 1)(cx) + g(cy - 1)(cx + 1))
      assert((secs(i) == 8) == (gx == 0 && gy == 0))
      i += 1
    }
  }
}
