package graft.multimodal

/** Pure byte-level raster kernels for the multimodal (image) column.
  *
  * The sandbox has no image codecs, so `fmt="raw"` is an uncompressed
  * `w*h*3` RGB raster and `fmt="lossy"` is the same raster with seeded,
  * bounded noise (|delta| <= 2 per channel), which guarantees the
  * north-rule per-row invariant PSNR >= 40 dB by construction
  * (MSE <= 4 -> PSNR >= 20*log10(255) - 10*log10(4) ~= 42.1 dB).
  *
  * A real deployment swaps [[decode]]'s lossy branch for a codec call
  * (that call is the ONLY stubbed step — the Spark-side plumbing around it
  * is real and tested).
  */
object Raster {

  /** splitmix64 — deterministic per-image byte stream seed. */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The ground-truth raster for image key `k`: w*h*3 PRNG bytes. */
  def truthRaster(k: Long, w: Int, h: Int): Array[Byte] = {
    val n = w * h * 3
    val out = new Array[Byte](n)
    var s = mix(k)
    var i = 0
    while (i < n) {
      if ((i & 7) == 0) s = mix(s)
      out(i) = ((s >>> ((i & 7) * 8)) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Stored bytes: identical to truth for `raw`; truth + bounded noise for
    * `lossy` (the synthetic stand-in for codec loss). */
  def storedBytes(k: Long, w: Int, h: Int, fmt: String): Array[Byte] = {
    val base = truthRaster(k, w, h)
    if (fmt == "raw") base
    else {
      var s = mix(k ^ 0x5deece66dL)
      var i = 0
      while (i < base.length) {
        if ((i & 7) == 0) s = mix(s)
        val delta = (((s >>> ((i & 7) * 8)) & 0xff) % 5).toInt - 2 // -2..2
        val v = (base(i) & 0xff) + delta
        base(i) = (if (v < 0) 0 else if (v > 255) 255 else v).toByte
        i += 1
      }
      base
    }
  }

  /** Decode stored bytes to pixel bytes. `raw`/`lossy` are already raster
    * layout; any other fmt would dispatch to a codec here (STUB boundary). */
  def decode(bytes: Array[Byte], fmt: String): Array[Byte] = fmt match {
    case "raw" | "lossy" => bytes
    case other =>
      throw new UnsupportedOperationException(
        s"codec '$other' not available in sandbox — stubbed decode boundary")
  }

  /** PSNR in dB between two equal-length byte images; identical arrays
    * report 99.0 (instead of +inf) so the column stays finite/comparable. */
  def psnrDb(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length, s"psnr: length ${a.length} != ${b.length}")
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      se += d.toDouble * d
      i += 1
    }
    if (se == 0.0) 99.0
    else {
      val mse = se / a.length
      10.0 * math.log10(255.0 * 255.0 / mse)
    }
  }

  /** (mean, min, max) over raw pixel bytes. */
  def stats(bytes: Array[Byte]): (Double, Int, Int) = {
    var sum = 0.0; var mn = 255; var mx = 0
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      sum += v
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    (if (bytes.length == 0) 0.0 else sum / bytes.length, mn, mx)
  }

  /** Rectangular patch extraction (the frame/patch-sample step of a
    * multimodal pipeline: video frame-sampling degenerates to this for
    * single-frame rasters — pick a sub-rectangle deterministically). */
  def crop(bytes: Array[Byte], w: Int, h: Int,
           x0: Int, y0: Int, cw: Int, ch: Int): Array[Byte] = {
    require(x0 >= 0 && y0 >= 0 && x0 + cw <= w && y0 + ch <= h,
      s"crop out of bounds: ($x0,$y0)+($cw x $ch) in ($w x $h)")
    val out = new Array[Byte](cw * ch * 3)
    var y = 0
    while (y < ch) {
      System.arraycopy(bytes, ((y0 + y) * w + x0) * 3, out, y * cw * 3, cw * 3)
      y += 1
    }
    out
  }

  /** Horizontal mirror of a raw w*h*3 raster — the canonical image
    * AUGMENTATION op of a training pipeline (flip doubles the corpus with
    * label-preserving variants). Pixel (y, x) <- (y, w-1-x), channels
    * kept in order. */
  def hflip(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](bytes.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val src = (y * w + (w - 1 - x)) * 3
        val dst = (y * w + x) * 3
        out(dst) = bytes(src)
        out(dst + 1) = bytes(src + 1)
        out(dst + 2) = bytes(src + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** 90°-clockwise rotation of a raw w*h*3 raster: the output is h wide x
    * w tall, out(y, x) <- in(h-1-x, y). Byte multiset is preserved
    * exactly (RasterSpec pins corners + multiset + the stats invariant). */
  def rot90(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](bytes.length)
    var y = 0
    while (y < w) { // output rows: new height = w
      var x = 0
      while (x < h) { // output cols: new width = h
        val src = ((h - 1 - x) * w + y) * 3
        val dst = (y * h + x) * 3
        out(dst) = bytes(src)
        out(dst + 1) = bytes(src + 1)
        out(dst + 2) = bytes(src + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Nearest-neighbor resize of a w*h*3 raster (the feature-extract /
    * thumbnail step of a multimodal pipeline, kept codec-free). */
  /** Synthetic "video": `nFrames` raw rasters concatenated; frame f's seed
    * mixes the image key with the frame index, so frames are distinct but
    * deterministic. The video analog of [[storedBytes]] — the codec call a
    * real deployment would make is again the only stubbed step. */
  def videoBytes(k: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val fb = w * h * 3
    val out = new Array[Byte](fb * nFrames)
    var f = 0
    while (f < nFrames) {
      System.arraycopy(storedBytes(k + 1000003L * (f + 1), w, h, "raw"),
        0, out, f * fb, fb)
      f += 1
    }
    out
  }

  /** Every `stride`-th frame of a fixed-frame-size video blob — the
    * frame-sampling step of a video-training pipeline. */
  def sampleFrames(video: Array[Byte], frameBytes: Int,
                   stride: Int): Array[Array[Byte]] = {
    val n = video.length / frameBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var f = 0
    while (f < n) {
      out += java.util.Arrays.copyOfRange(video, f * frameBytes, (f + 1) * frameBytes)
      f += stride
    }
    out.toArray
  }

  /** 56-bit difference hash (dHash) of a decoded w*h*3 raster — the REAL
    * perceptual-hash kernel (the table's `phash` column is synthesized
    * metadata; this computes one from pixels): sample an 8x8 grid with
    * the same nearest-neighbor arithmetic as [[resize]], gray = R+G+B
    * (integer, no division — no rounding divergence), bit oy*7+ox set iff
    * gray(ox) > gray(ox+1) in row oy. 7 comparisons x 8 rows = 56 bits,
    * so the hash is a POSITIVE Long and replays exactly in ANSI BIGINT
    * (bit 63 would wrap signed in both engines). Robust to small
    * per-pixel noise by construction — the image near-dup key. */
  def dhash(bytes: Array[Byte], w: Int, h: Int): Long = {
    val g = new Array[Int](8)
    var hash = 0L
    var oy = 0
    while (oy < 8) {
      val sy = oy * h / 8
      var ox = 0
      while (ox < 8) {
        val base = (sy * w + ox * w / 8) * 3
        g(ox) = (bytes(base) & 0xff) + (bytes(base + 1) & 0xff) +
          (bytes(base + 2) & 0xff)
        ox += 1
      }
      ox = 0
      while (ox < 7) {
        if (g(ox) > g(ox + 1)) hash |= 1L << (oy * 7 + ox)
        ox += 1
      }
      oy += 1
    }
    hash
  }

  /** Integer Sobel gradient energy of a decoded w*h*3 raster — the image
    * QUALITY/sharpness score of a training-data pipeline (the image-
    * modality analog of the text quality heuristics: flat/blurry images
    * score near 0, detailed ones high; filter or stratify on it). Same
    * 8x8 nearest-neighbor gray grid as [[dhash]] (gray = R+G+B, integer,
    * no division), then the 3x3 Sobel pair over the interior 6x6 and
    * energy = Σ |gx|+|gy| — all integer, so the score replays exactly in
    * ANSI BIGINT (bound: 36 centers x 2 x 4·765 < 2^18). */
  def sobelEnergy(bytes: Array[Byte], w: Int, h: Int): Long = {
    val g = Array.ofDim[Int](8, 8)
    var oy = 0
    while (oy < 8) {
      val sy = oy * h / 8
      var ox = 0
      while (ox < 8) {
        val base = (sy * w + ox * w / 8) * 3
        g(oy)(ox) = (bytes(base) & 0xff) + (bytes(base + 1) & 0xff) +
          (bytes(base + 2) & 0xff)
        ox += 1
      }
      oy += 1
    }
    var total = 0L
    var cy = 1
    while (cy < 7) {
      var cx = 1
      while (cx < 7) {
        val gx = (g(cy - 1)(cx + 1) + 2 * g(cy)(cx + 1) + g(cy + 1)(cx + 1)) -
          (g(cy - 1)(cx - 1) + 2 * g(cy)(cx - 1) + g(cy + 1)(cx - 1))
        val gy = (g(cy + 1)(cx - 1) + 2 * g(cy + 1)(cx) + g(cy + 1)(cx + 1)) -
          (g(cy - 1)(cx - 1) + 2 * g(cy - 1)(cx) + g(cy - 1)(cx + 1))
        total += math.abs(gx) + math.abs(gy)
        cx += 1
      }
      cy += 1
    }
    total
  }

  /** EDGE-ORIENTATION sectors of a decoded raster (HOG-lite): the 36
    * interior Sobel gradients of the same 8x8 gray grid as
    * [[sobelEnergy]], each quantized to a compass sector by PURE INTEGER
    * sign/dominance tests — 0..7 = E NE N NW W SW S SE, 8 = flat
    * (gx = gy = 0) — the q_traj_headings decision tree applied to image
    * gradients (no atan2, so the descriptor replays exactly in ANSI
    * SQL). Row-major over the interior. */
  def sobelSectors(bytes: Array[Byte], w: Int, h: Int): Array[Int] = {
    val g = Array.ofDim[Int](8, 8)
    var oy = 0
    while (oy < 8) {
      val sy = oy * h / 8
      var ox = 0
      while (ox < 8) {
        val base = (sy * w + ox * w / 8) * 3
        g(oy)(ox) = (bytes(base) & 0xff) + (bytes(base + 1) & 0xff) +
          (bytes(base + 2) & 0xff)
        ox += 1
      }
      oy += 1
    }
    val out = new Array[Int](36)
    var i = 0
    var cy = 1
    while (cy < 7) {
      var cx = 1
      while (cx < 7) {
        val gx = (g(cy - 1)(cx + 1) + 2 * g(cy)(cx + 1) + g(cy + 1)(cx + 1)) -
          (g(cy - 1)(cx - 1) + 2 * g(cy)(cx - 1) + g(cy + 1)(cx - 1))
        val gy = (g(cy + 1)(cx - 1) + 2 * g(cy + 1)(cx) + g(cy + 1)(cx + 1)) -
          (g(cy - 1)(cx - 1) + 2 * g(cy - 1)(cx) + g(cy - 1)(cx + 1))
        val ax = math.abs(gx); val ay = math.abs(gy)
        out(i) =
          if (gx == 0 && gy == 0) 8
          else if (ax > ay && gx > 0) 0
          else if (ax > ay) 4
          else if (ay > ax && gy > 0) 2
          else if (ay > ax) 6
          else if (gx > 0 && gy > 0) 1
          else if (gx > 0) 7
          else if (gy > 0) 3
          else 5
        i += 1
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** Offsets of the 8-neighborhood in CLOCKWISE order from NW — the LBP
    * bit order (bit i set ⟺ neighbor i ≥ center). Shared with the oracle
    * SQL, which enumerates the same (dy, dx, bit) triples literally. */
  val lbpOffsets: Array[(Int, Int)] = Array(
    (-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1))

  /** LOCAL BINARY PATTERN codes of a decoded w*h*3 raster — the classic
    * texture descriptor (Ojala et al.): same 8x8 nearest-neighbor gray
    * grid as [[dhash]]/[[sobelEnergy]] (gray = R+G+B, integer), then for
    * each of the 36 interior pixels an 8-bit code with bit i set iff the
    * i-th clockwise neighbor's gray ≥ the center's. Row-major over the
    * interior; all comparisons integer, so codes replay exactly in ANSI
    * SQL. Codes are 0..255; the per-image histogram is the texture
    * fingerprint (flat regions → code 255, edges → uniform patterns). */
  def lbpCodes(bytes: Array[Byte], w: Int, h: Int): Array[Int] = {
    val g = Array.ofDim[Int](8, 8)
    var oy = 0
    while (oy < 8) {
      val sy = oy * h / 8
      var ox = 0
      while (ox < 8) {
        val base = (sy * w + ox * w / 8) * 3
        g(oy)(ox) = (bytes(base) & 0xff) + (bytes(base + 1) & 0xff) +
          (bytes(base + 2) & 0xff)
        ox += 1
      }
      oy += 1
    }
    val out = new Array[Int](36)
    var i = 0
    var cy = 1
    while (cy < 7) {
      var cx = 1
      while (cx < 7) {
        var code = 0
        var b = 0
        while (b < 8) {
          val (dy, dx) = lbpOffsets(b)
          if (g(cy + dy)(cx + dx) >= g(cy)(cx)) code |= 1 << b
          b += 1
        }
        out(i) = code
        i += 1
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** Unsigned byte at index `i` of a raster blob, 0 when out of range — a
    * TOTAL function so the mosaic pyramid's 48-sum aggregate
    * ([[graft.operators.MosaicPyramid]]) generates branch-light code with
    * no per-call-site bounds plumbing (thumbs are fixed 4x4x3 = 48 bytes,
    * so the guard never fires there; it exists for arbitrary SQL input). */
  @inline def byteAt(bytes: Array[Byte], i: Int): Int =
    if (i >= 0 && i < bytes.length) bytes(i) & 0xff else 0

  /** Position-weighted checksum `Σ (i+1)·byte[i]` — a LAYOUT-sensitive
    * integer fingerprint (channel sums and histograms are permutation-
    * invariant, so they cannot pin a geometric transform; this can). */
  def chk(bytes: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < bytes.length) {
      s += (i + 1).toLong * (bytes(i) & 0xff)
      i += 1
    }
    s
  }

  def resize(bytes: Array[Byte], w: Int, h: Int, ow: Int, oh: Int): Array[Byte] = {
    val out = new Array[Byte](ow * oh * 3)
    var oy = 0
    while (oy < oh) {
      val sy = oy * h / oh
      var ox = 0
      while (ox < ow) {
        val sx = ox * w / ow
        var c = 0
        while (c < 3) {
          out((oy * ow + ox) * 3 + c) = bytes((sy * w + sx) * 3 + c)
          c += 1
        }
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** DuckDB SQL expression applying ONE [[mix]] step to UBIGINT expression
    * `a` — the oracle-side replica of the splitmix64 kernel, so the
    * q_thumb_stats oracle can replay the per-image PRNG chain relationally
    * (recursive CTE) and hash-match the engine's pixel math bit-for-bit.
    *
    * DuckDB has no wrapping 64-bit multiply (UBIGINT ops raise on overflow,
    * and a direct HUGEINT product of two 64-bit values can exceed 2^127-1),
    * so each `* C mod 2^64` is decomposed into 32-bit limbs:
    * `a*C = a_lo*C_lo + 2^32*(a_lo*C_hi + a_hi*C_lo)  (mod 2^64)`,
    * every partial bounded by ~2^97 — safely inside HUGEINT. xor and `>>`
    * are native on UBIGINT (logical shift, which matches `>>>`). */
  def duckMixSql(a: String): String = {
    val u64 = "18446744073709551616" // 2^64 as a HUGEINT literal
    def mulmod(x: String, c: Long): String = {
      val hi = c >>> 32
      val lo = c & 0xffffffffL
      s"CAST((CAST($x % 4294967296 AS HUGEINT) * $lo + " +
        s"(CAST($x % 4294967296 AS HUGEINT) * $hi + " +
        s"CAST($x // 4294967296 AS HUGEINT) * $lo) * 4294967296) " +
        s"% $u64 AS UBIGINT)"
    }
    def xs(x: String, n: Int): String = s"xor($x, ($x) >> $n)"
    val add = java.lang.Long.toUnsignedString(0x9e3779b97f4a7c15L)
    val z1 = s"CAST((CAST($a AS HUGEINT) + $add) % $u64 AS UBIGINT)"
    xs(mulmod(xs(mulmod(xs(z1, 30), 0xbf58476d1ce4e5b9L), 27),
      0x94d049bb133111ebL), 31)
  }
}
