package graft.geo

import org.apache.spark.unsafe.types.UTF8String

/** Integer-lattice geohash encoder.
  *
  * Standard geohash (public algorithm: Niemeyer 2008 — alternate-bit
  * bisection of the lon/lat ranges, base32-coded 5 bits per character)
  * re-derived on the engine's exact micro-degree lattice: the ONLY
  * floating-point op is the proven `floor(coord * 1e6)` micro-degree
  * quantization (same op the Lloyd/BIC kernel uses — VERDICT r4 item 1);
  * everything after is 64-bit integer arithmetic, so Spark and the DuckDB
  * oracle replay bit-identically on any libm/vectorization.
  *
  * Bisection-equivalence: `prec` chars = `5*prec` bits, of which
  * `ceil(b/2)` index longitude and `floor(b/2)` latitude (geohash puts the
  * FIRST bit on lon). `floor((ilon + 180e6) * 2^nb / 360e6)` is exactly the
  * bisection quantizer on the lattice point, so output equals the textbook
  * geohash except for points within 1 micro-degree of a cell wall
  * (GeohashSpec pins agreement against an independent bisection replay).
  *
  * Prefix property holds EXACTLY on the lattice: for p < q,
  * `encode(lat, lon, p) == encode(lat, lon, q).take(p)` because
  * `floor(x / 2^k)` of a floor-divided quantizer re-nests
  * (`floor(floor(a*2^n/d) / 2^k) == floor(a*2^(n-k)/d)`); GeohashSpec pins
  * it. That makes a substring rollup a true spatial coarsening.
  *
  * Reference semantics anchor: raptor's grid rollups key tiles by a
  * prefix-nested id (merge_distance&tree_exam.py tree levels); geohash is
  * the interoperable string-keyed equivalent for export to external
  * geo-systems.
  */
object Geohash {
  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Max precision with exact 64-bit interleave math (60 bits). */
  val MaxPrec = 12

  /** Geohash string of the micro-degree lattice point of (lat, lon). */
  def encode(lat: Double, lon: Double, prec: Int): String = {
    val p = if (prec < 1) 1 else if (prec > MaxPrec) MaxPrec else prec
    val bits = p * 5
    val lonBits = (bits + 1) / 2
    val latBits = bits / 2
    val lonQ = quant(math.floor(lon * 1000000.0).toLong, 180000000L,
      360000000L, lonBits)
    val latQ = quant(math.floor(lat * 1000000.0).toLong, 90000000L,
      180000000L, latBits)
    // Interleave MSB-first: even output bits (from the top) take lon bits,
    // odd take lat bits.
    var v = 0L
    var i = 0
    while (i < bits) {
      val fromLon = (i & 1) == 0
      val srcIdx = i >> 1 // bit index from the MSB within its axis
      val bit =
        if (fromLon) (lonQ >> (lonBits - 1 - srcIdx)) & 1L
        else (latQ >> (latBits - 1 - srcIdx)) & 1L
      v = (v << 1) | bit
      i += 1
    }
    val sb = new java.lang.StringBuilder(p)
    var g = 0
    while (g < p) {
      sb.append(Alphabet.charAt(((v >> ((p - 1 - g) * 5)) & 31L).toInt))
      g += 1
    }
    sb.toString
  }

  /** Codegen entry point (UTF8String, no re-boxing in generated code). */
  def encodeUTF8(lat: Double, lon: Double, prec: Int): UTF8String =
    UTF8String.fromString(encode(lat, lon, prec))

  /** `floor((micro + off) * 2^nb / span)` clamped to [0, 2^nb). All-integer:
    * worst case (360e6) * 2^30 ≈ 3.9e17 < 2^63. */
  @inline private def quant(micro: Long, off: Long, span: Long, nb: Int): Long = {
    val n = 1L << nb
    var q = ((micro + off) * n) / span
    if (q < 0) q = 0 else if (q >= n) q = n - 1
    q
  }

  /** DuckDB fragments replaying [[encode]] exactly — built as a CTE chain
    * (quantize -> interleave -> base32) rather than one giant expression.
    * Integer quantize: operands provably nonnegative, so DuckDB's `//`
    * truncation == floor. */
  def oracleQuantLonSql(lonExpr: String, prec: Int): String =
    quantSql(lonExpr, 180000000L, 360000000L, lonBitsOf(prec))
  def oracleQuantLatSql(latExpr: String, prec: Int): String =
    quantSql(latExpr, 90000000L, 180000000L, latBitsOf(prec))

  /** Unrolled bit-interleave over columns named `lq` and `tq`. */
  def oracleInterleaveSql(prec: Int): String = {
    val bits = prec * 5
    val lonBits = lonBitsOf(prec)
    val latBits = latBitsOf(prec)
    (0 until bits).map { i =>
      val srcIdx = i >> 1
      val outShift = bits - 1 - i
      val (src, sb) =
        if ((i & 1) == 0) ("lq", lonBits - 1 - srcIdx)
        else ("tq", latBits - 1 - srcIdx)
      s"((($src >> $sb) & 1) << $outShift)"
    }.mkString(" + ")
  }

  /** Base32 char picks over a column named `v`. */
  def oracleCharsSql(prec: Int): String = {
    val chars = (0 until prec).map { g =>
      s"substr('$Alphabet', CAST(((v >> ${(prec - 1 - g) * 5}) & 31) AS INTEGER) + 1, 1)"
    }
    s"concat(${chars.mkString(", ")})"
  }

  @inline private def lonBitsOf(prec: Int): Int = (prec * 5 + 1) / 2
  @inline private def latBitsOf(prec: Int): Int = (prec * 5) / 2

  private def quantSql(expr: String, off: Long, span: Long, nb: Int): String = {
    val n = 1L << nb
    s"least(greatest(((CAST(floor($expr * 1000000.0) AS BIGINT) + $off) " +
      s"* $n) // $span, 0), ${n - 1})"
  }
}
