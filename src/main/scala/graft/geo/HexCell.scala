package graft.geo

/** Pointy-top hexagonal grid over the planar lat/lon degree plane — the
  * literal H3-style index of the north star's "H3/S2 cells" (the quadkey
  * grid plays the oracle-friendly default; this is the honest hexagonal
  * variant). Like H3 it has EXACT axial ring/distance math (every cell has
  * 6 equidistant neighbors — no Chebyshev corner anisotropy) and an
  * APPROXIMATE hierarchy: hexagons do not nest, so `parentOnce` assigns
  * each cell to the coarser hex containing its CENTER — deterministic and
  * total, exactly H3's aperture rounding (H3 docs: "children are not fully
  * contained by their parent"). Rollups over `parentOnce` stay exact
  * partitions (every cell has exactly one parent); only the parent's
  * geometric boundary is fuzzy — the same contract H3 itself offers.
  *
  * Axial coordinates (q, r), pointy-top, circumradius R(res) halving per
  * res: center_lon = sqrt(3)*R*(q + r/2), center_lat = 1.5*R*r. Encoding
  * is fractional axial + cube rounding, written with `floor(x + 0.5)` so
  * the DuckDB oracle replays bit-identical doubles (`round()` half-away
  * vs half-up would diverge on dyadic .5 boundaries).
  *
  * id layout: [res:6][q + 2^28 : 29][r + 2^28 : 29] — same top-bits res
  * marker as the quadkey id, so `resCol` bit algebra is shared.
  *
  * Reference provenance: the pluggable index boundary ≙
  * raptor/cluster_utils.py:130-133 (`ClusteringAlgorithm`); ring
  * candidate gathering ≙ top-k-cluster prefilter,
  * raptor/kmeans_retriever.py:76-111.
  */
object HexCell {

  val Sqrt3: Double = math.sqrt(3.0)
  private val Off = 1L << 28
  private val Mask = (1L << 29) - 1

  /** Circumradius (center→vertex) in planar degrees; halves per res.
    * res 8 ≈ 0.70° — comparable to the quadkey res-8 cell. */
  def circumDeg(res: Int): Double = 180.0 / (1L << res)

  def pack(res: Int, q: Long, r: Long): Long =
    (res.toLong << 58) | (((q + Off) & Mask) << 29) | ((r + Off) & Mask)
  def resOf(cell: Long): Int = (cell >>> 58).toInt
  def qOf(cell: Long): Long = ((cell >>> 29) & Mask) - Off
  def rOf(cell: Long): Long = (cell & Mask) - Off

  /** Fractional axial + cube rounding. Op ORDER is mirrored verbatim by
    * [[oracleHexCtes]] — do not "simplify" float arithmetic here. */
  def encode(lat: Double, lon: Double, res: Int): Long = {
    val R = circumDeg(res)
    val rf = lat / (1.5 * R)
    val qf = lon / (Sqrt3 * R) - rf / 2.0
    val yf = -qf - rf
    var rx = math.floor(qf + 0.5)
    val ry = math.floor(yf + 0.5)
    var rz = math.floor(rf + 0.5)
    val dx = math.abs(rx - qf)
    val dy = math.abs(ry - yf)
    val dz = math.abs(rz - rf)
    if (dx > dy && dx > dz) rx = -ry - rz
    else if (!(dy > dz)) rz = -rx - ry
    pack(res, rx.toLong, rz.toLong)
  }

  def centerLat(cell: Long): Double = 1.5 * circumDeg(resOf(cell)) * rOf(cell)
  def centerLon(cell: Long): Double = {
    val R = circumDeg(resOf(cell))
    Sqrt3 * R * (qOf(cell) + rOf(cell) / 2.0)
  }

  /** Hex (axial) distance — exact. */
  def hexDist(a: Long, b: Long): Long = {
    val dq = qOf(a) - qOf(b)
    val dr = rOf(a) - rOf(b)
    (math.abs(dq) + math.abs(dr) + math.abs(dq + dr)) / 2
  }

  /** The coarser hex containing this cell's CENTER (H3-style aperture
    * rounding: deterministic, total, geometrically approximate). */
  def parentOnce(cell: Long): Long =
    encode(centerLat(cell), centerLon(cell), resOf(cell) - 1)

  def parentAt(cell: Long, toRes: Int): Long = {
    var c = cell
    while (resOf(c) > toRes) c = parentOnce(c)
    c
  }

  /** Disk of all cells with hex distance <= k, center included —
    * 1 + 3k(k+1) cells (the kNN candidate-gathering primitive; same
    * disk semantics as GridCell.ring's Chebyshev square). */
  def ring(cell: Long, k: Int): Array[Long] = {
    val res = resOf(cell)
    val q0 = qOf(cell)
    val r0 = rOf(cell)
    val out = new Array[Long](1 + 3 * k * (k + 1))
    var i = 0
    var dq = -k
    while (dq <= k) {
      var dr = math.max(-k, -dq - k).toLong
      val hi = math.min(k, k - dq).toLong
      while (dr <= hi) {
        out(i) = pack(res, q0 + dq, r0 + dr)
        i += 1
        dr += 1
      }
      dq += 1
    }
    out
  }

  /** Conservative bbox covering: a SUPERSET of every cell whose hex can
    * contain a point of the bbox (any point's cell center lies within R
    * of it on both axes; the ±1 slack absorbs the axial shear). */
  def cover(latMin: Double, latMax: Double, lonMin: Double, lonMax: Double,
            res: Int): Array[Long] = {
    val R = circumDeg(res)
    val rLo = math.floor((latMin - R) / (1.5 * R)).toLong
    val rHi = math.ceil((latMax + R) / (1.5 * R)).toLong
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var r = rLo
    while (r <= rHi) {
      val qLo = math.floor((lonMin - R) / (Sqrt3 * R) - r / 2.0).toLong - 1L
      val qHi = math.ceil((lonMax + R) / (Sqrt3 * R) - r / 2.0).toLong + 1L
      var q = qLo
      while (q <= qHi) {
        out += pack(res, q, r)
        q += 1
      }
      r += 1
    }
    out.toArray
  }

  /** DuckDB replay of [[encode]] as a chain of CTEs over `src` (which must
    * expose `lat`, `lon` plus `carry` columns to thread through). Returns
    * (cteBlock, finalName); the final CTE exposes the carried columns plus
    * `cell`. Float op order mirrors [[encode]] exactly; all R-derived
    * literals are dyadic (exact decimal rendering). */
  def oracleHexCtes(src: String, res: Int, carry: Seq[String]): (String, String) = {
    val R = circumDeg(res)
    val rD = 1.5 * R    // dyadic — renders exactly
    val cols = if (carry.isEmpty) "" else carry.mkString("", ", ", ", ")
    val ctes =
      s""", hx0 AS (SELECT $cols lat / $rD AS rf, lon FROM $src)
         |, hx1 AS (SELECT $cols rf, lon / (sqrt(3.0) * $R) - rf / 2.0 AS qf FROM hx0)
         |, hx2 AS (SELECT $cols rf, qf, -qf - rf AS yf FROM hx1)
         |, hx3 AS (SELECT $cols rf, qf, yf, floor(qf + 0.5) AS rx,
         |    floor(yf + 0.5) AS ry, floor(rf + 0.5) AS rz FROM hx2)
         |, hx4 AS (SELECT $cols rx, ry, rz, abs(rx - qf) AS dx,
         |    abs(ry - yf) AS dy, abs(rz - rf) AS dz FROM hx3)
         |, hx5 AS (SELECT $cols
         |    CAST(CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END AS BIGINT) AS hq,
         |    CAST(CASE WHEN dx > dy AND dx > dz THEN rz
         |              WHEN dy > dz THEN rz ELSE -rx - ry END AS BIGINT) AS hr
         |  FROM hx4)
         |, hx6 AS (SELECT $cols
         |    ((CAST($res AS BIGINT) << 58) | ((hq + $Off) << 29) | (hr + $Off)) AS cell
         |  FROM hx5)""".stripMargin
    (ctes, "hx6")
  }
}
