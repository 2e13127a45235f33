package graft.geo

/** Hierarchical quadtree grid over (lat, lon) — the engine's cell index.
  *
  * Plays the role of H3/S2 in the reference mapping (SURVEY.md §1.2): the
  * reference's per-record embedding (raptor/tree_builder.py:197-201) becomes a
  * geo-anchor encoded to a cell at resolutions 0..16, and the reference's
  * cluster hierarchy (raptor/cluster_tree_builder.py:62-205) becomes the
  * parent/child relation of this grid. A square-grid quadkey was chosen over
  * true H3 (SURVEY.md §7.3 "hard parts"): no pentagon special cases, exact
  * parent = bit-shift, and — critically for the verification harness — the
  * encoding is reproducible in ANSI SQL so DuckDB can act as an oracle.
  *
  * Cell id layout (64-bit long, always positive for res <= 16):
  * {{{
  *   cell = (res << 58) | (y << res) | x
  * }}}
  * where at resolution `res` the globe is an `2^res x 2^res` grid:
  *   x = floor(((lon + 180) / 360) * 2^res)   in [0, 2^res)
  *   y = floor(((lat +  90) / 180) * 2^res)   in [0, 2^res)
  *
  * Parent at res-1 is exactly (x >> 1, y >> 1) — the 4-way quadtree rollup
  * that mirrors the reference's cluster-then-summarize levels.
  *
  * All math is pure and allocation-free where possible so the Catalyst
  * expressions in [[expressions]] can call these statics from generated code.
  */
object GridCell {
  val MinRes = 0
  val MaxRes = 16
  private val ResShift = 58

  /** Number of cells per axis at a resolution. */
  @inline def dim(res: Int): Long = 1L << res

  /** Cell height in degrees latitude at `res`. */
  @inline def cellHeightDeg(res: Int): Double = 180.0 / dim(res)

  /** Cell width in degrees longitude at `res`. */
  @inline def cellWidthDeg(res: Int): Double = 360.0 / dim(res)

  /** Encode a (lat, lon) point to its cell at `res`.
    * Expression order matters: the DuckDB oracle SQL replicates exactly
    * `floor(((lon + 180.0) / 360.0) * 2^res)` so both engines round the same
    * IEEE-754 doubles. Out-of-range points clamp to the edge cells.
    */
  def encode(lat: Double, lon: Double, res: Int): Long = {
    val n = dim(res)
    var x = math.floor(((lon + 180.0) / 360.0) * n).toLong
    var y = math.floor(((lat + 90.0) / 180.0) * n).toLong
    if (x < 0) x = 0 else if (x >= n) x = n - 1
    if (y < 0) y = 0 else if (y >= n) y = n - 1
    (res.toLong << ResShift) | (y << res) | x
  }

  @inline def resOf(cell: Long): Int = (cell >>> ResShift).toInt

  @inline def xOf(cell: Long): Long = {
    val r = resOf(cell); cell & (dim(r) - 1L)
  }

  @inline def yOf(cell: Long): Long = {
    val r = resOf(cell); (cell >> r) & (dim(r) - 1L)
  }

  @inline def pack(res: Int, x: Long, y: Long): Long =
    (res.toLong << ResShift) | (y << res) | x

  /** Morton (z-curve) value of a cell: its x and y indices bit-interleaved
    * (x in even bits, y in odd), so a 1-D sort by the z-value clusters 2-D
    * neighbors — the layout key for data-skipping writes (sorting files by
    * z tightens per-row-group lat/lon min/max, letting parquet pushdown
    * skip row groups for bbox filters). Pure integer bit ops, so the
    * DuckDB oracle replays it exactly (same 5-step spread masks). */
  def interleave(cell: Long): Long = {
    val r = resOf(cell)
    part1by1(cell & (dim(r) - 1L)) | (part1by1((cell >> r) & (dim(r) - 1L)) << 1)
  }

  /** Spread the low 32 bits of `v0` into the even bit positions (classic
    * magic-mask bit spreading). */
  @inline private def part1by1(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    (v | (v << 1)) & 0x5555555555555555L
  }

  /** Hilbert curve index of a cell: the position of (x, y) along the
    * order-`res` Hilbert curve (classic per-bit quadrant walk with
    * reflect+transpose rotation). Like [[interleave]] this is a 1-D layout
    * key for data-skipping writes, but with the strictly better locality
    * guarantee: CONSECUTIVE Hilbert indices are always 4-neighbors (no
    * Morton "seam jumps"), so sorted row groups get the tightest possible
    * lat/lon min/max envelopes. Pure integer state (x, y, d), replayed by
    * the oracle as an unrolled per-bit CTE chain. Public-knowledge
    * algorithm (the standard xy2d form). */
  def hilbertD(cell: Long): Long = {
    val r = resOf(cell)
    val n = dim(r)
    var x = xOf(cell); var y = yOf(cell)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Immediate parent (one resolution coarser). Res-0 cells are their own
    * parent — callers stop the pyramid loop before that (SURVEY.md O4). */
  def parent(cell: Long): Long = {
    val r = resOf(cell)
    if (r <= 0) cell
    else pack(r - 1, xOf(cell) >> 1, yOf(cell) >> 1)
  }

  /** Multi-resolution encode: the cell at EVERY res in `minRes..maxRes`
    * (coarse -> fine), from ONE trig-free encode at maxRes — parents are
    * pure bit slices of the finest cell (exact by the nested-floor
    * identity). ≙ the reference's per-record multi-model embedding batch
    * (raptor/tree_builder.py:197-201: one pass, all models). */
  def encodeMulti(lat: Double, lon: Double, minRes: Int, maxRes: Int): Array[Long] = {
    val leaf = encode(lat, lon, maxRes)
    val out = new Array[Long](maxRes - minRes + 1)
    var r = minRes
    while (r <= maxRes) {
      val d = maxRes - r
      out(r - minRes) = pack(r, xOf(leaf) >>> d, yOf(leaf) >>> d)
      r += 1
    }
    out
  }

  /** Ancestor at an arbitrary coarser resolution `toRes` (<= res of cell). */
  def parentAt(cell: Long, toRes: Int): Long = {
    val r = resOf(cell)
    require(toRes <= r, s"parentAt: target res $toRes above cell res $r")
    val d = r - toRes
    pack(toRes, xOf(cell) >>> d, yOf(cell) >>> d)
  }

  /** The 4 children one resolution finer. */
  def children(cell: Long): Array[Long] = {
    val r = resOf(cell)
    require(r < MaxRes, s"children: res $r already at max")
    val x = xOf(cell) << 1; val y = yOf(cell) << 1
    Array(pack(r + 1, x, y), pack(r + 1, x + 1, y),
          pack(r + 1, x, y + 1), pack(r + 1, x + 1, y + 1))
  }

  /** All cells within Chebyshev distance `k` of `cell` (the (2k+1)^2 block):
    * the graft's analog of H3 kRing (SURVEY.md J4/P9). Longitude wraps,
    * latitude clamps (rows beyond the poles are dropped). Result is distinct
    * and sorted for determinism. */
  def ring(cell: Long, k: Int): Array[Long] = {
    val r = resOf(cell)
    val n = dim(r)
    val cx = xOf(cell); val cy = yOf(cell)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var dy = -k
    while (dy <= k) {
      val y = cy + dy
      if (y >= 0 && y < n) {
        var dx = -k
        while (dx <= k) {
          // wrap longitude
          val x = ((cx + dx) % n + n) % n
          out += pack(r, x, y)
          dx += 1
        }
      }
      dy += 1
    }
    val arr = out.distinct.toArray
    java.util.Arrays.sort(arr)
    arr
  }

  /** Bresenham line rasterization between two SAME-RES cells: the cells
    * an integer line from `a` to `b` steps through, in path order, each
    * exactly once (the classic both-axis error form: a step may advance
    * x, y, or both — diagonal corners are NOT filled in, matching the
    * 8-connected line the oracle's recursive CTE replays). Planar in grid
    * space: no longitude wrap — a segment is the direct grid path, and
    * callers that need the short way around the antimeridian split the
    * segment first (documented limitation, same as [[planarDist2]]).
    * Pure integer state (x, y, err), so DuckDB replays it exactly. */
  def lineCells(a: Long, b: Long): Array[Long] = {
    val r = resOf(a)
    require(resOf(b) == r, s"lineCells: res mismatch ${resOf(b)} vs $r")
    var x = xOf(a); var y = yOf(a)
    val x1 = xOf(b); val y1 = yOf(b)
    val dx = math.abs(x1 - x); val sx = if (x < x1) 1L else -1L
    val dy = -math.abs(y1 - y); val sy = if (y < y1) 1L else -1L
    var err = dx + dy
    // dx - dy + 1 = dx + |dy| + 1: safe bound (every step moves >= 1 axis);
    // trimmed below — diagonal steps make the true length shorter.
    val out = new Array[Long]((dx - dy + 1).toInt)
    var i = 0
    var done = false
    while (!done) {
      out(i) = pack(r, x, y); i += 1
      if (x == x1 && y == y1) done = true
      else {
        val e2 = 2 * err
        if (e2 >= dy) { err += dy; x += sx }
        if (e2 <= dx) { err += dx; y += sy }
      }
    }
    if (i == out.length) out else java.util.Arrays.copyOf(out, i)
  }

  /** (latMin, latMax, lonMin, lonMax) bounds of a cell. */
  def bounds(cell: Long): (Double, Double, Double, Double) = {
    val r = resOf(cell)
    val n = dim(r).toDouble
    val x = xOf(cell).toDouble; val y = yOf(cell).toDouble
    (-90.0 + 180.0 * y / n, -90.0 + 180.0 * (y + 1) / n,
     -180.0 + 360.0 * x / n, -180.0 + 360.0 * (x + 1) / n)
  }

  /** Cells at `res` covering a lat/lon bounding box (inclusive). Handles an
    * antimeridian-crossing box (lonMin > lonMax) by splitting. Used to build
    * the broadcast prefilter index for point-in-polygon joins (SURVEY.md J3,
    * ≙ raptor cluster prefilter merge_tree_builder.py:247-304). */
  def cover(latMin: Double, latMax: Double, lonMin: Double, lonMax: Double,
            res: Int): Array[Long] = {
    val n = dim(res)
    def xIdx(lon: Double): Long = {
      val x = math.floor(((lon + 180.0) / 360.0) * n).toLong
      if (x < 0) 0L else if (x >= n) n - 1 else x
    }
    def yIdx(lat: Double): Long = {
      val y = math.floor(((lat + 90.0) / 180.0) * n).toLong
      if (y < 0) 0L else if (y >= n) n - 1 else y
    }
    val y0 = yIdx(latMin); val y1 = yIdx(latMax)
    val xRanges: Seq[(Long, Long)] =
      if (lonMin <= lonMax) Seq((xIdx(lonMin), xIdx(lonMax)))
      else Seq((xIdx(lonMin), n - 1), (0L, xIdx(lonMax))) // antimeridian split
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var y = y0
    while (y <= y1) {
      xRanges.foreach { case (xa, xb) =>
        var x = xa
        while (x <= xb) { out += pack(res, x, y); x += 1 }
      }
      y += 1
    }
    val arr = out.distinct.toArray
    java.util.Arrays.sort(arr)
    arr
  }

  // ---------------------------------------------------------------- distances

  val EarthRadiusM = 6371008.8

  /** Great-circle distance in meters (reporting metric; the kNN refine metric
    * is [[planarDist2]] — see Knn scaladoc for why). */
  def haversineM(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dLon / 2) * math.sin(dLon / 2)
    2.0 * EarthRadiusM * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** Squared planar distance in degree space — the engine's kNN metric
    * (≙ reference cosine distance, raptor/utils.py:130-135). Chosen planar
    * (no lon wrap) so the ring-expansion exactness bound and the SQL oracle
    * share one closed form. */
  @inline def planarDist2(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = lat1 - lat2; val dLon = lon1 - lon2
    dLat * dLat + dLon * dLon
  }

  // ---------------------------------------------------------- point in polygon

  /** Ray-casting containment test (even-odd rule), the refine step of the
    * prefilter+refine spatial join (≙ brute-force refine after cluster
    * prefilter, raptor/kmeans_retriever.py:116-142). Boundary semantics:
    * a point exactly on an edge follows the half-open crossing rule
    * (deterministic; fixtures avoid exact-boundary points). Vertex arrays are
    * closed implicitly (last connects to first). */
  def pointInPolygon(lat: Double, lon: Double,
                     lats: Array[Double], lons: Array[Double]): Boolean = {
    var inside = false
    val nv = lats.length
    var i = 0
    var j = nv - 1
    while (i < nv) {
      val yi = lats(i); val xi = lons(i)
      val yj = lats(j); val xj = lons(j)
      if ((yi > lat) != (yj > lat)) {
        val xCross = xi + (lat - yi) / (yj - yi) * (xj - xi)
        if (lon < xCross) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  /** Polygon bounding box (latMin, latMax, lonMin, lonMax). */
  def polyBounds(lats: Array[Double], lons: Array[Double]): (Double, Double, Double, Double) = {
    var laMin = Double.MaxValue; var laMax = Double.MinValue
    var loMin = Double.MaxValue; var loMax = Double.MinValue
    var i = 0
    while (i < lats.length) {
      if (lats(i) < laMin) laMin = lats(i)
      if (lats(i) > laMax) laMax = lats(i)
      if (lons(i) < loMin) loMin = lons(i)
      if (lons(i) > loMax) loMax = lons(i)
      i += 1
    }
    (laMin, laMax, loMin, loMax)
  }
}
