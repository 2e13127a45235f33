package graft.geo

/** S2-style spherical cell index — cube-face projection + per-face Hilbert
  * curve — implemented from the published S2 geometry design (the public
  * s2geometry.io docs / Sedona & S2 papers), as the second `TilingStrategy`
  * option of the north rule's "H3/S2 index" (the quadkey grid in
  * [[GridCell]] remains the oracle-checked default because its encoding is
  * reproducible in ANSI SQL; this index has identical operator semantics —
  * encode / parent / children / level — with true spherical geometry: no
  * polar distortion, equal-ish cell areas, Hilbert locality).
  *
  * Cell id layout (S2's own scheme):
  * {{{
  *   id = face(3 bits) . hilbert position(2*level bits) . 1 . zeros
  * }}}
  * i.e. a 64-bit id whose trailing set bit marks the level (level 0..30);
  * parent = clear the low bits and set the new trailing bit. This file
  * implements levels 0..30, leaf encoding from (lat, lon), parents,
  * children, level extraction and containment — the subset the tile
  * pyramid needs.
  */
object S2Cell {

  val MaxLevel = 30

  // ---- cube-face projection (S2's quadratic projection) ----------------

  /** Face 0..5 of the unit-cube projection for a unit vector. */
  private def faceOf(x: Double, y: Double, z: Double): Int = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    if (ax >= ay && ax >= az) { if (x >= 0) 0 else 3 }
    else if (ay >= ax && ay >= az) { if (y >= 0) 1 else 4 }
    else { if (z >= 0) 2 else 5 }
  }

  /** (u, v) in [-1, 1]^2 on `face` for a unit vector (gnomonic). */
  private def faceUV(face: Int, x: Double, y: Double, z: Double): (Double, Double) =
    face match {
      case 0 => (y / x, z / x)
      case 1 => (-x / y, z / y)
      case 2 => (-x / z, -y / z)
      case 3 => (z / x, y / x)
      case 4 => (z / y, -x / y)
      case 5 => (-y / z, -x / z)
    }

  /** S2's quadratic area-equalizing transform uv -> st in [0, 1]. */
  private def uvToSt(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1.0 + 3.0 * u)
    else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)

  private def stToUv(s: Double): Double =
    if (s >= 0.5) (1.0 / 3.0) * (4.0 * s * s - 1.0)
    else (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))

  // ---- Hilbert curve on the face (S2's lookup-free bitwise form) -------

  // Hilbert orientation automaton: for each of 4 sub-cells in traversal
  // order, the (i, j) quadrant and the orientation delta. S2 uses
  // swap/invert bits; this is the standard compact form.
  private val PosToIJ = Array( // [orientation][pos] -> ij (i*2+j)
    Array(0, 1, 3, 2), // canonical
    Array(0, 2, 3, 1), // swapped
    Array(3, 2, 0, 1), // inverted
    Array(3, 1, 0, 2)) // swapped+inverted
  private val IJToPos = Array.tabulate(4, 4) { (o, ij) => PosToIJ(o).indexOf(ij) }
  private val PosToOrientation = Array(1, 0, 0, 3) // orientation ^= delta
  private val SwapMask = 1
  private val InvertMask = 2

  /** Hilbert position (2*level bits) of cell (i, j) at `level` on a face
    * with S2's initial orientation = face & 1 swap convention. */
  private def ijToHilbert(i: Int, j: Int, level: Int, face: Int): Long = {
    var orientation = if ((face & SwapMask) != 0) SwapMask else 0
    var pos = 0L
    var k = level - 1
    while (k >= 0) {
      val bi = (i >> k) & 1
      val bj = (j >> k) & 1
      val ij = bi * 2 + bj
      val p = IJToPos(orientation)(ij)
      pos = (pos << 2) | p
      orientation ^= PosToOrientation(p)
      k -= 1
    }
    pos
  }

  /** Inverse of [[ijToHilbert]]: (i, j) of a Hilbert position. */
  private def hilbertToIJ(pos: Long, level: Int, face: Int): (Int, Int) = {
    var orientation = if ((face & SwapMask) != 0) SwapMask else 0
    var i = 0; var j = 0
    var k = level - 1
    while (k >= 0) {
      val p = ((pos >>> (2 * k)) & 3L).toInt
      val ij = PosToIJ(orientation)(p)
      i = (i << 1) | (ij >> 1)
      j = (j << 1) | (ij & 1)
      orientation ^= PosToOrientation(p)
      k -= 1
    }
    (i, j)
  }

  /** Unit-cube frame of a face: (u, v) -> un-normalized xyz (gnomonic; the
    * EXACT inverse of [[faceUV]], valid for |u|,|v| beyond 1 — continuation
    * onto neighboring faces, the wrap mechanism of [[ring]]). */
  private def faceXYZ(face: Int, u: Double, v: Double): (Double, Double, Double) =
    face match {
      case 0 => (1.0, u, v)
      case 1 => (-u, 1.0, v)
      case 2 => (-u, -v, 1.0)
      case 3 => (-1.0, -v, -u)
      case 4 => (v, -1.0, -u)
      case 5 => (v, u, -1.0)
    }

  // ------------------------------------------------------------ public API

  /** Cell id at `level` for any (not necessarily unit) direction vector. */
  def fromXYZ(x: Double, y: Double, z: Double, level: Int): Long = {
    val face = faceOf(x, y, z)
    val (u, v) = faceUV(face, x, y, z)
    val s = uvToSt(u); val t = uvToSt(v)
    val n = 1 << level
    val i = math.min(n - 1, math.max(0, (s * n).toInt))
    val j = math.min(n - 1, math.max(0, (t * n).toInt))
    val pos = ijToHilbert(i, j, level, face)
    // id = face(3) | pos(2*level) | 1, left-aligned in 64 bits
    val shift = 2 * (MaxLevel - level) + 1
    (face.toLong << 61) | (pos << shift) | (1L << (shift - 1))
  }

  /** Leaf-level-free encode: cell id at `level` containing (lat, lon). */
  def fromLatLng(latDeg: Double, lonDeg: Double, level: Int): Long = {
    require(level >= 0 && level <= MaxLevel, s"level $level")
    val lat = math.toRadians(latDeg)
    val lon = math.toRadians(lonDeg)
    fromXYZ(math.cos(lat) * math.cos(lon), math.cos(lat) * math.sin(lon),
      math.sin(lat), level)
  }

  /** (face, i, j) grid coordinates of a cell. */
  def faceIJ(id: Long): (Int, Int, Int) = {
    val l = level(id)
    val shift = 2 * (MaxLevel - l) + 1
    val pos = (id >>> shift) & ((1L << (2 * l)) - 1)
    val f = face(id)
    val (i, j) = hilbertToIJ(pos, l, f)
    (f, i, j)
  }

  /** Level of a cell id (position of the trailing set bit). */
  def level(id: Long): Int =
    MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)

  def face(id: Long): Int = (id >>> 61).toInt

  /** Parent at `toLevel` (<= level(id)): truncate the Hilbert position. */
  def parentAt(id: Long, toLevel: Int): Long = {
    val l = level(id)
    require(toLevel <= l, s"parentAt: $toLevel above cell level $l")
    val newLsb = 1L << (2 * (MaxLevel - toLevel))
    (id & -newLsb) | newLsb
  }

  /** The 4 children one level finer, in Hilbert order. */
  def children(id: Long): Array[Long] = {
    val l = level(id)
    require(l < MaxLevel, s"children at max level")
    val childLsb = 1L << (2 * (MaxLevel - l - 1))
    val base = id - (1L << (2 * (MaxLevel - l)))  // clear own lsb marker
    Array.tabulate(4)(k => base + (2L * k + 1) * childLsb)
  }

  /** True iff `id` contains `other`: descendants of a cell occupy the id
    * range [id - lsb + 1, id + lsb - 1] (the Hilbert-interval property that
    * makes ancestor tests and range scans O(1) at any scale). */
  def contains(id: Long, other: Long): Boolean = {
    val lsb = java.lang.Long.lowestOneBit(id)
    other >= id - lsb + 1 && other <= id + lsb - 1
  }

  /** The level-0 face cell of face `f`. */
  def faceCell(f: Int): Long = (f.toLong << 61) | (1L << 60)

  // ---------------------------------------------------------- ring / cover

  // sample offsets inside a (i, j) grid square: center + inset corners
  // (corner samples catch neighbors that the quadratic st-warp splits
  // across two cells of an adjacent face)
  private val SampleOffs = Array(
    (0.5, 0.5), (0.01, 0.01), (0.99, 0.01), (0.01, 0.99), (0.99, 0.99))

  /** All cells within Chebyshev distance `k` of `id` in the face grid,
    * WRAPPING across cube faces: each neighbor square (possibly outside the
    * face) is sampled at 5 points whose gnomonic continuation re-projects
    * onto the true neighboring face. ≙ [[GridCell.ring]] (H3 kRing analog)
    * with spherical topology instead of lat-clamping. */
  def ring(id: Long, k: Int): Array[Long] = {
    val l = level(id)
    val (f, i, j) = faceIJ(id)
    val n = 1 << l
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var di = -k
    while (di <= k) {
      var dj = -k
      while (dj <= k) {
        SampleOffs.foreach { case (oi, oj) =>
          val u = stToUv((i + di + oi) / n.toDouble)
          val v = stToUv((j + dj + oj) / n.toDouble)
          val (x, y, z) = faceXYZ(f, u, v)
          out += fromXYZ(x, y, z, l)
        }
        dj += 1
      }
      di += 1
    }
    val arr = out.distinct.toArray
    java.util.Arrays.sort(arr)
    arr
  }

  private def latLonOf(x: Double, y: Double, z: Double): (Double, Double) = (
    math.toDegrees(math.atan2(z, math.hypot(x, y))),
    math.toDegrees(math.atan2(y, x)))

  /** Conservative lat/lon bound of a cell: min/max over corner+center
    * samples, inflated by the max cell diagonal (so no point of the cell
    * can fall outside). Returns (laMin, laMax, loMin, loMax, fullLon) —
    * fullLon when the cell nears a pole or wraps the antimeridian. */
  private def rectBound(id: Long): (Double, Double, Double, Double, Boolean) = {
    val l = level(id)
    val (f, i, j) = faceIJ(id)
    val n = 1 << l
    val pts = Array((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (0.5, 0.5))
      .map { case (oi, oj) =>
        val u = stToUv((i + oi) / n.toDouble)
        val v = stToUv((j + oj) / n.toDouble)
        val (x, y, z) = faceXYZ(f, u, v)
        latLonOf(x, y, z)
      }
    // max spherical diagonal of a level-l cell ≈ 2.44 * 2^-l rad < 150°/2^l
    val slack = 150.0 / (1L << l)
    val laMin = pts.map(_._1).min - slack
    val laMax = pts.map(_._1).max + slack
    val loMinRaw = pts.map(_._2).min
    val loMaxRaw = pts.map(_._2).max
    val nearPole = laMax >= 80.0 || laMin <= -80.0
    val wraps = loMaxRaw - loMinRaw > 180.0
    val lonSlack = slack / math.cos(math.toRadians(
      math.min(80.0, math.max(math.abs(laMin), math.abs(laMax)))))
    (laMin, laMax, loMinRaw - lonSlack, loMaxRaw + lonSlack,
      nearPole || wraps || lonSlack >= 180.0)
  }

  /** Cells at `toLevel` covering a lat/lon box — recursive descent from the
    * 6 face cells, rejecting a subtree only when its conservative
    * [[rectBound]] is provably disjoint from the box. Guaranteed superset
    * of the cells containing any point of the box (over-coverage only costs
    * refine work). Antimeridian boxes (lonMin > lonMax) split. */
  def cover(latMin: Double, latMax: Double, lonMin: Double, lonMax: Double,
            toLevel: Int): Array[Long] = {
    val lonBoxes =
      if (lonMin <= lonMax) Seq((lonMin, lonMax))
      else Seq((lonMin, 180.0), (-180.0, lonMax))
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    def intersects(id: Long): Boolean = {
      val (laMin, laMax, loMin, loMax, fullLon) = rectBound(id)
      if (laMax < latMin || laMin > latMax) false
      else fullLon || lonBoxes.exists { case (a, b) => loMax >= a && loMin <= b }
    }
    def descend(id: Long): Unit =
      if (intersects(id)) {
        if (level(id) == toLevel) out += id
        else children(id).foreach(descend)
      }
    (0 until 6).foreach(f => descend(faceCell(f)))
    val arr = out.distinct.toArray
    java.util.Arrays.sort(arr)
    arr
  }
}
