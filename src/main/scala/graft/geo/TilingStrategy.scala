package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{shiftleft, shiftrightunsigned}

/** Pluggable cell index behind the spatial operators — the graft of the
  * reference's pluggable clustering algorithm boundary
  * (raptor/cluster_utils.py:130-133 `ClusteringAlgorithm`): [[SpatialJoin]]
  * and [[graft.operators.Knn]] are written against this interface, so the
  * quadkey grid (the oracle-checked default — encodable in ANSI SQL) and
  * the S2-style spherical index (no polar distortion, Hilbert locality) are
  * interchangeable. SpatialParitySpec proves output-set equality against
  * brute force under BOTH strategies.
  */
trait TilingStrategy extends Serializable {
  def name: String
  /** Conservative lower bound, in planar degrees, on the distance from any
    * point of a cell to any point OUTSIDE the cell's k-ring, per ring step
    * — the kNN settle bound (an UNDER-estimate only costs extra rounds;
    * an over-estimate would break exactness). */
  def minUnitDeg(res: Int): Double
  /** Default covering resolution for the polygon prefilter index. */
  def defaultCoverRes: Int
  def encode(lat: Double, lon: Double, res: Int): Long
  def parentAt(cell: Long, toRes: Int): Long
  def ring(cell: Long, k: Int): Array[Long]
  def cover(latMin: Double, latMax: Double, lonMin: Double, lonMax: Double,
            res: Int): Array[Long]
  def encodeCol(lat: Column, lon: Column, res: Int): Column
  def ringCol(cell: Column, k: Column): Column
  /** Ancestor at a fixed coarser res (Column form). */
  def parentAtCol(cell: Column, toRes: Int): Column
  /** Parent ONE level coarser, derived from the cell id alone (both
    * indexes carry the level in the id) — the literal-free rollup key. */
  def parentOnceCol(cell: Column): Column
  /** Resolution/level of a cell id (Column form). */
  def resCol(cell: Column): Column
  /** Covering cells of a polygon (lats, lons array columns) at `res` —
    * the distributed covering-index projection. */
  def coverCol(lats: Column, lons: Column, res: Int): Column = {
    val B = org.apache.spark.sql.GraftBridge
    B.column(PolyCoverCells(B.expression(lats), B.expression(lons),
      B.expression(org.apache.spark.sql.functions.lit(res)), this))
  }
}

/** Quadkey lat/lon grid ([[GridCell]]) — the default. Exactness bound:
  * a point outside ring r differs by > (r-? ) cells on an axis; the
  * standard r * min(cellW, cellH) planar bound (pinned by parity specs). */
object QuadkeyTiling extends TilingStrategy {
  val name = "quadkey"
  def minUnitDeg(res: Int): Double =
    math.min(GridCell.cellHeightDeg(res), GridCell.cellWidthDeg(res))
  val defaultCoverRes = 6
  def encode(lat: Double, lon: Double, res: Int): Long =
    GridCell.encode(lat, lon, res)
  def parentAt(cell: Long, toRes: Int): Long = GridCell.parentAt(cell, toRes)
  def ring(cell: Long, k: Int): Array[Long] = GridCell.ring(cell, k)
  def cover(latMin: Double, latMax: Double, lonMin: Double, lonMax: Double,
            res: Int): Array[Long] =
    GridCell.cover(latMin, latMax, lonMin, lonMax, res)
  def encodeCol(lat: Column, lon: Column, res: Int): Column =
    functions.cell_encode(lat, lon, res)
  def ringCol(cell: Column, k: Column): Column = functions.cell_ring(cell, k)
  def parentAtCol(cell: Column, toRes: Int): Column =
    functions.cell_parent_at(cell, toRes)
  def parentOnceCol(cell: Column): Column =
    functions.cell_parent_at(cell,
      (shiftrightunsigned(cell, 58) - 1).cast("int"))
  def resCol(cell: Column): Column = shiftrightunsigned(cell, 58).cast("int")
}

/** Pointy-top hexagonal grid ([[HexCell]]) — the H3-style index the north
  * star names. Exactness bound for the kNN settle: a point in a cell at
  * hex distance > k from the query's cell is at planar distance
  * >= 1.5(k+1)R − 2R = (1.5k − 0.5)R >= k·R for k >= 1 (cell points lie
  * within the circumradius R of their center; centers at hex distance d
  * are >= 1.5·d·R apart — the hex-ball incircle), so minUnitDeg = R is
  * conservative. Hierarchy is H3-style center rounding: exact partition,
  * approximate geometry (see [[HexCell]]). */
object HexTiling extends TilingStrategy {
  val name = "hex"
  def minUnitDeg(res: Int): Double = HexCell.circumDeg(res)
  val defaultCoverRes = 6
  def encode(lat: Double, lon: Double, res: Int): Long =
    HexCell.encode(lat, lon, res)
  def parentAt(cell: Long, toRes: Int): Long = HexCell.parentAt(cell, toRes)
  def ring(cell: Long, k: Int): Array[Long] = HexCell.ring(cell, k)
  def cover(latMin: Double, latMax: Double, lonMin: Double, lonMax: Double,
            res: Int): Array[Long] =
    HexCell.cover(latMin, latMax, lonMin, lonMax, res)
  def encodeCol(lat: Column, lon: Column, res: Int): Column =
    functions.hex_encode(lat, lon, res)
  def ringCol(cell: Column, k: Column): Column = functions.hex_ring(cell, k)
  def parentAtCol(cell: Column, toRes: Int): Column =
    functions.hex_parent_at(cell, toRes)
  def parentOnceCol(cell: Column): Column = functions.hex_parent_once(cell)
  def resCol(cell: Column): Column = shiftrightunsigned(cell, 58).cast("int")
}

/** S2-style cube-face Hilbert index ([[S2Cell]]). Exactness bound: min
  * cell width ≈ 0.94 * 2^-l rad ≈ 54° * 2^-l; halved for the planar-vs-arc
  * factor (planar deg >= arc deg / sqrt 2) and cross-face corner slack. */
object S2Tiling extends TilingStrategy {
  val name = "s2"
  def minUnitDeg(res: Int): Double = 27.0 / (1L << res)
  val defaultCoverRes = 5
  def encode(lat: Double, lon: Double, res: Int): Long =
    S2Cell.fromLatLng(lat, lon, res)
  def parentAt(cell: Long, toRes: Int): Long = S2Cell.parentAt(cell, toRes)
  def ring(cell: Long, k: Int): Array[Long] = S2Cell.ring(cell, k)
  def cover(latMin: Double, latMax: Double, lonMin: Double, lonMax: Double,
            res: Int): Array[Long] =
    S2Cell.cover(latMin, latMax, lonMin, lonMax, res)
  def encodeCol(lat: Column, lon: Column, res: Int): Column =
    functions.s2_encode(lat, lon, res)
  def ringCol(cell: Column, k: Column): Column = functions.s2_ring(cell, k)
  def parentAtCol(cell: Column, toRes: Int): Column =
    functions.s2_parent_at(cell, toRes)
  /** parent = clear the low 2 position bits and move the level marker up:
    * pure builtin bit algebra (codegen'd, literal-free). */
  def parentOnceCol(cell: Column): Column = {
    val lsb2 = shiftleft(cell.bitwiseAND(-cell), 2)
    cell.bitwiseAND(-lsb2).bitwiseOR(lsb2)
  }
  def resCol(cell: Column): Column = functions.s2_level(cell)
}
