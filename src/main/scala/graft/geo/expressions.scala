package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Batched, codegen'd Catalyst expressions for the cell index — the
  * north_star's "batched Catalyst expression" for cell encoding
  * (≙ the reference's pluggable embedding model boundary,
  * raptor/EmbeddingModels.py:16-53, which is the per-record hot path there).
  * Generated code calls the static forwarders of [[GridCell]], keeping the
  * whole projection inside one WholeStageCodegen span — no row-at-a-time UDF
  * boxing. */

/** `CELL_ENCODE(lat, lon, res) -> Long` cell id. */
case class CellEncode(lat: Expression, lon: Expression, res: Expression)
    extends TernaryExpression {
  override def first: Expression = lat
  override def second: Expression = lon
  override def third: Expression = res
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = lat.dataType == DoubleType && lon.dataType == DoubleType &&
      res.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cell_encode expects (double, double, int), got " +
        s"(${lat.dataType}, ${lon.dataType}, ${res.dataType})")
  }
  override protected def nullSafeEval(la: Any, lo: Any, r: Any): Any =
    GridCell.encode(la.asInstanceOf[Double], lo.asInstanceOf[Double], r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (la, lo, r) => s"graft.geo.GridCell.encode($la, $lo, $r)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  override def prettyName: String = "cell_encode"
}

/** `CELL_PARENT(cell, toRes) -> Long` ancestor cell. */
case class CellParentAt(cell: Expression, toRes: Expression) extends BinaryExpression {
  override def left: Expression = cell
  override def right: Expression = toRes
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(c: Any, r: Any): Any =
    GridCell.parentAt(c.asInstanceOf[Long], r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, r) => s"graft.geo.GridCell.parentAt($c, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "cell_parent_at"
}

/** `CELL_ZVALUE(cell) -> Long` Morton z-curve value of a cell (x/y indices
  * bit-interleaved) — the 1-D layout key that preserves 2-D locality for
  * data-skipping writes ([[GridCell.interleave]]). */
case class CellZValue(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cell_zvalue expects a bigint cell id, got ${child.dataType}")
  override protected def nullSafeEval(c: Any): Any =
    GridCell.interleave(c.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.geo.GridCell.interleave($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "cell_zvalue"
}

/** `CELL_HVALUE(cell) -> Long` Hilbert curve index of a cell
  * ([[GridCell.hilbertD]]) — the layout key with the strict adjacency
  * guarantee (consecutive indices are always 4-neighbors), for the
  * tightest data-skipping envelopes. */
case class CellHValue(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cell_hvalue expects a bigint cell id, got ${child.dataType}")
  override protected def nullSafeEval(c: Any): Any =
    GridCell.hilbertD(c.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.geo.GridCell.hilbertD($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "cell_hvalue"
}

/** `CELL_RING(cell, k) -> Array[Long]` Chebyshev-k neighborhood (≙ H3 kRing;
  * the kNN candidate-gathering primitive, SURVEY.md J4). Array-producing, so
  * eval-based; the array is tiny (queries side, broadcast). */
case class CellRing(cell: Expression, k: Expression) extends BinaryExpression
    with CodegenFallback {
  override def left: Expression = cell
  override def right: Expression = k
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(c: Any, kk: Any): Any =
    new GenericArrayData(GridCell.ring(c.asInstanceOf[Long], kk.asInstanceOf[Int]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "cell_ring"
}

/** Static kernel for [[MultiResCells]] — returns Catalyst ArrayData so the
  * generated code assigns the result directly. */
object CellOps {
  def encodeMultiData(lat: Double, lon: Double, minRes: Int, maxRes: Int): ArrayData =
    new GenericArrayData(GridCell.encodeMulti(lat, lon, minRes, maxRes))
  def lineCellsData(a: Long, b: Long): ArrayData =
    new GenericArrayData(GridCell.lineCells(a, b))
}

/** `LINE_CELLS(cellA, cellB) -> Array[Long]` Bresenham rasterization of the
  * grid segment between two same-res cells ([[GridCell.lineCells]]) — the
  * trajectory->tile generator. Codegen'd: runs once per segment row in the
  * rasterization hot path, unlike the broadcast-side [[CellRing]]. */
case class LineCells(a: Expression, b: Expression) extends BinaryExpression {
  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (a.dataType == LongType && b.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"line_cells expects two bigint cell ids, got (${a.dataType}, ${b.dataType})")
  override protected def nullSafeEval(x: Any, y: Any): Any =
    CellOps.lineCellsData(x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.geo.CellOps.lineCellsData($x, $y)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "line_cells"
}

/** `CELL_ENCODE_MULTI(lat, lon, minRes, maxRes) -> Array[Long]` cells at
  * every res minRes..maxRes from one batched encode (SURVEY.md §1.2's
  * multi-model embedding analog, tree_builder.py:197-201). Codegen'd —
  * multi-granularity projections stay inside WholeStageCodegen, so an
  * explode-then-aggregate plan needs ONE scan and ONE shuffle for all
  * levels at once (vs a rollup chain of dependent stages). */
case class MultiResCells(lat: Expression, lon: Expression,
                         minRes: Expression, maxRes: Expression)
    extends QuaternaryExpression {
  override def first: Expression = lat
  override def second: Expression = lon
  override def third: Expression = minRes
  override def fourth: Expression = maxRes
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    CellOps.encodeMultiData(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Int], d.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c, d) => s"graft.geo.CellOps.encodeMultiData($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(f, s, t, q)
  override def prettyName: String = "cell_encode_multi"
}

/** `HAVERSINE_M(lat1, lon1, lat2, lon2) -> Double` meters. */
case class HaversineM(lat1: Expression, lon1: Expression,
                      lat2: Expression, lon2: Expression)
    extends QuaternaryExpression {
  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GridCell.haversineM(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c, d) => s"graft.geo.GridCell.haversineM($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(f, s, t, q)
  override def prettyName: String = "haversine_m"
}

/** Copy-free ray-casting kernel over Catalyst ArrayData — called from both
  * the interpreted and the generated code paths of [[PointInPoly]]. */
object PipKernel {
  /** Orientation of point (cx,cy) relative to directed segment (a→b) —
    * the sign convention every crossing test and the DuckDB oracle share
    * (op order matters: the oracle mirrors it double-for-double). */
  @inline private def orient(ax: Double, ay: Double, bx: Double, by: Double,
                             cx: Double, cy: Double): Double =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  /** Does any edge of ring A PROPERLY cross any edge of ring B (strict
    * orientation products — collinear touch / shared boundary excluded,
    * symmetrically with the oracle's strict tests)? O(|A|·|B|) over two
    * vertex rings; runs per candidate pair of the cover-cell prefilter. */
  def segCross(latsA: ArrayData, lonsA: ArrayData,
               latsB: ArrayData, lonsB: ArrayData): Boolean = {
    val n = latsA.numElements(); val m = latsB.numElements()
    var i = 0
    while (i < n) {
      val i2 = if (i + 1 == n) 0 else i + 1
      val ax = lonsA.getDouble(i); val ay = latsA.getDouble(i)
      val bx = lonsA.getDouble(i2); val by = latsA.getDouble(i2)
      var j = 0
      while (j < m) {
        val j2 = if (j + 1 == m) 0 else j + 1
        val cx = lonsB.getDouble(j); val cy = latsB.getDouble(j)
        val dx = lonsB.getDouble(j2); val dy = latsB.getDouble(j2)
        if (orient(ax, ay, bx, by, cx, cy) *
              orient(ax, ay, bx, by, dx, dy) < 0 &&
            orient(cx, cy, dx, dy, ax, ay) *
              orient(cx, cy, dx, dy, bx, by) < 0) return true
        j += 1
      }
      i += 1
    }
    false
  }

  def contains(lat: Double, lon: Double, lats: ArrayData, lons: ArrayData): Boolean = {
    val nv = lats.numElements()
    var inside = false
    var i = 0
    var j = nv - 1
    while (i < nv) {
      val yi = lats.getDouble(i); val xi = lons.getDouble(i)
      val yj = lats.getDouble(j); val xj = lons.getDouble(j)
      if ((yi > lat) != (yj > lat)) {
        val xCross = xi + (lat - yi) / (yj - yi) * (xj - xi)
        if (lon < xCross) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }
}

/** `POINT_IN_POLY(lat, lon, lats, lons) -> Boolean` ray-casting refine
  * (SURVEY.md J3 refine step). Codegen'd: the refine predicate runs on
  * every covering-cell candidate of the prefilter join (tens of millions
  * of rows at bench scale), so it must stay inside WholeStageCodegen —
  * interpreted CodegenFallback here measurably serialized the join. */
case class PointInPoly(lat: Expression, lon: Expression,
                       lats: Expression, lons: Expression,
                       refineOnly: Boolean = false)
    extends QuaternaryExpression {
  override def first: Expression = lat
  override def second: Expression = lon
  override def third: Expression = lats
  override def fourth: Expression = lons
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    PipKernel.contains(
      a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c, d) => s"graft.geo.PipKernel.contains($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(f, s, t, q, refineOnly)
  override def prettyName: String =
    if (refineOnly) "point_in_poly_refine" else "point_in_poly"
}

/** `POLY_SEG_CROSS(latsA, lonsA, latsB, lonsB) -> Boolean`: proper edge
  * crossing between two vertex rings ([[PipKernel.segCross]]) — the
  * refine kernel of the polygon↔polygon join. Codegen'd like
  * [[PointInPoly]]: it runs per cover-cell candidate pair. */
case class PolySegCross(latsA: Expression, lonsA: Expression,
                        latsB: Expression, lonsB: Expression)
    extends QuaternaryExpression {
  override def first: Expression = latsA
  override def second: Expression = lonsA
  override def third: Expression = latsB
  override def fourth: Expression = lonsB
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    PipKernel.segCross(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c, d) => s"graft.geo.PipKernel.segCross($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(f, s, t, q)
  override def prettyName: String = "poly_seg_cross"
}

/** `POLY_COVER_CELLS(lats, lons, res) -> Array[Long]`: covering cells of a
  * polygon's bounding box under the given [[TilingStrategy]] — the
  * DISTRIBUTED covering-index build (each polygon row computes its own
  * cover on an executor; no driver-side loop, so a 10^6-polygon vector
  * layer builds its prefilter index as a plain projection + explode).
  * Runs once per polygon row (dim side) -> eval-based is fine. */
case class PolyCoverCells(lats: Expression, lons: Expression, res: Expression,
                          strategy: TilingStrategy)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = lats
  override def second: Expression = lons
  override def third: Expression = res
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(la: Any, lo: Any, r: Any): Any = {
    val laA = la.asInstanceOf[ArrayData].toDoubleArray()
    val loA = lo.asInstanceOf[ArrayData].toDoubleArray()
    val (laMin, laMax, loMin, loMax) = GridCell.polyBounds(laA, loA)
    new GenericArrayData(
      strategy.cover(laMin, laMax, loMin, loMax, r.asInstanceOf[Int]))
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(f, s, t, strategy)
  override def prettyName: String = s"poly_cover_cells_${strategy.name}"
}

/** `S2_ENCODE(lat, lon, level) -> Long` S2-style cell id (cube-face +
  * Hilbert; [[S2Cell]]) — the alternate `TilingStrategy` index. */
case class S2Encode(lat: Expression, lon: Expression, level: Expression)
    extends TernaryExpression {
  override def first: Expression = lat
  override def second: Expression = lon
  override def third: Expression = level
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(la: Any, lo: Any, l: Any): Any =
    S2Cell.fromLatLng(la.asInstanceOf[Double], lo.asInstanceOf[Double],
      l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (la, lo, l) => s"graft.geo.S2Cell.fromLatLng($la, $lo, $l)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  override def prettyName: String = "s2_encode"
}

/** `S2_LEVEL(id) -> Int` level of an S2 cell (trailing-bit position). */
case class S2Level(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(c: Any): Any =
    S2Cell.level(c.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.geo.S2Cell.level($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "s2_level"
}

/** `S2_RING(cell, k) -> Array[Long]` cross-face Chebyshev-k neighborhood
  * (≙ [[CellRing]] for the S2 strategy; query-side tiny -> eval-based). */
case class S2Ring(cell: Expression, k: Expression) extends BinaryExpression
    with CodegenFallback {
  override def left: Expression = cell
  override def right: Expression = k
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(c: Any, kk: Any): Any =
    new GenericArrayData(S2Cell.ring(c.asInstanceOf[Long], kk.asInstanceOf[Int]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "s2_ring"
}

/** `S2_PARENT_AT(id, level) -> Long` ancestor cell (bit truncation). */
case class S2ParentAt(id: Expression, toLevel: Expression) extends BinaryExpression {
  override def left: Expression = id
  override def right: Expression = toLevel
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(c: Any, l: Any): Any =
    S2Cell.parentAt(c.asInstanceOf[Long], l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.geo.S2Cell.parentAt($c, $l)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "s2_parent_at"
}

/** `HEX_ENCODE(lat, lon, res) -> Long` pointy-top hexagonal cell id
  * ([[HexCell]]) — the H3-style third grid index. Codegen'd: runs on the
  * corpus hot path like [[CellEncode]]. */
case class HexEncode(lat: Expression, lon: Expression, res: Expression)
    extends TernaryExpression {
  override def first: Expression = lat
  override def second: Expression = lon
  override def third: Expression = res
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(la: Any, lo: Any, r: Any): Any =
    HexCell.encode(la.asInstanceOf[Double], lo.asInstanceOf[Double],
      r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (la, lo, r) => s"graft.geo.HexCell.encode($la, $lo, $r)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  override def prettyName: String = "hex_encode"
}

/** `HEX_RING(cell, k) -> Array[Long]` axial disk (hex distance <= k,
  * 1 + 3k(k+1) cells) — query-side tiny, eval-based like [[CellRing]]. */
case class HexRing(cell: Expression, k: Expression) extends BinaryExpression
    with CodegenFallback {
  override def left: Expression = cell
  override def right: Expression = k
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(c: Any, kk: Any): Any =
    new GenericArrayData(HexCell.ring(c.asInstanceOf[Long], kk.asInstanceOf[Int]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "hex_ring"
}

/** `HEX_PARENT_AT(cell, toRes) -> Long` H3-style center-rounded ancestor. */
case class HexParentAt(cell: Expression, toRes: Expression) extends BinaryExpression {
  override def left: Expression = cell
  override def right: Expression = toRes
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(c: Any, r: Any): Any =
    HexCell.parentAt(c.asInstanceOf[Long], r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, r) => s"graft.geo.HexCell.parentAt($c, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "hex_parent_at"
}

/** `HEX_PARENT_ONCE(cell) -> Long` one level coarser, literal-free (the
  * rollup key for index-agnostic pyramid builds). */
case class HexParentOnce(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(c: Any): Any =
    HexCell.parentOnce(c.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.geo.HexCell.parentOnce($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "hex_parent_once"
}

/** `GEOHASH_ENCODE(lat, lon, prec) -> String` — integer-lattice geohash
  * ([[Geohash.encode]]): the interoperable string-keyed spatial index with
  * the exact substring-prefix rollup property. Codegen'd; the kernel is a
  * static call so the whole projection stays in one WholeStageCodegen span. */
case class GeohashEncode(lat: Expression, lon: Expression, prec: Expression)
    extends TernaryExpression {
  override def first: Expression = lat
  override def second: Expression = lon
  override def third: Expression = prec
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = lat.dataType == DoubleType && lon.dataType == DoubleType &&
      prec.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"geohash_encode expects (double, double, int), got " +
        s"(${lat.dataType}, ${lon.dataType}, ${prec.dataType})")
  }
  override protected def nullSafeEval(la: Any, lo: Any, p: Any): Any =
    Geohash.encodeUTF8(la.asInstanceOf[Double], lo.asInstanceOf[Double],
      p.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (la, lo, p) => s"graft.geo.Geohash.encodeUTF8($la, $lo, $p)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  override def prettyName: String = "geohash_encode"
}

/** Column-level API over the expressions, mirroring
  * `org.apache.spark.sql.functions`. */
object functions {
  private def col(e: Expression): Column = GraftBridge.column(e)
  private def expr(c: Column): Expression = GraftBridge.expression(c)

  def cell_encode(lat: Column, lon: Column, res: Column): Column =
    col(CellEncode(expr(lat), expr(lon), expr(res)))
  def cell_encode(lat: Column, lon: Column, res: Int): Column =
    cell_encode(lat, lon, org.apache.spark.sql.functions.lit(res))
  def cell_encode_multi(lat: Column, lon: Column, minRes: Int, maxRes: Int): Column =
    col(MultiResCells(expr(lat), expr(lon),
      expr(org.apache.spark.sql.functions.lit(minRes)),
      expr(org.apache.spark.sql.functions.lit(maxRes))))
  def cell_parent_at(cell: Column, toRes: Column): Column =
    col(CellParentAt(expr(cell), expr(toRes)))
  def cell_parent_at(cell: Column, toRes: Int): Column =
    cell_parent_at(cell, org.apache.spark.sql.functions.lit(toRes))
  def cell_ring(cell: Column, k: Column): Column =
    col(CellRing(expr(cell), expr(k)))
  def line_cells(a: Column, b: Column): Column =
    col(LineCells(expr(a), expr(b)))
  def cell_zvalue(cell: Column): Column = col(CellZValue(expr(cell)))
  def cell_hvalue(cell: Column): Column = col(CellHValue(expr(cell)))
  def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    col(HaversineM(expr(lat1), expr(lon1), expr(lat2), expr(lon2)))
  def point_in_poly(lat: Column, lon: Column, lats: Column, lons: Column): Column =
    col(PointInPoly(expr(lat), expr(lon), expr(lats), expr(lons)))
  def poly_seg_cross(latsA: Column, lonsA: Column,
                     latsB: Column, lonsB: Column): Column =
    col(PolySegCross(expr(latsA), expr(lonsA), expr(latsB), expr(lonsB)))
  /** Same predicate pre-marked `refineOnly`: evaluates identically but no
    * optimizer rule ever rewrites it — for brute-force test oracles. */
  def point_in_poly_refine(lat: Column, lon: Column, lats: Column, lons: Column): Column =
    col(PointInPoly(expr(lat), expr(lon), expr(lats), expr(lons), refineOnly = true))
  def s2_encode(lat: Column, lon: Column, level: Int): Column =
    col(S2Encode(expr(lat), expr(lon),
      expr(org.apache.spark.sql.functions.lit(level))))
  def s2_parent_at(id: Column, toLevel: Int): Column =
    col(S2ParentAt(expr(id),
      expr(org.apache.spark.sql.functions.lit(toLevel))))
  def s2_ring(cell: Column, k: Column): Column =
    col(S2Ring(expr(cell), expr(k)))
  def s2_level(id: Column): Column = col(S2Level(expr(id)))
  def hex_encode(lat: Column, lon: Column, res: Int): Column =
    col(HexEncode(expr(lat), expr(lon),
      expr(org.apache.spark.sql.functions.lit(res))))
  def hex_ring(cell: Column, k: Column): Column =
    col(HexRing(expr(cell), expr(k)))
  def hex_parent_at(cell: Column, toRes: Int): Column =
    col(HexParentAt(expr(cell),
      expr(org.apache.spark.sql.functions.lit(toRes))))
  def hex_parent_once(cell: Column): Column = col(HexParentOnce(expr(cell)))
  def geohash_encode(lat: Column, lon: Column, prec: Int): Column =
    col(GeohashEncode(expr(lat), expr(lon),
      expr(org.apache.spark.sql.functions.lit(prec))))

  /** Register SQL names so `spark.sql` queries can use the extensions too. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cell_encode",
      es => CellEncode(es(0), es(1), es(2)), "builtin")
    reg.createOrReplaceTempFunction("cell_parent_at",
      es => CellParentAt(es(0), es(1)), "builtin")
    reg.createOrReplaceTempFunction("cell_ring",
      es => CellRing(es(0), es(1)), "builtin")
    reg.createOrReplaceTempFunction("cell_zvalue",
      es => CellZValue(es(0)), "builtin")
    reg.createOrReplaceTempFunction("haversine_m",
      es => HaversineM(es(0), es(1), es(2), es(3)), "builtin")
    reg.createOrReplaceTempFunction("point_in_poly",
      es => PointInPoly(es(0), es(1), es(2), es(3)), "builtin")
    reg.createOrReplaceTempFunction("poly_seg_cross",
      es => PolySegCross(es(0), es(1), es(2), es(3)), "builtin")
    reg.createOrReplaceTempFunction("cell_encode_multi",
      es => MultiResCells(es(0), es(1), es(2), es(3)), "builtin")
    reg.createOrReplaceTempFunction("s2_encode",
      es => S2Encode(es(0), es(1), es(2)), "builtin")
    reg.createOrReplaceTempFunction("s2_parent_at",
      es => S2ParentAt(es(0), es(1)), "builtin")
    reg.createOrReplaceTempFunction("s2_ring",
      es => S2Ring(es(0), es(1)), "builtin")
    reg.createOrReplaceTempFunction("s2_level",
      es => S2Level(es(0)), "builtin")
    reg.createOrReplaceTempFunction("geohash_encode",
      es => GeohashEncode(es(0), es(1), es(2)), "builtin")
  }
}
