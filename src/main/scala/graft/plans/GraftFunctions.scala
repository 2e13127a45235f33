package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.geo._
import graft.multimodal._
import graft.similarity.VecDot
import graft.text.SimHash32

/** SQL-dialect surface of the graft kernels: every codegen'd Catalyst
  * expression the Column API exposes (`graft.geo.functions` etc.) is also
  * registered as a named SQL function, so `spark.sql("... cell_encode(lat,
  * lon, 8) ...")` works for users who never touch the Scala API — the
  * "complete standalone library" contract includes the SQL dialect.
  *
  * Registration composes with the optimizer rules in [[GraftExtensions]]:
  * a SQL `point_in_poly(lat, lon, array(...), array(...))` filter picks up
  * the [[PolygonBBoxPrefilter]] bbox pushdown, and a SQL pip theta join is
  * rewritten to the covering equi-join by [[PipJoinToCoverJoin]] — SQL
  * users get the same 100 TB-safe plans as Column users.
  *
  * Builders are thin constructor dispatch; arity is validated here (the
  * analyzer surfaces the message), types by each expression's own
  * `checkInputDataTypes`. `poly_cover_cells` fixes the quadkey strategy
  * (its S2 twin is `s2_poly_cover_cells`) because a `TilingStrategy` is
  * constructor state, not a child expression.
  */
object GraftFunctions {

  private type Builder = Seq[Expression] => Expression

  private def fn(name: String, arity: Int)(b: Builder)
      : (FunctionIdentifier, ExpressionInfo, Builder) = {
    val checked: Builder = { args =>
      require(args.length == arity,
        s"$name expects $arity arguments, got ${args.length}")
      b(args)
    }
    (FunctionIdentifier(name), new ExpressionInfo("graft", name), checked)
  }

  /** Every registrable kernel. A Seq (not Map): registration order is the
    * documentation order. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    // ---- tiling / spatial (geo/expressions.scala)
    fn("cell_encode", 3) { case Seq(la, lo, r) => CellEncode(la, lo, r) },
    fn("cell_encode_multi", 4) {
      case Seq(la, lo, mn, mx) => MultiResCells(la, lo, mn, mx) },
    fn("cell_parent_at", 2) { case Seq(c, r) => CellParentAt(c, r) },
    fn("cell_ring", 2) { case Seq(c, k) => CellRing(c, k) },
    fn("haversine_m", 4) {
      case Seq(a, b, c, d) => HaversineM(a, b, c, d) },
    fn("point_in_poly", 4) {
      case Seq(la, lo, las, los) => PointInPoly(la, lo, las, los) },
    fn("poly_cover_cells", 3) {
      case Seq(las, los, r) => PolyCoverCells(las, los, r, QuadkeyTiling) },
    fn("s2_poly_cover_cells", 3) {
      case Seq(las, los, r) => PolyCoverCells(las, los, r, S2Tiling) },
    fn("hex_encode", 3) { case Seq(la, lo, r) => HexEncode(la, lo, r) },
    fn("hex_ring", 2) { case Seq(c, k) => HexRing(c, k) },
    fn("hex_parent_at", 2) { case Seq(c, r) => HexParentAt(c, r) },
    fn("hex_parent_once", 1) { case Seq(c) => HexParentOnce(c) },
    fn("hex_poly_cover_cells", 3) {
      case Seq(las, los, r) => PolyCoverCells(las, los, r, HexTiling) },
    fn("s2_encode", 3) { case Seq(la, lo, l) => S2Encode(la, lo, l) },
    fn("s2_level", 1) { case Seq(c) => S2Level(c) },
    fn("s2_ring", 2) { case Seq(c, k) => S2Ring(c, k) },
    fn("s2_parent_at", 2) { case Seq(c, l) => S2ParentAt(c, l) },
    // ---- text / similarity kernels
    fn("simhash32", 1) { case Seq(t) => SimHash32(t) },
    fn("vec_dot", 2) { case Seq(a, b) => VecDot(a, b) },
    // ---- multimodal (binary-column) kernels
    fn("psnr_db", 2) { case Seq(a, b) => PsnrDb(a, b) },
    fn("raster_stats", 1) { case Seq(b) => RasterStats(b) },
    fn("raster_decode", 2) { case Seq(b, f) => RasterDecode(b, f) },
    fn("raster_resize", 5) {
      case Seq(b, w, h, ow, oh) => RasterResize(b, w, h, ow, oh) },
    fn("raster_crop", 7) {
      case Seq(b, w, h, x0, y0, cw, ch) => RasterCrop(b, w, h, x0, y0, cw, ch) },
    fn("synthetic_raster", 4) {
      case Seq(k, w, h, f) => SyntheticRaster(k, w, h, f) },
    fn("synthetic_video", 4) {
      case Seq(k, w, h, n) => SyntheticVideo(k, w, h, n) },
    fn("frame_sample", 3) {
      case Seq(v, fb, st) => FrameSample(v, fb, st) })

  /** Runtime registration on an existing session (idempotent:
    * `registerFunction` replaces). */
  def install(spark: SparkSession): Unit =
    all.foreach { case (id, info, b) =>
      GraftBridge.registerFunction(spark, id, info, b)
    }
}
