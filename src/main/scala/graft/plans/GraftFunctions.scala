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

  private def fn(name: String, arity: Int, usage: String = "")(b: Builder)
      : (FunctionIdentifier, ExpressionInfo, Builder) = {
    val checked: Builder = { args =>
      require(args.length == arity,
        s"$name expects $arity arguments, got ${args.length}")
      b(args)
    }
    val info =
      if (usage.isEmpty) new ExpressionInfo("graft", name)
      else new ExpressionInfo("graft", null, name, usage, "")
    (FunctionIdentifier(name), info, checked)
  }

  /** Every registrable kernel. A Seq (not Map): registration order is the
    * documentation order. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    // ---- tiling / spatial (geo/expressions.scala)
    fn("cell_encode", 3,
      "cell_encode(lat, lon, res) - quadkey grid cell id of the point at " +
        "resolution res (0-16); id carries res in its top 6 bits.") {
      case Seq(la, lo, r) => CellEncode(la, lo, r) },
    fn("cell_encode_multi", 4,
      "cell_encode_multi(lat, lon, minRes, maxRes) - array of quadkey cell " +
        "ids at every resolution minRes..maxRes from one batched encode.") {
      case Seq(la, lo, mn, mx) => MultiResCells(la, lo, mn, mx) },
    fn("cell_parent_at", 2,
      "cell_parent_at(cell, toRes) - ancestor of a quadkey cell at the " +
        "coarser resolution toRes (bit truncation).") {
      case Seq(c, r) => CellParentAt(c, r) },
    fn("cell_ring", 2,
      "cell_ring(cell, k) - array of all quadkey cells within Chebyshev " +
        "distance k ((2k+1)^2 cells; longitude wraps).") {
      case Seq(c, k) => CellRing(c, k) },
    fn("line_cells", 2,
      "line_cells(cellA, cellB) - array of same-res quadkey cells on the " +
        "Bresenham grid segment from cellA to cellB (trajectory " +
        "rasterization; planar, no antimeridian wrap).") {
      case Seq(a, b) => LineCells(a, b) },
    fn("cell_zvalue", 1,
      "cell_zvalue(cell) - Morton z-curve value of a quadkey cell (x/y " +
        "bit-interleaved); the 1-D sort key that preserves 2-D locality " +
        "for data-skipping layouts.") {
      case Seq(c) => CellZValue(c) },
    fn("cell_hvalue", 1,
      "cell_hvalue(cell) - Hilbert curve index of a quadkey cell; the " +
        "layout key whose consecutive values are always grid neighbors " +
        "(tightest data-skipping envelopes).") {
      case Seq(c) => CellHValue(c) },
    fn("haversine_m", 4,
      "haversine_m(lat1, lon1, lat2, lon2) - great-circle distance in " +
        "meters.") {
      case Seq(a, b, c, d) => HaversineM(a, b, c, d) },
    fn("point_in_poly", 4,
      "point_in_poly(lat, lon, lats, lons) - ray-casting containment of " +
        "the point in the polygon given as parallel vertex arrays; a theta " +
        "join on this predicate is rewritten to a covering-cell equi-join " +
        "by the graft optimizer rules.") {
      case Seq(la, lo, las, los) => PointInPoly(la, lo, las, los) },
    fn("poly_seg_cross", 4,
      "poly_seg_cross(latsA, lonsA, latsB, lonsB) - true when any edge of " +
        "ring A properly crosses any edge of ring B (strict orientation " +
        "products); the refine kernel of the polygon-polygon overlay join.") {
      case Seq(la, lo, lb, lob) => PolySegCross(la, lo, lb, lob) },
    fn("poly_cover_cells", 3,
      "poly_cover_cells(lats, lons, res) - quadkey cells covering the " +
        "polygon's bounding box (the broadcast prefilter index).") {
      case Seq(las, los, r) => PolyCoverCells(las, los, r, QuadkeyTiling) },
    fn("s2_poly_cover_cells", 3,
      "s2_poly_cover_cells(lats, lons, res) - S2-index covering cells of " +
        "the polygon's bounding box.") {
      case Seq(las, los, r) => PolyCoverCells(las, los, r, S2Tiling) },
    fn("hex_encode", 3,
      "hex_encode(lat, lon, res) - pointy-top hexagonal (H3-style) cell id " +
        "via fractional-axial + cube rounding.") {
      case Seq(la, lo, r) => HexEncode(la, lo, r) },
    fn("hex_ring", 2,
      "hex_ring(cell, k) - array of all hex cells within hex distance k " +
        "(1 + 3k(k+1) cells).") {
      case Seq(c, k) => HexRing(c, k) },
    fn("hex_parent_at", 2,
      "hex_parent_at(cell, toRes) - H3-style center-rounded ancestor at " +
        "the coarser resolution toRes.") {
      case Seq(c, r) => HexParentAt(c, r) },
    fn("hex_parent_once", 1,
      "hex_parent_once(cell) - hex parent one resolution coarser " +
        "(center-rounded, literal-free rollup key).") {
      case Seq(c) => HexParentOnce(c) },
    fn("hex_poly_cover_cells", 3,
      "hex_poly_cover_cells(lats, lons, res) - hex-grid covering cells of " +
        "the polygon's bounding box.") {
      case Seq(las, los, r) => PolyCoverCells(las, los, r, HexTiling) },
    fn("s2_encode", 3,
      "s2_encode(lat, lon, level) - S2-style cube-face Hilbert cell id at " +
        "the given level.") {
      case Seq(la, lo, l) => S2Encode(la, lo, l) },
    fn("s2_level", 1,
      "s2_level(id) - level of an S2 cell id (trailing-bit position).") {
      case Seq(c) => S2Level(c) },
    fn("s2_ring", 2,
      "s2_ring(cell, k) - array of the S2 cells within Chebyshev distance " +
        "k, crossing cube faces where needed.") {
      case Seq(c, k) => S2Ring(c, k) },
    fn("s2_parent_at", 2,
      "s2_parent_at(id, level) - ancestor S2 cell at the coarser level " +
        "(bit truncation).") {
      case Seq(c, l) => S2ParentAt(c, l) },
    // ---- text / similarity kernels
    fn("simhash32", 1,
      "simhash32(hashes) - 32-bit SimHash of an array of 64-bit token " +
        "hashes (bit-majority vote).") {
      case Seq(t) => SimHash32(t) },
    fn("vec_dot", 2,
      "vec_dot(a, b) - dot product of two double arrays (the cosine/ANN " +
        "kernel; strict IEEE-754 left-to-right accumulation).") {
      case Seq(a, b) => VecDot(a, b) },
    // ---- multimodal (binary-column) kernels
    fn("psnr_db", 2,
      "psnr_db(bytes_a, bytes_b) - peak signal-to-noise ratio in dB " +
        "between two equal-length binary rasters (Infinity if identical).") {
      case Seq(a, b) => PsnrDb(a, b) },
    fn("raster_hist4", 1,
      "raster_hist4(bytes) - 4-bin luminance histogram (64-wide bins) of " +
        "the pixel bytes; bins sum associatively for zonal rollups.") {
      case Seq(b) => RasterHist4(b) },
    fn("raster_stats", 1,
      "raster_stats(bytes) - struct(n_bytes, mean_px, min_px, max_px) of a " +
        "decoded raster byte stream.") {
      case Seq(b) => RasterStats(b) },
    fn("raster_decode", 2,
      "raster_decode(bytes, fmt) - decode a stored raster ('raw' " +
        "passthrough, 'lossy' delta stream) to raw pixel bytes.") {
      case Seq(b, f) => RasterDecode(b, f) },
    fn("raster_resize", 5,
      "raster_resize(bytes, w, h, outW, outH) - nearest-neighbor resize of " +
        "a raw w*h*3 raster to outW*outH*3.") {
      case Seq(b, w, h, ow, oh) => RasterResize(b, w, h, ow, oh) },
    fn("raster_crop", 7,
      "raster_crop(bytes, w, h, x0, y0, cw, ch) - crop a raw w*h*3 raster " +
        "to the cw*ch window at (x0, y0).") {
      case Seq(b, w, h, x0, y0, cw, ch) => RasterCrop(b, w, h, x0, y0, cw, ch) },
    fn("synthetic_raster", 4,
      "synthetic_raster(k, w, h, fmt) - deterministic seeded w*h*3 raster " +
        "bytes for key k ('raw' or 'lossy' encoding).") {
      case Seq(k, w, h, f) => SyntheticRaster(k, w, h, f) },
    fn("synthetic_video", 4,
      "synthetic_video(k, w, h, nFrames) - deterministic seeded video: " +
        "nFrames concatenated w*h*3 frames.") {
      case Seq(k, w, h, n) => SyntheticVideo(k, w, h, n) },
    fn("dhash56", 3,
      "dhash56(bytes, w, h) - 56-bit perceptual difference hash of a " +
        "decoded w*h*3 raster (8x8 gray grid, adjacent-compare bits); " +
        "the image near-dup key.") {
      case Seq(b, w, h) => DHash56(b, w, h) },
    fn("raster_hflip", 3,
      "raster_hflip(bytes, w, h) - horizontal mirror of a raw w*h*3 " +
        "raster; the canonical label-preserving image augmentation.") {
      case Seq(b, w, h) => RasterHFlip(b, w, h) },
    fn("raster_rot90", 3,
      "raster_rot90(bytes, w, h) - 90-degree clockwise rotation of a raw " +
        "w*h*3 raster (output h wide x w tall); augmentation family.") {
      case Seq(b, w, h) => RasterRot90(b, w, h) },
    fn("raster_chk", 1,
      "raster_chk(bytes) - position-weighted checksum sum((i+1)*b[i]); " +
        "the layout-sensitive fingerprint that pins geometric transforms.") {
      case Seq(b) => RasterChk(b) },
    fn("sobel_energy", 3,
      "sobel_energy(bytes, w, h) - integer Sobel gradient energy of a " +
        "decoded w*h*3 raster (8x8 gray grid, 3x3 Sobel over the interior); " +
        "the image sharpness/quality score.") {
      case Seq(b, w, h) => SobelEnergy(b, w, h) },
    fn("frame_sample", 3,
      "frame_sample(video, frameBytes, stride) - array of every stride-th " +
        "frame (as binary) from a concatenated-frames video blob.") {
      case Seq(v, fb, st) => FrameSample(v, fb, st) },
    fn("byte_at", 2,
      "byte_at(bytes, i) - unsigned byte at index i of a binary blob " +
        "(0 when out of range); the mosaic-pyramid pixel extractor.") {
      case Seq(b, i) => ByteAt(b, i) })

  /** Runtime registration on an existing session (idempotent:
    * `registerFunction` replaces). */
  def install(spark: SparkSession): Unit =
    all.foreach { case (id, info, b) =>
      GraftBridge.registerFunction(spark, id, info, b)
    }
}
