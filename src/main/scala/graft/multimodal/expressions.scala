package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions over the binary image column. Binary-producing /
  * binary-consuming, so eval-based (CodegenFallback) — they are not on the
  * spatial hot path; heavy pixel work belongs in [[Raster]] statics either
  * way. (≙ the reference's embedding-model device boundary,
  * raptor/EmbeddingModels.py:26-53 — opaque per-record kernel.) */

/** `SYNTHETIC_RASTER(k, w, h, fmt) -> binary` stored image bytes. */
case class SyntheticRaster(k: Expression, w: Expression, h: Expression, fmt: Expression)
    extends QuaternaryExpression with CodegenFallback {
  override def first: Expression = k
  override def second: Expression = w
  override def third: Expression = h
  override def fourth: Expression = fmt
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(kk: Any, ww: Any, hh: Any, f: Any): Any =
    Raster.storedBytes(kk.asInstanceOf[Long], ww.asInstanceOf[Int],
      hh.asInstanceOf[Int], f.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(a, b, c, d)
  override def prettyName: String = "synthetic_raster"
}

/** `RASTER_STATS(bytes) -> struct<mean_px double, min_px int, max_px int,
  * n_bytes int>` — the codec-free "feature extract" step. */
case class RasterStats(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("mean_px", DoubleType, nullable = false),
    StructField("min_px", IntegerType, nullable = false),
    StructField("max_px", IntegerType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val (mean, mn, mx) = Raster.stats(bytes)
    InternalRow(mean, mn, mx, bytes.length)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "raster_stats"
}

/** `RASTER_HIST4(bytes) -> array<bigint>[4]` 4-bin luminance histogram of
  * the pixel bytes (bins [0,64) [64,128) [128,192) [192,256)) — the
  * per-image piece of the zonal luma-distribution rollup: the bins sum
  * associatively, so tile histograms are one keyed aggregation away. */
case class RasterHist4(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val bins = new Array[Long](4)
    var i = 0
    while (i < bytes.length) {
      bins((bytes(i) & 0xFF) >> 6) += 1L
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(bins)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "raster_hist4"
}

/** `RASTER_CHANNEL_SUMS(bytes) -> array<bigint>[3]` per-channel (R,G,B)
  * byte sums of an interleaved 3-channel raster — the per-image piece of
  * gray-world white-balance estimation (sums are associative, so corpus
  * or tile color-cast rollups are one keyed aggregation away, exactly the
  * [[RasterHist4]] shape). */
case class RasterChannelSums(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val sums = new Array[Long](3)
    var i = 0
    while (i < bytes.length) {
      sums(i % 3) += (bytes(i) & 0xFF).toLong
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sums)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "raster_channel_sums"
}

/** `PSNR_DB(a, b) -> double` per-row fidelity (north-rule invariant:
  * >= 40 dB for lossy, 99 for byte-identical). */
case class PsnrDb(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Raster.psnrDb(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "psnr_db"
}

/** `RASTER_DECODE(bytes, fmt) -> binary` decoded pixel bytes — the codec
  * boundary (STUB for real codecs per Raster.decode; raw/lossy are raster
  * layout already). Keeping it an explicit plan node makes the decode step
  * visible/pluggable, mirroring the reference's model-dispatch boundary. */
case class RasterDecode(bytes: Expression, fmt: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = bytes
  override def right: Expression = fmt
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any, f: Any): Any =
    Raster.decode(b.asInstanceOf[Array[Byte]], f.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "raster_decode"
}

/** `RASTER_RESIZE(bytes, w, h, ow, oh) -> binary` nearest-neighbor
  * thumbnail (the feature-extract step of the multimodal pipeline). */
case class RasterResize(bytes: Expression, w: Expression, h: Expression,
                        ow: Expression, oh: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(bytes, w, h, ow, oh)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else Raster.resize(vs(0).asInstanceOf[Array[Byte]],
      vs(1).asInstanceOf[Int], vs(2).asInstanceOf[Int],
      vs(3).asInstanceOf[Int], vs(4).asInstanceOf[Int])
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1), cs(2), cs(3), cs(4))
  override def prettyName: String = "raster_resize"
}

/** `RASTER_CROP(bytes, w, h, x0, y0, cw, ch) -> binary` patch sample. */
case class RasterCrop(bytes: Expression, w: Expression, h: Expression,
                      x0: Expression, y0: Expression,
                      cw: Expression, ch: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(bytes, w, h, x0, y0, cw, ch)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else Raster.crop(vs(0).asInstanceOf[Array[Byte]],
      vs(1).asInstanceOf[Int], vs(2).asInstanceOf[Int],
      vs(3).asInstanceOf[Int], vs(4).asInstanceOf[Int],
      vs(5).asInstanceOf[Int], vs(6).asInstanceOf[Int])
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1), cs(2), cs(3), cs(4), cs(5), cs(6))
  override def prettyName: String = "raster_crop"
}

/** `SYNTHETIC_VIDEO(k, w, h, nframes) -> binary` multi-frame blob (the
  * video-modality stand-in; frames are per-index-seeded rasters). */
case class SyntheticVideo(k: Expression, w: Expression, h: Expression,
                          nFrames: Expression)
    extends QuaternaryExpression with CodegenFallback {
  override def first: Expression = k
  override def second: Expression = w
  override def third: Expression = h
  override def fourth: Expression = nFrames
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(kk: Any, ww: Any, hh: Any, nf: Any): Any =
    Raster.videoBytes(kk.asInstanceOf[Long], ww.asInstanceOf[Int],
      hh.asInstanceOf[Int], nf.asInstanceOf[Int])
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(a, b, c, d)
  override def prettyName: String = "synthetic_video"
}

/** `FRAME_SAMPLE(video, frame_bytes, stride) -> array<binary>` every
  * stride-th frame — the video-pipeline sampling step; downstream per-frame
  * kernels (stats/resize/psnr) apply via explode. */
case class FrameSample(video: Expression, frameBytes: Expression,
                       stride: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = video
  override def second: Expression = frameBytes
  override def third: Expression = stride
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any, fb: Any, st: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Raster.sampleFrames(v.asInstanceOf[Array[Byte]],
        fb.asInstanceOf[Int], st.asInstanceOf[Int]).asInstanceOf[Array[Any]])
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression = copy(a, b, c)
  override def prettyName: String = "frame_sample"
}

/** `DHASH56(bytes, w, h) -> Long` 56-bit perceptual difference hash of a
  * decoded raster ([[Raster.dhash]] — the image near-dup key). */
case class DHash56(bytes: Expression, w: Expression, h: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = bytes
  override def second: Expression = w
  override def third: Expression = h
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any, ww: Any, hh: Any): Any =
    Raster.dhash(b.asInstanceOf[Array[Byte]],
      ww.asInstanceOf[Int], hh.asInstanceOf[Int])
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  override def prettyName: String = "dhash56"
}

/** `RASTER_HFLIP(bytes, w, h) -> binary` horizontal mirror — the canonical
  * label-preserving image augmentation ([[Raster.hflip]]). */
case class RasterHFlip(bytes: Expression, w: Expression, h: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = bytes
  override def second: Expression = w
  override def third: Expression = h
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any, ww: Any, hh: Any): Any =
    Raster.hflip(b.asInstanceOf[Array[Byte]],
      ww.asInstanceOf[Int], hh.asInstanceOf[Int])
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  override def prettyName: String = "raster_hflip"
}

/** `RASTER_ROT90(bytes, w, h) -> binary` 90°-clockwise rotation (output is
  * h wide x w tall; [[Raster.rot90]]) — augmentation family. */
case class RasterRot90(bytes: Expression, w: Expression, h: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = bytes
  override def second: Expression = w
  override def third: Expression = h
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any, ww: Any, hh: Any): Any =
    Raster.rot90(b.asInstanceOf[Array[Byte]],
      ww.asInstanceOf[Int], hh.asInstanceOf[Int])
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  override def prettyName: String = "raster_rot90"
}

/** `SOBEL_ENERGY(bytes, w, h) -> Long` integer Sobel gradient energy of a
  * decoded raster ([[Raster.sobelEnergy]] — the image quality/sharpness
  * score; same 8x8 gray grid as dHash). */
case class SobelEnergy(bytes: Expression, w: Expression, h: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = bytes
  override def second: Expression = w
  override def third: Expression = h
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any, ww: Any, hh: Any): Any =
    Raster.sobelEnergy(b.asInstanceOf[Array[Byte]],
      ww.asInstanceOf[Int], hh.asInstanceOf[Int])
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  override def prettyName: String = "sobel_energy"
}

/** `SOBEL_SECTORS(bytes, w, h) -> array<int>` the 36 interior edge-
  * orientation sectors ([[Raster.sobelSectors]] — the HOG-lite
  * descriptor; explode + histogram downstream). */
case class SobelSectors(bytes: Expression, w: Expression, h: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = bytes
  override def second: Expression = w
  override def third: Expression = h
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any, ww: Any, hh: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Raster.sobelSectors(b.asInstanceOf[Array[Byte]],
        ww.asInstanceOf[Int], hh.asInstanceOf[Int]))
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  override def prettyName: String = "sobel_sectors"
}

/** `LBP_CODES(bytes, w, h) -> array<int>` the 36 interior local-binary-
  * pattern codes of a decoded raster ([[Raster.lbpCodes]] — the texture
  * descriptor; explode + histogram downstream). */
case class LbpCodes(bytes: Expression, w: Expression, h: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = bytes
  override def second: Expression = w
  override def third: Expression = h
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any, ww: Any, hh: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Raster.lbpCodes(b.asInstanceOf[Array[Byte]],
        ww.asInstanceOf[Int], hh.asInstanceOf[Int]))
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  override def prettyName: String = "lbp_codes"
}

/** `RASTER_CHK(bytes) -> Long` position-weighted checksum `Σ (i+1)·b[i]`
  * ([[Raster.chk]]) — the layout-sensitive fingerprint that proves a
  * geometric transform (rotation, flip, crop) produced exactly the bytes
  * it should, where any permutation-invariant stat would be blind. Real
  * `doGenCode`: it sits in the same scan projection as the transform. */
case class RasterChk(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Raster.chk(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.multimodal.Raster.chk($b)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "raster_chk"
}

/** `BYTE_AT(bytes, i) -> Int` unsigned byte at index `i` (0 out of range —
  * total, see [[Raster.byteAt]]). Unlike the blob producers above this IS
  * on an aggregation hot path (the mosaic pyramid extracts 48 bytes per row
  * inside one aggregate), so it gets real `doGenCode` — the extraction
  * stays inside the WholeStageCodegen span feeding the sums. */
case class ByteAt(bytes: Expression, idx: Expression) extends BinaryExpression {
  override def left: Expression = bytes
  override def right: Expression = idx
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any, i: Any): Any =
    Raster.byteAt(b.asInstanceOf[Array[Byte]], i.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, i) => s"graft.multimodal.Raster.byteAt($b, $i)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "byte_at"
}

object functions {
  private def col(e: Expression): Column = GraftBridge.column(e)
  private def expr(c: Column): Expression = GraftBridge.expression(c)

  def byte_at(bytes: Column, i: Column): Column =
    col(ByteAt(expr(bytes), expr(i)))

  def raster_chk(bytes: Column): Column = col(RasterChk(expr(bytes)))

  def dhash56(bytes: Column, w: Column, h: Column): Column =
    col(DHash56(expr(bytes), expr(w), expr(h)))

  def sobel_energy(bytes: Column, w: Column, h: Column): Column =
    col(SobelEnergy(expr(bytes), expr(w), expr(h)))

  def lbp_codes(bytes: Column, w: Column, h: Column): Column =
    col(LbpCodes(expr(bytes), expr(w), expr(h)))

  def sobel_sectors(bytes: Column, w: Column, h: Column): Column =
    col(SobelSectors(expr(bytes), expr(w), expr(h)))

  def raster_hflip(bytes: Column, w: Column, h: Column): Column =
    col(RasterHFlip(expr(bytes), expr(w), expr(h)))
  def raster_rot90(bytes: Column, w: Column, h: Column): Column =
    col(RasterRot90(expr(bytes), expr(w), expr(h)))

  def synthetic_video(k: Column, w: Column, h: Column, nFrames: Column): Column =
    col(SyntheticVideo(expr(k), expr(w), expr(h), expr(nFrames)))
  def frame_sample(video: Column, frameBytes: Column, stride: Column): Column =
    col(FrameSample(expr(video), expr(frameBytes), expr(stride)))

  def synthetic_raster(k: Column, w: Column, h: Column, fmt: Column): Column =
    col(SyntheticRaster(expr(k), expr(w), expr(h), expr(fmt)))
  def raster_stats(bytes: Column): Column = col(RasterStats(expr(bytes)))
  def raster_hist4(bytes: Column): Column = col(RasterHist4(expr(bytes)))
  def raster_channel_sums(bytes: Column): Column =
    col(RasterChannelSums(expr(bytes)))
  def psnr_db(a: Column, b: Column): Column = col(PsnrDb(expr(a), expr(b)))
  def raster_decode(bytes: Column, fmt: Column): Column =
    col(RasterDecode(expr(bytes), expr(fmt)))
  def raster_resize(bytes: Column, w: Column, h: Column, ow: Column, oh: Column): Column =
    col(RasterResize(expr(bytes), expr(w), expr(h), expr(ow), expr(oh)))
  def raster_crop(bytes: Column, w: Column, h: Column, x0: Column, y0: Column,
                  cw: Column, ch: Column): Column =
    col(RasterCrop(expr(bytes), expr(w), expr(h), expr(x0), expr(y0),
      expr(cw), expr(ch)))
}
