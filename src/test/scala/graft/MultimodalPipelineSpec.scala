package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{functions => M, Raster}
import graft.sources.Images

/** The Spark-side multimodal plumbing (decode -> fidelity / resize -> stats
  * expressions over the binary column) — the north-rule per-row invariant
  * end-to-end (PSNR >= 40 dB + caption equality, BASELINE.json input_hint). */
class MultimodalPipelineSpec extends SparkFunSuite {

  private def withBytes = Images.imagesWithBytes(spark, SparkSpec.Sf)

  test("every row passes the fidelity invariant (psnr + caption + length)") {
    val checked = withBytes
      .withColumn("px", M.raster_decode(col("bytes"), col("fmt")))
      .withColumn("truth",
        M.synthetic_raster(col("k"), col("w"), col("h"), lit("raw")))
      .withColumn("psnr", M.psnr_db(col("px"), col("truth")))
    val n = checked.count()
    assert(n > 0)
    assert(checked.filter(col("psnr") < 40.0).count() == 0)
    // lossy rows really are lossy (noise applied), raw rows are lossless
    assert(checked.filter(col("fmt") === "lossy" && col("psnr") === 99.0).count() == 0)
    assert(checked.filter(col("fmt") === "raw" && col("psnr") =!= 99.0).count() == 0)
  }

  test("thumbnail expression matches the driver-side kernel") {
    val row = withBytes.select(col("k"), col("w"), col("h"), col("fmt"),
        M.raster_resize(M.raster_decode(col("bytes"), col("fmt")),
          col("w"), col("h"), lit(4), lit(4)).as("thumb"))
      .orderBy(col("k")).first()
    val want = Raster.resize(
      Raster.decode(Raster.storedBytes(row.getLong(0), row.getInt(1),
        row.getInt(2), row.getString(3)), row.getString(3)),
      row.getInt(1), row.getInt(2), 4, 4)
    assert(row.getAs[Array[Byte]]("thumb").sameElements(want))
  }

  test("patch sample (crop) matches the driver-side kernel") {
    val row = withBytes.filter(col("w") >= 6 && col("h") >= 6)
      .select(col("k"), col("w"), col("h"), col("fmt"),
        M.raster_crop(M.raster_decode(col("bytes"), col("fmt")),
          col("w"), col("h"), lit(1), lit(2), lit(4), lit(3)).as("patch"))
      .orderBy(col("k")).first()
    val want = Raster.crop(
      Raster.decode(Raster.storedBytes(row.getLong(0), row.getInt(1),
        row.getInt(2), row.getString(3)), row.getString(3)),
      row.getInt(1), row.getInt(2), 1, 2, 4, 3)
    assert(row.getAs[Array[Byte]]("patch").sameElements(want))
    assert(want.length == 4 * 3 * 3)
  }

  test("raster_stats mean/min/max agree with the kernel") {
    val row = withBytes
      .withColumn("st", M.raster_stats(col("bytes")))
      .select(col("k"), col("w"), col("h"), col("fmt"),
        col("st.mean_px"), col("st.min_px"), col("st.max_px"), col("st.n_bytes"))
      .orderBy(col("k")).first()
    val bytes = Raster.storedBytes(row.getLong(0), row.getInt(1),
      row.getInt(2), row.getString(3))
    val (mean, mn, mx) = Raster.stats(bytes)
    assert(row.getDouble(4) == mean && row.getInt(5) == mn &&
      row.getInt(6) == mx && row.getInt(7) == bytes.length)
  }

  test("q_otsu_threshold: exact integer Otsu replay over the thumb kernel") {
    val got = Queries.queryMap("q_otsu_threshold")(spark, SparkSpec.Sf)
      .collect()
      .map(r => r.getAs[String]("image_id") ->
        (r.getAs[Long]("t_opt"), r.getAs[Long]("w0"),
          r.getAs[Long]("score_q")))
      .toMap
    assert(got.nonEmpty)
    val thumbs = withBytes.select(col("image_id"),
        M.raster_resize(M.raster_decode(col("bytes"), col("fmt")),
          col("w"), col("h"), lit(4), lit(4)).as("thumb"))
      .collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]]("thumb"))
    assert(thumbs.length >= got.size)
    val truth = thumbs.flatMap { case (id, tb) =>
      val grays = (0 until 16).map(p =>
        ((tb(3 * p) & 0xff) + (tb(3 * p + 1) & 0xff) +
          (tb(3 * p + 2) & 0xff)).toLong)
      val hist = grays.groupBy(identity).view
        .mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val sTot = grays.sum
      var w0 = 0L; var s0 = 0L
      val cands = hist.flatMap { case (g, cnt) =>
        w0 += cnt; s0 += g * cnt
        if (w0 < 16) {
          val num = s0 * (16 - w0) - (sTot - s0) * w0
          Some((g, w0, num * num * 10000L / (w0 * (16 - w0))))
        } else None
      }
      if (cands.isEmpty) None
      else {
        val best = cands.minBy { case (g, _, sc) => (-sc, g) }
        Some(id -> (best._1, best._2, best._3))
      }
    }.toMap
    assert(got === truth)
    // the threshold really separates: class-0 max <= t < class-1 min holds
    // by construction (t is a member gray value with w0 rows <= it)
    assert(got.values.forall { case (t, w0, _) => t >= 0 && w0 >= 1 && w0 <= 15 })
  }

  test("q_rle_runs: exact run-length replay over the 8x8 thumb kernel") {
    val got = Queries.queryMap("q_rle_runs")(spark, SparkSpec.Sf)
      .collect()
      .map(r => r.getAs[String]("image_id") ->
        (r.getAs[Long]("n_runs"), r.getAs[Long]("max_run"),
          r.getAs[Long]("n_vals")))
      .toMap
    assert(got.nonEmpty)
    val truth = withBytes.select(col("image_id"),
        M.raster_resize(M.raster_decode(col("bytes"), col("fmt")),
          col("w"), col("h"), lit(8), lit(8)).as("thumb"))
      .collect()
      .map { r =>
        val tb = r.getAs[Array[Byte]]("thumb")
        val g = (0 until 64).map(p =>
          ((tb(3 * p) & 0xff) + (tb(3 * p + 1) & 0xff) +
            (tb(3 * p + 2) & 0xff)).toLong)
        // run lengths of the gray sequence via a simple fold
        val runs = g.foldLeft(List.empty[(Long, Long)]) {
          case ((v, len) :: tl, x) if v == x => (v, len + 1) :: tl
          case (acc, x) => (x, 1L) :: acc
        }
        r.getString(0) ->
          (runs.size.toLong, runs.map(_._2).max, g.distinct.size.toLong)
      }.toMap
    assert(got === truth)
    // structural bounds: 1 <= n_vals <= n_runs <= 64, max_run <= 64
    assert(got.values.forall { case (nr, mx, nv) =>
      nv >= 1 && nv <= nr && nr <= 64 && mx >= 1 && mx <= 64 })
  }
}
