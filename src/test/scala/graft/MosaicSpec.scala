package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.geo.{functions => G}
import graft.multimodal.{functions => M, Raster}
import graft.operators.MosaicPyramid
import graft.plans.GraftOptimizations
import graft.sources.Images

/** Mosaic pyramid (operators/MosaicPyramid.scala) + the byte_at kernel +
  * the density-raster clip semantics. The cross-engine proof lives in the
  * driver gate (q_raster_pyramid / q_density_raster oracles); these pin
  * the in-engine algebra: rollup associativity, kernel-vs-driver parity,
  * SQL-dialect parity, and the 8-bit clip on crafted skew. */
class MosaicSpec extends SparkFunSuite {

  private def tinyWithBytes =
    Images.imagesTiny(spark).withColumn("bytes",
      M.synthetic_raster(col("k"), col("w"), col("h"), col("fmt")))

  test("byteAt: unsigned read, total out-of-range -> 0") {
    val b = Array[Byte](0, -1, 127, -128)
    assert(Raster.byteAt(b, 0) == 0)
    assert(Raster.byteAt(b, 1) == 255)
    assert(Raster.byteAt(b, 2) == 127)
    assert(Raster.byteAt(b, 3) == 128)
    assert(Raster.byteAt(b, -1) == 0)
    assert(Raster.byteAt(b, 4) == 0)
  }

  test("ByteAt expression == driver-side decode over the tiny fixture") {
    val got = tinyWithBytes
      .select(col("k"), col("w"), col("h"), col("fmt"),
        M.byte_at(col("bytes"), lit(0)).as("b0"),
        M.byte_at(col("bytes"), col("w") * col("h") * 3 - 1).as("bl"),
        M.byte_at(col("bytes"), col("w") * col("h") * 3).as("oob"))
      .collect()
    got.foreach { r =>
      val bytes = Raster.storedBytes(r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3))
      assert(r.getInt(4) == (bytes(0) & 0xff))
      assert(r.getInt(5) == (bytes(bytes.length - 1) & 0xff))
      assert(r.getInt(6) == 0)
    }
  }

  test("byte_at SQL function == Column API") {
    GraftOptimizations.install(spark)
    tinyWithBytes.createOrReplaceTempView("mosaic_imgs")
    val viaSql = spark.sql(
      "SELECT k, byte_at(bytes, 5) AS b FROM mosaic_imgs").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaCol = tinyWithBytes
      .select(col("k"), M.byte_at(col("bytes"), lit(5)).as("b")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaSql == viaCol && viaSql.nonEmpty)
  }

  test("mosaic rollup is exactly associative: levelAt == direct leaf grouping") {
    val imgs = tinyWithBytes
    def key(rows: Array[Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    val rolled = key(MosaicPyramid.summarize(
      MosaicPyramid.levelAt(imgs, leafRes = 9, outRes = 5)).collect())
    val direct = key(MosaicPyramid.summarize(
      MosaicPyramid.leafMosaics(imgs, 5)).collect())
    assert(rolled == direct && rolled.nonEmpty)
  }

  test("mosaic state: n_imgs and channel sums match a driver-side replay") {
    val one = tinyWithBytes.filter(col("k") === 110L) // first tiny key
    val st = MosaicPyramid.summarize(MosaicPyramid.leafMosaics(one, 7))
      .collect()
    assert(st.length == 1)
    val r = st.head
    val row = one.select("k", "w", "h", "fmt").collect().head
    val thumb = Raster.resize(
      Raster.decode(Raster.storedBytes(row.getLong(0), row.getInt(1),
        row.getInt(2), row.getString(3)), row.getString(3)),
      row.getInt(1), row.getInt(2), 4, 4)
    def ch(c: Int) = thumb.indices.filter(_ % 3 == c)
      .map(i => (thumb(i) & 0xff).toLong).sum
    val chk = thumb.indices.map(i => (i + 1L) * (thumb(i) & 0xff)).sum
    assert(r.getLong(1) == 1L)
    assert(r.getLong(2) == ch(0) && r.getLong(3) == ch(1) &&
      r.getLong(4) == ch(2))
    assert(r.getLong(5) == chk)
  }

  test("focal stats: scatter-ring convolution == hand-computed 3x3 sums") {
    import spark.implicits._
    // Three occupied pixels: two horizontally adjacent at res 7 (y const),
    // one isolated. Res-7 pixel width is 360/128 = 2.8125 deg of lon.
    val pts = Seq.fill(5)((0.1, 0.1)) ++ Seq.fill(3)((0.1, 3.0)) ++
      Seq((40.0, 100.0))
    val g = pts.toDF("lat", "lon")
      .withColumn("cell", G.cell_encode(col("lat"), col("lon"), 7))
      .groupBy("cell").agg(count(lit(1)).as("cnt"))
    val out = g.select(col("cell").as("src"), col("cnt"),
        explode(G.cell_ring(col("cell"), lit(1))).as("cell"))
      .groupBy("cell")
      .agg(sum(col("cnt")).as("focal_sum"),
        count(lit(1)).as("nnz_nbrs"),
        sum(when(col("src") === col("cell"), col("cnt"))
          .otherwise(lit(0L))).as("center_cnt"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val a = graft.geo.GridCell.encode(0.1, 0.1, 7)
    val b = graft.geo.GridCell.encode(0.1, 3.0, 7)
    val far = graft.geo.GridCell.encode(40.0, 100.0, 7)
    assert(b == a + 1) // horizontally adjacent
    // Occupied centers see their neighbor's mass; each occupied cell also
    // lights its 3x3 halo. Halo count: cells adjacent to a or b (union of
    // two overlapping 3x3 blocks = 12 cells) + far's own 9.
    assert(out(a) == ((8L, 2L, 5L)))
    assert(out(b) == ((8L, 2L, 3L)))
    assert(out(far) == ((1L, 1L, 1L)))
    assert(out.size == 12 + 9)
    // A pure-halo pixel above the pair sees both
    val halo = out(graft.geo.GridCell.pack(7,
      graft.geo.GridCell.xOf(a), graft.geo.GridCell.yOf(a) + 1))
    assert(halo == ((8L, 2L, 0L)))
  }

  test("IDW surface: 5x5 inverse-d2 scatter == hand-computed weights") {
    import spark.implicits._
    // Two horizontally adjacent occupied res-7 pixels (5 and 3 points,
    // value 2 per point), one isolated far pixel. Weights are 3600/d2.
    val pts = Seq.fill(5)((0.1, 0.1)) ++ Seq.fill(3)((0.1, 3.0)) ++
      Seq((40.0, 100.0))
    val g = pts.toDF("lat", "lon")
      .withColumn("cell", G.cell_encode(col("lat"), col("lon"), 7))
      .groupBy("cell").agg(count(lit(1)).as("cnt"),
        sum(lit(2L)).as("v_sum"))
    val n = 128L
    def xOf(c: org.apache.spark.sql.Column) = c.bitwiseAND(lit(n - 1))
    def yOf(c: org.apache.spark.sql.Column) =
      shiftright(c, 7).bitwiseAND(lit(n - 1))
    val rawDx = abs(xOf(col("src")) - xOf(col("cell")))
    val dx = least(rawDx, lit(n) - rawDx)
    val dy = abs(yOf(col("src")) - yOf(col("cell")))
    val out = g.select(col("cell").as("src"), col("cnt"), col("v_sum"),
        explode(G.cell_ring(col("cell"), lit(2))).as("cell"))
      .withColumn("d2", dx * dx + dy * dy)
      .where(col("d2") > 0)
      .withColumn("wq", (lit(3600L) / col("d2")).cast("long"))
      .groupBy("cell")
      .agg(sum(col("wq") * col("v_sum")).as("idw_num"),
        sum(col("wq") * col("cnt")).as("idw_den"),
        count(lit(1)).as("n_nbrs"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val a = graft.geo.GridCell.encode(0.1, 0.1, 7)
    val b = graft.geo.GridCell.encode(0.1, 3.0, 7)
    val far = graft.geo.GridCell.encode(40.0, 100.0, 7)
    assert(b == a + 1)
    // Leave-one-out: an occupied pixel sees only its NEIGHBOR's mass.
    assert(out(a) == ((3600L * 6, 3600L * 3, 1L))) // from b at d2=1
    assert(out(b) == ((3600L * 10, 3600L * 5, 1L))) // from a at d2=1
    // Halo pixel left of a: a at d2=1 (w 3600), b at d2=4 (w 900).
    val halo = graft.geo.GridCell.pack(7,
      graft.geo.GridCell.xOf(a) - 1, graft.geo.GridCell.yOf(a))
    assert(out(halo) == ((3600L * 10 + 900L * 6, 3600L * 5 + 900L * 3, 2L)))
    // The isolated pixel has NO neighbor -> absent (undefined estimate);
    // its 24-cell halo is filled. Output = 5x6 union block + 24.
    assert(!out.contains(far))
    assert(out.size == 30 + 24)
    // Every estimate over the constant-value-2 surface is exactly 2.
    out.values.foreach { case (num, den, _) => assert(num == 2 * den) }
  }

  test("density raster: 8-bit clip on crafted skew") {
    import spark.implicits._
    // 300 points in one res-7 subcell (clips to 255), 2 in a sibling
    // subcell of the SAME res-4 tile, 1 far away.
    val pts = (1 to 300).map(_ => (10.1, 10.1)) ++
      Seq((10.1, 14.0), (10.1, 14.0), (-50.0, -120.0))
    val df = pts.toDF("lat", "lon")
      .withColumn("c", G.cell_encode(col("lat"), col("lon"), 7))
      .groupBy(col("c")).agg(count(lit(1)).as("cnt"))
      .withColumn("cell", G.cell_parent_at(col("c"), 4))
      .groupBy(col("cell"))
      .agg(sum(col("cnt")).as("n_points"), count(lit(1)).as("nnz_px"),
        max(col("cnt")).as("max_px"),
        sum(least(col("cnt"), lit(255L))).as("px_mass"))
    val byTile = df.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(byTile.size == 2)
    val hot = byTile(graft.geo.GridCell.encode(10.1, 10.1, 4))
    assert(hot == ((302L, 2L, 300L, 257L))) // 255 clipped + 2
    val cold = byTile(graft.geo.GridCell.encode(-50.0, -120.0, 4))
    assert(cold == ((1L, 1L, 1L, 1L)))
  }
}
