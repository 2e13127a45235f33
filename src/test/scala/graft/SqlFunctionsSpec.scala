package graft

import org.apache.spark.sql.functions._

import graft.geo.{functions => G}
import graft.multimodal.{functions => M}
import graft.plans.GraftOptimizations
import graft.sources.{Fixtures, Images}

/** The SQL-dialect surface (plans/GraftFunctions.scala): every registered
  * function must return EXACTLY what its Column-API twin returns, and a
  * pure-SQL spatial query must pick up the same optimizer rewrites as the
  * Column path (the two entry points share one engine). */
class SqlFunctionsSpec extends SparkFunSuite {

  private def ready(): Unit = {
    GraftOptimizations.install(spark)
    Images.imagesTiny(spark).createOrReplaceTempView("sqlfn_imgs")
  }

  test("geo functions: SQL output == Column API output") {
    ready()
    val viaSql = spark.sql(
      """SELECT image_id,
        |  cell_encode(lat, lon, 8) AS c8,
        |  cell_parent_at(cell_encode(lat, lon, 12), 6) AS p6,
        |  cell_encode_multi(lat, lon, 10, 12) AS multi,
        |  size(cell_ring(cell_encode(lat, lon, 8), 1)) AS ring_n,
        |  cell_zvalue(cell_encode(lat, lon, 12)) AS zv,
        |  cell_hvalue(cell_encode(lat, lon, 12)) AS hv,
        |  size(line_cells(cell_encode(lat, lon, 7),
        |    cell_encode(0.0D, 0.0D, 7))) AS lc,
        |  hex_encode(lat, lon, 8) AS hx,
        |  hex_parent_at(hex_encode(lat, lon, 12), 6) AS hxp,
        |  hex_parent_once(hex_encode(lat, lon, 8)) AS hxp1,
        |  size(hex_ring(hex_encode(lat, lon, 8), 2)) AS hxr,
        |  s2_encode(lat, lon, 10) AS s2,
        |  s2_level(s2_encode(lat, lon, 10)) AS s2l,
        |  s2_parent_at(s2_encode(lat, lon, 12), 8) AS s2p,
        |  size(s2_ring(s2_encode(lat, lon, 8), 1)) AS s2r,
        |  haversine_m(lat, lon, 0.0D, 0.0D) AS hm
        |FROM sqlfn_imgs""".stripMargin)
    val viaCol = Images.imagesTiny(spark).select(
      col("image_id"),
      G.cell_encode(col("lat"), col("lon"), 8).as("c8"),
      G.cell_parent_at(G.cell_encode(col("lat"), col("lon"), 12), 6).as("p6"),
      G.cell_encode_multi(col("lat"), col("lon"), 10, 12).as("multi"),
      size(G.cell_ring(G.cell_encode(col("lat"), col("lon"), 8), lit(1)))
        .as("ring_n"),
      G.cell_zvalue(G.cell_encode(col("lat"), col("lon"), 12)).as("zv"),
      G.cell_hvalue(G.cell_encode(col("lat"), col("lon"), 12)).as("hv"),
      size(G.line_cells(G.cell_encode(col("lat"), col("lon"), 7),
        G.cell_encode(lit(0.0), lit(0.0), 7))).as("lc"),
      G.hex_encode(col("lat"), col("lon"), 8).as("hx"),
      G.hex_parent_at(G.hex_encode(col("lat"), col("lon"), 12), 6).as("hxp"),
      G.hex_parent_once(G.hex_encode(col("lat"), col("lon"), 8)).as("hxp1"),
      size(G.hex_ring(G.hex_encode(col("lat"), col("lon"), 8), lit(2))).as("hxr"),
      G.s2_encode(col("lat"), col("lon"), 10).as("s2"),
      G.s2_level(G.s2_encode(col("lat"), col("lon"), 10)).as("s2l"),
      G.s2_parent_at(G.s2_encode(col("lat"), col("lon"), 12), 8).as("s2p"),
      size(G.s2_ring(G.s2_encode(col("lat"), col("lon"), 8), lit(1))).as("s2r"),
      G.haversine_m(col("lat"), col("lon"), lit(0.0), lit(0.0)).as("hm"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
    assert(viaSql.count() == 64)
  }

  test("text/similarity/multimodal functions: SQL == Column API") {
    ready()
    val viaSql = spark.sql(
      """SELECT image_id,
        |  simhash32(transform(split(caption, ' '), t -> xxhash64(t))) AS sh,
        |  vec_dot(array(CAST(lat AS DOUBLE), lon), array(lon, lat)) AS vd,
        |  raster_stats(raster_decode(
        |    synthetic_raster(k, w, h, fmt), fmt)).mean_px AS mp,
        |  raster_stats(raster_resize(
        |    synthetic_raster(k, w, h, 'raw'), w, h, 4, 4)).n_bytes AS nb,
        |  raster_stats(raster_crop(
        |    synthetic_raster(k, w, h, 'raw'), w, h, 1, 1, 4, 4)).n_bytes AS cb,
        |  psnr_db(synthetic_raster(k, w, h, fmt),
        |          synthetic_raster(k, w, h, 'raw')) AS ps,
        |  dhash56(synthetic_raster(k, w, h, 'raw'), w, h) AS dh,
        |  sobel_energy(synthetic_raster(k, w, h, 'raw'), w, h) AS se,
        |  dhash56(raster_hflip(synthetic_raster(k, w, h, 'raw'), w, h), w, h) AS hf,
        |  raster_stats(raster_rot90(synthetic_raster(k, w, h, 'raw'), w, h)).mean_px AS rt,
        |  length(synthetic_video(k, w, h, 4)) AS vl,
        |  size(frame_sample(synthetic_video(k, w, h, 4), w * h * 3, 2)) AS fs
        |FROM sqlfn_imgs""".stripMargin)
    val tiny = Images.imagesTiny(spark)
    val viaCol = tiny.select(
      col("image_id"),
      graft.text.functions.simhash32(
        expr("transform(split(caption, ' '), t -> xxhash64(t))")).as("sh"),
      graft.similarity.functions.vec_dot(
        array(col("lat").cast("double"), col("lon")),
        array(col("lon"), col("lat"))).as("vd"),
      M.raster_stats(M.raster_decode(
        M.synthetic_raster(col("k"), col("w"), col("h"), col("fmt")),
        col("fmt"))).getField("mean_px").as("mp"),
      M.raster_stats(M.raster_resize(
        M.synthetic_raster(col("k"), col("w"), col("h"), lit("raw")),
        col("w"), col("h"), lit(4), lit(4))).getField("n_bytes").as("nb"),
      M.raster_stats(M.raster_crop(
        M.synthetic_raster(col("k"), col("w"), col("h"), lit("raw")),
        col("w"), col("h"), lit(1), lit(1), lit(4), lit(4)))
        .getField("n_bytes").as("cb"),
      M.psnr_db(
        M.synthetic_raster(col("k"), col("w"), col("h"), col("fmt")),
        M.synthetic_raster(col("k"), col("w"), col("h"), lit("raw"))).as("ps"),
      M.dhash56(M.synthetic_raster(col("k"), col("w"), col("h"), lit("raw")),
        col("w"), col("h")).as("dh"),
      M.sobel_energy(
        M.synthetic_raster(col("k"), col("w"), col("h"), lit("raw")),
        col("w"), col("h")).as("se"),
      M.dhash56(M.raster_hflip(
        M.synthetic_raster(col("k"), col("w"), col("h"), lit("raw")),
        col("w"), col("h")), col("w"), col("h")).as("hf"),
      M.raster_stats(M.raster_rot90(
        M.synthetic_raster(col("k"), col("w"), col("h"), lit("raw")),
        col("w"), col("h"))).getField("mean_px").as("rt"),
      length(M.synthetic_video(col("k"), col("w"), col("h"), lit(4))).as("vl"),
      size(M.frame_sample(M.synthetic_video(col("k"), col("w"), col("h"), lit(4)),
        col("w") * col("h") * lit(3), lit(2))).as("fs"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("SQL poly_seg_cross == kernel on crossing and disjoint rings") {
    ready()
    def arr(xs: Array[Double]) = xs.mkString("array(", "D,", "D)")
    // thin bars crossing at the origin; the second pair is far disjoint
    val cases = Seq(
      (Array(-0.1, -0.1, 0.1, 0.1), Array(-5.0, 5.0, 5.0, -5.0),
        Array(-5.0, -5.0, 5.0, 5.0), Array(-0.1, 0.1, 0.1, -0.1), true),
      (Array(-0.1, -0.1, 0.1, 0.1), Array(-5.0, 5.0, 5.0, -5.0),
        Array(40.0, 40.0, 41.0, 41.0), Array(40.0, 41.0, 41.0, 40.0), false))
    cases.foreach { case (ala, alo, bla, blo, want) =>
      val got = spark.sql(
        s"SELECT poly_seg_cross(${arr(ala)}, ${arr(alo)}, " +
          s"${arr(bla)}, ${arr(blo)}) AS x").collect().head.getBoolean(0)
      assert(got == want)
      val gotKernel = graft.operators.SpatialJoin.polyJoinBrute(spark,
        Seq(Fixtures.Poly("a", ala, alo, "rect")),
        Seq(Fixtures.Poly("b", bla, blo, "rect"))).count() > 0
      assert(gotKernel == want)
    }
  }

  test("SQL point_in_poly filter picks up the bbox-prefilter rewrite") {
    ready()
    val poly = Fixtures.polys.find(_.kind == "convex").get
    val las = poly.lats.mkString("array(", "D,", "D)")
    val los = poly.lons.mkString("array(", "D,", "D)")
    val df = spark.sql(
      s"""SELECT image_id FROM sqlfn_imgs
         |WHERE point_in_poly(lat, lon, $las, $los)""".stripMargin)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("point_in_poly_refine"),
      s"bbox rule did not fire on the SQL path:\n$optimized")
    // parity vs driver-side ray casting
    val want = Images.imagesTiny(spark).collect().filter { r =>
      graft.geo.GridCell.pointInPolygon(
        r.getAs[Double]("lat"), r.getAs[Double]("lon"), poly.lats, poly.lons)
    }.map(_.getAs[String]("image_id")).toSet
    assert(df.collect().map(_.getString(0)).toSet == want)
  }

  test("SQL pip THETA JOIN is rewritten to the covering equi-join") {
    ready()
    Fixtures.polygonsDf(spark).createOrReplaceTempView("sqlfn_polys")
    val df = spark.sql(
      """SELECT i.image_id, p.poly_id
        |FROM sqlfn_imgs i JOIN sqlfn_polys p
        |  ON point_in_poly(i.lat, i.lon, p.lats, p.lons)""".stripMargin)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("poly_cover_cells"),
      s"pip-join rewrite did not fire on the SQL path:\n$optimized")
    // parity vs the hand-built prefilter+refine operator
    val want = graft.operators.SpatialJoin
      .pipJoin(Images.imagesTiny(spark), spark, Fixtures.polys)
      .select(col("image_id"), col("poly_id"))
    assert(df.exceptAll(want).isEmpty && want.exceptAll(df).isEmpty)
  }

  test("every registered function self-documents via DESCRIBE FUNCTION") {
    ready()
    graft.plans.GraftFunctions.all.foreach { case (id, info, _) =>
      assert(info.getUsage != null && info.getUsage.trim.nonEmpty,
        s"${id.funcName} registered without a usage doc")
      assert(info.getUsage.contains(id.funcName),
        s"${id.funcName} usage does not show its own signature")
    }
    val desc = spark.sql("DESCRIBE FUNCTION cell_encode")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("quadkey"), s"usage not surfaced by DESCRIBE:\n$desc")
  }

  test("arity errors carry the function name") {
    ready()
    val e = intercept[Exception](spark.sql("SELECT cell_encode(1.0D, 2.0D)"))
    assert(e.getMessage.contains("cell_encode"))
  }
}
