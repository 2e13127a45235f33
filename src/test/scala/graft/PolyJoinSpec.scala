package graft

import org.apache.spark.sql.DataFrame

import graft.operators.SpatialJoin
import graft.sources.Fixtures
import graft.sources.Fixtures.Poly

/** Polygon↔polygon overlay join: the cover-cell prefilter + emit-once
  * filter must reproduce the brute cross-join + refine exactly, each pair
  * exactly once; containment-only overlaps (no edge crossing) must be
  * found in both directions; boundary-only contact is excluded. */
class PolyJoinSpec extends SparkFunSuite {

  private def pairs(df: DataFrame): Seq[(String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1))).toSeq

  test("cover-prefiltered join == brute cross join + refine; emit-once") {
    val a = Fixtures.polys
    val b = Fixtures.benchPolys(96)
    val got = pairs(SpatialJoin.polyJoin(spark, a, b))
    val brute = pairs(SpatialJoin.polyJoinBrute(spark, a, b))
    assert(got.toSet == brute.toSet && brute.nonEmpty,
      s"prefilter must lose/invent nothing (${got.size} vs ${brute.size})")
    assert(got.size == got.distinct.size,
      "emit-once: each pair must be generated exactly once")
  }

  private def square(id: String, clat: Double, clon: Double, h: Double): Poly =
    Poly(id,
      Array(clat - h, clat - h, clat + h, clat + h),
      Array(clon - h, clon + h, clon + h, clon - h), "rect")

  test("containment-only overlaps are found in both directions") {
    val big = square("big", 10.0, 10.0, 5.0)
    val small = square("small", 10.1, 10.1, 0.5) // strictly inside big
    // A-side small inside B-side big: witness vertex of A in B
    assert(pairs(SpatialJoin.polyJoin(spark, Seq(small), Seq(big))) ==
      Seq(("small", "big")))
    // A-side big containing B-side small: witness vertex of B in A
    assert(pairs(SpatialJoin.polyJoin(spark, Seq(big), Seq(small))) ==
      Seq(("big", "small")))
  }

  test("boundary-only contact and disjoint layers emit nothing") {
    val left = square("left", 0.0, 0.0, 1.0)
    val touch = square("touch", 0.0, 2.0, 1.0)   // shares the lon=1 edge
    val far = square("far", 0.0, 50.0, 1.0)
    assert(pairs(SpatialJoin.polyJoin(spark, Seq(left), Seq(touch, far))).isEmpty)
  }

  private def bar(id: String, hlat: Double, hlon: Double): Poly =
    Poly(id,
      Array(-hlat, -hlat, hlat, hlat),
      Array(-hlon, hlon, hlon, -hlon), "rect")

  test("plus-sign overlap (every vertex outside the other) crosses edges") {
    // two thin bars crossing at the origin: NO vertex of either lies in
    // the other, so only the proper edge-crossing branch can find it
    val hbar = bar("hbar", 0.1, 5.0)
    val vbar = bar("vbar", 5.0, 0.1)
    assert(pairs(SpatialJoin.polyJoin(spark, Seq(hbar), Seq(vbar))) ==
      Seq(("hbar", "vbar")))
  }

  test("poly dissolve: per-cell union rollup matches a driver ray-cast " +
    "replay over the combined two-layer set (q_poly_dissolve)") {
    import org.apache.spark.sql.functions._
    val layer = Fixtures.polys ++ Fixtures.benchPolys(16)
    val got = SparkEntry.queries("q_poly_dissolve")(spark, SparkSpec.Sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val pts = graft.sources.Images.images(spark, SparkSpec.Sf)
      .select(col("lat"), col("lon")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val truth = pts.flatMap { case (lat, lon) =>
      val k = layer.count(p =>
        graft.geo.GridCell.pointInPolygon(lat, lon, p.lats, p.lons))
      if (k == 0) None
      else Some(graft.geo.GridCell.encode(lat, lon, 5) -> k.toLong)
    }.groupBy(_._1).map { case (cell, ks) =>
      cell -> ((ks.length.toLong, ks.map(_._2).sum,
        ks.count(_._2 >= 2).toLong, ks.map(_._2).max))
    }
    assert(got === truth)
    assert(truth.values.exists(_._3 > 0)) // the layers genuinely overlap
  }
}
