package graft

import org.apache.spark.sql.functions._

import graft.agg.Kmv
import graft.sources.Images

/** KMV sketch: the MERGE LEMMA (partial sketches combine losslessly —
  * the property that makes it a distributed aggregate), exactness below
  * k, and the estimator's accuracy envelope. */
class KmvSpec extends SparkFunSuite {

  private val K = 16

  private def cellHash(df: org.apache.spark.sql.DataFrame) =
    df.select(
      graft.geo.functions.cell_encode(col("lat"), col("lon"), 2).as("cell"),
      conv(substring(md5(col("image_id")), 1, 8), 16, 10).cast("long").as("h"))

  test("merge lemma: sketch of union == sketch of merged partial sketches") {
    val imgs = Images.images(spark, SparkSpec.Sf)
    val a = cellHash(imgs.filter(col("k") % 2 === 0))
    val b = cellHash(imgs.filter(col("k") % 2 =!= 0))
    val direct = Kmv.sketchOf(a.unionByName(b), K).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val merged = Kmv.estimate(
      Kmv.kept(Kmv.kept(a, K).unionByName(Kmv.kept(b, K)), K), K).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(direct.nonEmpty && merged == direct)
  }

  test("exact below k; estimate within the KMV error envelope above it") {
    val imgs = Images.images(spark, SparkSpec.Sf)
    val truth = cellHash(imgs).distinct().groupBy("cell").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sk = Kmv.sketchOf(cellHash(imgs), K).collect()
    assert(sk.nonEmpty)
    var sawEstimate = false
    sk.foreach { r =>
      val (cell, nKept, est) = (r.getLong(0), r.getLong(1), r.getLong(3))
      if (nKept < K) assert(est == truth(cell)) // exact regime
      else {
        sawEstimate = true
        // stderr ~ 1/sqrt(k-2) ≈ 27% at k=16; allow ~3 sigma
        val rel = math.abs(est.toDouble - truth(cell)) / truth(cell)
        assert(rel < 0.8, s"cell $cell: est $est vs true ${truth(cell)}")
      }
    }
    assert(sawEstimate, "fixture should exercise the estimating regime")
  }
}
