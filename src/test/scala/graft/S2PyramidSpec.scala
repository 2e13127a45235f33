package graft

import org.apache.spark.sql.functions._

import graft.geo.{functions => G, S2Cell, S2Tiling}
import graft.operators.{Retrieval, TilePyramid}
import graft.sources.{Fixtures, Images}

/** The tile pyramid over the S2-style index: the rollup shape is
  * index-agnostic (groupBy(parent-of-cell)), so swapping the cell function
  * must conserve totals and respect containment. */
class S2PyramidSpec extends SparkFunSuite {

  test("s2 rollup chain conserves counts and parents contain children") {
    val imgs = Images.images(spark, SparkSpec.Sf)
    val leaf = imgs
      .withColumn("cell", G.s2_encode(col("lat"), col("lon"), 12))
      .groupBy(col("cell")).agg(count(lit(1)).as("cnt"))
    val up = leaf
      .withColumn("parent", G.s2_parent_at(col("cell"), 10))
      .groupBy(col("parent")).agg(sum(col("cnt")).as("cnt"))

    val total = imgs.count()
    assert(leaf.agg(sum(col("cnt"))).first().getLong(0) == total)
    assert(up.agg(sum(col("cnt"))).first().getLong(0) == total)
    assert(up.count() <= leaf.count())

    // spot containment: every leaf cell's level-10 parent contains it
    leaf.select(col("cell")).limit(200).collect().foreach { r =>
      val c = r.getLong(0)
      assert(S2Cell.contains(S2Cell.parentAt(c, 10), c))
      assert(S2Cell.level(c) == 12)
    }
  }

  test("TilePyramid.build under the S2 strategy: totals, levels, linkage") {
    val imgs = Images.images(spark, SparkSpec.Sf)
    val (pyr, counts) = TilePyramid.build(imgs, 6, 10, S2Tiling)
    assert(counts.keySet == (6 to 10).toSet)
    val total = imgs.count()
    val m = TilePyramid.levelMetrics(pyr).collect()
    assert(m.map(_.getAs[Long]("n_images")).toSet == Set(total))
    // engine rollup (parentOnceCol bit algebra) == independent parentAt
    val l9 = pyr.filter(col("res") === 9).select("cell", "cnt").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val l8 = pyr.filter(col("res") === 8).select("cell", "cnt").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val rolled = l9.groupBy { case (c, _) => S2Cell.parentAt(c, 8) }
      .view.mapValues(_.map(_._2).sum).toMap
    assert(rolled == l8)
    pyr.filter(col("res") === 9).select("cell").limit(100).collect()
      .foreach(r => assert(S2Cell.level(r.getLong(0)) == 9))
  }

  test("descent retrieval runs on the S2 pyramid and equals recomputation") {
    val imgs = Images.images(spark, SparkSpec.Sf)
    val points = imgs.select(col("lat"), col("lon")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    def tilesAt(lvl: Int) =
      points.groupBy(p => S2Cell.fromLatLng(p._1, p._2, lvl)).map { case (c, ps) =>
        c -> (ps.map(_._1).min, ps.map(_._1).max, ps.map(_._2).min, ps.map(_._2).max)
      }
    def dist(b: (Double, Double, Double, Double), qla: Double, qlo: Double) = {
      val cla = (b._1 + b._2) / 2.0; val clo = (b._3 + b._4) / 2.0
      (cla - qla) * (cla - qla) + (clo - qlo) * (clo - qlo)
    }
    val K = 3
    val levels = (5 to 8).map(r => r -> tilesAt(r)).toMap
    val want = scala.collection.mutable.Set.empty[(Int, Int, Long, Int)]
    Fixtures.knnQueries(spark).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .foreach { case (qid, qla, qlo) =>
        var sel = levels(5).toSeq.map { case (c, b) => (dist(b, qla, qlo), c) }
          .sortBy(identity).take(K).map(_._2)
        sel.zipWithIndex.foreach { case (c, i) => want += ((qid, 5, c, i + 1)) }
        (6 to 8).foreach { lvl =>
          val parents = sel.toSet
          sel = levels(lvl).toSeq
            .filter { case (c, _) => parents.contains(S2Cell.parentAt(c, lvl - 1)) }
            .map { case (c, b) => (dist(b, qla, qlo), c) }
            .sortBy(identity).take(K).map(_._2)
          sel.zipWithIndex.foreach { case (c, i) => want += ((qid, lvl, c, i + 1)) }
        }
      }
    val got = Retrieval.descendTopK(
      TilePyramid.pyramidLazy(imgs, 5, 8, S2Tiling),
      Fixtures.knnQueries(spark), 5, 8, K, S2Tiling)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(5))).toSet
    assert(got == want.toSet)
  }
}
