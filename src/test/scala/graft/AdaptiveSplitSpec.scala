package graft

import org.apache.spark.sql.functions._

import graft.geo.GridCell
import graft.operators.TilePyramid
import graft.sources.Images

/** Invariants of the variable-depth pyramid ([[TilePyramid.adaptiveSplit]]
  * ≙ cluster_utils.py:186-196 oversize re-clustering):
  *
  *  1. no emitted tile above the leaf bound is over budget;
  *  2. every emitted tile deeper than startRes has an over-budget parent
  *     (it was genuinely materialized by a split, not invented);
  *  3. the emitted tiles PARTITION the corpus — every point lies under
  *     exactly one emitted tile, and counts conserve.
  */
class AdaptiveSplitSpec extends SparkFunSuite {

  private val StartRes = 4
  private val MaxRes = 8
  private val Budget = 50L

  private lazy val points: Array[(Double, Double)] =
    Images.images(spark, SparkSpec.Sf).select(col("lat"), col("lon"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))

  test("adaptive split: budget bound, split provenance, exact cover") {
    val got = TilePyramid.adaptiveSplit(
      TilePyramid.pyramidLazySlim(
        Images.images(spark, SparkSpec.Sf), StartRes, MaxRes),
      StartRes, MaxRes, Budget)
      .select("res", "cell", "cnt").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))

    // driver-side ground-truth counts per level
    val cnt: Map[Int, Map[Long, Long]] = (StartRes to MaxRes).map { r =>
      r -> points.groupBy(p => GridCell.encode(p._1, p._2, r))
        .view.mapValues(_.length.toLong).toMap
    }.toMap

    // the fixture must exercise variable depth (several distinct levels)
    val depths = got.map(_._1).toSet
    assert(depths.size >= 2, s"fixture produced a single depth: $depths")

    got.foreach { case (r, c, n) =>
      assert(n == cnt(r)(c), s"tile ($r, $c) count mismatch")
      // 1. within budget unless forced leaf
      assert(n <= Budget || r == MaxRes, s"over-budget non-leaf tile ($r, $c)")
      // 2. deeper tiles exist only under an over-budget parent
      if (r > StartRes) {
        val p = GridCell.parent(c)
        assert(cnt(r - 1)(p) > Budget,
          s"tile ($r, $c) emitted under a within-budget parent")
      }
    }

    // 3. exact cover: each point lies under exactly ONE emitted tile
    val emitted = got.map(t => (t._1, t._2)).toSet
    points.foreach { case (la, lo) =>
      val hits = (StartRes to MaxRes)
        .count(r => emitted((r, GridCell.encode(la, lo, r))))
      assert(hits == 1, s"point ($la, $lo) covered $hits times")
    }
    assert(got.map(_._3).sum == points.length.toLong)
  }
}
