package graft

import org.apache.spark.sql.functions._

import graft.geo.GridCell
import graft.operators.{Retrieval, TilePyramid}
import graft.sources.{Fixtures, Images}

/** Pyramid retrieval vs an independent driver-side recomputation (plain
  * Scala, same IEEE-754 op order as the engine's center-distance column,
  * so doubles compare with ==). Pins both reference semantics:
  * per-level top-k descent into children-of-selected, and all-level
  * budgeted collapse ranking. */
class RetrievalSpec extends SparkFunSuite {

  private val K = 3
  private val CollapseK = 10
  private val CollapseBudget = 400L

  private case class Tile(cell: Long, res: Int, cnt: Long,
                          latMin: Double, latMax: Double,
                          lonMin: Double, lonMax: Double)

  private lazy val points: Array[(Double, Double)] =
    Images.images(spark, SparkSpec.Sf).select(col("lat"), col("lon"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))

  private def tilesAt(res: Int): Map[Long, Tile] =
    points.groupBy(p => GridCell.encode(p._1, p._2, res)).map { case (c, ps) =>
      c -> Tile(c, res, ps.length,
        ps.map(_._1).min, ps.map(_._1).max, ps.map(_._2).min, ps.map(_._2).max)
    }

  private def dist(t: Tile, qlat: Double, qlon: Double): Double = {
    val clat = (t.latMin + t.latMax) / 2.0
    val clon = (t.lonMin + t.lonMax) / 2.0
    (clat - qlat) * (clat - qlat) + (clon - qlon) * (clon - qlon)
  }

  private def topK(ts: Iterable[Tile], qlat: Double, qlon: Double, k: Int) =
    ts.toSeq.map(t => (t, dist(t, qlat, qlon)))
      .sortBy { case (t, d) => (d, t.cell) }.take(k)

  private lazy val queries: Array[(Int, Double, Double)] =
    Fixtures.knnQueries(spark).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))

  test("descendTopK equals driver-side per-level descent exactly") {
    val levels = (4 to 8).map(r => r -> tilesAt(r)).toMap
    val want = scala.collection.mutable.Set.empty[(Int, Int, Long, Int, Double)]
    queries.foreach { case (qid, qlat, qlon) =>
      var sel = topK(levels(4).values, qlat, qlon, K)
      sel.zipWithIndex.foreach { case ((t, d), i) =>
        want += ((qid, 4, t.cell, i + 1, d)) }
      (5 to 8).foreach { r =>
        val parents = sel.map(_._1.cell).toSet
        val cand = levels(r).values
          .filter(t => parents.contains(GridCell.parentAt(t.cell, r - 1)))
        sel = topK(cand, qlat, qlon, K)
        sel.zipWithIndex.foreach { case ((t, d), i) =>
          want += ((qid, r, t.cell, i + 1, d)) }
      }
    }
    val got = Retrieval.descendTopK(
      TilePyramid.pyramidLazy(Images.images(spark, SparkSpec.Sf), 4, 8),
      Fixtures.knnQueries(spark), 4, 8, K)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(5),
        r.getDouble(4))).toSet
    assert(got == want.toSet)
  }

  test("collapseTopK equals driver-side all-level budgeted ranking exactly") {
    val all = (4 to 7).flatMap(r => tilesAt(r).values)
    val want = scala.collection.mutable.Set.empty[(Int, Int, Long, Int, Double)]
    queries.foreach { case (qid, qlat, qlon) =>
      val ranked = topK(all, qlat, qlon, CollapseK)
      var cum = 0L
      ranked.zipWithIndex.foreach { case ((t, d), i) =>
        cum += t.cnt
        if (cum <= CollapseBudget) want += ((qid, t.res, t.cell, i + 1, d))
      }
    }
    val got = Retrieval.collapseTopK(
      TilePyramid.pyramidLazy(Images.images(spark, SparkSpec.Sf), 4, 7),
      Fixtures.knnQueries(spark), CollapseK, CollapseBudget)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(5),
        r.getDouble(4))).toSet
    assert(got == want.toSet)
  }

  test("descent invariant: every selected child's parent was selected") {
    val rows = Retrieval.descendTopK(
      TilePyramid.pyramidLazy(Images.images(spark, SparkSpec.Sf), 4, 8),
      Fixtures.knnQueries(spark), 4, 8, K).collect()
    val byLevel = rows.groupBy(r => (r.getInt(0), r.getInt(1)))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).toSet }
    rows.filter(_.getInt(1) > 4).foreach { r =>
      val parent = GridCell.parentAt(r.getLong(2), r.getInt(1) - 1)
      assert(byLevel((r.getInt(0), r.getInt(1) - 1)).contains(parent),
        s"orphan selection qid=${r.getInt(0)} res=${r.getInt(1)}")
    }
  }
}
