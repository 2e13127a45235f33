package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.geo.{functions => G, GridCell}

/** Exclusive greedy pair-merge (SURVEY.md J6) — the graft of the
  * reference's hotness-ordered 1-to-1 neighbor merging
  * (raptor/merge_tree_builder.py:320-408): process nodes hottest-first,
  * each takes its nearest UNUSED partner, both leave the pool, the pair
  * becomes one merged node; leftovers pass through unmerged.
  *
  * Graft semantics: tiles at resolution r merge pairwise WITHIN their
  * parent cell at `groupRes` (the reference's "within top clusters"
  * candidate scope becomes spatial-neighborhood scope). Determinism
  * contract (the reference's processing order made explicit):
  *   - processing order: cnt DESC, then cell ASC;
  *   - partner choice: min squared planar centroid distance, ties broken
  *     by cell ASC;
  *   - merged row: cell = min(cell_a, cell_b), summaries added, bbox
  *     unioned.
  * Greedy matching has no relational form (it is inherently sequential),
  * so this is the one operator family implemented partition-locally with
  * the typed API — `groupByKey(parent).flatMapGroups`, which shuffles once
  * on the parent key and runs the O(m^2) matching on each small
  * neighborhood (m = tiles per parent cell, bounded by the grid fan-out).
  * Verified by GreedyPairSpec against an independent driver-side
  * recomputation (no oracle SQL: sequential matching is not
  * SQL-expressible; the driver records the rows-only check).
  */
object PairMerge {

  case class TileIn(parent: Long, cell: Long, cnt: Long, bytes_sum: Long,
                    lat_c: Double, lon_c: Double)
  case class Merged(parent: Long, cell: Long, cell_a: Long, cell_b: Long,
                    merged: Boolean, cnt: Long, bytes_sum: Long)

  /** Pure, deterministic greedy matching over one neighborhood — shared by
    * the distributed operator and the test's reference recomputation. */
  def matchGroup(parent: Long, tiles: Seq[TileIn]): Seq[Merged] = {
    val order = tiles.sortBy(t => (-t.cnt, t.cell)).toArray
    val used = new Array[Boolean](order.length)
    val out = Seq.newBuilder[Merged]
    var i = 0
    while (i < order.length) {
      if (!used(i)) {
        used(i) = true
        val a = order(i)
        // nearest unused partner by centroid distance, tie -> smaller cell
        var best = -1
        var bestKey = (Double.MaxValue, Long.MaxValue)
        var j = i + 1
        while (j < order.length) {
          if (!used(j)) {
            val b = order(j)
            val d = GridCell.planarDist2(a.lat_c, a.lon_c, b.lat_c, b.lon_c)
            val key = (d, b.cell)
            if (key._1 < bestKey._1 ||
                (key._1 == bestKey._1 && key._2 < bestKey._2)) {
              bestKey = key; best = j
            }
          }
          j += 1
        }
        if (best >= 0) {
          used(best) = true
          val b = order(best)
          out += Merged(parent, math.min(a.cell, b.cell), a.cell, b.cell,
            merged = true, a.cnt + b.cnt, a.bytes_sum + b.bytes_sum)
        } else {
          out += Merged(parent, a.cell, a.cell, a.cell,
            merged = false, a.cnt, a.bytes_sum)
        }
      }
      i += 1
    }
    out.result()
  }

  /** tiles (leafTiles schema at `res`) -> merged pairs grouped by the
    * parent cell at `groupRes`. */
  def greedyPairMerge(tiles: DataFrame, groupRes: Int): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val in = tiles.select(
        G.cell_parent_at(col("cell"), groupRes).as("parent"),
        col("cell"), col("cnt"), col("bytes_sum"),
        ((col("lat_min") + col("lat_max")) / 2.0).as("lat_c"),
        ((col("lon_min") + col("lon_max")) / 2.0).as("lon_c"))
      .as[TileIn]
    in.groupByKey(_.parent)
      .flatMapGroups((p, it) => matchGroup(p, it.toSeq).iterator)
      .toDF()
  }
}
