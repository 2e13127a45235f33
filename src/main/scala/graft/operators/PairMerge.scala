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
  * recomputation AND hash-proven by q_pair_merge's DuckDB oracle, which
  * unrolls the greedy walk into a fixed chain of hottest-remaining /
  * argmin-partner window rounds (the fan-out bound makes the round count
  * a constant).
  */
object PairMerge {

  case class TileIn(parent: Long, cell: Long, cnt: Long, bytes_sum: Long,
                    lat_c: Double, lon_c: Double)
  /** lat_c/lon_c: the merged node's own centroid — the midpoint of the
    * pair's centroids (the graft of the reference re-embedding the merged
    * text, merge_tree_builder.py:400); pass-through for unmerged tiles.
    * Feeds the layer-2 clustering of [[mergeTree]]. */
  case class Merged(parent: Long, cell: Long, cell_a: Long, cell_b: Long,
                    merged: Boolean, cnt: Long, bytes_sum: Long,
                    lat_c: Double, lon_c: Double)

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
            merged = true, a.cnt + b.cnt, a.bytes_sum + b.bytes_sum,
            (a.lat_c + b.lat_c) / 2.0, (a.lon_c + b.lon_c) / 2.0)
        } else {
          out += Merged(parent, a.cell, a.cell, a.cell,
            merged = false, a.cnt, a.bytes_sum, a.lat_c, a.lon_c)
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

  /** TWO-LAYER merge tree (raptor/merge_tree_builder.py:414-461: after the
    * greedy pair-merge forms layer 1, a final k-means with `n_clusters//2`
    * clusters over the merged nodes forms layer 2 — each cluster becomes a
    * parent whose children are its members): layer 1 = [[greedyPairMerge]];
    * layer 2 = seeded fixed-iteration Lloyd ([[KmeansAssign]], the learned
    * assignment) over the layer-1 centroids, parents aggregating their
    * members. `k2` mirrors the reference's `min(n_clusters // 2, n1)` —
    * callers pass their configured half-count; the min is applied here.
    * Returns (layer1, layer2); layer1 is materialized (localCheckpoint)
    * because both the k-means jobs and the final join consume it.
    * GreedyPairSpec pins the test_merge_layer.py:63-124 invariants. */
  def mergeTree(tiles: DataFrame, groupRes: Int, k2: Int,
                iters: Int = KmeansAssign.DefaultIters)
      : (DataFrame, DataFrame) = {
    val layer1 = greedyPairMerge(tiles, groupRes).localCheckpoint(true)
    val n1 = layer1.count()
    val k = math.max(1, math.min(k2.toLong, n1)).toInt
    val pts = layer1.select(col("cell").cast("string").as("image_id"),
      col("lat_c").as("lat"), col("lon_c").as("lon"))
    val assigned = KmeansAssign.assign(pts, k, iters)
      .select(col("image_id").cast("long").as("cell"), col("cid"))
    val layer2 = layer1.join(assigned, Seq("cell"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_children"),
        sum(col("cnt")).as("cnt"), sum(col("bytes_sum")).as("bytes_sum"))
    (layer1, layer2)
  }
}
