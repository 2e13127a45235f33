package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.agg.PhashCentroid
import graft.geo.{functions => G}

/** Bottom-up tile pyramid — the graft of the reference's recursive
  * cluster-then-summarize tree construction
  * (raptor/cluster_tree_builder.py:62-205 `construct_tree`): each level is
  * `groupBy(parent_cell).agg(summary)` of the level below, with an early-stop
  * guard when a level stops shrinking (≙ cluster_tree_builder.py:143-149).
  *
  * Tile row schema (≙ `Node`, raptor/tree_structures.py:4-14):
  *   cell: Long (res-tagged grid cell — the node id),
  *   res: Int (≙ layer), cnt, bytes_sum: Long,
  *   lat_min/lat_max/lon_min/lon_max: Double (bbox summary),
  *   phash_bits: Seq[Long] (associative partial state),
  *   phash_centroid: Long (≙ parent embedding/centroid).
  *
  * Scale notes (100 TB design):
  *  - each level is ONE shuffle keyed on the parent cell; partial (map-side)
  *    aggregation halves traffic because child cells of one parent are
  *    spatially adjacent and usually co-located in the same input split;
  *  - levels shrink 4x per step, so the total cost is dominated by the first
  *    rollup; upper levels are tiny and coalesce via AQE;
  *  - hot leaf cells (the skew fixture) are absorbed by partial aggregation:
  *    a million identical-cell rows reduce map-side before shuffling.
  */
object TilePyramid {
  val LeafRes = 12

  /** Add the `cell` column at `res` via the codegen'd Catalyst expression
    * (the north_star's batched cell encoding). */
  def withCell(images: DataFrame, res: Int): DataFrame =
    images.withColumn("cell", G.cell_encode(col("lat"), col("lon"), res))

  private def withCentroid(df: DataFrame): DataFrame =
    df.withColumn("phash_centroid", PhashCentroid.centroidCol("phash_bits"))

  /** Leaf tiles: aggregate the image table at `res`. ≙ leaf layer creation +
    * first summarize (raptor/tree_builder.py:286-328 → process_cluster). */
  def leafTiles(images: DataFrame, res: Int = LeafRes): DataFrame =
    withCentroid(
      withCell(images, res)
        .groupBy(col("cell"))
        .agg(
          count(lit(1)).as("cnt"),
          sum((col("w") * col("h") * 3).cast("long")).as("bytes_sum"),
          min(col("lat")).as("lat_min"), max(col("lat")).as("lat_max"),
          min(col("lon")).as("lon_min"), max(col("lon")).as("lon_max"),
          PhashCentroid.bitsFromHash(col("phash")).as("phash_bits"))
        .withColumn("res", lit(res)))

  /** One rollup step: tiles at res r -> tiles at r-1. The parent key is a
    * pure function of the child cell (functional linkage replaces the
    * reference's stored `children` adjacency — SURVEY.md §1.2). */
  def rollupOnce(tiles: DataFrame, fromRes: Int): DataFrame =
    withCentroid(
      tiles
        .withColumn("parent", G.cell_parent_at(col("cell"), fromRes - 1))
        .groupBy(col("parent"))
        .agg(
          sum(col("cnt")).as("cnt"),
          sum(col("bytes_sum")).as("bytes_sum"),
          min(col("lat_min")).as("lat_min"), max(col("lat_max")).as("lat_max"),
          min(col("lon_min")).as("lon_min"), max(col("lon_max")).as("lon_max"),
          PhashCentroid.bitsMerge(col("phash_bits")).as("phash_bits"))
        .withColumnRenamed("parent", "cell")
        .withColumn("res", lit(fromRes - 1)))

  /** Build the full pyramid `minRes..maxRes` as one DataFrame (union of
    * levels). Each level is persisted before deriving the next so the chain
    * of shuffles is linear, not exponential; the driver-side loop guard is
    * the reference's early-stop (cluster_tree_builder.py:143-149).
    * Returns (pyramid, per-level row counts coarse->fine). */
  def build(images: DataFrame, minRes: Int = 4, maxRes: Int = LeafRes)
      : (DataFrame, Map[Int, Long]) = {
    var level = leafTiles(images, maxRes)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var counts = Map(maxRes -> level.count())
    var all = level
    var res = maxRes
    var stop = false
    while (res > minRes && !stop) {
      val next = rollupOnce(level, res).persist(StorageLevel.MEMORY_AND_DISK)
      val n = next.count()
      counts += (res - 1) -> n
      all = all.unionByName(next)
      // early stop: a level that no longer reduces (== 1 cell) ends the build
      stop = n <= 1
      level = next
      res -= 1
    }
    (all, counts)
  }

  /** Per-level metrics (≙ log_tree_structure, raptor/utils.py:222-271):
    * cells, images, avg/max images per cell, bbox spread. The max/avg ratio
    * is the skew signal (≙ index_count hotness) that drives salting. */
  def levelMetrics(pyramid: DataFrame): DataFrame =
    pyramid.groupBy(col("res"))
      .agg(
        count(lit(1)).as("n_cells"),
        sum(col("cnt")).as("n_images"),
        avg(col("cnt")).as("avg_per_cell"),
        max(col("cnt")).as("max_per_cell"),
        sum(col("bytes_sum")).as("bytes_total"))
      .orderBy(col("res"))
}
