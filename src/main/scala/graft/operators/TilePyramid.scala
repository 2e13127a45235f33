package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.agg.PhashCentroid
import graft.geo.{QuadkeyTiling, TilingStrategy}

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
    * (the north_star's batched cell encoding). `strategy` picks the index
    * (quadkey default / S2) — the whole pyramid is index-agnostic because
    * the rollup key is the strategy's own parent function. */
  def withCell(images: DataFrame, res: Int,
               strategy: TilingStrategy = QuadkeyTiling): DataFrame =
    images.withColumn("cell", strategy.encodeCol(col("lat"), col("lon"), res))

  private def withCentroid(df: DataFrame): DataFrame =
    df.withColumn("phash_centroid", PhashCentroid.centroidCol("phash_bits"))

  /** Leaf tiles: aggregate the image table at `res`. ≙ leaf layer creation +
    * first summarize (raptor/tree_builder.py:286-328 → process_cluster).
    * `extraKeys`: additional grouping columns (e.g. a corpus-half tag) so a
    * caller needing SEVERAL tile sets over one input derives them in a
    * single scan + aggregation instead of one pass per subset. */
  def leafTiles(images: DataFrame, res: Int = LeafRes,
                strategy: TilingStrategy = QuadkeyTiling,
                extraKeys: Seq[String] = Nil): DataFrame = {
    val aggs = Seq(
      count(lit(1)).as("cnt"),
      sum((col("w") * col("h") * 3).cast("long")).as("bytes_sum"),
      min(col("lat")).as("lat_min"), max(col("lat")).as("lat_max"),
      min(col("lon")).as("lon_min"), max(col("lon")).as("lon_max")) ++
      PhashCentroid.bitSumAggs(col("phash"), "pb")
    withCentroid(
      PhashCentroid.assembleBits(
        withCell(images, res, strategy)
          .groupBy((col("cell") +: extraKeys.map(col)): _*)
          .agg(aggs.head, aggs.tail: _*), "pb", "phash_bits")
        .withColumn("res", lit(res)))
  }

  /** Literal-free rollup: the target resolution is derived from each row's
    * own cell (res lives in the top bits — GridCell layout), so EVERY level
    * generates the identical plan/codegen source. Janino compilation of the
    * 65-aggregate stage then happens once per build instead of once per
    * level (measured ~5s/level of pure compile time at sf0.1). */
  def rollupOnce(tiles: DataFrame): DataFrame = rollupOnce(tiles, QuadkeyTiling)

  def rollupOnce(tiles: DataFrame, strategy: TilingStrategy): DataFrame = {
    val aggs = Seq(
      sum(col("cnt")).as("cnt"),
      sum(col("bytes_sum")).as("bytes_sum"),
      min(col("lat_min")).as("lat_min"), max(col("lat_max")).as("lat_max"),
      min(col("lon_min")).as("lon_min"), max(col("lon_max")).as("lon_max")) ++
      PhashCentroid.bitMergeAggs(col("phash_bits"), "pb")
    withCentroid(
      PhashCentroid.assembleBits(
        tiles
          .withColumn("parent", strategy.parentOnceCol(col("cell")))
          .groupBy(col("parent"))
          .agg(aggs.head, aggs.tail: _*), "pb", "phash_bits")
        .withColumnRenamed("parent", "cell")
        .withColumn("res", strategy.resCol(col("cell"))))
  }

  /** Combine tile rows sharing the SAME cell — the delta-merge combiner:
    * identical aggregate algebra to [[rollupOnce]] (every tile summary is
    * a monotone combiner: sums, min/max bbox, phash bit counts) but keyed
    * by the cell itself, so an old tile row and a delta tile row for one
    * cell fold into the tile a from-scratch build would produce. */
  def combineByCell(tiles: DataFrame,
                    strategy: TilingStrategy = QuadkeyTiling): DataFrame = {
    val aggs = Seq(
      sum(col("cnt")).as("cnt"),
      sum(col("bytes_sum")).as("bytes_sum"),
      min(col("lat_min")).as("lat_min"), max(col("lat_max")).as("lat_max"),
      min(col("lon_min")).as("lon_min"), max(col("lon_max")).as("lon_max")) ++
      PhashCentroid.bitMergeAggs(col("phash_bits"), "pb")
    withCentroid(
      PhashCentroid.assembleBits(
        tiles.groupBy(col("cell")).agg(aggs.head, aggs.tail: _*),
        "pb", "phash_bits")
        .withColumn("res", strategy.resCol(col("cell"))))
  }

  /** Build the full pyramid `minRes..maxRes` as one DataFrame (union of
    * levels). Each level is persisted before deriving the next so the chain
    * of shuffles is linear, not exponential; the driver-side loop guard is
    * the reference's early-stop (cluster_tree_builder.py:143-149).
    * Returns (pyramid, per-level row counts coarse->fine). */
  def build(images: DataFrame, minRes: Int = 4, maxRes: Int = LeafRes,
            strategy: TilingStrategy = QuadkeyTiling)
      : (DataFrame, Map[Int, Long]) = {
    // Persist ONLY the expensive leaf aggregation; the upper rollups are
    // tiny and literal-free, so the lazily-chained union needs one codegen
    // compile and Catalyst's ReuseExchange dedups the shared shuffle
    // subplans across union branches (level k's chain prefix == level k+1's
    // whole plan). Per-level counts come from ONE job instead of a
    // materialize+count barrier per level (was ~5s/level of fixed cost).
    val leaf = leafTiles(images, maxRes, strategy)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var all = leaf
    var level = leaf
    var res = maxRes
    while (res > minRes) {
      level = rollupOnce(level, strategy)
      all = all.unionByName(level)
      res -= 1
    }
    val counts = all.groupBy(col("res")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // early-stop semantics (≙ cluster_tree_builder.py:143-149): levels
    // coarser than the first non-reducing (<= 1 cell) level are dropped.
    val tiny = counts.filter { case (r, n) => r < maxRes && n <= 1 }.keys
    if (tiny.isEmpty) (all, counts)
    else {
      val rStop = tiny.max
      (all.filter(col("res") >= rStop), counts.filter(_._1 >= rStop))
    }
  }

  /** Single level at `res`: straight rollup chain from the leaves, no
    * union, no per-level materialization — one linear job. The query-side
    * fast path when only one (or a contiguous slice of) level is needed;
    * [[build]] remains the instrumented path (counts + early stop). */
  def levelAt(images: DataFrame, res: Int, maxRes: Int = LeafRes,
              strategy: TilingStrategy = QuadkeyTiling): DataFrame = {
    var level = leafTiles(images, maxRes, strategy)
    var r = maxRes
    while (r > res) { level = rollupOnce(level, strategy); r -= 1 }
    level
  }

  /** Lazy union of levels minRes..maxRes (no counts, no persist): the
    * leaf aggregation subplan is identical across branches, so Catalyst's
    * ReuseExchange computes it once. */
  def pyramidLazy(images: DataFrame, minRes: Int, maxRes: Int = LeafRes,
                  strategy: TilingStrategy = QuadkeyTiling): DataFrame = {
    var level = leafTiles(images, maxRes, strategy)
    var all = level
    var r = maxRes
    while (r > minRes) {
      level = rollupOnce(level, strategy)
      all = all.unionByName(level)
      r -= 1
    }
    all
  }

  /** SLIM pyramid (count/bytes/bbox only — no phash centroid state): the
    * retrieval queries never read the centroid, and the full rollup's
    * 65-column aggregate state is most of its cost; the slim union is the
    * same shape at 7 aggregate columns. Aggregation is associative, so
    * every value equals the full pyramid's corresponding column.
    *
    * Unlike [[rollupOnce]], `res` here is a LITERAL per level, not
    * `resCol(cell)`: consumers of the slim pyramid filter on `res`
    * (adaptiveSplit filters BOTH join sides), and a literal lets the
    * pushed-down filter constant-fold to true/false per union branch —
    * pruning whole branches — where the expression form collapses into
    * the full encode/parent chain inside each branch's pushed Filter
    * (measured: a 49 KB single Filter expression that blew whole-stage
    * codegen past janino's 64 KB method limit and fell back to
    * interpreted). The compile-once rationale of the literal-free full
    * rollup doesn't transfer: the slim agg is 7 columns, so the ~5
    * per-level codegen variants are cheap to compile. */
  def pyramidLazySlim(images: DataFrame, minRes: Int, maxRes: Int = LeafRes,
                      strategy: TilingStrategy = QuadkeyTiling): DataFrame = {
    def slimRollup(tiles: DataFrame, resOut: Int): DataFrame =
      tiles.withColumn("parent", strategy.parentOnceCol(col("cell")))
        .groupBy(col("parent"))
        .agg(sum(col("cnt")).as("cnt"),
          sum(col("bytes_sum")).as("bytes_sum"),
          min(col("lat_min")).as("lat_min"), max(col("lat_max")).as("lat_max"),
          min(col("lon_min")).as("lon_min"), max(col("lon_max")).as("lon_max"))
        .withColumnRenamed("parent", "cell")
        .withColumn("res", lit(resOut))
    var level = withCell(images, maxRes, strategy)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("cnt"),
        sum((col("w") * col("h") * 3).cast("long")).as("bytes_sum"),
        min(col("lat")).as("lat_min"), max(col("lat")).as("lat_max"),
        min(col("lon")).as("lon_min"), max(col("lon")).as("lon_max"))
      .withColumn("res", lit(maxRes))
    var all = level
    var r = maxRes
    while (r > minRes) {
      level = slimRollup(level, r - 1)
      all = all.unionByName(level)
      r -= 1
    }
    all
  }

  /** Variable-depth pyramid by budget — the reference's oversize-cluster
    * recursive re-clustering (cluster_utils.py:186-196: clusters exceeding
    * the token budget are recursively re-clustered) grafted onto the tile
    * pyramid: a tile whose `cnt` exceeds `budget` is SPLIT to res+1,
    * recursively, until it fits or `maxRes` bounds the depth. The fixed
    * grid pyramid sidesteps this with uniform fan-out, but at 100 TB hot
    * tiles exceed any per-tile budget — adaptive depth is the fix, and the
    * hot-cell histogram (A3) is exactly what motivates where it deepens.
    *
    * The recursion COLLAPSES TO A CLOSED FORM over the pyramid levels
    * because a parent's count is the sum of its children's (counts are
    * non-negative, so parent.cnt ≥ every child's): "all ancestors of this
    * tile were over budget" is equivalent to "this tile's immediate parent
    * is over budget". A tile at res r is therefore EMITTED iff
    *
    *   (r == startRes  OR  parent.cnt > budget)       — it was materialized
    *   AND (cnt <= budget  OR  r == maxRes)           — and it is final
    *
    * which is one parent-key equi-join per level (batched here as a single
    * self-join of the pyramid on the parent cell) — no driver recursion, no
    * iterative re-clustering jobs; the oracle replays the same predicate
    * per level (q_adaptive_split). Emitted tiles partition the corpus:
    * every point lies under exactly one emitted tile (AdaptiveSplitSpec).
    *
    * `pyramid` must contain levels `startRes..maxRes` (slim or full
    * schema; only `res`, `cell`, `cnt` are consulted, all columns pass
    * through). Scale shape: the parent side is a projection of the same
    * pyramid (ReuseExchange dedups the shared scan; snapshot-backed
    * pyramids prune both sides by `res` partitions); the join is a keyed
    * equi-join on the parent cell — never a theta join. */
  def adaptiveSplit(pyramid: DataFrame, startRes: Int, maxRes: Int,
                    budget: Long,
                    strategy: TilingStrategy = QuadkeyTiling): DataFrame = {
    require(startRes <= maxRes, s"startRes $startRes > maxRes $maxRes")
    val parents = pyramid
      .filter(col("res").between(startRes, maxRes - 1))
      .select(col("cell").as("pcell"), col("cnt").as("pcnt"))
    pyramid.filter(col("res").between(startRes, maxRes))
      .withColumn("pcell",
        when(col("res") > startRes, strategy.parentOnceCol(col("cell"))))
      .join(parents, Seq("pcell"), "left_outer")
      .filter((col("res") === startRes || col("pcnt") > budget) &&
        (col("cnt") <= budget || col("res") === maxRes))
      .drop("pcell", "pcnt")
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
