package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.geo.{QuadkeyTiling, TilingStrategy}

/** INPUT-FILE lineage for tile builds — the second lineage axis of the
  * north rule ("per-partition lineage + metrics") next to the snapshot's
  * `src_partition` writer-partition column ([[Snapshot.LineageCols]]):
  * which SOURCE FILES fed each tile. `src_partition` answers "which
  * writer task produced this row" (resume/debug the write); file lineage
  * answers "which input files must be reprocessed / were corrupted /
  * carry this tile's provenance" — at 100 TB the unit of reprocessing,
  * retention and audit is the file, not the shuffle partition.
  *
  * ≙ the reference's per-leaf source bookkeeping (raptor/tree_builder.py
  * keeps each leaf's originating document ids through the build); here
  * grafted onto Spark's `input_file_name()`, captured in the SCAN stage
  * (after any shuffle it returns '' — the capture must be the first
  * projection over a file-backed frame, which is why these operators take
  * the raw frame and do their own cell encode).
  *
  * The primitive is the EDGE TABLE (cell, src_file, rows): linear in the
  * input, no per-tile arrays, joinable in both directions ("files behind
  * this tile" and "tiles fed by this file"), and it aggregates with one
  * keyed shuffle. The array form ([[leafTilesWithSources]]) rolls the
  * edges up for human-facing summaries; its per-tile array is bounded by
  * the files overlapping a cell — small under a z-curve/cell-sorted
  * layout ([[graft.geo.GridCell.interleave]]), potentially the whole
  * file set for a randomly-laid-out corpus, which is itself the audit
  * signal that the layout needs clustering. */
object Lineage {

  /** (cell, src_file, rows) edges at `res` — `images` must be a
    * file-backed frame (parquet read) with lat/lon columns; the file name
    * is captured before any shuffle. */
  def fileEdges(images: DataFrame, res: Int,
                strategy: TilingStrategy = QuadkeyTiling): DataFrame =
    images
      .withColumn("src_file",
        regexp_extract(input_file_name(), "([^/]+)$", 1))
      .withColumn("cell",
        strategy.encodeCol(col("lat"), col("lon"), res))
      .groupBy(col("cell"), col("src_file"))
      .agg(count(lit(1)).as("rows"))

  /** Leaf tiles with their per-tile source-file sets (sorted for
    * determinism) — the roll-up of [[fileEdges]]. */
  def leafTilesWithSources(images: DataFrame, res: Int,
                           strategy: TilingStrategy = QuadkeyTiling): DataFrame =
    fileEdges(images, res, strategy)
      .groupBy(col("cell"))
      .agg(sum(col("rows")).as("cnt"),
        sort_array(collect_set(col("src_file"))).as("src_files"))

  /** Reverse audit: every tile a file contributed to — the reprocessing
    * frontier when `file` is found bad (re-ingest the file, recompute
    * exactly these cells' branches via [[Snapshot.mergeDeltaInto]]). */
  def tilesOfFile(edges: DataFrame, file: String): DataFrame =
    edges.filter(col("src_file") === file).select(col("cell"), col("rows"))
}
