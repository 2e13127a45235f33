package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) DISTINCT-COUNT SKETCH per tile — approximate
  * cardinality with an exactly-reproducible answer. The usual sketch
  * (HyperLogLog, Spark's `approx_count_distinct`) is
  * implementation-defined and cannot be oracle-checked; KMV (Bar-Yossef
  * et al. 2002; Beyer et al., "On Synopses for Distinct-Value Estimation
  * Under Multiset Operations", SIGMOD 2007) is a pure function of the
  * hash set — keep the k smallest distinct hash values; if fewer than k
  * exist the count is exact, else estimate (k-1) / h_k on the unit
  * interval — so both engines compute the identical integer estimate.
  *
  * MERGEABLE: the k smallest of a union are contained in the union of
  * each side's k smallest, so partial sketches combine without rescanning
  * (`top-k(kept(A) ∪ kept(B)) == top-k(A ∪ B)` — KmvSpec pins this), the
  * property that lets 1000 executors sketch 100 TB independently and a
  * final reduce merge |cells| x k rows. Estimate error is
  * ~1/sqrt(k-2) relative (k=32 -> ~18%).
  *
  * Plan shape: distinct on (cell, h) (map-side combinable) -> per-cell
  * window rank (partition-parallel across cells; a hot cell is one
  * partition's sort — the upgrade path is a bounded-heap
  * TypedImperativeAggregate, same interface) -> tiny per-cell aggregate.
  */
object Kmv {

  /** Hash domain: the cross-engine md5 device, [0, 2^32). */
  val HashSpan: Double = 4294967296.0

  /** The k smallest distinct hashes per cell — the sketch's carrier,
    * and the unit partial sketches merge over. */
  def kept(cellHash: DataFrame, k: Int): DataFrame = {
    val wnd = Window.partitionBy(col("cell")).orderBy(col("h"))
    cellHash.select(col("cell"), col("h")).distinct()
      .withColumn("rnk", row_number().over(wnd))
      .filter(col("rnk") <= k)
      .select(col("cell"), col("h"))
  }

  /** Collapse kept hashes to `(cell, n_kept, hk, est)`. `est` is exact
    * when the cell holds fewer than k distinct values; otherwise
    * floor((k-1) * 2^32 / h_k) — the scale constant is an exact integer
    * literal in both engines, and the one division is correctly rounded,
    * so the estimate is bit-reproducible. */
  def estimate(keptHashes: DataFrame, k: Int): DataFrame = {
    val scale = (k - 1).toLong * (1L << 32)
    keptHashes.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
      .withColumn("est",
        when(col("n_kept") < k, col("n_kept")).otherwise(
          floor(lit(scale).cast("double") / col("hk").cast("double"))))
  }

  /** Per-cell sketch of an `(cell, h)` frame. */
  def sketchOf(cellHash: DataFrame, k: Int): DataFrame =
    estimate(kept(cellHash, k), k)

  /** Per-tile distinct-image sketch of the image table at `res`. */
  def cellSketches(images: DataFrame, res: Int, k: Int): DataFrame =
    sketchOf(
      images.select(
        graft.geo.functions.cell_encode(col("lat"), col("lon"), res)
          .as("cell"),
        conv(substring(md5(col("image_id")), 1, 8), 16, 10).cast("long")
          .as("h")),
      k)
}
