package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.geo.{functions => G}

/** Quadtree cell-set compaction — the engine's analog of H3
  * `compact`/`uncompact` (the north star names the H3 cell API as the
  * index family; the reference's coarse-to-fine cluster containment is
  * raptor/tree_retriever.py's level descent). `compact` rewrites a set of
  * same-resolution cells as the MINIMAL mixed-resolution set covering
  * exactly the same area: any parent whose 4 children are all present is
  * substituted for them, recursively. A 100 TB occupied-cell inventory
  * (billions of leaves, huge contiguous occupied areas) shrinks by the
  * fill factor of its dense regions — the compact set is what a planner
  * broadcasts (geofence covers, replication manifests, scan split lists)
  * when the leaf set would not fit.
  *
  * Scale shape: one keyed `groupBy(parent)` + one anti-join per level —
  * `levels` is log-bounded (<= 16), each round's frontier shrinks 4x at
  * best and the merged side is the smaller one. No driver state; the
  * per-level frames stay distributed.
  */
object CellCompact {

  /** Compact a set of distinct same-res cells (column `cell`, resolution
    * `leafRes`) into the minimal mixed-res set with the same extent,
    * never coarser than `minRes`. Output column: `cell` (res embedded in
    * the id's high bits, mixed). */
  def compact(cells: DataFrame, leafRes: Int, minRes: Int): DataFrame = {
    require(leafRes > minRes, s"compact: leafRes $leafRes <= minRes $minRes")
    var frontier = cells.select(col("cell"))
    var out: Option[DataFrame] = None
    var r = leafRes
    while (r > minRes) {
      val withP = frontier.withColumn("p", G.cell_parent_at(col("cell"), r - 1))
      // a parent is substitutable iff all 4 children are present (input
      // cells are distinct, so count(*) == 4 is set-completeness)
      val full = withP.groupBy(col("p")).agg(count(lit(1)).as("c"))
        .where(col("c") === 4).select(col("p"))
      val kept = withP.join(full, Seq("p"), "left_anti").select(col("cell"))
      out = Some(out.map(_.unionByName(kept)).getOrElse(kept))
      frontier = full.select(col("p").as("cell"))
      r -= 1
    }
    out.map(_.unionByName(frontier)).getOrElse(frontier)
  }

  /** Inverse: expand a mixed-res compact set back to the uniform `toRes`
    * leaf set. Map-side generator: each cell of res r fans out to its
    * 4^(toRes-r) descendants via two bounded sequence explodes (offset
    * grids), no join. */
  def uncompact(cells: DataFrame, toRes: Int): DataFrame =
    cells
      .selectExpr("cell", "cast(shiftrightunsigned(cell, 58) as int) AS r")
      .selectExpr(s"$toRes - r AS d",
        "cell & (shiftleft(1L, r) - 1) AS x",
        "shiftrightunsigned(cell, r) & (shiftleft(1L, r) - 1) AS y")
      .selectExpr("d", "x", "y",
        "explode(sequence(0L, shiftleft(1L, d) - 1)) AS dx")
      .selectExpr("d", "x", "y", "dx",
        "explode(sequence(0L, shiftleft(1L, d) - 1)) AS dy")
      .selectExpr(
        s"shiftleft(cast($toRes as bigint), 58)" +
          s" | shiftleft(shiftleft(y, d) + dy, $toRes)" +
          " | (shiftleft(x, d) + dx) AS cell")
}
