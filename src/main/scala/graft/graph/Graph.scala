package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over the engine's similarity-graph edge lists (the
  * [[graft.operators.Knn.knnSelfJoin]] AkNN output, or any keyed
  * `(src, dst)` relation): fixed-point integer PageRank and one-round
  * majority label propagation. These are the consumers the AkNN edge list
  * exists FOR (≙ the reference's retrieval graph walked during collapse-
  * tree descent, raptor/tree_retriever.py:86-130, taken to whole-graph
  * analytics) — node importance for curriculum/sampling weights and label
  * smoothing over near-duplicate neighborhoods in a training-data corpus.
  *
  * Determinism: every rank is a scaled BIGINT (1e6 = rank 1.0) and every
  * step is integer `div` — the q_bic_k integer-lattice lesson applied to
  * an iterative kernel, so a DuckDB oracle can replay the exact fixpoint
  * with unrolled CTEs (no float ever enters the hashed output).
  *
  * Scale shape (100 TB): ranks and degrees are keyed by node id; each
  * iteration is ONE keyed join (edges ⋈ ranks on src — both sides hash-
  * partitioned on the same key, so AQE reuses the exchange) plus ONE keyed
  * aggregation (contributions by dst, map-side combinable). Nothing is
  * collected to the driver and no broadcast grows with the graph. At true
  * scale with many iterations the rank frame would be checkpointed every
  * ~5 rounds to truncate lineage (the [[graft.dedup.Components]] device);
  * at the fixed 3 rounds used here the plan stays a straight pipeline.
  */
object Graph {

  /** Damped PageRank, integer fixed-point, `iters` unrolled rounds.
    *
    * r_0(v) = 1e6; r_{i+1}(v) = 150000 + (85 · Σ_{u→v} (r_i(u) div
    * out(u))) div 100 — damping 0.85 at scale 1e6. Dangling mass is
    * dropped (documented divergence from the normalized formulation:
    * deterministic and replayable beats re-normalizing with a float).
    *
    * @param nodes `(id)` — the full node set (isolated nodes keep the
    *              teleport mass 150000)
    * @param edges `(src, dst)` directed edges, duplicates allowed
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ed = edges.join(deg, Seq("src")) // (src, dst, deg)
    var ranks = nodes.select(col("id"), lit(1000000L).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = ed.join(ranks, ed("src") === ranks("id"))
        .select(col("dst").as("id"), expr("pr div deg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("c"))
      ranks = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          expr("150000L + (85L * coalesce(c, 0L)) div 100L").as("pr"))
    }
    ranks.join(deg.withColumnRenamed("src", "id"), Seq("id"), "left")
      .select(col("id"), col("pr"), coalesce(col("deg"), lit(0L)).as("out_deg"))
  }

  /** One round of majority label propagation: each node adopts the most
    * frequent label among its out-neighbors (tie → lexicographically
    * smallest label); nodes with no neighbors keep their own label with
    * 0 votes. One keyed join + one keyed count + one NODE-keyed window
    * (bounded partitions — never partitionless).
    *
    * @param labels `(id, lbl)` current assignment for every node
    * @param edges  `(src, dst)` — votes flow dst → src
    */
  def labelPropagate(labels: DataFrame, edges: DataFrame): DataFrame = {
    val nbr = labels.select(col("id").as("dst"), col("lbl").as("nlbl"))
    val votes = edges.join(nbr, Seq("dst"))
      .groupBy(col("src"), col("nlbl"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("votes").desc, col("nlbl"))
    val winner = votes.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("src").as("id"), col("nlbl"), col("votes"))
    labels.join(winner, Seq("id"), "left")
      .select(col("id"), col("lbl"),
        coalesce(col("nlbl"), col("lbl")).as("new_lbl"),
        coalesce(col("votes"), lit(0L)).as("votes"))
  }

  /** Multi-source BFS hop distance over an occupied grid at `res` with
    * ROOK (4-neighbor) adjacency — the iterative frontier-expansion
    * traversal (cost-distance / service-area analysis in the GIS raster
    * toolbox; "how far is every dense cell from the nearest seed").
    * Longitude wraps, latitude clamps (edge rows simply have 3
    * neighbors) — the [[graft.geo.GridCell.ring]] seam conventions.
    *
    * Frontier loop, NOT pointer jumping: distance labels need exactly
    * `maxDist` rounds and each round's frontier is a fraction of the
    * occupied grid, so the CC device (O(log d) rounds over the whole edge
    * set) would do strictly more work here. Every round is one explode
    * (4x, grid-bounded) + two keyed joins (semi against occupied, anti
    * against visited); the per-round `isEmpty` early-stop reads one
    * partition head, not a count. Scale shape: after the initial binning
    * groupBy (the only point-sized stage, done by the CALLER), everything
    * is bounded by 4^res cells regardless of corpus size; `visited` is
    * localCheckpointed each round so lineage stays O(1).
    *
    * @param occupied `(cell, cnt)` occupied cells at `res`
    * @param seeds    `(cell)` subset of occupied — distance-0 sources
    * @return `(cell, dist, cnt)` for every occupied cell within `maxDist`
    *         hops of a seed (unreachable cells are absent)
    */
  def gridBfs(occupied: DataFrame, seeds: DataFrame, res: Int,
              maxDist: Int): DataFrame = {
    val dim = 1L << res
    val occ = occupied.select(col("cell"), col("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var visited = seeds.select(col("cell"), lit(0).as("dist"))
      .localCheckpoint(true)
    var frontier = visited
    var d = 1
    var done = false
    while (d <= maxDist && !done) {
      val x = col("cell").bitwiseAND(lit(dim - 1))
      val y = shiftrightunsigned(col("cell"), res).bitwiseAND(lit(dim - 1))
      val steps = explode(array(
        struct(lit(1L).as("dx"), lit(0L).as("dy")),
        struct(lit(-1L).as("dx"), lit(0L).as("dy")),
        struct(lit(0L).as("dx"), lit(1L).as("dy")),
        struct(lit(0L).as("dx"), lit(0L - 1L).as("dy"))))
      val next = frontier
        .select(x.as("x"), y.as("y"), steps.as("s"))
        .select(pmod(col("x") + col("s.dx"), lit(dim)).as("nx"),
          (col("y") + col("s.dy")).as("ny"))
        .where(col("ny") >= 0 && col("ny") < dim)
        .select(lit(res.toLong << 58)
          .bitwiseOR(shiftleft(col("ny"), res)).bitwiseOR(col("nx"))
          .as("cell"))
        .distinct()
        .join(occ.select("cell"), Seq("cell"), "semi")
        .join(visited, Seq("cell"), "anti")
        .select(col("cell"), lit(d).as("dist"))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else { visited = visited.union(next).localCheckpoint(true); frontier = next }
      d += 1
    }
    val out = visited.join(occ, Seq("cell"))
      .select(col("cell"), col("dist"), col("cnt"))
      .localCheckpoint(true)
    occ.unpersist(blocking = false)
    out
  }
}
