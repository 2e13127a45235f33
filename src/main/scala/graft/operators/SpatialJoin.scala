package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geo.{QuadkeyTiling, TilingStrategy, functions => G}
import graft.sources.Fixtures

/** Point-in-polygon spatial join — the canonical prefilter + refine shape
  * (SURVEY.md J3): a broadcast covering-cell index prunes the big side to
  * candidate cells, then the codegen ray-casting predicate refines. This is
  * the graft of the reference's cluster-prefiltered NN search
  * (raptor/merge_tree_builder.py:247-304, kmeans_retriever.py:76-124):
  * centroid table ≙ covering index, brute-force member refine ≙ ray cast.
  *
  * Scale design: polygons × covering cells is tiny (thousands of rows) ->
  * broadcast hash join, ZERO shuffle of the image side; the scan prunes to
  * (image_id, lat, lon) columns only (never `bytes`). Output pairs stream
  * straight out of the probe side. At 10^12 rows this is a map-only job.
  */
object SpatialJoin {

  /** Default covering resolution: cells comparable to fixture polygon size.
    * Coarser -> more refine work; finer -> bigger broadcast index. */
  val CoverRes = 6

  /** Polygon DataFrame (poly_id, lats, lons) from fixture rows. */
  def polyDf(spark: SparkSession, polys: Seq[Fixtures.Poly]): DataFrame = {
    import spark.implicits._
    polys.map(p => (p.polyId, p.lats.toSeq, p.lons.toSeq))
      .toDF("poly_id", "lats", "lons")
  }

  /** Covering index (cell, poly_id, lats, lons) built DISTRIBUTED: each
    * polygon row computes its own covering cells via the
    * [[graft.geo.PolyCoverCells]] expression and explodes — a plain
    * projection, so a 10^6-row vector layer builds its index with no
    * driver participation (the round-1 driver-side loop is gone). */
  def coverIndex(spark: SparkSession, polys: Seq[Fixtures.Poly], res: Int,
                 strategy: TilingStrategy = QuadkeyTiling): DataFrame =
    polyDf(spark, polys)
      .withColumn("cell", explode(strategy.coverCol(col("lats"), col("lons"), res)))
      .select(col("cell"), col("poly_id"), col("lats"), col("lons"))

  /** Prefilter + refine join: emits (poly_id, image_id) containment pairs.
    * `strategy` picks the covering index (quadkey default / S2) —
    * ≙ the reference's pluggable ClusteringAlgorithm boundary,
    * raptor/cluster_utils.py:130-133. The broadcast hint fits the small
    * fixture layer; at a 10^6-polygon layer drop it and the same plan
    * becomes a shuffle equi-join on the cell key. */
  def pipJoin(images: DataFrame, spark: SparkSession,
              polys: Seq[Fixtures.Poly] = Fixtures.polys,
              res: Int = CoverRes,
              strategy: TilingStrategy = QuadkeyTiling): DataFrame = {
    val idx = coverIndex(spark, polys, res, strategy)
    val pts = images.select(col("image_id"), col("lat"), col("lon"))
      .withColumn("cell", strategy.encodeCol(col("lat"), col("lon"), res))
    pts.join(broadcast(idx), Seq("cell"))
      .filter(G.point_in_poly(col("lat"), col("lon"), col("lats"), col("lons")))
      .select(col("poly_id"), col("image_id"))
  }

  /** Polygon↔polygon spatial join (vector↔vector — the overlay operator
    * the point-based joins don't cover): emits (a_id, b_id) for every
    * pair whose INTERIORS overlap. Semantics — exact for simple polygons:
    * interiors overlap iff some edge pair PROPERLY crosses
    * ([[graft.geo.PipKernel.segCross]], strict orientation products) OR
    * either ring's witness vertex (vertex 0) lies strictly inside the
    * other; boundary-touch-only contact is excluded symmetrically (strict
    * tests on both engines; measure-zero for the fixtures).
    *
    * Plan: both layers build their DISTRIBUTED covering index
    * (PolyCoverCells projection + explode) and candidates come from the
    * cover-cell equi-join; each pair is generated ONCE via the
    * min-common-cell filter (the emit-once pattern — no post-join
    * `distinct` shuffle). At a 10^8×10^8-polygon overlay both sides
    * shuffle once on the cell key (sort-merge + AQE skew split, the
    * pipJoinPartitioned shape); the codegen refine runs per candidate. */
  /** The interior-overlap refine predicate over (alats, alons, blats,
    * blons) — ONE definition shared by [[polyJoin]] and [[polyJoinBrute]]
    * (the brute form exists to prove the prefilter preserves exactly this
    * predicate, so the two must never drift). */
  private def polyOverlapPred: org.apache.spark.sql.Column =
    G.poly_seg_cross(col("alats"), col("alons"),
      col("blats"), col("blons")) ||
    G.point_in_poly(element_at(col("blats"), 1), element_at(col("blons"), 1),
      col("alats"), col("alons")) ||
    G.point_in_poly(element_at(col("alats"), 1), element_at(col("alons"), 1),
      col("blats"), col("blons"))

  def polyJoin(spark: SparkSession,
               aPolys: Seq[Fixtures.Poly], bPolys: Seq[Fixtures.Poly],
               res: Int = 4,
               strategy: TilingStrategy = QuadkeyTiling): DataFrame = {
    def side(ps: Seq[Fixtures.Poly], p: String) =
      polyDf(spark, ps).select(
          col("poly_id").as(s"${p}_id"),
          col("lats").as(s"${p}lats"), col("lons").as(s"${p}lons"))
        .withColumn(s"${p}cov",
          strategy.coverCol(col(s"${p}lats"), col(s"${p}lons"), res))
        .withColumn("cell", explode(col(s"${p}cov")))
    side(aPolys, "a").join(side(bPolys, "b"), Seq("cell"))
      .filter(col("cell") ===
        array_min(array_intersect(col("acov"), col("bcov"))))
      .filter(polyOverlapPred)
      .select(col("a_id"), col("b_id"))
  }

  /** Brute-force polygon-join oracle (J2 analog of [[pipBrute]]): cross
    * join + the SAME refine predicate — tests prove the cover-cell
    * prefilter and emit-once filter lose/invent no pair. */
  def polyJoinBrute(spark: SparkSession,
                    aPolys: Seq[Fixtures.Poly],
                    bPolys: Seq[Fixtures.Poly]): DataFrame = {
    val a = polyDf(spark, aPolys).select(col("poly_id").as("a_id"),
      col("lats").as("alats"), col("lons").as("alons"))
    val b = polyDf(spark, bPolys).select(col("poly_id").as("b_id"),
      col("lats").as("blats"), col("lons").as("blons"))
    a.crossJoin(broadcast(b))
      .filter(polyOverlapPred)
      .select(col("a_id"), col("b_id"))
  }

  /** Brute-force oracle variant (SURVEY.md J2): cross join + refine. Used
    * by tests to prove the prefilter loses/adds nothing. The predicate is
    * pre-marked refineOnly so a session with the optimizer rules installed
    * (ExtensionSpec) can never rewrite the oracle into the plan under
    * test. */
  def pipBrute(images: DataFrame, spark: SparkSession,
               polys: Seq[Fixtures.Poly] = Fixtures.polys): DataFrame = {
    val polyDf = Fixtures.polygonsDf(spark).where(
      col("poly_id").isin(polys.map(_.polyId): _*))
    images.select(col("image_id"), col("lat"), col("lon"))
      .crossJoin(broadcast(polyDf))
      .filter(G.point_in_poly_refine(col("lat"), col("lon"), col("lats"), col("lons")))
      .select(col("poly_id"), col("image_id"))
  }

  /** Raster↔vector assignment: per (polygon, tile) coverage counts at `res`
    * — which tiles does each polygon touch and how many images fall in each
    * (≙ node→cluster assignment counts, raptor/kmeans_tree_builder.py:
    * 104-120). */
  def polyTileCoverage(images: DataFrame, spark: SparkSession,
                       polys: Seq[Fixtures.Poly] = Fixtures.polys,
                       res: Int = CoverRes): DataFrame =
    pipJoinWithCell(images, spark, polys, res)
      .groupBy(col("poly_id"), col("cell"))
      .agg(count(lit(1)).as("cnt"))

  /** [[pipJoin]] for a vector layer too big to broadcast (a continental
    * parcel/building layer is 10^8-10^9 polygons — no executor holds it):
    * the SAME prefilter + refine semantics, but the covering index joins
    * as a sort-merge equi-join on the cell key — both sides shuffle once
    * on `cell`, AQE's skew split covers hot cells (a metro cell with
    * thousands of polygons AND millions of points), and nothing is
    * collected or broadcast anywhere. The polygon vertex arrays ride the
    * shuffle once; at extreme vertex counts, bucket the index by cell
    * ([[BucketStore]]) so repeated joins pay zero exchanges.
    * SpatialParitySpec pins the plan (SMJ, no broadcast) and parity with
    * [[pipJoin]]; the q_pip_part oracle proves the relation cross-engine. */
  def pipJoinPartitioned(images: DataFrame, spark: SparkSession,
                         polys: Seq[Fixtures.Poly] = Fixtures.polys,
                         res: Int = CoverRes,
                         strategy: TilingStrategy = QuadkeyTiling): DataFrame = {
    val idx = coverIndex(spark, polys, res, strategy)
    val pts = images.select(col("image_id"), col("lat"), col("lon"))
      .withColumn("cell", strategy.encodeCol(col("lat"), col("lon"), res))
    pts.hint("merge").join(idx, Seq("cell"))
      .filter(G.point_in_poly(col("lat"), col("lon"), col("lats"), col("lons")))
      .select(col("poly_id"), col("image_id"))
  }

  /** DISTANCE-RADIUS self-join: every unordered point pair within planar
    * distance `radiusDeg` — the classic spatial range join Spark lacks
    * natively (a `dist <= r` theta join is a nested loop; this is the
    * bucket-and-ring re-expression: linear candidates, one keyed shuffle).
    *
    *  1. pick the coarsest res whose cell EDGE >= r (cell height is the
    *     binding side: 180/2^res), so two points within r are never more
    *     than one cell apart on either axis;
    *  2. the probe side explodes each point to the FORWARD HALF of its
    *     Chebyshev-1 ring — only cells >= its own (<= 5 of the 9,
    *     lon-wrapped); the build side keys by its own cell. A cross-cell
    *     pair is generated exactly once, from the point in the LOWER cell
    *     (the higher cell is in its forward ring; the reverse probe is
    *     filtered out), and a same-cell pair once via `p_id < q_id` —
    *     so the join computes each unordered pair ONCE instead of
    *     once per orientation: half the join output and 5/9 the probe
    *     explosion of the naive full-ring form, no post-join dedup;
    *  3. codegen planar refine; the output orients each pair by id
    *     (least/greatest — dist_sq is orientation-exact in IEEE-754:
    *     negation is exact, squares equal bit-for-bit). Ring wrap
    *     candidates across the antimeridian are refined away by the same
    *     no-wrap planar metric the kNN operators use
    *     ([[graft.geo.GridCell.planarDist2]] note).
    *
    * Scale shape: |candidates| = sum over cells of n_cell x n_ring — local
    * density, never |points|^2; the equi-join on the ring cell shuffles
    * once and AQE's skew split handles a hot cell (same device as
    * q_skew_*). Pairs inside one hot cell are irreducibly quadratic in
    * that cell's population — the radius/res trade callers tune. */
  def distanceJoin(points: DataFrame, radiusDeg: Double): DataFrame = {
    require(radiusDeg > 0.0, s"radius must be positive, got $radiusDeg")
    // coarsest res with cellHeightDeg(res) = 180/2^res >= radius (width
    // 360/2^res is always looser); res caps at the 29-bit packing bound
    val res = math.min(29,
      math.floor(math.log(180.0 / radiusDeg) / math.log(2.0)).toInt)
    val pts = points.select(col("image_id"), col("lat"), col("lon"))
    val probe = pts.toDF("p_id", "p_lat", "p_lon")
      .withColumn("own", G.cell_encode(col("p_lat"), col("p_lon"), res))
      .withColumn("pcell", explode(
        filter(G.cell_ring(col("own"), lit(1)), c => c >= col("own"))))
    val build = pts.toDF("q_id", "q_lat", "q_lon")
      .withColumn("pcell", G.cell_encode(col("q_lat"), col("q_lon"), res))
    probe.join(build, Seq("pcell"))
      // cross-cell pairs come only from the lower cell's probe; same-cell
      // pairs once by id order
      .filter(col("pcell") > col("own") || col("p_id") < col("q_id"))
      .withColumn("dist_sq",
        (col("p_lat") - col("q_lat")) * (col("p_lat") - col("q_lat")) +
          (col("p_lon") - col("q_lon")) * (col("p_lon") - col("q_lon")))
      .filter(col("dist_sq") <= lit(radiusDeg * radiusDeg))
      .select(
        least(col("p_id"), col("q_id")).as("a_id"),
        greatest(col("p_id"), col("q_id")).as("b_id"),
        col("dist_sq"))
  }

  private def pipJoinWithCell(images: DataFrame, spark: SparkSession,
                              polys: Seq[Fixtures.Poly], res: Int): DataFrame = {
    val idx = coverIndex(spark, polys, res)
    val pts = images.select(col("image_id"), col("lat"), col("lon"))
      .withColumn("cell", G.cell_encode(col("lat"), col("lon"), res))
    pts.join(broadcast(idx), Seq("cell"))
      .filter(G.point_in_poly(col("lat"), col("lon"), col("lats"), col("lons")))
      .select(col("poly_id"), col("cell"), col("image_id"))
  }
}
