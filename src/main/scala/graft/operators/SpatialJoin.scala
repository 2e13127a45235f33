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
