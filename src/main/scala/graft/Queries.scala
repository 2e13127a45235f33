package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.PhashCentroid
import graft.operators._
import graft.sources.Images

/** Registry of every named operator query the engine exposes (SURVEY.md §2
  * inventory → SparkEntry contract). Each entry carries the Spark plan
  * builder and, where expressible, the DuckDB oracle SQL over the same
  * parquet tables. */
object Queries {

  case class Q(name: String,
               fn: (SparkSession, String) => DataFrame,
               oracle: Option[String])

  private val cte = Images.oracleCte
  private def cellSql(res: Int) = Images.oracleCellSql("lat", "lon", res)

  // -------------------------------------------------------- tile assignment

  /** Raster<->vector tile assignment + per-tile rollup at res 7 — the
    * "minimum slice" flagship (SURVEY.md §7.2 M2; ≙ node->cluster assignment,
    * raptor/kmeans_tree_builder.py:104-105). */
  private val qTileAssign = Q(
    "q_tile_assign",
    (s, dir) => TilePyramid.leafTiles(Images.images(s, dir), 7)
      .select("cell", "cnt", "bytes_sum", "lat_min", "lat_max",
        "lon_min", "lon_max", "phash_centroid"),
    Some(
      s"""$cte
         |SELECT cell,
         |  CAST(count(*) AS BIGINT) AS cnt,
         |  CAST(sum(w * h * 3) AS BIGINT) AS bytes_sum,
         |  min(lat) AS lat_min, max(lat) AS lat_max,
         |  min(lon) AS lon_min, max(lon) AS lon_max,
         |  ${PhashCentroid.oracleCentroidSql("phash")} AS phash_centroid
         |FROM (SELECT ${cellSql(7)} AS cell, * FROM images) t
         |GROUP BY cell""".stripMargin))

  /** Full pyramid build 12 -> 5, emitting the res-5 level. The oracle groups
    * the leaves at res 5 directly, so equality proves the 7-level rollup
    * chain is exactly associative (partial+final == single pass). */
  private val qPyramidRes5 = Q(
    "q_pyramid_res5",
    (s, dir) => {
      val (pyr, _) = TilePyramid.build(Images.images(s, dir), 5, 12)
      pyr.filter(col("res") === 5)
        .select("cell", "cnt", "bytes_sum", "lat_min", "lat_max",
          "lon_min", "lon_max", "phash_centroid")
    },
    Some(
      s"""$cte
         |SELECT cell,
         |  CAST(count(*) AS BIGINT) AS cnt,
         |  CAST(sum(w * h * 3) AS BIGINT) AS bytes_sum,
         |  min(lat) AS lat_min, max(lat) AS lat_max,
         |  min(lon) AS lon_min, max(lon) AS lon_max,
         |  ${PhashCentroid.oracleCentroidSql("phash")} AS phash_centroid
         |FROM (SELECT ${cellSql(5)} AS cell, * FROM images) t
         |GROUP BY cell""".stripMargin))

  val all: Seq[Q] = Seq(
    qTileAssign,
    qPyramidRes5)

  lazy val queryMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap
  lazy val oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
