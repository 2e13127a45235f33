package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed row models (input_hint: "typed Dataset/DataFrame + Catalyst").
  * The DataFrame API remains the engine's plan-building surface (schemas
  * stay dynamic through aggregations), and these case-class views give
  * type-safe access at the API boundary — `Dataset[ImageRow]` in,
  * `Dataset[TileNode]` out (≙ the reference's `Node`/`Tree` classes,
  * raptor/tree_structures.py:4-29, re-expressed as encoder-backed rows). */
object model {

  /** One image+caption row (BASELINE.json input_hint shape; `bytes` is
    * attached separately by Images.imagesWithBytes to keep scans pruned). */
  final case class ImageRow(image_id: String, lat: Double, lon: Double,
                            w: Int, h: Int, fmt: String, caption: String,
                            phash: Long)

  /** One tile of the pyramid (≙ Node: cell is the id, res the layer,
    * the aggregates the summary, phash_centroid the "embedding"). */
  final case class TileNode(cell: Long, res: Int, cnt: Long, bytes_sum: Long,
                            lat_min: Double, lat_max: Double,
                            lon_min: Double, lon_max: Double,
                            phash_centroid: Long)

  def images(spark: SparkSession, sfDir: String): Dataset[ImageRow] = {
    import spark.implicits._
    sources.Images.images(spark, sfDir)
      .select("image_id", "lat", "lon", "w", "h", "fmt", "caption", "phash")
      .as[ImageRow]
  }

  def tiles(spark: SparkSession, sfDir: String, minRes: Int, maxRes: Int)
      : Dataset[TileNode] = {
    import spark.implicits._
    val (pyr, _) = operators.TilePyramid.build(
      sources.Images.images(spark, sfDir), minRes, maxRes)
    pyr.select("cell", "res", "cnt", "bytes_sum", "lat_min", "lat_max",
        "lon_min", "lon_max", "phash_centroid")
      .as[TileNode]
  }
}
