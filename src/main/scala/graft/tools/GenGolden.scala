package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generates the committed golden fixture (images_tiny res-7 tiles). */
object GenGolden {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tiny = graft.sources.Images.imagesTiny(spark)
    val tiles = graft.operators.TilePyramid.leafTiles(tiny, 7)
      .select("cell", "cnt", "bytes_sum", "phash_centroid")
      .orderBy("cell").collect()
    tiles.foreach { r =>
      println(s"GOLD|${r.getLong(0)}|${r.getLong(1)}|${r.getLong(2)}|${r.getLong(3)}")
    }
    val pip = graft.operators.SpatialJoin.pipJoin(tiny, spark)
      .orderBy("poly_id", "image_id").collect()
    pip.foreach(r => println(s"GOLDP|${r.getString(0)}|${r.getString(1)}"))
    spark.stop()
  }
}
