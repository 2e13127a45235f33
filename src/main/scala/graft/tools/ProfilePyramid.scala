package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.TilePyramid
import graft.sources.Images

/** Scratch profiler for the pyramid build (not part of the driver contract). */
object ProfilePyramid {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val imgs = Images.images(spark, "/root/testdata/sf0.1")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[prof] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val (pyr, counts) = time("build(5,12) plan+counts")(TilePyramid.build(imgs, 5, 12))
    time("pyramid res5 action")(pyr.filter(org.apache.spark.sql.functions.col("res") === 5).count())
    println(s"[prof] counts=$counts")
    spark.stop()
  }
}
