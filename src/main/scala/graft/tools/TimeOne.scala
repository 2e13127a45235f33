package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway single-query timer: runMain graft.tools.TimeOne <query> [sfDir] [reps]. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-timeone")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "48g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Images.images(spark, sfDir).count() // shared warmup
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[timeone] $name rep$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
