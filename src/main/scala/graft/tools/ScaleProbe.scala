package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolates local[n] scaling on pure codegen arithmetic (no IO, no joins). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val heavy = sys.env.get("SPARK_GRAFT_HEAVY").contains("1")
    val n = if (heavy) 200000000L else 2000000000L
    val base = spark.range(0, n, 1, cpus * 2)
      .select((pmod(col("id"), lit(2147483648L)) * 1103515245L + 12345L).as("x"))
    val df =
      if (heavy)
        base.select((col("x") % 180000000L).cast("double").divide(1e6).as("lat"),
            (col("x") % 360000000L).cast("double").divide(1e6).as("lon"))
          .select(graft.geo.functions.haversine_m(col("lat"), col("lon"),
            lit(37.0), lit(-122.0)).as("d"))
          .groupBy(floor(col("d") / 1e6).cast("long").as("b")).count()
      else
        base.select(shiftrightunsigned(col("x"), 17).as("h"))
          .groupBy(pmod(col("h"), lit(65536)).as("cell")).count()
    df.count() // warmup
    val t0 = System.nanoTime()
    df.count()
    println(f"[probe] cpus=$cpus rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
