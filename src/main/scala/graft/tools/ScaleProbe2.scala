package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe without groupBy: select arithmetic + global count only. */
object ScaleProbe2 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 4000000000L
    val df = spark.range(0, n, 1, cpus * 2)
      .select((pmod(col("id"), lit(2147483648L)) * 1103515245L + 12345L).as("x"))
      .filter(shiftrightunsigned(col("x"), 11) % 1000 < 2)
    df.count() // warmup
    val t0 = System.nanoTime()
    df.count()
    println(f"[probe2] cpus=$cpus sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
