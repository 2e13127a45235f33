package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe on local-cluster (multi-JVM executors): N vs 4N executors. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val nExec = sys.env.getOrElse("SPARK_GRAFT_EXECUTORS", "2").toInt
    val coresPerExec = 4
    val spark = SparkSession.builder()
      .master(s"local-cluster[$nExec,$coresPerExec,4096]")
      .config("spark.sql.shuffle.partitions", nExec * coresPerExec * 2)
      .config("spark.executor.memory", "3g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 2000000000L
    val df = spark.range(0, n, 1, nExec * coresPerExec * 2)
      .select((pmod(col("id"), lit(2147483648L)) * 1103515245L + 12345L).as("x"))
      .select(shiftrightunsigned(col("x"), 17).as("h"))
      .groupBy(pmod(col("h"), lit(65536)).as("cell")).count()
    df.count() // warmup
    val t0 = System.nanoTime()
    df.count()
    println(f"[probe] executors=$nExec cores=${nExec * coresPerExec} sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
