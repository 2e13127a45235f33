package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dumps per-stage wall/task stats for the headline tile-assign job. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = mutable.ArrayBuffer.empty[(Int, Int, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        stages += ((i.stageId, i.numTasks,
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          i.taskMetrics.executorRunTime + 0))
        println(s"[gc] stage=${i.stageId} run=${i.taskMetrics.executorRunTime} gc=${i.taskMetrics.jvmGCTime} cpu=${i.taskMetrics.executorCpuTime/1000000}")
      }
    })
    val imgs = graft.sources.Images.imagesReplicated(spark, "/root/testdata/sf0.1", 400)
    def assign() = {
      import graft.geo.{functions => G}
      imgs.withColumn("cell", G.cell_encode(col("lat"), col("lon"), 8))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("cnt"),
          sum((col("w") * col("h") * 3).cast("long")).as("bytes_sum"),
          min(col("lat")).as("lat_min"), max(col("lat")).as("lat_max"),
          min(col("lon")).as("lon_min"), max(col("lon")).as("lon_max"))
        .count()
    }
    assign() // warmup
    stages.clear()
    val t0 = System.nanoTime()
    assign()
    println(f"[stage] TOTAL wall ${(System.nanoTime() - t0) / 1e9}%.2f s (cpus=$cpus)")
    stages.foreach { case (id, n, wall, run) =>
      println(f"[stage] id=$id tasks=$n wall=${wall / 1e3}%.2f s taskRunSum=${run / 1e3}%.2f s")
    }
    spark.stop()
  }
}
