package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the `simple` physical plan of named registry queries (scratch
  * audit aid; PLANS.md carries the curated `formatted` dumps). */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    args(0).split(",").foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      println(s"===== $name =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple")))
    }
    spark.stop()
  }
}
