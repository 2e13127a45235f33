package graft

import org.apache.spark.sql.functions._

/** The AQE half of the skew story (SCALE.md "salting or AQE skew-join"):
  * SkewSpec pins the MANUAL adaptive-salt plan; this suite pins that the
  * runtime itself splits a hot-cell join partition when no salt is applied
  * — the "viral landmark" scenario where one cell holds most of the corpus.
  * Thresholds are scaled down to sandbox bytes; the DECISION (hot partition
  * > factor x median and > threshold) is the same one a 100 TB run makes
  * with production thresholds.
  *
  * Plan-shape caveat the test encodes: `OptimizeSkewedJoin` only matches a
  * sort-merge join whose children are Sort DIRECTLY over the shuffle stage
  * — an aggregate between them (e.g. a `distinct` building the dim side)
  * hides the skew from the rule. Dims built by union/filter keep the
  * pattern intact; that is also the production guidance: materialize dims
  * BEFORE the hot join. */
class AqeSkewSpec extends SparkFunSuite {

  private val TunedKeys = Seq(
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "10KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    // isolate the skew split from partition coalescing for a stable assert
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  test("AQE splits the hot-cell join partition at runtime (skew=true)") {
    val saved = TunedKeys.map { case (k, _) =>
      k -> scala.util.Try(Option(spark.conf.get(k))).toOption.flatten
    }
    try {
      TunedKeys.foreach { case (k, v) => spark.conf.set(k, v) }
      // 90% of tile rows land on ONE cell; md5 payload resists shuffle
      // compression so the hot partition clears the tuned threshold.
      val tiles = spark.range(60000).select(
        when(col("id") % 10 < 9, lit(7L)).otherwise(col("id")).as("cell"),
        md5(col("id").cast("string")).as("payload"))
      val dims = spark.range(60000).filter(col("id") % 10 >= 9)
        .union(spark.range(7, 8))
        .select(col("id").as("cell"), (col("id") * 2).as("attr"))
      val joined = tiles.join(dims, Seq("cell"))
      // collect() (not count()) — count spawns its OWN QueryExecution and
      // would leave this one's AQE plan unfinalized
      assert(joined.collect().length == 60000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin(skew=true)"),
        s"AQE did not mark the skewed join:\n$plan")
      assert(plan.contains("AQEShuffleRead skewed"),
        s"hot partition was not split into chunk reads:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
