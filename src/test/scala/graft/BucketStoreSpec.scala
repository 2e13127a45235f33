package graft

import org.apache.spark.sql.functions._

import graft.operators.BucketStore
import graft.sources.Images

/** The bucketed tile store (operators/BucketStore.scala) — proves the
  * co-location claims, not just the row values:
  *  - a join of two identically bucketed tables plans with ZERO shuffle
  *    exchanges (the 100 TB payoff);
  *  - the write emits exactly one file per bucket (task hash aligned with
  *    bucket hash), the layout that also lets the sort-merge join skip
  *    its sorts;
  *  - results equal the direct (shuffling) join bit-for-bit. */
class BucketStoreSpec extends SparkFunSuite {

  private lazy val tiles = {
    val imgs = Images.imagesTiny(spark)
      .withColumn("cell", graft.geo.functions.cell_encode(
        col("lat"), col("lon"), 6))
    val counts = imgs.groupBy("cell").agg(count(lit(1)).as("cnt"))
    val bounds = imgs.groupBy("cell").agg(
      min(col("phash")).as("phash_min"), max(col("phash")).as("phash_max"))
    BucketStore.write(counts, "bktspec_counts", nBuckets = 4)
    BucketStore.write(bounds, "bktspec_bounds", nBuckets = 4)
    (counts, bounds)
  }

  test("colocated join: zero shuffle exchanges, bucketed scans feed SMJ") {
    tiles
    val joined = BucketStore.colocatedJoin(spark, "bktspec_counts",
      "bktspec_bounds")
    joined.collect() // finalize AQE
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join should not shuffle:\n$plan")
    assert(plan.contains("Bucketed: true"),
      s"scans should carry the catalog bucketing:\n$plan")
    // Spark 3+ re-sorts bucket files (partition-LOCAL, no exchange) unless
    // the legacy one-file-per-bucket sorted-scan flag is on — the residual
    // Sort here moves zero bytes between executors.
  }

  test("write emits exactly one file per bucket") {
    tiles
    val files = BucketStore.table(spark, "bktspec_counts")
      .select(input_file_name()).distinct().count()
    assert(files == 4, s"expected 4 bucket files, got $files")
  }

  test("parity: colocated join == direct join") {
    val (counts, bounds) = tiles
    val direct = counts.join(bounds, Seq("cell"))
    val joined = BucketStore.colocatedJoin(spark, "bktspec_counts",
      "bktspec_bounds")
      .select(direct.columns.map(col).toIndexedSeq: _*)
    assert(joined.exceptAll(direct).isEmpty && direct.exceptAll(joined).isEmpty)
  }

  test("a failed rewrite leaves the previous table intact (staged write)") {
    tiles
    val rowsBefore = BucketStore.table(spark, "bktspec_counts").count()
    val poisoned = BucketStore.table(spark, "bktspec_counts")
      .withColumn("cnt", expr("assert_true(cnt < 0, 'boom')"))
    intercept[Exception] {
      BucketStore.write(poisoned, "bktspec_counts", nBuckets = 4)
    }
    // old table survived the failed job; no staging table lingers
    assert(BucketStore.table(spark, "bktspec_counts").count() == rowsBefore)
    assert(!spark.catalog.tableExists("bktspec_counts__staging"))
  }

  test("groupBy on the bucket key also plans without an exchange") {
    tiles
    val agg = BucketStore.table(spark, "bktspec_counts")
      .groupBy("cell").agg(sum(col("cnt")).as("s"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed groupBy should not shuffle:\n$plan")
  }
}
