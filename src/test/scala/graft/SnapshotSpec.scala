package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Snapshot, TilePyramid}
import graft.sources.Images

/** Snapshot write/read/resume (SURVEY.md §5.7 resume test): rebuild from a
  * leaf-only checkpoint must reproduce the original pyramid exactly. */
class SnapshotSpec extends SparkFunSuite {

  private def images = Images.images(spark, SparkSpec.Sf)

  /** Order-insensitive frame compare on the rollup columns. */
  private def canon(df: DataFrame): Set[String] =
    df.select("res", "cell", "cnt", "bytes_sum", "lat_min", "lat_max",
        "lon_min", "lon_max", "phash_centroid")
      .collect()
      .map(_.mkString("|"))
      .toSet

  test("snapshot round-trip + rebuild-from-leaves reproduces the pyramid") {
    val root = Files.createTempDirectory("graft-snap-spec").toString
    val (pyr, counts) = TilePyramid.build(images, 8, 12)
    val manifest = Snapshot.write(pyr, root, "snapA", buildTs = 7L)
    assert(manifest == counts, "manifest counts must match build counts")

    // read back: identical content (modulo lineage cols)
    val back = Snapshot.read(spark, root)
    assert(canon(back) == canon(pyr))
    assert(Snapshot.LineageCols.forall(back.columns.contains))

    // resume from leaves only -> upper levels identical to original build
    val rebuilt = Snapshot.rebuildFromLeaves(spark, root, 12, 8)
    assert(canon(rebuilt) == canon(pyr))
  }

  test("level read is partition-pruned (res is a partition dir)") {
    val root = Files.createTempDirectory("graft-snap-prune").toString
    Snapshot.write(TilePyramid.build(images, 10, 12)._1, root, "snapB", 1L)
    val dirs = new java.io.File(s"$root/tiles").listFiles().map(_.getName).toSet
    assert(Set("res=10", "res=11", "res=12").subsetOf(dirs))
    val one = Snapshot.level(spark, root, 11)
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && one.count() > 0)
    assert(one.select(countDistinct(col("res"))).first().getLong(0) == 1)
  }

  test("lineage metrics cover every level and sum to image count") {
    val root = Files.createTempDirectory("graft-snap-lin").toString
    Snapshot.write(TilePyramid.build(images, 10, 12)._1, root, "snapC", 2L)
    val lm = Snapshot.lineageMetrics(spark, root)
    val perRes = lm.groupBy(col("res")).agg(sum(col("n_images")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = images.count()
    assert(perRes.keySet == Set(10, 11, 12))
    assert(perRes.values.forall(_ == total),
      "every level must account for every image")
  }
}
