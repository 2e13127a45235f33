package graft

import org.apache.spark.sql.functions._

import graft.geo.{functions => G, S2Cell}
import graft.sources.Images

/** The tile pyramid over the S2-style index: the rollup shape is
  * index-agnostic (groupBy(parent-of-cell)), so swapping the cell function
  * must conserve totals and respect containment. */
class S2PyramidSpec extends SparkFunSuite {

  test("s2 rollup chain conserves counts and parents contain children") {
    val imgs = Images.images(spark, SparkSpec.Sf)
    val leaf = imgs
      .withColumn("cell", G.s2_encode(col("lat"), col("lon"), 12))
      .groupBy(col("cell")).agg(count(lit(1)).as("cnt"))
    val up = leaf
      .withColumn("parent", G.s2_parent_at(col("cell"), 10))
      .groupBy(col("parent")).agg(sum(col("cnt")).as("cnt"))

    val total = imgs.count()
    assert(leaf.agg(sum(col("cnt"))).first().getLong(0) == total)
    assert(up.agg(sum(col("cnt"))).first().getLong(0) == total)
    assert(up.count() <= leaf.count())

    // spot containment: every leaf cell's level-10 parent contains it
    leaf.select(col("cell")).limit(200).collect().foreach { r =>
      val c = r.getLong(0)
      assert(S2Cell.contains(S2Cell.parentAt(c, 10), c))
      assert(S2Cell.level(c) == 12)
    }
  }
}
