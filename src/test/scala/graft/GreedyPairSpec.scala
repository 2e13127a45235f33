package graft

import org.apache.spark.sql.functions._

import graft.operators.{PairMerge, TilePyramid}
import graft.sources.Images

/** J6 exclusive greedy pairing: the distributed flatMapGroups operator
  * must equal an independent driver-side recomputation of the same
  * deterministic contract, and conserve the pool exactly (every tile used
  * once — the reference's `used` set semantics,
  * raptor/merge_tree_builder.py:334-364). */
class GreedyPairSpec extends SparkFunSuite {

  private val GroupRes = 6
  private val TileRes = 8

  private def tiles = TilePyramid.leafTiles(
    Images.images(spark, SparkSpec.Sf), TileRes)

  test("distributed greedy merge == driver-side recomputation") {
    val got = PairMerge.greedyPairMerge(tiles, GroupRes)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5), r.getLong(6)))
      .toSet

    // independent recomputation from the raw tile rows
    val raw = tiles.select(col("cell"), col("cnt"), col("bytes_sum"),
        ((col("lat_min") + col("lat_max")) / 2.0).as("lat_c"),
        ((col("lon_min") + col("lon_max")) / 2.0).as("lon_c"))
      .collect()
      .map { r =>
        val cell = r.getLong(0)
        PairMerge.TileIn(graft.geo.GridCell.parentAt(cell, GroupRes), cell,
          r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      }
    val want = raw.groupBy(_.parent).toSeq.flatMap { case (p, ts) =>
      PairMerge.matchGroup(p, ts.toSeq)
    }.map(m => (m.parent, m.cell, m.cell_a, m.cell_b, m.merged,
      m.cnt, m.bytes_sum)).toSet

    assert(got == want)
    assert(got.exists(_._5), "fixture must produce at least one real pair")
  }

  test("two-layer merge tree: layer counts, containment, conservation " +
      "(test_merge_layer.py:63-124 invariants)") {
    val K2 = 6
    val (layer1, layer2) = PairMerge.mergeTree(tiles, GroupRes, K2)
    val l1 = layer1.collect()
    val l2 = layer2.collect()
    // |layer1| = sum over neighborhoods of ceil(m/2) — exclusive pairing
    val perParent = tiles.select(
        graft.geo.functions.cell_parent_at(col("cell"), GroupRes).as("p"))
      .groupBy(col("p")).count().collect().map(_.getLong(1))
    assert(l1.length == perParent.map(m => (m + 1) / 2).sum)
    // every layer-1 node lands in exactly one layer-2 cluster
    assert(l2.map(_.getLong(1)).sum == l1.length.toLong,
      "layer-2 children must partition layer 1")
    // <= requested cluster count, and a real multi-cluster split
    assert(l2.length <= K2 && l2.length > 1)
    // image counts conserved leaves -> layer 1 -> layer 2
    val leafCnt = tiles.agg(sum(col("cnt"))).first().getLong(0)
    assert(l1.map(_.getAs[Long]("cnt")).sum == leafCnt)
    assert(l2.map(_.getAs[Long]("cnt")).sum == leafCnt)
  }

  test("pairing conserves the pool: every tile used exactly once, totals kept") {
    val merged = PairMerge.greedyPairMerge(tiles, GroupRes)
    val usedCells = merged.collect().flatMap { r =>
      val (a, b, isPair) = (r.getLong(2), r.getLong(3), r.getBoolean(4))
      if (isPair) Seq(a, b) else Seq(a)
    }
    assert(usedCells.length == usedCells.distinct.length, "a tile merged twice")
    assert(usedCells.length == tiles.count(), "a tile vanished")
    val totalCnt = merged.agg(sum(col("cnt"))).first().getLong(0)
    val wantCnt = tiles.agg(sum(col("cnt"))).first().getLong(0)
    assert(totalCnt == wantCnt, "image counts not conserved")
  }
}
