package graft

import org.apache.spark.sql.functions._

import graft.geo.{functions => G, GridCell}
import graft.operators.CellCompact
import graft.sources.Images

/** Quadtree compaction (CellCompact, ≙ H3 compact/uncompact): the driver
  * gate proves the level-substitution arithmetic cross-engine (q_compact);
  * these pin the OPERATOR CONTRACT — compact is lossless (uncompact
  * restores exactly the input leaf set), minimal per level (no remaining
  * complete quad), and ancestor-free (no output cell covers another). */
class CompactSpec extends SparkFunSuite {

  private def leafSet(cells: Seq[Long]) = {
    import spark.implicits._
    cells.toDF("cell")
  }

  test("hand fixture: a full quad collapses, a lone leaf survives") {
    // all 16 res-9 descendants of one res-7 cell -> that res-7 cell;
    // plus one lone res-9 leaf elsewhere -> itself
    val p7 = GridCell.encode(10.0, 10.0, 7)
    val full = (0 until 16).map { i =>
      GridCell.pack(9, (GridCell.xOf(p7) << 2) + (i & 3),
        (GridCell.yOf(p7) << 2) + (i >> 2))
    }
    val lone = GridCell.encode(40.0, 100.0, 9)
    val out = CellCompact.compact(leafSet(full :+ lone), 9, 5)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(p7, lone))
  }

  test("uncompact(compact(S)) == S and the output is ancestor-free " +
      "(seeded random leaf sets)") {
    val rnd = new scala.util.Random(7)
    (0 until 3).foreach { _ =>
      // dense random set so real merging happens
      val leaves = (0 until 2000).map { _ =>
        GridCell.pack(8, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
      }.distinct
      val compact = CellCompact.compact(leafSet(leaves), 8, 4)
        .collect().map(_.getLong(0))
      assert(compact.length < leaves.length, "no merging happened")
      // lossless: expanding back yields exactly the input set
      val restored = CellCompact
        .uncompact(leafSet(compact.toSeq), 8)
        .collect().map(_.getLong(0))
      assert(restored.length == restored.distinct.length, "overlap")
      assert(restored.toSet == leaves.toSet)
      // ancestor-free: no compact cell is an ancestor of another
      val bySet = compact.toSet
      compact.foreach { c =>
        var r = GridCell.resOf(c)
        var cur = c
        while (r > 4) {
          cur = GridCell.parent(cur); r -= 1
          assert(!bySet.contains(cur), s"ancestor pair in compact set")
        }
      }
      // minimal: no complete quad remains at any res
      compact.groupBy(c => GridCell.parent(c)).foreach { case (_, g) =>
        assert(g.length < 4 ||
          g.map(GridCell.resOf).exists(_ == 4), // res-4 floor may hold 4
          "un-merged complete quad")
      }
    }
  }

  test("q_compact engine path agrees with independent per-level replay " +
      "on the real table") {
    val leaves = Images.images(spark, SparkSpec.Sf)
      .select(G.cell_encode(col("lat"), col("lon"), 6).as("cell"))
      .distinct()
    val compact = CellCompact.compact(leaves, 6, 4)
      .collect().map(_.getLong(0))
    // conservation of area: expanding back to res 6 restores the leaves
    val back = CellCompact
      .uncompact(leafSet(compact.toSeq.toIndexedSeq), 6)
      .collect().map(_.getLong(0)).toSet
    val want = leaves.collect().map(_.getLong(0)).toSet
    assert(back == want)
    assert(compact.length < want.size)
  }
}
