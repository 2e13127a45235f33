package graft

import org.apache.spark.sql.functions._

/** Hand-computed fixtures for [[graft.graph.Graph]] — the oracle replays
  * the same integer formula, so these pin the SEMANTICS (damping, dangling
  * mass, tie-breaks, isolated nodes) independently of the replay. */
class GraphSpec extends SparkFunSuite {
  import graft.graph.Graph

  private def nodes(ids: String*) =
    spark.createDataFrame(ids.map(Tuple1(_))).toDF("id")

  private def edges(es: (String, String)*) =
    spark.createDataFrame(es).toDF("src", "dst")

  test("pageRank: 3 integer rounds match the hand-unrolled fixpoint " +
    "(damping 85/100 at scale 1e6, dangling mass dropped, isolated node " +
    "keeps teleport mass)") {
    // a→b, a→c, b→c, c→a; d isolated. deg: a=2, b=1, c=1.
    val got = Graph.pageRank(
      nodes("a", "b", "c", "d"),
      edges("a" -> "b", "a" -> "c", "b" -> "c", "c" -> "a"), iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // r1: a=1000000 b=575000 c=1425000 d=150000
    // r2: a=1361250 b=575000 c=1063750 d=150000
    // r3: a=150000+85*1063750 div 100          = 1054187
    //     b=150000+85*(1361250 div 2) div 100  =  728531
    //     c=150000+85*(680625+575000) div 100  = 1217281
    val want = Set(("a", 1054187L, 2L), ("b", 728531L, 1L),
      ("c", 1217281L, 1L), ("d", 150000L, 0L))
    assert(got == want)
  }

  test("pageRank: teleport-only graph (no edges) gives every node 150000 " +
    "after one round") {
    val got = Graph.pageRank(nodes("a", "b"), edges(), iters = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 150000L, 0L), ("b", 150000L, 0L)))
  }

  test("labelPropagate: majority wins, tie breaks to the smallest label, " +
    "isolated node keeps its own with 0 votes") {
    val labels = spark.createDataFrame(Seq(
      "a" -> "x", "b" -> "y", "c" -> "y", "d" -> "z", "e" -> "q"))
      .toDF("id", "lbl")
    // a's nbrs: b(y), c(y), d(z) → y with 2 votes
    // e's nbrs: a(x), b(y)       → 1-1 tie → x (smallest)
    // b's nbr:  c(y)             → y, 1
    // c's nbr:  a(x)             → x, 1
    // d: isolated                → z, 0
    val got = Graph.labelPropagate(labels,
      edges("a" -> "b", "a" -> "c", "a" -> "d",
        "b" -> "c", "c" -> "a", "e" -> "a", "e" -> "b"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    val want = Set(
      ("a", "x", "y", 2L), ("b", "y", "y", 1L), ("c", "y", "x", 1L),
      ("d", "z", "z", 0L), ("e", "q", "x", 1L))
    assert(got == want)
  }

  test("pageRank plan: each round is keyed join + keyed agg — no cartesian " +
    "product, no partitionless window") {
    val plan = Graph.pageRank(nodes("a", "b"),
      edges("a" -> "b"), iters = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("Window ["))
  }

  test("gridBfs: distance labels match a driver-side BFS replay " +
    "(rook adjacency, lon wrap, lat clamp, maxDist cutoff)") {
    import org.apache.spark.sql.functions._
    val res = 6; val dim = 1L << res; val maxDist = 8
    val occ = graft.sources.Images.images(spark, SparkSpec.Sf)
      .withColumn("cell",
        graft.geo.functions.cell_encode(col("lat"), col("lon"), res))
      .groupBy("cell").agg(count(lit(1)).as("cnt"))
    val seeds = occ.orderBy(col("cnt").desc, col("cell"))
      .limit(3).select("cell")
    val got = Graph.gridBfs(occ, seeds, res, maxDist)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap

    // driver truth: textbook queue BFS over the collected occupied grid
    val cnt = occ.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seedCells = cnt.toSeq.sortBy { case (c, n) => (-n, c) }
      .take(3).map(_._1)
    val dist = scala.collection.mutable.Map(seedCells.map(_ -> 0): _*)
    var frontier = seedCells.toSet
    for (d <- 1 to maxDist) {
      frontier = frontier.flatMap { c =>
        val x = c & (dim - 1); val y = (c >> res) & (dim - 1)
        Seq((1L, 0L), (-1L, 0L), (0L, 1L), (0L, -1L)).flatMap { case (dx, dy) =>
          val ny = y + dy
          if (ny < 0 || ny >= dim) None
          else Some((res.toLong << 58) | (ny << res) | (((x + dx) % dim + dim) % dim))
        }
      }.filter(c => cnt.contains(c) && !dist.contains(c))
      frontier.foreach(dist(_) = d)
    }
    assert(got.keySet === dist.keySet)
    for ((c, d) <- dist) assert(got(c) === ((d, cnt(c))), s"cell=$c")
  }
}
