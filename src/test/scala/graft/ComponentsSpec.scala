package graft

import graft.dedup.Components

/** Connected components: distributed hash-to-min vs a driver union-find
  * truth, plus the pointer-jump convergence-rate pin (the whole point of
  * the jump: O(log diameter) rounds on a path, not O(diameter)). */
class ComponentsSpec extends SparkFunSuite {

  private def cc(nodes: Seq[Int], edges: Seq[(Int, Int)],
                 maxIters: Int = 30) = {
    import spark.implicits._
    Components.ccWithIters(nodes.toDF("id"), edges.toDF("a", "b"), maxIters)
  }

  /** Driver-side union-find with min-id rooting (roots stay the component
    * minimum because the larger root is always pointed at the smaller). */
  private def truth(nodes: Seq[Int], edges: Seq[(Int, Int)]): Map[Int, Int] = {
    val parent = scala.collection.mutable.Map(nodes.map(v => v -> v): _*)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(v => v -> find(v)).toMap
  }

  test("random graphs == union-find truth (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    (0 until 4).foreach { _ =>
      val n = 120
      val nodes = 0 until n
      val edges = Seq.fill(80)((rnd.nextInt(n), rnd.nextInt(n)))
        .filter(p => p._1 != p._2)
      val (df, _) = cc(nodes, edges)
      val got = df.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      assert(got == truth(nodes, edges))
    }
  }

  test("path graph: pointer jumping converges in O(log n) rounds") {
    val n = 256
    val nodes = 0 until n
    val edges = (0 until n - 1).map(i => (i, i + 1))
    val (df, iters) = cc(nodes, edges, maxIters = 16)
    val got = df.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(got == nodes.map(_ -> 0).toMap)
    // plain min-propagation would need ~n rounds on a path; the jump
    // roughly doubles label reach per round (~log2 256 = 8, + fixpoint
    // detection round + slack)
    assert(iters <= 12, s"took $iters rounds for a 256-path")
  }

  test("singletons label themselves; duplicate/reversed edges are fine") {
    val (df, _) = cc(Seq(1, 2, 3, 9), Seq((2, 3), (3, 2), (2, 3)))
    assert(df.collect().map(r => (r.getInt(0), r.getInt(1))).toSet ==
      Set((1, 1), (2, 2), (3, 2), (9, 9)))
  }

  test("cache hygiene: repeated runs do not accumulate persisted RDDs") {
    def persisted = spark.sparkContext.getPersistentRDDs.size
    val (d1, _) = cc(0 until 50, Seq((0, 1), (1, 2), (30, 40)))
    d1.collect()
    val after1 = persisted
    val (d2, _) = cc(0 until 50, Seq((0, 1), (1, 2), (30, 40)))
    d2.collect()
    // only each run's own final localCheckpoint (the returned result) may
    // remain — intermediates and the edge cache are released per run
    assert(persisted <= after1 + 1, s"grew $after1 -> $persisted")
  }
}
