package graft

import org.apache.spark.sql.functions._

/** Semantics + plan-shape pins for q_skyline (Pareto frontier) and
  * q_mutual_knn (symmetric kNN refinement). */
class ParetoSpec extends SparkFunSuite {

  test("q_skyline equals the brute-force Pareto frontier") {
    import graft.geo.{functions => G}
    val g = graft.sources.Images.images(spark, SparkSpec.Sf)
      .withColumn("c", G.cell_encode(col("lat"), col("lon"), 7))
      .groupBy("c").agg(count(lit(1)).as("cnt"))
      .collect().map { r =>
        val c = r.getLong(0)
        val dx = (c & 127L) - 64L
        val dy = ((c >> 7) & 127L) - 64L
        (c, dx * dx + dy * dy, r.getLong(1))
      }
    val brute = g.filter { case (cell, d2, cnt) =>
      !g.exists { case (qc, qd2, qcnt) =>
        qc != cell && qd2 <= d2 && qcnt >= cnt && (qd2 < d2 || qcnt > cnt)
      }
    }.map(t => (t._1, t._2, t._3)).toSet
    val engine = Queries.queryMap("q_skyline")(spark, SparkSpec.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(engine == brute)
    assert(engine.nonEmpty)
  }

  test("q_skyline plan: dominance check is keyed, not data-sized nested loop") {
    val plan = Queries.queryMap("q_skyline")(spark, SparkSpec.Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the ONLY nested-loop is the <=253-bucket prefix-max (broadcast-tiny)
    val nl = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(nl <= 1, s"expected at most the bucket prefix-max NL join, got $nl")
  }

  test("q_mutual_knn: every pair is mutual, unordered, and d2-consistent") {
    import graft.operators.Knn
    val images = graft.sources.Images.images(spark, SparkSpec.Sf)
    val e = Knn.knnSelfJoin(images, 3, 8)
      .collect().map(r => (r.getAs[String]("qid"), r.getAs[String]("nid")) ->
        r.getAs[Long]("d2")).toMap
    val pairs = Queries.queryMap("q_mutual_knn")(spark, SparkSpec.Sf).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (a, b, d2) = (r.getAs[String]("id_a"), r.getAs[String]("id_b"),
        r.getAs[Long]("d2"))
      assert(a < b)
      assert(e.get((a, b)).contains(d2), s"$a->$b missing or d2 mismatch")
      assert(e.get((b, a)).contains(d2), s"$b->$a not mutual")
    }
    // completeness: every mutual directed pair surfaces exactly once
    val expected = e.keys.count { case (q, n) => q < n && e.contains((n, q)) }
    assert(pairs.length == expected)
  }
}
