package graft

import graft.similarity.Ann

/** Product quantization: packing validity + the subspace-argmin
  * optimality lemma (per-subspace argmin can only beat reconstructing
  * the vector's own full-label centroid). */
class PqSpec extends SparkFunSuite {

  test("pq codes: every nibble is a valid codeword id") {
    val cb = Ann.pqCodebook(spark, SparkSpec.Sf)
    val ids = cb.map(_._2).toSet
    val rows = Ann.pqCodes(spark, SparkSpec.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val code = r.getAs[Long]("pq_code")
      (0 until Ann.PqM).foreach { s =>
        assert(ids.contains(((code >> (4 * s)) & 15).toInt))
      }
    }
  }

  test("subspace argmin optimality: PQ error <= own-label reconstruction") {
    // choosing the vector's own label in EVERY subspace reconstructs the
    // full per-label centroid; the per-subspace argmin can only do better
    val cbMap = Ann.pqCodebook(spark, SparkSpec.Sf)
      .map(t => (t._1, t._2) -> t._3).toMap
    val w = Ann.vecs(spark, SparkSpec.Sf)
      .select("vec_id", "label", "v").collect()
    val errs = Ann.pqCodes(spark, SparkSpec.Sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("err_q")).toMap
    w.foreach { r =>
      val v = r.getSeq[Double](2)
      val own = (0 until Ann.PqM).map { s =>
        val c = cbMap((s, r.getInt(1)))
        val vs = v.slice(s * Ann.PqSubDim, (s + 1) * Ann.PqSubDim)
        math.floor(
          vs.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum * 1e6).toLong
      }.sum
      // 2M micro-unit slack: floors on both sides + the (vn - 2 dot + cn)
      // vs sum-of-squares evaluation-order difference
      assert(errs(r.getLong(0)) <= own + 2 * Ann.PqM,
        s"vec ${r.getLong(0)}: pq ${errs(r.getLong(0))} > own $own")
    }
  }
}
