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

  test("ADC top-k carries true distance signal for every query") {
    // the fixture's labels are only weakly geometric (~37% of vectors are
    // nearest their own label centroid), so neither exact-top-k recall nor
    // label consistency is meaningful for the coarse per-label codebook;
    // the honest pin is that ADC ranking beats random: for EVERY query,
    // the mean TRUE squared distance of its ADC top-k is strictly below
    // the corpus mean (measured ~10-25% closer)
    val nQ = 8
    val k = 5
    val vs = Ann.vecs(spark, SparkSpec.Sf).select("vec_id", "v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val got = Ann.pqAdcTopK(spark, SparkSpec.Sf, nQ, k).collect()
    assert(got.length == nQ * k)
    got.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val meanTop = rows.map(r => d2(vs(q), vs(r.getLong(1)))).sum / rows.length
      val others = vs.keys.filter(_ != q).toSeq
      val meanAll = others.map(n => d2(vs(q), vs(n))).sum / others.length
      assert(meanTop < meanAll,
        s"query $q: ADC top-$k mean d2 $meanTop >= corpus mean $meanAll")
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
