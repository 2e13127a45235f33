package graft

import org.apache.spark.sql.functions._

import graft.similarity.Ann

/** Embedding-similarity family: engine results vs an independent
  * driver-side recomputation (plain Scala loops — same fold order as the
  * engine's sequential aggregate, so doubles compare exactly). */
class AnnSpec extends SparkFunSuite {

  private val dir = SparkSpec.Sf

  private def collected: Map[Long, Array[Double]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  private def dotL(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def cosL(a: Array[Double], b: Array[Double]): Double =
    dotL(a, b) / (math.sqrt(dotL(a, a)) * math.sqrt(dotL(b, b)))

  test("brute cosine top-k matches driver-side recomputation exactly") {
    val vs = collected
    val got = Ann.cosineTopK(spark, dir, nQueries = 4, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getInt(3))).toMap
    (0L until 4L).foreach { q =>
      val want = vs.keys.filter(_ != q).toSeq
        .map(n => (n, cosL(vs(q), vs(n))))
        .sortBy { case (n, c) => (-c, n) }
        .take(3)
      want.zipWithIndex.foreach { case ((n, c), i) =>
        val (gc, gr) = got((q, n))
        assert(gr == i + 1 && gc == c, s"q=$q n=$n")
      }
    }
  }

  test("LSH top-k only pairs same-signature vectors, cosine exact") {
    val vs = collected
    def sig(v: Array[Double]): Int =
      (0 until Ann.SigBits).map { p =>
        val proj = v.indices.map(i => Ann.planeSign(p, i) * v(i)).sum
        if (proj > 0) 1 << p else 0
      }.sum
    val sigs = vs.map { case (k, v) => k -> sig(v) }
    Ann.lshTopK(spark, dir, nQueries = 8, k = 3).collect().foreach { r =>
      val (q, n, c) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(sigs(q) == sigs(n), s"bucket mismatch $q/$n")
      assert(math.abs(c - cosL(vs(q), vs(n))) < 1e-12)
    }
  }

  test("near-dup pairs are symmetric-free and above threshold") {
    val rows = Ann.cosineNearDupPairs(spark, dir, 0.4).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }

  test("IVF top-k: exact cosines, neighbors share a probed cell, recall measured") {
    val vs = collected
    // driver-side codebook: exact integer-quantized per-label means
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cents = labels.groupBy(_._2).map { case (lab, ids) =>
      val rows = ids.keys.toSeq.sorted.map(vs)
      val n = rows.size
      lab -> Array.tabulate(Ann.Dim) { i =>
        rows.map(v => math.floor(v(i) * 1000000).toLong).sum.toDouble /
          (n.toDouble * 1000000.0)
      }
    }
    def cellsOf(v: Array[Double], keep: Int): Seq[Int] =
      cents.toSeq.map { case (lab, c) =>
        val d = dotL(v, v) - 2.0 * dotL(v, c) + dotL(c, c)
        (d, lab)
      }.sortBy(identity).take(keep).map(_._2)
    val got = Ann.ivfTopK(spark, dir, nQueries = 8, k = 5, nprobe = 2).collect()
    got.foreach { r =>
      val (q, n, c) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(c == cosL(vs(q), vs(n)), s"cosine drift $q/$n")
      assert(cellsOf(vs(q), 2).contains(cellsOf(vs(n), 1).head),
        s"$n not in a probed cell of $q")
    }
    val brute = Ann.cosineTopK(spark, dir, 8, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.map(r => (r.getLong(0), r.getLong(1)))
      .count(brute.contains).toDouble / brute.size
    info(f"IVF recall vs brute top-5 (nprobe=2/10): $recall%.3f")
    assert(recall >= 0.15, f"recall $recall%.3f below the 2-of-10-cells floor")
  }

  test("banded-LSH near-dup is a subset of exact with recall >= 0.7") {
    val t = 0.4
    val exact = Ann.cosineNearDupPairs(spark, dir, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshCosNearDupPairs(spark, dir, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH path must never invent a pair")
    val recall = lsh.size.toDouble / exact.size
    info(f"banded-LSH recall vs exact: ${lsh.size}/${exact.size} = $recall%.3f")
    assert(recall >= 0.7, f"recall $recall%.3f below floor")
  }

  test("k-center greedy: distinct picks, monotone non-increasing spread") {
    val rows = graft.similarity.Ann.farthestPoints(spark, dir, 6)
      .orderBy("step").collect()
    assert(rows.length == 6)
    assert(rows.map(_.getLong(1)).distinct.length == 6, "picks must be distinct")
    assert(rows.head.getInt(0) == 0 && rows.head.getLong(2) == -1L)
    // greedy invariant: min-distance to the selected set is pointwise
    // non-increasing as the set grows, so each pick's spread is <= the
    // previous pick's spread
    val d2 = rows.tail.map(_.getLong(2))
    assert(d2.forall(_ > 0L))
    assert(d2.zip(d2.tail).forall { case (a, b) => b <= a },
      s"spread must be non-increasing: ${d2.mkString(",")}")
  }

  test("int8 quantization: codes in range, reconstruction error bounded") {
    val vs = collected
    val rows = graft.similarity.Ann.int8QuantFacts(spark, dir).collect()
    assert(rows.length == vs.size)
    rows.foreach { r =>
      val (id, amax) = (r.getLong(0), r.getDouble(1))
      val v = vs(id)
      assert(amax == v.map(math.abs).max)
      val codes = v.map(x => math.floor(x / amax * 127.0).toLong)
      assert(r.getLong(2) == codes.sum && r.getLong(3) == codes.min &&
        r.getLong(4) == codes.max, s"code facts drift for vec $id")
      assert(codes.forall(c => c >= -128 && c <= 127), "int8 range")
      // floor-quantization reconstruction error < one step = amax/127
      v.zip(codes).foreach { case (x, c) =>
        assert(math.abs(c.toDouble / 127.0 * amax - x) <= amax / 127.0 + 1e-12)
      }
    }
  }

  test("int8 quantization: all-zero vector yields all-zero codes, not NaN") {
    import spark.implicits._
    val w = Seq((0L, Array(0.0, 0.0, 0.0)), (1L, Array(0.5, -1.0, 0.25)))
      .toDF("vec_id", "v")
    val got = Ann.int8QuantFactsOf(w).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    // amax = 0 -> every code exactly 0 (guarded division), never null
    assert(got(0L) == ((0.0, 0L, 0L, 0L)))
    // a normal vector is untouched by the guard
    val codes = Array(0.5, -1.0, 0.25).map(x => math.floor(x / 1.0 * 127.0).toLong)
    assert(got(1L) == ((1.0, codes.sum, codes.min, codes.max)))
  }

  test("label centroid facts: counts sum to table size") {
    val df = Ann.labelCentroidFacts(spark, dir, 4)
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(df.agg(sum(col("cnt"))).first().getLong(0) == total)
  }

  test("MMR re-rank: top-1 first, distinct picks, per-step greedy optimality") {
    val pool = 20; val m = 5
    val got = Ann.mmrRerank(spark, dir, pool, m)
      .orderBy(col("step")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == (0 until m))
    assert(got.map(_._2).distinct.length == m)
    // independent page: cosine top-pool of query 0 via the brute ranker
    val page = Ann.cosineTopK(spark, dir, 1, pool)
      .filter(col("qid") === 0L).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got.map(_._2).forall(page.contains), "picks within the top-pool page")
    // step 0 is the plain top-1 and carries its query cosine
    val top1 = page.toSeq.sortBy { case (id, c) => (-c, id) }.head
    assert(got(0)._2 == top1._1 && got(0)._3 == top1._2)
    // independent greedy replay over collected vectors
    val vs = Ann.vecs(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Double](2).toArray, r.getDouble(3))).toMap
    def cosOf(a: Long, b: Long): Double = {
      val (av, an) = vs(a); val (bv, bn) = vs(b)
      var acc = 0.0; var i = 0
      while (i < av.length) { acc += av(i) * bv(i); i += 1 }
      acc / (math.sqrt(an) * math.sqrt(bn))
    }
    var sel = Vector(top1._1)
    var rest = page.keySet - top1._1
    val replay = scala.collection.mutable.ListBuffer((top1._1, top1._2))
    while (replay.size < m) {
      val (bid, bsc) = rest.toSeq.map { c =>
        val maxSim = sel.map(sd => cosOf(c, sd)).max
        (c, 0.5 * page(c) - 0.5 * maxSim)
      }.sortBy { case (c, sc) => (-sc, c) }.head
      sel = sel :+ bid; rest -= bid; replay += ((bid, bsc))
    }
    assert(got.map(r => (r._2, r._3)).toSeq == replay.toSeq)
  }
}
