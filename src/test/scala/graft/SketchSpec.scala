package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.agg.Sketches

/** Count-Min + Bloom ([[graft.agg.Sketches]]): the two guarantees that
  * make each sketch usable as a prefilter — CMS never underestimates and
  * merges by plain counter addition; Bloom never false-negatives and
  * merges by positions union. */
class SketchSpec extends SparkFunSuite {

  private def docs: DataFrame =
    spark.read.parquet(s"${SparkSpec.Sf}/documents.parquet")

  private def tokens: DataFrame =
    docs.select(explode(expr("split(trim(text), ' +')")).as("token"))

  test("cms: estimate >= exact for every probe (one-sided error)") {
    val got = graft.SparkEntry.queries("q_cms_heavy")(spark, SparkSpec.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 20)
    got.foreach { case (t, exact, est) =>
      assert(est >= exact, s"CMS underestimated '$t': $est < $exact")
    }
  }

  test("cms: counter merge == sketch of the union (distributed-agg shape)") {
    val (d, w) = (4, 256L)
    val a = docs.filter(col("doc_id") % 2 === 0)
      .select(explode(expr("split(trim(text), ' +')")).as("token"))
    val b = docs.filter(col("doc_id") % 2 =!= 0)
      .select(explode(expr("split(trim(text), ' +')")).as("token"))
    val direct = Sketches.Cms.sketch(tokens, "token", d, w).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = Sketches.Cms.sketch(a, "token", d, w)
      .unionByName(Sketches.Cms.sketch(b, "token", d, w))
      .groupBy("r", "b").agg(sum("c").as("c")).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(direct.nonEmpty && merged == direct)
  }

  test("bloom: no false negatives; definite-miss rows are truly absent") {
    val got = graft.SparkEntry.queries("q_bloom_dedup")(spark, SparkSpec.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (id, bloom, exact) =>
      assert(bloom >= exact, s"false negative on doc $id")
    }
    // every build-side member must hit (they set their own bits)
    assert(got.filter(_._1 % 2 == 0).forall(_._2 == 1L))
  }

  test("bloom: merge is positions union (filter of A∪B == OR of filters)") {
    val (k, m) = (4, 64L) // small m so unions visibly add bits
    def slice(lo: Long, hi: Long): DataFrame = docs
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select(md5(col("text")).as("x"))
    val posA = Sketches.Bloom.positions(slice(0, 10), "x", k, m)
      .collect().map(_.getLong(0)).toSet
    val posB = Sketches.Bloom.positions(slice(10, 20), "x", k, m)
      .collect().map(_.getLong(0)).toSet
    val posAb = Sketches.Bloom.positions(slice(0, 20), "x", k, m)
      .collect().map(_.getLong(0)).toSet
    assert(posA.subsetOf(posAb),
      "growing the build set must never clear a bit")
    // OR-merge: positions of the union == union of positions
    assert((posA ++ posB) == posAb)
  }
}
