package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.NearDup
import graft.text.TextOps
import graft.text.TextOps.SparkD

/** Dedup / near-dup family: the engine's prefiltered joins must equal the
  * brute-force cross join (≙ the reference's prefilter-vs-brute-force
  * overlap harness, raptor `merge_distance&tree_exam.py`:334-446 — but we
  * demand exact equality, not overlap ratio: SURVEY.md §5.2). */
class NearDupSpec extends SparkFunSuite {

  private val T = 0.5

  private def docs: DataFrame =
    spark.read.parquet(s"${SparkSpec.Sf}/documents.parquet")

  /** Brute-force shingle-Jaccard pairs (the J2 oracle). */
  private def brutePairs(t: Double): DataFrame = {
    val s = NearDup.docShingled(docs).select(col("doc_id"), col("sh"))
    s.as("a").join(s.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr(TextOps.jaccard(SparkD, "a.sh", "b.sh")).as("jac"))
      .filter(col("jac") >= t)
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("prefix-filter jaccard join == brute force (lossless prefilter)") {
    val exact = NearDup.jaccardPairsExact(docs, T)
    val brute = brutePairs(T)
    assert(pairSet(exact) == pairSet(brute))
    assert(pairSet(exact).nonEmpty, "fixture should contain planted near-dups")
  }

  test("LSH banding pairs are a subset of brute force, all verified >= t") {
    val lsh = NearDup.lshNearDupPairs(docs, T)
    val brute = pairSet(brutePairs(T))
    val got = pairSet(lsh)
    assert(got.subsetOf(brute))
    // r=2, b=8 at j>=0.5 -> per-pair miss prob <= (1-0.25)^8 ~ 0.1;
    // the planted pairs have much higher jaccard, so expect high recall.
    assert(got.size >= (brute.size * 0.7).toInt,
      s"LSH recall too low: ${got.size}/${brute.size}")
  }

  test("simhash band blocking == brute-force hamming <= 3 (pigeonhole exact)") {
    val sims = NearDup.simhashDocs(docs)
    val brute = sims.as("a").join(sims.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= TextOps.SimHammingMax)
    assert(pairSet(NearDup.simhashPairs(docs)) == pairSet(brute))
  }

  test("minhash signature is a true per-permutation minimum") {
    // spot-check one doc against a driver-side recomputation
    val row = NearDup.docHashed(docs).select(col("doc_id"), col("hs"))
      .orderBy(col("doc_id")).first()
    val hs = row.getSeq[Long](1)
    val sig = NearDup.minhashSignatures(docs)
      .filter(col("doc_id") === row.getLong(0)).first()
    (0 until TextOps.MinHashM).foreach { j =>
      val want = hs.map(h => (TextOps.mhA(j) * h + TextOps.mhB(j)) % TextOps.MinHashP).min
      assert(sig.getAs[Long](s"mh_$j") == want, s"mh_$j mismatch")
    }
  }

  test("PPJoin positional filter shrinks candidates and loses no pair") {
    val t = 0.5
    val s = NearDup.docShingled(docs).select(col("doc_id"), col("sh"))
    val without = NearDup.jaccardCandidates(s, t, positional = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val withPos = NearDup.jaccardCandidates(s, t, positional = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    info(s"candidates: ${without.size} -> ${withPos.size} with positional filter")
    assert(withPos.subsetOf(without))
    assert(withPos.size < without.size, "positional filter must prune some")
    // losslessness: every truly-qualifying pair still among candidates
    val truth = NearDup.jaccardPairsExact(docs, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.subsetOf(withPos))
  }

  test("exact dedup by md5 keeps one keeper per distinct text") {
    val grouped = docs.groupBy(md5(col("text")).as("fp"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))
    val total = docs.count()
    assert(grouped.agg(sum(col("cnt"))).first().getLong(0) == total)
  }
}
