package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.text.TextOps
import graft.text.TextOps.SparkD

/** Near-duplicate detection over the `documents` table — the dedup family a
  * training-data pipeline needs at 100 TB, built from the same
  * prefilter + verify join shape as the spatial queries (SURVEY.md J3; ≙ the
  * reference's cluster-prefiltered NN search,
  * raptor/merge_tree_builder.py:247-304, validated against brute force like
  * raptor `merge_distance&tree_exam.py`:334-446).
  *
  * Three candidate-generation strategies over word-3-gram shingle sets:
  *  - [[jaccardPairsExact]]: PREFIX FILTERING (AllPairs/PPJoin family,
  *    Bayardo et al. WWW'07) — provably lossless, output == brute force;
  *  - [[lshNearDupPairs]]: MinHash + LSH banding — probabilistic recall,
  *    tunable (m=16, r=2, b=8), verified candidates only;
  *  - [[simhashPairs]]: 32-bit SimHash + 4-band pigeonhole blocking —
  *    lossless for hamming <= 3.
  *
  * Scale design: no crossJoin anywhere. Candidates come from equi-joins on
  * exploded keys (shingle / band / simhash-band) — shuffle-partitioned by
  * key, AQE-splittable when a shingle is hot. Verification joins fetch the
  * two shingle sets by doc_id (sort-merge on a high-cardinality key).
  */
object NearDup {

  import TextOps.{LshB, LshR, MinHashM, ShingleN, SimBands, SimHammingMax}

  /** documents -> (doc_id, toks, sh): tokenized + distinct word-3-gram
    * shingle set; drops docs too short to shingle. */
  def docShingled(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(SparkD.splitToks("text")).as("toks"))
      .filter(size(col("toks")) >= ShingleN)
      .withColumn("sh", expr(TextOps.shingles(SparkD, "toks")))

  /** (doc_id, sh, hs): shingle set + 32-bit shingle hashes. */
  def docHashed(docs: DataFrame): DataFrame =
    docShingled(docs).withColumn("hs", expr(TextOps.shingleHashes(SparkD, "sh")))

  // ------------------------------------------------- exact set-similarity join

  /** All pairs (a < b) with shingle-Jaccard >= t — EXACT, via prefix
    * filtering: order every doc's shingles by (global document frequency
    * asc, shingle), keep the first |s| - ceil(t*|s|) + 1 as the prefix; any
    * qualifying pair must collide on >= 1 prefix shingle, so the equi-join
    * on prefix shingles is a lossless candidate generator. Rare-first
    * ordering keeps candidate fan-out minimal (the frequent-shingle skew
    * never enters the join). */
  def jaccardPairsExact(docs: DataFrame, t: Double): DataFrame = {
    // The shingle table feeds candidate generation AND both sides of the
    // verification join; without a persist the whole tokenize+shingle
    // pipeline runs 3x (measured ~40% of query time at sf0.1).
    val s = docShingled(docs).select(col("doc_id"), col("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    verifyJaccard(jaccardCandidates(s, t), s, t)
  }

  /** Candidate (doc_a, doc_b) generator for [[jaccardPairsExact]] —
    * AllPairs prefix join + size filter + PPJoin positional filter
    * (Xiao et al., WWW'08), all provably lossless. `positional = false`
    * exposes the pre-PPJoin generator so NearDupSpec can measure the
    * candidate reduction. */
  private[graft] def jaccardCandidates(s: DataFrame, t: Double,
                                       positional: Boolean = true): DataFrame = {
    val ex = s.select(col("doc_id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("s1"))
    val dfreq = ex.groupBy(col("s1")).agg(count(lit(1)).as("dfreq"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("dfreq"), col("s1"))
    // ceil() over a double product can over-round by one ULP when t*sz is an
    // exact integer, shortening the prefix and (in principle) losing a pair;
    // the 1e-9 slack makes rounding errors only LENGTHEN the prefix.
    // persisted: the self-join would otherwise evaluate the whole
    // explode -> dfreq-join -> window subtree once per side
    val prefix = ex.join(dfreq, "s1")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("sz") - ceil(lit(t) * col("sz") - lit(1e-9)) + 1)
      .select(col("doc_id"), col("sz"), col("rk"), col("s1"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // AllPairs size filter: J >= t implies min(|a|,|b|) >= t*max(|a|,|b|)
    // (|∩| <= min, |∪| >= max) — culls candidates before the expensive
    // verification join. The 1e-9 slack keeps the bound conservative under
    // double rounding so no qualifying pair is ever dropped.
    val sizeOk =
      least(col("a.sz"), col("b.sz")).cast("double") * (1.0 + 1e-9) >=
        lit(t) * greatest(col("a.sz"), col("b.sz")).cast("double")
    // PPJoin positional filter: at a prefix collision with ranks (pa, pb),
    // the overlap is bounded by 1 + min(|a|-pa, |b|-pb); J >= t needs
    // overlap >= ceil(t/(1+t)*(|a|+|b|)). Both shingle lists share one
    // global order, so the pair's FIRST common shingle is a prefix
    // collision with no earlier common shingles — its bound is exact, and
    // that collision row always survives for a qualifying pair (later
    // collision rows may be pruned spuriously; distinct keeps the pair).
    val posOk =
      lit(1) + least(col("a.sz") - col("a.rk"), col("b.sz") - col("b.rk")) >=
        ceil(lit(t / (1.0 + t)) * (col("a.sz") + col("b.sz")) - lit(1e-9))
    val cond = col("a.s1") === col("b.s1") &&
      col("a.doc_id") < col("b.doc_id") && sizeOk
    prefix.as("a").join(prefix.as("b"),
        if (positional) cond && posOk else cond)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Join candidate (doc_a, doc_b) pairs back to shingle sets and keep
    * pairs with exact Jaccard >= t. Output (doc_a, doc_b, jac). */
  private def verifyJaccard(cand: DataFrame, s: DataFrame, t: Double): DataFrame =
    cand
      .join(s.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(s.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jac", expr(TextOps.jaccard(SparkD, "sh_a", "sh_b")))
      .filter(col("jac") >= t)
      .select(col("doc_a"), col("doc_b"), col("jac"))

  // ------------------------------------------------------------ MinHash + LSH

  /** (doc_id, mh_0..mh_{m-1}) MinHash signatures. */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val base = docHashed(docs)
    (0 until MinHashM).foldLeft(base) { (d, j) =>
      d.withColumn(s"mh_$j", expr(TextOps.minhash(SparkD, "hs", j)))
    }.drop("toks", "hs")
  }

  /** LSH banding: near-dup pairs whose signatures collide on >= 1 of the b
    * bands (r rows each), then verified against exact Jaccard >= t.
    * Probabilistic recall ~ 1-(1-j^r)^b (j=0.5, r=2, b=8 -> ~0.90); the
    * DuckDB oracle replicates the banding, so outputs still match exactly. */
  def lshNearDupPairs(docs: DataFrame, t: Double): DataFrame = {
    val sig = minhashSignatures(docs)
    val bandStructs = (0 until LshB).map { b =>
      struct(lit(b).as("band"),
        col(s"mh_${b * LshR}").as("v0"), col(s"mh_${b * LshR + 1}").as("v1"))
    }
    // persisted: the band self-join would otherwise run the 16-permutation
    // MinHash pipeline (md5 per shingle) once per side, and the verify join
    // re-shingles the corpus once per pair side
    val bands = sig.select(col("doc_id"),
        explode(array(bandStructs: _*)).as("bv"))
      .select(col("doc_id"), col("bv.band").as("band"),
        col("bv.v0").as("v0"), col("bv.v1").as("v1"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.v0") === col("b.v0") &&
          col("a.v1") === col("b.v1") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(cand, docShingled(docs).select(col("doc_id"), col("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK), t)
  }

  /** MinHash ESTIMATOR AUDIT over the LSH candidate pairs: per pair the
    * signature-agreement count (of [[TextOps.MinHashM]] permutations —
    * agree/m IS the MinHash Jaccard estimate) next to the exact Jaccard
    * pieces (|A∩B|, |A|, |B|). This is the calibration table a pipeline
    * uses to pick (t, bands, rows): how far the sketch estimate sits
    * from truth on real candidates — all integers, no ratio hashed.
    * Same plan shape as [[lshNearDupPairs]]: banded equi-join candidates,
    * keyed signature + shingle-set fetch joins; the signature frame is
    * persisted once and feeds both the banding and the agreement. */
  def minhashEstimatePairs(docs: DataFrame): DataFrame = {
    val sig = minhashSignatures(docs).persist(StorageLevel.MEMORY_AND_DISK)
    val bandStructs = (0 until LshB).map { b =>
      struct(lit(b).as("band"),
        col(s"mh_${b * LshR}").as("v0"), col(s"mh_${b * LshR + 1}").as("v1"))
    }
    val bands = sig.select(col("doc_id"),
        explode(array(bandStructs: _*)).as("bv"))
      .select(col("doc_id"), col("bv.band").as("band"),
        col("bv.v0").as("v0"), col("bv.v1").as("v1"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.v0") === col("b.v0") &&
          col("a.v1") === col("b.v1") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    def side(tag: String) = sig.select(
      col("doc_id").as(s"doc_$tag") +:
        (0 until MinHashM).map(j => col(s"mh_$j").as(s"${tag}_mh_$j")): _*)
    val agree = (0 until MinHashM)
      .map(j => when(col(s"a_mh_$j") === col(s"b_mh_$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    val sh = docShingled(docs).select(col("doc_id"), col("sh"))
    cand.join(side("a"), "doc_a").join(side("b"), "doc_b")
      .withColumn("agree", agree)
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("agree"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
          .as("inter_cnt"),
        size(col("sh_a")).cast("long").as("size_a"),
        size(col("sh_b")).cast("long").as("size_b"))
  }

  // ----------------------------------------------------------------- SimHash

  /** (doc_id, simhash): 32-bit SimHash over token hashes with multiplicity.
    * Engine side uses the codegen'd [[graft.text.TextKernel.simhash32]]
    * kernel (the oracle keeps [[TextOps.simhash]]'s 32 unrolled terms —
    * integer arithmetic, so equality is exact by construction). */
  def simhashDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(SparkD.splitToks("text")).as("toks"))
      .filter(size(col("toks")) >= ShingleN)
      .withColumn("hs", expr("transform(toks, w -> " +
        SparkD.hash32("w") + ")"))
      .withColumn("simhash", graft.text.functions.simhash32(col("hs")))
      .select(col("doc_id"), col("simhash"))

  /** Pairs with SimHash hamming distance <= 3 — EXACT via pigeonhole
    * blocking: 4 disjoint 8-bit bands; <= 3 flipped bits leave >= 1 band
    * identical, so the band equi-join misses nothing. Refine =
    * `bit_count(a ^ b) <= 3` (built-in, codegen'd). */
  def simhashPairs(docs: DataFrame): DataFrame =
    simhashPairsOf(simhashDocs(docs))

  /** [[simhashPairs]] over a precomputed `(doc_id, simhash)` frame — the
    * entry a caller that also needs the hashes themselves uses (e.g.
    * q_dedup_groups derives the node set from the SAME frame instead of
    * running the tokenize+hash pipeline twice). A caller that already
    * persists `sims` passes `persistBands = false`: the band explode over
    * the cached hashes is cheap per side, and a second cache of the same
    * upstream would just shadow the caller's (and outlive the call —
    * there is no safe unpersist point inside, the result is lazy). */
  def simhashPairsOf(sims: DataFrame, persistBands: Boolean = true): DataFrame = {
    val bandCols = (0 until SimBands).map { k =>
      struct(lit(k).as("band"), expr(TextOps.simBand(SparkD, "simhash", k)).as("bv"))
    }
    // persisted (unless the caller caches upstream): the self-join would
    // otherwise run the tokenize + 1.5M-md5 simhash pipeline once per
    // side (measured ~2x the query's real work)
    val bands0 = sims.select(col("doc_id"), col("simhash"),
        explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("simhash"),
        col("b.band").as("band"), col("b.bv").as("bv"))
    val bands =
      if (persistBands) bands0.persist(StorageLevel.MEMORY_AND_DISK)
      else bands0
    // emit-once: a pair agreeing on several bands must surface exactly
    // once, and the full simhash is already on both join sides — so the
    // first-equal-band test is a free per-row filter that replaces the
    // former distinct() (a full shuffle of the qualifying pairs)
    val firstBand = array((0 until SimBands).map { k =>
      expr(s"${TextOps.simBand(SparkD, "a.simhash", k)} = " +
        TextOps.simBand(SparkD, "b.simhash", k))
    }: _*)
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .filter(array_position(firstBand, lit(true)) === col("a.band") + 1)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      // refine: far-apart pairs colliding on one hot band are the bulk of
      // the join output; the hamming test is a codegen'd per-row filter
      .filter(col("hamming") <= SimHammingMax)
  }
}
