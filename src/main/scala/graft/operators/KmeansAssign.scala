package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded fixed-iteration Lloyd k-means over the geo-anchors — the
  * LEARNED-assignment tiling of the reference (the third strategy of
  * SURVEY.md §2.10's pluggable-index story, next to quadkey and S2):
  * raptor/kmeans_tree_builder.py:92-105 runs faiss spherical k-means
  * (seed=42, fixed niter) then a 1-NN assignment join; here the same
  * shape runs as Spark jobs with EXACT cross-engine determinism:
  *
  *  - seeding: the first k anchors in md5(image_id) order (the engine's
  *    standard seeded-sample device, O5 — no rand());
  *  - update: integer-quantized means — members contribute
  *    floor(coord * 1e6) as BIGINT, the centroid is sum/(n*1e6) in one
  *    fixed op order, so the result is identical under ANY aggregation
  *    order (the Ann codebook technique) and replayable in ANSI SQL;
  *  - assignment: argmin of squared planar distance over the k centroid
  *    literals, ties to the smaller cid (array_position of the min —
  *    first occurrence).
  *
  * Scale shape: the centroid set is k rows — it lives on the driver and
  * is embedded as literals (exactly how spark.ml KMeans iterates);
  * assignment is map-only codegen over the scan; the update is one keyed
  * groupBy(cid) per iteration. At 10^12 rows each iteration is one
  * map-reduce pass — the textbook distributed Lloyd. Empty clusters keep
  * their previous centroid (deterministic; mirrored in the oracle). */
object KmeansAssign {

  val DefaultK = 8
  val DefaultIters = 3

  case class Centroid(cid: Int, clat: Double, clon: Double)

  /** Quantized-mean helper: (sum of floor(c*1e6), n) -> centroid coord.
    *
    * The sums accumulate as LONG, which bounds a single cluster at
    * ~2.5e10 members (|floor(coord·1e6)| ≤ 3.6e8 per row;
    * Long.MaxValue ≈ 9.2e18) — past that the centroid-update aggregate
    * RAISES under Spark 4's default ANSI mode rather than wrapping, so
    * the bound fails loud, never silently corrupts a centroid. The SSE
    * path carries DECIMAL(38,0) instead ([[BicScale]]) because its terms
    * are ~450× larger and every row contributes to ONE total; here the
    * hot path is the per-iteration update — 3·Σk ≈ 63 conditional sums in
    * one whole-stage-codegen aggregate — and switching those to
    * DECIMAL(38,0) was measured to blow q_bic_k up from ~5 s to 99 s
    * in-suite (big-decimal aggregation buffers + generated-code bloat;
    * even discounting the ~2.6× host contention of that run it is ≥8×),
    * a bad trade for headroom beyond a 25-billion-row single cluster. A
    * corpus that hot should raise the candidate k or pre-split, not
    * widen the accumulator. */
  private def mean(sq: Long, n: Long): Double =
    sq.toDouble / (n.toDouble * 1000000.0)

  /** Squared planar distance to each centroid, in ascending-cid order. */
  private def distCols(cents: Seq[Centroid]): Seq[Column] =
    cents.sortBy(_.cid).map { c =>
      (col("lat") - lit(c.clat)) * (col("lat") - lit(c.clat)) +
        (col("lon") - lit(c.clon)) * (col("lon") - lit(c.clon))
    }

  /** Argmin-of-k distance expression: 1-based cid of the nearest centroid,
    * ties to the smallest cid (array_position returns the FIRST index of
    * the minimum). */
  private def nearestCid(cents: Seq[Centroid]): Column = {
    val dists = distCols(cents)
    array_position(array(dists: _*), array_min(array(dists: _*))).cast("int")
  }

  private def points(images: DataFrame): DataFrame =
    images.select(col("image_id"), col("lat"), col("lon"))

  /** Seeded initial centroids: the first k anchors in md5(image_id)
    * order, cid = 1..k in that order. */
  def seedCentroids(images: DataFrame, k: Int): Seq[Centroid] =
    points(images)
      .orderBy(md5(col("image_id")), col("image_id")).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => Centroid(i + 1, r.getDouble(1), r.getDouble(2)) }

  /** Lloyd loop over a PREPARED (id, lat, lon) frame — callers persist it
    * (seed + every iteration scans it; unpersisted, a derived input would
    * re-run its projection once per job). */
  private def fitPts(pts: DataFrame, k: Int, iters: Int): Seq[Centroid] = {
    var cents = seedCentroids(pts, k)
    var it = 0
    while (it < iters) {
      val upd = pts.withColumn("cid", nearestCid(cents))
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("lat") * 1000000).cast("long")).as("slat"),
          sum(floor(col("lon") * 1000000).cast("long")).as("slon"))
        .collect()
        .map(r => r.getInt(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      cents = cents.map { c =>
        upd.get(c.cid) match {
          case Some((n, slat, slon)) => Centroid(c.cid, mean(slat, n), mean(slon, n))
          case None                  => c // empty cluster keeps its centroid
        }
      }
      it += 1
    }
    cents
  }

  /** Run `iters` Lloyd iterations; returns the final centroids. */
  def fit(images: DataFrame, k: Int = DefaultK,
          iters: Int = DefaultIters): Seq[Centroid] = {
    val pts = points(images)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try fitPts(pts, k, iters)
    finally pts.unpersist(blocking = false) // all jobs collect-terminated
  }

  // ------------------------------------------------------ BIC model selection

  /** Candidate cluster counts for [[bicSweep]] — mirrors the reference's
    * `np.arange(1, max_clusters)` sweep shape (cluster_utils.py:50-61) with
    * a fixed small grid: at 10^12 rows each candidate costs `iters + 1` full
    * passes, so the candidate set is a configuration, not data-derived. */
  val BicKs: Seq[Int] = 1 to 6

  /** SSE quantizer: each point contributes the exact integer
    * floor(min-sq-dist · 1e6). The SUM is carried as DECIMAL(38,0)
    * (Spark's exact 128-bit decimal aggregation), not Long: a point can
    * contribute up to floor((180²+360²)·1e6) ≈ 1.62e11, so a Long total
    * would overflow near 5.7e7 rows — decimal keeps the sum exact to
    * ~6e26 rows, far past the 10^12-row design point. DuckDB mirrors this
    * for free (BIGINT sums accumulate in HUGEINT; the oracle casts to the
    * same DECIMAL(38,0)). */
  val BicScale: Double = 1000000.0

  /** A6 — BIC model selection over candidate k (≙ cluster_utils.py:50-61
    * `get_optimal_clusters`: fit per k, score with BIC, argmin). The
    * reference fits a GaussianMixture per k; re-expressed Spark-first and
    * DETERMINISTIC: per candidate k, run the same seeded exact-Lloyd fit as
    * [[fit]], take SSE = Σ floor(min-sq-dist · 1e6) as an exact integer,
    * and score with the X-means-style spherical BIC
    * `n·ln(sse/n + ε) + k·d·ln(n)` (d = 2 planar dims, ε = 1e-12 guards
    * sse = 0). `best = 1` marks the argmin-BIC row, ties to the smaller k.
    *
    * Scale shape: the anchor projection is persisted ONCE across the whole
    * sweep; each candidate then costs `iters` assignment+update passes plus
    * one map-only SSE pass, all keyed or scan-shaped — no driver data beyond
    * the k-row centroid sets and the per-k (n, sse) scalars. The output is
    * |ks| rows. Every arithmetic step is integer or a fixed-order double
    * expression, so a SQL oracle can replay the sweep exactly. */
  private[graft] case class Scored(k: Int, cents: Seq[Centroid], sseQ: BigInt,
                                   bic: Double)

  /** Memoized sweep results: q_bic_k and q_kmeans_auto consume the SAME
    * candidate fits (the knnRanked sharing pattern — VERDICT r2 #3 class);
    * the cached value is a handful of driver-side scalars/centroids, not a
    * DataFrame, so there is no Spark cache lifetime to manage. Key includes
    * the caller's fixture-dir token plus (ks, iters); same immutable-fixture
    * contract as Queries' shared frames ([[clearSweepCache]] is the
    * regeneration escape hatch). */
  private val sweepCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String, Seq[Int], Int),
      (Long, Seq[Scored])]
  private[graft] def clearSweepCache(): Unit = sweepCache.clear()

  private def sweptFor(images: DataFrame, memoKey: Option[String],
                       ks: Seq[Int], iters: Int): (Long, Seq[Scored]) = {
    def compute(): (Long, Seq[Scored]) = {
      val pts = points(images)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = pts.count()
        (n, sweepScores(pts, ks, iters, n))
      } finally pts.unpersist(blocking = false)
    }
    memoKey match {
      case Some(key) =>
        if (sweepCache.size > 8) sweepCache.clear()
        sweepCache.getOrElseUpdate(
          (images.sparkSession, key, ks, iters), compute())
      case None => compute()
    }
  }

  /** The sweep core over a PERSISTED pts frame, BATCHED across candidates:
    * all k's iterate in lockstep, so iteration t is ONE scan computing the
    * conditional (count, Σfloor(lat·1e6), Σfloor(lon·1e6)) triple for every
    * (candidate k, cid) pair — Σk·3 ≈ 63 simple conditional sums for the
    * default grid, comfortably inside one whole-stage-codegen aggregate —
    * and the final SSEs are one more scan with |ks| sums. Job count is
    * seed + iters + 1 instead of |ks|·(iters + 2) (7.8 s → ~2 s in the
    * suite at sf0.1). The conditional sums aggregate exactly the same Long
    * terms as the per-k groupBy (`when` is null on non-members, so a
    * null total ≙ an absent group = empty cluster keeps its centroid), and
    * the md5-order seeding is prefix-stable, so one max-k seed job slices
    * to every candidate's seed — per-candidate results are bit-identical
    * to independent [[fitPts]] runs (KmeansSpec pins this). */
  private def sweepScores(pts: DataFrame, ks: Seq[Int], iters: Int,
                          n: Long): Seq[Scored] = {
    val nD = n.toDouble
    val seedMax = seedCentroids(pts, ks.max)
    var cents: Map[Int, Seq[Centroid]] =
      ks.map(k => k -> seedMax.take(k)).toMap
    var it = 0
    while (it < iters) {
      val aggs = ks.flatMap { k =>
        val cid = nearestCid(cents(k))
        (1 to cents(k).size).flatMap { c =>
          val m = cid === lit(c)
          Seq(sum(when(m, lit(1L))).as(s"n_${k}_$c"),
            sum(when(m, floor(col("lat") * 1000000).cast("long")))
              .as(s"slat_${k}_$c"),
            sum(when(m, floor(col("lon") * 1000000).cast("long")))
              .as(s"slon_${k}_$c"))
        }
      }
      val row = pts.select(aggs: _*).head()
      def grab(name: String): Option[Long] = {
        val i = row.fieldIndex(name)
        if (row.isNullAt(i)) None else Some(row.getLong(i))
      }
      cents = cents.map { case (k, cs) =>
        k -> cs.map { c =>
          grab(s"n_${k}_${c.cid}") match {
            case Some(cn) if cn > 0 =>
              Centroid(c.cid,
                mean(grab(s"slat_${k}_${c.cid}").get, cn),
                mean(grab(s"slon_${k}_${c.cid}").get, cn))
            case _ => c // empty cluster keeps its centroid
          }
        }
      }
      it += 1
    }
    val dec0 = lit(0).cast("decimal(38,0)")
    val sseAggs = ks.map { k =>
      val mind = array_min(array(distCols(cents(k)): _*))
      coalesce(sum(floor(mind * lit(BicScale)).cast("decimal(38,0)")), dec0)
        .as(s"sse_$k")
    }
    val sseRow = pts.select(sseAggs: _*).head()
    ks.map { k =>
      val sseQ = BigInt(
        sseRow.getDecimal(sseRow.fieldIndex(s"sse_$k")).toBigInteger)
      // BigInt -> Double is correctly rounded (exact below 2^53), matching
      // DuckDB's DECIMAL -> DOUBLE cast in the oracle's bic expression.
      val bic = nD * math.log(sseQ.toDouble / BicScale / nD + 1.0e-12) +
        k * 2.0 * math.log(nD)
      Scored(k, cents(k), sseQ, bic)
    }
  }

  /** Spec access to the raw per-candidate scores (including the BIC
    * double, which [[bicSweep]] deliberately keeps OUT of its output). */
  private[graft] def sweepScored(images: DataFrame, ks: Seq[Int] = BicKs,
                                 iters: Int = DefaultIters): (Long, Seq[Scored]) =
    sweptFor(images, None, ks, iters)

  def bicSweep(images: DataFrame, ks: Seq[Int] = BicKs,
               iters: Int = DefaultIters,
               memoKey: Option[String] = None): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val (n, scored) = sweptFor(images, memoKey, ks, iters)
    val bestK = scored.minBy(s => (s.bic, s.k)).k
    // sse_q is DECIMAL(38,0): exact at any scale (see BicScale) — built
    // with an explicit schema so the parquet scale is 0, matching the
    // oracle's CAST(... AS DECIMAL(38,0)) rendering digit-for-digit.
    // The raw BIC double stays INTERNAL (it drives `best` only): it is the
    // one sweep quantity that passes through a transcendental (`ln`), and
    // JVM Math.log vs DuckDB ln can differ in the last ulp — a landmine for
    // any bit-exact cross-engine comparison of the rendered value. Every
    // emitted column is integer-exact; the argmin itself is safe because
    // candidate scores are separated by far more than an ulp.
    val schema = StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("sse_q", DecimalType(38, 0), nullable = false),
      StructField("best", IntegerType, nullable = false)))
    val rows = scored.map { s =>
      Row(s.k, n, new java.math.BigDecimal(s.sseQ.bigInteger),
        if (s.k == bestK) 1 else 0)
    }
    images.sparkSession.createDataFrame(rows.asJava, schema)
  }

  /** The reference's full model-selection flow (≙ cluster_utils.py:64-70
    * `GMM_cluster`: `get_optimal_clusters` then fit with the chosen k and
    * label every row): sweep candidate k by BIC, fit is already done per
    * candidate, label the table under the argmin-BIC model. Output carries
    * the chosen k so downstream operators (and the oracle) see WHICH model
    * won. Same scale shape as [[bicSweep]] plus one final map-only
    * assignment scan. */
  def assignAuto(images: DataFrame, ks: Seq[Int] = BicKs,
                 iters: Int = DefaultIters,
                 memoKey: Option[String] = None): DataFrame = {
    val (_, scored) = sweptFor(images, memoKey, ks, iters)
    val best = scored.minBy(s => (s.bic, s.k))
    points(images).withColumn("cid", nearestCid(best.cents))
      .select(col("image_id"), col("cid"), lit(best.k).as("k"))
  }

  // ------------------------------------------------------ soft membership

  /** Default soft-membership ratio (squared-distance): a point joins every
    * cluster within 2× the radius of its nearest centroid (4× in squared
    * distance). The reference's GMM labels are `prob > 0.1`
    * (cluster_utils.py:64-70, 169-175) — probabilistic and seed-dependent;
    * re-expressed as a deterministic distance-ratio band so the SAME
    * multi-membership shape (a node can join SEVERAL clusters, making the
    * tree a DAG) falls out of the seeded Lloyd fit and replays exactly in
    * ANSI SQL. */
  val SoftRho: Double = 4.0
  private val SoftEps: Double = 1.0e-12

  /** Soft multi-membership assignment (≙ the reference's `prob > 0.1`
    * GMM labeling, cluster_utils.py:64-70 — the one clustering semantic
    * with no hard-argmin analog): emits an `(image_id, cid, w)` edge for
    * EVERY centroid whose squared distance is within `rho ×` the point's
    * minimum. `w = (dmin + ε) / (d + ε) ∈ (0, 1]` — exactly 1 for the
    * nearest centroid, decaying with the distance ratio; every double op
    * is in fixed mirror-able order, so the whole edge set is
    * SQL-replayable (q_soft_assign hashes it cross-engine).
    *
    * Scale shape: identical to [[assign]] — the k centroids are driver
    * literals, the membership test is a map-only codegen filter over one
    * scan, no shuffle; output is |edges| ≤ k·n rows. Downstream descents
    * must DEDUP children reached through several parents
    * (tree_retriever.py:264-268) — [[Retrieval.descendSoft]] does. */
  def assignSoft(images: DataFrame, k: Int = DefaultK,
                 iters: Int = DefaultIters, rho: Double = SoftRho): DataFrame = {
    val cents = fit(images, k, iters)
    softMembers(points(images), cents, rho)
  }

  /** (image_id, cid, w) membership edges of `pts` under centroid literals —
    * the edge-table builder behind [[assignSoft]], reusable against any
    * fitted or hand-built centroid set (RetrievalSpec builds its DAG
    * fixture through it). */
  private[graft] def softMembers(pts: DataFrame, cents: Seq[Centroid],
                                 rho: Double = SoftRho): DataFrame = {
    val sorted = cents.sortBy(_.cid)
    val dists = distCols(sorted)
    // (cid, d) pairs + the running min; the d expressions appear in both
    // the pair array and the min — 3 flops per centroid per row, cheap
    // enough that letting codegen evaluate them twice beats materializing
    // an intermediate array column
    val pairs = array(sorted.zip(dists).map { case (c, d) =>
      struct(lit(c.cid).as("cid"), d.as("d"))
    }: _*)
    pts
      .withColumn("dmin", array_min(array(dists: _*)))
      .withColumn("m", explode(
        filter(pairs, s => s.getField("d") <= col("dmin") * lit(rho))))
      .select(col("image_id"), col("m").getField("cid").as("cid"),
        ((col("dmin") + lit(SoftEps)) /
          (col("m").getField("d") + lit(SoftEps))).as("w"))
  }

  /** Final 1-NN assignment join (J4): every image row labeled with the
    * cid of its nearest learned centroid. [[fit]] caches the anchor
    * projection for its own seed + iteration jobs and RELEASES it; the
    * returned assignment reads a fresh (uncached) projection — one extra
    * derive scan, but no cache outlives the call (an unreleasable persist
    * here would pile up one full-projection cache per invocation). */
  def assign(images: DataFrame, k: Int = DefaultK,
             iters: Int = DefaultIters): DataFrame = {
    val cents = fit(images, k, iters)
    points(images).withColumn("cid", nearestCid(cents))
      .select(col("image_id"), col("cid"))
  }
}
