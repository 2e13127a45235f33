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

  /** Quantized-mean helper: (sum of floor(c*1e6), n) -> centroid coord. */
  private def mean(sq: Long, n: Long): Double =
    sq.toDouble / (n.toDouble * 1000000.0)

  /** Argmin-of-k distance expression: 1-based cid of the nearest centroid,
    * ties to the smallest cid (array_position returns the FIRST index of
    * the minimum). */
  private def nearestCid(cents: Seq[Centroid]): Column = {
    val dists = cents.sortBy(_.cid).map { c =>
      (col("lat") - lit(c.clat)) * (col("lat") - lit(c.clat)) +
        (col("lon") - lit(c.clon)) * (col("lon") - lit(c.clon))
    }
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
