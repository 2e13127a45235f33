package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's primary input — the `input_hint` image+caption table
  * `(image_id, bytes, w, h, fmt, caption, phash)` — synthesized
  * deterministically (FIXTURES.md §1) from the driver's lineitem parquet so
  * that the DuckDB oracle can reconstruct the *identical* rows with the
  * mirrored SQL in [[oracleCte]]. Every derived value is integer/IEEE-754
  * arithmetic with the same operation order in both engines, so floor()
  * boundaries agree bit-for-bit.
  *
  * ≙ the reference's corpus ingest (raptor/tree_builder.py:286-328): leaf
  * records with a deterministic "embedding" — here the geo-anchor (lat, lon),
  * an LCG of the row key. 5% of rows ("k % 20 = 0") collapse into one tiny
  * box to create a HOT CELL, mirroring the reference's index_count hotness
  * skew (raptor/merge_tree_builder.py:236-323) and exercising salting/AQE.
  *
  * At production scale this table is a real Iceberg table; this generator is
  * the sandbox stand-in. The derivation is a narrow projection + one
  * `dropDuplicates` on the key (the driver's lineitem has duplicate
  * (orderkey, linenumber) pairs), after which everything is per-row map work.
  */
object Images {

  private val A = 1103515245L
  private val C = 12345L
  private val M = 2147483648L // 2^31

  /** Anchor+metadata table WITHOUT bytes — the shape every oracle-checked
    * query uses (DuckDB never sees binary). Columns:
    * k, h1, h2, h3 (internal), image_id, lat, lon, w, h, fmt, caption, phash.
    */
  def images(spark: SparkSession, sfDir: String): DataFrame = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val keyed = li
      .select((col("l_orderkey") * 8 + col("l_linenumber")).cast(LongType).as("k"))
      .dropDuplicates("k")
    withDerived(keyed)
  }

  /** Derivations shared by [[images]] and the tiny in-memory fixtures. */
  def withDerived(keyed: DataFrame): DataFrame = {
    // pre-mod keeps k*A inside Long under ANSI mode for amplified keys
    // (k up to ~2^40 at bench replication); identical values for k < 2^31,
    // which covers every oracle-checked scale — the CTE mirrors it.
    val h1 = ((col("k") % M) * A + C) % M
    val base = keyed
      .withColumn("h1", h1)
      .withColumn("h2", (col("h1") * A + C) % M)
      .withColumn("h3", (col("h2") * A + C) % M)
    base.select(
      col("k"), col("h1"), col("h2"), col("h3"),
      concat(lit("img"), lpad(col("k").cast(StringType), 12, "0")).as("image_id"),
      when(col("k") % 20 === 0,
        lit(37.0) + (col("h1") % 1024).cast(DoubleType) / 1024.0 * 0.001)
        .otherwise(lit(-60.0) + (lit(120.0) * col("h1").cast(DoubleType)) / 2147483648.0)
        .as("lat"),
      when(col("k") % 20 === 0,
        lit(-122.0) + (col("h2") % 1024).cast(DoubleType) / 1024.0 * 0.001)
        .otherwise(lit(-180.0) + (lit(360.0) * col("h2").cast(DoubleType)) / 2147483648.0)
        .as("lon"),
      (lit(8) + (col("h1") % 9)).cast(IntegerType).as("w"),
      (lit(8) + (col("h2") % 9)).cast(IntegerType).as("h"),
      when(col("h3") % 10 < 9, lit("raw")).otherwise(lit("lossy")).as("fmt"),
      concat(lit("caption for img"), lpad(col("k").cast(StringType), 12, "0"))
        .as("caption"),
      (col("h1") * M + col("h2")).as("phash"))
  }

  /** Bench-scale variant: the image table replicated `r` times with
    * perturbed keys (k' = k*r + i), so every replica gets its own anchor /
    * phash / caption — real distinct rows, not copies. Used by the headline
    * throughput job to make compute dominate fixed job overhead when
    * measuring N -> 4N core scaling (BASELINE.md north metric). */
  def imagesReplicated(spark: SparkSession, sfDir: String, r: Int): DataFrame = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val keyed = li
      .select((col("l_orderkey") * 8 + col("l_linenumber")).cast(LongType).as("k0"))
      .dropDuplicates("k0")
      // Explicit repartition BEFORE the x r amplification: AQE coalesces
      // the dedup shuffle on its tiny PRE-amplification size (~10 MB -> 1
      // partition), which would serialize the whole derive pipeline onto
      // one core. A user repartition is preserved by AQE, so the expansion
      // fans out across the cluster. (Real 10^12-row inputs arrive already
      // partitioned; the amplification is the sandbox's stand-in.)
      .repartition(spark.sparkContext.defaultParallelism * 2)
      // Amplify via a broadcast range cross join, NOT explode(sequence):
      // sequence() allocates an r-element array per base row (~5 GB of
      // garbage at r=1600), and the resulting GC acts as a serial fraction
      // that caps multi-core scaling. The nested-loop probe is allocation-
      // free codegen.
      .crossJoin(broadcast(spark.range(r).select(col("id").as("rep"))))
      .select((col("k0") * r + col("rep")).as("k"))
    withDerived(keyed)
  }

  /** Full `input_hint` table including the binary `bytes` column (raw w*h*3
    * raster from a seeded PRNG; `lossy` rows add bounded noise so PSNR>=40dB
    * holds by construction — FIXTURES.md §1). Binary synthesis is Spark-only;
    * oracle queries never project `bytes`. */
  def imagesWithBytes(spark: SparkSession, sfDir: String): DataFrame =
    images(spark, sfDir).withColumn("bytes",
      graft.multimodal.functions.synthetic_raster(
        col("k"), col("w"), col("h"), col("fmt")))

  /** Tiny 64-row golden fixture (FIXTURES.md `images_tiny`) built from an
    * explicit key range — no parquet dependency, usable in unit tests. */
  def imagesTiny(spark: SparkSession): DataFrame = {
    val keyed = spark.range(1, 65).select((col("id") * 97 + 13).as("k"))
    withDerived(keyed)
  }

  // ------------------------------------------------------------------ oracle

  /** DuckDB CTE reconstructing [[images]] from the `lineitem` view the driver
    * registers. Prefix of every spatial oracle query. */
  val oracleCte: String =
    """WITH img_k AS (
      |  SELECT DISTINCT l_orderkey * 8 + l_linenumber AS k FROM lineitem
      |), img_h1 AS (
      |  SELECT k, ((k % 2147483648) * 1103515245 + 12345) % 2147483648 AS h1 FROM img_k
      |), img_h2 AS (
      |  SELECT k, h1, (h1 * 1103515245 + 12345) % 2147483648 AS h2 FROM img_h1
      |), img_h3 AS (
      |  SELECT k, h1, h2, (h2 * 1103515245 + 12345) % 2147483648 AS h3 FROM img_h2
      |), images AS (
      |  SELECT k, h1, h2, h3,
      |    concat('img', lpad(CAST(k AS VARCHAR), 12, '0')) AS image_id,
      |    CASE WHEN k % 20 = 0
      |         THEN 37.0 + (CAST(h1 % 1024 AS DOUBLE) / 1024.0) * 0.001
      |         ELSE -60.0 + (120.0 * CAST(h1 AS DOUBLE)) / 2147483648.0 END AS lat,
      |    CASE WHEN k % 20 = 0
      |         THEN -122.0 + (CAST(h2 % 1024 AS DOUBLE) / 1024.0) * 0.001
      |         ELSE -180.0 + (360.0 * CAST(h2 AS DOUBLE)) / 2147483648.0 END AS lon,
      |    CAST(8 + (h1 % 9) AS INTEGER) AS w,
      |    CAST(8 + (h2 % 9) AS INTEGER) AS h,
      |    CASE WHEN h3 % 10 < 9 THEN 'raw' ELSE 'lossy' END AS fmt,
      |    concat('caption for img', lpad(CAST(k AS VARCHAR), 12, '0')) AS caption,
      |    h1 * 2147483648 + h2 AS phash
      |  FROM img_h3
      |)""".stripMargin

  /** SQL fragment: cell id of (`latExpr`, `lonExpr`) at `res` — mirrors
    * [[graft.geo.GridCell.encode]] exactly (same op order, same doubles). */
  def oracleCellSql(latExpr: String, lonExpr: String, res: Int): String = {
    val n = s"${1L << res}.0"
    s"((CAST($res AS BIGINT) << 58) " +
      s"| (CAST(floor((($latExpr + 90.0) / 180.0) * $n) AS BIGINT) << $res) " +
      s"| CAST(floor((($lonExpr + 180.0) / 360.0) * $n) AS BIGINT))"
  }
}
