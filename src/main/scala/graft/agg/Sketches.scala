package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size frequency/membership sketches with exactly-reproducible
  * answers — the two classic companions of [[Kmv]] (distinct count):
  *
  *   - [[Cms]]: Count-Min (Cormode & Muthukrishnan 2005) frequency
  *     estimation — d x w integer counters, built with ONE keyed groupBy
  *     (map-side combinable, mergeable by +), probed map-side. The state
  *     is d·w cells regardless of input size: the shape that lets 1000
  *     executors sketch a 100 TB token stream and ship KBs.
  *   - [[Bloom]]: Bloom membership (k bit positions of m) — the broadcast
  *     prefilter that lets an incremental-ingest dedup skip the exact
  *     (shuffling) content-hash anti-join for definite-misses. Kept in
  *     relational form (the distinct set-bit positions), so the oracle
  *     replays it verbatim; OR-mergeability is the positions-set union.
  *
  * Both use the cross-engine md5 hash device (`(0x || substr(md5(s),1,8))`
  * — 32-bit, exactly reproducible in Spark and DuckDB), salted by the
  * row/hash index `i` as `md5(i || ':' || key)`.
  */
object Sketches {

  /** 32-bit salted hash bucket: `md5(i:key) mod span` — identical in both
    * engines (probe and build MUST use the same device). */
  def saltedBucket(i: Column, key: Column, span: Long): Column =
    conv(substring(md5(concat(i.cast("string"), lit(":"), key)), 1, 8), 16, 10)
      .cast("long") % span

  /** DuckDB twin of [[saltedBucket]]. */
  def saltedBucketSql(i: String, key: String, span: Long): String =
    s"('0x' || substr(md5(CAST($i AS VARCHAR) || ':' || $key), 1, 8))" +
      s"::BIGINT % $span"

  object Cms {

    /** The d x w counter table of a `key` multiset: one row per non-empty
      * (row, bucket) cell. Exact + mergeable: counters are plain sums. */
    def sketch(keys: DataFrame, key: String, d: Int, w: Long): DataFrame =
      keys
        .withColumn("r", explode(array((0 until d).map(lit): _*)))
        .withColumn("b", saltedBucket(col("r"), col(key), w))
        .groupBy(col("r"), col("b"))
        .agg(count(lit(1)).as("c"))

    /** Point-estimate each probe key: min over the d counters it hashes
      * to (carrying every probe column through). The sketch is at most
      * d·w rows, so it joins broadcast. */
    def estimate(sketch: DataFrame, probes: DataFrame, key: String,
                 d: Int, w: Long): DataFrame =
      probes
        .withColumn("r", explode(array((0 until d).map(lit): _*)))
        .withColumn("b", saltedBucket(col("r"), col(key), w))
        .join(broadcast(sketch), Seq("r", "b"))
        .groupBy(probes.columns.map(col): _*)
        .agg(min(col("c")).as("cms_est"))
  }

  object Bloom {

    /** The set-bit positions of a Bloom filter over the distinct values
      * of `key` — k salted hashes into [0, m). This IS the filter in
      * relational form (bit j set iff j appears); merging filters is a
      * positions UNION (bitwise OR). */
    def positions(build: DataFrame, key: String, k: Int, m: Long): DataFrame =
      build.select(col(key)).distinct()
        .withColumn("i", explode(array((0 until k).map(lit): _*)))
        .select(saltedBucket(col("i"), col(key), m).as("p"))
        .distinct()

    /** Probe: a row "hits" iff ALL k of its positions are set. The
      * positions frame is bounded by m (tiny), so the join broadcasts —
      * the probe side never shuffles. */
    def probe(probes: DataFrame, key: String, k: Int, m: Long,
              positions: DataFrame): DataFrame = {
      val exploded = probes
        .withColumn("i", explode(array((0 until k).map(lit): _*)))
        .withColumn("p", saltedBucket(col("i"), col(key), m))
      exploded
        .join(broadcast(positions.withColumn("m_", lit(1L))), Seq("p"), "left")
        .groupBy(probes.columns.map(col): _*)
        .agg((sum(coalesce(col("m_"), lit(0L))) === k).cast("long")
          .as("bloom_hit"))
    }
  }
}
