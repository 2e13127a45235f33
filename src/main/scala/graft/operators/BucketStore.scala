package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed catalog persistence for cell-keyed tile tables — the concrete
  * form of SCALE.md's "at target scale the table would be
  * partitioned/bucketed by a coarse cell" design, and the co-location
  * counterpart of the reference's repeated same-key tree joins
  * (`update_kmean_with_index`, raptor/merge_distance&tree_exam.py:687-766
  * joins two trees on the cluster key every maintenance pass).
  *
  * A table written with `bucketBy(n, cell)` records `HashPartitioning(cell,
  * n)` in the catalog, so EVERY future scan of it reports that partitioning
  * to the planner: an equi-join (or groupBy) on `cell` between two tables
  * bucketed with the same `n` plans with ZERO shuffle exchanges — at 100 TB
  * that converts the nightly stats-transfer join from two full-corpus
  * shuffles into a map-side zip of co-located buckets. `sortBy(cell)` is
  * recorded too: the join still plans a partition-LOCAL sort (Spark 3+
  * dropped the sorted-bucket-scan assumption unless
  * `spark.sql.legacy.bucketedTableScan.outputOrdering` is set, because a
  * multi-file bucket would need a merge), but since [[write]] emits one
  * file per bucket that sort re-orders already-sorted runs and moves zero
  * bytes between executors; the clustering also tightens parquet page
  * min/max bounds for key-range skipping.
  *
  * Scale notes:
  *  - [[write]] repartitions by the bucket key first, aligning task hash
  *    with bucket hash (both Murmur3), so each task emits exactly ONE
  *    bucket file — without it a T-task write fans out to T x n files,
  *    which at cluster scale is a small-files storm AND re-inserts the
  *    sort before every bucketed join.
  *  - the one-time write shuffle is the amortized cost: it replaces the
  *    per-join shuffle every downstream consumer would otherwise pay.
  *  - bucket count is a DESIGN parameter (fixed at write): pick it from
  *    target bytes/bucket, not cluster width — readers of any parallelism
  *    share the same co-location.
  */
object BucketStore {

  /** Persist `df` into the session catalog as a parquet table bucketed AND
    * sorted by `key` into `nBuckets` buckets (one file per bucket).
    *
    * The rewrite is STAGED so the previous table survives a failed job:
    * the data lands under `<table>__staging` first, and only after that
    * write succeeds is the old table dropped and the staging table renamed
    * into place (two metadata ops — a crash between them leaves the data
    * safe under the staging name). Destroy-then-recreate would leave every
    * downstream consumer with no table at all if the multi-hour 100 TB
    * rewrite died midway.
    *
    * Both names are also self-healed against ORPHANED locations: a
    * session-scoped (in-memory) catalog forgets its tables when the
    * application exits but their managed directories survive, so a later
    * CREATE fails with LOCATION_ALREADY_EXISTS. Drop + clear the default
    * location first (through the Hadoop FS API, so the same code heals on
    * an object store). */
  def write(df: DataFrame, table: String, nBuckets: Int,
            key: String = "cell"): Unit = {
    val spark = df.sparkSession
    val staging = s"${table}__staging"
    dropWithLocation(spark, staging)
    df.repartition(nBuckets, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
      .saveAsTable(staging)
    dropWithLocation(spark, table) // old table outlived the whole rewrite
    spark.sql(s"ALTER TABLE `$staging` RENAME TO `$table`")
  }

  /** Drop `table` if registered AND clear its default managed location if a
    * forgotten previous session left files there. */
  private def dropWithLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Scan a bucketed table; the plan carries the catalog's bucket
    * partitioning. */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Equi-join of two identically bucketed tables on the bucket key. The
    * `merge` hint pins a sort-merge join (a broadcast would also avoid the
    * shuffle but only because one side is small — the bucketed SMJ is the
    * shape that stays shuffle-free when BOTH sides are 100 TB). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String = "cell"): DataFrame =
    table(spark, left).hint("merge").join(table(spark, right), Seq(key))
}
