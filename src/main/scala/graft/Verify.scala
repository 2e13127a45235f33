package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Let AQE re-coalesce the output partitioning of CACHED plans: the
      // snapshot/merge operators persist tile-sized frames (|cells| rows),
      // which otherwise keep the full shuffle-partition fan-out and turn
      // every downstream stage into hundreds of micro-tasks (measured:
      // warm mergeDelta 10.7 s -> 5.5 s at sf0.1/64 partitions).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      // bucketed STORES are a deliberate design choice (BucketStore): keep
      // bucketed scans (and with them bucket PRUNING on the bucket key)
      // even when no downstream operator needs the distribution — the
      // planner's DisableUnnecessaryBucketedScan would otherwise silently
      // re-scan all buckets for a single-term posting lookup.
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev-only subset filter (the driver never sets this): comma-separated
    // query names to dump; oracle_sql.json is filtered to match so
    // verify_local.py compares exactly the subset.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def keep(name: String) = only.forall(_.contains(name))
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try {
        // repartition(1), not coalesce(1): coalesce collapses the WHOLE
        // query to one task; repartition keeps the query parallel and
        // serializes only the final dump through the single writer
        fn(spark, sfDir).repartition(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(s"[verify] $name dumped")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
