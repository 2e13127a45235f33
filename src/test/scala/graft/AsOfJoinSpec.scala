package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** AsOfJoin semantics against an independent brute-force form (all-pairs
  * pts <= ts, argmax pts), plus the edge semantics a temporal join must
  * pin: inclusive equal-timestamp match, per-key isolation, and NULL for
  * rows with no prior right value. */
class AsOfJoinSpec extends SparkFunSuite {

  import spark.implicits._

  test("asOf == brute-force argmax over prior rows; edges pinned") {
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 250L), (3L, 10L, 50L), // key 10
      (4L, 20L, 100L), // key 20: right exists only AFTER -> null
      (5L, 30L, 100L)  // key 30: no right rows at all -> null
    ).toDF("event_id", "k", "t")
    val right = Seq(
      (10L, 100L, 1.5), // equal ts as event 1 -> INCLUSIVE match
      (10L, 200L, 2.5),
      (20L, 900L, 9.9)
    ).toDF("k", "t", "v")

    val got = AsOfJoin.asOf(left, right, "k", "t", "v")
      .select("event_id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(
      1L -> Some(1.5), // t=100 matches rts=100 (>= is inclusive)
      2L -> Some(2.5), // t=250 -> latest prior is rts=200
      3L -> None,      // t=50: no prior purchase
      4L -> None,      // right row is in the future
      5L -> None))     // key never has right rows

    // brute-force parity on the real events table
    val ev = spark.read.parquet(s"${SparkSpec.Sf}/events.parquet")
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("pval"))
    val probes = ev.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val viaOp = AsOfJoin.asOf(probes, p, "user_id", "ts", "pval")
    val best = probes.join(
        p.select(col("user_id"), col("ts").as("pts"), col("pval")),
        Seq("user_id"))
      .filter(col("pts") <= col("ts"))
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("event_id")).orderBy(col("pts").desc)))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("pval"))
    // left join back so no-prior-match events keep their NULL
    val brute = probes.join(best, Seq("event_id"), "left_outer")
      .select(col("event_id"), col("user_id"), col("ts"), col("pval"))
    assert(viaOp.exceptAll(brute).isEmpty && brute.exceptAll(viaOp).isEmpty)
  }

  test("a NULL right value WINS the as-of match (not skipped)") {
    // DuckDB's ASOF JOIN matches on (key, ts) alone; a NULL value row is
    // still the latest-prior match. A raw last(v, ignoreNulls) carry would
    // bypass it and resurrect the older 1.0 — the struct wrapper must not.
    val left = Seq((1L, 10L, 300L)).toDF("event_id", "k", "t")
    val right = Seq(
      (10L, 100L, Some(1.0)),
      (10L, 200L, None: Option[Double]) // latest prior, value NULL
    ).toDF("k", "t", "v")
    val got = AsOfJoin.asOf(left, right, "k", "t", "v").collect()
    assert(got.length == 1 && got.head.isNullAt(got.head.fieldIndex("v")),
      s"NULL right value was skipped: ${got.mkString}")
  }
}
