package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF JOIN — "the latest right-side value at or before each left row's
  * time, per key". Spark has no native operator for it (the brief's
  * canonical example of a gap); the naive forms both fail at scale: a
  * theta join `l.ts >= r.ts` is a nested loop, and a per-left-row
  * subquery is O(L·R) per key. This implementation is the classic
  * union-and-carry shape:
  *
  *   1. tag right rows side=0, left rows side=1, union them;
  *   2. ONE window per key ordered by (ts, side) with
  *      `last(value, ignoreNulls)` carrying the most recent right value
  *      forward (side 0 sorts before 1 at equal ts, so the match is
  *      INCLUSIVE — `ts >= rts`, exactly DuckDB's ASOF semantics);
  *   3. keep the left rows.
  *
  * Cost: one shuffle on the key + a per-key sort — linear in |L|+|R|,
  * AQE-splittable on hot keys, no pair explosion. The DuckDB oracle for
  * q_asof_join is the NATIVE `ASOF JOIN` operator, so the hash match is a
  * cross-engine proof of the operator's semantics, not of a re-encoded
  * formula.
  *
  * Contract: `right` must be unique per (key, ts) — with duplicates the
  * carried value would depend on sort nondeterminism; callers dedupe
  * (e.g. max(value) per key+ts). Left rows with no prior right keep a
  * NULL value (left-asof semantics); filter it for inner.
  *
  * NULL right values are matched, not skipped: the carry runs over
  * `struct(value)` (non-null wrapper even when `value` is NULL), so a
  * right row whose value is NULL wins the as-of match and yields NULL —
  * exactly DuckDB's ASOF JOIN, which matches on (key, ts) alone. A raw
  * `last(value, ignoreNulls=true)` would transparently bypass NULL rows
  * and carry an OLDER non-null value (AsOfJoinSpec pins the difference). */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           value: String): DataFrame = {
    require(!left.columns.contains(value),
      s"left side already has a column named '$value'")
    val lCols = left.columns.toIndexedSeq
    val vType = right.schema(value).dataType
    // carry a non-null STRUCT wrapper so right rows with a NULL value
    // still win the as-of match (ignoreNulls must only skip LEFT rows)
    val l = left
      .withColumn("__pack",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          Seq(org.apache.spark.sql.types.StructField("v", vType)))))
      .withColumn("__side", lit(1))
    val rPad = lCols.filterNot(c => c == key || c == ts)
      .foldLeft(right.select(col(key), col(ts),
        struct(col(value).as("v")).as("__pack"))) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
      .withColumn("__side", lit(0))
    val ordered: Seq[Column] = (lCols :+ "__pack" :+ "__side").map(col)
    val u = l.select(ordered: _*).unionByName(rPad.select(ordered: _*))
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__asof", last(col("__pack"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumn(value, col("__asof").getField("v"))
      .drop("__side", "__pack", "__asof")
  }
}
