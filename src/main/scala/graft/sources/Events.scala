package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** THE one definition of the events table's deterministic geo-position:
  * the images table's LCG derivation family seeded by `event_id`. Four
  * consumers previously carried private copies of the (M, A, C) constants
  * and the lat/lon formulas — `Queries.eventPositions`, the
  * `eventCellCtes` oracle SQL, `StreamingTiles.eventCells`, and
  * StreamingSpec's driver replays (ADVICE r4) — where drift in any copy
  * would break batch/stream parity and only surface at test time. All
  * four now derive from here: the column builder for batch AND streaming
  * frames (identical Catalyst expressions → identical plans), the SQL
  * fragments for the DuckDB oracle, and the scalar twin for driver-side
  * spec truths. */
object Events {

  /** LCG parameters (glibc rand constants — also the documents/images
    * synthesis family of TESTDATA.md). */
  val M = 2147483648L
  val A = 1103515245L
  val C = 12345L

  /** Adds `h1, h2, lat, lon` to any frame bearing `event_id` — works on
    * batch and streaming DataFrames alike (pure projection). */
  def withPosition(df: DataFrame): DataFrame = df
    .withColumn("h1", ((col("event_id") % M) * A + C) % M)
    .withColumn("h2", (col("h1") * A + C) % M)
    .withColumn("lat",
      lit(-60.0) + (lit(120.0) * col("h1").cast("double")) / 2147483648.0)
    .withColumn("lon",
      lit(-180.0) + (lit(360.0) * col("h2").cast("double")) / 2147483648.0)

  /** Driver-side scalar twin of [[withPosition]] — bit-identical math for
    * spec truths (same op order: Long LCG steps, then the two double
    * expressions). */
  def positionOf(eventId: Long): (Double, Double) = {
    val h1 = ((eventId % M) * A + C) % M
    val h2 = (h1 * A + C) % M
    (-60.0 + (120.0 * h1.toDouble) / 2147483648.0,
      -180.0 + (360.0 * h2.toDouble) / 2147483648.0)
  }

  /** Oracle SQL twins of the two LCG steps and the position formulas —
    * interpolated (never hand-copied) so the constants cannot drift. */
  def oracleH1Sql: String = s"((event_id % $M) * $A + $C) % $M"
  def oracleH2Sql: String = s"(h1 * $A + $C) % $M"
  def oracleLatSql: String = "-60.0 + (120.0 * CAST(h1 AS DOUBLE)) / 2147483648.0"
  def oracleLonSql: String = "-180.0 + (360.0 * CAST(h2 AS DOUBLE)) / 2147483648.0"
}
