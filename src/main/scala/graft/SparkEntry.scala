package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query definitions live in [[Queries]]; this object is the stable facade
  * the driver invokes. */
object SparkEntry {

  /** Flagship: build the full tile pyramid over the synthesized image table
    * at sf0.001 and emit per-level metrics (≙ reference demo.py build +
    * log_tree_structure). Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val images = sources.Images.images(spark, "/root/testdata/sf0.001")
    val (pyr, _) = operators.TilePyramid.build(images, 4, 12)
    operators.TilePyramid.levelMetrics(pyr)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queryMap

  /** DuckDB-equivalent ANSI SQL per query (driver correctness gate). */
  def oracleSql: Map[String, String] = Queries.oracleMap
}
