package graft.agg

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Column, Encoder}

/** Per-tile phash "centroid" — the graft of the reference's cluster-summary
  * embedding (kmeans centroid as parent embedding,
  * raptor/kmeans_tree_builder.py:103,138-143): a bit-majority vote over the
  * 64 phash bits of all LEAF images under a tile.
  *
  * Majority-of-majorities is not a majority, so the pyramid carries the
  * partial state — a 65-slot count vector (ones-count per bit + total n) —
  * between levels and collapses it to the centroid hash per level. That makes
  * the rollup associative (partial + final == single pass from leaves), which
  * is exactly what Spark's partial aggregation needs to keep the shuffle
  * map-side combinable at scale.
  *
  * Centroid collapse rule: bit i set iff 2*ones(i) > n (strict; ties -> 0) —
  * deterministic, and reproducible in ANSI SQL for the DuckDB oracle.
  */
object PhashCentroid {

  private def zeroBuf: Array[Long] = new Array[Long](65)

  private def addHash(b: Array[Long], phash: Long): Array[Long] = {
    var i = 0
    while (i < 64) { b(i) += (phash >>> i) & 1L; i += 1 }
    b(64) += 1L
    b
  }

  private def mergeBufs(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 65) { x(i) += y(i); i += 1 }
    x
  }

  /** Leaf-level: Long phash -> 65-slot count vector. */
  class FromHash extends Aggregator[Long, Array[Long], Seq[Long]] {
    override def zero: Array[Long] = zeroBuf
    override def reduce(b: Array[Long], a: Long): Array[Long] = addHash(b, a)
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = mergeBufs(x, y)
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Level-to-level: child count vectors -> parent count vector. */
  class MergeBits extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = zeroBuf
    override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] = {
      var i = 0
      while (i < 65) { b(i) += a(i); i += 1 }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = mergeBufs(x, y)
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Aggregate Column: phash column -> bits vector. */
  def bitsFromHash(phash: Column): Column = udaf(new FromHash).apply(phash)

  /** Aggregate Column: child bits vectors -> parent bits vector. */
  def bitsMerge(bits: Column): Column = udaf(new MergeBits).apply(bits)

  // ---- codegen path: the same 65-slot state as 65 built-in sum aggregates.
  // The typed Aggregator above goes through ObjectHashAggregate + encoder
  // round-trips (measured ~3x slower on the leaf rollup at sf0.1); these
  // stay inside HashAggregateExec/WholeStageCodegen. Both paths produce the
  // identical bits vector (RasterSpec pins the collapse rule).

  import org.apache.spark.sql.functions.{array, count, lit, shiftright, sum}

  /** 65 aggregate Columns (ones-count per bit + total n) over a phash
    * column — leaf level. Combine with [[assembleBits]] after the agg. */
  def bitSumAggs(phash: Column, prefix: String): Seq[Column] =
    (0 until 64).map { i =>
      sum(shiftright(phash, i).bitwiseAND(lit(1L))).as(s"${prefix}_$i")
    } :+ count(lit(1)).as(s"${prefix}_64")

  /** 65 aggregate Columns merging child bits vectors — upper levels. */
  def bitMergeAggs(bits: Column, prefix: String): Seq[Column] =
    (0 until 65).map { i =>
      sum(org.apache.spark.sql.functions.element_at(bits, i + 1)).as(s"${prefix}_$i")
    }

  /** Assemble the 65 post-agg columns back into one array column. */
  def assembleBits(df: org.apache.spark.sql.DataFrame, prefix: String,
                   out: String): org.apache.spark.sql.DataFrame = {
    val cols = (0 until 65).map(i => org.apache.spark.sql.functions.col(s"${prefix}_$i"))
    df.withColumn(out, array(cols: _*)).drop((0 until 65).map(i => s"${prefix}_$i"): _*)
  }

  /** Pure driver-side collapse (for tests). */
  def centroidOf(bits: Seq[Long]): Long = {
    val n = bits(64)
    var out = 0L
    var i = 0
    while (i < 64) { if (2 * bits(i) > n) out |= 1L << i; i += 1 }
    out
  }

  /** Codegen collapse kernel over the raw ArrayData (no per-element
    * boxing; Spark's `aggregate` HOF is interpreted CodegenFallback and
    * cost seconds per pyramid level on the tile rows). */
  def centroidOfBits(bits: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = bits.getLong(64)
    var out = 0L
    var i = 0
    while (i < 64) { if (2 * bits.getLong(i) > n) out |= 1L << i; i += 1 }
    out
  }

  /** Column collapse of a 65-slot bits vector to the centroid hash —
    * a native codegen'd expression calling [[centroidOfBits]]. */
  def centroidCol(bits: String): Column =
    org.apache.spark.sql.GraftBridge.column(
      CentroidFromBits(org.apache.spark.sql.GraftBridge.expression(
        org.apache.spark.sql.functions.col(bits))))

  import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{DataType, LongType}

  /** `CENTROID_FROM_BITS(bits) -> Long`: strict bit-majority collapse of
    * the 65-slot count vector (bit i set iff 2*ones(i) > n). */
  case class CentroidFromBits(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(v: Any): Any =
      centroidOfBits(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.agg.PhashCentroid.centroidOfBits($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
    override def prettyName: String = "centroid_from_bits"
  }

  /** The equivalent 64-term ANSI SQL (DuckDB oracle): bit-majority directly
    * over grouped leaf phashes. */
  def oracleCentroidSql(phashExpr: String): String =
    (0 until 64).map { i =>
      s"(CASE WHEN 2 * sum(($phashExpr >> $i) & 1) > count(*) " +
        s"THEN (CAST(1 AS BIGINT) << $i) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " | ", ")")
}
