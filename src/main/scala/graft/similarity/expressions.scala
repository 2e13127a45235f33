package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Codegen'd vector kernels. Spark's built-in higher-order functions
  * (`aggregate`/`zip_with`) are CodegenFallback — interpreted row-at-a-time
  * with per-element boxing — which makes a 12.5M-pair cosine join ~100x
  * slower than it needs to be. This native expression keeps the dot product
  * inside WholeStageCodegen as a tight primitive loop (the same
  * matrix-kernel role faiss IndexFlatIP plays in the reference,
  * raptor/FaissRetriever.py:125-145).
  *
  * IEEE-754 contract: sequential left-to-right accumulation starting at
  * 0.0 — bit-identical to the `aggregate(zip_with(...))` fold AND to the
  * DuckDB oracle's `list_reduce` (Ann.dot), so swapping the kernel never
  * moves a value. */
object VecKernel {
  /** Interpreted path (mirrors the generated loop exactly). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Banded hyperplane signatures in one pass: plane p's projection is the
    * left-assoc signed sum (head = ±v[0], then acc ± v[i] — BIT-IDENTICAL
    * to the unrolled ±chain the DuckDB oracles embed, Ann.proj); positive
    * projections set bit p%bits of band p/bits. One tight loop replaces
    * nPlanes unrolled 64-term expressions (janino compile of those
    * dominated q_embed_neardup's cold time). */
  def bands(v: ArrayData, signs: Array[Int], dim: Int, bits: Int): ArrayData = {
    val nPlanes = signs.length / dim
    val out = new Array[Int](nPlanes / bits)
    var p = 0
    while (p < nPlanes) {
      val base = p * dim
      var acc = if (signs(base) > 0) v.getDouble(0) else 0.0 - v.getDouble(0)
      var i = 1
      while (i < dim) {
        if (signs(base + i) > 0) acc += v.getDouble(i) else acc -= v.getDouble(i)
        i += 1
      }
      if (acc > 0) out(p / bits) |= 1 << (p % bits)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `VEC_DOT(a, b) -> Double` over two array<double> columns. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType}, ${right.dataType})")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |double $acc = 0.0;
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "vec_dot"
}

/** `HYPERPLANE_BANDS(v) -> Array[Int]`: all LSH band signatures of a vector
  * in one codegen'd pass. `signs` is the flattened ±1 plane matrix
  * (nPlanes x dim, driver-derived — the same literals the oracle unrolls). */
case class HyperplaneBands(child: Expression, signs: Array[Int],
                           dim: Int, bits: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    VecKernel.bands(v.asInstanceOf[ArrayData], signs, dim, bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signs", signs, "int[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.similarity.VecKernel.bands($v, $ref, $dim, $bits);")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "hyperplane_bands"
}

/** Identity wrapper marked NON-DETERMINISTIC: a pure planning barrier.
  * Catalyst only pushes deterministic predicates through joins
  * (PushPredicateThroughJoin), so `filter(opaque(p))` stays ABOVE its
  * join. The streaming near-dup self-join needs this: with the cosine /
  * emit-once refine folded into the stream-stream join condition,
  * StreamingJoinHelper's state-watermark extraction trips over the
  * non-time conjuncts (`Cannot evaluate expression: ai` INTERNAL_ERROR
  * warnings, VERDICT r4 #2) while analyzing eviction constraints — the
  * time bounds still extract, but the join condition should carry ONLY
  * equi-keys and time bounds so the analysis is clean and provable.
  * Evaluation is a bit-exact identity (interpreted and codegen delegate
  * to the child) — "non-determinism" is a planner annotation here, never
  * a semantic one; StreamingSpec pins that results are unchanged. */
case class OpaqueBarrier(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "opaque"
}

object functions {
  def vec_dot(a: Column, b: Column): Column =
    GraftBridge.column(VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Planner barrier: see [[OpaqueBarrier]]. */
  def opaque(c: Column): Column =
    GraftBridge.column(OpaqueBarrier(GraftBridge.expression(c)))

  def hyperplane_bands(v: Column, signs: Array[Int], dim: Int, bits: Int): Column =
    GraftBridge.column(HyperplaneBands(GraftBridge.expression(v), signs, dim, bits))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", es => VecDot(es(0), es(1)), "builtin")
}
