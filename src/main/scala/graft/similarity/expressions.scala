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

object functions {
  def vec_dot(a: Column, b: Column): Column =
    GraftBridge.column(VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", es => VecDot(es(0), es(1)), "builtin")
}
