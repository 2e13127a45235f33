package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Codegen'd text kernels. The dual-dialect SQL fragments in [[TextOps]]
  * remain the ORACLE definitions; these kernels are the engine-side
  * equivalents for hot paths where the fragment form would compile 32
  * unrolled interpreted HOF folds (janino + per-element boxing). All
  * integer arithmetic — result equality with the fragments is exact by
  * construction, order-free. */
object TextKernel {
  /** 32-bit SimHash over a token-hash array with multiplicity: bit i set
    * iff sum over hashes of (2*bit_i - 1) > 0 == 2*ones_i - n > 0.
    * Mirrors [[TextOps.simhash]] exactly. */
  def simhash32(hs: ArrayData): Long = {
    val n = hs.numElements()
    val ones = new Array[Int](32)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < 32) {
        if (((h >> i) & 1L) == 1L) ones(i) += 1
        i += 1
      }
      j += 1
    }
    var sim = 0L
    var i = 0
    while (i < 32) {
      if (2 * ones(i) - n > 0) sim |= 1L << i
      i += 1
    }
    sim
  }
}

/** `SIMHASH32(hs: array<bigint>) -> bigint`. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(hs: Any): Any =
    TextKernel.simhash32(hs.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, hs => s"graft.text.TextKernel.simhash32($hs)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "simhash32"
}

object functions {
  def simhash32(hs: Column): Column =
    GraftBridge.column(SimHash32(GraftBridge.expression(hs)))
}
