package graft.agg

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a TYPED AGGREGATE — the map-side-combinable form of
  * the per-query kNN window (`row_number OVER (PARTITION BY qid ORDER BY
  * d2, nid) ≤ k`): keeps the k smallest (d2, nid) pairs in (d2, nid)
  * order. The window form must SHUFFLE EVERY CANDIDATE ROW into its
  * query's partition before ranking — at a planted-hot-cell corpus that
  * is O(occ²) rows through one exchange (measured 158 s for q_knn_join at
  * sf0.1); the aggregate form reduces each task's candidates to ≤ k rows
  * per query BEFORE the shuffle (ObjectHashAggregate partial → final), so
  * the exchange carries |queries| × partials × k rows no matter how many
  * candidate pairs the join emits. The upgrade path KMV's scaladoc
  * promises, delivered for the kNN family.
  *
  * Determinism: the buffer is kept sorted under the total order
  * (d2 asc, nid asc — ids are ASCII, so Scala string order ≡ Spark's
  * UTF8String binary order) — the exact window tie-break — and merge is
  * a sorted take(k), so the result is independent of arrival/partition
  * order. */
object TopK {

  private val ord = Ordering.Tuple2[Long, String]

  /** k smallest (d2: long, nid: string) pairs, ascending. */
  case class MinPairs(k: Int)
      extends Aggregator[(Long, String), Seq[(Long, String)],
        Seq[(Long, String)]] {
    override def zero: Seq[(Long, String)] = Vector.empty
    override def reduce(b: Seq[(Long, String)],
                        a: (Long, String)): Seq[(Long, String)] =
      if (b.size < k) (b :+ a).sorted(ord)
      else if (ord.lt(a, b.last)) (b.init :+ a).sorted(ord)
      else b
    override def merge(x: Seq[(Long, String)],
                       y: Seq[(Long, String)]): Seq[(Long, String)] =
      (x ++ y).sorted(ord).take(k)
    override def finish(r: Seq[(Long, String)]): Seq[(Long, String)] = r
    override def bufferEncoder: Encoder[Seq[(Long, String)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Long, String)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** `topk_min(k)(d2, nid)` → array<struct<_1: d2, _2: nid>> ascending. */
  def minPairs(k: Int): (Column, Column) => Column = {
    val f = udaf(MinPairs(k))
    (d2, nid) => f(d2, nid)
  }
}
