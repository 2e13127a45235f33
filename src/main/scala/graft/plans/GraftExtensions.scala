package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData

import graft.geo.PointInPoly

/** Catalyst optimizer extension (SURVEY.md §4 "custom Catalyst work"):
  * rewrite a CONSTANT-polygon containment predicate
  * `point_in_poly(lat, lon, <literal vertices>)` into
  * `bbox-range AND point_in_poly(..., refineOnly)` — the automatic form of
  * the prefilter+refine shape the SpatialJoin API builds by hand (J3).
  *
  * Why it matters at scale: the injected range conjuncts are plain
  * comparisons on the coordinate columns, so when those columns come
  * straight from storage they reach the parquet/Iceberg scan as
  * `PushedFilters` (row-group pruning), and rows failing the bbox skip
  * the 2m-vertex crossing loop entirely. Semantics are unchanged:
  * bbox(poly) contains poly, so `bbox AND contains == contains`.
  *
  * Idempotence: the rewritten predicate is marked `refineOnly = true`,
  * which this rule never matches again (optimizer batches re-run rules to
  * fixpoint).
  *
  * Install either way:
  *  - config: `spark.sql.extensions=graft.plans.GraftExtensions`
  *  - runtime: `GraftOptimizations.install(spark)` (uses the
  *    `experimental.extraOptimizations` hook of an existing session).
  */
object PolygonBBoxPrefilter extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case p @ PointInPoly(lat, lon, lats, lons, false)
          // The rewrite duplicates lat/lon into four bbox conjuncts, so they
          // must be deterministic (a non-deterministic child would be
          // re-evaluated with different values — a semantics change).
          if lats.foldable && lons.foldable &&
            lat.deterministic && lon.deterministic =>
        val la = lats.eval().asInstanceOf[ArrayData].toDoubleArray()
        val lo = lons.eval().asInstanceOf[ArrayData].toDoubleArray()
        val refined = p.copy(refineOnly = true)
        if (la.isEmpty || lo.isEmpty) refined
        else {
          val bbox = And(
            And(GreaterThanOrEqual(lat, Literal(la.min)),
              LessThanOrEqual(lat, Literal(la.max))),
            And(GreaterThanOrEqual(lon, Literal(lo.min)),
              LessThanOrEqual(lon, Literal(lo.max))))
          And(bbox, refined)
        }
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => PolygonBBoxPrefilter)
}

/** Runtime installation on an already-built session. */
object GraftOptimizations {
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(PolygonBBoxPrefilter))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PolygonBBoxPrefilter
}
