package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, JoinType}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.LongType

import graft.geo.{CellEncode, PointInPoly, PolyCoverCells, QuadkeyTiling, S2Encode}

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

/** Rewrite a NAIVE point-in-polygon theta join —
  * `points CROSS JOIN polygons` filtered by
  * `point_in_poly(lat, lon, lats, lons)` with the polygon vertices coming
  * from the join's other side — into the prefilter + refine equi-join that
  * [[graft.operators.SpatialJoin.pipJoin]] builds by hand: the point side
  * gains a covering cell, the polygon side explodes its covering cells
  * (distributed [[PolyCoverCells]]), the cross join becomes an inner
  * equi-join on the cell, and the containment predicate stays as the
  * refine filter. Semantics are exactly preserved (the cover is a superset
  * of the polygon's bbox, so every contained point's cell collides), while
  * the nested-loop O(|points| x |polys|) plan becomes a hash join.
  *
  * Matches both shapes the optimizer produces: `Filter(pip, Join(.., None))`
  * and `Join(.., Some(pip && ...))` (after PushPredicateThroughJoin).
  * Idempotent: the refine predicate is marked `refineOnly`.
  *
  * The covering resolution and tiling strategy are session-tunable
  * ([[PipJoinToCoverJoin.ResKey]] / [[PipJoinToCoverJoin.StrategyKey]]) so
  * a session standardized on S2, or joining polygons much larger/smaller
  * than the res-6 default cells, gets a matched-granularity rewrite —
  * correctness never depends on them (any cover is a superset). */
object PipJoinToCoverJoin extends Rule[LogicalPlan] with PredicateHelper {
  /** Covering resolution; default mirrors SpatialJoin.CoverRes. */
  val ResKey = "spark.graft.pip.coverRes"
  /** Tiling index for the rewrite: "quadkey" (default) or "s2". */
  val StrategyKey = "spark.graft.pip.strategy"

  private def coverRes: Int = conf.getConfString(ResKey, "6").toInt
  private def strategy: graft.geo.TilingStrategy =
    conf.getConfString(StrategyKey, "quadkey") match {
      case "s2" => graft.geo.S2Tiling
      case _    => QuadkeyTiling
    }

  private def ok(jt: JoinType): Boolean = jt == Inner || jt == Cross

  private def rewrite(j: Join, conjuncts: Seq[Expression]): Option[LogicalPlan] = {
    val Res = coverRes
    val strat = strategy
    val (left, right, hint) = (j.left, j.right, j.hint)
    def sided(p: PointInPoly, ptSide: LogicalPlan, polySide: LogicalPlan): Boolean = {
      val ptRefs = p.lat.references ++ p.lon.references
      val polyRefs = p.lats.references ++ p.lons.references
      p.deterministic && ptRefs.nonEmpty && polyRefs.nonEmpty &&
        ptRefs.subsetOf(ptSide.outputSet) && polyRefs.subsetOf(polySide.outputSet)
    }
    conjuncts.collectFirst {
      case p: PointInPoly if !p.refineOnly && sided(p, left, right) => (p, true)
      case p: PointInPoly if !p.refineOnly && sided(p, right, left) => (p, false)
    }.map { case (p, pointsOnLeft) =>
      val ptCell: Expression = strat match {
        case graft.geo.S2Tiling => S2Encode(p.lat, p.lon, Literal(Res))
        case _                  => CellEncode(p.lat, p.lon, Literal(Res))
      }
      val cellAlias = Alias(ptCell, "_pip_cell_pt")()
      val genOut = AttributeReference("_pip_cell_poly", LongType,
        nullable = false)()
      val gen = Explode(PolyCoverCells(p.lats, p.lons, Literal(Res), strat))
      val (newL, newR) =
        if (pointsOnLeft)
          (Project(left.output :+ cellAlias, left),
            Generate(gen, Nil, outer = false, None, Seq(genOut), right))
        else
          (Generate(gen, Nil, outer = false, None, Seq(genOut), left),
            Project(right.output :+ cellAlias, right))
      val eq = EqualTo(cellAlias.toAttribute, genOut)
      val rest = conjuncts
        .map(c => if (c eq p) p.copy(refineOnly = true) else c)
        .reduce(And)
      Project(j.output, Filter(rest, Join(newL, newR, Inner, Some(eq), hint)))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: Join) if ok(j.joinType) && j.condition.isEmpty =>
      rewrite(j, splitConjunctivePredicates(cond)).getOrElse(f)
    case j: Join if ok(j.joinType) && j.condition.isDefined =>
      rewrite(j, splitConjunctivePredicates(j.condition.get)).getOrElse(j)
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => PolygonBBoxPrefilter)
    ext.injectOptimizerRule(_ => PipJoinToCoverJoin)
    GraftFunctions.all.foreach(ext.injectFunction)
  }
}

/** Runtime installation on an already-built session: the optimizer rules
  * (via `experimental.extraOptimizations`) plus the SQL function surface
  * ([[GraftFunctions]]). */
object GraftOptimizations {
  def install(spark: SparkSession): Unit = {
    Seq(PolygonBBoxPrefilter, PipJoinToCoverJoin).foreach { r =>
      if (!spark.experimental.extraOptimizations.contains(r))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ r
    }
    GraftFunctions.install(spark)
  }
}
