package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query-side fixtures (FIXTURES.md §2) — polygons, kNN query points,
  * byte budgets. All deterministic:
  *  - kNN query coords derive from embedded INTEGERS via the same LCG
  *    formula as the image anchors, so the DuckDB oracle reconstructs
  *    bit-identical doubles from a VALUES list of ints;
  *  - polygon vertices are Scala doubles embedded into oracle SQL via
  *    shortest-roundtrip `Double.toString` (exact by IEEE-754 roundtrip).
  *
  * ≙ the reference's eval question sets (raptor test/test_k_mean_datasets.py
  * :276-283 — fixed per-run query lists). */
object Fixtures {

  private val A = 1103515245L
  private val C = 12345L
  private val M = 2147483648L

  // --------------------------------------------------------------- kNN queries

  /** (qid, qh1, qh2) integer seeds; qid >= 40 are hot-box queries (inside the
    * skewed cell — ≙ hot index_count nodes, raptor/merge_tree_builder.py:
    * 236-323). */
  val knnSeeds: Seq[(Int, Long, Long)] = (0 until 48).map { j =>
    val h1 = (j * 2654435761L + 1013904223L) % M
    val h2 = (h1 * A + C) % M
    (j, h1, h2)
  }

  /** Engine-side queries DF: qid, qlat, qlon (same formula as oracle CTE). */
  def knnQueries(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val df = knnSeeds.toDF("qid", "qh1", "qh2")
    df.select(
      col("qid"),
      when(col("qid") >= 40,
        lit(37.0) + (col("qh1") % 1024).cast("double") / 1024.0 * 0.001)
        .otherwise(lit(-60.0) + (lit(120.0) * col("qh1").cast("double")) / 2147483648.0)
        .as("qlat"),
      when(col("qid") >= 40,
        lit(-122.0) + (col("qh2") % 1024).cast("double") / 1024.0 * 0.001)
        .otherwise(lit(-180.0) + (lit(360.0) * col("qh2").cast("double")) / 2147483648.0)
        .as("qlon"))
  }

  /** Oracle CTE `queries(qid, qlat, qlon)` mirroring [[knnQueries]]. */
  val knnOracleCte: String = {
    val values = knnSeeds.map { case (q, h1, h2) => s"($q, $h1, $h2)" }.mkString(", ")
    s"""qseeds(qid, qh1, qh2) AS (SELECT * FROM (VALUES $values) AS t(qid, qh1, qh2)),
       |queries AS (
       |  SELECT qid,
       |    CASE WHEN qid >= 40
       |         THEN 37.0 + (CAST(qh1 % 1024 AS DOUBLE) / 1024.0) * 0.001
       |         ELSE -60.0 + (120.0 * CAST(qh1 AS DOUBLE)) / 2147483648.0 END AS qlat,
       |    CASE WHEN qid >= 40
       |         THEN -122.0 + (CAST(qh2 % 1024 AS DOUBLE) / 1024.0) * 0.001
       |         ELSE -180.0 + (360.0 * CAST(qh2 AS DOUBLE)) / 2147483648.0 END AS qlon
       |  FROM qseeds
       |)""".stripMargin
  }

  // ----------------------------------------------------------------- polygons

  /** kind: rect | convex | concave. Vertices CCW in (lon=x, lat=y). */
  case class Poly(polyId: String, lats: Array[Double], lons: Array[Double], kind: String)

  private def rect(id: String, clat: Double, clon: Double,
                   hlat: Double, hlon: Double): Poly =
    Poly(id,
      Array(clat - hlat, clat - hlat, clat + hlat, clat + hlat),
      Array(clon - hlon, clon + hlon, clon + hlon, clon - hlon), "rect")

  private def hexagon(id: String, clat: Double, clon: Double, r: Double): Poly = {
    val pts = (0 until 6).map { i =>
      val a = math.Pi / 3.0 * i + 0.2
      (clat + r * math.sin(a), clon + 1.4 * r * math.cos(a))
    }
    Poly(id, pts.map(_._1).toArray, pts.map(_._2).toArray, "convex")
  }

  /** Concave shapes — engine + ScalaTest brute-force only (ray casting is
    * the semantics; convex half-plane SQL can't express them directly). */
  private def lShape(id: String, clat: Double, clon: Double, s: Double): Poly =
    Poly(id,
      Array(clat, clat, clat + s, clat + s, clat + 2 * s, clat + 2 * s),
      Array(clon, clon + 2 * s, clon + 2 * s, clon + s, clon + s, clon),
      "concave")

  val polys: Seq[Poly] = Seq(
    rect("rect_eq", 2.5, 14.0, 4.0, 6.0),
    rect("rect_south", -33.0, -55.0, 5.0, 7.0),
    rect("rect_asia", 21.0, 101.0, 6.0, 5.0),
    rect("rect_west", 45.0, -120.0, 6.0, 9.0),
    rect("rect_hot", 37.0005, -121.9995, 0.01, 0.01), // covers the hot cell
    rect("rect_dateline_w", 10.0, 176.0, 5.0, 4.0),
    hexagon("hex_af", -8.0, 22.0, 4.5),
    hexagon("hex_eu", 47.5, 9.0, 3.0),
    hexagon("hex_sa", -20.0, -63.0, 5.0),
    hexagon("hex_oce", -27.0, 140.0, 6.0),
    hexagon("hex_na", 39.0, -98.0, 5.5),
    hexagon("hex_ru", 55.0, 83.0, 4.0),
    lShape("l_ind", 5.0, 78.0, 4.0),
    lShape("l_atl", -15.0, -30.0, 5.0),
    lShape("l_pac", 30.0, 165.0, 4.0))

  /** Dense bench polygon layer (raster<->vector assignment at scale): a
    * deterministic grid of 24-gons covering most of the inhabited band.
    * Refine work per candidate row is then ~polys-per-cell x 24 crossing
    * tests — compute-dense, which is what the 10^12-row assignment job
    * looks like with a real vector layer (vs the 15 sparse test polys). */
  def benchPolys(n: Int): Seq[Poly] = {
    val cols = (n + 7) / 8
    (0 until n).map { i =>
      val r = i % 8; val c = i / 8
      val clat = -52.0 + r * 13.0 + (c % 3) * 1.7
      val clon = -172.0 + (c + 0.5) * (344.0 / cols)
      val rad = 5.5 + (i % 5) * 0.6
      val pts = (0 until 24).map { v =>
        val a = 2.0 * math.Pi * v / 24 + 0.13 * (i % 7)
        (clat + rad * math.sin(a), clon + 1.3 * rad * math.cos(a))
      }
      Poly(f"bench_$i%03d", pts.map(_._1).toArray, pts.map(_._2).toArray, "convex")
    }
  }

  /** Engine-side polygons DF: poly_id, lats, lons. */
  def polygonsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    polys.map(p => (p.polyId, p.lats.toSeq, p.lons.toSeq))
      .toDF("poly_id", "lats", "lons")
  }

  /** Strict-interior SQL condition for one polygon over columns (lat, lon).
    * rect -> range predicate; convex -> CCW half-plane conjunction; concave
    * L-shapes -> union of two rectangles (exact decomposition). Boundary
    * (measure-zero for LCG anchors) differs from ray-casting only ON the
    * boundary line itself. */
  def polySql(p: Poly): String = p.kind match {
    case "rect" =>
      val (laMin, laMax) = (p.lats.min, p.lats.max)
      val (loMin, loMax) = (p.lons.min, p.lons.max)
      s"(lat > $laMin AND lat < $laMax AND lon > $loMin AND lon < $loMax)"
    case "convex" =>
      val n = p.lats.length
      (0 until n).map { i =>
        val j = (i + 1) % n
        val ax = p.lons(i); val ay = p.lats(i)
        val bx = p.lons(j); val by = p.lats(j)
        s"((${bx} - ${ax}) * (lat - ${ay}) - (${by} - ${ay}) * (lon - ${ax}) > 0)"
      }.mkString("(", " AND ", ")")
    case "concave" =>
      // lShape(clat, clon, s) = [clat,clat+s]x[clon,clon+2s] U [clat+s,clat+2s]x[clon,clon+s]
      val clat = p.lats(0); val clon = p.lons(0)
      val s = (p.lats(4) - p.lats(0)) / 2.0
      s"((lat > $clat AND lat < ${clat + s} AND lon > $clon AND lon < ${clon + 2 * s}) OR " +
        s"(lat >= ${clat + s} AND lat < ${clat + 2 * s} AND lon > $clon AND lon < ${clon + s}))"
  }

  /** DuckDB oracle for the polygon↔polygon join
    * ([[graft.operators.SpatialJoin.polyJoin]]): both layers' edges and
    * witness vertices as literal VALUES rows. Proper crossing mirrors
    * [[graft.geo.PipKernel.segCross]]'s orientation arithmetic
    * double-for-double (same op order, same strict products);
    * witness-vertex containment uses the kind-exact strict-interior
    * predicates ([[polySql]]) for layer A and the CCW half-plane
    * conjunction over the edge rows for the (convex) layer B — the same
    * off-boundary equivalence the pip oracles rely on. */
  def polyJoinOracleSql(as: Seq[Poly], bs: Seq[Poly]): String = {
    require(bs.forall(_.kind == "convex"),
      "oracle containment-in-B uses the half-plane form: B must be convex")
    // ::DOUBLE on every literal: DuckDB types bare VALUES numerics as
    // DECIMAL, whose arithmetic overflows AND diverges from the engine's
    // IEEE-754 doubles; the cast makes both engines round the same
    // decimal string to the same double.
    def edgeRows(ps: Seq[Poly]) = ps.flatMap { p =>
      val n = p.lats.length
      (0 until n).map { i =>
        val j = (i + 1) % n
        s"('${p.polyId}', ${p.lons(i)}::DOUBLE, ${p.lats(i)}::DOUBLE, " +
          s"${p.lons(j)}::DOUBLE, ${p.lats(j)}::DOUBLE)"
      }
    }.mkString(",\n    ")
    def v0Rows(ps: Seq[Poly]) = ps.map(p =>
      s"('${p.polyId}', ${p.lons(0)}::DOUBLE, ${p.lats(0)}::DOUBLE)")
      .mkString(",\n    ")
    val bInA = as.map { p =>
      s"SELECT '${p.polyId}' AS a_id, b_id FROM " +
        s"(SELECT b_id, py AS lat, px AS lon FROM bv0) t WHERE ${polySql(p)}"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH ea(a_id, eax, eay, ebx, eby) AS (VALUES
       |    ${edgeRows(as)}
       |), eb(b_id, eax, eay, ebx, eby) AS (VALUES
       |    ${edgeRows(bs)}
       |), av0(a_id, px, py) AS (VALUES
       |    ${v0Rows(as)}
       |), bv0(b_id, px, py) AS (VALUES
       |    ${v0Rows(bs)}
       |), crossed AS (
       |  SELECT DISTINCT ea.a_id, eb.b_id FROM ea, eb
       |  WHERE ((ea.ebx - ea.eax) * (eb.eay - ea.eay)
       |       - (ea.eby - ea.eay) * (eb.eax - ea.eax))
       |      * ((ea.ebx - ea.eax) * (eb.eby - ea.eay)
       |       - (ea.eby - ea.eay) * (eb.ebx - ea.eax)) < 0
       |    AND ((eb.ebx - eb.eax) * (ea.eay - eb.eay)
       |       - (eb.eby - eb.eay) * (ea.eax - eb.eax))
       |      * ((eb.ebx - eb.eax) * (ea.eby - eb.eay)
       |       - (eb.eby - eb.eay) * (ea.ebx - eb.eax)) < 0
       |), a_in_b AS (
       |  SELECT a_id, b_id FROM (
       |    SELECT av0.a_id, eb.b_id,
       |      min(CASE WHEN (eb.ebx - eb.eax) * (av0.py - eb.eay)
       |                  - (eb.eby - eb.eay) * (av0.px - eb.eax) > 0
       |          THEN 1 ELSE 0 END) AS inside
       |    FROM av0, eb GROUP BY av0.a_id, eb.b_id) WHERE inside = 1
       |), b_in_a AS (
       |  $bInA
       |)
       |SELECT a_id, b_id FROM (
       |  SELECT * FROM crossed UNION
       |  SELECT * FROM a_in_b UNION
       |  SELECT * FROM b_in_a)""".stripMargin
  }

  /** Union of per-polygon containment selections — the (poly_id, image_id)
    * matched relation as a reusable SQL fragment (consumed bare by
    * [[pipOracleSql]], and as a CTE body by the zonal-stats oracle). */
  def pipMatchedSql: String = polys.map { p =>
    s"SELECT '${p.polyId}' AS poly_id, image_id FROM images WHERE ${polySql(p)}"
  }.mkString("\nUNION ALL\n")

  /** Full oracle for the point-in-polygon join: UNION ALL over polygons. */
  def pipOracleSql(imagesCte: String): String =
    s"$imagesCte\n$pipMatchedSql"

  /** Oracle for per-(polygon, tile) coverage counts: same union, plus the
    * covering cell of each matched point, grouped. */
  def polyTileCovOracleSql(imagesCte: String, cellSql: String): String = {
    val parts = polys.map { p =>
      s"SELECT '${p.polyId}' AS poly_id, $cellSql AS cell FROM images WHERE ${polySql(p)}"
    }
    s"""$imagesCte
       |SELECT poly_id, cell, CAST(count(*) AS BIGINT) AS cnt FROM (
       |${parts.mkString("\nUNION ALL\n")}
       |) GROUP BY poly_id, cell""".stripMargin
  }

  /** Deterministic 48-vertex reference route (the map-matching target ≙ the
    * "known trajectory" the reference snaps query points onto when scoring
    * retrieval against dataset anchors). Coordinates are EXACT integer
    * micro-degrees — constructed with integer arithmetic only, so the Spark
    * literals and the oracle VALUES are the same lattice points and the
    * snap distances are exact BIGINTs on both engines. The path sweeps the
    * populated lat/lon band diagonally with a bounded integer wiggle. */
  val routeVertices: Seq[(Int, Long, Long)] = (0 until 48).map { i =>
    val vlat = -55000000L + i * 2300000L + ((i.toLong * i * 37L) % 900000L)
    val vlon = -170000000L + i * 7100000L + ((i.toLong * 53L) % 1300000L)
    (i, vlat, vlon)
  }

  /** `(vid, vlat, vlon)` VALUES relation for the oracle. */
  val routeOracleValues: String =
    routeVertices.map { case (i, la, lo) => s"($i, $la, $lo)" }.mkString(", ")
}
