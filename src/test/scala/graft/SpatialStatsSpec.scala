package graft

import org.apache.spark.sql.functions._

import graft.geo.{functions => G}

/** Spatial statistics (q_morans_i / q_variogram): the driver gate proves
  * the integer pieces cross-engine; these pin that the pieces COMBINE to
  * the textbook statistics on hand fixtures — Moran's I via the exact
  * rational identity in the q_morans_i scaladoc, the semivariogram via
  * gamma = sq_sum / (2 n_pairs) — and that the pair machinery (queen
  * adjacency, self exclusion, ordered pairs, d2 binning) is exact. */
class SpatialStatsSpec extends SparkFunSuite {

  test("Moran's I pieces combine to the naive statistic (hand fixture)") {
    import spark.implicits._
    // Occupied res-7 pixels: a (5 pts) and b = a+1 (5 pts) adjacent,
    // far (2 pts) isolated. Deviations from mean 4: +1, +1, -2 ->
    // I = (N/S0) * sum_pairs didj / sum di^2 = (3/2)*(2/6) = 0.5.
    val pts = Seq.fill(5)((0.1, 0.1)) ++ Seq.fill(5)((0.1, 3.0)) ++
      Seq.fill(2)((40.0, 100.0))
    val g = pts.toDF("lat", "lon")
      .withColumn("cell", G.cell_encode(col("lat"), col("lon"), 7))
      .groupBy("cell").agg(count(lit(1)).as("cnt"))
    val base = g.agg(count(lit(1)).as("n_cells"),
      sum(col("cnt")).as("sx"), sum(col("cnt") * col("cnt")).as("sxx"))
    val pairs = g.select(col("cell").as("src"), col("cnt").as("xi"),
        explode(G.cell_ring(col("cell"), lit(1))).as("cell"))
      .where(col("cell") =!= col("src"))
      .join(g, Seq("cell"))
      .agg(count(lit(1)).as("s0"),
        sum(col("xi") * col("cnt")).as("spp"),
        sum(col("xi") + col("cnt")).as("srs"))
    val r = base.crossJoin(pairs).collect().head
    val (n, sx, sxx) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (s0, spp, srs) = (r.getLong(3), r.getLong(4), r.getLong(5))
    assert((n, sx, sxx) == ((3L, 12L, 54L)))
    assert((s0, spp, srs) == ((2L, 50L, 20L)))
    val num = n * n * spp - n * sx * srs + sx * sx * s0
    val den = s0 * (n * sxx - sx * sx)
    assert(num == 18L && den == 36L)
    // Naive definition over the three cells: I = (N/S0) SS_w / SS_tot.
    val xs = Seq(5.0, 5.0, 2.0)
    val mean = xs.sum / xs.size
    val naive = (xs.size.toDouble / 2.0) *
      (2.0 * (xs(0) - mean) * (xs(1) - mean)) /
      xs.map(x => (x - mean) * (x - mean)).sum
    assert(math.abs(num.toDouble / den - naive) < 1e-12)
    assert(num.toDouble / den == 0.5)
  }

  test("Horn slope/aspect: single-peak fixture — signed Sobel weights, " +
    "flat center, gradients point toward the mass on all 8 neighbors") {
    import spark.implicits._
    // one occupied res-7 pixel with cnt=3; replicate the q_slope_aspect
    // scatter kernel inline and check all 9 outputs by hand
    val g = Seq.fill(3)((0.1, 0.1)).toDF("lat", "lon")
      .withColumn("cell", G.cell_encode(col("lat"), col("lon"), 7))
      .groupBy("cell").agg(count(lit(1)).as("cnt"))
    val n = 128L
    def xOf(c: org.apache.spark.sql.Column) = c.bitwiseAND(lit(n - 1))
    def yOf(c: org.apache.spark.sql.Column) =
      shiftright(c, 7).bitwiseAND(lit(n - 1))
    val rawOx = xOf(col("src")) - xOf(col("cell"))
    val ox = when(rawOx > 64, rawOx - 128)
      .when(rawOx < -64, rawOx + 128).otherwise(rawOx)
    val oy = yOf(col("src")) - yOf(col("cell"))
    val out = g.select(col("cell").as("src"), col("cnt"),
        explode(G.cell_ring(col("cell"), lit(1))).as("cell"))
      .withColumn("ox", ox).withColumn("oy", oy)
      .withColumn("gxw", col("ox") * (lit(2L) - abs(col("oy"))))
      .withColumn("gyw", col("oy") * (lit(2L) - abs(col("ox"))))
      .groupBy("cell")
      .agg(sum(col("gxw") * col("cnt")).as("gx"),
        sum(col("gyw") * col("cnt")).as("gy"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val src = g.select("cell").collect().head.getLong(0)
    val (sx, sy) = (src & 127L, (src >> 7) & 127L)
    def cellAt(dx: Long, dy: Long): Long =
      (7L << 58) | ((sy + dy) << 7) | (((sx + dx) % 128 + 128) % 128)
    // expected (gx, gy) per output offset: ox = -dx, weight 2 cardinal /
    // 1 diagonal, times cnt = 3
    val want = Map(
      (0L, 0L) -> (0L, 0L),
      (1L, 0L) -> (-6L, 0L), (-1L, 0L) -> (6L, 0L),
      (0L, 1L) -> (0L, -6L), (0L, -1L) -> (0L, 6L),
      (1L, 1L) -> (-3L, -3L), (-1L, 1L) -> (3L, -3L),
      (1L, -1L) -> (-3L, 3L), (-1L, -1L) -> (3L, 3L))
    assert(out.size == 9)
    want.foreach { case ((dx, dy), exp) =>
      assert(out(cellAt(dx, dy)) == exp, s"offset ($dx,$dy)")
    }
    // aspect sectors via the full query on the same scale: flat center
    // (8), cardinal neighbors point back at the mass (E neighbor -> 4)
    def sector(gx: Long, gy: Long): Int =
      if (gx == 0 && gy == 0) 8
      else if (math.abs(gx) > math.abs(gy)) { if (gx > 0) 0 else 4 }
      else if (math.abs(gy) > math.abs(gx)) { if (gy > 0) 2 else 6 }
      else if (gx > 0 && gy > 0) 1
      else if (gx > 0) 7
      else if (gy > 0) 3
      else 5
    assert(sector(out(cellAt(0, 0))._1, out(cellAt(0, 0))._2) == 8)
    assert(sector(out(cellAt(1, 0))._1, out(cellAt(1, 0))._2) == 4)
    assert(sector(out(cellAt(-1, 0))._1, out(cellAt(-1, 0))._2) == 0)
    assert(sector(out(cellAt(1, 1))._1, out(cellAt(1, 1))._2) == 5)
  }

  test("LISA quadrants: all four classes on a hand fixture") {
    import spark.implicits._
    // Cells a(5), a+1(5), a+2(1) collinear, far(2) isolated; n=4, Σx=13,
    // mean=3.25. Hand calc: a -> HH (dev_i=7, nbr {a+1} dev_lag=7);
    // a+1 -> HL (dev_i=7, nbrs {a,a+2} dev_lag=4·6-2·13=-2);
    // a+2 -> LH (dev_i=-9, nbr {a+1} dev_lag=4·5-13=7);
    // far -> LL (dev_i=-5, no nbrs -> dev_lag=0 folds low).
    val pts = Seq.fill(5)((0.1, 0.1)) ++ Seq.fill(5)((0.1, 3.0)) ++
      Seq((0.1, 5.9)) ++ Seq.fill(2)((40.0, 100.0))
    val g = pts.toDF("lat", "lon")
      .withColumn("cell", G.cell_encode(col("lat"), col("lon"), 7))
      .groupBy("cell").agg(count(lit(1)).as("cnt"))
    val nbr = g.select(col("cell").as("src"),
        explode(G.cell_ring(col("cell"), lit(1))).as("cell"))
      .where(col("cell") =!= col("src"))
      .join(g, Seq("cell"))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_nbrs"), sum(col("cnt")).as("lag_sum"))
    val glob = g.agg(count(lit(1)).as("n"), sum(col("cnt")).as("sx"))
    val out = g.join(nbr, g("cell") === nbr("src"), "left_outer")
      .crossJoin(glob)
      .select(col("cell"),
        (col("n") * col("cnt") - col("sx")).as("dev_i"),
        (col("n") * coalesce(col("lag_sum"), lit(0L)) -
          coalesce(col("n_nbrs"), lit(0L)) * col("sx")).as("dev_lag"))
      .withColumn("quadrant",
        when(col("dev_i") > 0 && col("dev_lag") > 0, 1)
          .when(col("dev_i") <= 0 && col("dev_lag") <= 0, 2)
          .when(col("dev_i") > 0, 3).otherwise(4))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3)))
      .toMap
    val a = graft.geo.GridCell.encode(0.1, 0.1, 7)
    val far = graft.geo.GridCell.encode(40.0, 100.0, 7)
    assert(out(a) == ((7L, 7L, 1)))
    assert(out(a + 1) == ((7L, -2L, 3)))
    assert(out(a + 2) == ((-9L, 7L, 4)))
    assert(out(far) == ((-5L, 0L, 2)))
  }

  test("Getis-Ord star factors: ring includes self; hot/cold signs on the " +
      "Moran fixture") {
    import spark.implicits._
    // Same fixture as the Moran test: a(5), a+1(5), a+2(1), far(2);
    // n=4, sx=13. Hand Gi*: a {a,a+1} dev=4*10-2*13=14 hot;
    // a+1 {a,a+1,a+2} dev=4*11-3*13=5 hot; a+2 {a+1,a+2} dev=4*6-2*13=-2
    // cold; far {far} dev=4*2-1*13=-5 cold.
    val pts = Seq.fill(5)((0.1, 0.1)) ++ Seq.fill(5)((0.1, 3.0)) ++
      Seq((0.1, 5.9)) ++ Seq.fill(2)((40.0, 100.0))
    val g = pts.toDF("lat", "lon")
      .withColumn("cell", G.cell_encode(col("lat"), col("lon"), 7))
      .groupBy("cell").agg(count(lit(1)).as("cnt"))
    val star = g.select(col("cell").as("src"),
        explode(G.cell_ring(col("cell"), lit(1))).as("cell"))
      .join(g, Seq("cell"))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_star"), sum(col("cnt")).as("star_sum"))
    val glob = g.agg(count(lit(1)).as("n"), sum(col("cnt")).as("sx"))
    val out = g.join(star, g("cell") === star("src")).crossJoin(glob)
      .select(col("cell"),
        (col("n") * col("star_sum") - col("n_star") * col("sx"))
          .as("dev_star"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = graft.geo.GridCell.encode(0.1, 0.1, 7)
    val far = graft.geo.GridCell.encode(40.0, 100.0, 7)
    assert(out(a) == 14L && out(a + 1) == 5L)
    assert(out(a + 2) == -2L && out(far) == -5L)
  }

  test("isolation anti-join: singleton + empty ring only; lon wrap kills " +
      "false isolation across the antimeridian") {
    import spark.implicits._
    // a: singleton, empty ring -> isolated. b: singleton but c occupies the
    // adjacent x-cell -> not isolated. d,e: two points in one cell -> not
    // candidates (not singleton), and their presence doesn't matter to a.
    // w1/w2: singletons on OPPOSITE sides of the antimeridian in the same
    // row -> the wrapped ring sees the other -> neither is isolated.
    val pts = Seq(
      ("a", 40.0, 100.0), ("b", 0.1, 0.1), ("c", 0.1, 0.8),
      ("d", 10.0, 10.0), ("e", 10.0, 10.0),
      ("w1", 20.0, -179.9), ("w2", 20.0, 179.9))
    val img = pts.toDF("image_id", "lat", "lon")
      .withColumn("cell", G.cell_encode(col("lat"), col("lon"), 9))
    // sanity: w1/w2 really straddle the seam (x = 0 and 511, same y)
    val w = img.where(col("image_id").isin("w1", "w2"))
      .select(col("cell")).collect().map(_.getLong(0))
    assert((w(0) & 511L) != (w(1) & 511L))
    assert(Set(0L, 511L) == w.map(_ & 511L).toSet)
    val g = img.groupBy("cell").agg(count(lit(1)).as("cnt"))
    val cand = g.where(col("cnt") === 1).select("cell")
    val hits = cand.select(col("cell").as("src"),
        explode(G.cell_ring(col("cell"), lit(1))).as("cell"))
      .where(col("cell") =!= col("src"))
      .join(g, Seq("cell"))
      .select(col("src").as("cell")).distinct()
    val iso = cand.join(hits, Seq("cell"), "left_anti")
    val out = img.select("image_id", "cell").join(iso, Seq("cell"))
      .select("image_id").as[String].collect().toSet
    assert(out == Set("a"))
  }

  test("cell morphology: dilating an interior rectangle cover adds " +
      "exactly the perimeter ring") {
    import spark.implicits._
    val core = graft.geo.GridCell.cover(10.0, 12.0, 10.0, 14.0, 7)
    val coreDf = core.toSeq.toDF("cell")
    val dil = coreDf.select(explode(G.cell_ring(col("cell"), lit(1))).as("cell"))
      .distinct()
    val band = dil.join(coreDf, Seq("cell"), "left_anti")
      .as[Long].collect().toSet
    // interior box (no pole / antimeridian contact): dilation == cover of
    // the +1-cell bbox, so the band is the rectangle's perimeter ring
    val xs = core.map(graft.geo.GridCell.xOf); val ys = core.map(graft.geo.GridCell.yOf)
    val w = xs.max - xs.min + 1; val h = ys.max - ys.min + 1
    assert(band.size == 2 * (w + h) + 4)
    assert(band.intersect(core.toSet).isEmpty)
  }

  test("hotspot regions: threshold, diagonal adjacency, min label, " +
      "conservation") {
    import spark.implicits._
    val a = graft.geo.GridCell.encode(0.1, 0.1, 7)
    // A(a, 6 pts) - B(a+1, 7 pts) adjacent; C(a+2+row, 6 pts) is DIAGONAL
    // to B (dx=1, dy=1) -> one region {A,B,C}. F(a+2, 5 pts) touches B but
    // is sub-threshold -> excluded (and must NOT bridge anything).
    // E(far, 8 pts) is an isolated dense singleton region.
    assert(graft.geo.GridCell.encode(1.6, 5.9, 7) == a + 2 + 128)
    val pts = Seq.fill(6)((0.1, 0.1)) ++ Seq.fill(7)((0.1, 3.0)) ++
      Seq.fill(6)((1.6, 5.9)) ++ Seq.fill(5)((0.1, 5.9)) ++
      Seq.fill(8)((40.0, 100.0))
    val out = Queries.hotspotRegions(pts.toDF("lat", "lon"), minPts = 6)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val e = graft.geo.GridCell.encode(40.0, 100.0, 7)
    assert(out == Map(a -> ((3L, 19L)), e -> ((1L, 8L))))
  }

  test("poly metrics: exact rect area, orientation sign, centroid identity") {
    val r = Queries.queryMap("q_poly_metrics")(spark, SparkSpec.Sf)
      .filter(col("poly_id") === "rect_eq").collect().head
    // rect_eq: lat in [-1.5, 6.5], lon in [8, 20] -> 12000 x 8000 milli,
    // CCW in (x=lon, y=lat) -> a2_q = +2*area
    assert(r.getInt(1) == 4)
    val a2 = r.getLong(2)
    assert(a2 == 2L * 12000L * 8000L)
    // centroid = num / (3*a2) must be the exact center (14.0, 2.5) deg
    assert(r.getLong(3) == 3L * a2 * 14000L)
    assert(r.getLong(4) == 3L * a2 * 2500L)
  }

  test("variogram: d2 bins, ordered-pair counts, exact squared diffs") {
    import spark.implicits._
    // Three collinear occupied pixels x, x+1, x+2 (5, 3, 2 pts) plus an
    // isolated one: lags d2=1 (two adjacent pairs) and d2=4 (the ends).
    val pts = Seq.fill(5)((0.1, 0.1)) ++ Seq.fill(3)((0.1, 3.0)) ++
      Seq.fill(2)((0.1, 5.9)) ++ Seq((40.0, 100.0))
    val g = pts.toDF("lat", "lon")
      .withColumn("cell", G.cell_encode(col("lat"), col("lon"), 7))
      .groupBy("cell").agg(count(lit(1)).as("cnt"))
    val n = 128L
    def xOf(c: org.apache.spark.sql.Column) = c.bitwiseAND(lit(n - 1))
    def yOf(c: org.apache.spark.sql.Column) =
      shiftright(c, 7).bitwiseAND(lit(n - 1))
    val rawDx = abs(xOf(col("src")) - xOf(col("cell")))
    val dx = least(rawDx, lit(n) - rawDx)
    val dy = abs(yOf(col("src")) - yOf(col("cell")))
    val a = graft.geo.GridCell.encode(0.1, 0.1, 7)
    assert(graft.geo.GridCell.encode(0.1, 3.0, 7) == a + 1)
    assert(graft.geo.GridCell.encode(0.1, 5.9, 7) == a + 2)
    val out = g.select(col("cell").as("src"), col("cnt").as("xi"),
        explode(G.cell_ring(col("cell"), lit(2))).as("cell"))
      .withColumn("d2", dx * dx + dy * dy)
      .where(col("d2") > 0)
      .join(g, Seq("cell"))
      .groupBy("d2")
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("xi") - col("cnt")) * (col("xi") - col("cnt")))
          .as("sq_sum"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // d2=1: (5,3)x2 + (3,2)x2 -> sq 4+4+1+1; d2=4: (5,2)x2 -> 9+9.
    assert(out == Map(1L -> ((4L, 10L)), 4L -> ((2L, 18L))))
    // gamma(1) = 10/(2*4); gamma(2) = 18/(2*2) — consumer's division.
    assert(out(1L)._2.toDouble / (2 * out(1L)._1) == 1.25)
    assert(out(4L)._2.toDouble / (2 * out(4L)._1) == 4.5)
  }

  test("morphological opening matches a driver replay and is " +
    "anti-extensive (q_morph_open)") {
    val res = 7; val dim = 1L << res
    val got = SparkEntry.queries("q_morph_open")(spark, SparkSpec.Sf)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2)))).toMap

    // driver truth: textbook erosion (full 3x3 disk in mask; outside the
    // lat range = unoccupied; lon wraps) then dilation of the eroded set
    val cnt = graft.sources.Images.images(spark, SparkSpec.Sf)
      .withColumn("cell", G.cell_encode(col("lat"), col("lon"), res))
      .groupBy("cell").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def disk(c: Long): Seq[Long] = {
      val x = c & (dim - 1); val y = (c >> res) & (dim - 1)
      for (dy <- -1 to 1; dx <- -1 to 1; ny = y + dy
           if ny >= 0 && ny < dim)
        yield (res.toLong << 58) | (ny << res) | (((x + dx) % dim + dim) % dim)
    }
    val eroded = cnt.keySet.filter(c =>
      disk(c).size == 9 && disk(c).forall(cnt.contains))
    val opened = eroded.flatMap(disk)

    assert(opened.subsetOf(cnt.keySet)) // anti-extensive
    assert(got.keySet === cnt.keySet)
    for ((c, n) <- cnt)
      assert(got(c) === ((n, if (opened(c)) 1 else 0)), s"cell=$c")
    // (sf0.001 is too sparse for any 3x3 block to survive erosion — the
    // non-trivial split is proven at the sf0.01 driver gate: 9978 opened
    // / 411 speckle. Here assert the replay agreed on the whole mask.)
    assert(got.nonEmpty)
  }

  test("marching squares: case rollup matches a driver replay " +
    "(corner bits, lon wrap, top-row clamp, saddle = 2 segments)") {
    val got = SparkEntry.queries("q_contour_cases")(spark, SparkSpec.Sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val hot = graft.sources.Images.images(spark, SparkSpec.Sf)
      .withColumn("cell", G.cell_encode(col("lat"), col("lon"), 6))
      .groupBy("cell").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 3)
      .collect().map { r =>
        val c = r.getLong(0); ((c & 63L).toInt, ((c >> 6) & 63L).toInt)
      }.toSet
    val masks = (for {
      bx <- 0 to 63; by <- 0 to 62
      bits = Seq((0, 0, 1), (1, 0, 2), (0, 1, 4), (1, 1, 8)).collect {
        case (dx, dy, b) if hot(((bx + dx) % 64, by + dy)) => b
      }
      m = bits.sum if m >= 1 && m <= 14
    } yield (bx, by, m))
    val truth = masks.groupBy(_._3).map { case (m, bs) =>
      m.toLong -> ((bs.length.toLong,
        bs.length.toLong * (if (m == 5 || m == 10) 2 else 1),
        bs.map(b => b._2.toLong * 64 + b._1).sum))
    }
    assert(got === truth)
  }

  test("Ripley's K: ring-prefiltered band counts match brute all-pairs " +
    "(q_ripley_k — also proves the res-7 prefilter is complete)") {
    val got = SparkEntry.queries("q_ripley_k")(spark, SparkSpec.Sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val pts = graft.sources.Images.images(spark, SparkSpec.Sf)
      .select(col("k"), col("lat"), col("lon")).collect()
      .map(r => (r.getLong(0),
        math.floor(r.getDouble(1) * 1000000.0).toLong,
        math.floor(r.getDouble(2) * 1000000.0).toLong))
    val focals = pts.filter(_._1 % 293 == 0)
    val truth = Seq(250000L, 500000L, 1000000L).flatMap { r =>
      val nbs = focals.map { case (fk, fla, flo) =>
        pts.count { case (k, la, lo) =>
          k != fk &&
            (la - fla) * (la - fla) + (lo - flo) * (lo - flo) < r * r
        }
      }.filter(_ > 0)
      if (nbs.isEmpty) None
      else Some(r -> ((nbs.map(_.toLong).sum, nbs.length.toLong,
        nbs.max.toLong)))
    }.toMap
    assert(got === truth)
  }

  test("Harris corners: two scatter passes match a dense driver replay " +
    "(8-bit clip, Sobel, 3x3 second moments, R20 top-10)") {
    val res = 6; val n = 64
    val got = SparkEntry.queries("q_harris_corners")(spark, SparkSpec.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val z = Array.ofDim[Long](n, n)
    graft.sources.Images.images(spark, SparkSpec.Sf)
      .withColumn("cell", G.cell_encode(col("lat"), col("lon"), res))
      .groupBy("cell").agg(count(lit(1)).as("cnt"))
      .collect().foreach { r =>
        val c = r.getLong(0)
        z(((c >> res) & 63L).toInt)((c & 63L).toInt) =
          math.min(r.getLong(1), 255L)
      }
    // dense-VALUE replay over the engine's sparse scatter DOMAIN: values
    // at a target equal the dense formula (absent cells contribute zero
    // products), but only targets that actually received a contribution
    // exist in the engine frames — T1 = disks of occupied cells, T2 =
    // disks of T1 — and the zero/negative-R20 tail of the ranking is
    // domain-sensitive, so the replay must use the same domain.
    def disk(y: Int, x: Int): Seq[(Int, Int)] =
      for (dy <- -1 to 1; dx <- -1 to 1; ny = y + dy if ny >= 0 && ny < n)
        yield (ny, ((x + dx) % n + n) % n)
    val occ = (for (y <- 0 until n; x <- 0 until n if z(y)(x) > 0)
      yield (y, x)).toSet
    val t1 = occ.flatMap((disk _).tupled)
    val t2 = t1.flatMap((disk _).tupled)
    val gx = Array.ofDim[Long](n, n); val gy = Array.ofDim[Long](n, n)
    for ((y, x) <- t1; dy <- -1 to 1; dx <- -1 to 1) {
      val sy = y + dy
      if (sy >= 0 && sy < n) {
        val sx = ((x + dx) % n + n) % n
        gx(y)(x) += dx.toLong * (2 - math.abs(dy)) * z(sy)(sx)
        gy(y)(x) += dy.toLong * (2 - math.abs(dx)) * z(sy)(sx)
      }
    }
    val resp = t2.toSeq.map { case (y, x) =>
      var sxx = 0L; var syy = 0L; var sxy = 0L
      for (dy <- -1 to 1; dx <- -1 to 1) {
        val sy = y + dy
        if (sy >= 0 && sy < n) {
          val sx = ((x + dx) % n + n) % n
          if (t1((sy, sx))) {
            sxx += gx(sy)(sx) * gx(sy)(sx); syy += gy(sy)(sx) * gy(sy)(sx)
            sxy += gx(sy)(sx) * gy(sy)(sx)
          }
        }
      }
      val cell = (res.toLong << 58) | (y.toLong << res) | x.toLong
      (cell, sxx, syy, sxy,
        20L * (sxx * syy - sxy * sxy) - (sxx + syy) * (sxx + syy))
    }
    val want = resp.sortBy(t => (-t._5, t._1)).take(10)
    assert(got === want)
  }

  test("join counts: hand fixture — mean-threshold marks, ordered queen " +
    "BB/BW/WW classification, and the pieces' internal identities") {
    import spark.implicits._
    // Same geometry as the Moran fixture: cells a (5 pts) and b (5 pts)
    // adjacent, far (2 pts) isolated. Mean 4 -> marks B, B, W. Ordered
    // queen pairs: (a,b) and (b,a), both BB; far has no occupied
    // neighbor. Expected: n=3, sx=12, n_black=2, s0=2, bb=2, bw=0, ww=0.
    val pts = Seq.fill(5)((0.1, 0.1)) ++ Seq.fill(5)((0.1, 3.0)) ++
      Seq.fill(2)((40.0, 100.0))
    val g = pts.toDF("lat", "lon")
      .withColumn("cell", G.cell_encode(col("lat"), col("lon"), 7))
      .groupBy("cell").agg(count(lit(1)).as("cnt"))
    val base = g.agg(count(lit(1)).as("n_cells"), sum("cnt").as("sx"))
    val marked = g.crossJoin(broadcast(base))
      .withColumn("b", (col("cnt") * col("n_cells")) > col("sx"))
      .select(col("cell"), col("b"))
    val r = marked
      .select(col("cell").as("src"), col("b").as("bi"),
        explode(G.cell_ring(col("cell"), lit(1))).as("cell"))
      .where(col("cell") =!= col("src"))
      .join(marked.select(col("cell"), col("b").as("bj")), Seq("cell"))
      .agg(count(lit(1)).as("s0"),
        sum(when(col("bi") && col("bj"), 1L).otherwise(0L)).as("bb"),
        sum(when(col("bi") =!= col("bj"), 1L).otherwise(0L)).as("bw"),
        sum(when(!col("bi") && !col("bj"), 1L).otherwise(0L)).as("ww"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 0L, 0L)))
    // Shipped query at the fixture SF: pieces obey the structural
    // identities (s0 partitions into the three classes; marks partition
    // the cells; every join-count is bounded by s0).
    val q = Queries.queryMap("q_join_counts")(spark, SparkSpec.Sf)
      .collect().head
    val (n, sx, nb) = (q.getLong(0), q.getLong(1), q.getLong(2))
    val (s0, bb, bw, ww) = (q.getLong(3), q.getLong(4), q.getLong(5),
      q.getLong(6))
    assert(s0 == bb + bw + ww && s0 > 0)
    assert(nb > 0 && nb < n && sx > n)
    // bw counts ordered mixed pairs, so it is even (each unordered pair
    // appears in both orders), as are bb and ww.
    assert(bb % 2 == 0 && bw % 2 == 0 && ww % 2 == 0)
  }

  test("line of sight: observer/wall/target hand fixture — the wall blocks " +
    "exactly the 2-step pair, adjacency is always visible") {
    import spark.implicits._
    def pack(x: Long, y: Long): Long = (7L << 58) | (y << 7) | x
    val obsC = pack(10, 10); val wallC = pack(11, 10); val tgtC = pack(12, 10)
    // Background cells keep the global mean low so obs (100) and wall
    // (200) clear the 2x-mean observer threshold and tgt (1) does not.
    val g = (Seq((obsC, 100L), (wallC, 200L), (tgtC, 1L)) ++
      (100L to 106L).map(x => (pack(x, 100L), 1L))).toDF("cell", "cnt")
    val got = Queries.lineOfSightFrom(spark, g)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    val bg = (100L to 106L).map(x => pack(x, 100L))
    val gotMain = got.filterNot(t => bg.contains(t._1))
    assert(gotMain == Set(
      (obsC, wallC, 1L, 100L, 200L, 0L, 1L),
      // the wall (e=200 > e_obs=100) rises above the sight line to the
      // low target: (200-100)*2 >= (1-100)*1 -> blocked
      (obsC, tgtC, 2L, 100L, 1L, 1L, 0L),
      (wallC, obsC, 1L, 200L, 100L, 0L, 1L),
      (wallC, tgtC, 1L, 200L, 1L, 0L, 1L)))
    // Shipped query at the fixture SF: vis <=> zero blockers; adjacency
    // (n=1) has no intermediate sample and is always visible.
    val q = Queries.queryMap("q_line_of_sight")(spark, SparkSpec.Sf).collect()
    assert(q.nonEmpty)
    assert(q.forall(r => (r.getLong(6) == 1L) == (r.getLong(5) == 0L)))
    assert(q.filter(_.getLong(2) == 1L).forall(_.getLong(6) == 1L))
  }

  test("trajectory Hausdorff: hand footprints — exact directed h within " +
    "the radius, -1 beyond it, antimeridian wrap, far pairs absent") {
    import spark.implicits._
    def pack(x: Long, y: Long): Long = (7L << 58) | (y << 7) | x
    val uc = Seq(
      (1L, pack(10, 10)), (1L, pack(11, 10)), // A: two cells
      (2L, pack(12, 10)),                     // B: one cell, 2 and 1 away
      (3L, pack(60, 60)),                     // isolated
      (4L, pack(127, 50)), (5L, pack(0, 50))  // wrap-adjacent across ±180
    ).toDF("user_id", "cell")
    val got = Queries.trajHausdorffFrom(uc)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))
      .toSet
    assert(got == Set(
      // h(A->B) = max(min-dists 2, 1) = 2; h(B->A) = 1; closest approach 1
      (1L, 2L, 2L, 1L, 2L, 1L, 2L, 1L, 1L),
      // x=127 and x=0 are wrapped Chebyshev distance 1
      (4L, 5L, 1L, 1L, 1L, 1L, 1L, 1L, 1L)))
    // Shipped query: coverage never exceeds the footprint; h >= 0 iff
    // coverage is total; mind <= h when h is defined.
    val q = Queries.queryMap("q_traj_hausdorff")(spark, SparkSpec.Sf).collect()
    assert(q.nonEmpty)
    assert(q.forall { r =>
      val (na, nb, covAb, covBa) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val (hAb, hBa, mind) = (r.getLong(6), r.getLong(7), r.getLong(8))
      covAb <= na && covBa <= nb &&
        ((hAb >= 0) == (covAb == na)) && ((hBa >= 0) == (covBa == nb)) &&
        (hAb < 0 || mind <= hAb) && mind >= 0 && mind <= 2
    })
  }
}
