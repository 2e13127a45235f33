package graft

import org.apache.spark.sql.functions._

/** Semantics pins for the temporal-trend family (q_mann_kendall,
  * q_anomaly_cells) and the per-tile integral image (q_integral_image). */
class TemporalStatsSpec extends SparkFunSuite {

  private val Sf01 = "/root/testdata/sf0.01"

  test("integer MK significance test matches the double z-test exactly") {
    // The query encodes `z > 1.96` as 180000·(|S|−1)² > 38416·T(T−1)(2T+5)
    // (both BIGINT). Sweep the whole small-(S,T) lattice and check the
    // integer form agrees with the floating-point z-test it replaces.
    for (t <- 2 to 60; s <- -(t * (t - 1) / 2) to (t * (t - 1) / 2)) {
      val varS = t.toDouble * (t - 1) * (2 * t + 5) / 18.0
      val zOk = math.abs(s) >= 1 &&
        (math.abs(s) - 1) / math.sqrt(varS) > 1.96
      val intOk = math.abs(s) > 0 &&
        180000L * (math.abs(s) - 1L) * (math.abs(s) - 1L) >
          38416L * t * (t - 1L) * (2L * t + 5)
      assert(zOk == intOk, s"S=$s T=$t z=$zOk int=$intOk")
    }
  }

  test("q_mann_kendall: S bounds, t_days, and label consistency") {
    val df = Queries.queryMap("q_mann_kendall")(spark, SparkSpec.Sf)
      .collect()
    assert(df.nonEmpty)
    val t = df.head.getAs[Long]("t_days")
    // t_days is the true distinct-day count of the raw stream
    val rawDays = spark.read.parquet(s"${SparkSpec.Sf}/events.parquet")
      .select(floor(unix_micros(col("ts").cast("timestamp")) /
        lit(86400000000L)).as("d")).distinct().count()
    assert(t == rawDays)
    val maxS = t * (t - 1) / 2
    df.foreach { r =>
      val s = r.getAs[Long]("s_stat")
      assert(math.abs(s) <= maxS)
      val sig = math.abs(s) > 0 &&
        180000L * (math.abs(s) - 1) * (math.abs(s) - 1) >
          38416L * t * (t - 1) * (2 * t + 5)
      val expected =
        if (sig && s > 0) "emerging" else if (sig && s < 0) "waning"
        else "stable"
      assert(r.getAs[String]("trend") == expected)
    }
  }

  test("q_anomaly_cells: every spike re-verifies against a raw recount") {
    val spikes = Queries.queryMap("q_anomaly_cells")(spark, Sf01).collect()
    assert(spikes.nonEmpty) // threshold chosen to fire at sf0.01
    // independent recount of (cell, day) from the raw stream
    import graft.geo.{functions => G}
    val recount = graft.sources.Events
      .withPosition(spark.read.parquet(s"$Sf01/events.parquet"))
      .select(G.cell_encode(col("lat"), col("lon"), 3).as("cell"),
        floor(unix_micros(col("ts").cast("timestamp")) /
          lit(86400000000L)).cast("long").as("day"))
      .groupBy("cell", "day").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    spikes.foreach { r =>
      val key = (r.getAs[Long]("cell"), r.getAs[Long]("day"))
      assert(recount(key) == r.getAs[Long]("cnt"))
      assert(r.getAs[Long]("cnt") >= 8)
      assert(r.getAs[Long]("dev") > 0)
    }
  }

  test("q_emerging_hot: dense Gi*-per-day + MK-over-dev driver replay") {
    import graft.geo.{functions => G}
    val got = Queries.queryMap("q_emerging_hot")(spark, SparkSpec.Sf)
      .collect()
      .map(r => r.getAs[Long]("cell") ->
        (r.getAs[Long]("t_days"), r.getAs[Long]("hot_days"),
          r.getAs[Long]("last_hot"), r.getAs[Long]("s_dev"),
          r.getAs[String]("cat")))
      .toMap
    assert(got.nonEmpty)
    val daily = graft.sources.Events
      .withPosition(spark.read.parquet(s"${SparkSpec.Sf}/events.parquet"))
      .select(G.cell_encode(col("lat"), col("lon"), 5).as("cell"),
        floor(unix_micros(col("ts").cast("timestamp")) /
          lit(86400000000L)).cast("long").as("day"))
      .groupBy("cell", "day").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val cells = daily.keys.map(_._1).toSet
    val days = daily.keys.map(_._2).toSeq.distinct.sorted
    val n = cells.size.toLong
    val t = days.size.toLong
    val maxDay = days.max
    val sxPerDay = days.map(d =>
      d -> cells.toSeq.map(c => daily.getOrElse((c, d), 0L)).sum).toMap
    def ring(c: Long): Seq[Long] = {
      val x = (c & 31).toInt; val y = ((c >> 5) & 31).toInt
      for {
        dy <- -1 to 1; dx <- -1 to 1
        ny = y + dy if ny >= 0 && ny <= 31
      } yield (5L << 58) | (ny.toLong << 5) | (((x + dx) % 32 + 32) % 32).toLong
    }
    val truth = cells.map { c =>
      val members = ring(c).filter(cells.contains).distinct
      val nStar = members.size.toLong
      val devSeries = days.map { d =>
        val starSum = members.map(m => daily.getOrElse((m, d), 0L)).sum
        d -> (n * starSum - nStar * sxPerDay(d))
      }
      val hotDays = devSeries.count(_._2 > 0).toLong
      val lastHot = if (devSeries.find(_._1 == maxDay).get._2 > 0) 1L else 0L
      val sDev = (for {
        i <- devSeries.indices; j <- (i + 1) until devSeries.size
      } yield java.lang.Long.signum(
        devSeries(j)._2 - devSeries(i)._2).toLong).sum
      val sig = math.abs(sDev) > 0 &&
        180000L * (math.abs(sDev) - 1) * (math.abs(sDev) - 1) >
          38416L * t * (t - 1) * (2 * t + 5)
      val cat =
        if (hotDays == 0) "none"
        else if (lastHot == 1 && 10 * hotDays <= t) "new"
        else if (sig && sDev > 0) "intensifying"
        else if (sig && sDev < 0) "diminishing"
        else if (10 * hotDays >= 9 * t) "persistent"
        else "sporadic"
      c -> (t, hotDays, lastHot, sDev, cat)
    }.toMap
    assert(got === truth)
    // the classifier actually discriminates on this data
    assert(got.values.map(_._5).toSet.size >= 2,
      s"degenerate categories: ${got.values.map(_._5).toSet}")
  }

  test("q_integral_image: SAT corner, box-sum identity, monotonicity") {
    val rows = Queries.queryMap("q_integral_image")(spark, SparkSpec.Sf)
      .collect()
      .map(r => (r.getAs[Long]("tile"), r.getAs[Long]("py"),
        r.getAs[Long]("px")) -> (r.getAs[Long]("cnt"), r.getAs[Long]("sat")))
      .toMap
    val tiles = rows.keys.map(_._1).toSeq.distinct
    assert(tiles.nonEmpty)
    tiles.foreach { t =>
      val total = (for (y <- 0 to 7; x <- 0 to 7)
        yield rows((t, y, x))._1).sum
      assert(rows((t, 7L, 7L))._2 == total, s"corner of tile $t")
      // box [2..5]x[2..5] via the 4-lookup identity
      val boxDirect = (for (y <- 2 to 5; x <- 2 to 5)
        yield rows((t, y, x))._1).sum
      def sat(y: Int, x: Int) = rows((t, y.toLong, x.toLong))._2
      assert(boxDirect == sat(5, 5) - sat(1, 5) - sat(5, 1) + sat(1, 1))
      // SAT is monotone along both axes
      for (y <- 0 to 7; x <- 1 to 7)
        assert(sat(y, x) >= sat(y, x - 1))
      for (y <- 1 to 7; x <- 0 to 7)
        assert(sat(y, x) >= sat(y - 1, x))
    }
  }
}
