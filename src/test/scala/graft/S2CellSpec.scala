package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.S2Cell

/** Structural properties of the S2-style index (seeded deterministic
  * sweeps, same style as GridCellSpec): hierarchical consistency is the
  * property the tile pyramid depends on. */
class S2CellSpec extends AnyFunSuite {

  private def sweep(n: Int)(f: scala.util.Random => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (0 until n).foreach(_ => f(rnd))
  }
  private def rndLat(r: scala.util.Random) = -89.9 + r.nextDouble() * 179.8
  private def rndLon(r: scala.util.Random) = -179.9 + r.nextDouble() * 359.8

  test("level and face extraction") {
    sweep(300) { r =>
      val lat = rndLat(r); val lon = rndLon(r)
      val lvl = r.nextInt(S2Cell.MaxLevel + 1)
      val id = S2Cell.fromLatLng(lat, lon, lvl)
      assert(S2Cell.level(id) == lvl)
      assert(S2Cell.face(id) >= 0 && S2Cell.face(id) <= 5)
    }
  }

  test("hierarchical consistency: encode at k == parentAt(leaf, k)") {
    sweep(500) { r =>
      val lat = rndLat(r); val lon = rndLon(r)
      val leaf = S2Cell.fromLatLng(lat, lon, S2Cell.MaxLevel)
      val k = r.nextInt(S2Cell.MaxLevel)
      assert(S2Cell.parentAt(leaf, k) == S2Cell.fromLatLng(lat, lon, k),
        s"($lat, $lon) level $k")
    }
  }

  test("children: 4 distinct, one level finer, parent round-trip, contained") {
    sweep(300) { r =>
      val id = S2Cell.fromLatLng(rndLat(r), rndLon(r), r.nextInt(S2Cell.MaxLevel))
      val cs = S2Cell.children(id)
      assert(cs.distinct.length == 4)
      val l = S2Cell.level(id)
      cs.foreach { c =>
        assert(S2Cell.level(c) == l + 1)
        assert(S2Cell.parentAt(c, l) == id)
        assert(S2Cell.contains(id, c))
      }
    }
  }

  test("containment ranges: a point's cells nest; unrelated cells don't contain") {
    sweep(300) { r =>
      val lat = rndLat(r); val lon = rndLon(r)
      val coarse = S2Cell.fromLatLng(lat, lon, 5)
      val fine = S2Cell.fromLatLng(lat, lon, 20)
      assert(S2Cell.contains(coarse, fine))
      // antipodal point is on another face -> never contained
      val far = S2Cell.fromLatLng(-lat, if (lon > 0) lon - 180 else lon + 180, 20)
      assert(!S2Cell.contains(coarse, far))
    }
  }

  test("faceIJ inverts the Hilbert encode") {
    sweep(400) { r =>
      val lvl = r.nextInt(S2Cell.MaxLevel + 1)
      val id = S2Cell.fromLatLng(rndLat(r), rndLon(r), lvl)
      val (f, i, j) = S2Cell.faceIJ(id)
      assert(f == S2Cell.face(id))
      assert(i >= 0 && i < (1 << lvl) && j >= 0 && j < (1 << lvl))
      // re-encode the cell center from its (face, i, j) -> same id:
      // ring(id, 0) samples the center square, so it must contain id
      assert(S2Cell.ring(id, 0).contains(id))
    }
  }

  test("ring contains the cell and all near neighbors (incl. across faces)") {
    sweep(300) { r =>
      val lat = rndLat(r); val lon = rndLon(r)
      val lvl = 2 + r.nextInt(10)
      val id = S2Cell.fromLatLng(lat, lon, lvl)
      val rg = S2Cell.ring(id, 2).toSet
      assert(rg.contains(id))
      // small angular perturbations stay inside a 2-ring
      val eps = 20.0 / (1 << lvl) // well under one cell width
      for (dla <- Seq(-eps, 0.0, eps); dlo <- Seq(-eps, 0.0, eps)) {
        val la = math.max(-89.99, math.min(89.99, lat + dla))
        val lo = ((lon + dlo + 540.0) % 360.0) - 180.0
        assert(rg.contains(S2Cell.fromLatLng(la, lo, lvl)),
          s"lvl=$lvl ($lat,$lon) + ($dla,$dlo) escaped the 2-ring")
      }
      rg.foreach(c => assert(S2Cell.level(c) == lvl))
    }
  }

  test("cover is a superset of the cells of points inside the box") {
    sweep(60) { r =>
      val laMin = rndLat(r); val laMax = math.min(89.9, laMin + r.nextDouble() * 20)
      val loMin = rndLon(r); val loMax = math.min(179.9, loMin + r.nextDouble() * 30)
      val lvl = 3 + r.nextInt(4)
      val cov = S2Cell.cover(laMin, laMax, loMin, loMax, lvl).toSet
      assert(cov.nonEmpty)
      (0 until 40).foreach { _ =>
        val la = laMin + r.nextDouble() * (laMax - laMin)
        val lo = loMin + r.nextDouble() * (loMax - loMin)
        assert(cov.contains(S2Cell.fromLatLng(la, lo, lvl)),
          s"point ($la,$lo) of box not covered at level $lvl")
      }
      cov.foreach(c => assert(S2Cell.level(c) == lvl))
    }
  }

  test("kNN settle-bound lemma: planar dist < k*minUnitDeg implies in-ring") {
    // the exactness of Knn.knnExact under S2Tiling rests on exactly this:
    // any point CLOSER (planar degrees) than k * minUnitDeg(level) to the
    // query must fall inside the query cell's k-ring — so once the k-th
    // candidate distance beats the bound, no unseen point can displace it
    val S2T = graft.geo.S2Tiling
    sweep(800) { r =>
      val lvl = 4 + r.nextInt(8)
      val k = 1 + r.nextInt(6)
      val qla = -85.0 + r.nextDouble() * 170.0
      val qlo = rndLon(r)
      val bound = k * S2T.minUnitDeg(lvl)
      val ang = r.nextDouble() * 2 * math.Pi
      val rad = r.nextDouble() * bound
      val pla = qla + rad * math.sin(ang)
      val plo = qlo + rad * math.cos(ang)
      if (math.abs(pla) <= 89.9 && math.abs(plo) <= 179.9) {
        val qc = S2Cell.fromLatLng(qla, qlo, lvl)
        val pc = S2Cell.fromLatLng(pla, plo, lvl)
        assert(S2Cell.ring(qc, k).contains(pc),
          s"lvl=$lvl k=$k q=($qla,$qlo) p=($pla,$plo) escaped the ring")
      }
    }
  }

  test("settle-bound lemma holds AT cube-face corners (directed, all 8)") {
    // ADVICE r2: the random sweep almost never lands near the 8 points
    // where 3 faces meet, exactly where the sampled cross-face ring
    // continuation is most warped. Directed version of the lemma: query
    // points within ~1 cell of every cube corner, dense angular probes at
    // radii up to the bound.
    val S2T = graft.geo.S2Tiling
    val cornerLat = math.toDegrees(math.atan2(1.0, math.sqrt(2.0))) // 35.264°
    val corners = for {
      sla <- Seq(-1, 1); lo <- Seq(45.0, 135.0, -45.0, -135.0)
    } yield (sla * cornerLat, lo)
    for {
      (cla, clo) <- corners
      lvl <- Seq(4, 6, 9)
      k <- Seq(1, 2, 4)
    } {
      val cellDeg = 90.0 / (1 << lvl) // rough face-cell angular size
      val bound = k * S2T.minUnitDeg(lvl)
      // query points: the corner itself + offsets within ~1 cell around it
      val qpts = for {
        dla <- Seq(0.0, -0.7 * cellDeg, 0.7 * cellDeg)
        dlo <- Seq(0.0, -0.7 * cellDeg, 0.7 * cellDeg)
      } yield (cla + dla, clo + dlo)
      qpts.foreach { case (qla, qlo) =>
        val qc = S2Cell.fromLatLng(qla, qlo, lvl)
        val ring = S2Cell.ring(qc, k).toSet
        for {
          frac <- Seq(0.35, 0.7, 0.95)
          a <- 0 until 32
        } {
          val ang = a * 2 * math.Pi / 32
          val pla = qla + frac * bound * math.sin(ang)
          val plo = qlo + frac * bound * math.cos(ang)
          val pc = S2Cell.fromLatLng(pla, plo, lvl)
          assert(ring.contains(pc),
            s"corner ($cla,$clo) lvl=$lvl k=$k q=($qla,$qlo) " +
              s"p=($pla,$plo) escaped the ring")
        }
      }
    }
  }

  test("cover handles antimeridian boxes") {
    val cov = S2Cell.cover(-10.0, 10.0, 170.0, -170.0, 4).toSet
    assert(cov.contains(S2Cell.fromLatLng(0.0, 179.5, 4)))
    assert(cov.contains(S2Cell.fromLatLng(0.0, -179.5, 4)))
    assert(cov.contains(S2Cell.fromLatLng(5.0, 175.0, 4)))
  }

  test("same-level cells of nearby points share parents (Hilbert locality)") {
    sweep(200) { r =>
      val lat = math.max(-89.0, math.min(89.0, rndLat(r)))
      val lon = math.max(-179.0, math.min(179.0, rndLon(r)))
      val a = S2Cell.fromLatLng(lat, lon, 10)
      val b = S2Cell.fromLatLng(lat + 1e-9, lon + 1e-9, 10)
      // an epsilon move stays in the same level-10 cell except exactly on
      // a boundary (measure zero for the seeded sweep)
      assert(a == b || S2Cell.parentAt(a, 8) == S2Cell.parentAt(b, 8) ||
        S2Cell.face(a) != S2Cell.face(b))
    }
  }
}
