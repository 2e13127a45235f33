package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.GridCell

/** Property-style checks use a seeded deterministic sweep (no scalatestplus
  * bridge in the offline cache). */
class GridCellSpec extends AnyFunSuite {
  private def sweep(n: Int)(f: scala.util.Random => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (0 until n).foreach(_ => f(rnd))
  }
  private def rndLat(r: scala.util.Random) = -89.999 + r.nextDouble() * 179.998
  private def rndLon(r: scala.util.Random) = -179.999 + r.nextDouble() * 359.998

  test("encode known vectors") {
    // (0,0) res 4: x = floor(180/360*16) = 8, y = floor(90/180*16) = 8
    assert(GridCell.encode(0.0, 0.0, 4) == ((4L << 58) | (8L << 4) | 8L))
    // southwest corner cell
    assert(GridCell.encode(-90.0, -180.0, 4) == (4L << 58))
    // clamping at the far edge
    assert(GridCell.encode(90.0, 180.0, 4) == ((4L << 58) | (15L << 4) | 15L))
  }

  test("res/x/y extraction roundtrip") {
    val c = GridCell.encode(37.0, -122.0, 12)
    assert(GridCell.resOf(c) == 12)
    assert(GridCell.pack(12, GridCell.xOf(c), GridCell.yOf(c)) == c)
  }

  test("parentAt(encode(res12), k) == encode(res k) — nested floor property") {
    sweep(500) { r =>
      val lat = rndLat(r); val lon = rndLon(r); val k = r.nextInt(13)
      val fine = GridCell.encode(lat, lon, 12)
      assert(GridCell.parentAt(fine, k) == GridCell.encode(lat, lon, k))
    }
  }

  test("encodeMulti == per-res encode at every res (batched projection)") {
    sweep(300) { r =>
      val lat = rndLat(r); val lon = rndLon(r)
      val lo = r.nextInt(8); val hi = lo + 1 + r.nextInt(16 - lo - 1)
      val multi = GridCell.encodeMulti(lat, lon, lo, hi)
      assert(multi.length == hi - lo + 1)
      (lo to hi).foreach { res =>
        assert(multi(res - lo) == GridCell.encode(lat, lon, res),
          s"($lat, $lon) res $res")
      }
    }
  }

  test("children inverse of parent") {
    sweep(200) { r =>
      val c = GridCell.encode(rndLat(r), rndLon(r), 8)
      GridCell.children(c).foreach(ch => assert(GridCell.parent(ch) == c))
    }
  }

  test("ring contains center, same res, wraps longitude") {
    val c = GridCell.encode(10.0, -179.9, 8) // x == 0 at res 8
    val r = GridCell.ring(c, 1)
    assert(r.contains(c))
    assert(r.length == 9)
    assert(r.forall(GridCell.resOf(_) == 8))
    // wrap: must contain a cell with x == 2^8 - 1
    assert(r.exists(GridCell.xOf(_) == 255L))
  }

  test("ring clamps at poles") {
    val c = GridCell.encode(89.9, 0.0, 8) // y == 255
    val r = GridCell.ring(c, 1)
    assert(r.length == 6) // top row dropped
  }

  test("kNN settle-bound lemma: planar dist < k*minUnitDeg implies in-ring") {
    val QT = graft.geo.QuadkeyTiling
    sweep(800) { r =>
      val res = 4 + r.nextInt(9)
      val k = 1 + r.nextInt(6)
      val qla = rndLat(r); val qlo = rndLon(r)
      val bound = k * QT.minUnitDeg(res)
      val ang = r.nextDouble() * 2 * math.Pi
      val rad = r.nextDouble() * bound
      val pla = qla + rad * math.sin(ang)
      val plo = qlo + rad * math.cos(ang)
      if (math.abs(pla) <= 89.9 && math.abs(plo) <= 179.9) {
        val qc = GridCell.encode(qla, qlo, res)
        val pc = GridCell.encode(pla, plo, res)
        assert(GridCell.ring(qc, k).contains(pc),
          s"res=$res k=$k q=($qla,$qlo) p=($pla,$plo) escaped the ring")
      }
    }
  }

  test("cover contains the cell of any point inside the box") {
    sweep(200) { r =>
      val lat = rndLat(r); val lon = rndLon(r)
      val cells = GridCell.cover(lat - 1.0, lat + 1.0, lon - 1.0, lon + 1.0, 7)
      assert(cells.contains(GridCell.encode(lat, lon, 7)))
    }
  }

  test("cover splits across the antimeridian") {
    val cells = GridCell.cover(0.0, 1.0, 178.0, -178.0, 6)
    assert(cells.contains(GridCell.encode(0.5, 179.5, 6)))
    assert(cells.contains(GridCell.encode(0.5, -179.5, 6)))
  }

  test("pointInPolygon unit square + concave L") {
    val sqLats = Array(0.0, 0.0, 1.0, 1.0)
    val sqLons = Array(0.0, 1.0, 1.0, 0.0)
    assert(GridCell.pointInPolygon(0.5, 0.5, sqLats, sqLons))
    assert(!GridCell.pointInPolygon(0.5, 1.5, sqLats, sqLons))
    assert(!GridCell.pointInPolygon(-0.5, 0.5, sqLats, sqLons))
    // L-shape: [0,1]x[0,2] U [1,2]x[0,1]
    val lLats = Array(0.0, 0.0, 1.0, 1.0, 2.0, 2.0)
    val lLons = Array(0.0, 2.0, 2.0, 1.0, 1.0, 0.0)
    assert(GridCell.pointInPolygon(0.5, 1.5, lLats, lLons))
    assert(GridCell.pointInPolygon(1.5, 0.5, lLats, lLons))
    assert(!GridCell.pointInPolygon(1.5, 1.5, lLats, lLons)) // notch
  }

  test("pointInPolygon invariant under vertex rotation") {
    val lats = Array(0.0, 0.0, 1.0, 1.0, 2.0, 2.0)
    val lons = Array(0.0, 2.0, 2.0, 1.0, 1.0, 0.0)
    sweep(500) { r =>
      val lat = -0.5 + r.nextDouble() * 3.0
      val lon = -0.5 + r.nextDouble() * 3.0
      val rot = r.nextInt(6)
      val rl = lats.drop(rot) ++ lats.take(rot)
      val ro = lons.drop(rot) ++ lons.take(rot)
      assert(GridCell.pointInPolygon(lat, lon, rl, ro) ==
        GridCell.pointInPolygon(lat, lon, lats, lons))
    }
  }

  test("haversine sanity: 1 deg lon at equator ~ 111.19 km") {
    val d = GridCell.haversineM(0.0, 0.0, 0.0, 1.0)
    assert(math.abs(d - 111195.0) < 200.0)
  }

  test("lineCells hand cases: point, horizontal, vertical, pure diagonal") {
    def p(x: Long, y: Long) = GridCell.pack(7, x, y)
    assert(GridCell.lineCells(p(5, 5), p(5, 5)).toSeq == Seq(p(5, 5)))
    assert(GridCell.lineCells(p(2, 9), p(6, 9)).toSeq ==
      (2L to 6L).map(p(_, 9)))
    assert(GridCell.lineCells(p(3, 8), p(3, 4)).toSeq ==
      (8L to 4L by -1).map(p(3, _)))
    // 45 deg: diagonal steps only, length max+1 = 4
    assert(GridCell.lineCells(p(0, 0), p(3, 3)).toSeq ==
      (0L to 3L).map(i => p(i, i)))
  }

  test("lineCells properties: endpoints, 8-connected steps, distinct, " +
      "dominant-axis length") {
    sweep(500) { r =>
      val res = 5 + r.nextInt(5)
      val n = GridCell.dim(res)
      def rc() = GridCell.pack(res, r.nextLong(n), r.nextLong(n))
      val a = rc(); val b = rc()
      val cells = GridCell.lineCells(a, b)
      assert(cells.head == a && cells.last == b)
      assert(cells.distinct.length == cells.length)
      // every consecutive pair is a single 8-connected step
      cells.sliding(2).foreach {
        case Array(u, v) =>
          assert(math.abs(GridCell.xOf(u) - GridCell.xOf(v)) <= 1)
          assert(math.abs(GridCell.yOf(u) - GridCell.yOf(v)) <= 1)
        case _ =>
      }
      // Bresenham plots one cell per dominant-axis column
      val dx = math.abs(GridCell.xOf(a) - GridCell.xOf(b))
      val dy = math.abs(GridCell.yOf(a) - GridCell.yOf(b))
      assert(cells.length == math.max(dx, dy) + 1)
    }
  }
}
