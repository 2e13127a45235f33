package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.{HexCell, HexTiling}

/** Unit invariants of the hexagonal grid math ([[graft.geo.HexCell]]):
  * encode/center round-trips, disk cardinality, the kNN settle bound's
  * two geometric lemmas, parent determinism, and cover supersets. */
class HexCellSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(97)
  private def randPt(): (Double, Double) =
    (rnd.nextDouble() * 180.0 - 90.0, rnd.nextDouble() * 360.0 - 180.0)

  test("center of a cell encodes back to the same cell (all res 2..14)") {
    (2 to 14).foreach { res =>
      (0 until 200).foreach { _ =>
        val (la, lo) = randPt()
        val c = HexCell.encode(la, lo, res)
        assert(HexCell.encode(HexCell.centerLat(c), HexCell.centerLon(c), res) == c)
        assert(HexCell.resOf(c) == res)
      }
    }
  }

  test("a point lies within the circumradius of its cell's center") {
    (2 to 14).foreach { res =>
      val R = HexCell.circumDeg(res)
      (0 until 200).foreach { _ =>
        val (la, lo) = randPt()
        val c = HexCell.encode(la, lo, res)
        val d = math.hypot(la - HexCell.centerLat(c), lo - HexCell.centerLon(c))
        assert(d <= R + 1e-9, s"res=$res point ($la,$lo) is $d > R=$R from center")
      }
    }
  }

  test("ring(cell, k) is the hex-distance disk: 1+3k(k+1) cells, all <= k") {
    val c = HexCell.encode(12.34, 56.78, 8)
    (0 to 5).foreach { k =>
      val disk = HexCell.ring(c, k)
      assert(disk.length == 1 + 3 * k * (k + 1))
      assert(disk.distinct.length == disk.length)
      assert(disk.forall(x => HexCell.hexDist(c, x) <= k))
      // the shell at exactly k is fully present (6k cells for k >= 1)
      val shell = disk.count(x => HexCell.hexDist(c, x) == k)
      assert(shell == (if (k == 0) 1 else 6 * k))
    }
  }

  test("settle-bound lemma: centers at hex distance d are >= 1.5*d*R apart") {
    val res = 8
    val R = HexCell.circumDeg(res)
    val c0 = HexCell.encode(1.0, 2.0, res)
    // every cell within hex distance 6 of c0, exhaustively
    HexCell.ring(c0, 6).foreach { c =>
      val d = HexCell.hexDist(c0, c)
      val eu = math.hypot(HexCell.centerLat(c) - HexCell.centerLat(c0),
        HexCell.centerLon(c) - HexCell.centerLon(c0))
      assert(eu + 1e-9 >= 1.5 * d * R, s"hexdist $d centers only $eu apart")
    }
  }

  test("settle bound end-to-end: points outside disk k are >= k*minUnitDeg away") {
    // the exact property Knn.knnExact relies on, swept with random pairs
    val res = 7
    val min = HexTiling.minUnitDeg(res)
    (0 until 3000).foreach { _ =>
      val (la1, lo1) = randPt()
      val (la2, lo2) = randPt()
      val c1 = HexCell.encode(la1, lo1, res)
      val c2 = HexCell.encode(la2, lo2, res)
      val hd = HexCell.hexDist(c1, c2)
      val eu = math.hypot(la1 - la2, lo1 - lo2)
      (1 to 4).foreach { k =>
        if (hd > k)
          assert(eu + 1e-9 >= k * min,
            s"hexdist $hd > $k but planar dist $eu < ${k * min}")
      }
    }
  }

  test("parent is a total deterministic partition one res coarser") {
    (0 until 500).foreach { _ =>
      val (la, lo) = randPt()
      val c = HexCell.encode(la, lo, 9)
      val p = HexCell.parentOnce(c)
      assert(HexCell.resOf(p) == 8)
      assert(HexCell.parentOnce(c) == p) // deterministic
      assert(HexCell.parentAt(c, 6) ==
        HexCell.parentOnce(HexCell.parentOnce(p)))
      // H3-style approximation bound: the parent's center is within one
      // coarse circumradius of the child's center
      val d = math.hypot(HexCell.centerLat(c) - HexCell.centerLat(p),
        HexCell.centerLon(c) - HexCell.centerLon(p))
      assert(d <= HexCell.circumDeg(8) + 1e-9)
    }
  }

  test("cover(bbox) contains the cell of every point in the bbox") {
    (0 until 100).foreach { _ =>
      val (la, lo) = randPt()
      val (laMin, laMax) = (la, math.min(90.0, la + rnd.nextDouble() * 8))
      val (loMin, loMax) = (lo, math.min(180.0, lo + rnd.nextDouble() * 8))
      val cov = HexCell.cover(laMin, laMax, loMin, loMax, 6).toSet
      (0 until 50).foreach { _ =>
        val pla = laMin + rnd.nextDouble() * (laMax - laMin)
        val plo = loMin + rnd.nextDouble() * (loMax - loMin)
        assert(cov.contains(HexCell.encode(pla, plo, 6)))
      }
    }
  }
}
