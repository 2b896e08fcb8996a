package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.Geo
import graft.geo.Geo._

/** Pure-geometry unit tests — no SparkSession needed. Anchor values
  * computed independently (meridian arc by numerical integration of the
  * GRS80 curvature; distances cross-checked against the published
  * Madrid–Barcelona geodesic).
  */
class GeoSpec extends AnyFunSuite {

  test("geohash quantize-interleave equals the textbook bisection encoding") {
    // the textbook successive-bisection construction — independent of
    // the integer quantize+interleave arithmetic the SQL renders
    def refGeohash(lon: Double, lat: Double, chars: Int): String = {
      var (lonL, lonH, latL, latH) = (-180.0, 180.0, -90.0, 90.0)
      val sb = new StringBuilder
      var isLon = true; var bit = 0; var ch = 0
      while (sb.length < chars) {
        if (isLon) {
          val m = (lonL + lonH) / 2
          if (lon >= m) { ch = ch * 2 + 1; lonL = m }
          else { ch = ch * 2; lonH = m }
        } else {
          val m = (latL + latH) / 2
          if (lat >= m) { ch = ch * 2 + 1; latL = m }
          else { ch = ch * 2; latH = m }
        }
        isLon = !isLon; bit += 1
        if (bit == 5) {
          sb.append(graft.ops.GravityOps.GhAlphabet.charAt(ch))
          bit = 0; ch = 0
        }
      }
      sb.toString
    }
    // plain-Scala mirror of the SQL arithmetic (same quantize, same
    // interleave weights) — positive operands, so / == floor == DIV == //
    def sqlGeohash(lonE6: Long, latE6: Long): String = {
      val lonQ = (lonE6 + 180000000L) * 32768 / 360000000L
      val latQ = (latE6 + 90000000L) * 32768 / 180000000L
      var g = 0L
      for (i <- 0 until 15) {
        g += ((lonQ >> (14 - i)) & 1) << (29 - 2 * i)
        g += ((latQ >> (14 - i)) & 1) << (28 - 2 * i)
      }
      (0 until 6).map(j =>
        graft.ops.GravityOps.GhAlphabet.charAt(((g >> (25 - 5 * j)) & 31).toInt))
        .mkString
    }
    // published anchor (Wikipedia's geohash example, truncated to 6):
    // (57.64911 N, 10.40744 E) -> u4pruydqqvj
    assert(sqlGeohash(10407440L, 57649110L) == "u4pruy", "anchor mismatch")
    assert(refGeohash(10.40744, 57.64911, 6) == "u4pruy", "ref anchor mismatch")
    // the 25 key-derived query points + a deterministic sweep
    val pts = (0 until 25).map(k =>
      (-6300000L + (k % 21) * 310000L, 36100000L + (k % 11) * 520000L)) ++
      (0 until 500).map { i =>
        val h = i * 2654435761L
        ((h % 360000000L) - 180000000L, ((h / 7) % 180000000L) - 90000000L)
      }
    pts.foreach { case (lonE6, latE6) =>
      val got = sqlGeohash(lonE6, latE6)
      val want = refGeohash(lonE6.toDouble / 1e6, latE6.toDouble / 1e6, 6)
      assert(got == want, s"($lonE6, $latE6): sql=$got ref=$want")
    }
  }

  test("WKT round-trip: point, polygon, polygon with hole, multipolygon") {
    val cases = Seq(
      "POINT (1.5 -2.25)",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))")
    cases.foreach { w =>
      assert(toWkt(parseWkt(w)) == w, s"round-trip failed for $w")
    }
  }

  test("WKT parse accepts unclosed rings and scientific notation") {
    val g = parseWkt("POLYGON((0 0, 1e1 0, 10 1E1, 0 10))") // auto-closes
    assert(area(g) == 100.0)
  }

  test("area and centroid: square, square with hole, multipolygon") {
    val sq = parseWkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(area(sq) == 16.0)
    assert(centroid(sq) == Pt(2, 2))

    val holed = parseWkt(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (0 0, 5 0, 5 5, 0 5, 0 0))")
    assert(area(holed) == 75.0)
    // centroid shifts away from the removed quadrant
    val c = centroid(holed)
    assert(c.x > 5.0 && c.y > 5.0)

    // two unit squares: centroid = midpoint of their centers
    val mp = parseWkt(
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))")
    assert(math.abs(centroid(mp).x - 3.0) < 1e-12)
    assert(math.abs(centroid(mp).y - 3.0) < 1e-12)
  }

  test("centroid is orientation-independent (CW ring == CCW ring)") {
    val ccw = parseWkt("POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))")
    val cw = parseWkt("POLYGON ((0 0, 0 2, 4 2, 4 0, 0 0))")
    assert(centroid(ccw) == centroid(cw))
    assert(area(ccw) == area(cw))
  }

  test("point-in-polygon: convex, concave, hole, boundary") {
    val sq = parseWkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(contains(sq, Pt(2, 2)))
    assert(!contains(sq, Pt(5, 2)))
    assert(contains(sq, Pt(0, 2)), "boundary counts as inside")
    assert(contains(sq, Pt(4, 4)), "vertex counts as inside")

    // concave L-shape: the notch (3,3) is outside
    val l = parseWkt("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))")
    assert(contains(l, Pt(1, 3)))
    assert(contains(l, Pt(3, 1)))
    assert(!contains(l, Pt(3, 3)))

    val holed = parseWkt(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    assert(contains(holed, Pt(2, 2)))
    assert(!contains(holed, Pt(5, 5)), "inside the hole = outside")
  }

  test("intersects / contains / within / overlaps") {
    val a = parseWkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val b = parseWkt("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))") // overlaps a
    val c = parseWkt("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))") // inside a
    val d = parseWkt("POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))") // disjoint

    assert(intersects(a, b) && intersects(b, a))
    assert(intersects(a, c))
    assert(!intersects(a, d))
    assert(containsGeom(a, c) && within(c, a))
    assert(!containsGeom(a, b))
    assert(overlaps(a, b))
    assert(!overlaps(a, c), "containment is not overlap")
    assert(!overlaps(a, d))
    // degenerate cross shape: boundaries cross but no vertex inside
    val h = parseWkt("POLYGON ((-1 1, 5 1, 5 3, -1 3, -1 1))")
    assert(intersects(a, h), "edge-crossing without vertex containment")
  }

  test("containsGeom: concave container rejects edge that exits and re-enters") {
    // U-shape: opening along the top between x∈(2,6), y>2
    val u = parseWkt(
      "POLYGON ((0 0, 8 0, 8 8, 6 8, 6 2, 2 2, 2 8, 0 8, 0 0))")
    // bar spanning the opening: both endpoints inside the U's arms but the
    // connecting edge passes through the notch (outside the U)
    val bar = parseWkt("POLYGON ((1 5, 7 5, 7 6, 1 6, 1 5))")
    assert(contains(u, Pt(1, 5)) && contains(u, Pt(7, 5)),
      "bar vertices individually inside the U's arms")
    assert(!containsGeom(u, bar),
      "edge exits/re-enters the concave container — not contained")
    // control: a polygon truly inside one arm IS contained
    val inArm = parseWkt("POLYGON ((0.5 3, 1.5 3, 1.5 7, 0.5 7, 0.5 3))")
    assert(containsGeom(u, inArm))
    // boundary touching still counts as contained (closure semantics)
    val touching = parseWkt("POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))")
    assert(containsGeom(u, touching))
  }

  test("containsGeom: edge exiting exactly through a concave vertex (orientation==0) is caught") {
    // Container dips to (3,1) between concave vertices (2,2) and (4,2).
    // The inner triangle's top edge runs along y=2 from (1,2) to (5,2):
    // it passes EXACTLY through both concave vertices (every orientation
    // test degenerates to 0 — no proper crossing) yet lies outside the
    // container for x in (2,4). The edge-midpoint test must catch it.
    val a = parseWkt("POLYGON((0 0, 6 0, 6 4, 4 2, 3 1, 2 2, 0 4, 0 0))")
    val b = parseWkt("POLYGON((1 2, 5 2, 3 0.5, 1 2))")
    assert(!containsGeom(a, b), "vertex pass-through exit must defeat containment")
    // control: the same triangle shifted fully below the notch IS contained
    val c = parseWkt("POLYGON((1 0.8, 5 0.8, 3 0.3, 1 0.8))")
    assert(containsGeom(a, c))
  }

  test("bbox accessors") {
    val g = parseWkt("POLYGON ((1 2, 5 2, 5 7, 1 7, 1 2))")
    assert(bbox(g) == (1.0, 2.0, 5.0, 7.0))
  }

  test("spheroid distance: identity, symmetry, known anchors") {
    assert(distanceSpheroid(-3.7, 40.4, -3.7, 40.4) == 0.0)
    val d1 = distanceSpheroid(-3.7038, 40.4168, 2.1734, 41.3851)
    val d2 = distanceSpheroid(2.1734, 41.3851, -3.7038, 40.4168)
    assert(math.abs(d1 - d2) < 1e-6, "symmetric")
    // Madrid–Barcelona geodesic ≈ 504.6 km (WGS84)
    assert(d1 > 503000 && d1 < 507000, s"got $d1")
    // one degree of longitude at the equator ≈ 111.32 km
    val eq = distanceSpheroid(0, 0, 1, 0)
    assert(math.abs(eq - 111319.49) < 10, s"got $eq")
    // haversine within 0.5% of spheroid
    val h = haversine(-3.7038, 40.4168, 2.1734, 41.3851)
    assert(math.abs(h - d1) / d1 < 0.005)
    // haversine anchor from independent computation: 505444.17 m
    assert(math.abs(h - 505444.169) < 1.0, s"got $h")
  }

  test("meridian arc matches numerical integration (M(40°) = 4429529.030)") {
    val m = Geo.meridianArc(math.toRadians(40.0))
    assert(math.abs(m - 4429529.0304) < 0.01, s"got $m")
  }

  test("UTM 30N inverse: central meridian and round-trips across the zone") {
    // E=500000 is the central meridian by construction → lon = -3 exactly
    val (lon0, lat0) = utm30nToLonLat(500000.0, Geo.meridianArc(math.toRadians(40.0)) * 0.9996)
    assert(math.abs(lon0 - (-3.0)) < 1e-9, s"got $lon0")
    assert(math.abs(lat0 - 40.0) < 1e-7, s"got $lat0")

    // forward∘inverse identity to ~1 cm over the Spanish zone (series
    // truncation grows toward the zone edge: ~4 mm at 4.2° offset)
    for (lon <- Seq(-5.9, -3.0, -0.3, 1.2); lat <- Seq(36.1, 39.47, 43.6)) {
      val (e, n) = lonLatToUtm30n(lon, lat)
      val (lon2, lat2) = utm30nToLonLat(e, n)
      assert(math.abs(lon2 - lon) < 1e-7, s"lon $lon -> $lon2 (e=$e n=$n)")
      assert(math.abs(lat2 - lat) < 1e-7, s"lat $lat -> $lat2")
    }
    // Valencia-ish anchor: E=725000 N=4373000 → ≈ (-0.38, 39.48)
    val (vlon, vlat) = utm30nToLonLat(725000.0, 4373000.0)
    assert(vlon > -0.45 && vlon < -0.3, s"got $vlon")
    assert(vlat > 39.4 && vlat < 39.6, s"got $vlat")
  }

  test("GeoJSON serialization") {
    assert(toGeoJson(parseWkt("POINT (1 2)")) ==
      """{"type":"Point","coordinates":[1.0,2.0]}""")
    val gj = toGeoJson(parseWkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
    assert(gj.startsWith("""{"type":"Polygon","coordinates":[[[0.0,0.0]"""))
  }

  test("isValid") {
    assert(isValid(parseWkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")))
    assert(isValid(parseWkt("POINT (3 4)")))
  }
}
