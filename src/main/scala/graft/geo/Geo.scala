package graft.geo

import scala.collection.mutable.ArrayBuffer

/** Pure-Scala planar/geodesic geometry over WKT-encoded values — the
  * engine-side replacement for the DuckDB `spatial` extension surface the
  * reference uses (SURVEY.md §2.8; `dags/ducklake_utils.py:46-47`).
  * No Spark imports here so every function is unit-testable standalone;
  * graft.geo.GeoFunctions wraps these as UDFs/Aggregators.
  *
  * Geometry model: POINT / POLYGON (exterior ring + optional holes) /
  * MULTIPOLYGON, matching the reference's observed usage (census-section
  * polygons, centroids; no lines/collections anywhere).
  */
object Geo {

  final case class Pt(x: Double, y: Double)

  /** A polygon: first ring = exterior, rest = holes. Rings are closed
    * (first point == last point). */
  final case class Poly(rings: Vector[Vector[Pt]]) {
    def exterior: Vector[Pt] = rings.head
  }

  sealed trait Geom
  final case class GPoint(p: Pt) extends Geom
  final case class GPolygon(poly: Poly) extends Geom
  final case class GMultiPolygon(polys: Vector[Poly]) extends Geom

  // ------------------------------------------------------------- WKT codec

  /** Parse WKT (POINT / POLYGON / MULTIPOLYGON). Throws on malformed input
    * — mirrors ST_GeomFromText erroring on bad WKT. */
  def parseWkt(wkt: String): Geom = {
    val s = wkt.trim
    val upper = s.toUpperCase
    if (upper.startsWith("POINT")) {
      val nums = numbersIn(s.substring(5))
      require(nums.length == 2, s"POINT needs 2 coords: $wkt")
      GPoint(Pt(nums(0), nums(1)))
    } else if (upper.startsWith("MULTIPOLYGON")) {
      GMultiPolygon(parsePolys(s.substring(12)))
    } else if (upper.startsWith("POLYGON")) {
      val polys = parsePolys("((" + stripParens(s.substring(7)) + "))")
      require(polys.length == 1, s"POLYGON parse error: $wkt")
      GPolygon(polys.head)
    } else sys.error(s"unsupported WKT: ${s.take(30)}")
  }

  private def stripParens(s: String): String = {
    val t = s.trim
    require(t.startsWith("(") && t.endsWith(")"), s"bad WKT body: $t")
    t.substring(1, t.length - 1)
  }

  /** Parse "(((x y, …)),((…)))" into polygons. */
  private def parsePolys(s: String): Vector[Poly] = {
    val body = stripParens(s) // now "((ring),(ring)),((ring))"
    // split top-level polygon groups by tracking paren depth
    val polys = ArrayBuffer.empty[Vector[Vector[Pt]]]
    var depth = 0
    var start = 0
    var i = 0
    val groups = ArrayBuffer.empty[String]
    while (i < body.length) {
      body.charAt(i) match {
        case '(' =>
          if (depth == 0) start = i
          depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) groups += body.substring(start, i + 1)
        case _ =>
      }
      i += 1
    }
    groups.foreach { g =>
      val ringsBody = stripParens(g)
      val rings = ArrayBuffer.empty[Vector[Pt]]
      var d = 0; var st = 0; var j = 0
      while (j < ringsBody.length) {
        ringsBody.charAt(j) match {
          case '(' => if (d == 0) st = j; d += 1
          case ')' => d -= 1; if (d == 0) rings += parseRing(ringsBody.substring(st + 1, j))
          case _ =>
        }
        j += 1
      }
      polys += rings.toVector
    }
    polys.map(r => Poly(r)).toVector
  }

  private def parseRing(s: String): Vector[Pt] = {
    val pts = s.split(",").map { pair =>
      val nums = numbersIn(pair)
      require(nums.length == 2, s"bad coord pair: $pair")
      Pt(nums(0), nums(1))
    }.toVector
    val closed = if (pts.head == pts.last) pts else pts :+ pts.head
    require(closed.length >= 4, s"ring needs >=3 distinct points: $s")
    closed
  }

  private def numbersIn(s: String): Array[Double] =
    s.split("[^0-9eE+\\-.]+").filter(_.nonEmpty).map(_.toDouble)

  def toWkt(g: Geom): String = g match {
    case GPoint(p) => s"POINT (${fmt(p.x)} ${fmt(p.y)})"
    case GPolygon(poly) => s"POLYGON ${polyBody(poly)}"
    case GMultiPolygon(ps) =>
      s"MULTIPOLYGON (${ps.map(polyBody).mkString(", ")})"
  }

  private def polyBody(p: Poly): String =
    "(" + p.rings.map(r =>
      "(" + r.map(pt => s"${fmt(pt.x)} ${fmt(pt.y)}").mkString(", ") + ")")
      .mkString(", ") + ")"

  private def fmt(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString

  // --------------------------------------------------- area / centroid / bbox

  /** Signed shoelace area of one ring (positive = CCW). */
  def ringArea(ring: Vector[Pt]): Double = {
    var a = 0.0
    var i = 0
    while (i < ring.length - 1) {
      a += ring(i).x * ring(i + 1).y - ring(i + 1).x * ring(i).y
      i += 1
    }
    a / 2.0
  }

  /** Polygon area: |exterior| - Σ|holes|. */
  def area(p: Poly): Double =
    math.abs(ringArea(p.exterior)) - p.rings.tail.map(r => math.abs(ringArea(r))).sum

  def area(g: Geom): Double = g match {
    case GPoint(_) => 0.0
    case GPolygon(p) => area(p)
    case GMultiPolygon(ps) => ps.map(area).sum
  }

  private def ringCentroid(ring: Vector[Pt]): (Double, Double, Double) = {
    // returns (cx*A, cy*A, A) with signed A
    var a = 0.0; var cx = 0.0; var cy = 0.0
    var i = 0
    while (i < ring.length - 1) {
      val cross = ring(i).x * ring(i + 1).y - ring(i + 1).x * ring(i).y
      a += cross
      cx += (ring(i).x + ring(i + 1).x) * cross
      cy += (ring(i).y + ring(i + 1).y) * cross
      i += 1
    }
    a /= 2.0
    (cx / 6.0, cy / 6.0, a)
  }

  /** Area-weighted centroid (holes subtract; degenerate zero-area geometry
    * falls back to vertex mean, like a point cluster). */
  def centroid(g: Geom): Pt = g match {
    case GPoint(p) => p
    case other =>
      val polys = other match {
        case GPolygon(p) => Vector(p)
        case GMultiPolygon(ps) => ps
        case _ => Vector.empty
      }
      var sx = 0.0; var sy = 0.0; var sa = 0.0
      polys.foreach { poly =>
        // exterior ring sign normalized positive, holes negative
        val (ex, ey, ea) = ringCentroid(poly.exterior)
        val sgn = if (ea < 0) -1.0 else 1.0
        sx += ex * sgn; sy += ey * sgn; sa += ea * sgn
        poly.rings.tail.foreach { h =>
          val (hx, hy, ha) = ringCentroid(h)
          val hsgn = if (ha < 0) -1.0 else 1.0
          sx -= hx * hsgn; sy -= hy * hsgn; sa -= ha * hsgn
        }
      }
      if (math.abs(sa) < 1e-12) {
        val pts = polys.flatMap(_.exterior.dropRight(1))
        Pt(pts.map(_.x).sum / pts.length, pts.map(_.y).sum / pts.length)
      } else Pt(sx / sa, sy / sa)
  }

  def bbox(g: Geom): (Double, Double, Double, Double) = {
    val pts = g match {
      case GPoint(p) => Vector(p)
      case GPolygon(p) => p.rings.flatten
      case GMultiPolygon(ps) => ps.flatMap(_.rings.flatten)
    }
    (pts.map(_.x).min, pts.map(_.y).min, pts.map(_.x).max, pts.map(_.y).max)
  }

  // ------------------------------------------------------------ predicates

  /** Ray-casting point-in-ring (boundary counts as inside). */
  def pointInRing(p: Pt, ring: Vector[Pt]): Boolean = {
    var inside = false
    var i = 0
    while (i < ring.length - 1) {
      val a = ring(i); val b = ring(i + 1)
      if (onSegment(p, a, b)) return true
      if ((a.y > p.y) != (b.y > p.y)) {
        val xint = a.x + (p.y - a.y) * (b.x - a.x) / (b.y - a.y)
        if (p.x < xint) inside = !inside
      }
      i += 1
    }
    inside
  }

  private def onSegment(p: Pt, a: Pt, b: Pt): Boolean = {
    val cross = (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x)
    if (math.abs(cross) > 1e-12) return false
    p.x >= math.min(a.x, b.x) - 1e-12 && p.x <= math.max(a.x, b.x) + 1e-12 &&
      p.y >= math.min(a.y, b.y) - 1e-12 && p.y <= math.max(a.y, b.y) + 1e-12
  }

  def pointInPoly(p: Pt, poly: Poly): Boolean =
    pointInRing(p, poly.exterior) && !poly.rings.tail.exists(h =>
      pointInRing(p, h) && !ringBoundary(p, h))

  private def ringBoundary(p: Pt, ring: Vector[Pt]): Boolean = {
    var i = 0
    while (i < ring.length - 1) {
      if (onSegment(p, ring(i), ring(i + 1))) return true
      i += 1
    }
    false
  }

  def contains(g: Geom, p: Pt): Boolean = g match {
    case GPoint(q) => q == p
    case GPolygon(poly) => pointInPoly(p, poly)
    case GMultiPolygon(ps) => ps.exists(pointInPoly(p, _))
  }

  private def segsIntersect(a: Pt, b: Pt, c: Pt, d: Pt): Boolean = {
    def orient(p: Pt, q: Pt, r: Pt): Double =
      (q.x - p.x) * (r.y - p.y) - (q.y - p.y) * (r.x - p.x)
    val o1 = orient(a, b, c); val o2 = orient(a, b, d)
    val o3 = orient(c, d, a); val o4 = orient(c, d, b)
    if (((o1 > 0 && o2 < 0) || (o1 < 0 && o2 > 0)) &&
        ((o3 > 0 && o4 < 0) || (o3 < 0 && o4 > 0))) true
    else onSegment(c, a, b) || onSegment(d, a, b) ||
      onSegment(a, c, d) || onSegment(b, c, d)
  }

  private def boundariesCross(p1: Poly, p2: Poly): Boolean = {
    val r1 = p1.rings.flatMap(r => r.zip(r.tail))
    val r2 = p2.rings.flatMap(r => r.zip(r.tail))
    r1.exists { case (a, b) => r2.exists { case (c, d) => segsIntersect(a, b, c, d) } }
  }

  /** Segments cross at an interior point of both (proper crossing) —
    * endpoint touches and collinear overlap do NOT count. Containment
    * tolerates boundary touching but not a true pass-through. */
  private def segsProperlyCross(a: Pt, b: Pt, c: Pt, d: Pt): Boolean = {
    def orient(p: Pt, q: Pt, r: Pt): Double =
      (q.x - p.x) * (r.y - p.y) - (q.y - p.y) * (r.x - p.x)
    val o1 = orient(a, b, c); val o2 = orient(a, b, d)
    val o3 = orient(c, d, a); val o4 = orient(c, d, b)
    ((o1 > 0 && o2 < 0) || (o1 < 0 && o2 > 0)) &&
      ((o3 > 0 && o4 < 0) || (o3 < 0 && o4 > 0))
  }

  private def boundariesProperlyCross(p1: Poly, p2: Poly): Boolean = {
    val r1 = p1.rings.flatMap(r => r.zip(r.tail))
    val r2 = p2.rings.flatMap(r => r.zip(r.tail))
    r1.exists { case (a, b) => r2.exists { case (c, d) => segsProperlyCross(a, b, c, d) } }
  }

  private def bboxOverlap(a: Geom, b: Geom): Boolean = {
    val (ax0, ay0, ax1, ay1) = bbox(a)
    val (bx0, by0, bx1, by1) = bbox(b)
    ax0 <= bx1 && bx0 <= ax1 && ay0 <= by1 && by0 <= ay1
  }

  private def polysOf(g: Geom): Vector[Poly] = g match {
    case GPolygon(p) => Vector(p)
    case GMultiPolygon(ps) => ps
    case GPoint(p) => Vector.empty
  }

  /** ST_Intersects: any common point (bbox prefilter, then boundary
    * crossing or containment either way). */
  def intersects(a: Geom, b: Geom): Boolean = {
    if (!bboxOverlap(a, b)) return false
    (a, b) match {
      case (GPoint(p), g) => contains(g, p)
      case (g, GPoint(p)) => contains(g, p)
      case _ =>
        val pa = polysOf(a); val pb = polysOf(b)
        pa.exists(x => pb.exists(y =>
          boundariesCross(x, y) ||
            pointInPoly(x.exterior.head, y) || pointInPoly(y.exterior.head, x)))
    }
  }

  /** ST_Contains(a, b): every exterior vertex of b inside a, no proper
    * boundary crossing (a concave a can be exited and re-entered by an
    * edge of b while all of b's vertices stay inside — the crossing test
    * catches that), every edge MIDPOINT of b inside a (a crossing whose
    * orientation test degenerates to 0 — an edge of b exiting exactly
    * through a vertex of a, or leaving along a collinear boundary run —
    * is invisible to the proper-crossing sign test but leaves the
    * midpoint of the offending sub-segment outside), and no hole of a
    * strictly inside b. Boundary touches are allowed — a deliberate
    * CLOSED-set semantic (a point ON the boundary is contained), which
    * differs from OGC Contains' interior-intersection requirement but
    * matches the closed BETWEEN intervals this engine's oracle
    * arithmetic uses throughout. Remaining documented limitation:
    * an edge of b that exits AND re-enters a within the same half-edge
    * (two vertex-degenerate crossings inside one segment) can evade both
    * tests; exact arithmetic would be needed to close that, which this
    * engine trades away consistently with onSegment's 1e-12 tolerance.
    */
  def containsGeom(a: Geom, b: Geom): Boolean = b match {
    case GPoint(p) => contains(a, p)
    case _ =>
      val pa = polysOf(a); val pb = polysOf(b)
      pb.forall(_.exterior.forall(p => contains(a, p))) &&
        pb.forall(_.exterior.sliding(2).forall {
          case Vector(p, q) =>
            contains(a, Pt((p.x + q.x) / 2, (p.y + q.y) / 2))
          case _ => true
        }) &&
        !pb.exists(bp => pa.exists(ap => boundariesProperlyCross(ap, bp))) &&
        // no hole of a strictly inside b (would punch through b's interior)
        pa.forall(_.rings.tail.forall(h =>
          !pb.exists(bp => pointInPoly(h.head, bp))))
  }

  def within(a: Geom, b: Geom): Boolean = containsGeom(b, a)

  /** ST_Overlaps: intersect but neither contains the other. Documented
    * deviation from OGC: this engine works with CLOSED point sets
    * throughout (boundary contact counts as intersection, boundary
    * points as contained — consistent with the BETWEEN-style closed
    * intervals its oracle arithmetic uses), so two polygons sharing
    * only a border edge report overlaps=true here while OGC's
    * interiors-must-intersect definition says false. */
  def overlaps(a: Geom, b: Geom): Boolean =
    intersects(a, b) && !containsGeom(a, b) && !containsGeom(b, a)

  def isValid(g: Geom): Boolean = g match {
    case GPoint(p) => !p.x.isNaN && !p.y.isNaN
    case _ => polysOf(g).forall(p => p.rings.forall(r =>
      r.length >= 4 && r.head == r.last &&
        r.forall(q => !q.x.isNaN && !q.y.isNaN)))
  }

  // ------------------------------------------------------ geodesic distance

  /** WGS84 ellipsoid. */
  val A = 6378137.0
  val F = 1.0 / 298.257223563
  val B = A * (1 - F)

  /** Vincenty inverse geodesic distance in METERS between two lon/lat
    * points — the semantics of DuckDB's ST_Distance_Spheroid
    * (`dags/gravity/create_distances.py:17`). Falls back to haversine for
    * the (nearly antipodal) non-convergent case.
    */
  def distanceSpheroid(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    if (lon1 == lon2 && lat1 == lat2) return 0.0
    val L = math.toRadians(lon2 - lon1)
    val u1 = math.atan((1 - F) * math.tan(math.toRadians(lat1)))
    val u2 = math.atan((1 - F) * math.tan(math.toRadians(lat2)))
    val sinU1 = math.sin(u1); val cosU1 = math.cos(u1)
    val sinU2 = math.sin(u2); val cosU2 = math.cos(u2)
    var lambda = L
    var iter = 0
    var converged = false
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var cosSqAlpha = 0.0; var cos2SigmaM = 0.0
    while (iter < 200 && !converged) {
      val sinL = math.sin(lambda); val cosL = math.cos(lambda)
      sinSigma = math.sqrt(
        math.pow(cosU2 * sinL, 2) +
          math.pow(cosU1 * sinU2 - sinU1 * cosU2 * cosL, 2))
      if (sinSigma == 0.0) return 0.0
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosL
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinL / sinSigma
      cosSqAlpha = 1 - sinAlpha * sinAlpha
      cos2SigmaM = if (cosSqAlpha == 0) 0.0 else cosSigma - 2 * sinU1 * sinU2 / cosSqAlpha
      val c = F / 16 * cosSqAlpha * (4 + F * (4 - 3 * cosSqAlpha))
      val lambdaPrev = lambda
      lambda = L + (1 - c) * F * sinAlpha *
        (sigma + c * sinSigma * (cos2SigmaM + c * cosSigma *
          (-1 + 2 * cos2SigmaM * cos2SigmaM)))
      if (math.abs(lambda - lambdaPrev) < 1e-12) converged = true
      iter += 1
    }
    if (!converged) return haversine(lon1, lat1, lon2, lat2)
    val uSq = cosSqAlpha * (A * A - B * B) / (B * B)
    val aa = 1 + uSq / 16384 * (4096 + uSq * (-768 + uSq * (320 - 175 * uSq)))
    val bb = uSq / 1024 * (256 + uSq * (-128 + uSq * (74 - 47 * uSq)))
    val deltaSigma = bb * sinSigma * (cos2SigmaM + bb / 4 *
      (cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM) -
        bb / 6 * cos2SigmaM * (-3 + 4 * sinSigma * sinSigma) *
          (-3 + 4 * cos2SigmaM * cos2SigmaM)))
    B * aa * (sigma - deltaSigma)
  }

  /** Great-circle haversine distance in METERS (mean earth radius).
    * Within 0.5% of the spheroid distance; used where the DuckDB oracle
    * must reproduce the number exactly with plain SQL math.
    */
  val MeanRadius = 6371008.8
  def haversine(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val dphi = math.toRadians(lat2 - lat1)
    val dl = math.toRadians(lon2 - lon1)
    val h = math.pow(math.sin(dphi / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dl / 2), 2)
    2 * MeanRadius * math.asin(math.sqrt(h))
  }

  // ----------------------------------------- EPSG:25830 → EPSG:4326 (UTM 30N)

  /** ETRS89 uses the GRS80 ellipsoid; for the transform's precision GRS80
    * and WGS84 are interchangeable (|Δf| < 1e-10). UTM zone 30N: central
    * meridian -3°, k0 = 0.9996, false easting 500000.
    * Inverse transverse Mercator via the standard Krüger series (same
    * formulation PROJ/GeographicLib reduce to at double precision for
    * in-zone points — sub-millimeter there).
    */
  private val K0 = 0.9996
  private val E2 = F * (2 - F)            // first eccentricity²
  private val EP2 = E2 / (1 - E2)         // second eccentricity²
  private val Lon0 = -3.0                 // UTM zone 30 central meridian

  /** Inverse: (easting, northing) in EPSG:25830 → (lon, lat) degrees. */
  def utm30nToLonLat(e: Double, n: Double): (Double, Double) = {
    val x = e - 500000.0
    val m = n / K0
    val mu = m / (A * (1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256))
    val e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
    val phi1 = mu +
      (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
    val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
    val c1 = EP2 * cosP * cosP
    val t1 = tanP * tanP
    val n1 = A / math.sqrt(1 - E2 * sinP * sinP)
    val r1 = A * (1 - E2) / math.pow(1 - E2 * sinP * sinP, 1.5)
    val d = x / (n1 * K0)
    val lat = phi1 - (n1 * tanP / r1) * (
      d * d / 2 -
        (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * EP2) * math.pow(d, 4) / 24 +
        (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * EP2 - 3 * c1 * c1) *
          math.pow(d, 6) / 720)
    val lon = math.toRadians(Lon0) + (
      d -
        (1 + 2 * t1 + c1) * math.pow(d, 3) / 6 +
        (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * EP2 + 24 * t1 * t1) *
          math.pow(d, 5) / 120) / cosP
    (math.toDegrees(lon), math.toDegrees(lat))
  }

  /** Forward: (lon, lat) degrees → EPSG:25830 (easting, northing). Used to
    * round-trip-test the inverse. */
  def lonLatToUtm30n(lon: Double, lat: Double): (Double, Double) = {
    val phi = math.toRadians(lat)
    val lam = math.toRadians(lon - Lon0)
    val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
    val n1 = A / math.sqrt(1 - E2 * sinP * sinP)
    val t = tanP * tanP
    val c = EP2 * cosP * cosP
    val aTerm = cosP * lam
    val m = meridianArc(phi)
    val easting = K0 * n1 * (aTerm +
      (1 - t + c) * math.pow(aTerm, 3) / 6 +
      (5 - 18 * t + t * t + 72 * c - 58 * EP2) * math.pow(aTerm, 5) / 120) + 500000.0
    val northing = K0 * (m + n1 * tanP * (
      aTerm * aTerm / 2 +
        (5 - t + 9 * c + 4 * c * c) * math.pow(aTerm, 4) / 24 +
        (61 - 58 * t + t * t + 600 * c - 330 * EP2) * math.pow(aTerm, 6) / 720))
    (easting, northing)
  }

  /** Meridian arc length from equator to latitude phi (radians). */
  def meridianArc(phi: Double): Double = {
    val e4 = E2 * E2; val e6 = e4 * E2
    A * ((1 - E2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi -
      (3 * E2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi) +
      (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi) -
      (35 * e6 / 3072) * math.sin(6 * phi))
  }

  // --------------------------------------------------------------- GeoJSON

  /** WKT → GeoJSON geometry string (ST_AsGeoJSON,
    * `dags/gravity/create_map.py:32`). */
  def toGeoJson(g: Geom): String = g match {
    case GPoint(p) => s"""{"type":"Point","coordinates":[${p.x},${p.y}]}"""
    case GPolygon(poly) =>
      s"""{"type":"Polygon","coordinates":${ringsJson(poly)}}"""
    case GMultiPolygon(ps) =>
      s"""{"type":"MultiPolygon","coordinates":[${ps.map(ringsJson).mkString(",")}]}"""
  }

  private def ringsJson(p: Poly): String =
    "[" + p.rings.map(r =>
      "[" + r.map(pt => s"[${pt.x},${pt.y}]").mkString(",") + "]").mkString(",") + "]"
}
