package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.Geo

/** ScalaCheck properties for the pure kernels (SURVEY.md §5b): distance
  * metric laws and the UTM 30N projection round-trip across the zone.
  * (Raw scalacheck API — the scalatest bridge artifact isn't in the
  * offline cache.)
  */
class PropertySpec extends AnyFunSuite {

  private val lon = Gen.choose(-7.0, 1.0)   // UTM zone 30 span
  private val lat = Gen.choose(35.0, 44.0)  // Spain latitudes

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("spheroid distance: identity, symmetry, positivity") {
    check(Prop.forAll(lon, lat, lon, lat) { (x1, y1, x2, y2) =>
      val d12 = Geo.distanceSpheroid(x1, y1, x2, y2)
      val d21 = Geo.distanceSpheroid(x2, y2, x1, y1)
      Geo.distanceSpheroid(x1, y1, x1, y1) == 0.0 &&
        math.abs(d12 - d21) <= 1e-6 * math.max(d12, 1.0) &&
        d12 >= 0.0
    })
  }

  test("haversine is within 0.5% of the spheroid distance (regional scale)") {
    check(Prop.forAll(lon, lat, lon, lat) { (x1, y1, x2, y2) =>
      val s = Geo.distanceSpheroid(x1, y1, x2, y2)
      val h = Geo.haversine(x1, y1, x2, y2)
      s <= 1000 || math.abs(s - h) / s < 0.005 // sub-km pairs: bound is noise
    })
  }

  test("UTM 30N round-trip: lonlat -> E/N -> lonlat within 1e-7 degrees") {
    check(Prop.forAll(lon, lat) { (x, y) =>
      val (e, n) = Geo.lonLatToUtm30n(x, y)
      val (x2, y2) = Geo.utm30nToLonLat(e, n)
      math.abs(x2 - x) < 1e-7 && math.abs(y2 - y) < 1e-7
    })
  }

  test("Misra-Gries summary keeps every item with freq > n/(k+1)") {
    val stream = Gen.listOfN(400, Gen.frequency(
      (8, Gen.oneOf("a", "b", "c")),            // heavy candidates
      (2, Gen.choose(0, 500).map("t" + _))))    // long random tail
    val k = Gen.choose(2, 16)
    check(Prop.forAll(stream, k) { (s, kk) =>
      val summary = graft.ops.TextOps.mgSummary(s.iterator, kk)
      val exact = s.groupBy(identity).view.mapValues(_.size.toLong)
      val thresh = s.size.toDouble / (kk + 1)
      exact.forall { case (t, n) => n <= thresh || summary.contains(t) }
    })
  }

  test("triangle inequality holds up to spheroid tolerance") {
    check(Prop.forAll(lon, lat, lon, lat, lon, lat) { (x1, y1, x2, y2, x3, y3) =>
      val ab = Geo.distanceSpheroid(x1, y1, x2, y2)
      val bc = Geo.distanceSpheroid(x2, y2, x3, y3)
      val ac = Geo.distanceSpheroid(x1, y1, x3, y3)
      ac <= ab + bc + 1e-3
    })
  }

  test("jpegBytes: arbitrary dims decode via ImageIO with exact size, dims, and pixels") {
    // the whole codec contract as a property: for ANY w×h (not just
    // the fixture formulas) the generated baseline JFIF (a) decodes
    // with the JDK's independent decoder, (b) at the stated dims,
    // (c) at the closed-form byte size 158 + ceil(blocks/4), and
    // (d) to a uniform mid-gray raster (DC 0 + T.81 level shift) —
    // spot-checked at the corners where partial edge blocks live
    val dim = Gen.choose(1, 200)
    check(Prop.forAll(dim, dim) { (w, h) =>
      val bytes = graft.sources.ImageFiles.jpegBytes(w, h)
      val blocks = ((w + 7) / 8) * ((h + 7) / 8)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      img != null &&
        bytes.length == 158 + (blocks + 3) / 4 &&
        img.getWidth == w && img.getHeight == h &&
        img.getRaster.getSample(0, 0, 0) == 128 &&
        img.getRaster.getSample(w - 1, h - 1, 0) == 128 &&
        img.getRaster.getSample(w - 1, 0, 0) == 128 &&
        img.getRaster.getSample(0, h - 1, 0) == 128
    })
  }
  test("xml codec: synth/parse roundtrip over arbitrary text incl. escapes") {
    import graft.sources.XmlFiles
    // alphabet deliberately includes the five characters the escaper
    // must handle and a bracket the CDATA scanner must not trip on
    val textGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('&', '<', '>', '"', '\'', ' ', ']')))
      .map(_.mkString).suchThat(!_.contains("]]>"))
    val docGen = for {
      id <- Gen.choose(1L, 999999L)
      t <- textGen
    } yield (id, t)
    check(Prop.forAll(Gen.nonEmptyListOf(docGen)) { docs0 =>
      val docs = docs0.groupBy(_._1).map(_._2.head).toSeq // unique ids
      val scan = XmlFiles.parseXml(XmlFiles.synthXml("s", docs))
      val byId = docs.map(d => d._1 -> d._2).toMap
      scan.clean &&
        scan.items.size == docs.size &&
        scan.items.forall(it => it.idAttr == it.titleId) &&
        scan.items.forall(it =>
          it.bodyLen == byId(it.idAttr).getBytes("UTF-8").length.toLong) &&
        scan.nCdata == docs.count(_._1 % 5 == 0).toLong &&
        scan.nSelfClose == docs.count(_._1 % 4 == 0).toLong
    })
  }
}
