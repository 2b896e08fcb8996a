package graft

import java.nio.file.Files

import graft.geo.Geo
import graft.sources.Shapefile

/** Round-trip coverage for the shapefile codec beyond the fixture's
  * single-ring rectangles: multi-record files, a polygon WITH A HOLE
  * (numParts = 2, part-offset slicing), attribute padding/truncation,
  * and the format-magic validation.
  */
class ShapefileSpec extends SparkSpec {

  private def tmpBase(name: String): String = {
    val d = Files.createTempDirectory("shp_spec").toFile
    d.deleteOnExit()
    new java.io.File(d, name).getAbsolutePath
  }

  test("holed polygon round-trips through .shp with correct ring slicing") {
    val base = tmpBase("holed")
    val outer = Vector((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0))
    val hole = Vector((2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (2.0, 6.0), (2.0, 2.0))
    val plain = Vector((20.0, 0.0), (20.0, 1.0), (22.0, 1.0), (22.0, 0.0), (20.0, 0.0))
    Shapefile.write(base, Seq("NAME"),
      Seq((Vector(outer, hole), Seq("holed")), (Vector(plain), Seq("plain"))))

    val rows = Shapefile.read(spark, base).collect()
    assert(rows.length == 2)
    val byName = rows.map(r => r.getString(1) -> r.getString(0)).toMap
    val holed = Geo.parseWkt(byName("holed"))
    // area = outer (100) - hole (16)
    assert(math.abs(Geo.area(holed) - 84.0) < 1e-9)
    assert(math.abs(Geo.area(Geo.parseWkt(byName("plain"))) - 2.0) < 1e-9)
    // the hole is real: its interior is outside the polygon
    assert(!Geo.contains(holed, Geo.Pt(4.0, 4.0)))
    assert(Geo.contains(holed, Geo.Pt(1.0, 1.0)))
  }

  test("multi-part record with two exterior rings reads as islands, not a hole") {
    val base = tmpBase("islands")
    // both rings CLOCKWISE (negative shoelace) = two exteriors per the
    // shapefile winding convention
    val mainland = Vector((0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0))
    val island = Vector((10.0, 0.0), (10.0, 1.0), (11.0, 1.0), (11.0, 0.0), (10.0, 0.0))
    Shapefile.write(base, Seq("NAME"),
      Seq((Vector(mainland, island), Seq("coast"))))
    val wkt = Shapefile.read(spark, base).collect()(0).getString(0)
    val g = Geo.parseWkt(wkt)
    // areas ADD (16 + 1); a hole-misread would subtract (16 - 1)
    assert(math.abs(Geo.area(g) - 17.0) < 1e-9, s"got area ${Geo.area(g)} from $wkt")
    assert(Geo.contains(g, Geo.Pt(10.5, 0.5)), "island interior must be inside")
  }

  test("attribute values pad/truncate to the fixed dbf width and trim back") {
    val base = tmpBase("attrs")
    val sq = Vector((0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0), (0.0, 0.0))
    Shapefile.write(base, Seq("A", "B"),
      Seq((Vector(sq), Seq("x", "exactly-16-chars-plus-overflow"))))
    val r = Shapefile.read(spark, base).collect()(0)
    assert(r.getString(1) == "x")
    assert(r.getString(2) == "exactly-16-chars") // truncated at field width
  }

  test("reader rejects a non-shapefile loudly") {
    val base = tmpBase("junk")
    Files.write(new java.io.File(base + ".shp").toPath, Array.fill(120)(0x42.toByte))
    Files.write(new java.io.File(base + ".dbf").toPath, Array.fill(40)(0x42.toByte))
    val e = intercept[IllegalArgumentException] {
      Shapefile.read(spark, base)
    }
    assert(e.getMessage.contains("bad file code"))
  }
  test("grid spatial join finds exactly the brute-force containment set") {
    val rows = graft.ops.GravityOps.gridSpatialJoin(spark, sfTiny).collect()
    val got = rows.map(r => r.getAs[Int]("k") -> r.getAs[Long]("n_inside")).toMap
    // brute force: every point against every rectangle, no index
    val pts = Tables.customer(spark, sfTiny).select(org.apache.spark.sql.functions.col("c_custkey")).collect()
      .map(_.getLong(0)).map(c => (c % 97, c % 83))
    val want = Tables.nation(spark, sfTiny).select(org.apache.spark.sql.functions.col("n_nationkey")).collect()
      .map(_.getAs[Number](0).longValue).map { k =>
        val (mx0, ny0) = ((k % 10) * 9, (k % 7) * 12)
        val (mx1, ny1) = (mx0 + 8 + (k % 3) * 4, ny0 + 12)
        k.toInt -> pts.count(p => p._1 >= mx0 && p._1 <= mx1 &&
          p._2 >= ny0 && p._2 <= ny1).toLong
      }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, n) => assert(n == want(k), s"nation $k") }
    // the index is selective: candidates bound hits from above
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cand") >= r.getAs[Long]("n_inside"))
    }
  }

}
