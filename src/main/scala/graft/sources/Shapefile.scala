package graft.sources

import java.io.{File, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.geo.Geo
import graft.geo.Geo.{GPolygon, Poly, Pt}

/** Minimal ESRI shapefile codec — the reference's `ST_Read(shp)` source
  * (`dags/geometry/ingestion_bronze_geometry.py:14-23`, SURVEY.md §2.1
  * S3), built from the public ESRI whitepaper format: `.shp` (geometry,
  * polygon type 5) + `.dbf` (dBase III attribute table). No external
  * library — the container is offline.
  *
  * Driver-side by design: shapefiles are DIMENSION data (the reference's
  * census sections are ~36k polygons, single-digit MB). Parsing on the
  * driver and broadcasting the resulting DataFrame is the right 100 TB
  * call — a DataSourceV2 for a format that is read once per year of
  * geometry would be machinery without a payoff (SURVEY.md §7.3).
  *
  * The reader validates the format magics (file code 9994, version 1000,
  * shape type) rather than trusting offsets, so a malformed file fails
  * loudly, not with garbage geometry.
  */
object Shapefile {

  // ------------------------------------------------------------- writer
  /** Write `.shp`/`.dbf` for (possibly multi-ring) polygons with
    * fixed-width string attributes (enough to synthesize census-section
    * fixtures; the READER is the operator under test). */
  def write(basePath: String, fieldNames: Seq[String],
            records: Seq[(Vector[Vector[(Double, Double)]], Seq[String])]): Unit = {
    val shp = new File(basePath + ".shp")
    shp.getParentFile.mkdirs()

    // ---- .shp
    val recordBufs = records.zipWithIndex.map { case ((rings, _), i) =>
      val pts = rings.flatten
      val xs = pts.map(_._1); val ys = pts.map(_._2)
      val contentBytes = 4 + 32 + 4 + 4 + 4 * rings.length + 16 * pts.length
      val b = ByteBuffer.allocate(8 + contentBytes)
      b.order(ByteOrder.BIG_ENDIAN)
      b.putInt(i + 1)                  // record number (1-based)
      b.putInt(contentBytes / 2)       // content length in 16-bit words
      b.order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(5)                      // shape type: Polygon
      b.putDouble(xs.min); b.putDouble(ys.min)
      b.putDouble(xs.max); b.putDouble(ys.max)
      b.putInt(rings.length)           // numParts
      b.putInt(pts.length)             // numPoints
      rings.scanLeft(0)(_ + _.length).init.foreach(b.putInt) // part offsets
      pts.foreach { case (x, y) => b.putDouble(x); b.putDouble(y) }
      b.array()
    }
    val fileBytes = 100 + recordBufs.map(_.length).sum
    val allPts = records.flatMap(_._1.flatten)
    val allX = allPts.map(_._1); val allY = allPts.map(_._2)
    val h = ByteBuffer.allocate(100)
    h.order(ByteOrder.BIG_ENDIAN)
    h.putInt(9994); h.position(24)
    h.putInt(fileBytes / 2)
    h.order(ByteOrder.LITTLE_ENDIAN)
    h.putInt(1000)                     // version
    h.putInt(5)                        // shape type
    h.putDouble(allX.min); h.putDouble(allY.min)
    h.putDouble(allX.max); h.putDouble(allY.max)
    h.putDouble(0); h.putDouble(0); h.putDouble(0); h.putDouble(0)
    Files.write(shp.toPath, h.array() ++ recordBufs.flatten)

    // ---- .dbf (dBase III, all fields fixed-width character type)
    val fieldLen = 16
    val headerSize = 32 + 32 * fieldNames.size + 1
    val recordSize = 1 + fieldLen * fieldNames.size
    val d = ByteBuffer.allocate(headerSize + recordSize * records.size + 1)
    d.order(ByteOrder.LITTLE_ENDIAN)
    d.put(0x03.toByte); d.put(24.toByte); d.put(1.toByte); d.put(1.toByte)
    d.putInt(records.size)
    d.putShort(headerSize.toShort); d.putShort(recordSize.toShort)
    d.position(32)
    fieldNames.foreach { name =>
      val start = d.position()
      d.put(name.getBytes("US-ASCII").take(10))
      d.position(start + 11)
      d.put('C'.toByte)
      d.position(start + 16)
      d.put(fieldLen.toByte); d.put(0.toByte)
      d.position(start + 32)
    }
    d.put(0x0D.toByte)
    records.foreach { case (_, attrs) =>
      d.put(' '.toByte) // not-deleted flag
      attrs.foreach { v =>
        d.put(v.padTo(fieldLen, ' ').take(fieldLen).getBytes("US-ASCII"))
      }
    }
    d.put(0x1A.toByte)
    Files.write(Paths.get(basePath + ".dbf"), d.array())
  }

  // ------------------------------------------------------------- reader
  /** `ST_Read`: parse `.shp` + `.dbf` into a DataFrame of
    * (geometry WKT, attribute columns — all strings, bronze-style). */
  def read(spark: SparkSession, basePath: String): DataFrame = {
    val shp = ByteBuffer.wrap(Files.readAllBytes(Paths.get(basePath + ".shp")))
    shp.order(ByteOrder.BIG_ENDIAN)
    require(shp.getInt(0) == 9994, s"$basePath.shp: bad file code")
    shp.order(ByteOrder.LITTLE_ENDIAN)
    require(shp.getInt(28) == 1000, s"$basePath.shp: bad version")
    val shapeType = shp.getInt(32)
    require(shapeType == 5, s"$basePath.shp: only Polygon (5) supported, got $shapeType")

    val geoms = Vector.newBuilder[String]
    var pos = 100
    while (pos < shp.capacity()) {
      shp.order(ByteOrder.BIG_ENDIAN)
      val contentWords = shp.getInt(pos + 4)
      shp.order(ByteOrder.LITTLE_ENDIAN)
      val c = pos + 8
      require(shp.getInt(c) == 5, "record shape type != Polygon")
      val numParts = shp.getInt(c + 36)
      val numPoints = shp.getInt(c + 40)
      val partOffsets = (0 until numParts).map(i => shp.getInt(c + 44 + 4 * i))
      val pointsBase = c + 44 + 4 * numParts
      val pts = (0 until numPoints).map { i =>
        Pt(shp.getDouble(pointsBase + 16 * i), shp.getDouble(pointsBase + 16 * i + 8))
      }.toVector
      val rings = partOffsets.zipAll(partOffsets.drop(1), 0, numPoints).map {
        case (from, until) => pts.slice(from, until)
      }.toVector
      // Shapefile winding convention: exterior rings are CLOCKWISE
      // (negative shoelace), holes counter-clockwise. A multi-part
      // record can hold several exteriors (mainland + islands), each
      // followed by its holes — grouping by orientation keeps islands
      // as additional polygons instead of silently subtracting them
      // as holes of the first ring.
      val polys = rings.foldLeft(Vector.empty[Vector[Vector[Pt]]]) {
        (acc, ring) =>
          if (Geo.ringArea(ring) <= 0 || acc.isEmpty) acc :+ Vector(ring)
          else acc.init :+ (acc.last :+ ring)
      }.map(Poly(_))
      geoms += Geo.toWkt(
        if (polys.length == 1) GPolygon(polys.head)
        else Geo.GMultiPolygon(polys))
      pos += 8 + contentWords * 2
    }

    val dbf = ByteBuffer.wrap(Files.readAllBytes(Paths.get(basePath + ".dbf")))
    dbf.order(ByteOrder.LITTLE_ENDIAN)
    require((dbf.get(0) & 0x07) == 0x03, s"$basePath.dbf: not dBase III")
    val numRecords = dbf.getInt(4)
    val headerSize = dbf.getShort(8).toInt
    val recordSize = dbf.getShort(10).toInt
    val fields = Iterator.from(0)
      .map(i => 32 + 32 * i)
      .takeWhile(off => off < headerSize - 1 && dbf.get(off) != 0x0D)
      .map { off =>
        val nameBytes = (0 until 11).map(j => dbf.get(off + j)).takeWhile(_ != 0)
        val name = new String(nameBytes.toArray.map(_.toChar))
        val len = dbf.get(off + 16) & 0xff
        (name, len)
      }.toVector
    val attrs = (0 until numRecords).map { r =>
      val base = headerSize + r * recordSize + 1 // skip deletion flag
      var off = base
      fields.map { case (_, len) =>
        val bytes = new Array[Byte](len)
        (0 until len).foreach(j => bytes(j) = dbf.get(off + j))
        off += len
        new String(bytes, "US-ASCII").trim
      }
    }
    val g = geoms.result()
    require(g.size == numRecords,
      s"$basePath: .shp has ${g.size} records, .dbf has $numRecords")

    val schema = StructType(StructField("geometry", StringType) +:
      fields.map { case (n, _) => StructField(n, StringType) })
    val rows = g.zip(attrs).map { case (wkt, a) => Row.fromSeq(wkt +: a) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  // ------------------------------------------------------------ operator
  /** Census-section-shaped fixture: one rectangle per nation key with
    * CUSEC/CUMUN/CPRO attributes — the same deterministic rectangle
    * parameterization the q_union_centroid oracle already validates, so
    * the geometry math downstream of the codec has proven SQL parity. */
  private[graft] def fixture(spark: SparkSession, sfDir: String): String = {
    val base = s"${graft.etl.Medallion.warehouseBase}/${new File(sfDir).getName}/fixtures/sections_v1"
    if (!new File(base + ".shp").exists()) {
      val keys = graft.Tables.nation(spark, sfDir)
        .select("n_nationkey").orderBy("n_nationkey")
        .collect().map(_.getAs[Number](0).longValue)
      val records = keys.toSeq.map { k =>
        val lon0 = -9.0 + (k % 10) * 1.5
        val lat0 = 36.0 + (k % 7) * 1.1
        val w = 0.5 + (k % 5) * 0.1
        val h = 0.4 + (k % 3) * 0.1
        // closed clockwise ring, per the spec's outer-ring orientation
        val ring = Vector((lon0, lat0), (lon0, lat0 + h), (lon0 + w, lat0 + h),
          (lon0 + w, lat0), (lon0, lat0))
        val attrs = Seq(f"$k%05d", f"${(k * 7) % 100}%05d", f"${k % 52}%02d")
        (Vector(ring), attrs)
      }
      write(base, Seq("CUSEC", "CUMUN", "CPRO"), records)
    }
    base
  }

  /** S3: ST_Read → bronze geometry frame → per-section centroid / area /
    * bbox through the WKT parse + geometry UDFs. The oracle recomputes
    * every number from the key-derived rectangle formulas in plain SQL,
    * so a codec bug anywhere (byte order, ring slicing, dbf widths)
    * breaks the hash. */
  def shapefileScan(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.geo.GeoFunctions.register(spark)
    read(spark, fixture(spark, sfDir))
      .select(col("CUSEC").as("cusec"), col("CUMUN").as("cumun"),
        col("CPRO").as("cpro"),
        round(expr("st_area(geometry)"), 6).as("area"),
        round(expr("st_x(st_centroid(geometry))"), 6).as("cx"),
        round(expr("st_y(st_centroid(geometry))"), 6).as("cy"),
        round(expr("st_xmin(geometry)"), 6).as("xmin"),
        round(expr("st_ymax(geometry)"), 6).as("ymax"))
      .orderBy(col("cusec"))
  }

  private val shapefileScanOracle =
    """SELECT lpad(CAST(n_nationkey AS VARCHAR), 5, '0') AS cusec,
      |       lpad(CAST((n_nationkey * 7) % 100 AS VARCHAR), 5, '0') AS cumun,
      |       lpad(CAST(n_nationkey % 52 AS VARCHAR), 2, '0') AS cpro,
      |       CAST(ROUND(w * h, 6) AS DOUBLE) AS area,
      |       ROUND(lon0 + w / 2, 6) AS cx,
      |       ROUND(lat0 + h / 2, 6) AS cy,
      |       CAST(ROUND(lon0, 6) AS DOUBLE) AS xmin,
      |       CAST(ROUND(lat0 + h, 6) AS DOUBLE) AS ymax
      |FROM (SELECT n_nationkey,
      |             -9.0 + (n_nationkey % 10) * 1.5 AS lon0,
      |             36.0 + (n_nationkey % 7) * 1.1 AS lat0,
      |             0.5 + (n_nationkey % 5) * 0.1 AS w,
      |             0.4 + (n_nationkey % 3) * 0.1 AS h
      |      FROM nation)
      |ORDER BY cusec""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_shapefile_scan" -> (shapefileScan _)
  )

  def oracles: Map[String, String] = Map(
    "q_shapefile_scan" -> shapefileScanOracle
  )
}
