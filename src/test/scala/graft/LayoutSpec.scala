package graft

import graft.etl.Layout

/** The pruning claim behind `q_layout_probe`, checked against the exact
  * metadata a reader prunes with (parquet footer min/max stats): the
  * range-clustered layout confines the probe range to few files, the
  * hash-scattered layout leaks it into every file.
  */
class LayoutSpec extends SparkSpec {

  test("range-clustered files have selective key spans; scattered files do not") {
    Layout.layoutProbe(spark, sfTiny).collect() // writes both layouts

    val scattered = Layout.fileKeyRanges(spark, Layout.scatteredPath(sfTiny))
    val clustered = Layout.fileKeyRanges(spark, Layout.clusteredPath(sfTiny))
    assert(scattered.size == 8 && clustered.size == 8)

    // every scattered file straddles the probe range — nothing prunes
    assert(Layout.probeOverlaps(scattered) == 8,
      s"expected all scattered files to overlap, got ${Layout.probeOverlaps(scattered)}")
    // the clustered layout confines the probe to a small file subset
    val hit = Layout.probeOverlaps(clustered)
    assert(hit <= 3, s"clustered layout should prune most files, $hit/8 overlap")

    // clustered spans are pairwise disjoint (range partitioning), so
    // stats-based skipping is exact, not probabilistic
    val sorted = clustered.sortBy(_._1)
    sorted.zip(sorted.tail).foreach { case ((_, hi), (lo, _)) =>
      assert(hi <= lo, s"overlapping clustered spans: hi=$hi lo=$lo")
    }
  }

  test("z-order confines a rectangle probe's z-interval; scatter does not") {
    Layout.zorderProbe(spark, sfTiny).collect() // writes both layouts

    // monotonicity of the Morton value in each coordinate: every point
    // of the probe rectangle has z inside [z(lo), z(hi)]
    val ((xLo, xHi), (yLo, yHi)) = Layout.ZProbe
    val (zLo, zHi) = (Layout.zValue(xLo, yLo), Layout.zValue(xHi, yHi))
    assert(zLo < zHi)
    def skippable(ranges: Seq[(Long, Long)]): Int =
      ranges.count { case (lo, hi) => hi < zLo || lo > zHi }

    val scatter = Layout.fileZRanges(spark, Layout.zScatteredPath(sfTiny))
    val zorder = Layout.fileZRanges(spark, Layout.zClusteredPath(sfTiny))
    assert(scatter.size == 8 && zorder.size == 8)
    assert(skippable(scatter) == 0,
      s"scatter files should all straddle the z-interval")
    assert(skippable(zorder) >= 4,
      s"z-order should make most files skippable, got ${skippable(zorder)}/8")
  }

  test("hilbert: expression matches the driver fold; fewer curve runs than z-order; footer skipping works") {
    import graft.functions.LayoutExprs

    // expression == driver-side xy2d on a deterministic sample, through
    // the codegen path (whole-stage codegen compiles the emitted loop)
    LayoutExprs.register(spark)
    import spark.implicits._
    val sample = for (x <- 0L until 64L; y <- 0L until 64L)
      yield (x * 16 + 7, y * 16 + 3)
    val got = sample.toDF("x", "y")
      .selectExpr("x", "y", "hilbert_d(x, y) AS h").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    sample.foreach { case (x, y) =>
      assert(got((x, y)) == LayoutExprs.xy2d(x, y), s"hilbert_d($x,$y)")
    }
    // bijectivity on the sample: distinct cells -> distinct positions
    assert(got.values.toSet.size == sample.size, "hilbert_d must be injective")

    // the locality claim, as pure curve math on the probe window:
    // adjacency (every Hilbert step is 4-adjacent) halves the number of
    // contiguous curve runs the rectangle decomposes into
    val ((xLo, xHi), (yLo, yHi)) = Layout.ZProbe
    def runs(vals: Seq[Long]): Int = {
      val s = vals.sorted
      1 + s.zip(s.tail).count { case (a, b) => b != a + 1 }
    }
    val window = for (x <- xLo to xHi; y <- yLo to yHi) yield (x, y)
    val hRuns = runs(window.map { case (x, y) => LayoutExprs.xy2d(x, y) })
    val zRuns = runs(window.map { case (x, y) => Layout.zValue(x, y) })
    assert(hRuns < zRuns,
      s"hilbert should fragment the window less: $hRuns vs $zRuns runs")
    assert(hRuns * 3 < zRuns * 2, // measured 95 vs 188 — pin real margin
      s"expected a ≥1.5x run reduction: $hRuns vs $zRuns")

    // footer-level skipping with the exact window h-set (the page-index
    // test — Hilbert has no corner-interval bound, so point-level is
    // the sound decision procedure)
    Layout.hilbertProbe(spark, sfTiny).collect() // writes both layouts
    val winH = window.map { case (x, y) => LayoutExprs.xy2d(x, y) }.sorted
    def skippableExact(ranges: Seq[(Long, Long)]): Int =
      ranges.count { case (lo, hi) =>
        import scala.collection.Searching._
        winH.search(lo) match {
          case Found(_) => false
          case InsertionPoint(i) => i >= winH.length || winH(i) > hi
        }
      }
    val scatter = Layout.fileHRanges(spark, Layout.hScatteredPath(sfTiny))
    val hilbert = Layout.fileHRanges(spark, Layout.hClusteredPath(sfTiny))
    assert(scatter.size == 8 && hilbert.size == 8)
    assert(skippableExact(scatter) == 0,
      "scatter files should all contain some window cell")
    assert(skippableExact(hilbert) >= 4,
      s"hilbert should make most files skippable, got ${skippableExact(hilbert)}/8")
  }

  test("parquet footer audit: per-column chunk walk is self-consistent") {
    import org.apache.spark.sql.functions._
    val rows = Layout.parquetFooterAudit(spark, sfTiny).collect()
    val nDocs = Tables.documents(spark, sfTiny).count()
    val cols = Tables.documents(spark, sfTiny).columns.toSet
    assert(rows.map(_.getString(0)).toSet == cols,
      "audit must cover exactly the table's columns")
    rows.foreach { r =>
      // flat schema, no nulls skipped: every column chunk holds one
      // value per row
      assert(r.getLong(1) == nDocs, s"${r.getString(0)} value count")
      assert(r.getLong(2) > 0 && r.getLong(3) > 0)
    }
    // the text column must dominate the byte mass and compress
    val text = rows.find(_.getString(0) == "text").get
    assert(text.getLong(2) == rows.map(_.getLong(2)).max)
    assert(text.getLong(2) < text.getLong(3), "text column didn't compress")
  }
}
