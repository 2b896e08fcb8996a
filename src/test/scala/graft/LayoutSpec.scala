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
}
