package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{Ev, Session}

/** Structured Streaming semantics, driven through MemoryStream:
  * the windowed aggregate must equal the batch aggregation of the same
  * rows once the watermark closes the windows, and the sessionizer must
  * split/emit on the inactivity gap both in-batch and via event-time
  * timeout.
  */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermarked hourly aggregation matches the batch rollup after windows close") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    val events = input.toDF()
    val q = StreamingOps.hourlyTrips(events, "1 hour")
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("append").start()
    try {
      val batch1 = Seq(
        Ev(1, ts("2024-01-01 10:05:00"), 2.0),
        Ev(2, ts("2024-01-01 10:20:00"), 3.0),
        Ev(51, ts("2024-01-01 10:40:00"), 5.0), // user 51 -> zone Z001 too
        Ev(1, ts("2024-01-01 11:10:00"), 7.0))
      input.addData(batch1: _*)
      q.processAllAvailable()
      // push the watermark past 11:00+1h so the 10:00 window closes
      input.addData(Ev(3, ts("2024-01-01 13:30:00"), 1.0))
      q.processAllAvailable()

      val streamed = spark.table("hourly_out")
        .filter(col("hour_start") === ts("2024-01-01 10:00:00"))
        .orderBy("origin_zone")
        .collect().map(r => (r.getString(1), r.getDouble(2), r.getLong(3)))
      // batch twin over the same rows
      val batch = batch1.toDF()
        .filter(col("ts") < ts("2024-01-01 11:00:00"))
        .groupBy(concat(lit("Z"),
          lpad(pmod(col("user_id"), lit(50)).cast("string"), 3, "0")).as("z"))
        .agg(sum("value").as("trips"), count(lit(1)).as("n"))
        .orderBy("z")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      assert(streamed.toSeq == batch.toSeq,
        s"stream ${streamed.toSeq} != batch ${batch.toSeq}")
      // users 1 and 51 both map to zone Z001: 2.0 + 5.0
      assert(streamed.toSeq == Seq(("Z001", 7.0, 2L), ("Z002", 3.0, 1L)))
    } finally q.stop()
  }

  test("native session_window stream equals the batch session_window twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    val q = StreamingOps.sessionWindowStream(input.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("sess_win_out")
      .outputMode("append").start()
    try {
      val rows = Seq(
        Ev(1, ts("2024-01-01 10:00:00"), 1.0),
        Ev(1, ts("2024-01-01 10:30:00"), 2.0),  // EXACTLY 30m -> still merges
        Ev(1, ts("2024-01-01 11:00:01"), 4.0),  // 30m01s -> NEW session
        Ev(2, ts("2024-01-01 10:05:00"), 8.0))
      input.addData(rows: _*)
      q.processAllAvailable()
      // advance the watermark far past every session end so all emit
      input.addData(Ev(9, ts("2024-01-01 14:00:00"), 0.0))
      q.processAllAvailable()

      val streamed = spark.table("sess_win_out")
        .filter(col("user_id") < 9)
        .orderBy("user_id", "session_start")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4)))
      val batch = rows.toDF()
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"), sum("value").as("v"))
        .select(col("user_id"), col("session_window.start"),
          col("session_window.end"), col("n"), col("v"))
        .orderBy("user_id", "session_window.start")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4)))
      assert(streamed.toSeq == batch.toSeq,
        s"stream ${streamed.toSeq} != batch ${batch.toSeq}")
      // the merge boundary is INCLUSIVE (break only at diff > gap):
      // the exact-30m event merged, the 30m01s event opened session 2
      assert(streamed.count(_._1 == 1L) == 2)
      assert(streamed.find(_._1 == 1L).get._4 == 2L,
        "exact-gap event must merge into the first session")
    } finally q.stop()
  }

  test("sessionizer splits on the gap in-batch and emits via event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    val q = StreamingOps.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // user 7: two bursts separated by >30min inside ONE batch -> the
      // first session closes immediately when the second burst arrives.
      input.addData(
        Ev(7, ts("2024-01-01 10:00:00"), 1.0),
        Ev(7, ts("2024-01-01 10:10:00"), 2.0),
        Ev(7, ts("2024-01-01 11:00:00"), 4.0))
      q.processAllAvailable()
      val afterBatch = spark.table("sessions_out").as[Session].collect()
      assert(afterBatch.toSeq == Seq(
        Session(7, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2, 3.0)))

      // advance the watermark far enough (wm = max ts - 10min must pass
      // last + gap) for the open session's event-time timeout to fire.
      input.addData(Ev(9, ts("2024-01-01 12:00:00"), 1.0))
      q.processAllAvailable()
      input.addData(Ev(9, ts("2024-01-01 12:01:00"), 1.0))
      q.processAllAvailable()

      val sessions = spark.table("sessions_out").as[Session].collect()
        .filter(_.user_id == 7).sortBy(_.session_start.getTime)
      assert(sessions.toSeq == Seq(
        Session(7, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2, 3.0),
        Session(7, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:00:00"), 1, 4.0)),
        s"got ${sessions.toSeq}")
    } finally q.stop()
  }

  test("streaming EWMA state equals the batch fold over ordered batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    val q = StreamingOps.ewmaStream(input.toDS())
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("update").start()
    try {
      def fold(vs: Seq[Double]) =
        vs.tail.foldLeft(vs.head)((a, v) => a + 0.25 * (v - a))
      // batch 1: user 1 out-of-order WITHIN the batch (must sort), user 2
      input.addData(
        Ev(1, ts("2024-01-01 10:05:00"), 20.0),
        Ev(1, ts("2024-01-01 10:00:00"), 10.0),
        Ev(2, ts("2024-01-01 10:00:00"), 5.0))
      q.processAllAvailable()
      val mid = spark.table("ewma_out").as[StreamingOps.EwmaOut].collect()
        .filter(r => r.user_id == 1L && r.n_events == 2L)
      assert(mid.nonEmpty, "no update emitted for user 1 after batch 1")
      assert(math.abs(mid.head.ewma - fold(Seq(10.0, 20.0))) < 1e-12,
        "mid-stream state wrong")
      // batch 2 continues each user's recurrence from held state
      input.addData(
        Ev(1, ts("2024-01-01 10:10:00"), 30.0),
        Ev(2, ts("2024-01-01 10:10:00"), 7.0))
      q.processAllAvailable()
      val fin = spark.table("ewma_out").as[StreamingOps.EwmaOut].collect()
        .groupBy(_.user_id).view.mapValues(_.maxBy(_.n_events)).toMap
      assert(fin(1L).n_events == 3L)
      assert(math.abs(fin(1L).ewma - fold(Seq(10.0, 20.0, 30.0))) < 1e-12,
        s"user 1 final ${fin(1L).ewma}")
      assert(fin(2L).n_events == 2L)
      assert(math.abs(fin(2L).ewma - fold(Seq(5.0, 7.0))) < 1e-12,
        s"user 2 final ${fin(2L).ewma}")
    } finally q.stop()
  }

  test("streaming prefix-cache radix state rolls up to the batch census") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{PcOut, PcPrompt}

    val prompts = Tables.documents(spark, sfTiny)
      .selectExpr("doc_id", "text").as[PcPrompt].collect().sortBy(_.doc_id)
    val input = MemoryStream[PcPrompt]
    val q = StreamingOps.prefixCacheStream(input.toDS())
      .writeStream.format("memory").queryName("pc_out")
      .outputMode("update").start()
    try {
      prompts.grouped(7).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      // the latest update per (k, prefix) IS the final radix node
      // table; its per-level rollup must equal the batch census
      val entries = spark.table("pc_out").as[PcOut].collect()
        .groupBy(e => (e.k, e.prefix)).view.mapValues(_.maxBy(_.cnt))
        .values.toSeq
      val streamed = entries.groupBy(_.k).toSeq.map { case (k, es) =>
        (k, es.map(_.cnt).sum, es.size.toLong,
          es.map(_.n_hits).sum, es.map(_.n_hits).sum * k,
          es.map(_.cnt).max)
      }.sortBy(_._1)
      val batch = graft.ops.TextOps.prefixCache(spark, sfTiny).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSeq
      assert(streamed == batch, s"stream $streamed != batch $batch")
      // online semantics: a re-arriving prefix HIT, not a new node —
      // hits strictly below prompts at every level with sharing
      assert(streamed.forall { case (_, n, p, h, _, _) => h == n - p })
    } finally q.stop()
  }

  test("streaming Holt-Winters converges to the batch fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{HwEv, HwOut}

    // the full sfTiny event log in 2 arrival waves split by DAY (first
    // 10 days, then the rest): wave 1 leaves every type inside the
    // two-season warm-up, wave 2 completes the series — n_days grows
    // strictly, so "latest update" is well-defined by maxBy(n_days)
    val evs = Tables.events(spark, sfTiny)
      .selectExpr("event_type", "ts", "value").as[HwEv].collect()
    val day0 = evs.map(_.ts.getTime / 86400000L).min
    val input = MemoryStream[HwEv]
    val q = StreamingOps.holtWintersStream(input.toDS())
      .writeStream.format("memory").queryName("hw_out")
      .outputMode("update").start()
    try {
      input.addData(evs.filter(_.ts.getTime / 86400000L < day0 + 10).toSeq)
      q.processAllAvailable()
      val mid = spark.table("hw_out").as[HwOut].collect()
      assert(mid.nonEmpty, "no update after wave 1")
      assert(mid.forall(_.mae_uc == -1L),
        "10 days must still be inside the two-season warm-up")
      input.addData(evs.filter(_.ts.getTime / 86400000L >= day0 + 10).toSeq)
      q.processAllAvailable()
      val got = spark.table("hw_out").as[HwOut].collect()
        .groupBy(_.event_type)
        .map { case (t, os) => t -> os.maxBy(_.n_days) } // days only grow
      val want = graft.ops.StatsOps.holtWinters(spark, sfTiny).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      assert(got.keySet == want.keySet, s"type sets differ")
      for ((t, g) <- got) {
        val w = want(t)
        assert((g.n_days, g.level_uc, g.trend_uc, g.forecast_uc, g.mae_uc)
          == w, s"$t: stream ${g} != batch $w")
      }
    } finally q.stop()
  }

  test("streaming SFT assembly converges to the batch relational assembler") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.ChatEv
    import graft.ops.ChatOps

    // the full sfTiny event log, split into 3 arrival waves by
    // event_id % 3 — every conversation's messages arrive OUT of
    // event order across micro-batches
    val evs = Tables.events(spark, sfTiny)
      .selectExpr("user_id", "ts", "event_id", "event_type", "value")
      .as[ChatEv].collect()
    val input = MemoryStream[ChatEv]
    val q = StreamingOps.sftAssemblyStream(input.toDS())
      .writeStream.format("memory").queryName("sft_out")
      .outputMode("update").start()
    try {
      for (wave <- 0 until 3) {
        input.addData(evs.filter(_.event_id % 3 == wave).toSeq)
        q.processAllAvailable()
      }
      // last update per conversation == the batch assembler's row
      val got = spark.table("sft_out").as[ChatOps.ConvOut].collect()
        .groupBy(c => (c.user_id, c.day.toString))
        .map { case (k, cs) => k -> cs.maxBy(_.raw_turns) } // state only grows
      val want = ChatOps.sftAssembly(spark, sfTiny).collect()
        .map(r => ((r.getLong(0), r.getDate(1).toString), r)).toMap
      assert(got.keySet == want.keySet,
        s"conversation sets differ: ${got.size} vs ${want.size}")
      for ((k, g) <- got) {
        val w = want(k)
        assert(g.raw_turns == w.getLong(2) && g.merged_turns == w.getLong(3)
          && g.total_tokens == w.getLong(4), s"census at $k")
        assert(g.kept_turns == w.getLong(5) && g.kept_tokens == w.getLong(6)
          && g.loss_tokens == w.getLong(7), s"kept at $k")
        assert(g.lead_dropped == w.getLong(8), s"lead-drop at $k")
        assert(g.template_md5 == Option(w.getString(9)), s"template at $k")
      }
      // mid-stream updates were genuinely partial: at least one
      // conversation's final row differs from an earlier update
      val anyEvolved = spark.table("sft_out").as[ChatOps.ConvOut].collect()
        .groupBy(c => (c.user_id, c.day.toString))
        .exists(_._2.map(_.raw_turns).distinct.size > 1)
      assert(anyEvolved, "no conversation grew across waves")
    } finally q.stop()
  }

  test("streaming Misra-Gries: majority survives across batches within the MG bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{MgEv, MgOut}

    val input = MemoryStream[MgEv]
    val q = StreamingOps.mgStream(input.toDS(), k = 4)
      .writeStream.format("memory").queryName("mg_out")
      .outputMode("update").start()
    try {
      // item 7 is a true heavy hitter (freq 20/50 > n/(k+1) = 10);
      // noise items 100..129 appear once each, split across batches
      val b1 = Seq.fill(12)(7L) ++ (100L until 115L)
      val b2 = Seq.fill(8)(7L) ++ (115L until 130L)
      input.addData(b1.map(MgEv("a", _)): _*)
      q.processAllAvailable()
      input.addData(b2.map(MgEv("a", _)): _*)
      q.processAllAvailable()
      val fin = spark.table("mg_out").as[MgOut].collect().maxBy(_.n_seen)
      assert(fin.n_seen == 50L, s"event accounting: $fin")
      assert(fin.n_candidates <= 4L, s"state exceeded k: $fin")
      // the guarantee: 7 survives as top with count >= truth - n/(k+1)
      assert(fin.top_item == 7L, s"heavy hitter evicted: $fin")
      assert(fin.top_cnt >= 20L - 50L / 5 && fin.top_cnt <= 20L,
        s"MG bound violated: $fin")
    } finally q.stop()
  }

  test("streaming weighted reservoir converges to the batch sample exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{WrEv, WrOut}

    val docs = Tables.documents(spark, sfTiny)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .collect().map(r => WrEv(r.getString(0), r.getLong(1), r.getLong(2)))
    val input = MemoryStream[WrEv]
    val q = StreamingOps.weightedReservoirStream(input.toDS())
      .writeStream.format("memory").queryName("wr_out")
      .outputMode("update").start()
    try {
      docs.grouped(120).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      // last emit per source (max n_seen) == the batch query
      val fin = spark.table("wr_out").as[WrOut].collect()
        .groupBy(_.source).map { case (_, rs) => rs.maxBy(_.n_seen) }
      val streamed = fin.flatMap(o => o.members.zip(o.wts).zipWithIndex
        .map { case ((id, w), i) => (o.source, i + 1, id, w) }).toSet
      val batch = graft.ops.PipelineOps.weightedReservoir(spark, sfTiny)
        .collect().map(r => (r.getString(0), r.getInt(1),
          r.getLong(2), r.getLong(3))).toSet
      assert(streamed == batch,
        s"stream ${streamed.size} != batch ${batch.size}")
      // per-source accounting: every doc was seen
      assert(fin.map(_.n_seen).sum == docs.length)
    } finally q.stop()
  }

  test("streaming Welford moments equal the two-pass mean/variance across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{MomEv, MomOut}

    val input = MemoryStream[MomEv]
    val q = StreamingOps.momentsStream(input.toDS())
      .writeStream.format("memory").queryName("mom_out")
      .outputMode("update").start()
    try {
      def twoPass(vs: Seq[Double]): (Double, Double) = {
        val m = vs.sum / vs.size
        (m, if (vs.size > 1) vs.map(v => (v - m) * (v - m)).sum / (vs.size - 1)
            else 0.0)
      }
      val b1 = Seq(10.0, 12.5, 9.25); val b2 = Seq(1e6, 1e6 + 0.5)
      input.addData(b1.map(MomEv("a", _)): _*)
      input.addData(b2.map(MomEv("b", _)): _*)
      q.processAllAvailable()
      // batch 2: both keys continue from held state; key b's large mean
      // with tiny variance is the catastrophic-cancellation regime the
      // Welford form exists for
      input.addData(MomEv("a", 11.0), MomEv("b", 1e6 + 0.25))
      q.processAllAvailable()
      val fin = spark.table("mom_out").as[MomOut].collect()
        .groupBy(_.t).view.mapValues(_.maxBy(_.n)).toMap
      val (ma, va) = twoPass(b1 :+ 11.0)
      val (mb, vb) = twoPass(b2 :+ (1e6 + 0.25))
      assert(fin("a").n == 4 && math.abs(fin("a").mean - ma) < 1e-9 &&
        math.abs(fin("a").var_samp - va) < 1e-9, s"key a: ${fin("a")}")
      assert(fin("b").n == 3 && math.abs(fin("b").mean - mb) < 1e-6 &&
        math.abs(fin("b").var_samp - vb) < 1e-6, s"key b: ${fin("b")}")
    } finally q.stop()
  }

  test("streaming CDC apply: LSN wins over arrival order, tombstones compact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{CdcEv, CdcOut}

    val input = MemoryStream[CdcEv]
    val q = StreamingOps.cdcApplyStream(input.toDS())
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode("update").start()
    try {
      def latest() = spark.table("cdc_out").as[CdcOut].collect()
        .groupBy(_.user_id).view.mapValues(_.maxBy(_.n_ops)).toMap
      // batch 1: user 1 out-of-order WITHIN the batch (LSN 5 then 3 —
      // 3 must NOT regress the snapshot); user 2 upsert then tombstone
      input.addData(
        CdcEv(1L, 5L, "U", 1200L), CdcEv(1L, 3L, "U", 900L),
        CdcEv(2L, 1L, "U", 500L), CdcEv(2L, 2L, "D", 0L))
      q.processAllAvailable()
      val mid = latest()
      assert(mid(1L).last_lsn == 5L && mid(1L).live &&
        math.abs(mid(1L).value - 12.0) < 1e-12, s"user 1 mid ${mid(1L)}")
      assert(mid(2L).last_lsn == 2L && !mid(2L).live, s"user 2 mid ${mid(2L)}")
      // batch 2: a LATE change for user 1 (LSN 4 < held 5) deepens the
      // log but keeps the snapshot; user 2 is resurrected by LSN 6
      input.addData(CdcEv(1L, 4L, "U", 9999L), CdcEv(2L, 6L, "U", 700L))
      q.processAllAvailable()
      val fin = latest()
      assert(fin(1L).last_lsn == 5L && fin(1L).n_ops == 3L &&
        math.abs(fin(1L).value - 12.0) < 1e-12,
        s"late LSN regressed the snapshot: ${fin(1L)}")
      assert(fin(2L).live && fin(2L).last_lsn == 6L &&
        math.abs(fin(2L).value - 7.0) < 1e-12, s"user 2 fin ${fin(2L)}")
    } finally q.stop()
  }

  test("streaming token bucket: clamp, rejection, and state carry across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[StreamingOps.TbEv]
    val q = StreamingOps.tokenBucketStream(input.toDS(), cap = 5L)
      .writeStream.format("memory").queryName("tb_out")
      .outputMode("update").start()
    try {
      // batch 1: user 1 refills 9 (clamps at cap 5), spends twice —
      // the refill arrives out of order WITHIN the batch and must fold
      // first; user 2 spends on an empty bucket → rejected
      input.addData(
        StreamingOps.TbEv(1, ts("2024-01-01 10:01:00"), 11L, "click", 0.0),
        StreamingOps.TbEv(1, ts("2024-01-01 10:00:00"), 10L, "purchase", 9.9),
        StreamingOps.TbEv(1, ts("2024-01-01 10:02:00"), 12L, "view", 0.0),
        StreamingOps.TbEv(2, ts("2024-01-01 10:00:00"), 13L, "click", 0.0))
      q.processAllAvailable()
      def latest() = spark.table("tb_out").as[StreamingOps.TbOut].collect()
        .groupBy(_.user_id).view
        .mapValues(_.maxBy(o => o.n_refills + o.n_spends)).toMap
      val mid = latest()
      assert(mid(1L) == StreamingOps.TbOut(1L, 3L, 5L, 0L, 1L, 2L),
        s"user 1 after batch 1: ${mid(1L)}")
      assert(mid(2L) == StreamingOps.TbOut(2L, 0L, 0L, 1L, 0L, 1L),
        s"user 2 after batch 1: ${mid(2L)}")
      // batch 2: user 1's balance CARRIES (3 → spends to 0, 4th spend
      // rejected); user 2 refills then spends
      input.addData(
        StreamingOps.TbEv(1, ts("2024-01-01 10:10:00"), 20L, "click", 0.0),
        StreamingOps.TbEv(1, ts("2024-01-01 10:11:00"), 21L, "click", 0.0),
        StreamingOps.TbEv(1, ts("2024-01-01 10:12:00"), 22L, "view", 0.0),
        StreamingOps.TbEv(1, ts("2024-01-01 10:13:00"), 23L, "view", 0.0),
        StreamingOps.TbEv(2, ts("2024-01-01 10:10:00"), 24L, "purchase", 2.0),
        StreamingOps.TbEv(2, ts("2024-01-01 10:11:00"), 25L, "click", 0.0))
      q.processAllAvailable()
      val fin = latest()
      assert(fin(1L) == StreamingOps.TbOut(1L, 0L, 5L, 1L, 1L, 6L),
        s"user 1 final: ${fin(1L)}")
      assert(fin(2L) == StreamingOps.TbOut(2L, 1L, 2L, 1L, 1L, 2L),
        s"user 2 final: ${fin(2L)}")
    } finally q.stop()
  }

  test("streaming attribution credits purchases against the held touch across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[StreamingOps.TouchEv]
    val q = StreamingOps.attributionStream(input.toDS())
      .writeStream.format("memory").queryName("attrib_out")
      .outputMode("append").start()
    try {
      // batch 1: user 1's purchase arrives out of order WITHIN the
      // batch (before its click in arrival order, after in event time)
      // → credit goes to the click; user 2 purchases with NO prior
      // touch → 'direct'
      input.addData(
        StreamingOps.TouchEv(1, ts("2024-01-01 10:05:00"), "purchase", 40.0),
        StreamingOps.TouchEv(1, ts("2024-01-01 10:00:00"), "click", 0.0),
        StreamingOps.TouchEv(2, ts("2024-01-01 10:00:00"), "purchase", 9.0))
      q.processAllAvailable()
      val mid = spark.table("attrib_out").as[StreamingOps.Credit].collect()
      assert(mid.length == 2)
      assert(mid.find(_.user_id == 1L).get.channel == "click")
      assert(mid.find(_.user_id == 2L).get.channel == "direct")
      // batch 2: user 1's touch carries ACROSS batches (view updates
      // it, then purchase credits the view); user 2's touch state was
      // never set, so another purchase stays 'direct'
      input.addData(
        StreamingOps.TouchEv(1, ts("2024-01-01 10:20:00"), "view", 0.0),
        StreamingOps.TouchEv(1, ts("2024-01-01 10:25:00"), "purchase", 60.0),
        StreamingOps.TouchEv(2, ts("2024-01-01 10:30:00"), "purchase", 3.0))
      q.processAllAvailable()
      val fin = spark.table("attrib_out").as[StreamingOps.Credit].collect()
      assert(fin.length == 4)
      val u1 = fin.filter(_.user_id == 1L).sortBy(_.ts.getTime)
      assert(u1.map(_.channel).toSeq == Seq("click", "view"))
      assert(u1.map(_.value).toSeq == Seq(40.0, 60.0))
      assert(fin.filter(_.user_id == 2L).forall(_.channel == "direct"))
      // the aggregated credit stream equals the batch operator's shape:
      // conversions conserved per channel
      val byChannel = fin.groupBy(_.channel).view.mapValues(_.length).toMap
      assert(byChannel == Map("click" -> 1, "view" -> 1, "direct" -> 2))
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch join over the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val views = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val q = StreamingOps.streamStreamJoin(views.toDF(), buys.toDF())
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      val vRows = Seq(
        Ev(1, ts("2024-01-01 10:00:00"), 1.0),
        Ev(1, ts("2024-01-01 10:30:00"), 2.0),
        Ev(1, ts("2024-01-01 08:00:00"), 4.0), // > 1h before the buy — excluded
        Ev(2, ts("2024-01-01 10:10:00"), 8.0)) // other user
      val bRows = Seq(Ev(1, ts("2024-01-01 10:45:00"), 16.0))
      views.addData(vRows: _*)
      buys.addData(bRows: _*)
      q.processAllAvailable()

      val streamed = spark.table("ssj_out")
        .select("user_id", "view_ts", "pair_value").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
        .sortBy(_._2.getTime).toSeq
      // inner stream-stream join emits on match; both in-window views
      // of user 1 pair with the buy, nothing else
      assert(streamed == Seq(
        (1L, ts("2024-01-01 10:00:00"), 17.0),
        (1L, ts("2024-01-01 10:30:00"), 18.0)), s"got $streamed")
      // equals the batch twin over the same rows
      val batch = vRows.toDF().alias("v")
        .join(bRows.toDF().alias("b"),
          org.apache.spark.sql.functions.expr(
            "v.user_id = b.user_id AND v.ts <= b.ts AND v.ts >= b.ts - INTERVAL 1 HOUR"))
        .count()
      assert(batch == streamed.size.toLong)
    } finally q.stop()
  }

  test("streaming HTML extraction equals the batch front door per arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("text")).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val pages = input.toDF().toDF("doc_id", "text")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        (id, graft.ops.HtmlOps.synthPage(id, t))
      })
      .toDF("doc_id", "html")
    val q = StreamingOps.htmlExtractStream(pages)
      .writeStream.format("memory").queryName("html_out")
      .outputMode("append").start()
    try {
      docs.grouped(7).foreach { chunk => // several micro-batches
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("html_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getInt(4), r.getString(5), r.getBoolean(6))).sortBy(_._1).toSeq
      val batch = graft.ops.HtmlOps.htmlExtract(spark, sfTiny).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getInt(4), r.getString(5), r.getBoolean(6))).sortBy(_._1).toSeq
      assert(streamed == batch,
        s"stream ${streamed.size} rows != batch ${batch.size}")
      assert(streamed.size == docs.length)
    } finally q.stop()
  }

  test("streaming front door: wire bytes to quality-gated text in one chain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("text")).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // wire bytes: the full synthetic page, class-mangled per id by the
    // SAME generator q_encoding_repair pins (an ASCII page means every
    // class must repair to the identical page — truncation drops only
    // the dangling lead)
    val input = MemoryStream[(Long, String)]
    val raw = input.toDF().toDF("doc_id", "text")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val page = graft.ops.HtmlOps.synthPage(id, t)
        val b = (id % 4) match {
          case 3 => page.getBytes("UTF-8") :+ 0xc3.toByte
          case _ => page.getBytes("UTF-8")
        }
        (id, b)
      })
      .toDF("doc_id", "raw")
    val q = StreamingOps.frontDoorStream(raw)
      .writeStream.format("memory").queryName("front_door_out")
      .outputMode("append").start()
    try {
      docs.grouped(7).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("front_door_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getInt(4), r.getString(5), r.getBoolean(6))).sortBy(_._1).toSeq
      val batch = graft.ops.HtmlOps.htmlExtract(spark, sfTiny).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getInt(4), r.getString(5), r.getBoolean(6))).sortBy(_._1).toSeq
      assert(streamed == batch,
        s"stream ${streamed.size} rows != batch ${batch.size}")
      assert(streamed.size == docs.length)
    } finally q.stop()
  }

  test("streaming WARC chain: container files to quality-gated text") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // one WARC per 25-doc group, built by the batch fixture generator
    val files = graft.ops.HtmlOps.synthWarcFrame(spark, sfTiny)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingOps.warcFrontDoorStream(
      input.toDF().toDF("file_id", "warc"))
      .writeStream.format("memory").queryName("warc_front_out")
      .outputMode("append").start()
    try {
      files.grouped(3).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("warc_front_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getInt(4), r.getString(5), r.getBoolean(6))).sortBy(_._1).toSeq
      // the container chain must land EXACTLY where the page-level
      // batch front door lands: same docs, same tallies, same text,
      // same verdicts
      val batch = graft.ops.HtmlOps.htmlExtract(spark, sfTiny).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getInt(4), r.getString(5), r.getBoolean(6))).sortBy(_._1).toSeq
      assert(streamed == batch,
        s"stream ${streamed.size} rows != batch ${batch.size}")
    } finally q.stop()
  }

  test("streaming CDX ledger sorted at read time equals the batch index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val files = graft.ops.HtmlOps.synthWarcFrame(spark, sfTiny)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingOps.cdxStream(input.toDF().toDF("file_id", "warc"))
      .writeStream.format("memory").queryName("cdx_out")
      .outputMode("append").start()
    try {
      files.grouped(4).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getString(6))
      val streamed = spark.table("cdx_out").collect().map(key)
        .sortBy(t => (t._1, t._3)).toSeq
      val batch = graft.ops.HtmlOps.cdxIndex(spark, sfTiny)
        .collect().map(key).toSeq
      assert(streamed == batch,
        s"stream ${streamed.size} rows != batch ${batch.size}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming gzip member ledger rolls up to the batch census") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val files = graft.ops.HtmlOps.synthGzipFrame(spark, sfTiny)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingOps.gzipMembersStream(
      input.toDF().toDF("file_id", "gz"))
      .writeStream.format("memory").queryName("gzip_members_out")
      .outputMode("append").start()
    try {
      files.grouped(2).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      // per-member ledger rolled up per file equals the batch query
      val streamed = spark.table("gzip_members_out")
        .groupBy(col("file_id"))
        .agg(count(lit(1)).as("n"),
          sum(when(!col("crc_ok"), 1L).otherwise(0L)).as("bad"),
          sum(col("raw_len")).as("raw"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      val batch = graft.ops.HtmlOps.gzipMembers(spark, sfTiny).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
        .sortBy(_._1).toSeq
      assert(streamed == batch,
        s"stream ${streamed.size} files != batch ${batch.size}")
    } finally q.stop()
  }

  test("streaming crawl funnel ledger rolls up to the batch funnel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = s"${graft.etl.Medallion.warehouseBase}/test/crawl_funnel_stream"
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(basePath, true)

    // the standing eval-gram set (the benchmark is fixed state, like
    // decontamStream's) — built once from the same fixture corpus the
    // batch funnel derives its eval split from
    val evalGrams = graft.ops.HtmlOps.crawlGrams(
        graft.ops.HtmlOps.crawlFunnelPerDoc(
          graft.ops.HtmlOps.synthWarcWireFrame(spark, sfTiny))
          .filter(col("is_eval")))
      .select(col("gram")).distinct().localCheckpoint(true)

    val files = graft.ops.HtmlOps.synthWarcWireFrame(spark, sfTiny)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingOps.crawlFunnelStream(
      input.toDF().toDF("file_id", "warc"), evalGrams, base)
    try {
      files.grouped(3).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      // read-time rollup of the accumulated per-doc verdict ledger ==
      // the one-shot batch funnel over the same corpus, column by column
      val streamed = graft.ops.HtmlOps.crawlFunnelRollup(
        spark.read.parquet(base)).collect().map(_.toSeq).toSeq
      val batch = graft.ops.HtmlOps.crawlFunnel(spark, sfTiny)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"stream $streamed != batch $batch")
      // the ledger text column never materializes — narrow rows only
      assert(!spark.read.parquet(base).columns.contains("text"))
      // at-least-once idempotence: a foreachBatch retry re-appends
      // byte-identical verdict rows; the rollup's doc_id dedup must
      // make the doubled ledger roll up to the same funnel
      val ledger = spark.read.parquet(base)
      val replayed = graft.ops.HtmlOps.crawlFunnelRollup(
        ledger.unionAll(ledger)).collect().map(_.toSeq).toSeq
      assert(replayed == batch,
        s"replayed ledger double-counted: $replayed != $batch")
    } finally q.stop()
  }

  test("streaming decontamination ledger equals the batch graded screen") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = s"${graft.etl.Medallion.warehouseBase}/test/decontam_stream"
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(basePath, true)

    val docs = Tables.documents(spark, sfTiny)
    val evalGrams = graft.ops.PipelineOps
      .decontamEvalGrams(docs.filter(col("doc_id") % 10 === 7))
      .localCheckpoint(true)
    val train = docs.filter(col("doc_id") % 10 =!= 7)
      .select(col("doc_id"), col("source"), col("text"))

    val input = MemoryStream[(Long, String, String)]
    val q = StreamingOps.decontamStream(
      input.toDF().toDF("doc_id", "source", "text"), evalGrams, base)
    try {
      val arrivals = train.as[(Long, String, String)].collect().sortBy(_._1)
      arrivals.grouped(97).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      val ledger = spark.read.parquet(base).collect()
        .map(r => (r.getLong(0), r.getString(5))).sorted.toSeq
      val batch = graft.ops.PipelineOps
        .decontamClassFrame(train, evalGrams).collect()
        .map(r => (r.getLong(0), r.getString(5))).sorted.toSeq
      assert(ledger == batch,
        s"ledger ${ledger.size} rows != batch ${batch.size}")
      // the stream actually saw both nonclean classes
      assert(ledger.map(_._2).toSet == Set("clean", "partial", "contaminated"))
    } finally q.stop()
  }

  test("streaming NB scoring equals batch inference against the materialized model") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = s"${graft.etl.Medallion.warehouseBase}/test/nb_stream"
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(basePath, true)

    val heldOut = Tables.documents(spark, sfTiny)
      .filter(col("doc_id") % 5 === 4)
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[(Long, String, String)]
    val q = StreamingOps.nbScoreStream(
      input.toDF().toDF("doc_id", "lang", "text"), sfTiny, s"$base/ledger")
    try {
      heldOut.grouped(9).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.read.parquet(s"$base/ledger").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1).toSeq
      // batch twin: the same scoring definition over the same split,
      // aggregated — so per-doc predictions must agree row-for-row
      val (model, counts) = graft.ops.CurationOps.nbModel(spark, sfTiny)
      val batch = graft.ops.CurationOps.nbScoreFrame(
        Tables.documents(spark, sfTiny).filter(col("doc_id") % 5 === 4),
        model, counts).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1).toSeq
      assert(streamed == batch,
        s"stream ${streamed.size} predictions != batch ${batch.size}")
      assert(streamed.size == heldOut.length)
      // and the ledger's confusion rollup equals q_nb_infer exactly
      val conf = streamed.groupBy(t => (t._2, t._3)).view
        .mapValues(_.size.toLong).toMap
      val infer = graft.ops.CurationOps.nbInfer(spark, sfTiny).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(conf == infer)
    } finally q.stop()
  }

  test("streaming conformal serving ledger rolls up to the batch scoreboard") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = s"${graft.etl.Medallion.warehouseBase}/test/conformal_stream"
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(basePath, true)

    val testDocs = Tables.documents(spark, sfTiny)
      .filter(col("doc_id") % 10 === 9)
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[(Long, String, String)]
    val q = StreamingOps.conformalStream(
      input.toDF().toDF("doc_id", "lang", "text"), sfTiny, s"$base/ledger")
    try {
      testDocs.grouped(7).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      val led = spark.read.parquet(s"$base/ledger")
      // per-doc set sizes and coverage must equal the batch scorer
      val streamed = led.collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("set_size"),
          r.getAs[Long]("covered"))).sortBy(_._1).toSeq
      val batch = graft.ops.CurationOps.conformalScoreBatch(
        Tables.documents(spark, sfTiny).filter(col("doc_id") % 10 === 9),
        sfTiny).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("set_size"),
          r.getAs[Long]("covered"))).sortBy(_._1).toSeq
      assert(streamed == batch,
        s"stream ${streamed.size} rows != batch ${batch.size}")
      // and the ledger rollup equals the q_conformal scoreboard
      val want = graft.ops.CurationOps.conformal(spark, sfTiny)
        .collect().head
      assert(streamed.size.toLong == want.getLong(2))
      assert(streamed.map(_._2).sum == want.getLong(3))
      assert(streamed.map(_._3).sum == want.getLong(5))
    } finally q.stop()
  }

  test("streaming ANN serving ledger equals the batch q_ann_ivf row-for-row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = s"${graft.etl.Medallion.warehouseBase}/test/ann_serve_stream"
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(basePath, true)

    // the batch query's own 5 query vectors, arriving in two waves —
    // the standing index must serve both waves without re-training
    val qVecs = Tables.embeddings(spark, sfTiny)
      .filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.annServeStream(
      input.toDF().toDF("vec_id", "embedding"), sfTiny, s"$base/ledger")
    try {
      qVecs.grouped(3).foreach { wave =>
        input.addData(wave.toSeq: _*)
        q.processAllAvailable()
      }
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
          r.getAs[Long]("cid"), r.getAs[Double]("cosine")))
        .sortBy(t => (t._1, t._2)).toSeq
      val streamed = rows(spark.read.parquet(s"$base/ledger"))
      val batch = rows(graft.ops.SimilarityOps.annIvf(spark, sfTiny))
      assert(streamed == batch,
        s"stream ${streamed.size} rows != batch ${batch.size}")
    } finally q.stop()
  }

  test("streaming UCB re-fold equals the batch pick table after last wave") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = s"${graft.etl.Medallion.warehouseBase}/test/ucb_stream"
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(basePath, true)

    val events = Tables.events(spark, sfTiny)
      .select(col("event_type"), col("ts"), col("value")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
    val input = MemoryStream[(String, java.sql.Timestamp, Double)]
    val q = StreamingOps.ucbStream(
      input.toDF().toDF("event_type", "ts", "value"),
      s"$base/state", s"$base/picks")
    try {
      events.grouped(math.max(1, events.length / 3)).foreach { wave =>
        input.addData(wave.toSeq: _*)
        q.processAllAvailable()
      }
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("day"), r.getAs[String]("chosen"),
          r.getAs[Long]("n_prior"), r.getAs[Long]("ucb_e6"),
          r.getAs[Long]("day_pulls"), r.getAs[Long]("day_reward_c")))
        .sortBy(_._1).toSeq
      val streamed = rows(spark.read.parquet(s"$base/picks"))
      val batch = rows(graft.ops.StatsOps.ucbBandit(spark, sfTiny))
      assert(streamed == batch,
        s"stream ${streamed.size} picks != batch ${batch.size}")
    } finally q.stop()
  }

  test("streaming PLSA serving ledger re-aggregates to the batch census") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = s"${graft.etl.Medallion.warehouseBase}/test/plsa_serve_stream"
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(basePath, true)

    // the batch op's own held-out docs arriving in two waves — the
    // standing model must serve both without re-running EM
    val docs = Tables.documents(spark, sfTiny)
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[(Long, String, String)]
    val q = StreamingOps.plsaServeStream(
      input.toDF().toDF("doc_id", "lang", "text"), sfTiny, s"$base/ledger")
    try {
      docs.grouped(math.max(1, docs.length / 2)).foreach { wave =>
        input.addData(wave.toSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.read.parquet(s"$base/ledger")
        .groupBy(col("lang"), col("topic"))
        .agg(org.apache.spark.sql.functions.sum(col("n_docs")).as("n_docs"),
          org.apache.spark.sql.functions.sum(col("sum_theta_e9"))
            .as("sum_theta_e9"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      val batch = graft.ops.TextOps.plsaInfer(spark, sfTiny).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(streamed == batch,
        s"stream ${streamed.size} rows != batch ${batch.size}")
    } finally q.stop()
  }

  test("streaming WAP: poisoned wave stays invisible, good waves publish") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val root = s"${graft.etl.Medallion.warehouseBase}/test/wap_stream"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(rootPath, true)
    val base = s"$root/table"
    val ledger = s"$root/ledger"

    val input = MemoryStream[(String, Long)]
    val q = StreamingOps.wapStream(
      input.toDF().toDF("k", "v"), base, ledger)
    try {
      input.addData(("a", 5L), ("b", 3L)) // wave 1: clean
      q.processAllAvailable()
      input.addData(("a", -99L), ("c", 2L)) // wave 2: poisoned
      q.processAllAvailable()
      input.addData(("b", 4L), ("d", 1L)) // wave 3: clean
      q.processAllAvailable()

      val led = spark.read.parquet(ledger).collect()
        .map(r => (r.getAs[Long]("batch_id"),
          (r.getAs[Boolean]("published"), r.getAs[Int]("live_version"))))
        .toMap
      assert(led(0L) == ((true, 1)), s"wave 1: ${led(0L)}")
      assert(led(1L) == ((false, 1)), s"wave 2 must not publish: ${led(1L)}")
      assert(led(2L) == ((true, 2)), s"wave 3: ${led(2L)}")

      // final state = waves 1+3 merged; the poisoned delta vanished
      val state = graft.etl.Medallion.snapshotRead(spark, base).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(state == Map("a" -> 5L, "b" -> 7L, "d" -> 1L),
        s"published state: $state")
      // no version directory beyond the two published generations
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/v3")))
    } finally q.stop()
  }

  test("streaming binary-quant serving ledger equals the batch kernel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = s"${graft.etl.Medallion.warehouseBase}/test/binary_serve_stream"
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(basePath, true)

    val qVecs = Tables.embeddings(spark, sfTiny)
      .filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.binaryServeStream(
      input.toDF().toDF("vec_id", "embedding"), sfTiny, s"$base/ledger")
    try {
      qVecs.grouped(3).foreach { wave =>
        input.addData(wave.toSeq: _*)
        q.processAllAvailable()
      }
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
          r.getAs[Long]("cid"), r.getAs[Double]("cosine"),
          r.getAs[Int]("hamming")))
        .sortBy(t => (t._1, t._2)).toSeq
      val streamed = rows(spark.read.parquet(s"$base/ledger"))
      val batch = rows(graft.ops.SimilarityOps.binaryShortlist(
          Tables.embeddings(spark, sfTiny).filter(col("vec_id") < 5)
            .select(col("vec_id"), col("embedding")), spark, sfTiny)
        .filter(col("arank") <= 5)
        .select(col("qid"), col("arank").as("rank"), col("cid"),
          round(col("cosine"), 6).as("cosine"), col("hamming")))
      assert(streamed == batch,
        s"stream ${streamed.size} rows != batch ${batch.size}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming min-k serving ledger equals the batch scorer row-for-row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = s"${graft.etl.Medallion.warehouseBase}/test/mink_stream"
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(basePath, true)

    val heldOut = Tables.documents(spark, sfTiny)
      .filter(col("doc_id") % 10 === 9)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.minKStream(
      input.toDF().toDF("doc_id", "text"), sfTiny, s"$base/ledger")
    try {
      heldOut.grouped(7).foreach { wave =>
        input.addData(wave.toSeq: _*)
        q.processAllAvailable()
      }
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("sum_mink_lp_e6"),
          r.getAs[Long]("k_tokens"), r.getAs[Boolean]("flagged")))
        .sortBy(_._1).toSeq
      val streamed = rows(spark.read.parquet(s"$base/ledger"))
      val batch = rows(graft.ops.TextOps.minKScoreBatch(
        Tables.documents(spark, sfTiny).filter(col("doc_id") % 10 === 9)
          .select(col("doc_id"), col("text")), sfTiny))
      assert(streamed == batch,
        s"stream ${streamed.size} rows != batch ${batch.size}")
      assert(streamed.size == heldOut.length)
    } finally q.stop()
  }

  test("stream-static broadcast enrichment equals the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val input = MemoryStream[Ev]
    val q = StreamingOps.enrichStream(input.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      val evs = Seq(
        Ev(1, ts("2024-01-01 10:00:00"), 1.0),
        Ev(2, ts("2024-01-01 10:01:00"), 2.0),
        Ev(3, ts("2024-01-01 10:02:00"), 3.0)) // no dim row -> NULL tier
      input.addData(evs: _*)
      q.processAllAvailable()
      val streamed = spark.table("enrich_out")
        .select("user_id", "tier").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1).toSeq
      val batch = evs.toDF().join(dim, Seq("user_id"), "left")
        .select("user_id", "tier").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1).toSeq
      assert(streamed == batch)
      assert(streamed == Seq((1L, Some("gold")), (2L, Some("silver")), (3L, None)))
    } finally q.stop()
  }

  test("streaming dedup keeps the first arrival per fingerprint, in and across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "fp", "ts")
    val q = StreamingOps.dedupStream(docs, "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: fp "aa" appears twice in-batch — only the first emits
      input.addData(
        (1L, "aa", ts("2024-01-01 10:00:00")),
        (2L, "aa", ts("2024-01-01 10:01:00")),
        (3L, "bb", ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      // batch 2: "aa" again within the watermark horizon — still dropped;
      // "cc" is new — kept
      input.addData(
        (4L, "aa", ts("2024-01-01 10:30:00")),
        (5L, "cc", ts("2024-01-01 10:31:00")))
      q.processAllAvailable()

      val kept = spark.table("dedup_out")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(kept == Seq(1L, 3L, 5L), s"kept $kept")
      // equals the batch twin over the same rows: one survivor per fp
      val batchFps = Seq((1L, "aa"), (2L, "aa"), (3L, "bb"), (4L, "aa"), (5L, "cc"))
        .toDF("doc_id", "fp").dropDuplicates("fp")
        .select("fp").collect().map(_.getString(0)).sorted.toSeq
      assert(batchFps == Seq("aa", "bb", "cc"))
    } finally q.stop()
  }

  test("streaming incremental dedup drops corpus hits then in-stream dups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpus = Seq("aa", "bb").toDF("fp")
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "fp", "ts")
    val q = StreamingOps.incrementalDedupStream(docs, corpus, "1 hour")
      .writeStream.format("memory").queryName("incdedup_out")
      .outputMode("append").start()
    try {
      // "aa" is a corpus hit (dropped), "cc" twice in-batch (first kept),
      // "dd" is new (kept)
      input.addData(
        (1L, "aa", ts("2024-01-01 10:00:00")),
        (2L, "cc", ts("2024-01-01 10:01:00")),
        (3L, "cc", ts("2024-01-01 10:02:00")),
        (4L, "dd", ts("2024-01-01 10:03:00")))
      q.processAllAvailable()
      // next batch: corpus hit "bb" dropped, "cc" again within the
      // horizon dropped, "ee" kept
      input.addData(
        (5L, "bb", ts("2024-01-01 10:30:00")),
        (6L, "cc", ts("2024-01-01 10:31:00")),
        (7L, "ee", ts("2024-01-01 10:32:00")))
      q.processAllAvailable()

      val kept = spark.table("incdedup_out")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(kept == Seq(2L, 4L, 7L), s"kept $kept")
      // equals the batch twin: anti-join the corpus, keep first per fp
      val rows = Seq((1L, "aa"), (2L, "cc"), (3L, "cc"), (4L, "dd"),
        (5L, "bb"), (6L, "cc"), (7L, "ee"))
      val batchKept = rows.toDF("doc_id", "fp")
        .join(corpus, Seq("fp"), "left_anti")
        .groupBy($"fp").agg(org.apache.spark.sql.functions.min($"doc_id").as("doc_id"))
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(kept == batchKept, s"stream $kept != batch $batchKept")
    } finally q.stop()
  }

  test("foreachBatch incremental gold converges to the batch aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val tbl = s"${graft.etl.Medallion.warehouseBase}/test/stream_gold"
    val p = new org.apache.hadoop.fs.Path(tbl)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)

    val input = MemoryStream[Ev]
    val q = StreamingOps.incrementalGold(input.toDF(), tbl)
    def gold(): Map[Long, (Long, Double)] =
      spark.read.parquet(tbl).collect()
        .map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))).toMap
    try {
      val b1 = Seq(
        Ev(1, ts("2024-01-01 10:00:00"), 1.5),
        Ev(1, ts("2024-01-01 10:01:00"), 2.0),
        Ev(2, ts("2024-01-01 10:02:00"), 4.0))
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(gold() == Map(1L -> ((2L, 3.5)), 2L -> ((1L, 4.0))))

      // batch 2 touches user 1 and introduces user 3; user 2 must be
      // carried over untouched by the upsert
      val b2 = Seq(
        Ev(1, ts("2024-01-01 10:05:00"), 0.5),
        Ev(3, ts("2024-01-01 10:06:00"), 9.0))
      input.addData(b2: _*)
      q.processAllAvailable()
      val expected = (b1 ++ b2).toDF()
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("total_value"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(gold() == expected, s"gold ${gold()} != batch $expected")
    } finally q.stop()
  }

  test("AvailableNow file ingest is exactly-once across restarts") {
    import spark.implicits._
    val base = s"${graft.etl.Medallion.warehouseBase}/test/ingest"
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)

    def drop(rows: Seq[(Long, Double)]): Unit =
      rows.toDF("id", "v").coalesce(1)
        .write.mode("append").parquet(s"$src/") // one new file per drop
    def runOnce(): Unit = {
      val q = StreamingOps.ingestAvailableNow(spark, src,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.DoubleType))), sink, ckpt)
      q.awaitTermination() // AvailableNow terminates after the backlog
    }

    drop(Seq((1L, 1.0), (2L, 2.0)))
    runOnce()
    // second drop lands AFTER the first run's checkpoint; a re-run must
    // ingest only the new file — day-1 rows appear exactly once
    drop(Seq((3L, 3.0)))
    runOnce()
    // idempotent third run with no new files ingests nothing
    runOnce()

    val out = spark.read.parquet(sink).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(out == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)),
      s"expected exactly-once ingest, got $out")
  }
  test("streaming KMV sketch converges to the batch bottom-k estimate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.KmvEv

    val input = MemoryStream[KmvEv]
    val q = graft.streaming.StreamingOps.kmvStream(input.toDS(), k = 32)
      .writeStream.format("memory").queryName("kmv_out")
      .outputMode("update").start()
    try {
      // two event-type keys, cells arriving across two batches in
      // arbitrary order (bottom-k is a set property, order-free)
      val cellsA = (1L to 400L).map(_ * 7L)
      val cellsB = (1L to 150L).map(_ * 13L)
      val (a1, a2) = cellsA.splitAt(137)
      input.addData(a1.map(KmvEv("a", _)) ++ cellsB.take(50).map(KmvEv("b", _)): _*)
      q.processAllAvailable()
      input.addData((a2 ++ a1.take(20)).map(KmvEv("a", _)) ++
        cellsB.drop(50).map(KmvEv("b", _)): _*)
      q.processAllAvailable()

      def hash(cell: Long): Long =
        ((cell % 2147483648L) * 2654435761L) % 4294967296L
      def expected(cells: Seq[Long]): (Long, Long) = {
        val kmin = cells.distinct.map(hash).sorted.take(32)
        (kmin.length.toLong, (kmin.length - 1L) * 4294967296L / kmin.last)
      }
      val last = spark.table("kmv_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        // the final state dominates: sketch size grows until full, then
        // the estimate grows as h_k shrinks — (n, est) is monotone
        .groupBy(_._1).view.mapValues(_.maxBy(r => (r._2, r._3))).toMap
      for ((t, cells) <- Seq("a" -> cellsA, "b" -> cellsB)) {
        val (n, est) = expected(cells)
        assert(last(t)._2 == n, s"$t sketch size")
        assert(last(t)._3 == est, s"$t estimate: ${last(t)._3} != $est")
        // the estimate is in the right ballpark of the true distinct count
        assert(est > cells.length / 2 && est < cells.length * 2)
      }
    } finally q.stop()
  }

  test("streaming semdedup: preference-ordered batches equal the batch drop-set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.SimilarityOps

    val base = s"${graft.etl.Medallion.warehouseBase}/test/semdedup_stream"
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(basePath, true)

    graft.functions.VectorExprs.register(spark)
    val e = SimilarityOps.normed(spark, sfTiny)
    val cents = SimilarityOps.coarseCentroids(spark, sfTiny)
    val assigned = SimilarityOps.assignWithCos(e, cents)
      .withColumn("sc6", round(col("ccos"), 6))
    // the in-order source contract: arrivals in diversity-preference
    // order (sc6 asc, vec_id asc) — any witness precedes its victims,
    // so streaming's final-decision append must reproduce the
    // order-free batch rule exactly
    val ordered = assigned.orderBy(col("sc6"), col("vec_id"))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.semDedupStream(
      input.toDF().toDF("vec_id", "embedding"),
      cents, s"$base/index", s"$base/ledger")
    try {
      ordered.grouped(180).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      val ledger = spark.read.parquet(s"$base/ledger")
      assert(ledger.count() == ordered.length,
        "every arrival must get exactly one final ledger row")
      val streamDropped = ledger.filter(col("dropped")).select("vec_id")
        .collect().map(_.getLong(0)).toSet
      val batchDropped = SimilarityOps
        .semDropSet(assigned, SimilarityOps.SemMaxCell)
        .collect().map(_.getAs[Long]("xid")).toSet
      assert(streamDropped == batchDropped,
        s"stream drop-set ${streamDropped.size} != batch ${batchDropped.size}")
      // the standing index accumulated every arrival (witnesses need
      // not survive — the batch rule's contract)
      assert(spark.read.parquet(s"$base/index").count() == ordered.length)
    } finally q.stop()
  }

  test("streaming pair curation: ledger replays the batch funnel stage-for-stage") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = s"${graft.etl.Medallion.warehouseBase}/test/pair_stream"
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(basePath, true)

    val docs = Tables.documents(spark, sfSmall)
      .select(col("doc_id"), col("text")).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1)))

    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.pairCurationStream(
      input.toDF().toDF("doc_id", "text"),
      s"$base/index", s"$base/ledger")
    try {
      docs.grouped(170).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      val ledger = spark.read.parquet(s"$base/ledger")
      assert(ledger.count() == docs.length,
        "every arrival must get exactly one final ledger row")
      val kept = ledger.filter(col("kept")).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      // in-order ingest: kept set equals the batch funnel's survivors
      val (b, qq, g, c, d) =
        graft.ops.MultimodalOps.pairStages(spark, sfSmall)
      val batchKept = d.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == batchKept,
        s"stream kept ${kept.size} != batch ${batchKept.size}")
      // per-stage drop counts equal the batch funnel's stage deltas
      val drops = ledger.groupBy("disposition").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val (nb, nq, ng, nc, nd) =
        (b.count(), qq.count(), g.count(), c.count(), d.count())
      assert(drops.getOrElse("caption_quality", 0L) == nb - nq)
      assert(drops.getOrElse("image_geometry", 0L) == nq - ng)
      assert(drops.getOrElse("clip_agreement", 0L) == ng - nc)
      assert(drops.getOrElse("image_dedup", 0L) == nc - nd)
      assert(drops.getOrElse("kept", 0L) == nd)
    } finally q.stop()
  }

  test("streaming winnowing: in-order batches equal the batch pair table's d2 side") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = s"${graft.etl.Medallion.warehouseBase}/test/winnow_stream"
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(basePath, true)

    val docs = Tables.documents(spark, sfSmall)
      .select(col("doc_id"), col("text")).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1)))

    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.winnowStream(
      input.toDF().toDF("doc_id", "text"),
      s"$base/index", s"$base/ledger")
    try {
      docs.grouped(170).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      val ledger = spark.read.parquet(s"$base/ledger")
      assert(ledger.count() == docs.length,
        "every arrival must get exactly one final ledger row")
      val streamDropped = ledger.filter(col("dropped")).select("doc_id")
        .collect().map(_.getLong(0)).toSet

      // batch cross-check: dominated-by-earlier == the (d1 < d2) pair
      // table's d2 side at the same shared>=2 threshold
      val batchDropped = graft.ops.DedupOps.winnowing(spark, sfSmall)
        .select(col("d2")).collect().map(_.getLong(0)).toSet
      assert(streamDropped == batchDropped,
        s"stream drop-set ${streamDropped.size} != batch ${batchDropped.size}")

      // independent driver recompute of the same rule (winnowTruth is
      // the SparkSpec-shared ground truth, same as DedupSpec's)
      val fpMap = docs.map { case (id, t) => id -> winnowTruth(t) }
      val truthDropped = fpMap.filter { case (id, f) =>
        fpMap.exists { case (o, g) => o < id && (f & g).size >= 2 }
      }.map(_._1).toSet
      assert(streamDropped == truthDropped,
        s"stream drop-set differs from driver recompute")
    } finally q.stop()
  }

  test("streaming page-hinkley state equals the batch drift query exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{PhEv, PhOut}

    val daily = Tables.events(spark, sfTiny)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x")).orderBy(col("day")).collect()
      .map(r => PhEv(r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val input = MemoryStream[PhEv]
    val q = StreamingOps.pageHinkleyStream(input.toDS())
      .writeStream.format("memory").queryName("ph_out")
      .outputMode("update").start()
    try {
      // chronological micro-batches (the feed contract): 7-day chunks
      daily.grouped(7 * 5).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      val fin = spark.table("ph_out").as[PhOut].collect()
        .groupBy(_.event_type).map { case (_, rs) => rs.maxBy(_.n_days) }
      val streamed = fin.map(o => (o.event_type, o.n_days, o.max_g_e6,
        o.n_alarm_days, Option(o.first_alarm_day).getOrElse(""))).toSet
      val batch = graft.ops.AnalyticsOps.pageHinkley(spark, sfTiny)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3),
          if (r.isNullAt(4)) "" else r.getDate(4).toString)).toSet
      assert(streamed == batch, s"stream $streamed\nbatch $batch")
    } finally q.stop()
  }

  test("streaming MoE routing ledger equals the batch router dispatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = s"${graft.etl.Medallion.warehouseBase}/test/moe_stream"
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(basePath, true)

    graft.functions.VectorExprs.register(spark)
    val vecs = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.moeRouteStream(
      input.toDF().toDF("vec_id", "embedding"), sfTiny, s"$base/ledger")
    try {
      vecs.grouped(math.max(1, vecs.length / 3)).foreach { wave =>
        input.addData(wave.toSeq: _*)
        q.processAllAvailable()
      }
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rk"),
          r.getAs[Long]("expert"), r.getAs[Long]("g_e6")))
        .sortBy(t => (t._1, t._2)).toSeq
      val streamed = rows(spark.read.parquet(s"$base/ledger"))
      // batch side: the router's own kernel over the same vectors
      val batch = rows(graft.ops.SimilarityOps.moeRouteBatch(
          Tables.embeddings(spark, sfTiny)
            .select(col("vec_id"), col("embedding"))
            .withColumn("norm",
              sqrt(expr("vec_dot(embedding, embedding)"))),
          spark, sfTiny)
        .filter(col("rk") <= 2)
        .select(col("vec_id"), col("rk"), col("expert"), col("g_e6")))
      assert(streamed == batch,
        s"stream ${streamed.size} rows != batch ${batch.size}")
      assert(streamed.size == 2 * vecs.length, "top-2 rows per arrival")
    } finally q.stop()
  }
}
