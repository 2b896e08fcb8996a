package graft

import org.apache.spark.sql.functions._

import graft.ops.PipelineOps

/** Semantics checks for the pipeline operators that complement the
  * DuckDB oracle: the as-of and range joins are re-derived here from
  * their NAIVE formulations (per-row scan / theta join) so the scalable
  * rewrites (union+window, bucketed equi-join) are proven equivalent to
  * the textbook definition inside Spark itself, independent of the
  * oracle engine's own asof/between implementations.
  */
class PipelineOpsSpec extends SparkSpec {

  test("window funnel: greedy fold == brute-force triple loop") {
    val got = PipelineOps.windowFunnel(spark, sfTiny).collect()
      .map(r => r.getAs[Int]("depth") -> r.getAs[Long]("n_users")).toMap
    val T = 21600000L
    val evs = Tables.events(spark, sfTiny)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = evs.groupBy(_._1).view.mapValues { g =>
      val v = g.filter(_._2 == "view").map(_._3)
      val c = g.filter(_._2 == "click").map(_._3)
      val p = g.filter(_._2 == "purchase").map(_._3)
      val d3 = v.exists(a => c.exists(x => x >= a && x <= a + T &&
        p.exists(y => y >= x && y <= a + T)))
      val d2 = v.exists(a => c.exists(x => x >= a && x <= a + T))
      if (d3) 3 else if (d2) 2 else if (v.nonEmpty) 1 else 0
    }.toMap
    val hist = want.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    assert(got == hist, s"got $got want $hist")
  }

  test("as-of join: union+window rewrite == naive per-purchase max scan") {
    val ev = Tables.events(spark, sfTiny)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("value"), unix_millis(col("ts")).as("ms")).collect()
    val views = ev.filter(_.getString(1) == "view")
      .map(r => (r.getLong(0), r.getLong(4), r.getDouble(3)))
    // naive: for each purchase, scan all views of the user for max ms <= ts
    var nBuys, nMatched = 0L
    var gapSum = 0L
    ev.filter(_.getString(1) == "purchase").foreach { b =>
      nBuys += 1
      val cand = views.filter(v => v._1 == b.getLong(0) && v._2 <= b.getLong(4))
      if (cand.nonEmpty) {
        nMatched += 1
        gapSum += b.getLong(4) - cand.map(_._2).max
      }
    }
    val out = PipelineOps.asofJoin(spark, sfTiny)
      .agg(sum("n_buys"), sum("n_matched"), sum("gap_ms_sum")).collect()(0)
    assert(out.getLong(0) == nBuys)
    assert(out.getLong(1) == nMatched)
    assert(out.getLong(2) == gapSum)
  }

  test("range join: bucketed equi-join rewrite == literal theta join") {
    val ev = Tables.events(spark, sfTiny)
      .select(unix_millis(col("ts")).as("ms"), col("value"))
    val iv = ev.select((col("ms") - pmod(col("ms"), lit(3600000L))).as("ws"))
      .filter((col("ws") / 3600000L).cast("long") % 6 === 0).distinct()
      .withColumn("we", col("ws") + lit(5400000L))
    val naive = ev.join(iv, col("ms") >= col("ws") && col("ms") < col("we"))
      .groupBy(col("ws").as("window_start_ms"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("value_sum"))
      .orderBy(col("window_start_ms"))
    assertSameResult(PipelineOps.rangeJoin(spark, sfTiny), naive)
  }

  test("decontamination: flagged docs share an 8-gram with eval, clean ones don't") {
    val docs = Tables.documents(spark, sfSmall)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    def grams(ws: Array[String]): Set[String] =
      if (ws.length < 8) Set.empty else ws.sliding(8).map(_.mkString(" ")).toSet
    val evalGrams = docs.collect { case (id, ws) if id % 97 == 0 => grams(ws) }
      .fold(Set.empty)(_ ++ _)
    val truthDirty = docs.collect {
      case (id, ws) if id % 97 != 0 && grams(ws).exists(evalGrams) => id
    }.toSet
    val reported = PipelineOps.decontaminate(spark, sfSmall)
      .agg(sum("n_contaminated")).collect()(0).getLong(0)
    assert(reported == truthDirty.size,
      s"contaminated count: spark=$reported truth=${truthDirty.size}")
  }

  test("graded decontamination == brute-force dirty-ratio classes") {
    val docs = Tables.documents(spark, sfSmall)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1)))
    def grams(ws: Array[String]): Seq[String] =
      if (ws.length < 8) Seq.empty else ws.sliding(8).map(_.mkString(" ")).toSeq
    // eval surface: first 30 tokens of each held-out doc
    val evalGrams = docs.collect {
      case (id, _, ws) if id % 10 == 7 => grams(ws.take(30)).toSet
    }.fold(Set.empty)(_ ++ _)
    val classes = docs.collect { case (id, src, ws) if id % 10 != 7 =>
      val g = grams(ws)
      val dirty = g.count(evalGrams)
      val e6 = if (g.isEmpty) 0L else dirty.toLong * 1000000L / g.size
      val cls = if (dirty == 0) "clean"
        else if (e6 >= 500000L) "contaminated" else "partial"
      (src, cls, e6)
    }
    val want = classes.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong,
        g.count(_._2 == "clean").toLong,
        g.count(_._2 == "partial").toLong,
        g.count(_._2 == "contaminated").toLong,
        g.map(_._3).max)
    }.toMap
    val got = PipelineOps.decontamGraded(spark, sfSmall).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == want, s"per-source classes diverge: got $got want $want")
    // the fixture must actually exercise BOTH nonclean classes — a
    // threshold bug that collapses partial into contaminated (or the
    // reverse) must not pass vacuously
    assert(want.values.map(_._3).sum > 0, "no partial docs in fixture")
    assert(want.values.map(_._4).sum > 0, "no contaminated docs in fixture")
    // witness: every row carries the same eval-gram count
    val nEval = PipelineOps.decontamGraded(spark, sfSmall).collect()
      .map(_.getLong(6)).toSet
    assert(nEval == Set(evalGrams.size.toLong),
      s"eval-gram witness $nEval != ${evalGrams.size}")
  }

  test("stratified sample: achieved rates are within 15pp of targets at sf0.01") {
    val rows = PipelineOps.stratifiedSample(spark, sfSmall).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val target = r.getLong(2) / 100.0
      val achieved = r.getDouble(4)
      assert(math.abs(achieved - target) <= 0.15,
        s"lang=${r.getString(0)} target=$target achieved=$achieved")
    }
  }

  test("pii redaction removes every synthesized email and phone") {
    val out = PipelineOps.piiRedact(spark, sfSmall).collect()
    val nDocs = out.map(_.getLong(1)).sum
    val nEmails = out.map(_.getLong(2)).sum
    val nPhones = out.map(_.getLong(3)).sum
    // doc_id 0..499: every %3==0 carries one email, every %5==0 one phone
    assert(nDocs == 500)
    assert(nEmails == (0L until 500L).count(_ % 3 == 0))
    assert(nPhones == (0L until 500L).count(_ % 5 == 0))
    // redaction must strictly shrink PII-bearing text
    out.foreach(r => assert(r.getLong(4) >= 0, s"negative len_delta in $r"))
  }

  test("top-k per group emits at most 3 rows per source, in rank order") {
    val rows = PipelineOps.topkPerGroup(spark, sfSmall).collect()
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      assert(rs.length <= 3, s"source $src has ${rs.length} rows")
      assert(rs.map(_.getInt(3)).toSeq == (1 to rs.length),
        s"ranks not contiguous for $src")
      val chars = rs.sortBy(_.getInt(3)).map(_.getLong(2))
      assert(chars.zip(chars.tail).forall { case (a, b) => a >= b },
        s"n_chars not non-increasing for $src")
    }
  }

  test("bloom prune: no false negatives, and the probe scan actually shrinks") {
    graft.functions.BloomExprs.register(spark)
    val dimKeys = Tables.customer(spark, sfTiny)
      .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 5000.0)
      .select(col("c_custkey"))
    val bf = dimKeys
      .agg(call_function("bloom_agg", col("c_custkey"), lit(100000L)))
      .head().getAs[Array[Byte]](0)
    val orders = Tables.orders(spark, sfTiny)
    val total = orders.count()
    val pruned = orders
      .filter(call_function("bloom_might_contain", lit(bf), col("o_custkey")))
    val prunedKeys = pruned.select(col("o_custkey")).distinct().collect()
      .map(_.getLong(0)).toSet
    val trueKeys = orders.join(dimKeys,
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0)).toSet
    // no false negatives: every truly-matching key survives the filter
    assert(trueKeys.subsetOf(prunedKeys),
      s"bloom dropped ${(trueKeys -- prunedKeys).size} matching keys")
    // the point of the op: the join's probe input is strictly smaller
    assert(pruned.count() < total,
      "bloom filter pruned nothing — probe side unchanged")
  }

  test("token bucket == driver-side sequential replay per user") {
    val evs = Tables.events(spark, sfTiny)
      .select(col("user_id"), expr("unix_millis(ts)").as("ms"), col("event_id"),
        col("event_type"), expr("cast(floor(value) as bigint)").as("amt"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    val truth = evs.groupBy(_._1).map { case (u, es) =>
      var bal = 0L; var peak = 0L; var rej = 0L
      var refills = 0L; var spends = 0L
      es.sortBy(e => (e._2, e._3)).foreach { e =>
        if (e._4 == "purchase") { refills += 1; bal = math.min(100L, bal + e._5) }
        else { spends += 1; if (bal == 0L) rej += 1 else bal -= 1 }
        peak = math.max(peak, bal)
      }
      u -> ((bal, peak, rej, refills, spends))
    }
    val got = PipelineOps.tokenBucket(spark, sfTiny).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == truth, "token-bucket replay differs from driver fold")
    got.values.foreach { case (bal, peak, rej, refills, spends) =>
      assert(bal >= 0 && bal <= 100 && peak >= bal && rej <= spends,
        "invariant violated")
      assert(refills + spends > 0)
    }
  }
  test("target encoding is leakage-free and conserves counts") {
    val enc = PipelineOps.targetEncode(spark, sfTiny).collect()
    // brute-force witness: mean of the OTHER folds, recomputed per cell
    val rows = Tables.orders(spark, sfTiny)
      .select(col("o_orderpriority"),
        graft.ops.Parity.mixBucket(col("o_orderkey"), 2654435761L, 5L),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    enc.foreach { e =>
      val cat = e.getAs[String]("category"); val f = e.getAs[Long]("fold")
      val oof = rows.filter(r => r._1 == cat && r._2 != f)
      assert(e.getAs[Long]("n_oof") == oof.length)
      assert(e.getAs[Long]("oof_cents") == oof.map(_._3).sum / oof.length)
    }
    // cells partition the training set
    assert(enc.map(_.getAs[Long]("n_f")).sum == rows.length)
  }

  test("pps sample: tick count is ~K and heavy documents always sampled") {
    val rows = PipelineOps.ppsSample(spark, sfTiny).collect()
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val total = docs.map(_._2).sum
    val step = total / 50
    // one selection per grid tick, minus ticks absorbed by multi-tick docs
    assert(rows.length <= 51 && rows.length >= 30, s"${rows.length} sampled")
    // any document spanning a full step MUST contain a tick
    val sampled = rows.map(_.getAs[Long]("doc_id")).toSet
    docs.filter(_._2 >= step).foreach { case (id, w) =>
      assert(sampled(id), s"doc $id (w=$w >= step=$step) must be sampled")
    }
    // cumulative weights are consistent with the raw weights
    rows.foreach { r =>
      assert(r.getAs[Long]("cum") >= r.getAs[Long]("wt"))
      assert(r.getAs[Long]("cum") <= total)
    }
  }

  test("length bucketing never pads more than arrival order") {
    val r = PipelineOps.lengthBatching(spark, sfTiny).collect().head
    val nDocs = Tables.documents(spark, sfTiny).count()
    assert(r.getAs[Long]("n_batches") == (nDocs + 31) / 32)
    assert(r.getAs[Long]("pad_bucketed") >= 0L)
    assert(r.getAs[Long]("pad_bucketed") <= r.getAs[Long]("pad_arrival"),
      "sorting by length must not increase padding")
    assert(r.getAs[Long]("waste_bucketed_e6") <= r.getAs[Long]("waste_arrival_e6"))
  }

  test("weighted reservoir: sizes exact, weight-biased, matches driver replay") {
    val got = PipelineOps.weightedReservoir(spark, sfTiny).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("rk"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("wt")))
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // exactly min(16, |stratum|) rows per source, ranks 1..k dense
    val bySource = docs.groupBy(_._2)
    got.groupBy(_._1).foreach { case (s, rows) =>
      assert(rows.length == math.min(16, bySource(s).length))
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length))
    }
    // driver replay of the A-ES clocks picks the same winners
    def clock(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"wr_$id".getBytes("UTF-8"))
      val m48 = java.lang.Long.parseLong(
        md.map(b => f"$b%02x").mkString.take(12), 16)
      -math.log((m48 + 1) / 281474976710657.0) / w
    }
    val want = bySource.toSeq.flatMap { case (s, rows) =>
      rows.map(t => (s, t._1, t._3, clock(t._1, t._3)))
        .sortBy(t => (t._4, t._2)).take(16).zipWithIndex
        .map { case ((src, id, w, _), i) => (src, i + 1, id, w) }
    }.toSet
    assert(got.toSet == want)
    // the sampler is weight-biased: sampled mean weight must exceed
    // the corpus mean (heavy docs get shorter clocks)
    val sampledMean = got.map(_._4).sum.toDouble / got.length
    val corpusMean = docs.map(_._3).sum.toDouble / docs.length
    assert(sampledMean > corpusMean,
      s"sampled mean $sampledMean <= corpus mean $corpusMean")
  }

  test("cb replay: driver admission fold matches the ledger exactly") {
    val got = PipelineOps.cbReplay(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq

    // replay the policy on the driver: md5-bridge arrival order, token
    // cumsum, batch = cumsum-before div budget
    def ordKey(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.map(b => f"$b%02x").mkString.take(15), 16)
    }
    val arrivals = Tables.documents(spark, sfTiny)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
      .sortBy { case (id, _) => (ordKey(id), id) }
    var cum = 0L
    val perReq = arrivals.zipWithIndex.map { case ((_, n), i) =>
      val before = cum; cum += n
      (before / 2048L, i + 1L, n)
    }
    val want = perReq.groupBy(_._1).toSeq.map { case (b, rs) =>
      val toks = rs.map(_._3).sum
      (b, rs.length.toLong, toks, toks * 1000000L / 2048L,
        math.max(toks - 2048L, 0L), rs.map(_._2).min, rs.map(_._2).max,
        rs.length * b)
    }.sortBy(_._1)
    assert(got == want, s"ledger mismatch:\n got $got\nwant $want")

    // admission laws: batches are contiguous arrival spans, and only a
    // boundary-spanning request can overflow the budget
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(a._1 + 1 == b._1 && a._7 + 1 == b._6,
        s"non-contiguous batches: $a -> $b")
    case _ => ()
    }
    got.foreach { r =>
      assert(r._5 == 0 || r._3 > 2048L, s"phantom overflow in $r")
    }
  }

  test("pad waste: driver recompute; same trace as cb replay, waste real") {
    val got = PipelineOps.padWaste(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    def ordKey(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.map(b => f"$b%02x").mkString.take(15), 16)
    }
    val arrivals = Tables.documents(spark, sfTiny)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
      .sortBy { case (id, _) => (ordKey(id), id) }
    val want = arrivals.map(_._2).grouped(8).zipWithIndex.map {
      case (toks, b) =>
        val mx = toks.max
        val alloc = toks.length * mx
        (b.toLong, toks.length.toLong, mx, toks.sum,
          alloc - toks.sum, (alloc - toks.sum) * 1000000L / alloc)
    }.toSeq
    assert(got == want, s"ledger mismatch:\n got $got\nwant $want")
    // same arrival trace as the continuous-batching replay: total
    // admitted tokens must agree operator-to-operator
    val cbTokens = PipelineOps.cbReplay(spark, sfTiny).collect()
      .map(_.getAs[Long]("batch_tokens")).sum
    assert(got.map(_._4).sum == cbTokens,
      "pad-waste and cb-replay disagree on the corpus token mass")
    // padding is the point: a length-diverse trace must waste tokens
    assert(got.map(_._5).sum > 0L, "no padding waste measured")
  }

  test("shard balance: driver assignment replay, policy invariants") {
    val rows = PipelineOps.dpBalance(spark, sfTiny).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("hash", "round_robin"))
    def ordKey(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.map(b => f"$b%02x").mkString.take(15), 16)
    }
    val docs = Tables.documents(spark, sfTiny)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
    for ((policy, assign) <- Seq(
        "hash" -> ((id: Long) => ordKey(id) % 32L),
        "round_robin" -> ((id: Long) => id % 32L))) {
      val byW = docs.groupBy { case (id, _) => assign(id) }
        .view.mapValues(ds => (ds.map(_._2).sum, ds.length.toLong)).toMap
      val toks = byW.values.map(_._1)
      val r = rows(policy)
      assert(r.getAs[Long]("n_workers") == byW.size.toLong)
      assert(r.getAs[Long]("total_tokens") == toks.sum)
      assert(r.getAs[Long]("min_tokens") == toks.min)
      assert(r.getAs[Long]("max_tokens") == toks.max)
      assert(r.getAs[Long]("max_docs") == byW.values.map(_._2).max)
      assert(r.getAs[Long]("imbalance_e6") ==
        toks.max * 32L * 1000000L / toks.sum)
      assert(r.getAs[Long]("stall_pct_e6") ==
        (toks.max * 32L - toks.sum) * 1000000L / (toks.max * 32L))
    }
    // both policies shard the same corpus; imbalance is at least 1
    assert(rows("hash").getAs[Long]("total_tokens") ==
      rows("round_robin").getAs[Long]("total_tokens"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("imbalance_e6") >= 1000000L)
      assert(r.getAs[Long]("stall_pct_e6") < 1000000L)
    }
    // round-robin over the dense doc_id balances COUNTS by construction
    assert(rows("round_robin").getAs[Long]("max_docs") -
      docs.length / 32 <= 1)
  }

  test("tp comm: driver recompute, ring traffic grows toward 2x payload") {
    val rows = PipelineOps.tpComm(spark, sfTiny).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(rows.keySet == Set(2, 4, 8))
    val toks = Tables.documents(spark, sfTiny)
      .select("text").collect().map(_.getString(0).split(" ", -1).length.toLong)
    val nAr = 4L * 8L
    for (t <- Seq(2L, 4L, 8L)) {
      val payload = toks.map(nAr * _ * 512L * 2L)
      val ring = toks.map(l => nAr * 2L * (t - 1) * l * 512L * 2L / t)
      val r = rows(t.toInt)
      assert(r.getAs[Long]("n_seqs") == toks.length.toLong)
      assert(r.getAs[Long]("total_tokens") == toks.sum)
      assert(r.getAs[Long]("n_allreduces") == toks.length * nAr)
      assert(r.getAs[Long]("payload_bytes") == payload.sum)
      assert(r.getAs[Long]("ring_bytes_per_gpu") == ring.sum)
      assert(r.getAs[Long]("ring_bytes_per_token") == ring.sum / toks.sum)
      // ring all-reduce moves 2(t-1)/t of the payload: strictly under 2x
      assert(r.getAs[Long]("ring_bytes_per_gpu") <
        2L * r.getAs[Long]("payload_bytes"))
    }
    // payload is t-independent; per-GPU ring traffic grows with t
    val bySize = Seq(2, 4, 8).map(rows)
    assert(bySize.map(_.getAs[Long]("payload_bytes")).distinct.length == 1)
    val rings = bySize.map(_.getAs[Long]("ring_bytes_per_gpu"))
    assert(rings == rings.sorted && rings.distinct.length == 3,
      s"ring traffic not strictly increasing with tp: $rings")
  }

}
