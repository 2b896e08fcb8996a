package graft

import graft.ops.EvalOps

/** Ground-truth check for the generation-eval family: a full driver-side
  * BLEU-2/ROUGE recompute (independent code path — plain Scala maps over
  * the collected corpus, no SQL) must equal the operator's output
  * column-for-column on the integer lattice, plus the metric-range
  * invariants a scorer must satisfy.
  */
class EvalOpsSpec extends SparkSpec {

  private def truth(): Map[String, (Long, Long, Long, Long, Long, Long)] = {
    val docs = Tables.documents(spark, sfTiny)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // per (lang, ord): (m, c, r)
    val acc = scala.collection.mutable.Map[(String, Int), (Long, Long, Long)]()
      .withDefaultValue((0L, 0L, 0L))
    for ((_, lang, text) <- docs) {
      val ws = text.split(" ")
      val n = ws.length
      val candLen = (4 * n + 4) / 5
      val cand = (1 to candLen).map(i => if (i % 7 == 0) "the" else ws(i - 1))
      def grams(ts: Seq[String], ord: Int): Map[String, Long] =
        (if (ord == 1) ts else ts.sliding(2).filter(_.size == 2)
          .map(_.mkString(" ")).toSeq)
          .groupBy(identity).map { case (g, o) => g -> o.size.toLong }
      for (ord <- 1 to 2) {
        val cg = grams(cand, ord); val rg = grams(ws.toSeq, ord)
        val m = (cg.keySet ++ rg.keySet).toSeq
          .map(g => math.min(cg.getOrElse(g, 0L), rg.getOrElse(g, 0L))).sum
        val (pm, pc, pr) = acc((lang, ord))
        acc((lang, ord)) = (pm + m, pc + cg.values.sum, pr + rg.values.sum)
      }
    }
    acc.keys.map(_._1).toSet.map { (l: String) =>
      val (m1, c1, r1) = acc((l, 1)); val (m2, c2, r2) = acc((l, 2))
      l -> (m1, c1, r1, m2, c2, r2)
    }.toMap
  }

  private def halfUpE6(num: Long, den: Long): Long = {
    val n2 = num * 2000000L + den
    Math.floorDiv(n2, den * 2)
  }

  test("genEval equals a driver-side BLEU/ROUGE recompute per language") {
    val out = EvalOps.genEval(spark, sfTiny).collect()
      .map(r => r.getString(0) -> r).toMap
    val t = truth()
    assert(out.keySet == t.keySet)
    for ((lang, (m1, c1, r1, m2, c2, r2)) <- t) {
      val row = out(lang)
      assert(row.getLong(1) == c1 && row.getLong(2) == r1)
      assert(row.getLong(3) == m1 && row.getLong(4) == m2)
      assert(row.getDouble(5) == halfUpE6(m1, r1) / 1000000.0)
      assert(row.getDouble(6) == halfUpE6(m2, math.max(r2, 1L)) / 1000000.0)
      val lnp1 = math.round(math.log(math.max(m1, 1L).toDouble / c1) * 1e6)
      val lnp2 = math.round(
        math.log(math.max(m2, 1L).toDouble / math.max(c2, 1L)) * 1e6)
      val defE6 = halfUpE6(r1 - c1, c1)
      val bleu = math.round(
        math.exp((lnp1 + lnp2 - 2 * defE6).toDouble / 2000000.0) * 1e6)
      assert(row.getLong(7) == bleu)
    }
  }

  test("genEval metric invariants: clipped precision/recall bounds") {
    for (r <- EvalOps.genEval(spark, sfTiny).collect()) {
      val (c1, r1, m1, m2) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(m1 <= math.min(c1, r1)) // clipping caps matches both ways
      assert(m2 <= m1)               // bigram matches can't beat unigram
      assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1)
      assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1)
      // BP < 1 (candidate is a strict ≤80% prefix at any n > 5) and
      // precisions ≤ 1 ⇒ BLEU strictly below 1e6
      assert(r.getLong(7) > 0 && r.getLong(7) < 1000000L)
    }
  }

  test("passAtK equals a driver-side exact-rational recompute") {
    val nc = Tables.orders(spark, sfTiny)
      .select("o_custkey", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).toSeq.map { case (_, rows) =>
        (rows.length.toLong, rows.count(_._2 == "F").toLong)
      }
    def halfUpE6(num: BigInt, den: BigInt): Long =
      ((num * 2000000 + den) / (den * 2)).toLong // operands nonneg
    val expect = Seq(1, 5, 10).map { k =>
      val passes = nc.filter(_._1 >= k).map { case (n, c) =>
        if (n - c < k) 1000000L
        else {
          val num = (0 until k).map(j => BigInt(n - c - j)).product
          val den = (0 until k).map(j => BigInt(n - j)).product
          halfUpE6(den - num, den)
        }
      }
      // mean on the e6 lattice: (2e6·Σ + cnt·1e6)/(2·cnt·1e6) ==
      // (2Σ + cnt) div (2·cnt), the operator's formula
      k -> (passes.size.toLong,
        halfUpE6(BigInt(passes.sum), BigInt(passes.size) * 1000000L))
    }.toMap
    val out = EvalOps.passAtK(spark, sfTiny).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 5, 10))
    for (r <- out) {
      val (cnt, meanE6) = expect(r.getInt(0))
      assert(r.getLong(1) == cnt)
      assert(r.getDouble(2) == meanE6 / 1000000.0)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("best-of-n: stochastic dominance and the n=1 mean identity") {
    import graft.ops.EvalOps
    val rows = EvalOps.bestOfN(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b1, b4, b16) = (r.getAs[Double]("bon1"),
        r.getAs[Double]("bon4"), r.getAs[Double]("bon16"))
      // max of more draws stochastically dominates: monotone in n
      assert(b4 >= b1 - 1e-9 && b16 >= b4 - 1e-9,
        s"BoN not monotone: $b1 / $b4 / $b16")
      assert(r.getAs[Double]("lift") == {
        val l = BigDecimal(b16) - BigDecimal(b1)
        l.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      } || math.abs(r.getAs[Double]("lift") - (b16 - b1)) < 2e-6)
      // E[max of 1 draw] IS the mean reward: recompute driver-side
      // from the shipped scorer
      assert(b1 < 0.0, "unigram logprob rewards are negative")
    }
  }

  test("chrf: driver char-ngram replay; F2 algebra and order-average hold") {
    import graft.ops.EvalOps
    val rows = EvalOps.chrf(spark, sfTiny).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9)))
    assert(rows.nonEmpty)
    // driver replay: same candidate construction, per-doc clipping
    val docs = Tables.documents(spark, sfTiny)
      .selectExpr("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def gramCount(s: String, n: Int): Map[String, Long] =
      if (s.length < n) Map.empty
      else (0 to s.length - n).map(i => s.substring(i, i + n))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val agg = collection.mutable.Map.empty[(String, Int), (Long, Long, Long)]
    docs.foreach { case (_, lang, text) =>
      val ws = text.split(" ", -1)
      val ref = ws.mkString("")
      val keep = (4 * ws.length + 4) / 5
      val cand = ws.take(keep).zipWithIndex
        .map { case (w, i) => if ((i + 1) % 7 == 0) "the" else w }
        .mkString("")
      for (n <- Seq(2, 3)) {
        val (rc, cc) = (gramCount(ref, n), gramCount(cand, n))
        val m = cc.map { case (g, c) => math.min(c, rc.getOrElse(g, 0L)) }.sum
        val (pm, pc, pr) = agg.getOrElse((lang, n), (0L, 0L, 0L))
        agg((lang, n)) = (pm + m, pc + cc.values.sum, pr + rc.values.sum)
      }
    }
    rows.foreach { case (lang, m2, c2, r2, m3, c3, r3, f2, f3, chrf) =>
      assert(agg((lang, 2)) == ((m2, c2, r2)), s"$lang ord2 counts")
      assert(agg((lang, 3)) == ((m3, c3, r3)), s"$lang ord3 counts")
      assert(f2 == (2 * 5 * m2 * 1000000L + (4 * r2 + c2)) / (2 * (4 * r2 + c2)))
      assert(f3 == (2 * 5 * m3 * 1000000L + (4 * r3 + c3)) / (2 * (4 * r3 + c3)))
      assert(chrf == (f2 + f3 + 1) / 2)
    }
  }

  test("BLEU: driver clipped-count recompute; BP and geometric mean laws") {
    import graft.ops.EvalOps
    val rows = EvalOps.bleu(spark, sfTiny).collect().map(r =>
      r.getString(0) -> r).toMap
    assert(rows.nonEmpty)
    // driver recompute of the corpus clipped counts per lang
    val docs = Tables.documents(spark, sfTiny)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def grams(ws: Array[String], n: Int): Map[String, Long] =
      if (ws.length < n) Map.empty
      else ws.sliding(n).map(_.mkString(" ")).toSeq
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val agg = scala.collection.mutable.Map[(String, Int), (Long, Long)]()
    val lens = scala.collection.mutable.Map[String, (Long, Long)]()
    docs.foreach { case (lang, text) =>
      val ws = text.split(" ", -1)
      val keep = (4 * ws.length + 4) / 5
      val cs = ws.take(keep).zipWithIndex
        .map { case (w, i) => if ((i + 1) % 7 == 0) "the" else w }
      val (pc, pr) = lens.getOrElse(lang, (0L, 0L))
      lens(lang) = (pc + cs.length, pr + ws.length)
      for (n <- 1 to 4) {
        val (cg, rg) = (grams(cs, n), grams(ws, n))
        val m = cg.map { case (g, c) => math.min(c, rg.getOrElse(g, 0L)) }.sum
        val (pm, pcn) = agg.getOrElse((lang, n), (0L, 0L))
        agg((lang, n)) = (pm + m, pcn + cg.values.sum)
      }
    }
    rows.foreach { case (lang, r) =>
      for (n <- 1 to 4) {
        val (m, c) = agg((lang, n))
        assert(r.getAs[Long](s"m$n") == m && r.getAs[Long](s"c$n") == c,
          s"$lang order-$n counts")
        assert(m <= c, "clipped matches cannot exceed candidate grams")
      }
      val (cl, rl) = lens(lang)
      assert(r.getAs[Long]("cand_len") == cl &&
        r.getAs[Long]("ref_len") == rl)
      // the 80% prefix makes every candidate shorter: BP must fire
      assert(cl < rl && r.getAs[Long]("bp_e6") < 0L, "brevity penalty")
      val bleu = r.getAs[Long]("bleu_e6")
      assert(bleu > 0L && bleu < 1000000L, s"bleu in (0,1): $bleu")
      // driver recompute of the lattice geometric mean
      val lnSum = (1 to 4).map { n =>
        val (m, c) = agg((lang, n))
        math.round(math.log(m.toDouble / c) * 1e6)
      }.sum
      val want = math.round(math.exp(
        (lnSum / 4.0 + r.getAs[Long]("bp_e6")) / 1e6) * 1e6)
      assert(bleu == want, s"$lang bleu lattice: got $bleu want $want")
    }
  }
}
