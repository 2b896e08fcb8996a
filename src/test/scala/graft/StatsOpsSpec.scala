package graft

import org.apache.spark.sql.functions._

import graft.ops.StatsOps

/** Semantics checks for the decision-analytics family, proven inside
  * Spark against independent invariants (the DuckDB oracle is the
  * second, external witness):
  *  - RFM segments partition the customer base (counts and order
  *    totals are conserved across the 8 segments);
  *  - attribution conserves conversions (every purchase is credited
  *    to exactly one channel, 'direct' included);
  *  - Benford shares are a half-up-exact probability vector and the
  *    expected constants are the textbook log10(1+1/d) values;
  *  - the change-point CUSUM closes at exactly zero (N·S − N·S) and
  *    matches a driver-side recompute day by day;
  *  - autocorrelation is a correlation (|r| ≤ 1, pair counts shrink
  *    with the lag).
  */
class StatsOpsSpec extends SparkSpec {

  test("rfm segments partition the customer base") {
    val seg = StatsOps.rfmSegments(spark, sfTiny).collect()
    val nCust = Tables.orders(spark, sfTiny)
      .select(col("o_custkey")).distinct().count()
    val nOrders = Tables.orders(spark, sfTiny).count()
    assert(seg.map(_.getAs[Long]("n_cust")).sum == nCust)
    assert(seg.map(_.getAs[Long]("n_orders")).sum == nOrders)
    val labels = seg.map(_.getAs[String]("segment")).toSet
    assert(labels.forall(_.matches("[R-][F-][M-]")))
  }

  test("woeIv equals a driver-side recompute; IV ranks the features sanely") {
    val orders = Tables.orders(spark, sfTiny)
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val urgent = orders.groupBy(_._1).view
      .mapValues(os => if (os.exists(_._2 == "1-URGENT")) 1L else 0L).toMap
    val nation = Tables.nation(spark, sfTiny)
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val cust = Tables.customer(spark, sfTiny)
      .select("c_custkey", "c_nationkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), nation(r.getInt(1)), r.getString(2)))
    val long = cust.flatMap { case (k, nat, seg) =>
      val y = urgent.getOrElse(k, 0L)
      Seq(("mktsegment", seg, y), ("nation", nat, y))
    }
    def hupE6(num: Long, den: Long): Long = (num * 2000000L + den) / (den * 2)
    def shupE6(num: Long, den: Long): Long = {
      val h = (math.abs(num) * 2 + den) / (den * 2)
      if (num < 0) -h else h
    }
    val want = long.groupBy(t => (t._1, t._2)).map { case ((f, c), ts) =>
      (f, c) -> (ts.map(_._3).sum, ts.size - ts.map(_._3).sum)
    }
    val totals = want.groupBy(_._1._1).view.mapValues { m =>
      (m.values.map(_._1).sum, m.values.map(_._2.toLong).sum)
    }.toMap
    val rows = ops.StatsOps.woeIv(spark, sfTiny).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet == want.keySet)
    val ivSums = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for (r <- rows) {
      val key = (r.getString(0), r.getString(1))
      val (pos, neg) = want(key)
      val (tp, tn) = totals(key._1)
      assert(r.getLong(2) == pos && r.getLong(3) == neg, s"counts at $key")
      val woe = math.round(math.log(((pos + 0.5) / (tp + 0.5)) /
        ((neg + 0.5) / (tn + 0.5))) * 1e6)
      assert(r.getLong(4) == woe, s"woe at $key")
      val dshare = hupE6(pos, tp) - hupE6(neg, tn)
      assert(r.getLong(5) == shupE6(dshare * woe, 1000000L), s"iv term at $key")
      ivSums(key._1) += dshare * woe
    }
    for (r <- rows)
      assert(r.getLong(6) == shupE6(ivSums(r.getString(0)), 1000000L),
        s"feature IV at ${r.getString(0)}")
    // screening sanity: nation (25 cells) must out-inform mktsegment (5)
    val iv = rows.map(r => r.getString(0) -> r.getLong(6)).toMap
    assert(iv("nation") > iv("mktsegment"),
      "feature ranking inverted — IV screen useless on the fixture")
  }

  test("holtWinters == driver-side integer fold; beats both baselines") {
    // sfSmall, not sfTiny: at 1/10th the events the daily series is
    // noise-dominated and the seasonal model has nothing to learn —
    // the beat-the-baseline claim below only holds where there IS
    // signal (verified: at sf0.01 HW wins both aggregates, at sf0.001
    // neither)
    val daily = Tables.events(spark, sfSmall)
      .groupBy(col("event_type"),
        expr("unix_millis(ts) div 86400000").as("day"))
      .agg((sum(expr("CAST(round(value * 100) AS BIGINT)")) * 1000000L)
        .as("xq"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def tdiv(a: Long, b: Long): Long = a / b // truncating, == DuckDB //
    val truth = daily.groupBy(_._1).view.mapValues { rows =>
      val xs = rows.sortBy(_._2).map(_._3)
      val n = xs.length
      assert(n >= 14, "fixture series too short to exercise the model")
      var l = tdiv(xs.take(7).sum, 7)
      var b = tdiv(tdiv(xs.slice(7, 14).sum, 7) - l, 7)
      val s = scala.collection.mutable.Queue(xs.take(7).map(_ - l): _*)
      var (err, errP, err7) = (0L, 0L, 0L)
      for (i <- 7 until n) {
        val su = s.dequeue()
        err += math.abs(xs(i) - (l + b + su))
        errP += math.abs(xs(i) - xs(i - 1))
        err7 += math.abs(xs(i) - xs(i - 7))
        val l1 = tdiv(xs(i) - su + 3 * (l + b), 4)
        b = tdiv((l1 - l) + 7 * b, 8)
        s.enqueue(tdiv((xs(i) - l1) + 3 * su, 4))
        l = l1
      }
      (n.toLong, l, b, l + b + s.head, err / (n - 7), errP / (n - 7),
        err7 / (n - 7))
    }.toMap
    val got = ops.StatsOps.holtWinters(spark, sfSmall).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == truth.keySet)
    got.foreach { case (t, g) =>
      val w = truth(t)
      assert(g == ((w._1, w._2, w._3, w._4, w._5)), s"$t: $g != $w")
    }
    // the model's reason to exist: in aggregate its one-step MAE beats
    // BOTH the persistence forecast (x̂=yesterday) and the lag-7
    // seasonal-naive it claims to improve on
    val hw = truth.values.map(_._5).sum
    assert(hw < truth.values.map(_._6).sum, "HW loses to persistence")
    assert(hw < truth.values.map(_._7).sum, "HW loses to seasonal-naive")
  }

  test("attribution conserves conversions") {
    val at = StatsOps.attribution(spark, sfTiny).collect()
    val purchases = Tables.events(spark, sfTiny)
      .filter(col("event_type") === "purchase").count()
    assert(at.map(_.getAs[Long]("conversions")).sum == purchases)
    // every channel is a real event type (or the 'direct' fallback)
    val types = Tables.events(spark, sfTiny)
      .select(col("event_type")).distinct().collect()
      .map(_.getString(0)).toSet + "direct"
    assert(at.map(_.getAs[String]("channel")).forall(types.contains))
  }

  test("benford shares are an exact probability vector") {
    val rows = StatsOps.benfordDigits(spark, sfTiny).collect()
    assert(rows.map(_.getAs[Int]("digit")).forall(d => d >= 1 && d <= 9))
    // half-up e6 shares sum to 1e6 within one rounding ulp per digit
    val sum = rows.map(_.getAs[Long]("share_e6")).sum
    assert(math.abs(sum - 1000000L) <= rows.length,
      s"shares sum $sum not ~1e6")
    // expected constants are the textbook Benford masses
    assert(StatsOps.benfordE6(1) == 301030L && StatsOps.benfordE6(9) == 45757L)
    assert(StatsOps.benfordE6.values.sum == 1000000L) // rounds to an exact mass
  }

  test("change-point CUSUM closes at zero and matches recompute") {
    val rows = StatsOps.changePoint(spark, sfTiny)
      .collect().sortBy(_.getAs[Long]("day"))
    assert(rows.last.getAs[Long]("c") == 0L, "C_N must be exactly 0")
    val xs = rows.map(_.getAs[Long]("x"))
    val n = xs.length.toLong
    val s = xs.sum
    var cum = 0L
    rows.zipWithIndex.foreach { case (r, i) =>
      cum += xs(i)
      assert(r.getAs[Long]("c") == n * cum - (i + 1) * s, s"row $i")
    }
    assert(rows.count(_.getAs[Boolean]("is_peak")) >= 1)
  }

  test("skyline == quadratic strict-dominance recompute") {
    val got = StatsOps.skyline(spark, sfTiny).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Double]("p_retailprice"),
        r.getAs[Int]("p_size"))).toSet
    val pts = Tables.part(spark, sfTiny)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val want = pts.filter { case (_, pp, ps) =>
      !pts.exists { case (_, qp, qs) =>
        qp <= pp && qs <= ps && (qp < pp || qs < ps) }
    }.toSet
    assert(got == want)
  }

  test("chi-square marginals and total are conserved") {
    val rows = StatsOps.chiSquare(spark, sfTiny).collect()
    val total = Tables.documents(spark, sfTiny).count()
    assert(rows.map(_.getAs[Long]("obs")).sum == total)
    rows.foreach(r => assert(r.getAs[Double]("contrib") >= 0.0))
    // the reported chi2 is the sum of the per-cell contributions
    // (both live on the e6 lattice, so the equality is exact)
    val chi2 = rows.head.getAs[Double]("chi2")
    val sum = rows.map(r => math.round(r.getAs[Double]("contrib") * 1e6)).sum
    assert(math.round(chi2 * 1e6) == sum)
    assert(rows.map(_.getAs[Double]("chi2")).distinct.length == 1)
  }

  test("adamic-adar == driver-side brute force") {
    val got = StatsOps.adamicAdar(spark, sfTiny).collect()
      .map(r => ((r.getAs[Long]("p1"), r.getAs[Long]("p2")),
        r.getAs[Long]("score_e6")))
    val op = Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = op.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val scores = collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.values.foreach { parts =>
      val sz = parts.length
      if (sz >= 2 && sz <= 20) {
        val w = StatsOps.adamicAdarE6(sz)
        for (i <- parts.indices; j <- (i + 1) until sz)
          scores((parts(i), parts(j))) = scores.getOrElse((parts(i), parts(j)), 0L) + w
      }
    }
    val want = scores.toSeq
      .sortBy { case ((p1, p2), s) => (-s, p1, p2) }.take(30)
    assert(got.toSeq == want.map { case (k, s) => (k, s) })
  }

  test("AUC == brute-force pair counting with half-credit ties") {
    val row = StatsOps.rocAuc(spark, sfTiny).collect().head
    val docs = Tables.documents(spark, sfTiny)
      .select(col("n_chars"), (col("lang") === "en").as("pos")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val pos = docs.filter(_._2).map(_._1)
    val neg = docs.filterNot(_._2).map(_._1)
    assert(row.getAs[Long]("p") == pos.length && row.getAs[Long]("n") == neg.length)
    // 2U = #(pos>neg pairs)·2 + #(ties)·1, exactly
    val u2 = pos.iterator.map(s =>
      2L * neg.count(_ < s) + neg.count(_ == s).toLong).sum
    assert(row.getAs[Long]("u2") == u2)
    val auc = row.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("wilson interval brackets the rate and matches recompute") {
    StatsOps.wilsonCi(spark, sfTiny).collect().foreach { r =>
      val (n, k) = (r.getAs[Long]("n").toDouble, r.getAs[Long]("k").toDouble)
      val (rate, lo, hi) =
        (r.getAs[Double]("rate"), r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      assert(lo >= 0.0 && hi <= 1.0 && lo <= rate + 1e-9 && rate <= hi + 1e-9)
      val phat = k / n
      val den = 1.0 + 3.8416 / n
      val center = phat + 3.8416 / (2.0 * n)
      val rad = 1.96 * math.sqrt(phat * (1.0 - phat) / n + 3.8416 / (4.0 * n * n))
      assert(math.abs(lo - (center - rad) / den) < 1e-6)
      assert(math.abs(hi - (center + rad) / den) < 1e-6)
    }
  }

  private def dailyCounts: Array[Long] = {
    Tables.events(spark, sfTiny)
      .select(expr("unix_millis(ts) div 86400000").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("y"))
      .collect().sortBy(_.getAs[Long]("day")).map(_.getAs[Long]("y"))
  }

  test("OLS trend == closed-form recompute on the daily series") {
    val row = StatsOps.olsTrend(spark, sfTiny).collect().head
    val ys = dailyCounts
    val n = ys.length.toDouble
    val xs = (1 to ys.length).map(_.toDouble)
    val (sx, sy) = (xs.sum, ys.map(_.toDouble).sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icpt = (sy * sxx - sx * sxy) / (n * sxx - sx * sx)
    assert(math.abs(row.getAs[Double]("slope") - slope) < 1e-5)
    assert(math.abs(row.getAs[Double]("intercept") - icpt) < 1e-4)
    val r2 = row.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0)
  }

  test("Mann-Kendall S == brute-force pair loop, Z sign follows S") {
    val row = StatsOps.mannKendall(spark, sfTiny).collect().head
    val ys = dailyCounts
    var s = 0L
    for (i <- ys.indices; j <- (i + 1) until ys.length)
      s += java.lang.Long.signum(ys(j) - ys(i))
    assert(row.getAs[Long]("s") == s)
    assert(row.getAs[Long]("n") == ys.length.toLong)
    val z = row.getAs[Double]("z")
    assert(s == 0L || math.signum(z) == math.signum(s.toDouble))
  }

  test("Theil-Sen slope == driver-side median of pairwise slopes") {
    val row = StatsOps.theilSen(spark, sfTiny).collect().head
    val ys = dailyCounts
    val slopes = (for {
      i <- ys.indices; j <- (i + 1) until ys.length
    } yield (ys(j) - ys(i)).toDouble / (j - i).toDouble).sorted
    assert(row.getAs[Long]("n_pairs") == slopes.length.toLong)
    val m = slopes.length
    val med = if (m % 2 == 1) slopes(m / 2)
      else (slopes(m / 2 - 1) + slopes(m / 2)) / 2.0
    assert(math.abs(row.getAs[Double]("ts_slope") - med) < 1e-6)
  }

  test("SPRT path accumulates the exact constant lattice and decides at ln 19") {
    val rows = StatsOps.sprt(spark, sfTiny).collect()
      .sortBy(_.getAs[Long]("day"))
    var (cs, cf) = (0L, 0L)
    rows.foreach { r =>
      cs += r.getAs[Long]("successes")
      cf += r.getAs[Long]("trials") - r.getAs[Long]("successes")
      val e9 = cs * StatsOps.SprtC1E9 + cf * StatsOps.SprtC0E9
      assert(math.round(r.getAs[Double]("llr") * 1e9) == e9)
      val want = if (e9 >= StatsOps.SprtAE9) "accept_h1"
        else if (e9 <= -StatsOps.SprtAE9) "accept_h0" else "continue"
      assert(r.getAs[String]("decision") == want)
    }
  }

  test("winsorized mean pulls toward the center and clips ~2%") {
    val r = StatsOps.winsorize(spark, sfTiny).collect().head
    val n = r.getAs[Long]("n")
    val clipped = r.getAs[Long]("n_clip_lo") + r.getAs[Long]("n_clip_hi")
    // p01/p99 edges clip about 2% of rows
    assert(clipped >= n / 100 && clipped <= n * 4 / 100,
      s"clipped $clipped of $n")
    // clipping both tails of a finite sample can only move the mean by
    // a bounded amount, and the winsorized mean stays inside the band
    val raw = r.getAs[Double]("mean_raw")
    val win = r.getAs[Double]("mean_winsor")
    assert(math.abs(win - raw) < raw * 0.05, s"raw $raw winsor $win")
  }

  test("rolling DAU/WAU: WAU bounds DAU and matches driver recompute") {
    val rows = StatsOps.rollingDau(spark, sfTiny).collect()
      .sortBy(_.getAs[Long]("day"))
    val du = Tables.events(spark, sfTiny)
      .select(expr("unix_millis(ts) div 86400000").as("day"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.foreach { r =>
      val d = r.getAs[Long]("day")
      val dau = du.filter(_._1 == d).map(_._2).distinct.length.toLong
      val wau = du.filter(p => p._1 >= d - 6 && p._1 <= d)
        .map(_._2).distinct.length.toLong
      assert(r.getAs[Long]("dau") == dau && r.getAs[Long]("wau") == wau,
        s"day $d")
      assert(wau >= dau)
      val st = r.getAs[Double]("stickiness")
      assert(st > 0.0 && st <= 1.0)
    }
  }

  test("autocorrelation is bounded and pair counts shrink") {
    val rows = StatsOps.autocorr(spark, sfTiny)
      .collect().sortBy(_.getAs[Long]("lag"))
    assert(rows.length == 7)
    rows.foreach { r =>
      val v = r.getAs[Double]("r")
      assert(!v.isNaN && math.abs(v) <= 1.0 + 1e-9, s"r=$v out of range")
    }
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a })
  }

  test("association rules: lattice identities, bounds, lift symmetry") {
    val rows = StatsOps.assocRules(spark, sfTiny).collect().map { r =>
      (r.getAs[Long]("ante"), r.getAs[Long]("cons"), r.getAs[Long]("pair_n"),
        r.getAs[Long]("a_cnt"), r.getAs[Long]("c_cnt"),
        r.getAs[Long]("conf_e6"), r.getAs[Long]("lift_e6"),
        r.getAs[Long]("supp_e6"))
    }
    assert(rows.nonEmpty && rows.length <= 40)
    rows.foreach { case (a, c, pn, ac, cc, conf, _, supp) =>
      assert(a != c)
      assert(pn >= 1 && pn <= math.min(ac, cc),
        s"($a,$c) pair_n $pn outside 1..min($ac,$cc)")
      // conf is the exact floor lattice of pair_n/a_cnt
      assert(conf == pn * 1000000L / ac, s"($a,$c) conf off-lattice")
      assert(conf <= 1000000L && supp <= conf,
        s"($a,$c) support must not exceed confidence")
    }
    // lift is direction-symmetric: when both directions of a pair make
    // the top-40, their lift_e6 agree exactly (same integer quotient)
    val byPair = rows.groupBy { case (a, c, _, _, _, _, _, _) =>
      (math.min(a, c), math.max(a, c)) }
    byPair.values.filter(_.length == 2).foreach { dirs =>
      assert(dirs.map(_._7).distinct.length == 1,
        s"asymmetric lift for ${dirs.head._1}->${dirs.head._2}")
    }
    // the ranking is by lift desc with (ante, cons) tiebreak
    val key = rows.map { case (a, c, _, _, _, _, l, _) => (-l, a, c) }
    assert(key.sameElements(key.sorted), "top-40 not ordered by lift")
  }

  test("calibration: lattice identities and per-bin squared-error closure") {
    val rows = StatsOps.calibration(spark, sfTiny).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val (bin, nTrain, pHat) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (nTest, posTest, seSum, obs) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(bin >= 0 && bin <= 9 && nTrain > 0 && nTest > 0)
      assert(pHat >= 0 && pHat <= 1000000L && obs >= 0 && obs <= 1000000L)
      assert(obs == posTest * 1000000L / nTest, s"bin $bin obs off-lattice")
      // the bin's error mass decomposes exactly: positives contribute
      // floor((1e6-p̂)²/1e6) each, negatives floor(p̂²/1e6) each
      val sePos = (1000000L - pHat) * (1000000L - pHat) / 1000000L
      val seNeg = pHat * pHat / 1000000L
      assert(seSum == posTest * sePos + (nTest - posTest) * seNeg,
        s"bin $bin squared-error mass does not close")
    }
  }
  test("seasonal naive scores every day with a lag-7 twin") {
    val sn = StatsOps.seasonalNaive(spark, sfTiny).collect()
    assert(sn.length == 5)
    sn.foreach { r =>
      // 30-day fixture: exactly 23 scoreable days per type
      assert(r.getAs[Long]("n_days") == 23L)
      assert(r.getAs[Long]("mae_c") ==
        r.getAs[Long]("abs_err_c") / r.getAs[Long]("n_days"))
      val w = r.getAs[Long]("wape_e6")
      assert(w >= 0, s"wape $w")
    }
  }

  test("symbolic motifs cover every contiguous segment triple") {
    val m = StatsOps.symbolicMotifs(spark, sfTiny).collect()
    m.foreach { r =>
      val w = r.getAs[Int]("word")
      assert(w >= 0 && w <= 7)
    }
    // words form exactly where three consecutive segments exist
    val segs = Tables.events(spark, sfTiny)
      .select(col("event_type"), expr("unix_millis(ts) div 3600000 DIV 8"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val perType = m.groupBy(_.getAs[String]("t"))
      .view.mapValues(_.map(_.getAs[Long]("n_motifs")).sum)
    perType.foreach { case (t, n) =>
      val s = segs(t)
      val triples = s.count(x => s(x + 1) && s(x + 2)).toLong
      assert(n == triples, s"$t: $n words != $triples contiguous triples")
    }
  }

  test("ips replay: matched share is ~1/K and estimators stay on-lattice") {
    val r = StatsOps.ipsEval(spark, sfTiny).collect()
    assert(r.length == 1)
    val row = r.head
    val nEval = row.getAs[Long]("n_eval")
    val nMatched = row.getAs[Long]("n_matched")
    // uniform logging over 5 actions: matched fraction within [0.1, 0.3]
    assert(nMatched * 10 > nEval && nMatched * 10 < nEval * 3)
    assert(row.getAs[Long]("ips_c") ==
      row.getAs[Long]("m_r_c") * 5 / nEval)
    assert(row.getAs[Long]("snips_c") ==
      row.getAs[Long]("m_r_c") / nMatched)
  }

  test("post-stratification reweights toward the population mix") {
    val rows = StatsOps.postStratified(spark, sfTiny).collect()
    val nPop = Tables.documents(spark, sfTiny).count()
    // population shares cover the whole corpus (every lang is judged here)
    assert(rows.map(_.getAs[Long]("n_pop")).sum == nPop)
    val ps = rows.head.getAs[Long]("ps_e6")
    val naive = rows.head.getAs[Long]("naive_e6")
    // both estimates are within the per-language mean envelope
    val means = rows.map(_.getAs[Long]("mean_eval_e6"))
    for (est <- Seq(ps, naive)) {
      assert(est >= means.min - rows.length && est <= means.max + rows.length)
    }
    assert(rows.map(_.getAs[Long]("ps_e6")).distinct.length == 1)
  }

  test("runs test counts runs exactly and flags the hash order's structure") {
    val r = StatsOps.runsTest(spark, sfTiny).collect().head
    // driver-side recount over the same layout
    val laid = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("source")).collect()
      .map(x => (x.getLong(0), x.getString(1)))
      .map { case (id, s) =>
        (((id % 2147483648L) * 2654435761L) % 4294967296L, id,
          if (s < "src2") 1L else 0L) }
      .sortBy(t => (t._1, t._2)).map(_._3)
    val runs = 1L + laid.sliding(2).count(p => p(0) != p(1))
    assert(r.getAs[Long]("r") == runs, s"runs ${r.getAs[Long]("r")} != $runs")
    assert(r.getAs[Long]("n1") == laid.count(_ == 1L))
    // dev and z2 agree in magnitude relation
    val dev = r.getAs[Long]("dev_e3")
    assert(dev == r.getAs[Long]("r") * 1000 - r.getAs[Long]("e_r_e3"))
    assert(r.getAs[Long]("z2_e3") >= 0)
  }


  test("krippendorff equals a driver-side exact-rational recompute") {
    val rows = Tables.lineitem(spark, sfTiny)
      .select("l_orderkey", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byUnit = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      .filter(_._2.length >= 2)
    val L = BigInt(232792560L)
    var oL = BigInt(0); var n = 0L; var nUnits = 0L; var maxM = 0L
    val nc = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for ((_, cats) <- byUnit) {
      val m = cats.length.toLong
      val s2u = cats.groupBy(identity).values
        .map(g => g.size.toLong * g.size).sum
      oL += (L / (m - 1)) * BigInt(m * m - s2u) / 2
      n += m; nUnits += 1; maxM = math.max(maxM, m)
      cats.foreach(c => nc(c) += 1)
    }
    val s1 = BigInt(nc.values.sum)
    val s2 = nc.values.map(v => BigInt(v) * v).sum
    val d22 = s1 * s1 - s2
    def shup(num: BigInt, den: BigInt): Long = {
      val a = num.abs * 2000000
      val h = (a + den) / (den * 2)
      (if (num < 0) -h else h).toLong
    }
    val doE6 = shup(oL * 2, BigInt(n) * L)
    val alphaE6 = shup(d22 * L - oL * 2 * (n - 1), d22 * L)
    val r = graft.ops.StatsOps.krippendorff(spark, sfTiny).collect().head
    assert(r.getLong(0) == nUnits && r.getLong(1) == n)
    assert(r.getLong(2) == maxM && maxM <= 21,
      "per-unit rating count must stay within the lcm(1..20) lattice")
    assert(r.getDouble(3) == doE6 / 1000000.0)
    assert(r.getDouble(4) == alphaE6 / 1000000.0)
    // TPC-H returnflag is date-derived, not annotator agreement — alpha
    // must sit near chance level, well inside [-1, 1]
    assert(r.getDouble(4) > -1.0 && r.getDouble(4) < 1.0)
  }

  test("wasserstein: exact CDF-integral recompute, mean-gap lower bound") {
    val lens = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
    val rows = StatsOps.wasserstein(spark, sfTiny).collect()
    assert(rows.map(_.getString(0)).toSet == lens.map(_._1).toSet)
    rows.foreach { row =>
      val src = row.getString(0)
      val a = lens.filter(_._1 == src).map(_._2).sorted
      val b = lens.filter(_._1 != src).map(_._2).sorted
      // exact rational CDF integral over the merged axis
      val axis = (a ++ b).distinct.sorted
      var num = BigInt(0)
      axis.sliding(2).foreach {
        case Array(v, v2) =>
          val fs = a.count(_ <= v).toLong
          val fr = b.count(_ <= v).toLong
          num += BigInt(v2 - v) * (fs * b.length - fr * a.length).abs
        case _ => ()
      }
      val den = BigInt(a.length.toLong * b.length)
      val want = ((num * 2000000 + den) / (den * 2)).toLong
      assert(row.getLong(2) == want, s"$src: ${row.getLong(2)} != $want")
      // W1 dominates the mean gap in 1-D
      val meanGap = math.abs(a.sum.toDouble / a.length -
        b.sum.toDouble / b.length)
      assert(row.getLong(2) >= math.floor(meanGap * 1e6).toLong - 1,
        s"$src: W1 below the mean gap")
    }
  }

  test("bh-fdr: driver replay; step-up set nests between bonferroni and naive") {
    val rows = StatsOps.bhFdr(spark, sfTiny).collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7),
        r.getBoolean(8)))
    assert(rows.nonEmpty, "gate must leave cells at sf0.001")
    // p ascending with rank; rejection sets are prefix-shaped and nested
    assert(rows.sortBy(_._1).map(_._6).sliding(2).forall(s =>
      s.length < 2 || s(0) <= s(1)), "p_e9 must ascend with rank")
    rows.foreach { r =>
      if (r._8) assert(r._9, s"bonferroni reject at rk=${r._1} must be BH reject")
      if (r._9) assert(r._7, s"BH reject at rk=${r._1} must be naive reject")
    }
    val m = rows.length.toLong
    val kstar = rows.filter(r => r._6 * 20L * m <= r._1 * 1000000000L)
      .map(_._1).reduceOption(_ max _).getOrElse(0)
    rows.foreach(r => assert(r._9 == (r._1 <= kstar), "step-up property"))
    // driver replay of one cell's z and p from raw integer moments
    val docs = Tables.documents(spark, sfTiny)
      .select(col("source"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val head = rows.minBy(_._1)
    val cell = docs.filter(d => d._1 == head._2 && d._2 == head._3)
    val rest = docs.filterNot(d => d._1 == head._2 && d._2 == head._3)
    def mom(xs: Array[(String, String, Long)]) =
      (xs.length.toLong, xs.map(t => BigInt(t._3)).sum,
        xs.map(t => BigInt(t._3) * t._3).sum)
    val (n1, s1, q1) = mom(cell); val (n2, s2, q2) = mom(rest)
    val z = ((BigDecimal(n2) * BigDecimal(s1) - BigDecimal(n1) * BigDecimal(s2))
      .toDouble / (n1.toDouble * n2.toDouble)) /
      math.sqrt((BigDecimal(n1) * BigDecimal(q1) - BigDecimal(s1) * BigDecimal(s1))
        .toDouble / (n1.toDouble * (n1 - 1.0)) / n1 +
        (BigDecimal(n2) * BigDecimal(q2) - BigDecimal(s2) * BigDecimal(s2))
          .toDouble / (n2.toDouble * (n2 - 1.0)) / n2)
    val zr = BigDecimal(z).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(zr == head._5, s"z replay: $zr vs ${head._5}")
    val x = math.abs(zr) / math.sqrt(2.0)
    val t = 1.0 / (1.0 + 0.3275911 * x)
    val p = (0.254829592 * t - 0.284496736 * t * t + 1.421413741 * t * t * t
      - 1.453152027 * t * t * t * t + 1.061405429 * t * t * t * t * t) *
      math.exp(-x * x)
    assert(math.round(p * 1000000000.0) == head._6,
      s"p replay: ${math.round(p * 1e9)} vs ${head._6}")
  }

  test("kruskal-wallis: histogram midranks equal the textbook sorted-rank replay") {
    val r = StatsOps.kruskalWallis(spark, sfTiny).collect().head
    val docs = Tables.documents(spark, sfTiny)
      .selectExpr("source", "n_chars").collect()
      .map(x => (x.getString(0), x.getLong(1)))
    // textbook path: global sort, midranks over ties
    val sorted = docs.map(_._2).sorted
    val rank = sorted.zipWithIndex.groupBy(_._1).view
      .mapValues(g => g.map(_._2 + 1.0).sum / g.length).toMap
    val n = docs.length
    val sumR2overN = docs.groupBy(_._1).values.map { g =>
      val rg = g.map(t => rank(t._2)).sum
      rg * rg / g.length
    }.sum
    val h = 12.0 / (n.toDouble * (n + 1)) * sumR2overN - 3.0 * (n + 1)
    assert(math.abs(r.getDouble(2) - h) < 1e-4,
      s"H: got ${r.getDouble(2)} want $h")
    val ties = docs.map(_._2).groupBy(identity).values
      .map(g => g.length.toLong).map(t => t * t * t - t).sum
    val c = 1.0 - ties.toDouble / (n.toDouble * n * n - n)
    assert(math.abs(r.getDouble(3) - c) < 1e-6, "tie correction")
    assert(math.abs(r.getDouble(4) - h / c) < 1e-4, "corrected H")
    assert(r.getLong(0) == n && r.getLong(1) ==
      docs.map(_._1).distinct.length)
  }

  test("cramers v: full-contingency chi2 replay incl. absent cells; V in [0,1]") {
    val r = StatsOps.cramersV(spark, sfTiny).collect().head
    val docs = Tables.documents(spark, sfTiny)
      .selectExpr("source", "lang").collect()
      .map(x => (x.getString(0), x.getString(1)))
    val n = docs.length.toDouble
    val rm = docs.groupBy(_._1).view.mapValues(_.length).toMap
    val cm = docs.groupBy(_._2).view.mapValues(_.length).toMap
    val om = docs.groupBy(identity).view.mapValues(_.length).toMap
    // naive full cross product over ALL (row, col) incl. zero cells
    val chi2 = (for (rk <- rm.keys.toSeq; ck <- cm.keys.toSeq) yield {
      val e = rm(rk) * cm(ck) / n
      val o = om.getOrElse((rk, ck), 0)
      (o - e) * (o - e) / e
    }).sum
    assert(math.abs(r.getDouble(3) - chi2) < 1e-4,
      s"chi2: got ${r.getDouble(3)} want $chi2")
    val v = math.sqrt(chi2 / (n * (math.min(rm.size, cm.size) - 1)))
    assert(math.abs(r.getDouble(5) - v) < 1e-6, "V")
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    assert(r.getLong(4) == (rm.size - 1).toLong * (cm.size - 1))
  }

  test("qte: type-1 quantile replay via per-arm sort; deciles monotone") {
    val got = StatsOps.qte(spark, sfTiny).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val pu = Tables.events(spark, sfTiny)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
        expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L))
        .as("cents")).collect()
      .map(r => (r.getLong(0), r.getLong(1) / 100))
    def qs(vals: Seq[Long]): Map[Int, Long] = {
      val sorted = vals.sorted
      (1 to 9).map { d =>
        val r = (d * sorted.length + 9) / 10
        d -> sorted(r - 1)
      }.toMap
    }
    val a = qs(pu.filter(_._1 % 2 == 0).map(_._2).toSeq)
    val b = qs(pu.filter(_._1 % 2 == 1).map(_._2).toSeq)
    val want = (1 to 9).map(d => (d, a(d), b(d), b(d) - a(d)))
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")
    assert(got.map(_._2).sliding(2).forall(s => s.length < 2 || s(0) <= s(1)),
      "arm-A deciles must be monotone")
  }

  test("psm match: driver nearest-control replay; accounting closes") {
    val r = StatsOps.psmMatch(spark, sfTiny).collect().head
    val users = Tables.events(spark, sfTiny)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("score"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_err"),
        sum(when(col("event_type") === "purchase",
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L))
          .as("y")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    val treated = users.filter(_._3 > 16)
    val controls = users.filter(_._3 <= 16)
      .map(t => (t._2, t._1, t._4)).sorted // (score, uid, y)
    assert(r.getLong(0) == treated.length && r.getLong(1) == controls.length)
    val diffs = treated.flatMap { case (uid, sc, _, y) =>
      val before = controls.filter(c =>
        c._1 < sc || (c._1 == sc && c._2 < uid)).lastOption
      val after = controls.find(c =>
        c._1 > sc || (c._1 == sc && c._2 > uid))
      val pick = (before, after) match {
        case (Some(p), Some(n)) =>
          if (sc - p._1 <= n._1 - sc) Some(p) else Some(n)
        case (Some(p), None) => Some(p)
        case (None, Some(n)) => Some(n)
        case _ => None
      }
      pick.filter(c => math.abs(c._1 - sc) <= 3).map(c => y - c._3)
    }
    assert(r.getLong(2) == diffs.length, "matched count")
    assert(r.getLong(3) == treated.length - diffs.length, "unmatched count")
    if (diffs.nonEmpty)
      assert(r.getLong(4) ==
        math.round(diffs.sum.toDouble / diffs.length), "ATT replay")
  }

  test("ucb bandit: sequential driver replay equals the windowed plan") {
    val got = StatsOps.ucbBandit(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val ev = Tables.events(spark, sfTiny)
      .selectExpr("event_type", "unix_millis(ts) div 86400000 AS day",
        "CAST(round(value * 100) AS BIGINT) AS r_c").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val arms = ev.map(_._1).distinct.sorted
    val days = ev.map(_._2).distinct.sorted
    // genuinely sequential replay: accumulate day by day
    val n = collection.mutable.Map.empty[String, Long]
    val s = collection.mutable.Map.empty[String, Long]
    val want = days.map { d =>
      val nt = arms.map(a => n.getOrElse(a, 0L)).sum
      val scoredArms = arms.map { a =>
        val np = n.getOrElse(a, 0L)
        val mean = if (np == 0) 0L
          else (2 * 1000000L * s.getOrElse(a, 0L) + np) / (2 * np)
        val bonus = if (np == 0) 0L
          else math.round(math.sqrt(2.0 * math.log(nt.toDouble) / np)
            * 1000000.0)
        (a, np, mean, bonus)
      }
      val pick = scoredArms.minBy { case (a, np, m, b) =>
        (if (np == 0) 0L else 1L, -(m + b), a) }
      ev.filter(e => e._2 == d).foreach { e =>
        n(e._1) = n.getOrElse(e._1, 0L) + 1
        s(e._1) = s.getOrElse(e._1, 0L) + e._3
      }
      (d, pick._1, pick._2, pick._3, pick._4, pick._3 + pick._4)
    }
    assert(got.toSeq == want.toSeq,
      s"got ${got.take(3).toSeq} want ${want.take(3).toSeq}")
  }

  test("dr eval: driver replay; DR = DM + IPS-correction identity") {
    val r = StatsOps.drEval(spark, sfTiny).collect().head
    val ev = Tables.events(spark, sfTiny)
      .selectExpr("event_type", "unix_millis(ts) div 86400000 AS day",
        "CAST(round(value * 100) AS BIGINT) AS r_c").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val cut = ev.map(_._2).min + 15
    val train = ev.filter(_._2 < cut)
    val pi = train.groupBy(_._1).view.mapValues(_.map(_._3).sum)
      .toSeq.maxBy(t => (t._2, t._1))._1
    val qhat = train.groupBy(t => (t._2 % 7, t._1)).view
      .mapValues(v => v.map(_._3).sum / v.length).toMap
    val qg = train.map(_._3).sum / train.length
    val eval = ev.filter(_._2 >= cut)
    val dmSum = eval.map(t => qhat.getOrElse((t._2 % 7, pi), qg)).sum
    val ipsSum = eval.filter(_._1 == pi).map(5L * _._3).sum
    val corrSum = eval.filter(_._1 == pi)
      .map(t => 5L * (t._3 - qhat.getOrElse((t._2 % 7, t._1), qg))).sum
    val n = eval.length
    assert(r.getString(0) == pi && r.getLong(1) == n)
    assert(r.getLong(2) == dmSum / n, "DM replay")
    assert(r.getLong(3) == ipsSum / n, "IPS replay")
    assert(r.getLong(4) == (dmSum + corrSum) / n, "DR replay")
  }

  test("herfindahl: driver share recompute; bounds and ALL row hold") {
    val rows = StatsOps.herfindahl(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val counts = Tables.documents(spark, sfTiny)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byLang: Map[String, Seq[Long]] =
      counts.groupBy(_._1).view.mapValues(_.map(c => c._3).toSeq)
        .toMap + ("ALL" -> counts.groupBy(_._2)
          .map { case (_, v) => v.map(_._3).sum }.toSeq)
    def half(num: BigInt, den: BigInt): Long = ((2*num+den)/(2*den)).toLong
    rows.foreach { case (lang, k, n, hhi, eff, norm) =>
      val cs = byLang(lang)
      assert(k == cs.length && n == cs.sum, s"$lang counts")
      val sc2 = cs.map(c => BigInt(c) * c).sum
      val n2 = BigInt(n) * n
      assert(hhi == half(sc2 * 1000000, n2), s"$lang hhi")
      assert(eff == half(n2 * 1000, sc2), s"$lang eff")
      if (k > 1)
        assert(norm == half((BigInt(k) * sc2 - n2) * 1000000,
          BigInt(k - 1) * n2), s"$lang norm")
      // uniform-lower-bound / concentration sanity
      assert(hhi >= half(BigInt(1000000), BigInt(k)) - 1 &&
        hhi <= 1000000L && norm >= 0L && norm <= 1000000L)
    }
    assert(rows.map(_._1).contains("ALL"))
  }

  test("levene: W matches the driver Brown-Forsythe recompute") {
    val got = StatsOps.leveneTest(spark, sfTiny).collect().head
    val xs = Tables.documents(spark, sfTiny)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val groups = xs.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val z = groups.toSeq.flatMap { case (g, vs) =>
      val m2 = vs((vs.length + 1) / 2 - 1) + vs(vs.length / 2)
      vs.map(v => (g, math.abs(2 * v - m2).toDouble))
    }
    val n = z.length; val k = groups.size
    val grand = z.map(_._2).sum / n
    val perMean = z.groupBy(_._1).view
      .mapValues(v => v.map(_._2).sum / v.length).toMap
    val ssb = z.groupBy(_._1).map { case (g, v) =>
      v.length * math.pow(perMean(g) - grand, 2) }.sum
    val ssw = z.map { case (g, zv) => math.pow(zv - perMean(g), 2) }.sum
    val w = ((n - k).toDouble / (k - 1)) * ssb / ssw
    assert(got.getLong(0) == n && got.getLong(1) == k)
    assert(math.abs(got.getDouble(2) - w) < 1e-4,
      s"W ${got.getDouble(2)} vs replay $w")
  }

  test("GAE advantage: driver recompute of one episode; step conservation") {
    val rows = graft.ops.StatsOps.gaeAdvantage(spark, sfTiny).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfTiny)
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_type") === "purchase",
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L)
          .as("r"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getLong(3)))
    // every event is a step of exactly one episode
    assert(rows.values.map(_.getAs[Long]("n_steps")).sum == ev.length)
    val b = ev.map(_._4).sum / ev.length
    assert(rows.values.head.getAs[Long]("b_e2") == b)
    // full driver recompute of the heaviest user's advantages
    val uid = ev.groupBy(_._1).maxBy(_._2.length)._1
    val traj = ev.filter(_._1 == uid).sortBy(t => (t._3.getTime, t._2))
    val n = traj.length
    val deltaH = traj.zipWithIndex.map { case ((_, _, _, r), i) =>
      if (i == n - 1) 2 * r - 2 * b else 2 * r - b
    }
    val adv = (0 until n).map { t =>
      (t until math.min(n, t + 17)).map(i =>
        (1L << (16 - (i - t))) * deltaH(i)).sum
    }
    val row = rows(uid)
    assert(row.getAs[Long]("n_steps") == n)
    assert(row.getAs[Long]("sum_adv_h16") == adv.sum, "episode sum")
    assert(row.getAs[Long]("max_adv_h16") == adv.max, "episode max")
    assert(row.getAs[Long]("min_adv_h16") == adv.min, "episode min")
  }
}
