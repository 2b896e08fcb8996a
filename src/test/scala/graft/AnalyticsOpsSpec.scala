package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{AnalyticsOps, PipelineOps}

/** Semantics checks for the round-5 analytics additions, proven inside
  * Spark against independent formulations (the DuckDB oracle is the
  * second, external witness):
  *  - native session_window == manual gaps-and-islands at the SAME gap
  *    boundary (break only when diff strictly exceeds the gap — the
  *    merge at an EXACT 30-min gap is pinned by the StreamingSpec
  *    boundary test, where synthetic data hits it precisely);
  *  - GROUPING SETS == the union of its member group-bys;
  *  - typed cogroup == the relational full-outer formulation;
  *  - array HOF fold == driver-side recompute on collected vectors.
  */
class AnalyticsOpsSpec extends SparkSpec {

  test("twap lies within each user's value band and matches recompute") {
    val rows = AnalyticsOps.twap(spark, sfTiny).collect()
    val evs = Tables.events(spark, sfTiny)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = evs.groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._2, e._3))).toMap
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val seq = byUser(u)
      val iv = seq.zip(seq.tail)
      val s = iv.map { case (a, b) => BigInt(a._4) * (b._2 - a._2) }.sum
      val d = iv.map { case (a, b) => b._2 - a._2 }.sum
      assert(r.getAs[Long]("span_ms") == d)
      val e6 = (BigInt(2000000) * s + d) / (BigInt(d) * 2)
      assert(BigInt(math.round(r.getAs[Double]("twap_cents") * 1e6)) == e6, s"user $u")
      // a weighted average sits inside the band of the weighted values
      val cents = iv.map(_._1._4)
      assert(r.getAs[Double]("twap_cents") >= cents.min - 1e-6 &&
        r.getAs[Double]("twap_cents") <= cents.max + 1e-6)
    }
  }

  test("pit join conserves purchases and matches interval-join recompute") {
    val rows = AnalyticsOps.pitJoin(spark, sfTiny).collect()
    val purchases = Tables.events(spark, sfTiny)
      .filter(col("user_id") <= 10 && col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == purchases)
    // every state is a non-purchase event type (or the 'none' fallback)
    val types = Tables.events(spark, sfTiny)
      .select(col("event_type")).distinct().collect()
      .map(_.getString(0)).toSet - "purchase" + "none"
    assert(rows.map(_.getAs[String]("state")).forall(types.contains))
  }

  test("session_window == manual islands with strict > gap break") {
    val manual = {
      val ev = Tables.events(spark, sfTiny)
        .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("value"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ms"))
      ev.withColumn("gap_break",
          when(col("ms") - lag(col("ms"), 1).over(w) > 1800000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("gap_break")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("value_sum"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          max(col("n_events")).as("max_session_events"),
          round(sum(col("value_sum")), 4).as("value_total"))
        .orderBy(col("user_id"))
    }
    assertSameResult(AnalyticsOps.sessionWindowAgg(spark, sfTiny), manual)
  }

  test("grouping sets == union of member group-bys") {
    val li = Tables.lineitem(spark, sfTiny)
    def member(keys: Seq[String]) = {
      val grouped =
        if (keys.isEmpty) li.groupBy() else li.groupBy(keys.map(col): _*)
      val agg = grouped.agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 4).as("qty_sum"))
      // absent keys surface as NULL with GROUPING() = 1, present as 0
      agg.select(
        (if (keys.contains("l_returnflag")) col("l_returnflag")
         else lit(null).cast("string")).as("l_returnflag"),
        (if (keys.contains("l_linestatus")) col("l_linestatus")
         else lit(null).cast("string")).as("l_linestatus"),
        lit(if (keys.contains("l_returnflag")) 0 else 1).as("g1"),
        lit(if (keys.contains("l_linestatus")) 0 else 1).as("g2"),
        col("n"), col("qty_sum"))
    }
    val union = member(Seq("l_returnflag"))
      .unionByName(member(Seq("l_linestatus")))
      .unionByName(member(Seq.empty))
      .orderBy(col("g1"), col("g2"), col("l_returnflag"), col("l_linestatus"))
    assertSameResult(AnalyticsOps.groupingSetsAgg(spark, sfTiny), union)
  }

  test("typed cogroup == relational full-outer reconciliation") {
    val o = Tables.orders(spark, sfTiny)
      .groupBy(col("o_orderkey").as("k"))
      .agg(sum(col("o_totalprice")).as("tp"))
    val l = Tables.lineitem(spark, sfTiny)
      .groupBy(col("l_orderkey").as("k"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_extendedprice")).as("isum"))
    val relational = o.join(l, Seq("k"), "full_outer")
      .groupBy(coalesce(col("n_items"), lit(0L)).as("n_items"))
      .agg(count(lit(1)).as("n_keys"),
        round(sum(coalesce(col("isum"), lit(0.0))), 4).as("item_price_sum"),
        round(sum(coalesce(col("tp"), lit(0.0))), 4).as("order_price_sum"))
      .orderBy(col("n_items"))
    assertSameResult(PipelineOps.cogroupRecon(spark, sfTiny), relational)
  }

  test("array HOF fold matches driver-side recompute") {
    val rows = Tables.embeddings(spark, sfTiny)
      .select(col("label"), col("embedding")).collect()
    assert(rows.nonEmpty)
    val byLabel = rows.groupBy(_.getInt(0)).map { case (lab, rs) =>
      val per = rs.map { r =>
        val v = r.getSeq[Float](1)
        val l2sq = v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
        val nPos = v.count(_ > 0f)
        val mx = v.max.toDouble
        (l2sq, nPos.toLong, mx)
      }
      lab -> ((per.length.toLong,
        BigDecimal(per.map(_._1).sum / per.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        per.map(_._2).sum,
        BigDecimal(per.map(_._3).max)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    AnalyticsOps.arrayHof(spark, sfTiny).collect().foreach { r =>
      val (n, l2avg, npos, mx) = byLabel(r.getInt(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - l2avg) <= 1e-4,
        s"label ${r.getInt(0)} l2sq_avg ${r.getDouble(2)} vs $l2avg")
      assert(r.getLong(3) == npos)
      assert(math.abs(r.getDouble(4) - mx) <= 1e-4)
    }
  }

  test("cohort retention: conservation and day-0 diagonal") {
    val rows = AnalyticsOps.cohortRetention(spark, sfSmall).collect()
    val ev = Tables.events(spark, sfSmall)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    // every event lands in exactly one (cohort, offset) cell
    assert(rows.map(_.getLong(3)).sum == ev.count(), "events not conserved")
    assert(rows.forall(_.getLong(1) >= 0), "negative day offset")
    // the day-0 diagonal counts each cohort's full membership: every
    // user is active on their own first-seen date by definition
    val cohortSizes = ev.groupBy(col("user_id")).agg(min(col("d")).as("c"))
      .groupBy(col("c")).count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val day0 = rows.filter(_.getLong(1) == 0L)
      .map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    assert(day0 == cohortSizes, s"day-0 diagonal $day0 != cohorts $cohortSizes")
  }

  test("retention matrix == long-form cohort cells at offsets 0/1/7/30") {
    val long = AnalyticsOps.cohortRetention(spark, sfSmall).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    val wide = AnalyticsOps.retentionMatrix(spark, sfSmall).collect()
    // one wide row per cohort date, cells matching the long form (0
    // where the cohort has no activity at that offset)
    assert(wide.map(_.getDate(0).toString).toSet ==
      long.keys.map(_._1).toSet, "cohort row set differs")
    wide.foreach { r =>
      val c = r.getDate(0).toString
      val cells = Seq(0L -> r.getLong(1), 1L -> r.getLong(2),
        7L -> r.getLong(3), 30L -> r.getLong(4))
      cells.foreach { case (off, n) =>
        assert(n == long.getOrElse((c, off), 0L),
          s"cohort $c offset $off: wide $n != long ${long.get((c, off))}")
      }
      // retention never exceeds the cohort's day-0 size
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) <= r.getLong(1) &&
        r.getLong(4) <= r.getLong(1), s"cohort $c retains more than size")
    }
  }

  test("SCD2: versions contiguous, intervals chain, one open row per user") {
    val rows = AnalyticsOps.scd2(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to vs.length),
        s"user $u versions not contiguous")
      // exactly one open-ended current version, and it is the last
      assert(vs.count(_._6) == 1, s"user $u current-count != 1")
      assert(sorted.last._6 && sorted.last._5.isEmpty,
        s"user $u last version not the open one")
      sorted.init.foreach { v =>
        assert(!v._6 && v._5.nonEmpty, s"user $u closed version marked current") }
      // intervals chain: each valid_to equals the next valid_from, and
      // consecutive versions really changed type
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a._5.contains(b._4),
          s"user $u: version ${a._2} valid_to ${a._5} != next from ${b._4}")
        assert(a._3 != b._3, s"user $u: consecutive versions same type")
      }
    }
  }

  test("Gini == driver-side rank-formula recompute, bounded") {
    val r = AnalyticsOps.giniActivity(spark, sfSmall).collect().head
    val (n, sx, g) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(g >= 0.0 && g < 1.0, s"gini $g out of range")
    val xs = Tables.events(spark, sfSmall).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
      .sortBy(t => (t._2, t._1)).map(_._2)
    assert(n == xs.length && sx == xs.sum)
    val six = xs.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    val want = 2.0 * six / (xs.length.toLong * xs.sum).toDouble -
      (xs.length + 1.0) / xs.length
    assert(math.abs(g - want) <= 1e-6, s"gini $g != $want")
  }

  test("event transitions: rows normalize, pair mass conserves") {
    val rows = AnalyticsOps.eventTransitions(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val events = Tables.events(spark, sfSmall).count()
    val users = Tables.events(spark, sfSmall)
      .select(col("user_id")).distinct().count()
    // every event except each user's first contributes one transition
    assert(rows.map(_._3).sum == events - users, "transition mass")
    rows.groupBy(_._1).foreach { case (from, ts) =>
      val pSum = ts.map(_._4).sum
      assert(math.abs(pSum - 1.0) <= ts.length * 1e-6,
        s"$from row sums to $pSum")
      ts.foreach(t => assert(t._4 > 0.0 && t._4 <= 1.0))
    }
  }

  test("Pareto: boundary exact, decile share consistent") {
    val r = AnalyticsOps.paretoUsers(spark, sfSmall).collect().head
    val (nU, nT, k, frac, decile) = (r.getLong(0), r.getLong(1), r.getInt(2),
      r.getDouble(3), r.getDouble(4))
    assert(k >= 1 && k <= nU)
    assert(math.abs(frac - k.toDouble / nU) <= 1e-6)
    // the top decile (sorted desc) cannot hold less than its headcount share
    assert(decile >= (nU / 10).toDouble / nU - 1e-6)
    // k is the FIRST rank crossing 80%: recompute from per-user counts
    val per = Tables.events(spark, sfSmall).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
      .sortBy(t => (-t._2, t._1)).map(_._2)
    var cum = 0L
    val want = per.indexWhere { n => cum += n; cum * 5 >= nT * 4 } + 1
    assert(k == want, s"boundary $k != $want")
  }

  test("A/B test: counts conserve users, z matches hand recompute") {
    val r = AnalyticsOps.abTest(spark, sfSmall).collect().head
    val (nA, cA, nB, cB, z) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(6))
    val users = Tables.events(spark, sfSmall)
      .select(col("user_id")).distinct().count()
    assert(nA + nB == users, "arms must partition the user set")
    assert(cA <= nA && cB <= nB)
    val (pA, pB) = (cA.toDouble / nA, cB.toDouble / nB)
    val pp = (cA + cB).toDouble / (nA + nB)
    val want = (pA - pB) / math.sqrt(pp * (1 - pp) * (1.0 / nA + 1.0 / nB))
    assert(math.abs(z - want) <= 5e-4, s"z=$z != $want")
    assert(r.getBoolean(7) == (math.abs(z) > 1.96))
  }

  test("survival: S monotone non-increasing, risk sets nested, KM recompute") {
    val rows = AnalyticsOps.survivalKm(spark, sfSmall).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._1 < b._1 && a._2 > b._2, "days/risk sets not strictly ordered")
      assert(a._4 >= b._4, "survival must be non-increasing")
    }
    // hand-fold the KM product on the same (deaths, n_risk) pairs
    var s = 1.0
    rows.foreach { case (_, nRisk, d, surv) =>
      assert(d > 0 && d <= nRisk)
      s *= 1.0 - d.toDouble / nRisk
      assert(math.abs(surv - s) <= 1e-4, s"KM product drifted: $surv vs $s")
    }
    assert(rows.last._4 > 0.0 && rows.head._4 < 1.0)
  }

  test("nested export: conservation, chunk math, and a nested disk schema") {
    val rows = PipelineOps.nestedExport(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3), r.getLong(4)))
    assert(rows.length == 500)
    rows.foreach { case (id, nTok, nChunks, chunkSum) =>
      assert(chunkSum == nTok, s"doc $id chunk mass $chunkSum != $nTok")
      assert(nChunks == math.ceil(nTok / 32.0).toInt, s"doc $id chunk count")
    }
    // the materialized table really is nested on disk
    val schema = spark.read.parquet(
      s"${graft.etl.Medallion.warehouse(sfSmall)}/nested_docs").schema
    assert(schema("meta").dataType.isInstanceOf[
      org.apache.spark.sql.types.StructType])
    val chunks = schema("chunks").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
    assert(chunks.elementType.isInstanceOf[
      org.apache.spark.sql.types.StructType])
  }

  test("user similarity: ranked pairs well-formed and truly maximal") {
    val rows = AnalyticsOps.userSimilarity(spark, sfSmall).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.map(_._1).toSeq == (1 to 20))
    rows.foreach { case (_, u1, u2, shared, j) =>
      assert(u1 < u2 && shared > 0)
      assert(j > 0.0 && j <= 1.0)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 >= b._5, "jaccard not non-increasing down the ranking")
    }
  }

  test("KS statistic == driver-side ECDF supremum") {
    val r = AnalyticsOps.ksTest(spark, sfTiny).collect().head
    val (nEn, nOt, ksAt, ks) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))
    val docs = Tables.documents(spark, sfTiny)
      .select(col("lang"), col("text")).collect()
      .map(row => (row.getString(0) == "en", row.getString(1).split(" ").length))
    val en = docs.filter(_._1).map(_._2).sorted
    val ot = docs.filterNot(_._1).map(_._2).sorted
    assert(nEn == en.length && nOt == ot.length)
    val vs = (en ++ ot).distinct.sorted
    val sup = vs.map { v =>
      val d = math.abs(en.count(_ <= v).toLong * ot.length -
        ot.count(_ <= v).toLong * en.length)
      (d, v)
    }.maxBy(t => (t._1, -t._2))
    assert(ksAt == sup._2, s"argmax $ksAt != ${sup._2}")
    assert(math.abs(ks - sup._1.toDouble / (en.length.toLong * ot.length))
      <= 1e-6)
    assert(ks >= 0.0 && ks <= 1.0)
  }

  test("TF-IDF: universal terms zero out, scores rank non-increasing") {
    val rows = graft.ops.TextOps.tfidfTerms(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val nSrc = rows.map(_._1).distinct.length
    rows.groupBy(_._1).foreach { case (src, ts) =>
      assert(ts.map(_._2).sorted.toSeq == (1 to 3), s"$src ranks not 1..3")
      val byRank = ts.sortBy(_._2)
      byRank.sliding(2).foreach { case Array(a, b) =>
        assert(a._6 >= b._6, s"$src tfidf not non-increasing") }
    }
    rows.foreach { case (src, _, term, tf, df, score) =>
      assert(tf > 0 && df >= 1 && df <= nSrc)
      if (df == nSrc) assert(score == 0.0, s"$src/$term universal but scored")
      if (df < nSrc) assert(score > 0.0, s"$src/$term distinctive but zero")
    }
    // at least one source must surface a genuinely distinctive term
    assert(rows.exists(_._6 > 0), "no distinctive vocabulary found")
  }

  test("quality correlation == driver-side sufficient-statistics recompute") {
    val r = AnalyticsOps.qualityCorr(spark, sfSmall).collect().head
    val (n, pr) = (r.getLong(0), r.getDouble(1))
    assert(n == 500)
    assert(pr >= -1.0 && pr <= 1.0, s"r=$pr outside [-1,1]")
    val xs = graft.ops.TextOps.unigramLogprob(spark, sfSmall).collect()
      .map(row => (row.getLong(1),
        // HALF_UP (away from zero) — math.round would shift negative
        // ties toward +inf, off the engines' rounding
        BigDecimal(row.getDouble(2) * 1000.0)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
    val sxx = xs.map(t => t._1 * t._1).sum
    val syy = xs.map(t => t._2 * t._2).sum
    val sxy = xs.map(t => t._1 * t._2).sum
    val m = xs.length.toLong
    val want = (m * sxy - sx * sy).toDouble /
      (math.sqrt((m * sxx - sx * sx).toDouble) *
        math.sqrt((m * syy - sy * sy).toDouble))
    assert(math.abs(pr - want) <= 1e-6, s"r=$pr != $want")
  }

  test("conversion lag: funnel consistent, percentiles ordered") {
    val r = AnalyticsOps.conversionLag(spark, sfSmall).collect().head
    val (nS, nC, rate, p50, p90) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(nC <= nS && nS > 0)
    assert(math.abs(rate - nC.toDouble / nS) <= 1e-6)
    assert(p50 >= 0.0 && p90 >= p50, s"percentiles disordered: $p50/$p90")
  }

  test("EWMA == driver-side sequential fold on time-sorted values") {
    val truth = Tables.events(spark, sfTiny)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).view.mapValues { es =>
        val vs = es.sortBy(e => (e._2, e._3)).map(_._4)
        val folded = vs.tail.foldLeft(vs.head)((acc, v) => acc + 0.25 * (v - acc))
        (es.length.toLong,
          BigDecimal(folded).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble,
          vs.min, vs.max)
      }.toMap
    val got = AnalyticsOps.ewma(spark, sfTiny).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == truth.keySet)
    got.foreach { case (u, (n, e)) =>
      val (tn, te, lo, hi) = truth(u)
      assert(n == tn, s"user $u event count")
      assert(math.abs(e - te) <= 1e-6, s"user $u: $e != $te")
      // an average-of-observations stays inside the observed range
      assert(e >= lo - 1e-6 && e <= hi + 1e-6, s"user $u EWMA outside range")
    }
  }

  test("streak distribution == driver-side run-length recompute") {
    val days = Tables.events(spark, sfTiny)
      .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val truth = days.groupBy(_._1).toSeq.map { case (_, ds) =>
      val sorted = ds.map(_._2).sorted
      // run-length encode consecutive days
      val lens = sorted.foldLeft(List.empty[(Long, Int)]) {
        case (Nil, d) => List((d, 1))
        case ((last, n) :: rest, d) =>
          if (d == last + 1) (d, n + 1) :: rest else (d, 1) :: (last, n) :: rest
      }.map(_._2)
      (lens.max.toLong, lens.length.toLong)
    }.toSeq
    val expect = truth.groupBy(_._1).map { case (streak, us) =>
      streak -> ((us.length.toLong, us.map(_._2).sum))
    }
    val got = AnalyticsOps.streaks(spark, sfTiny).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect, "streak distribution differs from driver recompute")
  }

  test("peak concurrency == driver-side GLOBAL sweep (carry logic is exact)") {
    val iv = Tables.events(spark, sfTiny)
      .select(expr("unix_millis(ts)").as("s"),
        expr("unix_millis(ts) + cast(floor(value) as bigint) * 60000").as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the truth is a single global sweep — no day partitioning, no
    // carry: per-day peaks read off the one true concurrency function
    val points = (iv.map(p => (p._1, 1L)) ++ iv.map(p => (p._2, -1L)))
      .sortBy(identity)
    var run = 0L
    val trace = points.map { case (t, d) => run += d; (t, run) }
    val dayPeaks = scala.collection.mutable.Map.empty[Long, Long]
    trace.zipWithIndex.foreach { case ((t, r), i) =>
      val day = Math.floorDiv(t, 86400000L)
      // concurrency at the day's first instant (before its first point)
      val atMidnight = if (i == 0) 0L else trace(i - 1)._2
      if (i == 0 || Math.floorDiv(trace(i - 1)._1, 86400000L) != day)
        dayPeaks(day) = math.max(dayPeaks.getOrElse(day, Long.MinValue), atMidnight)
      dayPeaks(day) = math.max(dayPeaks(day), r)
    }
    val got = AnalyticsOps.peakConcurrency(spark, sfTiny).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == dayPeaks.keySet, "day panel differs")
    got.foreach { case (day, (carry, nPoints, peak)) =>
      assert(peak == dayPeaks(day), s"day $day peak $peak != ${dayPeaks(day)}")
      assert(carry >= 0 && peak >= carry.min(peak)) // carry never negative
      assert(nPoints > 0)
    }
    assert(got.values.map(_._2).sum == 2L * iv.length, "point mass conserved")
  }

  test("decayed sum == driver recompute; recency index inside its lattice band") {
    val evs = Tables.events(spark, sfTiny)
      .select(col("event_type"), expr("unix_millis(ts) div 86400000").as("day"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val day0 = evs.map(_._2).max
    val truth = evs.groupBy(_._1).map { case (t, es) =>
      val decayed = es.map(e => e._3 * (1L << (4 - ((day0 - e._2) / 7)).toInt)).sum
      val raw = es.map(_._3).sum
      t -> ((es.length.toLong, raw, decayed, decayed * 1000000L / (raw * 16L)))
    }
    val got = AnalyticsOps.decayedSum(spark, sfTiny).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == truth, "decayed sums differ from driver recompute")
    got.values.foreach { case (_, _, _, recency) =>
      // weights span 2^0..2^4 ⇒ the index lives in [1/16, 1] on the lattice
      assert(recency >= 62500L && recency <= 1000000L, s"recency $recency")
    }
  }
  test("calendar fill scaffolds every day and LOCF carries values") {
    val rows = graft.ops.AnalyticsOps.calendarFill(spark, sfTiny).collect()
    val byT = rows.groupBy(_.getAs[String]("t"))
    byT.values.foreach { series =>
      val days = series.map(_.getAs[Long]("day")).sorted
      // a contiguous calendar, no holes
      assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 },
        "scaffold must be gapless")
      // LOCF: a filled day repeats the previous day's value
      val byDay = series.map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("v_c"), r.getAs[Boolean]("filled"))).toMap
      byDay.foreach { case (d, (v, filled)) =>
        if (filled) byDay.get(d - 1).foreach { case (pv, _) =>
          assert(v == pv, s"filled day $d must carry $pv, got $v") }
      }
      // observed days match the source
      assert(series.exists(!_.getAs[Boolean]("filled")),
        "each scaffolded type has at least one observation")
    }
  }

  test("path mining counts every 3+-event user-day exactly once") {
    val paths = graft.ops.AnalyticsOps.pathMining(spark, sfTiny).collect()
    paths.foreach { r =>
      val p = r.getAs[String]("path").split(">")
      assert(p.length == 3, s"path must have 3 steps: ${r.getAs[String]("path")}")
    }
    // journeys counted <= user-days with >= 3 events (top-20 may truncate)
    val eligible = Tables.events(spark, sfTiny)
      .groupBy(col("user_id"), expr("unix_millis(ts) div 86400000"))
      .count().filter(col("count") >= 3).count()
    assert(paths.map(_.getAs[Long]("n_journeys")).sum <= eligible)
    // frequencies are non-increasing in output order
    val ns = paths.map(_.getAs[Long]("n_journeys"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("watermark audit: drop rates fall monotonically, 600s drops nothing") {
    val rows = graft.ops.AnalyticsOps.watermarkAudit(spark, sfTiny).collect()
      .sortBy(_.getAs[Int]("wm_s"))
    val drops = rows.map(_.getAs[Long]("n_dropped"))
    assert(drops.zip(drops.tail).forall { case (a, b) => a >= b },
      "longer watermark can only drop fewer events")
    assert(drops.last == 0L, "delays are bounded by 600s")
    rows.foreach { r =>
      assert(r.getAs[Long]("drop_rate_e6") <= 1000000L)
      assert(r.getAs[Long]("n_events") ==
        Tables.events(spark, sfTiny).count())
    }
  }

  test("srm: md5-lattice replay; only the planted experiment fires") {
    import graft.ops.AnalyticsOps
    val got = AnalyticsOps.srm(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    // driver replay: exposure = distinct (event_id%4, user), assignment
    // by the same md5 48-bit lattice, the experiment-0 arm-B drop, and
    // the exact half-up e6 chi-square
    val ev = Tables.events(spark, sfSmall)
      .select(col("event_id"), col("user_id")).collect()
      .map(r => (r.getLong(0) % 4, r.getLong(1))).distinct
    def arm(e: Long, u: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"srm_${e}_$u".getBytes("UTF-8"))
      val hex = md.map(b => f"$b%02x").mkString.take(12)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) "A" else "B"
    }
    val want = ev.map { case (e, u) => (e, u, arm(e, u)) }
      .filterNot { case (e, u, a) => e == 0 && a == "B" && u % 10 < 4 }
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (e, g) =>
        val na = g.count(_._3 == "A").toLong
        val nb = g.count(_._3 == "B").toLong
        val chi = (2 * (na - nb) * (na - nb) * 1000000L + (na + nb)) /
          (2 * (na + nb))
        (e, na, nb, chi, chi > 3841459L)
      }
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")
    assert(got.count(_._5) == 1 && got.find(_._5).get._1 == 0L,
      "exactly the planted experiment must trip the gate")
  }

  test("page-hinkley: sequential driver recurrence matches the window form") {
    import graft.ops.AnalyticsOps
    val got = AnalyticsOps.pageHinkley(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val daily = Tables.events(spark, sfTiny)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val want = daily.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, g) =>
      var t = 0L; var sum = 0L; var m = 0L; var mMin = 0L
      var maxG = 0L; var alarms = 0L
      g.sortBy(_._2).foreach { case (_, _, x) =>
        t += 1; sum += x
        m += math.round((t * x - sum).toDouble * 1000000.0 / t)
        mMin = math.min(mMin, m)
        val gg = m - mMin
        maxG = math.max(maxG, gg)
        if (gg > 8000000L) alarms += 1
      }
      (et, g.length.toLong, maxG, alarms)
    }
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")
  }

  test("hurst: per-block R/S replay at n=4; slope from the 3 scale means") {
    import graft.ops.AnalyticsOps
    val rows = AnalyticsOps.hurst(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val xs = Tables.events(spark, sfTiny)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x")).orderBy(col("day")).collect()
      .map(_.getLong(1))
    def meanLn(n: Int): Long = {
      val lns = xs.grouped(n).filter(_.length == n).flatMap { blk =>
        val tb = blk.sum; val qb = blk.map(v => v * v).sum
        val cum = blk.scanLeft(0L)(_ + _).tail
        val ndev = cum.zipWithIndex.map { case (p, i) =>
          n * p - (i + 1) * tb }
        val rn = ndev.max - math.min(ndev.min, 0L)
        val n2var = n * qb - tb * tb
        if (n2var > 0 && rn > 0)
          Some(math.round(math.log(rn.toDouble /
            math.sqrt(n2var.toDouble)) * 1000000.0))
        else None
      }.toSeq
      (2 * lns.sum + lns.length) / (2L * lns.length)
    }
    for ((n, nb, mln, _) <- rows) {
      assert(mln == meanLn(n.toInt), s"mean ln(R/S) at n=$n")
      assert(nb == xs.grouped(n.toInt).count(_.length == n.toInt))
    }
    // slope replay over the three (ln n, mean) points
    val pts = rows.map(t => (math.log(t._1.toDouble), t._3 / 1.0e6))
    val k = pts.length
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val (sxx, sxy) = (pts.map(p => p._1 * p._1).sum,
      pts.map(p => p._1 * p._2).sum)
    val slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert(math.abs(rows.head._4 - slope) < 1e-4, "OLS slope")
  }
}
