package graft

import org.apache.spark.sql.functions._

import graft.ops.{CurationOps, RetrievalOps}

/** Semantics of the curation/selection layer — the DuckDB oracle pins
  * the arithmetic; these pin the MEANING (selection direction, sketch
  * guarantees, budget conservation, fusion monotonicity).
  */
class CurationOpsSpec extends SparkSpec {

  test("DSIR weights: target-language docs score higher on average") {
    val rows = CurationOps.importanceWeights(spark, sfSmall).collect()
      .map(r => (r.getString(1), r.getDouble(3)))
    val (en, rest) = rows.partition(_._1 == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    val meanEn = en.map(_._2).sum / en.length
    val meanRest = rest.map(_._2).sum / rest.length
    // the whole point of importance weighting: docs FROM the target
    // distribution look more like it than docs from elsewhere
    assert(meanEn > meanRest,
      s"en mean $meanEn not above non-target mean $meanRest")
  }

  test("nucleus filter == driver-side prefix recompute; 80% gate exact") {
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").length.toLong))
    val truth = docs.groupBy(_._2).view.mapValues { ds =>
      val sorted = ds.sortBy(d => (-d._3, d._1))
      val tot = sorted.map(_._3).sum
      var cum = 0L
      val kept = sorted.takeWhile { d => cum += d._3; cum * 5 <= tot * 4 }
      (ds.length.toLong, kept.length.toLong, tot, kept.map(_._3).sum)
    }.toMap
    val got = CurationOps.nucleusFilter(spark, sfTiny).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == truth.keySet)
    got.foreach { case (lang, g) =>
      assert(g == truth(lang), s"$lang: $g != ${truth(lang)}")
      // a kept set is never everything unless the tail is tiny, and
      // never exceeds the 80% integer gate
      assert(g._4 * 5 <= g._3 * 4, s"$lang kept mass over the 80% gate")
    }
  }

  test("CMS: estimate >= exact count always; exact matches recount") {
    val truth = Tables.documents(spark, sfSmall)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" "))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = CurationOps.cmsFreq(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 20)
    rows.foreach { case (term, exact, est, over) =>
      assert(truth(term) == exact, s"$term exact $exact != ${truth(term)}")
      assert(est >= exact, s"$term CMS underestimated: $est < $exact")
      assert(over == est - exact)
    }
    // the deliberately narrow w=8 sketch must actually collide on the
    // 31-term fixture vocab — otherwise the min/overcount path is dead
    assert(rows.exists(_._4 > 0), "no collisions: sketch too wide for fixture")
    // top-20 by count: ranking matches the recount
    val expect = truth.toSeq.sortBy { case (t, n) => (-n, t) }.take(20).map(_._1)
    assert(rows.map(_._1).toSeq == expect)
  }

  test("normalize dedup: funnel is monotone n_docs >= n_norm >= n_bag") {
    val rows = CurationOps.normalizeDedup(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._2).sum == 500)
    rows.foreach { case (lang, nDocs, nNorm, nBag, nDup) =>
      assert(nDocs >= nNorm, s"$lang: norm grew the set")
      assert(nNorm >= nBag, s"$lang: bag is a weaker equality, can't exceed norm")
      assert(nDup == nDocs - nBag)
    }
  }

  test("epoch cap: allocation conserves budget, respects capacity") {
    val rows = CurationOps.epochCap(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getLong(4)))
    val totCap = rows.map(_._2).sum
    val budget = totCap * 19 / 20
    val alloc = rows.map(_._3).sum
    assert(alloc <= budget, s"over-allocated: $alloc > $budget")
    // fixed-two-pass water-filling may leave a residual, but it must be
    // small: under one source's weight-share of the second pass
    assert(budget - alloc < totCap / rows.length,
      s"residual ${budget - alloc} too large for a converged allocation")
    rows.foreach { case (src, cap, a, pinned, epochsE6) =>
      assert(a <= cap, s"$src allocated over capacity")
      assert(epochsE6 <= 1000000L, s"$src epochs_e6 $epochsE6 > 1.0 epoch")
      assert(a * 1000000L / cap == epochsE6, s"$src epochs_e6 inconsistent")
      if (pinned) assert(a == cap, s"$src pinned but not at capacity")
    }
    // the fixture must exercise the cap (uniform corpus + sqrt weights
    // pin the smallest sources at 95% budget)
    assert(rows.exists(_._4), "no source pinned: cap path unexercised")
    assert(rows.exists(!_._4), "all sources pinned: budget degenerate")
  }

  test("RRF fusion: scores recompute from ranks and rank monotonically") {
    val rows = RetrievalOps.rrfFusion(spark, sfSmall).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Int]),
        Option(r.get(3)).map(_.asInstanceOf[Int]), r.getLong(4)))
    assert(rows.length == 20)
    assert(rows.map(_._1).toSeq == (1 to 20), "frank not 1..20")
    rows.foreach { case (_, doc, lex, sem, rrfE6) =>
      val want = lex.map(r => 1000000L / (60 + r)).getOrElse(0L) +
        sem.map(r => 1000000L / (60 + r)).getOrElse(0L)
      assert(rrfE6 == want, s"doc $doc rrf $rrfE6 != $want from ranks $lex/$sem")
      assert(lex.nonEmpty || sem.nonEmpty, s"doc $doc in neither list")
    }
    // fused order is non-increasing in score with doc_id tiebreak
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 > b._5 || (a._5 == b._5 && a._2 < b._2),
        s"fusion order violated between ${a._2} and ${b._2}")
    }
    // both modalities contribute to the consensus head
    assert(rows.take(5).exists(r => r._3.nonEmpty && r._4.nonEmpty),
      "no doc in the top-5 appears in both lists")
  }
}
