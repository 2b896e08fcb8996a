package graft

import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Brute-force verification of the LSH dedup operators. These operators
  * are ALSO DuckDB-oracle-checked (the md5-derived hash families are
  * exact in both engines); this spec adds the orthogonal guarantee the
  * oracle cannot: ground truth recomputed DRIVER-SIDE in plain Scala
  * from the raw document text — independent of every Spark SQL operator
  * under test — compared against the distributed pipelines at sf0.01
  * (500 docs, so the all-pairs truth is 125k comparisons).
  */
class DedupSpec extends SparkSpec {

  /** doc_id → distinct word-3-gram shingle set, straight from the text. */
  private lazy val truthShingles: Map[Long, Set[String]] = {
    val docs = Tables.documents(spark, sfSmall)
      .select(col("doc_id"), col("text")).collect()
    docs.iterator.map { r =>
      val ws = r.getString(1).split(" ", -1)
      r.getLong(0) -> (if (ws.length < 3) Set.empty[String]
                       else ws.sliding(3).map(_.mkString(" ")).toSet)
    }.filter(_._2.nonEmpty).toMap
  }

  private def jaccard(a: Set[String], b: Set[String]): Double = {
    val inter = (a & b).size
    if (inter == 0) 0.0 else inter.toDouble / (a.size + b.size - inter)
  }

  /** All pairs with true Jaccard ≥ threshold (exhaustive driver loop). */
  private def truePairs(threshold: Double): Map[(Long, Long), Double] = {
    val ids = truthShingles.keys.toArray.sorted
    val out = Map.newBuilder[(Long, Long), Double]
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val jac = jaccard(truthShingles(ids(i)), truthShingles(ids(j)))
      if (jac >= threshold) out += ((ids(i), ids(j)) -> jac)
    }
    out.result()
  }

  test("minhash: every reported pair is a true near-dup (subset of brute force)") {
    val out = DedupOps.dedupMinhash(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val truth = truePairs(0.5)
    out.foreach { case (pair, jac) =>
      assert(truth.contains(pair), s"minhash reported a false positive: $pair")
      assert(math.abs(truth(pair) - jac) < 1e-6,
        s"jaccard mismatch for $pair: spark=$jac truth=${truth(pair)}")
    }
  }

  test("minhash: recall vs brute-force Jaccard >= 0.5") {
    val out = DedupOps.dedupMinhash(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = truePairs(0.5).keySet
    assert(truth.nonEmpty, "fixture has no true near-dup pairs")
    val recall = out.size.toDouble / truth.size
    info(f"minhash recall: ${out.size}/${truth.size} = $recall%.3f")
    // With 4 bands of 4 hashes, P(candidate) at s=0.9 is already 0.986;
    // the fixture's dup pairs all have J >= 0.9, so recall must be high.
    assert(recall >= 0.8, s"minhash recall $recall below 0.8")
  }

  test("minhash output == band-collision candidates ∩ {J >= 0.5} (LSH plumbing is exact)") {
    // Band buckets join on the RAW 4-tuple of minhash values (no
    // second-level hash): recompute candidates from the collected
    // signature matrix and intersect with the driver-side truth — this
    // must equal the distributed output exactly.
    val sig = DedupOps.minhashSignatures(
      DedupOps.shingleArrays(Tables.documents(spark, sfSmall)))
      .collect()
      .map(r => r.getLong(0) -> (0 until 16).map(i => r.getLong(i + 1)).toVector)
    val cands = for {
      i <- sig.indices; j <- (i + 1) until sig.length
      (da, sa) = sig(i); (db, sb) = sig(j)
      if (0 until 4).exists(b => sa.slice(b * 4, b * 4 + 4) == sb.slice(b * 4, b * 4 + 4))
    } yield if (da < db) (da, db) else (db, da)
    val truth = truePairs(0.5).keySet
    val expected = cands.toSet.filter(truth.contains)
    val out = DedupOps.dedupMinhash(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == expected,
      s"minhash output != expected: missing=${expected -- out}, extra=${out -- expected}")
  }

  test("simhash output == ALL pairs with Hamming <= 3 (banding is exhaustive by pigeonhole)") {
    // 4 bands × 8 bits: <= 3 differing bits can touch at most 3 bands, so
    // at least one band is identical — the LSH candidate set provably
    // covers every Hamming<=3 pair and the output must be exactly that set.
    val sigs = DedupOps.simhashSignatures(spark, sfSmall).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val expected = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if h <= 3
    } yield (sigs(i)._1, sigs(j)._1, h)).toSet
    val out = DedupOps.dedupSimhash(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == expected,
      s"simhash output != brute force: missing=${expected -- out}, extra=${out -- expected}")
  }

  test("ngram jaccard query matches driver-side brute force with the df cap") {
    val ids = truthShingles.keys.toArray.sorted
    val df = scala.collection.mutable.Map.empty[String, Int]
    truthShingles.values.foreach(_.foreach(g => df(g) = df.getOrElse(g, 0) + 1))
    val rare = df.collect { case (g, c) if c <= 50 => g }.toSet
    val capped = truthShingles.map { case (d, s) => d -> (s & rare) }
    val expected = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = capped(ids(i)); b = capped(ids(j))
      jac = jaccard(a, b)
      if jac >= 0.3
    } yield (ids(i), ids(j))).toSet
    val out = DedupOps.dedupNgramJaccard(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == expected,
      s"ngram jaccard != brute force: missing=${expected -- out}, extra=${out -- expected}")
  }

  test("connected components: chains, stars, and isolated pairs resolve transitively") {
    // the sf0.01 minhash graph is all 2-cliques — this pins the
    // MULTI-HOP propagation the oracle never exercises there: a 5-node
    // chain (needs >= 3 iterations), a star, and an isolated pair.
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), // chain -> component 1
      (10L, 11L), (10L, 12L), (10L, 13L),     // star  -> component 10
      (20L, 21L)                               // pair  -> component 20
    ).toDF("d1", "d2")
    val labels = graft.ops.DedupOps.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L), s"got $labels")
  }

  test("repeated substrings match driver-side interval-union ground truth") {
    val got = DedupOps.repeatedSubstrings(spark, sfTiny).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_tok"), r.getAs[Long]("n_regions"),
          r.getAs[Long]("rep_tokens"))).toMap
    val texts = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val k = 8
    // corpus-wide shingle counts on the raw strings (no hashing at all)
    val counts = collection.mutable.Map.empty[String, Int]
    texts.foreach { case (_, ws) =>
      (0 to ws.length - k).foreach { p =>
        val s = ws.slice(p, p + k).mkString(" ")
        counts(s) = counts.getOrElse(s, 0) + 1
      }
    }
    texts.foreach { case (id, ws) =>
      val flagged = (0 to ws.length - k)
        .filter(p => counts(ws.slice(p, p + k).mkString(" ")) > 1)
      var (tokens, regions, prev) = (0L, 0L, -1)
      flagged.foreach { p =>
        tokens += (if (prev < 0) k else math.min(p - prev, k)).toLong
        if (prev < 0 || p - prev > k - 1) regions += 1L
        prev = p
      }
      val (nTok, nReg, repTok) = got(id)
      assert(nTok == ws.length, s"doc $id token count")
      assert(nReg == regions && repTok == tokens,
        s"doc $id: got ($nReg, $repTok) want ($regions, $tokens)")
    }
  }

  test("span dedup matches driver-side keep-first ground truth") {
    // recompute the C4-style rule in plain Scala: iterate documents in
    // (doc_id, block index) order, keep a block only on first sight
    val docs = Tables.documents(spark, sfSmall)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val truth = docs.map { case (id, text) =>
      val ws = text.split(" ", -1)
      val spans = (0 until math.ceil(ws.length / 10.0).toInt)
        .map(i => ws.slice(i * 10, i * 10 + 10).mkString(" "))
      val kept = spans.count(s => seen.add(s))
      id -> ((spans.size.toLong, kept.toLong))
    }.toMap
    val got = graft.ops.DedupOps.spanDedup(spark, sfSmall).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == truth, {
      val bad = truth.keys.filter(k => got.get(k) != truth.get(k)).take(3)
      s"span accounting differs at docs $bad"
    })
    val totalKept = truth.values.map(_._2).sum
    info(s"${truth.values.map(_._1).sum} spans, $totalKept kept")
  }

  test("incremental dedup ledger matches driver-side recompute") {
    val docs = Tables.documents(spark, sfSmall)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val (batch, corpus) = docs.partition(_._1 % 7 == 3)
    // exact channel keys on the same 40-char canonical prefix dedupExact uses
    val corpusTexts = corpus.map(_._3.take(40)).toSet
    val crossPairs = graft.ops.DedupOps.dedupSimhash(spark, sfSmall)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 7 == 3) != (b % 7 == 3) }
    val nearIds = crossPairs.map { case (a, b) => if (a % 7 == 3) a else b }.toSet
    val truth = batch.groupBy(_._2).view.mapValues { rows =>
      val ex = rows.count(r => corpusTexts.contains(r._3.take(40)))
      val nr = rows.count(r => !corpusTexts.contains(r._3.take(40)) && nearIds(r._1))
      (rows.length.toLong, ex.toLong, nr.toLong,
        rows.length.toLong - ex - nr)
    }.toMap
    val got = graft.ops.DedupOps.incrementalDedup(spark, sfSmall).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == truth, s"ledger differs: $got vs $truth")
    // sanity: the fixture actually exercises both drop channels
    assert(truth.values.map(_._2).sum > 0, "no exact drops in fixture")
    assert(truth.values.map(_._3).sum > 0, "no near drops in fixture")
  }

  test("dedup apply keeps exactly one doc per cluster plus all unclustered") {
    val docs = Tables.documents(spark, sfSmall)
    val total = docs.count()
    val clusters = graft.ops.DedupOps.dedupClusters(spark, sfSmall).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val clusteredNodes = clusters.map(_._2).sum // n_members per cluster
    val expectedKept = total - (clusteredNodes - clusters.length)
    val ledger = graft.ops.DedupOps.dedupApply(spark, sfSmall).collect()
    assert(ledger.map(_.getLong(1)).sum == expectedKept,
      s"kept ${ledger.map(_.getLong(1)).sum} != $expectedKept " +
        s"($total docs, ${clusters.length} clusters, $clusteredNodes members)")
    // the materialized corpus on disk agrees with the ledger
    val onDisk = spark.read.parquet(
      s"${graft.etl.Medallion.warehouse(sfSmall)}/dedup_corpus").count()
    assert(onDisk == expectedKept, s"disk $onDisk != $expectedKept")
  }

  test("containment: measures consistent, Jaccard-caught pairs agree") {
    val rows = DedupOps.containmentDedup(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    assert(rows.nonEmpty, "injected-dup fixture must produce containment pairs")
    rows.foreach { case (a, b, na, shared, c, j, missed) =>
      assert(a != b)
      assert(shared <= na, s"($a,$b) shared exceeds containee size")
      assert(shared * 10 >= na * 8, s"($a,$b) below the 80% gate")
      assert(c >= 0.8 - 1e-9 && c <= 1.0, s"($a,$b) containment $c out of range")
      assert(j <= c + 1e-9, s"($a,$b) jaccard $j above containment $c")
      assert(missed == (j < 0.3), s"($a,$b) missed flag inconsistent")
    }
    // every containment pair Jaccard DOES catch must be in the
    // symmetric detector's pair set (same index, same measures)
    val jaccardPairs = DedupOps.dedupNgramJaccard(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.filterNot(_._7).foreach { case (a, b, _, _, _, _, _) =>
      val key = (math.min(a, b), math.max(a, b))
      assert(jaccardPairs.contains(key),
        s"pair $key caught by jaccard here but absent from q_dedup_ngram_jaccard")
    }
  }

  test("cross-source matrix conserves the verified pair table") {
    val pairs = DedupOps.dedupMinhash(spark, sfSmall).collect()
    val matrix = DedupOps.crossSourceDups(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(matrix.map(_._3).sum == pairs.length, "pair mass not conserved")
    matrix.foreach { case (a, b, n, same) =>
      assert(a <= b, s"($a,$b) not normalized upper-triangular")
      assert(same == (a == b))
      assert(n > 0)
    }
  }

  test("golden record: consistent with the cluster table, survivorship bounds") {
    val clusters = DedupOps.dedupClusters(spark, sfSmall).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val golden = DedupOps.goldenRecord(spark, sfSmall).collect()
    assert(golden.map(_.getLong(0)).toSet == clusters.keySet,
      "golden-record clusters differ from the cluster table")
    val chars = Tables.documents(spark, sfSmall)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    golden.foreach { r =>
      val (cluster, members) = (r.getLong(0), r.getLong(1))
      val (nMembers, maxMember) = clusters(cluster)
      assert(members == nMembers, s"cluster $cluster member count")
      val (canonDoc, canonChars) = (r.getLong(2), r.getLong(3))
      val firstDoc = r.getLong(4)
      assert(firstDoc <= canonDoc && canonDoc <= maxMember,
        s"cluster $cluster canon_doc $canonDoc outside member id range")
      assert(canonChars == chars(canonDoc), s"cluster $cluster canon_chars")
      assert(r.getLong(5) <= members && r.getLong(6) <= members,
        s"cluster $cluster distinct langs/sources exceed membership")
      // the canonical member is the longest: total over n members can't
      // beat n * canon_chars, and must at least include canon itself
      val total = r.getLong(7)
      assert(total >= canonChars && total <= members * canonChars,
        s"cluster $cluster total_chars $total inconsistent with canon")
    }
  }
  test("lsh sweep: candidate sets nest as bands widen, recall never rises with rows") {
    val rows = graft.ops.DedupOps.lshTuning(spark, sfTiny).collect()
      .sortBy(_.getAs[Long]("rows_per_band"))
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_cand"))
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_truth"))
    }
    // fewer rows per band = strictly more permissive: (8,2)-candidates
    // include every (4,4) candidate pair count-wise, likewise (2,8)
    val cands = rows.map(_.getAs[Long]("n_cand"))
    assert(cands(0) >= cands(1) && cands(1) >= cands(2),
      s"candidate counts must be monotone: ${cands.toSeq}")
    val recalls = rows.map(_.getAs[Long]("recall_e6"))
    assert(recalls(0) >= recalls(1) && recalls(1) >= recalls(2))
  }

  // ------------------------------------------------------- PPJoin
  /** doc_id → distinct word-5-gram shingle set (ppjoin's universe). */
  private lazy val truthShingles5: Map[Long, Set[String]] = {
    val docs = Tables.documents(spark, sfSmall)
      .select(col("doc_id"), col("text")).collect()
    docs.iterator.map { r =>
      val ws = r.getString(1).split(" ", -1)
      r.getLong(0) -> (if (ws.length < 5) Set.empty[String]
                       else ws.sliding(5).map(_.mkString(" ")).toSet)
    }.filter(_._2.nonEmpty).toMap
  }

  private def truePairs5(threshold: Double): Map[(Long, Long), Double] = {
    val ids = truthShingles5.keys.toArray.sorted
    val out = Map.newBuilder[(Long, Long), Double]
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val jac = jaccard(truthShingles5(ids(i)), truthShingles5(ids(j)))
      if (jac >= threshold) out += ((ids(i), ids(j)) -> jac)
    }
    out.result()
  }

  test("ppjoin: exact — equals brute-force tau=0.6 pairs, no misses, no extras") {
    val out = ops.DedupOps.ppjoin(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    val truth = truePairs5(0.6)
    assert(out.keySet == truth.keySet,
      s"ppjoin pair set differs from brute force: " +
        s"missed=${(truth.keySet -- out.keySet).take(3)} " +
        s"extra=${(out.keySet -- truth.keySet).take(3)}")
    out.foreach { case (p, j) =>
      assert(math.abs(truth(p) - j) < 1e-6, s"jaccard mismatch at $p")
    }
  }

  test("ppjoin: prefix filter prunes the pair space >100x (witness column)") {
    val rows = ops.DedupOps.ppjoin(spark, sfSmall).collect()
    assert(rows.nonEmpty)
    val nCand = rows.head.getLong(6)
    val n = truthShingles5.size.toLong
    assert(nCand >= rows.length, "candidates must cover every result pair")
    assert(nCand * 100 < n * (n - 1) / 2,
      s"prefix filter only reached $nCand of ${n * (n - 1) / 2} pairs")
  }

  // ------------------------------------------------ edit-distance join
  test("edit join: exact — equals brute-force levenshtein<=2 on prefixes") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val pre = Tables.documents(spark, sfSmall)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).take(24)))
    val truth = (for {
      i <- pre.indices.iterator
      j <- (i + 1) until pre.length
      ed = lev(pre(i)._2, pre(j)._2) if ed <= 2
    } yield {
      val (a, b) = (pre(i)._1, pre(j)._1)
      (math.min(a, b), math.max(a, b)) -> ed.toLong
    }).toMap
    val got = ops.DedupOps.editJoin(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got.keySet == truth.keySet,
      s"edit-join pair set differs from brute force: " +
        s"missed=${(truth.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- truth.keySet).take(3)}")
    got.foreach { case (p, ed) =>
      assert(ed == truth(p), s"edit distance mismatch at $p")
    }
  }

  test("edit join: fixture precondition — no prefix below (k+1)·q chars") {
    // editJoin applies the Gravano count threshold T = (L−q+1) − k·q
    // uniformly; for prefixes shorter than (k+1)·q = 15 the bound is
    // vacuous (T ≤ 0) and a true pair could share zero q-grams. The
    // general-data path is EditJoinRewrite, which length-splits and
    // routes short strings through a direct levenshtein leg
    // (EditJoinRewriteSpec proves that with sub-15-char rows); the
    // hand-specialized query instead carries this documented
    // precondition — pin it so a testdata regeneration that introduces
    // short documents turns a silent completeness loss into a red spec.
    for (sf <- Seq(sfTiny, sfSmall)) {
      val nShort = Tables.documents(spark, sf)
        .filter(length(substring(col("text"), 1, 24)) < 15).count()
      assert(nShort == 0,
        s"$sf has $nShort documents with sub-15-char prefixes — " +
          "editJoin's count filter is vacuous for them; route them " +
          "through a direct levenshtein leg (see EditJoinRewrite)")
    }
  }

  // ---------------------------------------------------- winnowing
  // md5Long / winnowTruth come from SparkSpec — shared with the
  // streaming twin's suite so both test the same ground truth

  test("winnowing: fingerprint sets match the driver-side recompute exactly") {
    val sparkFp = ops.DedupOps
      .winnowFingerprints(Tables.documents(spark, sfSmall))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val docs = Tables.documents(spark, sfSmall)
      .select(col("doc_id"), col("text")).collect()
    docs.foreach { r =>
      val truth = winnowTruth(r.getString(1))
      val got = sparkFp.getOrElse(r.getLong(0), Set.empty[Long])
      assert(got == truth, s"fingerprints differ for doc ${r.getLong(0)}")
    }
  }

  test("winnowing: any shared run of k+w-1=8 tokens yields a shared fingerprint") {
    import spark.implicits._
    val run = (0 until 8).map(i => s"run$i").mkString(" ")
    val fillerA = (0 until 40).map(i => s"aa$i").mkString(" ")
    val fillerB = (0 until 40).map(i => s"bb$i").mkString(" ")
    val docs = Seq((1L, s"$fillerA $run"), (2L, s"$run $fillerB"))
      .toDF("doc_id", "text")
    val fp = ops.DedupOps.winnowFingerprints(docs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((fp(1L) & fp(2L)).nonEmpty,
      "the winnowing guarantee missed an 8-token shared run")
    // and the density promise: far fewer fingerprints than k-grams
    val nGrams = 48 - 5 + 1
    assert(fp(1L).size < nGrams / 2, s"fingerprint density too high: ${fp(1L).size}")
  }

  /** Driver-side replay of the CDC cut rule (boundary after word i iff
    * md5-60bit of the trailing 3-gram ≡ 0 mod 8, i ≥ 3). */
  private def cdcChunks(ws: Seq[String]): Seq[String] = {
    val out = scala.collection.mutable.Buffer[Seq[String]]()
    var cur = scala.collection.mutable.Buffer[String]()
    for (i <- 1 to ws.length) {
      cur += ws(i - 1)
      if (i >= 3 && md5Long(s"${ws(i - 3)} ${ws(i - 2)} ${ws(i - 1)}") % 8 == 0) {
        out += cur.toSeq; cur = scala.collection.mutable.Buffer[String]()
      }
    }
    if (cur.nonEmpty) out += cur.toSeq
    out.toSeq.map(_.mkString(" "))
  }

  test("cdcChunk: boundaries re-align after a prefix insertion (the CDC property)") {
    // a long stream (several docs concatenated) so many cuts exist
    val ws = Tables.documents(spark, sfSmall)
      .orderBy(col("doc_id")).limit(8).collect()
      .flatMap(_.getAs[String]("text").split(" ")).toSeq
    val orig = cdcChunks(ws)
    val edited = cdcChunks(Seq("inserted", "prefix", "words") ++ ws)
    // fixed-size blocks would shift EVERY block; content-defined cuts
    // re-align at the first post-insertion boundary, so the two chunk
    // sequences share their entire tail
    val shared = orig.reverse.zip(edited.reverse).takeWhile { case (a, b) => a == b }.length
    assert(orig.size > 3, s"fixture doc chunked into only ${orig.size}")
    assert(shared >= orig.size - 2,
      s"CDC re-alignment failed: only $shared of ${orig.size} tail chunks survive a prefix edit")
  }

  test("cdcChunk: per-source census conserves the global chunk store") {
    val rows = ops.DedupOps.cdcChunk(spark, sfSmall).collect()
    val toks = Tables.documents(spark, sfSmall)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getString(1).split(" ").toSeq)
    val all = toks.flatMap(cdcChunks)
    assert(rows.map(_.getAs[Long]("chunks")).sum == all.length)
    assert(rows.map(_.getAs[Long]("bytes_logical")).sum ==
      all.map(_.length.toLong).sum)
    // owned chunks partition the distinct store: every distinct chunk
    // owned exactly once, and stored bytes count each text once
    assert(rows.map(_.getAs[Long]("chunks_owned")).sum == all.distinct.length)
    assert(rows.map(_.getAs[Long]("bytes_stored")).sum ==
      all.distinct.map(_.length.toLong).sum)
    rows.foreach { r =>
      assert(r.getAs[Long]("bytes_stored") <= r.getAs[Long]("bytes_logical"))
      val share = r.getAs[Double]("stored_share")
      assert(share >= 0 && share <= 1)
    }
  }

}
