package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorExprs

/** Hybrid retrieval — the fusion layer on top of the lexical
  * ([[TextOps.bm25]]) and semantic ([[SimilarityOps]]) scorers: one
  * ranked list from each modality, combined by reciprocal-rank fusion.
  * Documents and embeddings share the id space (doc_id ≡ vec_id in the
  * synthetic corpus), which is exactly the layout of a production
  * doc-store + vector-index pair.
  */
object RetrievalOps {

  /** RRF constant (Cormack et al. 2009 use k=60; it damps the head so
    * one list's #1 can't drown the other list's consensus). */
  private val RrfK = 60
  private val ListK = 50
  private val OutK = 20

  // ------------------------------------------------------- RRF fusion
  /** Reciprocal-rank fusion of the BM25 ranking (fixed query-term set)
    * with the cosine ranking for query vector 0:
    * score(d) = Σ_lists 1/(60 + rank_list(d)), missing-from-list
    * contributing 0 — the standard score-free list fusion (rank-only,
    * so BM25 and cosine calibration never need to agree). Top-[[OutK]]
    * fused docs with both source ranks, null where a doc appears in
    * only one list (full-outer semantics).
    *
    * Parity: ranks are integers, so each reciprocal lives on the exact
    * integer lattice 1000000 div (60+rank) — floor division in both
    * engines, summed as longs; no float enters the fusion.
    *
    * Scale shape: each side reduces to its own top-[[ListK]] BEFORE the
    * fusion join — the fused relation is ≤ 2·[[ListK]] rows per query
    * regardless of corpus size, so the full-outer join and the final
    * rank are noise. The corpus-scale work happens inside the two
    * operands (BM25's term-filtered explode, the ANN scan — each
    * already adjudicated); the single-partition ranking windows here
    * order ≤ [[ListK]]-row lists, the same sanctioned pattern as the
    * per-query top-k in SimilarityOps. At 100 TB the semantic side
    * would read the IVF/PQ index rather than brute-force — the fusion
    * layer is unchanged, which is the point of rank-only fusion.
    */
  def rrfFusion(spark: SparkSession, sfDir: String): DataFrame = {
    VectorExprs.register(spark)
    val lex = TextOps.bm25(spark, sfDir)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))))
      .filter(col("lex_rank") <= ListK)
      .select(col("doc_id"), col("lex_rank"))
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val sem = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .withColumn("cosine", expr(
        "vec_dot(qv, embedding) / (sqrt(vec_dot(qv, qv)) * sqrt(vec_dot(embedding, embedding)))"))
      .withColumn("sem_rank", row_number().over(
        Window.orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("sem_rank") <= ListK)
      .select(col("vec_id").as("doc_id"), col("sem_rank"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf_e6",
        coalesce(expr(s"1000000 div ($RrfK + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($RrfK + sem_rank)"), lit(0L)))
      .withColumn("frank", row_number().over(
        Window.orderBy(col("rrf_e6").desc, col("doc_id"))))
      .filter(col("frank") <= OutK)
      .select(col("frank"), col("doc_id"), col("lex_rank"), col("sem_rank"),
        col("rrf_e6"))
      .orderBy(col("frank"))
  }

  private lazy val rrfFusionOracle =
    s"""WITH bm AS (${TextOps.bm25Oracle}),
       |lex AS (
       |  SELECT doc_id, lex_rank FROM (
       |    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
       |    FROM bm) WHERE lex_rank <= $ListK),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |sem AS (
       |  SELECT doc_id, sem_rank FROM (
       |    SELECT vec_id AS doc_id,
       |           ROW_NUMBER() OVER (
       |             ORDER BY ${SimilarityOps.cosineSql("qv", "embedding")} DESC,
       |             vec_id) AS sem_rank
       |    FROM embeddings CROSS JOIN q WHERE vec_id <> 0) WHERE sem_rank <= $ListK),
       |fused AS (
       |  SELECT doc_id, lex_rank, sem_rank,
       |         COALESCE(1000000 // ($RrfK + lex_rank), 0) +
       |         COALESCE(1000000 // ($RrfK + sem_rank), 0) AS rrf_e6
       |  FROM lex FULL JOIN sem USING (doc_id))
       |SELECT CAST(frank AS INTEGER) AS frank, doc_id,
       |       CAST(lex_rank AS INTEGER) AS lex_rank,
       |       CAST(sem_rank AS INTEGER) AS sem_rank, rrf_e6 FROM (
       |  SELECT ROW_NUMBER() OVER (ORDER BY rrf_e6 DESC, doc_id) AS frank, *
       |  FROM fused) WHERE frank <= $OutK ORDER BY frank""".stripMargin

  // -------------------------------------------- PRF query expansion
  private val PrfQ = Seq("spark", "join", "window")
  private val PrfFb = 10   // feedback depth (top docs mined for terms)
  private val PrfExpK = 5  // expansion terms adopted
  private val PrfOut = 15  // final ranking depth
  private val PrfTfCap = 3 // capped term frequency (lattice BM15-style)

  /** Pseudo-relevance-feedback query expansion (Rocchio 1971 / the
    * RM-style PRF every Lucene/Terrier deployment ships): retrieve with
    * the base query, assume the top [[PrfFb]] docs are relevant, mine
    * them for the [[PrfExpK]] highest-weight non-query terms
    * (idf × feedback-frequency — the Rocchio centroid on a count
    * lattice), re-retrieve with the expanded query (original terms at
    * weight 2, expansion terms at weight 1), and report the final
    * top-[[PrfOut]] with BOTH ranks so the re-ranking is visible in
    * the output itself.
    *
    * Scoring is the EXACT-lattice retrieval variant: idf quantizes
    * once per term to e6 micro-nats, tf is capped at [[PrfTfCap]]
    * (BM15-style saturation — the float-pipeline flagship lives in
    * [[TextOps.bm25]]; two chained float rankings would compound ulp
    * drift, exactly what a two-round pipeline can't afford), so every
    * score is an exact integer sum and both rankings are total orders.
    *
    * Scale shape: one (doc, term) tf aggregate feeds everything; df is
    * its term-rollup (UNHINTED join — vocab-sized); the two global
    * rank windows are the [[rrfFusion]] WindowGroupLimit shape (a
    * per-partition limit runs below the sort, ≤ list-k rows cross);
    * the feedback term mine is a [[PrfFb]]-doc semi-join and the
    * expanded query is a ≤ 8-row broadcast. At 100 TB the tf table is
    * the index — this is two index probes and a bounded mine.
    */
  def prfExpand(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.agg(count(lit(1)).as("n"))
    val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .withColumn("tfc", least(col("tf"), lit(PrfTfCap.toLong)))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = dfT.crossJoin(broadcast(n))
      .select(col("term"), round(log((col("n") + 1.0) / (col("df") + 1.0))
        * 1000000.0, 0).cast("long").as("idf_e6"))
    val s1 = tf.filter(col("term").isin(PrfQ: _*))
      .join(idf, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("idf_e6") * col("tfc")).as("s1_e6"))
    val rank1 = s1.withColumn("rank_base", row_number().over(
      Window.orderBy(col("s1_e6").desc, col("doc_id"))))
    val fb = rank1.filter(col("rank_base") <= PrfFb).select(col("doc_id"))
    val expTerms = tf.join(fb, Seq("doc_id"), "left_semi")
      .filter(!col("term").isin(PrfQ: _*))
      .groupBy(col("term")).agg(sum(col("tfc")).as("cf_fb"))
      .join(idf, Seq("term"))
      .select(col("term"), (col("idf_e6") * col("cf_fb")).as("wt"))
      .orderBy(col("wt").desc, col("term")).limit(PrfExpK)
      .select(col("term"), lit(1L).as("qw"))
    val baseTerms = {
      import spark.implicits._
      PrfQ.map(t => (t, 2L)).toDF("term", "qw")
    }
    val q1 = expTerms.unionByName(baseTerms)
    val s2 = tf.join(broadcast(q1), Seq("term"))
      .join(idf, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("qw") * col("idf_e6") * col("tfc")).as("s2_e6"))
    s2.withColumn("rank_exp", row_number().over(
      Window.orderBy(col("s2_e6").desc, col("doc_id"))))
      .filter(col("rank_exp") <= PrfOut)
      .join(rank1.filter(col("rank_base") <= ListK)
        .select(col("doc_id"), col("rank_base"), col("s1_e6")), Seq("doc_id"), "left")
      .select(col("rank_exp"), col("doc_id"), col("s2_e6"),
        col("rank_base"), col("s1_e6"))
      .orderBy(col("rank_exp"))
  }

  private val prfExpandOracle = {
    val qIn = PrfQ.map(t => s"'$t'").mkString(", ")
    s"""WITH n AS (SELECT COUNT(*) AS n FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf,
       |              LEAST(COUNT(*), $PrfTfCap) AS tfc
       |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |             FROM documents)
       |       GROUP BY doc_id, term),
       |dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |idf AS (SELECT term, CAST(ROUND(ln((n + 1.0) / (df + 1.0))
       |                          * 1000000.0) AS BIGINT) AS idf_e6
       |        FROM dfx CROSS JOIN n),
       |s1 AS (SELECT doc_id, CAST(SUM(idf_e6 * tfc) AS BIGINT) AS s1_e6
       |       FROM tf JOIN idf USING (term) WHERE term IN ($qIn)
       |       GROUP BY doc_id),
       |r1 AS (SELECT doc_id, s1_e6, ROW_NUMBER() OVER
       |         (ORDER BY s1_e6 DESC, doc_id) AS rank_base FROM s1),
       |fb AS (SELECT doc_id FROM r1 WHERE rank_base <= $PrfFb),
       |expt AS (SELECT term, 1 AS qw FROM (
       |    SELECT t.term, CAST(SUM(t.tfc) AS BIGINT) * i.idf_e6 AS wt
       |    FROM tf t JOIN idf i USING (term)
       |    WHERE t.doc_id IN (SELECT doc_id FROM fb)
       |      AND t.term NOT IN ($qIn)
       |    GROUP BY t.term, i.idf_e6)
       |  QUALIFY ROW_NUMBER() OVER (ORDER BY wt DESC, term) <= $PrfExpK),
       |q1 AS (SELECT * FROM expt
       |       UNION ALL SELECT unnest([$qIn]) AS term, 2 AS qw),
       |s2 AS (SELECT doc_id, CAST(SUM(q.qw * i.idf_e6 * t.tfc) AS BIGINT)
       |                        AS s2_e6
       |       FROM tf t JOIN q1 q USING (term) JOIN idf i USING (term)
       |       GROUP BY doc_id),
       |r2 AS (SELECT doc_id, s2_e6, ROW_NUMBER() OVER
       |         (ORDER BY s2_e6 DESC, doc_id) AS rank_exp FROM s2)
       |SELECT CAST(r2.rank_exp AS INTEGER) AS rank_exp, r2.doc_id, r2.s2_e6,
       |       CAST(b.rank_base AS INTEGER) AS rank_base, b.s1_e6
       |FROM r2 LEFT JOIN (SELECT * FROM r1 WHERE rank_base <= $ListK) b
       |  USING (doc_id)
       |WHERE r2.rank_exp <= $PrfOut
       |ORDER BY r2.rank_exp""".stripMargin
  }

  // ------------------------------------------------------- nDCG eval
  /** Retrieval-quality evaluation of the fused ranking — nDCG@20
    * against label ground truth (a candidate is relevant iff it shares
    * the query vector's cluster label): DCG = Σ rel_r / log2(1+r) over
    * the fused top-20, normalized by the ideal DCG of ranking all
    * |relevant| docs first. The eval loop a retrieval deployment runs
    * per index build — the [[SimilarityOps.annRecall]] discipline
    * applied to the fusion layer.
    *
    * Parity: the per-rank gain 1e6/log2(1+r) is quantized to the e6
    * integer lattice (20 distinct values — log2 is the one
    * transcendental, same ≤1-ulp acceptance as ln elsewhere); DCG and
    * IDCG are then exact integer sums, and the final ratio is one
    * IEEE-exact long/long double division rounded at 6 dp.
    *
    * Scale shape: everything after the fused top-k is k-sized — the
    * label join is a broadcast against 20 rows, the ideal-gain explode
    * generates min(|rel|, 20) rows. The corpus-scale work lives in the
    * operands, as in annRecall.
    */
  def ndcg(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"))
    val qLabel = labels.filter(col("vec_id") === 0)
      .select(col("label").as("qlabel"))
    val nRel = labels.crossJoin(broadcast(qLabel))
      .filter(col("vec_id") =!= 0 && col("label") === col("qlabel"))
      .agg(count(lit(1)).as("n_rel_total"))
    val gained = rrfFusion(spark, sfDir)
      .join(labels, col("doc_id") === col("vec_id"))
      .crossJoin(broadcast(qLabel))
      .withColumn("rel", when(col("label") === col("qlabel"), 1L).otherwise(0L))
      .withColumn("g_e6",
        round(lit(1000000.0) / log2(col("frank") + lit(1)), 0).cast("long"))
      .agg(count(lit(1)).as("k"), sum(col("rel")).as("n_rel_topk"),
        sum(col("rel") * col("g_e6")).as("dcg_e6"))
    val ideal = nRel
      .select(col("n_rel_total"), explode(expr(
        s"sequence(1, least(n_rel_total, $OutK))")).as("r"))
      .withColumn("g_e6",
        round(lit(1000000.0) / log2(col("r") + lit(1)), 0).cast("long"))
      .groupBy(col("n_rel_total"))
      .agg(sum(col("g_e6")).as("idcg_e6"))
    gained.crossJoin(broadcast(ideal))
      .select(col("k"), col("n_rel_total"), col("n_rel_topk"),
        col("dcg_e6"), col("idcg_e6"),
        round(col("dcg_e6").cast("double") / col("idcg_e6"), 6).as("ndcg"))
  }

  private lazy val ndcgOracle =
    s"""WITH fused AS ($rrfFusionOracle),
       |q AS (SELECT label AS qlabel FROM embeddings WHERE vec_id = 0),
       |rel_tot AS (
       |  SELECT COUNT(*) AS n_rel_total
       |  FROM embeddings CROSS JOIN q
       |  WHERE vec_id <> 0 AND label = qlabel),
       |gained AS (
       |  SELECT COUNT(*) AS k,
       |         CAST(SUM(CASE WHEN label = qlabel THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_rel_topk,
       |         CAST(SUM((CASE WHEN label = qlabel THEN 1 ELSE 0 END) *
       |                  CAST(ROUND(1000000.0 / log2(frank + 1)) AS BIGINT))
       |              AS BIGINT) AS dcg_e6
       |  FROM fused JOIN embeddings ON doc_id = vec_id CROSS JOIN q),
       |ideal AS (
       |  SELECT n_rel_total,
       |         CAST(SUM(CAST(ROUND(1000000.0 / log2(r + 1)) AS BIGINT))
       |              AS BIGINT) AS idcg_e6
       |  FROM rel_tot, LATERAL unnest(range(1, LEAST(n_rel_total, $OutK) + 1)) AS t(r)
       |  GROUP BY n_rel_total)
       |SELECT k, n_rel_total, n_rel_topk, dcg_e6, idcg_e6,
       |       ROUND(CAST(dcg_e6 AS DOUBLE) / idcg_e6, 6) AS ndcg
       |FROM gained CROSS JOIN ideal""".stripMargin

  // ------------------------------------------------------- MMR rerank
  /** Candidate-pool and selection sizes for [[mmrRerank]]. */
  private val MmrPool = 20
  private val MmrOut = 5
  private val MmrLambda = 0.7

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein
    * 1998) — the diversification pass between retrieval and the
    * context window: from each query's top-[[MmrPool]] cosine
    * candidates, greedily select [[MmrOut]] maximizing
    * λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s), so near-duplicate
    * candidates can't crowd out coverage (the retrieval-time twin of
    * the dedup family's corpus-time work).
    *
    * The greedy loop is UNROLLED into [[MmrOut]] relational steps
    * (the pagerank-hop precedent): each step joins the remaining
    * candidates to the already-selected set over the precomputed
    * candidate-pair similarity frame, and takes the per-query argmax
    * as a partial-aggregable `min(struct(-score, cid))` — no window,
    * no sort. Per query the work is bounded by pool² = 400 pair rows
    * and [[MmrOut]] tiny joins; across queries it distributes
    * embarrassingly — at 100 TB of queries the plan shape is
    * unchanged, and the candidate pools would come from the IVF/PQ
    * index instead of the brute-force scan (fusion-layer invariance,
    * as with RRF).
    *
    * Parity: rel and pairwise sims are the module's sequential-fold
    * cosine — bit-identical doubles in both engines — and the MMR
    * combination is two IEEE multiplies and a subtract, so the
    * greedy's argmax decisions (cid-tiebroken) agree exactly; only
    * displayed values are rounded.
    */
  def mmrRerank(spark: SparkSession, sfDir: String): DataFrame = {
    VectorExprs.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("norm", sqrt(expr("vec_dot(embedding, embedding)")))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("norm").as("qn"))
    val cand = e.select(col("vec_id").as("cid"), col("embedding").as("cv"),
      col("norm").as("cn"))
      .crossJoin(broadcast(q)).filter(col("qid") =!= col("cid"))
      .withColumn("rel", expr("vec_dot(qv, cv)") / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("rel").desc, col("cid"))))
      .filter(col("rk") <= MmrPool)
      .select(col("qid"), col("cid"), col("cv"), col("cn"), col("rel"))
      .localCheckpoint()
    val sims = cand.select(col("qid"), col("cid").as("c1"),
        col("cv").as("v1"), col("cn").as("n1"))
      .join(cand.select(col("qid"), col("cid").as("c2"),
        col("cv").as("v2"), col("cn").as("n2")), Seq("qid"))
      .filter(col("c1") =!= col("c2"))
      .select(col("qid"), col("c1"), col("c2"),
        (expr("vec_dot(v1, v2)") / (col("n1") * col("n2"))).as("sim"))
      .localCheckpoint()
    val pool = cand.select(col("qid"), col("cid"), col("rel"))
    def argmax(scored: DataFrame, step: Int): DataFrame =
      scored.groupBy(col("qid"))
        .agg(min(struct((col("mmr") * -1.0d).as("neg"), col("cid"),
          col("rel"), col("mmr"))).as("w"))
        .select(col("qid"), lit(step.toLong).as("step"),
          col("w.cid").as("cid"), col("w.rel").as("rel"), col("w.mmr").as("mmr"))
    // each iteration's maxsim reads `selected`, and the final result
    // unions every step — without a per-iteration checkpoint the union
    // re-executes step i's joins once per later step (the iterative-
    // loop lesson); the frame is ≤ 5 rows per query, so the
    // checkpoint is free
    var selected = argmax(pool.withColumn("mmr", col("rel")), 1)
      .localCheckpoint()
    for (step <- 2 to MmrOut) {
      val maxsim = sims
        .join(selected.select(col("qid"), col("cid").as("c2")), Seq("qid", "c2"))
        .groupBy(col("qid"), col("c1").as("cid")).agg(max(col("sim")).as("ms"))
      val scored = pool
        .join(selected.select(col("qid"), col("cid")), Seq("qid", "cid"),
          "left_anti")
        .join(maxsim, Seq("qid", "cid"))
        .withColumn("mmr",
          lit(MmrLambda) * col("rel") - lit(1.0 - MmrLambda) * col("ms"))
      selected = selected.union(argmax(scored, step)).localCheckpoint()
    }
    selected
      .select(col("qid"), col("step"), col("cid"),
        round(col("rel"), 6).as("rel6"), round(col("mmr"), 6).as("mmr6"))
      .orderBy(col("qid"), col("step"))
  }

  private val mmrRerankOracle = {
    val cos = SimilarityOps.cosineSql("a.embedding", "b.embedding")
    // unrolled greedy, one CTE pair (m_i scores / s_i winner) per step
    val steps = (2 to MmrOut).map { i =>
      val prev = s"sel${i - 1}"
      s"""m$i AS (
         |  SELECT c.qid, c.cid, c.rel, MAX(si.sim) AS ms
         |  FROM cand c
         |  JOIN sims si ON si.qid = c.qid AND si.c1 = c.cid
         |  JOIN $prev p ON p.qid = si.qid AND p.cid = si.c2
         |  WHERE NOT EXISTS (SELECT 1 FROM $prev x
         |                    WHERE x.qid = c.qid AND x.cid = c.cid)
         |  GROUP BY 1, 2, 3),
         |s$i AS (
         |  SELECT qid, $i AS step, cid, rel,
         |         $MmrLambda * rel - ${1.0 - MmrLambda} * ms AS mmr
         |  FROM m$i
         |  QUALIFY row_number() OVER (PARTITION BY qid
         |    ORDER BY $MmrLambda * rel - ${1.0 - MmrLambda} * ms DESC, cid) = 1),
         |sel$i AS (SELECT qid, step, cid, rel, mmr FROM sel${i - 1}
         |          UNION ALL SELECT qid, step, cid, rel, mmr FROM s$i)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings
       |           WHERE vec_id < 5),
       |cand AS (
       |  SELECT qid, cid, rel FROM (
       |    SELECT a.qid, b.vec_id AS cid, $cos AS rel,
       |           row_number() OVER (PARTITION BY a.qid
       |                              ORDER BY $cos DESC, b.vec_id) AS rk
       |    FROM q a JOIN embeddings b ON b.vec_id <> a.qid)
       |  WHERE rk <= $MmrPool),
       |sims AS (
       |  SELECT a.qid, a.cid AS c1, b.cid AS c2,
       |         ${SimilarityOps.cosineSql("e1.embedding", "e2.embedding")} AS sim
       |  FROM cand a JOIN cand b ON b.qid = a.qid AND b.cid <> a.cid
       |  JOIN embeddings e1 ON e1.vec_id = a.cid
       |  JOIN embeddings e2 ON e2.vec_id = b.cid),
       |sel1 AS (
       |  SELECT qid, 1 AS step, cid, rel, rel AS mmr FROM cand
       |  QUALIFY row_number() OVER (PARTITION BY qid
       |                             ORDER BY rel DESC, cid) = 1),
       |$steps
       |SELECT qid, CAST(step AS BIGINT) AS step, cid,
       |       ROUND(rel, 6) AS rel6, ROUND(mmr, 6) AS mmr6
       |FROM sel$MmrOut ORDER BY qid, step""".stripMargin
  }

  // ------------------------------------------------- Kendall tau
  /** Kendall rank correlation between the two shipped lexical
    * scorers (Kendall '38; the IR-diagnostic that says whether BM25
    * and the Dirichlet QLM would PAGE the same docs — τ near 1 means
    * the cheaper scorer can serve, τ near 0 means they disagree and
    * a fusion like [[rrfFusion]] earns its keep): over the top-100
    * BM25 docs, concordant minus discordant score-pairs. Pure
    * COMPOSITION of `q_bm25` and `q_qlm_dirichlet` — the scorers the
    * library actually ships, so the bake-off can't drift (the
    * forecastEval/mcnemar discipline for retrieval).
    *
    * Exactness: both inputs are already ROUND(·,4)-lattice scores
    * (their own hash gates prove engine equality), so every pairwise
    * comparison is exact; the census is integers, τ-a is one final
    * rounded ratio. Scale shape: the pair frame is the BOUNDED
    * top-k² (4 950 pairs), built by a self-join of a 100-row frame. */
  def kendallTau(spark: SparkSession, sfDir: String): DataFrame = {
    val top = TextOps.bm25(spark, sfDir)
      .select(col("doc_id"), col("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(100)
    val q = TextOps.qlmDirichlet(spark, sfDir)
      .select(col("doc_id"), col("qlm"))
    val j = top.join(q, Seq("doc_id"))
    val pairs = j.as("x").join(j.as("y"),
      col("x.doc_id") < col("y.doc_id"))
      .select(
        ((col("x.bm25") - col("y.bm25")) *
          (col("x.qlm") - col("y.qlm"))).as("prod"),
        (col("x.bm25") === col("y.bm25")).as("tie_b"),
        (col("x.qlm") === col("y.qlm")).as("tie_q"))
    pairs.agg(count(lit(1)).as("n_pairs"),
      sum(when(col("prod") > 0, 1L).otherwise(0L)).as("concordant"),
      sum(when(col("prod") < 0, 1L).otherwise(0L)).as("discordant"),
      sum(when(col("tie_b"), 1L).otherwise(0L)).as("ties_bm25"),
      sum(when(col("tie_q"), 1L).otherwise(0L)).as("ties_qlm"))
      .select(col("n_pairs"), col("concordant"), col("discordant"),
        col("ties_bm25"), col("ties_qlm"),
        round((col("concordant") - col("discordant")).cast("double") /
          col("n_pairs"), 6).as("tau_a"))
  }

  private val kendallTauOracle =
    s"""WITH bm AS (${TextOps.bm25Oracle}),
       |ql AS (${TextOps.qlmDirichletOracle}),
       |top AS (SELECT doc_id, bm25 FROM bm
       |        ORDER BY bm25 DESC, doc_id LIMIT 100),
       |j AS (SELECT t.doc_id, t.bm25, ql.qlm
       |      FROM top t JOIN ql USING (doc_id)),
       |p AS (SELECT (x.bm25 - y.bm25) * (x.qlm - y.qlm) AS prod,
       |        x.bm25 = y.bm25 AS tie_b, x.qlm = y.qlm AS tie_q
       |      FROM j x JOIN j y ON x.doc_id < y.doc_id)
       |SELECT COUNT(*) AS n_pairs,
       |       CAST(SUM(CASE WHEN prod > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS concordant,
       |       CAST(SUM(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS discordant,
       |       CAST(SUM(CASE WHEN tie_b THEN 1 ELSE 0 END) AS BIGINT)
       |         AS ties_bm25,
       |       CAST(SUM(CASE WHEN tie_q THEN 1 ELSE 0 END) AS BIGINT)
       |         AS ties_qlm,
       |       ROUND(CAST(SUM(CASE WHEN prod > 0 THEN 1 ELSE 0 END)
       |                  - SUM(CASE WHEN prod < 0 THEN 1 ELSE 0 END)
       |                  AS DOUBLE) / COUNT(*), 6) AS tau_a
       |FROM p""".stripMargin

  // ------------------------------------------------- Spearman rho
  /** Spearman rank correlation between the same two shipped scorers
    * [[kendallTau]] compares (Spearman 1904) — the OTHER standard
    * rank-agreement diagnostic, and the one that weights by rank
    * DISTANCE rather than counting inversions (a swap at the top and
    * a swap at the bottom cost kendall the same; spearman charges the
    * square of the displacement). Ties get average ranks (the
    * tie-corrected estimator), so the classic 1−6Σd²/n(n²−1) shortcut
    * is invalid; this computes Pearson over the rank vectors, which
    * is the definition that stays correct under ties.
    *
    * Exactness: average ranks are half-integers, so both rank vectors
    * are DOUBLED into exact integers (2·rank_min + ties − 1; Pearson
    * is affine-invariant so the ×2 cancels), every moment is an exact
    * integer sum over the bounded 100-row frame, and ρ is one final
    * rounded double. Scale shape: identical to [[kendallTau]] — the
    * scorers are distributed rollups, the comparison frame is the
    * bounded top-k (TakeOrdered, no global window on the corpus), and
    * the rank windows run on those 100 rows. */
  def spearmanRho(spark: SparkSession, sfDir: String): DataFrame = {
    val top = TextOps.bm25(spark, sfDir)
      .select(col("doc_id"), col("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(100)
    val j = top.join(
      TextOps.qlmDirichlet(spark, sfDir).select(col("doc_id"), col("qlm")),
      Seq("doc_id"))
    // bounded 100-row frame: the unpartitioned windows below are safe
    def dr(c: String) = // doubled average rank: 2·rank_min + ties − 1
      (lit(2) * rank().over(Window.orderBy(col(c))) +
        count(lit(1)).over(Window.partitionBy(col(c))) - 1).cast("long")
    val ranked = j.withColumn("rb", dr("bm25")).withColumn("rq", dr("qlm"))
    ranked.agg(
      count(lit(1)).as("n"),
      sum(col("rb")).as("sx"), sum(col("rq")).as("sy"),
      sum(col("rb") * col("rb")).as("sxx"),
      sum(col("rq") * col("rq")).as("syy"),
      sum(col("rb") * col("rq")).as("sxy"))
      .select(col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double")),
          6).as("rho_spearman"))
  }

  private val spearmanRhoOracle =
    s"""WITH bm AS (${TextOps.bm25Oracle}),
       |ql AS (${TextOps.qlmDirichletOracle}),
       |top AS (SELECT doc_id, bm25 FROM bm
       |        ORDER BY bm25 DESC, doc_id LIMIT 100),
       |j AS (SELECT t.doc_id, t.bm25, ql.qlm
       |      FROM top t JOIN ql USING (doc_id)),
       |r AS (SELECT
       |        2 * rank() OVER (ORDER BY bm25)
       |          + COUNT(*) OVER (PARTITION BY bm25) - 1 AS rb,
       |        2 * rank() OVER (ORDER BY qlm)
       |          + COUNT(*) OVER (PARTITION BY qlm) - 1 AS rq
       |      FROM j),
       |m AS (SELECT COUNT(*) AS n,
       |        CAST(SUM(rb) AS BIGINT) AS sx, CAST(SUM(rq) AS BIGINT) AS sy,
       |        CAST(SUM(rb * rb) AS BIGINT) AS sxx,
       |        CAST(SUM(rq * rq) AS BIGINT) AS syy,
       |        CAST(SUM(rb * rq) AS BIGINT) AS sxy
       |      FROM r)
       |SELECT n,
       |       ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
       |             sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
       |                  CAST(n * syy - sy * sy AS DOUBLE)), 6)
       |         AS rho_spearman
       |FROM m""".stripMargin

  // ------------------------------------------------- rank-biased overlap
  /** Rank-biased overlap between the BM25 and QLM top-100 lists
    * (Webber, Moffat & Zobel TOIS'10) — the third member of the
    * rank-agreement trio and the one built for RANKINGS rather than
    * paired scores: [[kendallTau]] weights every inversion equally,
    * [[spearmanRho]] by displacement, RBO is TOP-WEIGHTED (a swap at
    * rank 2 matters more than one at rank 90 — exactly how users read
    * result lists) and handles non-conjoint lists (a doc in one
    * engine's top-k but not the other's). RBO@k = (1−p)·Σ_{d≤k}
    * p^(d−1)·X_d/d with X_d = |top_B[1..d] ∩ top_Q[1..d]|, p = 0.9
    * (the paper's "first ~10 ranks carry ~86% of the weight").
    *
    * The overlap prefix X_d needs no d×d work: a doc enters every
    * overlap from depth max(rank_B, rank_Q) on, so X_d is ONE
    * cumulative window over the per-doc max-rank histogram.
    * Exactness: X_d are exact ints on a bounded 100-row frame; each
    * depth term is quantized to e12 and integer-summed. Scale shape:
    * two TakeOrdered(100) off the distributed scorers, a 100-row
    * full-outer join, windows on the bounded frame only. */
  private val RboP = 0.9
  private val RboK = 100

  def rbo(spark: SparkSession, sfDir: String): DataFrame = {
    def top(df: DataFrame, score: String): DataFrame = df
      .select(col("doc_id"), col(score))
      .orderBy(col(score).desc, col("doc_id"))
      .limit(RboK)
      // bounded 100-row frame: the unpartitioned window is safe
      .withColumn("rk", row_number().over(
        Window.orderBy(col(score).desc, col("doc_id"))))
      .select(col("doc_id"), col("rk"))
    val tb = top(TextOps.bm25(spark, sfDir), "bm25")
    val tq = top(TextOps.qlmDirichlet(spark, sfDir), "qlm")
    val entry = tb.withColumnRenamed("rk", "rb")
      .join(tq.withColumnRenamed("rk", "rq"), Seq("doc_id"))
      .select(greatest(col("rb"), col("rq")).as("m"))
      .groupBy(col("m")).agg(count(lit(1)).as("c"))
    val depths = spark.range(1, RboK + 1).select(col("id").as("d"))
    val xd = depths.join(entry, col("m") <= col("d"), "left")
      .groupBy(col("d")).agg(coalesce(sum(col("c")), lit(0L)).as("x"))
    xd
      .withColumn("term_e12",
        round(pow(lit(RboP), col("d") - 1) * col("x") / col("d")
          * lit(1e12), 0).cast("long"))
      .agg(sum(col("term_e12")).as("s"),
        max(when(col("d") === RboK, col("x"))).as("overlap_at_k"))
      .select(lit(RboK).as("depth"), lit(RboP).as("p"),
        col("overlap_at_k"),
        round(col("s").cast("double") * (1.0 - RboP) / 1e12, 6)
          .as("rbo"))
  }

  private val rboOracle =
    s"""WITH bm AS (${TextOps.bm25Oracle}),
       |ql AS (${TextOps.qlmDirichletOracle}),
       |tb AS (SELECT doc_id, row_number()
       |         OVER (ORDER BY bm25 DESC, doc_id) AS rb
       |       FROM (SELECT doc_id, bm25 FROM bm
       |             ORDER BY bm25 DESC, doc_id LIMIT $RboK)),
       |tq AS (SELECT doc_id, row_number()
       |         OVER (ORDER BY qlm DESC, doc_id) AS rq
       |       FROM (SELECT doc_id, qlm FROM ql
       |             ORDER BY qlm DESC, doc_id LIMIT $RboK)),
       |e AS (SELECT GREATEST(rb, rq) AS m, COUNT(*) AS c
       |      FROM tb JOIN tq USING (doc_id) GROUP BY 1),
       |xd AS (SELECT d, COALESCE(SUM(c), 0) AS x
       |       FROM range(1, ${RboK + 1}) t(d)
       |       LEFT JOIN e ON e.m <= t.d GROUP BY d),
       |s AS (SELECT
       |    CAST(SUM(CAST(ROUND(pow($RboP, d - 1) * x / d * 1e12)
       |             AS BIGINT)) AS BIGINT) AS s,
       |    MAX(CASE WHEN d = $RboK THEN x END) AS overlap_at_k
       |  FROM xd)
       |SELECT $RboK AS depth, CAST($RboP AS DOUBLE) AS p,
       |       CAST(overlap_at_k AS BIGINT) AS overlap_at_k,
       |       ROUND(CAST(s AS DOUBLE) * ${1.0 - RboP} / 1e12, 6) AS rbo
       |FROM s""".stripMargin

  // ------------------------------------------------- context packing
  /** Token-budget context assembly — the last step of a RAG serving
    * path: the retrieved candidates (the shipped [[graft.ops.TextOps
    * .bm25]] scorer, one ranking definition) are packed into a
    * 512-token context under two constraints a production packer
    * enforces: a per-source diversity cap (≤ 3 docs per source, so one
    * crawl domain can't fill the window) and prefix-greedy budget
    * packing (docs enter in score order while the running token total
    * fits; token lengths are positive, so cum ≤ budget IS the prefix
    * property — one window, no iterative scan).
    *
    * Scale shape: the scorer and the per-source cap are distributed
    * (score rollup + a source-partitioned window); the global
    * score-order step is orderBy+limit(64) — a distributed TakeOrdered,
    * NOT a single-partition window over the corpus (the round-9 ntile
    * lesson) — and the running-sum window then runs on that bounded
    * 64-row frame, which is the real shape: a packer always works on a
    * bounded retrieved set.
    */
  private val PackBudget = 512L
  private val PackPerSource = 3
  private val PackCandidates = 64

  def contextPack(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = graft.ops.TextOps.bm25(spark, sfDir)
      .select(col("doc_id"), col("dl"), col("bm25"))
      .join(Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source")), Seq("doc_id"))
    val bySource = Window.partitionBy(col("source"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
    val cand = scored
      .withColumn("sr", row_number().over(bySource))
      .filter(col("sr") <= PackPerSource)
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(PackCandidates)
    val packOrder = Window.orderBy(col("bm25").desc, col("doc_id").asc)
    cand // bounded 64-row frame: the global windows below are safe
      .withColumn("rank", row_number().over(packOrder))
      .withColumn("cum_tokens", sum(col("dl")).over(
        packOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= PackBudget)
      .select(col("rank"), col("doc_id"), col("source"), col("dl"),
        col("bm25"), col("cum_tokens"))
      .orderBy(col("rank"))
  }

  private lazy val contextPackOracle =
    s"""WITH b AS (${graft.ops.TextOps.bm25Oracle}),
       |j AS (SELECT b.doc_id, b.dl, b.bm25, d.source
       |      FROM b JOIN documents d USING (doc_id)),
       |dv AS (SELECT *, row_number() OVER (PARTITION BY source
       |         ORDER BY bm25 DESC, doc_id) AS sr FROM j),
       |cand AS (SELECT * FROM dv WHERE sr <= $PackPerSource
       |         ORDER BY bm25 DESC, doc_id LIMIT $PackCandidates),
       |packed AS (
       |  SELECT *,
       |         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank,
       |         SUM(dl) OVER (ORDER BY bm25 DESC, doc_id
       |                       ROWS UNBOUNDED PRECEDING) AS cum_tokens
       |  FROM cand)
       |SELECT CAST(rank AS INTEGER) AS rank, doc_id, source, dl, bm25,
       |       CAST(cum_tokens AS BIGINT) AS cum_tokens
       |FROM packed WHERE cum_tokens <= $PackBudget
       |ORDER BY rank""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_context_pack" -> (contextPack _),
    "q_rrf_fusion" -> (rrfFusion _),
    "q_kendall_tau" -> (kendallTau _),
    "q_spearman" -> (spearmanRho _),
    "q_rbo" -> (rbo _),
    "q_prf_expand" -> (prfExpand _),
    "q_ndcg" -> (ndcg _),
    "q_mmr_rerank" -> (mmrRerank _)
  )

  def oracles: Map[String, String] = Map(
    "q_context_pack" -> contextPackOracle,
    "q_rrf_fusion" -> rrfFusionOracle,
    "q_kendall_tau" -> kendallTauOracle,
    "q_spearman" -> spearmanRhoOracle,
    "q_rbo" -> rboOracle,
    "q_prf_expand" -> prfExpandOracle,
    "q_ndcg" -> ndcgOracle,
    "q_mmr_rerank" -> mmrRerankOracle
  )
}
