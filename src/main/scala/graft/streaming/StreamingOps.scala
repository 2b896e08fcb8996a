package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming renditions of the mobility pipeline (§2.9).
  *
  * The reference is strictly batch-per-day — Airflow fans out one
  * bronze+silver task per daily file (`dags/mitma/mitma_task_DAG.py:153,
  * 156`) — so streaming EXCEEDS reference semantics; it is here because
  * a Spark-native engine at 100 TB ingests the same daily drops as a
  * file-source stream and gets incremental state, late-data handling,
  * and exactly-once sinks for free. The operators mirror the batch
  * layer's semantics so the two paths are mutually checkable (the spec
  * asserts streaming output == the batch aggregation of the same rows).
  *
  * Scale notes: the windowed aggregate is a streaming state store keyed
  * by (window, zone) — the watermark bounds state size by evicting
  * closed windows; without it, state grows without bound. The
  * sessionizer keeps ONE small state object per active user key and
  * emits on event-time timeout, so state is proportional to concurrent
  * activity, not history.
  */
object StreamingOps {

  /** Streaming HTML → text extraction — the crawl front door
    * ([[graft.ops.HtmlOps.htmlExtract]]) as pages ARRIVE, which is how
    * a crawl actually delivers them: the extraction + triage +
    * quality verdict are completely STATELESS map-side work, so the
    * twin is the batch op's own factored
    * [[graft.ops.HtmlOps.extractFrame]] applied per micro-batch — no
    * state store, no watermark, nothing to replay; exactly-once comes
    * free from the sink. Input schema: (doc_id, html).
    *
    * Scale shape: this is the ideal streaming operator — per-arrival
    * CPU with zero shuffle; at 100 TB the crawl frontier fans into
    * partitions and every executor extracts independently.
    */
  def htmlExtractStream(pages: DataFrame):
      DataFrame =
    graft.ops.HtmlOps.extractFrame(pages)

  /** The WHOLE crawl front door as one streaming chain — wire bytes
    * in, quality-gated text out: charset triage + mojibake repair
    * ([[graft.ops.HtmlOps.repairFrame]]) feeding HTML extraction +
    * the factored quality verdict
    * ([[graft.ops.HtmlOps.extractFrame]]). Both stages are the batch
    * ops' own factored frame functions — one definition per stage,
    * composed here exactly as a crawler's ingest path would run them;
    * stateless map-side end to end, so no state store, no watermark,
    * and exactly-once from the sink. Input schema: (doc_id, raw
    * binary). */
  def frontDoorStream(raw: DataFrame): DataFrame =
    graft.ops.HtmlOps.extractFrame(
      graft.ops.HtmlOps.repairFrame(raw)
        .select(col("doc_id"), col("repaired").as("html")))

  /** The crawl chain from the CONTAINER up — WARC files in,
    * quality-gated text out: the record walk + HTTP split
    * ([[graft.ops.HtmlOps.warcSplitFrame]], the batch `q_warc_scan`'s
    * own splitter) fans each arriving WARC into its response bodies,
    * which then ride the [[frontDoorStream]] chain unchanged (charset
    * repair → extraction → quality). Four stages, one definition
    * each, all stateless map-side — this is the shape of a crawler's
    * live ingest: Common Crawl segments land as files, and every
    * downstream operator sees per-document rows without a batch
    * re-spool. Input schema: (file_id, warc binary). */
  def warcFrontDoorStream(files: DataFrame): DataFrame =
    frontDoorStream(
      graft.ops.HtmlOps.warcSplitFrame(files)
        .select(col("doc_id"), col("raw")))

  /** The compressed-container ingest twin — multi-member gzip shards
    * in (the `.wet.gz` reality: segments LAND as concatenated-member
    * files), per-member triage verdicts out, via the batch
    * `q_gzip_members`' own factored walk
    * ([[graft.ops.HtmlOps.gzipMemberFrame]] — one definition).
    * Stateless map-side (member boundaries come from the inflater,
    * no index, no state store); the per-member rows append to a
    * ledger and the batch rollup over that ledger equals the batch
    * query, which StreamingSpec pins. Input schema: (file_id, gz
    * binary). */
  def gzipMembersStream(files: DataFrame): DataFrame =
    graft.ops.HtmlOps.gzipMemberFrame(files)

  /** Streaming CDX indexing — how a live archive actually builds its
    * lookup structure: each arriving WARC file fans into its
    * replayable records' CDX rows (SURT key, replay coordinates,
    * payload digest) via the batch `q_cdx_index`'s own factored
    * [[graft.ops.HtmlOps.cdxFrame]] (one indexing definition).
    * Stateless map-side — offsets are intra-file, so no state store;
    * rows append to a ledger and the read-time SURT sort equals the
    * batch query's write-time sort, which StreamingSpec pins. Input
    * schema: (file_id, warc binary). */
  def cdxStream(files: DataFrame): DataFrame =
    graft.ops.HtmlOps.cdxFrame(files)

  /** Streaming benchmark decontamination — the graded screen
    * (`q_decontam_graded`) run the way ingestion actually needs it:
    * every ARRIVING document graded against the STANDING eval-gram
    * set before it may enter the corpus. Each micro-batch runs the
    * batch op's own factored
    * [[graft.ops.PipelineOps.decontamClassFrame]] (one classification
    * definition) against the static eval frame — a stream-static
    * equi-join on the gram stream, stateless (the benchmark is fixed;
    * no state store), so the per-doc verdicts append to a ledger and
    * replay just re-appends byte-identical rows a reader dedups on
    * doc_id (the winnowStream crash contract).
    *
    * Scale shape per micro-batch: identical to batch — map-side gram
    * explode, the UNHINTED bounded eval join (AQE broadcasts it), one
    * doc-keyed count; the eval set loads once, not per batch. */
  def decontamStream(docs: DataFrame, evalGrams: DataFrame,
      ledgerTbl: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.ops.PipelineOps.decontamClassFrame(batch.toDF(), evalGrams)
          .write.mode("append").parquet(ledgerTbl)
        ()
      }
      .start()

  /** The FULL crawl funnel as a streaming ingest — the batch
    * `q_crawl_funnel`'s end-to-end twin ([[frontDoorStream]] extended
    * through quality gate, dedup fingerprinting, and benchmark
    * decontamination): each arriving WARC file runs the batch op's
    * own fused per-doc pass
    * ([[graft.ops.HtmlOps.crawlFunnelPerDoc]] — container walk →
    * charset repair → extraction → quality verdict) and then the
    * per-arrival verdict stage
    * ([[graft.ops.HtmlOps.crawlFunnelDocLedger]] — dedup fingerprint
    * + 8-gram overlap against the STANDING eval-gram set, a
    * stream-static broadcast semi-join), appending one narrow verdict
    * row per document to a ledger. The one genuinely CROSS-document
    * stage — the min-doc_id-per-fingerprint dedup keeper — is
    * resolved at read time by
    * [[graft.ops.HtmlOps.crawlFunnelRollup]] over the accumulated
    * ledger (the compaction job's half of the contract), so replay
    * just re-appends byte-identical rows the rollup absorbs — it
    * dedups the ledger on doc_id before any tally, so an
    * at-least-once retry cannot double-count the funnel's count/sum
    * columns. StreamingSpec pins ledger-rollup == batch funnel over
    * the same corpus.
    *
    * Scale shape per micro-batch: all per-document work is map-side
    * (codec walks + kernels); the only exchange is the doc-keyed
    * dirty-verdict distinct against the broadcast eval set; ledger
    * rows are ~9 narrow columns — text never leaves the batch. Input
    * schema: (file_id, warc wire bytes). */
  def crawlFunnelStream(files: DataFrame, evalGrams: DataFrame,
      ledgerTbl: String): org.apache.spark.sql.streaming.StreamingQuery =
    files.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.ops.HtmlOps.crawlFunnelDocLedger(
            graft.ops.HtmlOps.crawlFunnelPerDoc(batch.toDF()), evalGrams)
          .write.mode("append").parquet(ledgerTbl)
        ()
      }
      .start()

  /** Streaming Naive-Bayes scoring — the SERVE leg of the
    * train→infer→serve loop ([[graft.ops.CurationOps.nbTrain]] trains,
    * `nbInfer` evaluates, this scores arrivals): each micro-batch is
    * scored by the batch op's own factored
    * [[graft.ops.CurationOps.nbScoreBatch]] against the MATERIALIZED
    * trained artifact (parquet written once per session+SF — the model
    * is loaded, never re-derived per batch), and per-doc predictions
    * append to a ledger. Stateless per arrival: replay just re-appends
    * byte-identical rows a reader dedups on doc_id.
    *
    * Scale shape per micro-batch: one explode + the bounded class
    * broadcast + the unhinted count-table equi-join + a per-doc keyed
    * window — identical to batch inference, because it IS the batch
    * scoring definition.
    */
  def nbScoreStream(docs: DataFrame, sfDir: String, ledgerTbl: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.ops.CurationOps.nbScoreBatch(batch.toDF(), sfDir)
          .write.mode("append").parquet(ledgerTbl)
        ()
      }
      .start()

  /** Streaming conformal serving — arrivals scored into prediction
    * SETS against the STANDING calibration quantile (the
    * [[graft.ops.CurationOps.conformalQhatFrame]] artifact,
    * materialized once — serving never recalibrates mid-stream, that
    * would silently void the coverage guarantee): each micro-batch
    * runs the batch op's own factored
    * [[graft.ops.CurationOps.conformalScoreBatch]] and appends
    * per-doc (set size, covered) rows to a ledger. Stateless per
    * arrival; replay re-appends byte-identical rows a reader dedups
    * on doc_id. This is the serving half of `q_conformal`: the batch
    * query's scoreboard over the ledger must equal batch eval, which
    * StreamingSpec pins. */
  def conformalStream(docs: DataFrame, sfDir: String, ledgerTbl: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.ops.CurationOps.conformalScoreBatch(batch.toDF(), sfDir)
          .write.mode("append").parquet(ledgerTbl)
        ()
      }
      .start()

  /** Streaming ANN serving — query-vector arrivals probed against the
    * STANDING materialized IVF index
    * ([[graft.ops.SimilarityOps.ivfIndex]], built once — serving never
    * re-trains or re-assigns mid-stream; that would shift every cell
    * boundary under the server, the same guarantee-voiding move as
    * recalibrating conformal mid-stream): each micro-batch runs the
    * batch op's own factored
    * [[graft.ops.SimilarityOps.annServeBatch]] — bounded-centroid
    * probe assignment, broadcast of the (small) query batch into the
    * cell equi-join, per-query top-5 — and appends (qid, rank, cid,
    * cosine) rows to a ledger. Stateless per arrival; replay
    * re-appends byte-identical rows a reader dedups on (qid, rank).
    * This is the serving half of `q_ann_ivf`: the ledger must equal
    * the batch query row-for-row, which StreamingSpec pins —
    * completing the train-once/serve-many story for the similarity
    * family the way [[nbScoreStream]] did for classification.
    *
    * Scale shape per micro-batch: the index is the standing parquet
    * (bucketed by cell at 100 TB, so a probe reads only touched
    * buckets); the batch pays one ≤4096-row centroid broadcast and
    * one cell equi-join — no corpus shuffle, no state store. */
  def annServeStream(queries: DataFrame, sfDir: String, ledgerTbl: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        graft.functions.VectorExprs.register(spark)
        graft.ops.SimilarityOps.annServeBatch(
            batch.toDF()
              .withColumn("norm", sqrt(expr("vec_dot(embedding, embedding)"))),
            spark, sfDir)
          .write.mode("append").parquet(ledgerTbl)
        ()
      }
      .start()

  /** Streaming MoE routing — vector arrivals routed against the
    * STANDING 8-expert bank (the trained coarse centroids
    * [[graft.ops.SimilarityOps.moeRouter]] audits — a serving router
    * loads its gate weights, it never retrains mid-stream): each
    * micro-batch runs the batch op's own
    * [[graft.ops.SimilarityOps.moeRouteBatch]] kernel (cosine gate,
    * e6-lattice softmax, top-k rank) and appends each arrival's top-2
    * dispatch rows to a ledger. Stateless per arrival; replay
    * re-appends byte-identical rows a reader dedups on
    * (vec_id, rank). The dispatch-side sibling of [[annServeStream]]:
    * one routing definition batch and stream. */
  def moeRouteStream(vectors: DataFrame, sfDir: String, ledgerTbl: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        graft.functions.VectorExprs.register(spark)
        graft.ops.SimilarityOps.moeRouteBatch(
            batch.toDF()
              .withColumn("norm", sqrt(expr("vec_dot(embedding, embedding)"))),
            spark, sfDir)
          .filter(col("rk") <= 2)
          .select(col("vec_id"), col("rk"), col("expert"), col("g_e6"))
          .write.mode("append").parquet(ledgerTbl)
        ()
      }
      .start()

  /** Streaming binary-quantized serving — query arrivals
    * Hamming-probed against the STANDING packed sign-bit index
    * ([[graft.ops.SimilarityOps.binaryIndex]], built once; serving
    * never re-packs the corpus mid-stream): each micro-batch runs the
    * batch op's own [[graft.ops.SimilarityOps.binaryShortlist]] kernel
    * — popcount shortlist, exact rerank of the 20 — and appends the
    * per-query top-5 to a ledger. Stateless per arrival; replay
    * re-appends byte-identical rows a reader dedups on (qid, rank).
    * The compressed-serving sibling of [[annServeStream]]: one scorer
    * definition batch and stream. */
  def binaryServeStream(queries: DataFrame, sfDir: String, ledgerTbl: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        graft.ops.SimilarityOps.binaryShortlist(batch.toDF(), spark, sfDir)
          .filter(col("arank") <= 5)
          .select(col("qid"), col("arank").as("rank"), col("cid"),
            round(col("cosine"), 6).as("cosine"), col("hamming"))
          .write.mode("append").parquet(ledgerTbl)
        ()
      }
      .start()

  /** Streaming UCB1 replay — event arrivals merged into the
    * commutative (day, arm, count, reward) ledger, then the batch
    * op's own windowed kernel ([[graft.ops.StatsOps.ucbFromCells]])
    * re-folds the WHOLE ledger into the per-day pick table each
    * micro-batch (the holtWinters day-ledger discipline: one shared
    * recurrence, state re-derived not incrementally mutated — replay
    * or reordering of waves cannot diverge the picks). The pick
    * table is overwritten per batch; after the last wave it equals
    * the batch `q_ucb_bandit` output row-for-row. */
  def ucbStream(events: DataFrame, stateTbl: String, outTbl: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        graft.ops.StatsOps.ucbCells(batch.toDF())
          .write.mode("append").parquet(stateTbl)
        val merged = spark.read.parquet(stateTbl)
          .groupBy(col("day"), col("arm"))
          .agg(sum(col("c")).as("c"), sum(col("s")).as("s"))
        graft.ops.StatsOps.ucbFromCells(merged)
          .write.mode("overwrite").parquet(outTbl)
        ()
      }
      .start()

  /** Streaming PLSA topic-mix serving — document arrivals folded
    * against the STANDING trained topic-word table
    * ([[graft.ops.TextOps.plsaModel]], trained once; serving never
    * re-runs EM mid-stream): each micro-batch runs the batch op's own
    * [[graft.ops.TextOps.plsaInferFrame]] fold-in kernel and appends
    * the per-batch (lang, topic) census to a ledger. Counts and
    * theta-mass are commutative sums, so a reader re-aggregating the
    * ledger reproduces the batch census exactly — the train-once/
    * serve-many story [[annServeStream]] tells for similarity,
    * applied to the topic model. */
  def plsaServeStream(docs: DataFrame, sfDir: String, ledgerTbl: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        graft.ops.TextOps.plsaInferFrame(batch.toDF(), spark, sfDir)
          .write.mode("append").parquet(ledgerTbl)
        ()
      }
      .start()

  /** Streaming write-audit-publish — every micro-batch's (k, v) delta
    * is merged into the last PUBLISHED snapshot and committed through
    * [[graft.etl.Medallion.wapCommit]]'s gate: positivity and
    * key-count monotonicity run against the STAGED files, the pointer
    * flips only on full pass, and a poisoned batch is discarded
    * claim-and-all — downstream readers of `_LATEST` never observe it,
    * and the NEXT good batch merges onto the last good state (the
    * poisoned delta is dropped, not deferred). Appends one ledger row
    * per batch: (batch_id, n_delta, n_passed, n_checks, published,
    * live_version). This is the ingestion shape a production bronze→
    * silver stream runs: audit-then-publish per micro-batch, with the
    * lakehouse pointer as the only coordination. */
  def wapStream(updates: DataFrame, base: String, ledgerTbl: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        import graft.etl.Medallion
        val delta = batch.toDF().groupBy(col("k"))
          .agg(sum(col("v")).as("v"))
        val cur = Medallion.latestVersion(spark, base)
        val prev = cur.map(v => spark.read.parquet(s"$base/v$v"))
        val cand = prev
          .map(_.unionByName(delta).groupBy(col("k"))
            .agg(sum(col("v")).as("v")))
          .getOrElse(delta)
        val prevKeys = prev.map(_.count()).getOrElse(0L)
        val checks: Seq[DataFrame => Boolean] = Seq(
          df => df.filter(col("v") <= 0).count() == 0, // positivity
          df => df.count() >= prevKeys) // merge never loses a key
        val (passed, n, ok) = Medallion.wapCommit(spark, base, cand, checks)
        Seq((batchId, delta.count(), passed.toLong, n.toLong, ok,
          Medallion.latestVersion(spark, base).getOrElse(0)))
          .toDF("batch_id", "n_delta", "n_passed", "n_checks",
            "published", "live_version")
          .write.mode("append").parquet(ledgerTbl)
        ()
      }
      .start()

  /** Streaming Min-K% membership screening — document arrivals scored
    * against the STANDING unigram model
    * ([[graft.ops.TextOps.unigramModelMaterialized]], built once —
    * serving never refits the model mid-stream; refitting would move
    * the statistic under every previously emitted verdict): each
    * micro-batch runs the batch op's own factored
    * [[graft.ops.TextOps.minKScoreBatch]] and appends per-doc
    * (Σ bottom-k lp, k, flagged) rows to a ledger. Stateless per
    * arrival; replay re-appends byte-identical rows a reader dedups
    * on doc_id. Completes the train-once/serve-many story for the LM
    * family the way [[nbScoreStream]] did for classification and
    * [[annServeStream]] for similarity; StreamingSpec pins ledger ==
    * batch scorer row-for-row. */
  def minKStream(docs: DataFrame, sfDir: String, ledgerTbl: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.ops.TextOps.minKScoreBatch(batch.toDF(), sfDir)
          .write.mode("append").parquet(ledgerTbl)
        ()
      }
      .start()

  /** Watermarked event-time hourly OD aggregation — the streaming twin
    * of the silver hourly rollup. Append-mode emits a (window, zone) row
    * exactly once, after the watermark passes the window end. */
  def hourlyTrips(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(
        window(col("ts"), "1 hour"),
        concat(lit("Z"), lpad(pmod(col("user_id"), lit(50)).cast("string"), 3, "0"))
          .as("origin_zone"))
      .agg(sum(col("value")).as("trips"), count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour_start"), col("origin_zone"),
        col("trips"), col("n_events"))

  /** Stream–stream interval join: purchases matched to same-user views
    * within the preceding hour, BOTH sides streaming. The watermarks
    * plus the two-sided time-range condition are what make the join's
    * state bounded — Spark evicts view state once the purchase-side
    * watermark passes `view.ts + 1h`, so state is proportional to the
    * join window, not the stream history. Without the range condition
    * an inner stream-stream join would buffer both streams forever.
    */
  def streamStreamJoin(views: DataFrame, buys: DataFrame): DataFrame =
    views.withWatermark("ts", "1 hour").alias("v")
      .join(
        buys.withWatermark("ts", "1 hour").alias("b"),
        expr("""v.user_id = b.user_id AND
                v.ts <= b.ts AND v.ts >= b.ts - INTERVAL 1 HOUR"""))
      .select(col("b.user_id").as("user_id"), col("b.ts").as("buy_ts"),
        col("v.ts").as("view_ts"),
        (col("b.value") + col("v.value")).as("pair_value"))

  /** Stream–static enrichment join: a streaming event feed joined to a
    * batch dimension (user → zone/segment) — the canonical streaming
    * lookup. The static side is broadcast, so each micro-batch joins
    * map-side with no stateful join machinery and no shuffle of the
    * stream; the dimension is re-resolvable per batch (Spark re-plans
    * the static side), which is what makes slowly-changing lookups
    * work without restarts.
    */
  def enrichStream(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  /** Streaming exact dedup — the streaming twin of the batch
    * fingerprint dedup (`q_dedup_exact`): keep the first document seen
    * per content fingerprint, with state bounded by the watermark
    * (`dropDuplicatesWithinWatermark` evicts keys once the watermark
    * passes, so state is proportional to the dedup horizon, not corpus
    * history — the property that makes streaming ingest dedup viable at
    * 100 TB; the batch twin's full-history groupBy is the backfill
    * path).
    */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming incremental dedup — the streaming twin of the batch
    * ingest ledger (`q_incremental_dedup`): an arriving document is
    * dropped if its fingerprint already exists in the STATIC corpus
    * hash set, then first-arrival-deduped within the stream itself.
    * The corpus probe is a stream-static join (the static side is the
    * standing corpus index — broadcast here; bucketed and re-read per
    * micro-batch at 100 TB), written as left-outer + IS NULL because
    * stream-static LEFT ANTI is not in Spark's supported-join matrix —
    * the rewrite is the documented equivalent. In-stream dedup state
    * is watermark-bounded (`dropDuplicatesWithinWatermark`), so total
    * state is corpus-independent: the stream never holds history the
    * static index already covers. Appends exactly the rows a daily
    * ingest would admit to gold.
    */
  def incrementalDedupStream(docs: DataFrame, corpusFps: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    docs
      .join(broadcast(corpusFps.select(col("fp"), lit(1).as("in_corpus"))),
        Seq("fp"), "left")
      .filter(col("in_corpus").isNull)
      .drop("in_corpus")
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  // ------------------------------------------------------------------
  /** Streaming SemDeDup — the SEMANTIC channel that completes the
    * incremental-dedup ladder ([[incrementalDedupStream]] covers the
    * exact-md5 and in-stream channels): each arriving embedding is
    * assigned to its nearest coarse cell against the STATIC trained
    * centroid index ([[graft.ops.SimilarityOps.coarseCentroids]] —
    * broadcast, bounded by the √n cap), then judged by the SemDeDup
    * keep-rule (cosine ≥ τ to a strictly-more-diverse witness — lower
    * centroid-cosine at 6 dp, vec_id tiebreak) against (a) the
    * standing per-cell member index and (b) its own micro-batch; every
    * arrival then merges into the index (witnesses need not survive —
    * the batch rule's contract), so later batches see it. `foreachBatch`
    * because the per-vector argmax assignment and the pairwise
    * same-cell probe are batch plans — Structured Streaming's
    * stateful-aggregation matrix has no per-row argmax — and because
    * the index merge is exactly the [[incrementalGold]] upsert shape.
    *
    * Emitted decisions are FINAL (append ledger): a more-diverse
    * near-dup arriving later cannot retroactively evict an
    * already-kept vector — the same latency-vs-completeness trade
    * `dropDuplicatesWithinWatermark` makes. Under the in-order source
    * contract (arrivals in diversity-preference order — the deployed
    * shape: the standing corpus IS the most-diverse survivor set, and
    * re-ingest feeds survivors before their duplicates) the ledger's
    * drop-set equals batch [[graft.ops.SimilarityOps.semDedup]]'s
    * EXACTLY, and for any order it is a subset — StreamingSpec pins
    * the equality on preference-ordered batches of the real fixture.
    * Cell-size cap: each batch recomputes the batch op's
    * rank-round-robin subcell split over the CURRENT population
    * (standing index ∪ batch) and probes on (cell, sub), so an
    * oversized standing cell stays |cell|·cap-bounded here exactly as
    * in batch [[graft.ops.SimilarityOps.semDedup]] (on the fixture
    * every cell sits far below the cap, so nsub = 1 and the split is
    * the identity).
    *
    * Scale shape per micro-batch: centroid assignment is the batch
    * op's broadcast + narrow argmax; the probe joins the (small) batch
    * against only its own cells' index partitions (equi-join on cell —
    * at 100 TB the index is bucketed by cell so the probe reads just
    * the touched buckets); the index append is file-append, no
    * rewrite.
    *
    * Crash ordering: the ledger append lands BEFORE the index append,
    * so a crash between them can leave a batch's decisions recorded
    * with its vectors missing from the index — replaying the batch
    * (foreachBatch's redelivery contract) re-appends both; decisions
    * are deterministic, so the re-appended ledger rows are identical
    * duplicates a reader dedups on (vec_id). For exactly-once ledger
    * semantics swap the two appends into [[mergeIntoGold]]'s
    * park-and-swap rename dance.
    */
  def semDedupStream(vecs: DataFrame, centroids: DataFrame,
      indexTbl: String, ledgerTbl: String,
      tau: Double = graft.ops.SimilarityOps.SemTau.toDouble)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val cents = centroids.localCheckpoint(true) // pin the static side once
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        graft.functions.VectorExprs.register(spark)
        val fs = new org.apache.hadoop.fs.Path(indexTbl)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val assigned = graft.ops.SimilarityOps.assignWithCos(
            batch.toDF()
              .withColumn("norm", sqrt(expr("vec_dot(embedding, embedding)"))),
            cents)
          .withColumn("sc6", round(col("ccos"), 6))
          .select(col("cell"), col("vec_id"), col("embedding"), col("norm"),
            col("sc6"))
          .localCheckpoint(true) // read consistently for probe AND append
        val standing =
          if (fs.exists(new org.apache.hadoop.fs.Path(indexTbl)))
            spark.read.parquet(indexTbl)
          else assigned.limit(0)
        // the batch op's cell-size cap, applied to the CURRENT
        // population (standing ∪ batch): the same rank-round-robin
        // subcell split, recomputed per batch, keeps an oversized
        // standing cell's probe at ≤ |cell|·cap pairs instead of
        // quadratic — and keeps the stream's keep-rule the exact
        // per-batch rendition of batch semDedup's. (Splits can shift
        // as the population grows; emitted decisions stay final — the
        // documented streaming trade.)
        val subbed = graft.ops.SimilarityOps.semSubbed(
          standing.unionByName(assigned),
          graft.ops.SimilarityOps.SemMaxCell)
        val witnesses = subbed
          .select(col("cell"), col("sub"), col("vec_id").as("yid"),
            col("embedding").as("yv"), col("norm").as("yn"),
            col("sc6").as("ysc"))
        val x = subbed
          .join(assigned.select(col("vec_id")), Seq("vec_id"), "left_semi")
          .select(col("cell"), col("sub"), col("vec_id").as("xid"),
            col("embedding").as("xv"), col("norm").as("xn"),
            col("sc6").as("xsc"))
        val dropped = x.join(witnesses, Seq("cell", "sub"))
          .filter(col("xid") =!= col("yid"))
          .withColumn("c6",
            round(expr("vec_dot(xv, yv)") / (col("xn") * col("yn")), 6))
          .filter(col("c6") >= tau &&
            (col("ysc") < col("xsc") ||
              (col("ysc") === col("xsc") && col("yid") < col("xid"))))
          .select(col("xid")).distinct().withColumn("hit", lit(1L))
        assigned.select(col("vec_id"), col("cell"), col("sc6"))
          .join(dropped, col("vec_id") === col("xid"), "left")
          .select(col("vec_id"), col("cell"), col("sc6"),
            col("hit").isNotNull.as("dropped"))
          .write.mode("append").parquet(ledgerTbl)
        // every arrival joins the index — witnesses need not survive
        assigned.write.mode("append").parquet(indexTbl)
        // both consumers are written — free this batch's checkpoint
        // blocks NOW, or a long-running stream accumulates one
        // batch-sized RDD per trigger (the star-CC storage lesson)
        graft.ops.GraphOps.freeCheckpoint(assigned)
      }
      .start()
  }

  // ------------------------------------------------------------------
  /** Streaming winnowing dedup — the SUBSTRING-RUN channel completing
    * the incremental-dedup ladder ([[incrementalDedupStream]] = exact
    * md5 + in-stream; [[semDedupStream]] = semantic): each arriving
    * document's winnowing fingerprints
    * ([[graft.ops.DedupOps.winnowFingerprints]] — per-doc window math,
    * so the stream side stays map-parallel and carries the k+w−1 = 8
    * token detection guarantee) probe the STANDING fingerprint index;
    * a doc sharing ≥ 2 DISTINCT fingerprints with any LOWER-doc_id
    * document in the current population (standing index ∪ own
    * micro-batch) is dropped. ALL arrivals' fingerprints then merge
    * into the index — "dominated-by-lower-id", the deterministic
    * order-free rule, so a chain A←B←C drops both B and C even though
    * B never survived (one more drop than a greedy kept-only probe
    * would make: the conservative direction for training-data
    * hygiene, and the rule a batch recompute can replay exactly).
    * Decisions are FINAL (append ledger) and REPLAY-IDEMPOTENT: the
    * lower-id predicate applies to the standing probe too (a doc
    * never matches its own index rows after a crash-replay
    * re-delivery), and shared counts are per-DISTINCT-hash (duplicate
    * index rows from a replayed append cannot double a count past the
    * threshold) — a redelivered batch re-appends byte-identical
    * ledger rows a reader dedups on doc_id, the semDedupStream crash
    * contract. Under in-order ingest (doc_id order) the ledger's
    * drop-set equals the batch [[graft.ops.DedupOps.winnowing]] pair
    * table's d2 side exactly — StreamingSpec pins that equality plus
    * a driver recompute.
    *
    * Scale shape per micro-batch: fingerprinting is per-doc map math
    * (~7% of k-gram rows survive selection); the probe is a posting-
    * list equi-join of the batch's fingerprints against the index
    * (bucketed by hash at 100 TB so only touched buckets read); the
    * index append is file-append, no rewrite.
    */
  def winnowStream(docs: DataFrame, indexTbl: String, ledgerTbl: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(indexTbl)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val fps = graft.ops.DedupOps.winnowFingerprints(batch.toDF())
          .localCheckpoint(true) // probe AND append read one snapshot
        val standing =
          if (fs.exists(new org.apache.hadoop.fs.Path(indexTbl)))
            spark.read.parquet(indexTbl)
          else fps.limit(0)
        // lower-id predicate on BOTH probes (replay idempotence: after
        // a crash re-delivery the standing index contains this very
        // batch — self- and higher-id matches must not flip decisions),
        // and countDistinct (duplicate index rows from a replayed
        // append must not double a shared count past the threshold)
        val pairsStanding = fps.as("x")
          .join(standing.as("y"),
            col("x.h") === col("y.h") && col("y.doc_id") < col("x.doc_id"))
          .groupBy(col("x.doc_id").as("d"), col("y.doc_id").as("o"))
          .agg(countDistinct(col("x.h")).as("sh"))
        val pairsBatch = fps.as("x")
          .join(fps.as("y"),
            col("x.h") === col("y.h") && col("y.doc_id") < col("x.doc_id"))
          .groupBy(col("x.doc_id").as("d"), col("y.doc_id").as("o"))
          .agg(countDistinct(col("x.h")).as("sh"))
        val dropped = pairsStanding.unionByName(pairsBatch)
          .filter(col("sh") >= 2)
          .select(col("d")).distinct().withColumn("hit", lit(1L))
        // every arrival gets exactly one final row — docs too short to
        // fingerprint (< 8 tokens) are trivially kept
        batch.toDF().select(col("doc_id")).distinct()
          .join(dropped, col("doc_id") === col("d"), "left")
          .select(col("doc_id"), col("hit").isNotNull.as("dropped"))
          .write.mode("append").parquet(ledgerTbl)
        fps.write.mode("append").parquet(indexTbl)
        graft.ops.GraphOps.freeCheckpoint(fps)
      }
      .start()

  // ------------------------------------------------------------------
  /** Streaming cross-modal pair curation — the incremental twin of
    * [[graft.ops.MultimodalOps.pairCuration]]'s LAION-style funnel,
    * completing the ladder for image–text pairs: the caption-quality,
    * image-geometry, and CLIP-agreement gates are STATELESS map-side predicates
    * (applied per arrival via the batch op's own factored
    * [[graft.ops.MultimodalOps.pairGated]] — no re-implementation);
    * the only state is the perceptual-hash dedup, which probes the
    * STANDING index of kept pairs' hashes and the arrival's own
    * micro-batch (min-doc_id keeper), then appends the batch's KEPT
    * hashes. One final ledger row per arrival records where the
    * funnel dropped it (or `kept`).
    *
    * Replay idempotence (the winnowStream discipline): the index
    * stores (ahash, doc_id) of keepers and both probes apply the
    * LOWER-doc_id predicate, so a crash-redelivered keeper never
    * matches its own index row and re-appends byte-identical ledger
    * rows a reader dedups on doc_id. Under in-order ingest (doc_id
    * order) the ledger's kept set equals batch
    * [[graft.ops.MultimodalOps.pairCuration]]'s final-stage survivors
    * EXACTLY, and each stage's drop count equals the batch funnel's
    * stage delta — StreamingSpec pins both.
    *
    * Scale shape per micro-batch: gates are column math on the batch;
    * the dedup probe is an equi-join of the (small) batch's hashes
    * against the index (bucketed by hash at 100 TB so only touched
    * buckets read); appends are file-appends, no rewrite.
    */
  def pairCurationStream(pairs: DataFrame, indexTbl: String,
      ledgerTbl: String): org.apache.spark.sql.streaming.StreamingQuery =
    pairs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(indexTbl)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val gated = graft.ops.MultimodalOps.pairGated(batch.toDF())
          .select(col("doc_id"), col("text"), col("keep_q"),
            col("geom_ok"), col("clip_ok"))
          .localCheckpoint(true) // ledger AND probe read one snapshot
        val pass = gated.filter(
          col("keep_q") && col("geom_ok") && col("clip_ok"))
        val hashed = graft.ops.MultimodalOps.withAhash(spark, pass)
          .localCheckpoint(true)
        val standing =
          if (fs.exists(new org.apache.hadoop.fs.Path(indexTbl)))
            spark.read.parquet(indexTbl)
          else hashed.limit(0)
        // lower-id predicate on BOTH probes (replay idempotence: a
        // redelivered keeper's own index row has an EQUAL doc_id and
        // must not flip its decision)
        val dupStanding = hashed.as("x")
          .join(standing.as("y"),
            col("x.ahash") === col("y.ahash") &&
              col("y.doc_id") < col("x.doc_id"))
          .select(col("x.doc_id"))
        val dupBatch = hashed.as("x")
          .join(hashed.as("y"),
            col("x.ahash") === col("y.ahash") &&
              col("y.doc_id") < col("x.doc_id"))
          .select(col("x.doc_id"))
        val dropped = dupStanding.unionByName(dupBatch)
          .distinct().withColumn("hit", lit(1L))
        val ledger = gated
          .join(dropped, Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(!col("keep_q"), "caption_quality")
              .when(!col("geom_ok"), "image_geometry")
              .when(!col("clip_ok"), "clip_agreement")
              .when(col("hit").isNotNull, "image_dedup")
              .otherwise("kept").as("disposition"))
          .withColumn("kept", col("disposition") === "kept")
          .localCheckpoint(true) // index append filters through it
        ledger.write.mode("append").parquet(ledgerTbl)
        // only KEPT pairs join the index: the keeper IS the standing
        // representative every later duplicate must match (lower id)
        hashed.join(ledger.filter(col("kept")), Seq("doc_id"), "left_semi")
          .write.mode("append").parquet(indexTbl)
        graft.ops.GraphOps.freeCheckpoint(gated)
        graft.ops.GraphOps.freeCheckpoint(hashed)
        graft.ops.GraphOps.freeCheckpoint(ledger)
      }
      .start()

  // ------------------------------------------------------------------
  /** Native `session_window` sessionization under Structured Streaming —
    * the declarative twin of both the typed [[sessionize]] (explicit
    * `flatMapGroupsWithState`) and the batch
    * `AnalyticsOps.sessionWindowAgg`: same merge rule (events coalesce
    * while the next timestamp is at most `gap` after the previous one —
    * the boundary is INCLUSIVE, an event landing exactly `gap` later
    * still merges; a session breaks only when the gap is strictly
    * exceeded, as StreamingSpec's boundary test pins), but state
    * management, merging of
    * out-of-order events, and eviction all come from the engine's
    * session-window state store. Append mode emits a session exactly
    * once, after the watermark passes its END — so state is bounded by
    * (watermark + gap), not stream history. Prefer this form until the
    * per-session logic genuinely needs imperative state.
    */
  def sessionWindowStream(events: DataFrame,
      watermark: String = "1 hour", gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("value_sum"))

  // ------------------------------------------------------------------
  /** Streaming gold-table maintenance: each trigger's changed per-user
    * aggregates are MERGED into a persistent parquet gold table via
    * `foreachBatch` — the continuous-ingestion version of the batch
    * `Medallion.mergeUpsert`. Update-mode aggregation emits the full
    * cumulative value of only the keys a micro-batch touched, so the
    * merge is an upsert (replace touched keys, keep the rest), and the
    * gold table converges to the batch aggregate of the whole stream —
    * which is exactly what StreamingSpec asserts.
    *
    * The write swaps by double rename (current → .old, tmp → current)
    * with startup recovery from a leftover .old: there is no instant at
    * which neither the previous nor the new table is recoverable, so a
    * crash at ANY point leaves the previous table intact (possibly
    * parked at .old) and the checkpoint's batch replay converges it —
    * the exactly-once story a file-sink gold table needs. At 100 TB the
    * same shape runs partition-scoped (rewrite only files holding
    * touched keys).
    */
  def incrementalGold(events: DataFrame, tbl: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total_value"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        mergeIntoGold(batch.toDF(), tbl)
      }
      .start()

  private[graft] def mergeIntoGold(updates: DataFrame, tbl: String): Unit = {
    val spark = updates.sparkSession
    val path = new org.apache.hadoop.fs.Path(tbl)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(tbl + ".old")
    // crash recovery: a failure between the two swap renames below
    // leaves the previous table parked at .old with nothing at the
    // live path — restore it before merging, so the replayed batch
    // upserts into the full previous state instead of rebuilding the
    // table from only its own keys
    if (!fs.exists(path) && fs.exists(old) && !fs.rename(old, path))
      throw new java.io.IOException(s"gold recovery failed: $old -> $path")
    val merged =
      if (fs.exists(path))
        updates.unionByName(
          spark.read.parquet(tbl).join(updates, Seq("user_id"), "left_anti"))
      else updates
    val tmp = new org.apache.hadoop.fs.Path(tbl + ".tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    // swap: park current at .old, move tmp in, then drop .old — at no
    // point is the previous state deleted before the new one is live
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(path) && !fs.rename(path, old))
      throw new java.io.IOException(s"gold park failed: $path -> $old")
    if (!fs.rename(tmp, path))
      throw new java.io.IOException(s"gold swap failed: $tmp -> $path")
    fs.delete(old, true)
  }

  /** Incremental file-source ingest with exactly-once accounting — the
    * streaming rendition of the reference's daily-drop bronze ingest:
    * each run picks up ONLY files not yet recorded in the checkpoint's
    * file-source log, appends them to the bronze sink, and stops
    * (`Trigger.AvailableNow` drains the backlog then terminates — the
    * scheduled-batch operating mode, but with the stream's source log
    * providing the dedup the reference gets from Airflow task state).
    * A crashed or re-run job re-reads nothing: StreamingSpec restarts
    * the query against a grown directory and asserts every input row
    * lands exactly once.
    */
  def ingestAvailableNow(spark: SparkSession, srcDir: String,
      schema: org.apache.spark.sql.types.StructType, sinkDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(srcDir)
      .writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  final case class Ev(user_id: Long, ts: Timestamp, value: Double)

  final case class SessionState(
      start: Long, last: Long, n: Int, total: Double)

  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Int,
      total_value: Double)

  final case class EwmaState(n: Long, ewma: Double)

  final case class EwmaOut(user_id: Long, n_events: Long, ewma: Double)

  /** Streaming per-key EWMA with `mapGroupsWithState` (Update mode) —
    * the streaming twin of [[graft.ops.AnalyticsOps.ewma]]: the same
    * seeded recurrence s₁ = v₁, sₜ = sₜ₋₁ + α·(vₜ − sₜ₋₁), maintained
    * as ONE (count, ewma) pair per user key instead of a collected
    * array — the state an online scoring service holds. Within a batch
    * events fold in event-time order; across batches arrival order is
    * event-time order for an in-order source (the spec feeds ordered
    * batches — out-of-order tolerance would buffer under the
    * sessionizer's event-time-timeout pattern, at the cost of latency).
    * State is O(1) per active user forever — no watermark needed for
    * correctness, only for state expiry of dormant keys.
    */
  def ewmaStream(events: Dataset[Ev], alpha: Double = 0.25): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    def update(userId: Long, evs: Iterator[Ev],
               state: GroupState[EwmaState]): EwmaOut = {
      var s = state.getOption.getOrElse(EwmaState(0L, 0.0))
      evs.toVector.sortBy(_.ts.getTime).foreach { e =>
        s = if (s.n == 0L) EwmaState(1L, e.value)
        else EwmaState(s.n + 1L, s.ewma + alpha * (e.value - s.ewma))
      }
      state.update(s)
      EwmaOut(userId, s.n, s.ewma)
    }
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  final case class HwEv(event_type: String, ts: Timestamp, value: Double)
  final case class HwState(days: Map[Long, Long])
  final case class HwOut(event_type: String, n_days: Long, level_uc: Long,
      trend_uc: Long, forecast_uc: Long, mae_uc: Long)

  /** Streaming Holt-Winters with `mapGroupsWithState` (Update mode) —
    * the stateful twin of [[graft.ops.StatsOps.holtWinters]]: per
    * event type the state is the DAY→CENTS ledger (arriving events
    * fold into their day's total — commutative integer adds, so
    * arrival order never matters), and every update re-runs the ONE
    * shared exact-integer fold ([[graft.ops.StatsOps.hwFold]]) over
    * the day-sorted series — the sftAssembly re-fold discipline,
    * chosen because the smoothing recurrence is order-critical while
    * the raw ledger is order-free: accumulate the commutative thing,
    * re-fold the sequential thing. Emits `mae_uc = -1` while a type
    * is still inside the two-season warm-up. State is O(days per
    * type) — bounded by the modeling horizon, not the event volume;
    * a production variant would age out days beyond the horizon via
    * the map (the smoothing forgets geometrically anyway).
    */
  def holtWintersStream(events: Dataset[HwEv]): Dataset[HwOut] = {
    import events.sparkSession.implicits._
    def update(t: String, evs: Iterator[HwEv],
               state: GroupState[HwState]): HwOut = {
      var days = state.getOption.map(_.days).getOrElse(Map.empty[Long, Long])
      evs.foreach { e =>
        val day = e.ts.getTime / 86400000L
        // half-away-from-zero, matching the batch side's SQL round()
        val x = e.value * 100.0
        val cents = if (x < 0) -math.round(-x) else math.round(x)
        days = days.updated(day, days.getOrElse(day, 0L) + cents)
      }
      state.update(HwState(days))
      val xs = days.toArray.sortBy(_._1).map(_._2 * 1000000L)
      graft.ops.StatsOps.hwFold(xs) match {
        case Some((l, b, fc, mae)) => HwOut(t, xs.length.toLong, l, b, fc, mae)
        case None => HwOut(t, xs.length.toLong, 0L, 0L, 0L, -1L)
      }
    }
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  final case class ChatEv(user_id: Long, ts: Timestamp,
      event_id: Long, event_type: String, value: Double)
  final case class ChatMsg(tsMs: Long, eventId: Long,
      eventType: String, cents: Long)
  final case class ChatAsmState(msgs: Seq[ChatMsg])

  /** Streaming SFT-conversation assembly — the stateful twin of
    * [[graft.ops.ChatOps.sftAssembly]]: messages arrive per
    * conversation key (user, UTC day) in ANY order across
    * micro-batches; the state is the accumulated raw message buffer
    * (bounded by conversation length), and each update re-runs the
    * full assembly fold (thread → run-merge → budget left-truncation →
    * role repair → loss-token accounting) over the sorted buffer, so
    * the emitted row is always the conversation's CURRENT assembly —
    * what an online SFT data service serves while the day is open.
    * Late arrivals naturally re-flow the truncation (a turn arriving
    * out of order can change which suffix fits), which is exactly why
    * the state must hold raw messages, not the folded result.
    *
    * The fold is [[graft.ops.ChatOps.assemble]]; the batch op computes
    * the same rules relationally (windows + joins), and StreamingSpec
    * pins the two implementations equal on the full fixture — a
    * two-algorithm cross-check, not a shared code path.
    */
  def sftAssemblyStream(events: Dataset[ChatEv])
      : Dataset[graft.ops.ChatOps.ConvOut] = {
    import events.sparkSession.implicits._
    def dayOf(ts: Timestamp): java.sql.Date =
      java.sql.Date.valueOf(java.time.Instant.ofEpochMilli(ts.getTime)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate)
    def update(key: (Long, java.sql.Date), evs: Iterator[ChatEv],
        state: GroupState[ChatAsmState]): graft.ops.ChatOps.ConvOut = {
      val prev = state.getOption.map(_.msgs).getOrElse(Seq.empty)
      val next = prev ++ evs.map(e => ChatMsg(e.ts.getTime, e.event_id,
        e.event_type, math.round(e.value * 100)))
      state.update(ChatAsmState(next))
      val ordered = next.sortBy(m => (m.tsMs, m.eventId))
        .map(m => (m.eventType, m.cents))
      graft.ops.ChatOps.assemble(key._1, key._2, ordered)
    }
    events.groupByKey(e => (e.user_id, dayOf(e.ts)))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  final case class TbEv(user_id: Long, ts: Timestamp,
      event_id: Long, event_type: String, value: Double)

  final case class TbState(bal: Long, peak: Long, rej: Long,
      refills: Long, spends: Long)

  final case class TbOut(user_id: Long, final_balance: Long,
      peak_balance: Long, n_rejected: Long, n_refills: Long, n_spends: Long)

  /** Streaming token-bucket rate limiter with `mapGroupsWithState`
    * (Update mode) — the streaming twin of
    * [[graft.ops.PipelineOps.tokenBucket]]: the per-user state is the
    * five-long audit tuple, each batch folds its events in
    * (event-time, event_id) order through the same clamp rules, and the
    * emitted row is the cumulative audit — what a live throttling
    * dashboard reads. The non-associative clamp is exactly why this
    * must be stateful streaming and not a windowed aggregate. In-order
    * source contract and O(1) state per key as in [[ewmaStream]].
    */
  def tokenBucketStream(events: Dataset[TbEv], cap: Long = 100L): Dataset[TbOut] = {
    import events.sparkSession.implicits._
    def update(userId: Long, evs: Iterator[TbEv],
               state: GroupState[TbState]): TbOut = {
      var s = state.getOption.getOrElse(TbState(0L, 0L, 0L, 0L, 0L))
      evs.toVector.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        s = if (e.event_type == "purchase") {
          val bal = math.min(cap, s.bal + math.floor(e.value).toLong)
          TbState(bal, math.max(s.peak, bal), s.rej, s.refills + 1, s.spends)
        } else if (s.bal == 0L)
          s.copy(rej = s.rej + 1, spends = s.spends + 1)
        else s.copy(bal = s.bal - 1, spends = s.spends + 1)
      }
      state.update(s)
      TbOut(userId, s.bal, s.peak, s.rej, s.refills, s.spends)
    }
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  final case class PcPrompt(doc_id: Long, text: String)

  final case class PcEntry(k: Int, prefix: String)

  final case class PcState(cnt: Long)

  final case class PcOut(k: Int, prefix: String, cnt: Long, n_hits: Long)

  /** Streaming KV prefix-cache census with `mapGroupsWithState`
    * (Update mode) — the ONLINE twin of
    * [[graft.ops.TextOps.prefixCache]], which audits an inherently
    * online structure: a RadixAttention/vLLM radix tree grows per
    * arriving prompt. Each prompt explodes into its
    * [[graft.ops.TextOps.PrefixCacheLevels]] (k, first-k-tokens)
    * entries — the radix nodes it touches — and the per-entry state is
    * the node's arrival count: the FIRST arrival is the insert (a
    * cache miss that computes the KV pages), every later one is a hit
    * served from cache, exactly the batch census's `cnt - 1`
    * convention. Each update emits the entry's running (cnt, n_hits),
    * so the latest row per (k, prefix) IS the radix tree's node table;
    * StreamingSpec rolls those final rows up per level and pins them
    * equal to the batch census column-for-column.
    *
    * Scale shape: state is one long per radix node — the same
    * (k, prefix)-keyed space the batch op hash-aggregates, held
    * incrementally instead of recomputed; a viral prefix is one hot
    * state key whose updates fold associatively (cnt += batch
    * arrivals). Tokenization mirrors the batch op's `split(text, ' ')`
    * exactly (limit -1: trailing empties survive, as Spark's SQL split
    * keeps them).
    */
  def prefixCacheStream(prompts: Dataset[PcPrompt]): Dataset[PcOut] = {
    import prompts.sparkSession.implicits._
    def update(key: PcEntry, arrivals: Iterator[PcEntry],
               state: GroupState[PcState]): PcOut = {
      val prev = state.getOption.getOrElse(PcState(0L)).cnt
      val cnt = prev + arrivals.size
      state.update(PcState(cnt))
      PcOut(key.k, key.prefix, cnt, cnt - 1L)
    }
    prompts
      .flatMap { p =>
        val w = p.text.split(" ", -1)
        graft.ops.TextOps.PrefixCacheLevels.filter(w.length >= _)
          .map(k => PcEntry(k, w.take(k).mkString(" ")))
      }
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  final case class CdcEv(user_id: Long, lsn: Long, op: String, v_cents: Long)

  final case class CdcState(lsn: Long, op: String, v_cents: Long, nOps: Long)

  final case class CdcOut(user_id: Long, last_lsn: Long, n_ops: Long,
      live: Boolean, value: Double)

  /** Streaming CDC apply with `mapGroupsWithState` (Update mode) — the
    * streaming twin of [[graft.etl.Medallion.cdcApply]]: per-key state
    * is the (max-LSN, op, payload, log-depth) quadruple, and each batch
    * folds its change records by LSN COMPARISON, not arrival order —
    * a change that arrives late (lower LSN than the held state) only
    * deepens the log count, never regresses the snapshot. This is the
    * batch twin's max+join-back semantics held incrementally, which is
    * why the fold is associative/idempotent-safe where a "last arrival
    * wins" fold would not be. Every touched key emits its updated
    * snapshot row per batch; a key whose winning op is a tombstone
    * emits live=false — the compacted deletion a downstream merge
    * applies. State is O(1) per key; watermarking would only expire
    * dormant keys, never affect correctness.
    */
  def cdcApplyStream(changes: Dataset[CdcEv]): Dataset[CdcOut] = {
    import changes.sparkSession.implicits._
    def update(userId: Long, evs: Iterator[CdcEv],
               state: GroupState[CdcState]): CdcOut = {
      var s = state.getOption.getOrElse(CdcState(-1L, "D", 0L, 0L))
      evs.foreach { e =>
        s = if (e.lsn > s.lsn) CdcState(e.lsn, e.op, e.v_cents, s.nOps + 1)
        else s.copy(nOps = s.nOps + 1)
      }
      state.update(s)
      CdcOut(userId, s.lsn, s.nOps, s.op == "U", s.v_cents.toDouble / 100.0)
    }
    changes
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  final case class TouchEv(user_id: Long, ts: Timestamp,
      event_type: String, value: Double)

  final case class TouchState(touch: String)

  final case class Credit(user_id: Long, ts: Timestamp,
      channel: String, value: Double)

  /** Streaming last-touch attribution with `flatMapGroupsWithState` —
    * the streaming twin of [[graft.ops.StatsOps.attribution]]: the
    * state per user is ONE string (the latest non-purchase touch), and
    * every purchase immediately emits a credit row against the touch
    * held at that moment — the credit stream a marketing pipeline
    * ships to its dashboard without re-scanning history. Within a
    * batch events fold in event-time order; across batches the
    * in-order-source contract matches [[ewmaStream]]. State is O(1)
    * per active user; a timeout would only expire dormant keys.
    */
  def attributionStream(events: Dataset[TouchEv]): Dataset[Credit] = {
    import events.sparkSession.implicits._
    def update(userId: Long, evs: Iterator[TouchEv],
               state: GroupState[TouchState]): Iterator[Credit] = {
      var touch = state.getOption.map(_.touch)
      val out = Vector.newBuilder[Credit]
      evs.toVector.sortBy(_.ts.getTime).foreach { e =>
        if (e.event_type == "purchase")
          out += Credit(userId, e.ts, touch.getOrElse("direct"), e.value)
        else touch = Some(e.event_type)
      }
      touch.foreach(t => state.update(TouchState(t)))
      out.result().iterator
    }
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }

  /** Stateful sessionization with `flatMapGroupsWithState`: events of a
    * user belong to one session while gaps stay under `gapMinutes`; a
    * session closes either when a later in-batch event exceeds the gap
    * (emitted immediately) or when the event-time watermark passes
    * `last + gap` (emitted via timeout). This is the
    * KeyValueGroupedDataset custom-state surface of §2.9.
    */
  def sessionize(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def update(userId: Long, evs: Iterator[Ev],
               state: GroupState[SessionState]): Iterator[Session] = {
      def toSession(s: SessionState) = Session(
        userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
      if (state.hasTimedOut) {
        val out = state.getOption.map(toSession).iterator
        state.remove()
        out
      } else {
        val sorted = evs.toVector.sortBy(_.ts.getTime)
        var cur = state.getOption
        val closed = Vector.newBuilder[Session]
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.last <= gapMs =>
              cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1,
                s.total + e.value))
            case Some(s) =>
              closed += toSession(s)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last + gapMs)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  final case class MgEv(t: String, item: Long)

  final case class MgSketch(items: Array[Long], counts: Array[Long], n: Long)

  final case class MgOut(t: String, n_seen: Long, n_candidates: Long,
      top_item: Long, top_cnt: Long)

  /** Streaming Misra–Gries heavy hitters with `mapGroupsWithState`
    * (Update mode) — the streaming twin of the batch MG candidate pass
    * ([[graft.ops.TextOps.heavyHitters]]): per key, at most k
    * (item, counter) pairs ever live in state, and each arrival either
    * increments its counter, claims a free slot, or decrements ALL
    * counters (evicting zeros) — the classic deterministic guarantee:
    * any item with true frequency > n/(k+1) is ALWAYS in the summary,
    * and every counter is a lower bound within n/(k+1) of the truth.
    * Streaming adds nothing to prove: MG is a sequential fold, so
    * continuing it from held state across batches IS the algorithm —
    * which is exactly why it's the sketch you keep on a stream (vs the
    * batch pass, which re-reads the corpus per run). State is O(k)
    * longs per key forever.
    */
  def mgStream(events: Dataset[MgEv], k: Int = 8): Dataset[MgOut] = {
    import events.sparkSession.implicits._
    def update(t: String, evs: Iterator[MgEv],
               state: GroupState[MgSketch]): MgOut = {
      val s = state.getOption.getOrElse(MgSketch(Array.empty, Array.empty, 0L))
      val m = scala.collection.mutable.HashMap.empty[Long, Long]
      s.items.zip(s.counts).foreach { case (i, c) => m(i) = c }
      var n = s.n
      evs.foreach { e =>
        n += 1
        if (m.contains(e.item)) m(e.item) += 1L
        else if (m.size < k) m(e.item) = 1L
        else {
          m.mapValuesInPlace((_, v) => v - 1L)
          m.filterInPlace((_, v) => v > 0L)
        }
      }
      val arr = m.toArray.sortBy(_._1)
      state.update(MgSketch(arr.map(_._1), arr.map(_._2), n))
      val (topItem, topCnt) =
        if (m.isEmpty) (-1L, 0L)
        else m.maxBy { case (i, c) => (c, -i) }
      MgOut(t, n, m.size.toLong, topItem, topCnt)
    }
    events
      .groupByKey(_.t)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  final case class WrEv(source: String, docId: Long, wt: Long)

  final case class WrState(ids: Array[Long], wts: Array[Long],
      clocks: Array[Double], nSeen: Long)

  final case class WrOut(source: String, n_seen: Long,
      members: Seq[Long], wts: Seq[Long])

  /** Streaming weighted reservoir (`mapGroupsWithState`, Update mode)
    * — the STATEFUL twin of the batch
    * [[graft.ops.PipelineOps.weightedReservoir]], and the reason A-ES
    * clocks are the right sampler shape: the per-source state is just
    * the k best (clock, id, wt) triples, each arriving doc computes
    * its clock INDEPENDENTLY (the md5-lattice uniform — same bytes,
    * same JVM ln, so stream clocks are bit-identical to the batch
    * SQL's), and merging a batch is "keep the k smallest" — the
    * reservoir merge is associative, which is exactly why this
    * sampler distributes and streams while naive weighted sampling
    * does not. Emits the full reservoir per touched source per batch
    * (rank order); after any prefix of arrivals the state equals the
    * batch query over that prefix, and after all arrivals it equals
    * `q_weighted_reservoir` exactly — StreamingSpec pins both. */
  def weightedReservoirStream(events: Dataset[WrEv], k: Int = 16)
      : Dataset[WrOut] = {
    import events.sparkSession.implicits._
    def clock(id: Long, wt: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"wr_$id".getBytes("UTF-8"))
      val m48 = java.lang.Long.parseLong(
        md.take(6).map(b => f"$b%02x").mkString, 16)
      -math.log((m48 + 1) / 281474976710657.0) / wt
    }
    def update(src: String, evs: Iterator[WrEv],
               state: GroupState[WrState]): WrOut = {
      val s = state.getOption.getOrElse(
        WrState(Array.empty, Array.empty, Array.empty, 0L))
      var pool = s.ids.indices
        .map(i => (s.clocks(i), s.ids(i), s.wts(i))).toVector
      var n = s.nSeen
      evs.foreach { e =>
        n += 1
        pool :+= ((clock(e.docId, e.wt), e.docId, e.wt))
      }
      val kept = pool.sortBy(t => (t._1, t._2)).take(k)
      state.update(WrState(kept.map(_._2).toArray,
        kept.map(_._3).toArray, kept.map(_._1).toArray, n))
      WrOut(src, n, kept.map(_._2), kept.map(_._3))
    }
    events
      .groupByKey(_.source)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  final case class MomEv(t: String, value: Double)

  final case class MomState(n: Long, mean: Double, m2: Double)

  final case class MomOut(t: String, n: Long, mean: Double, var_samp: Double)

  /** Streaming running moments via Welford's one-pass recurrence
    * (`mapGroupsWithState`, Update mode) — the streaming twin of the
    * batch moment battery ([[graft.ops.AnalyticsOps.statsMoments]]):
    * per-key state is the (n, mean, M2) triple, each event folds in as
    * mean += d/n, M2 += d·(x − mean) — the numerically stable form
    * (the naive Σx² − (Σx)²/n cancels catastrophically once mean² ≫
    * variance, which is exactly a metric stream's shape). Emits
    * (n, mean, sample variance) per touched key per batch — the live
    * anomaly-band a monitoring dashboard draws. O(1) state per key;
    * var_samp reported as 0 until n ≥ 2. Fold order within a batch is
    * arrival order (float associativity noise only — bounded far
    * below any alerting threshold; the spec pins agreement with the
    * two-pass definition at 1e-9).
    */
  def momentsStream(events: Dataset[MomEv]): Dataset[MomOut] = {
    import events.sparkSession.implicits._
    def update(t: String, evs: Iterator[MomEv],
               state: GroupState[MomState]): MomOut = {
      var s = state.getOption.getOrElse(MomState(0L, 0.0, 0.0))
      evs.foreach { e =>
        val n = s.n + 1
        val d = e.value - s.mean
        val mean = s.mean + d / n
        s = MomState(n, mean, s.m2 + d * (e.value - mean))
      }
      state.update(s)
      MomOut(t, s.n, s.mean, if (s.n > 1) s.m2 / (s.n - 1) else 0.0)
    }
    events
      .groupByKey(_.t)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  final case class KmvEv(t: String, cell: Long)

  final case class KmvState(kmin: Array[Long])

  final case class KmvOut(t: String, n_sketch: Long, est_n: Long)

  /** Streaming KMV distinct sketch with `mapGroupsWithState` (Update
    * mode) — the streaming twin of [[graft.ops.SketchOps.kmvJaccard]]'s
    * bottom-k construction, and the reason KMV is the sketch you keep
    * ON the stream: state per key is the k smallest hashes EVER SEEN —
    * bounded at k longs no matter how many events arrive — and
    * merging a batch is "union, keep k smallest", which is exactly
    * the sketch's mergeability law. Every batch emits the current
    * distinct estimate (k−1)·2³²/h_k on the same integer lattice as
    * the batch query, so stream and batch agree EXACTLY once they
    * have seen the same cells (the spec's stream==batch gate —
    * order-insensitive by construction, since bottom-k is a set
    * property).
    *
    * The hash is the house masked multiplicative hash
    * ([[graft.ops.Parity.mixBucket]] at 2³² buckets), duplicated here
    * in JVM arithmetic — injective for cells < 2³¹, so sketch ties
    * cannot occur.
    */
  def kmvStream(events: Dataset[KmvEv], k: Int = 128): Dataset[KmvOut] = {
    import events.sparkSession.implicits._
    def hash(cell: Long): Long =
      ((cell % 2147483648L) * 2654435761L) % 4294967296L
    def update(t: String, evs: Iterator[KmvEv],
               state: GroupState[KmvState]): KmvOut = {
      val cur = state.getOption.map(_.kmin).getOrElse(Array.empty[Long])
      val merged = (cur ++ evs.map(e => hash(e.cell)))
        .distinct.sorted.take(k)
      state.update(KmvState(merged))
      val est =
        if (merged.length < 2) merged.length.toLong
        else (merged.length - 1L) * 4294967296L / merged.last
      KmvOut(t, merged.length.toLong, est)
    }
    events
      .groupByKey(_.t)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  final case class PhEv(t: String, day: String, x: Long)

  final case class PhState(n: Long, s: Long, m: Long, mMin: Long,
      maxG: Long, alarms: Long, firstAlarm: String)

  final case class PhOut(event_type: String, n_days: Long, max_g_e6: Long,
      n_alarm_days: Long, first_alarm_day: String)

  /** Streaming Page–Hinkley twin (`mapGroupsWithState`, Update mode) —
    * the live form of [[graft.ops.AnalyticsOps.pageHinkley]]: per-key
    * state is exactly the recurrence's sufficient statistics
    * (t, Σx, m, min m, max g, alarm tally, first alarm day), each
    * arriving day folds in with the IDENTICAL e6-lattice increment
    * round((t·x − S)·1e6 / t), so after the last day the state EQUALS
    * the batch query's row — integer-exact, not approximately (the
    * weightedReservoir twin discipline). Days are processed in
    * event-time order (sorted within each micro-batch; the feed
    * contract is chronological batches, the same contract the batch
    * window's ORDER BY day expresses). O(1) state per key. */
  def pageHinkleyStream(events: Dataset[PhEv], lambdaE6: Long = 8000000L)
      : Dataset[PhOut] = {
    import events.sparkSession.implicits._
    def update(t: String, evs: Iterator[PhEv],
               state: GroupState[PhState]): PhOut = {
      var s = state.getOption.getOrElse(PhState(0L, 0L, 0L, 0L, 0L, 0L, ""))
      evs.toSeq.sortBy(_.day).foreach { e =>
        val n = s.n + 1
        val sum = s.s + e.x
        val m = s.m +
          math.round((n * e.x - sum).toDouble * 1000000.0 / n)
        val mMin = math.min(s.mMin, m)
        val g = m - mMin
        val alarmed = g > lambdaE6
        s = PhState(n, sum, m, mMin, math.max(s.maxG, g),
          s.alarms + (if (alarmed) 1 else 0),
          if (s.firstAlarm.nonEmpty) s.firstAlarm
          else if (alarmed) e.day else "")
      }
      state.update(s)
      PhOut(t, s.n, s.maxG, s.alarms,
        if (s.firstAlarm.isEmpty) null else s.firstAlarm)
    }
    events
      .groupByKey(_.t)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }
}
