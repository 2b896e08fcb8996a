package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Conversation / SFT-data assembly — the step between a raw event or
  * message log and a chat-tuned training set. The reference repo has
  * nothing of the kind (mobility analytics); this family exists because
  * assembling supervised-fine-tuning conversations is the chat-era
  * sibling of [[CurationOps.seqPack]]'s pretraining packing: thread
  * messages into conversations, merge consecutive same-role messages,
  * left-truncate into the context budget, and account the loss-masked
  * (assistant) tokens — every rule below is what an SFT pipeline
  * actually runs, expressed as per-conversation windows.
  */
object ChatOps {

  /** Context budget in "tokens" (rendered characters — a deterministic
    * stand-in for a tokenizer count; [[TextOps]] owns real BPE). 64
    * exercises every branch at fixture scale: ~20% of conversations
    * lose their head to truncation entirely, ~40% drop a leading
    * assistant run, ~43% truncate, ~52% merge consecutive runs. */
  private val Budget = 64
  /** Event types voiced as the human side; the rest are the model. */
  private val UserTypes = Seq("click", "view", "signup")

  // -------------------------------------------------- SFT assembly
  /** Assemble per-(user, day) SFT conversations from the event log.
    *
    * Pipeline (all standard SFT-prep rules):
    *  1. thread: one conversation per (user_id, day), messages ordered
    *     by (ts, event_id); role from the event type, content rendered
    *     deterministically as `type || " v" || cents`;
    *  2. merge: consecutive same-role messages collapse into one turn
    *     (gaps-and-islands run-collapse — chat APIs reject double
    *     turns), contents joined with " | " in message order;
    *  3. left-truncate: keep the LONGEST SUFFIX of turns whose token
    *     sum fits [[Budget]] (chat training keeps the most recent
    *     context, unlike pretraining's head-keep);
    *  4. role repair: if the first surviving turn is an assistant
    *     turn, drop it too — a conversation must open with the user;
    *  5. account: kept/loss (assistant) tokens, and an md5 over the
    *     rendered `<role>content` template as the content witness the
    *     driver hash actually gates.
    *
    * Parity: contents are exact strings (cents via ROUND(value·100) —
    * one shared double op), counts/sums exact integers, md5 identical
    * byte-for-byte. Empty-after-truncation conversations survive with
    * kept_turns = 0 and a NULL template (left join back to the
    * conversation census).
    *
    * Scale shape: ONE shuffle on the conversation key — every window
    * (message rank, run id, turn rank, suffix cumsum) partitions by
    * (user_id, day) and is bounded by conversation length; the merge
    * and template aggregations are per-conversation collect_lists of
    * the same bound; the census/kept/lead-drop joins are equi-joins on
    * the conversation key, co-partitioned with the aggregates that
    * produced them. Nothing global, nothing driver-side. At 100 TB
    * conversations are the parallel unit — exactly how a production
    * SFT assembler shards.
    */
  def sftAssembly(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select(
      col("user_id"), to_date(col("ts")).as("day"), col("ts"), col("event_id"),
      when(col("event_type").isin(UserTypes: _*), lit("user"))
        .otherwise(lit("assistant")).as("role"),
      concat(col("event_type"), lit(" v"),
        round(col("value") * 100, 0).cast("long").cast("string")).as("content"))

    val wMsg = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    val wRun = Window.partitionBy(col("user_id"), col("day")).orderBy(col("rn"))
    val msgs = ev
      .withColumn("rn", row_number().over(wMsg))
      .withColumn("prev_role", lag(col("role"), 1).over(wMsg))
      .withColumn("run_id", sum(
        when(col("prev_role").isNull || col("prev_role") =!= col("role"), 1L)
          .otherwise(0L)).over(wRun))

    val merged = msgs.groupBy(col("user_id"), col("day"), col("run_id"))
      .agg(min(col("role")).as("role"),
        array_join(transform(array_sort(collect_list(
          struct(col("rn"), col("content")))),
          s => s.getField("content")), " | ").as("content"),
        count(lit(1)).as("n_msgs"))
    val wTurn = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("run_id"))
    val wSfx = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("t").desc)
    val turns = merged
      .withColumn("t", row_number().over(wTurn))
      .withColumn("toks", length(col("content")).cast("long"))
      .withColumn("sfx_toks", sum(col("toks")).over(wSfx))

    val conv = turns.groupBy(col("user_id"), col("day"))
      .agg(sum(col("n_msgs")).cast("long").as("raw_turns"),
        max(col("t")).cast("long").as("merged_turns"),
        sum(col("toks")).cast("long").as("total_tokens"))

    val kept0 = turns.filter(col("sfx_toks") <= Budget)
    val lead0 = kept0.groupBy(col("user_id"), col("day"))
      .agg(min(col("t")).as("t0"))
    val kept = kept0.join(lead0, Seq("user_id", "day"))
      .withColumn("is_lead_drop",
        col("t") === col("t0") && col("role") === "assistant")
    val ka = kept.filter(!col("is_lead_drop"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).cast("long").as("kept_turns"),
        sum(col("toks")).cast("long").as("kept_tokens"),
        sum(when(col("role") === "assistant", col("toks")).otherwise(0L))
          .cast("long").as("loss_tokens"),
        md5(array_join(transform(array_sort(collect_list(
          struct(col("t"), col("role"), col("content")))),
          s => concat(lit("<"), s.getField("role"), lit(">"),
            s.getField("content"))), "")).as("template_md5"))
    val ld = kept.groupBy(col("user_id"), col("day"))
      .agg(max(when(col("is_lead_drop"), 1L).otherwise(0L)).as("lead_dropped"))

    conv.join(ka, Seq("user_id", "day"), "left")
      .join(ld, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), col("raw_turns"),
        col("merged_turns"), col("total_tokens"),
        coalesce(col("kept_turns"), lit(0L)).as("kept_turns"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("loss_tokens"), lit(0L)).as("loss_tokens"),
        coalesce(col("lead_dropped"), lit(0L)).as("lead_dropped"),
        col("template_md5"))
      .orderBy(col("user_id"), col("day"))
  }

  private val sftAssemblyOracle =
    s"""WITH ev AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
       |         CASE WHEN event_type IN ('click','view','signup')
       |              THEN 'user' ELSE 'assistant' END AS role,
       |         event_type || ' v' ||
       |           CAST(CAST(ROUND(value*100) AS BIGINT) AS VARCHAR) AS content
       |  FROM events),
       |t AS (SELECT *,
       |        ROW_NUMBER() OVER (PARTITION BY user_id, day
       |                           ORDER BY ts, event_id) AS rn,
       |        LAG(role) OVER (PARTITION BY user_id, day
       |                        ORDER BY ts, event_id) AS prev_role
       |      FROM ev),
       |runs AS (SELECT *,
       |    SUM(CASE WHEN prev_role IS NULL OR prev_role <> role
       |             THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id, day ORDER BY rn) AS run_id FROM t),
       |merged AS (SELECT user_id, day, run_id, MIN(role) AS role,
       |                  string_agg(content, ' | ' ORDER BY rn) AS content,
       |                  COUNT(*) AS n_msgs
       |           FROM runs GROUP BY user_id, day, run_id),
       |mt AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, day
       |                                    ORDER BY run_id) AS t,
       |              length(content) AS toks FROM merged),
       |conv AS (SELECT user_id, day, CAST(SUM(n_msgs) AS BIGINT) AS raw_turns,
       |                CAST(MAX(t) AS BIGINT) AS merged_turns,
       |                CAST(SUM(toks) AS BIGINT) AS total_tokens
       |         FROM mt GROUP BY user_id, day),
       |sfx AS (SELECT *, SUM(toks) OVER (PARTITION BY user_id, day
       |                                  ORDER BY t DESC) AS sfx_toks FROM mt),
       |kept0 AS (SELECT * FROM sfx WHERE sfx_toks <= $Budget),
       |lead0 AS (SELECT user_id, day, MIN(t) AS t0 FROM kept0
       |          GROUP BY user_id, day),
       |kept AS (SELECT k.*, (k.t = l.t0 AND k.role = 'assistant')
       |                       AS is_lead_drop
       |         FROM kept0 k JOIN lead0 l USING (user_id, day)),
       |ka AS (SELECT user_id, day,
       |              CAST(COUNT(*) AS BIGINT) AS kept_turns,
       |              CAST(SUM(toks) AS BIGINT) AS kept_tokens,
       |              CAST(SUM(CASE WHEN role = 'assistant' THEN toks
       |                            ELSE 0 END) AS BIGINT) AS loss_tokens,
       |              md5(string_agg('<' || role || '>' || content, ''
       |                             ORDER BY t)) AS template_md5
       |       FROM kept WHERE NOT is_lead_drop GROUP BY user_id, day),
       |ld AS (SELECT user_id, day,
       |              CAST(MAX(CASE WHEN is_lead_drop THEN 1 ELSE 0 END)
       |                   AS BIGINT) AS lead_dropped
       |       FROM kept GROUP BY user_id, day)
       |SELECT c.user_id, c.day, c.raw_turns, c.merged_turns, c.total_tokens,
       |       COALESCE(ka.kept_turns, 0) AS kept_turns,
       |       COALESCE(ka.kept_tokens, 0) AS kept_tokens,
       |       COALESCE(ka.loss_tokens, 0) AS loss_tokens,
       |       COALESCE(ld.lead_dropped, 0) AS lead_dropped,
       |       ka.template_md5
       |FROM conv c LEFT JOIN ka USING (user_id, day)
       |            LEFT JOIN ld USING (user_id, day)
       |ORDER BY c.user_id, c.day""".stripMargin

  /** One assembled conversation — the streaming twin's output row and
    * the shared shape of the batch result. */
  final case class ConvOut(user_id: Long, day: java.sql.Date,
    raw_turns: Long, merged_turns: Long, total_tokens: Long,
    kept_turns: Long, kept_tokens: Long, loss_tokens: Long,
    lead_dropped: Long, template_md5: Option[String])

  /** The assembly rules as a pure fold over (ts, event_id)-ordered raw
    * messages — the SAME semantics as the relational [[sftAssembly]]
    * (thread → run-merge → suffix-truncate → role-repair → account),
    * executed per conversation. The streaming twin folds THIS; the
    * batch op stays windows-and-joins; StreamingSpec pins the two
    * implementations equal — a genuine two-algorithm cross-check.
    */
  private[graft] def assemble(userId: Long, day: java.sql.Date,
      msgs: Seq[(String, Long)]): ConvOut = {
    val typed = msgs.map { case (tpe, cents) =>
      (if (UserTypes.contains(tpe)) "user" else "assistant", s"$tpe v$cents")
    }
    val runs = typed.foldLeft(Vector.empty[(String, Vector[String])]) {
      case (acc, (role, c)) =>
        if (acc.nonEmpty && acc.last._1 == role)
          acc.init :+ ((role, acc.last._2 :+ c))
        else acc :+ ((role, Vector(c)))
    }
    val turns = runs.map { case (role, cs) => (role, cs.mkString(" | ")) }
    val toks = turns.map(_._2.length.toLong)
    var s = 0L; var start = turns.size
    while (start > 0 && s + toks(start - 1) <= Budget) {
      start -= 1; s += toks(start)
    }
    var kept = turns.drop(start)
    val leadDropped = kept.headOption.exists(_._1 == "assistant")
    if (leadDropped) kept = kept.tail
    // batch parity: the template aggregate only exists when at least
    // one turn survives role repair — otherwise the left join is NULL
    val md5 =
      if (kept.isEmpty) None
      else Some(java.security.MessageDigest.getInstance("MD5")
        .digest(kept.map { case (r, c) => s"<$r>$c" }.mkString
          .getBytes("UTF-8")).map(b => f"$b%02x").mkString)
    ConvOut(userId, day, typed.size.toLong, turns.size.toLong, toks.sum,
      kept.size.toLong, kept.map(_._2.length.toLong).sum,
      kept.filter(_._1 == "assistant").map(_._2.length.toLong).sum,
      if (leadDropped) 1L else 0L, md5)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sft_assembly" -> (sftAssembly _)
  )

  def oracles: Map[String, String] = Map(
    "q_sft_assembly" -> sftAssemblyOracle
  )
}
