package graft

import java.sql.Date

import graft.ops.ChatOps

/** Ground truth for the SFT assembler: an independent driver-side replay
  * of the threading/merge/truncate/role-repair rules over the collected
  * event log must equal the operator row-for-row (template md5
  * included), plus the structural invariants any SFT batch must hold.
  */
class ChatOpsSpec extends SparkSpec {

  private val Budget = 64
  private val UserTypes = Set("click", "view", "signup")

  private case class Conv(raw: Long, merged: Long, total: Long, kept: Long,
    keptToks: Long, lossToks: Long, leadDropped: Long, md5: Option[String])

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def truth(): Map[(Long, Date), Conv] = {
    val ev = Tables.events(spark, sfTiny)
      .selectExpr("user_id", "to_date(ts) AS day", "ts", "event_id",
        "event_type", "CAST(ROUND(value*100, 0) AS LONG) AS cents")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1), r.getTimestamp(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    ev.groupBy(e => (e._1, e._2)).map { case (key, es) =>
      val msgs = es.sortBy(e => (e._3.getTime, e._4)).map { e =>
        val role = if (UserTypes(e._5)) "user" else "assistant"
        (role, s"${e._5} v${e._6}")
      }
      // run-collapse consecutive same-role messages
      val runs = msgs.foldLeft(Vector.empty[(String, Vector[String])]) {
        case (acc, (role, c)) =>
          if (acc.nonEmpty && acc.last._1 == role)
            acc.init :+ (role, acc.last._2 :+ c)
          else acc :+ (role, Vector(c))
      }
      val turns = runs.map { case (role, cs) =>
        (role, cs.mkString(" | "))
      }
      val toks = turns.map(_._2.length.toLong)
      // longest suffix fitting the budget
      var s = 0L; var start = turns.size
      while (start > 0 && s + toks(start - 1) <= Budget) {
        start -= 1; s += toks(start)
      }
      var keptT = turns.drop(start)
      val leadDropped = keptT.headOption.exists(_._1 == "assistant")
      if (leadDropped) keptT = keptT.tail
      val tpl =
        if (keptT.isEmpty && !leadDropped) None
        else Some(md5Hex(keptT.map { case (r, c) => s"<$r>$c" }.mkString))
      key -> Conv(
        raw = msgs.size, merged = turns.size, total = toks.sum,
        kept = keptT.size, keptToks = keptT.map(_._2.length.toLong).sum,
        lossToks = keptT.filter(_._1 == "assistant")
          .map(_._2.length.toLong).sum,
        leadDropped = if (leadDropped) 1L else 0L,
        md5 = tpl)
    }
  }

  test("sftAssembly equals a driver-side replay, template md5 included") {
    val out = ChatOps.sftAssembly(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getDate(1)) -> r).toMap
    val t = truth()
    assert(out.keySet == t.keySet)
    for ((k, c) <- t) {
      val r = out(k)
      assert(r.getLong(2) == c.raw && r.getLong(3) == c.merged &&
        r.getLong(4) == c.total, s"census mismatch at $k")
      assert(r.getLong(5) == c.kept && r.getLong(6) == c.keptToks &&
        r.getLong(7) == c.lossToks, s"kept accounting mismatch at $k")
      assert(r.getLong(8) == c.leadDropped, s"lead-drop mismatch at $k")
      val gotMd5 = Option(r.getString(9))
      // driver truth renders None for conversations with no kept frame
      // at all; the operator likewise left-joins to NULL
      c.md5 match {
        case Some(m) if c.kept > 0 => assert(gotMd5.contains(m), s"md5 at $k")
        case _ => ()
      }
    }
  }

  test("sftAssembly invariants: budget, role repair, conservation") {
    val rows = ChatOps.sftAssembly(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    var truncated = 0; var leadDrops = 0; var empty = 0; var mergedSome = 0
    for (r <- rows) {
      val (raw, merged, total) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (kept, keptToks, lossToks) =
        (r.getLong(5), r.getLong(6), r.getLong(7))
      assert(raw >= merged && merged >= kept)
      assert(keptToks <= Budget)       // the whole point of truncation
      assert(lossToks <= keptToks)
      assert(keptToks <= total)
      if (kept < merged) truncated += 1
      if (r.getLong(8) == 1L) leadDrops += 1
      if (kept == 0) empty += 1
      if (raw > merged) mergedSome += 1
    }
    // every branch of the assembler is actually exercised by the fixture
    assert(truncated > 0 && leadDrops > 0 && mergedSome > 0)
  }
}
