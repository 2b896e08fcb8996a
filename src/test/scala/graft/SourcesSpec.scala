package graft

import org.apache.spark.sql.functions._

import graft.sources.CsvSources

/** Source-format scans proven against the parquet ground truth the
  * fixtures were generated from (the DuckDB oracle re-parses the same
  * files; this pins that the round-trip loses nothing).
  */
class SourcesSpec extends SparkSpec {

  test("fixed-width scan round-trips the supplier table exactly") {
    val got = CsvSources.fixedWidthScan(spark, sfTiny).collect()
      .map(r => (r.getAs[Int]("s_nationkey"),
        (r.getAs[Long]("n_suppliers"), r.getAs[Long]("min_key"),
          r.getAs[Long]("tot_cents"), r.getAs[Int]("name_w")))).toMap
    val want = Tables.supplier(spark, sfTiny)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"), min(col("s_suppkey")).as("mk"),
        sum(expr("CAST(round(s_acctbal * 100) AS BIGINT)")).as("tc"),
        max(length(trim(substring(col("s_name"), 1, 18)))).as("nw"))
      .collect()
      .map(r => (r.getAs[Int]("s_nationkey"),
        (r.getAs[Long]("n"), r.getAs[Long]("mk"),
          r.getAs[Long]("tc"), r.getAs[Int]("nw")))).toMap
    assert(got == want)
  }
  test("orc roundtrip prunes partitions and pushes predicates") {
    val df = graft.sources.OrcSource.orcScan(spark, sfTiny)
    // values survive the parquet -> ORC -> scan roundtrip
    val got = df.collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    val want = Tables.lineitem(spark, sfTiny)
      .filter(col("l_returnflag") === "A" && col("l_quantity") < 25)
      .groupBy(col("l_linestatus")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"$got != $want")
    // plan: only the A partition is read, quantity predicate is pushed
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("OrcScan") || plan.contains("FileScan orc"),
      s"not an ORC scan:\n$plan")
    assert("PartitionFilters: \\[[^\\]]*l_returnflag".r.findFirstIn(plan).isDefined,
      s"returnflag not a partition filter:\n$plan")
    assert("PushedFilters: \\[[^\\]]*LessThan\\(l_quantity".r.findFirstIn(plan).isDefined,
      s"quantity predicate not pushed:\n$plan")
  }

  test("arrow ipc: round-trip, planted node lie, constant metadata size") {
    import graft.sources.ArrowIpc
    val docs = (0L until 25L).map(i => (i, s"doc-$i-" + ("x" * i.toInt)))
    val stream = ArrowIpc.synthArrowStream(docs)
    val scan = ArrowIpc.parseArrowStream(stream)
    assert(scan.schemaOk, "schema message did not parse")
    assert(scan.fieldNames == Seq("doc_id", "text"))
    assert(scan.eos && scan.clean && scan.consumed == stream.length)
    assert(scan.batches.map(_.nRows) == Vector(10L, 10L, 5L))
    // per batch: id sums, nulls (id % 13 == 0), text bytes, the lie
    docs.grouped(10).zip(scan.batches.iterator).foreach { case (g, batch) =>
      assert(batch.idSum == g.map(_._1).sum)
      val nulls = g.count(_._1 % 13 == 0)
      assert(batch.nNullText == nulls, s"nulls in batch starting ${g.head._1}")
      val tb = g.collect { case (id, t) if id % 13 != 0 => t.length }.sum
      assert(batch.textBytes == tb.toLong)
      assert(batch.nodeMismatch == (g.head._1 % 17 == 0),
        s"mismatch flag for batch starting ${g.head._1}")
    }
    // batch METADATA size must be row-count- and content-independent —
    // the oracle's closed-form byte census builds on this
    def metaLen(ds: Seq[(Long, String)]): Int =
      ArrowIpc.batchMessage(ds)._1.length
    val m10 = metaLen(docs.take(10))
    assert(metaLen(docs.drop(20)) == m10, "5-row batch meta differs")
    assert(metaLen(Seq((170L, "zz"), (171L, ""))) == m10)
    assert((m10 + 7) / 8 * 8 == ArrowIpc.batchMetaLen)
  }

  test("format sniffer: every codec recognized, no magic = tfrecord probe") {
    import graft.sources._
    val docs = (0L until 10L).map(i => (i, s"text $i"))
    val bytes = docs.map { case (id, t) => (id, t.getBytes("UTF-8")) }
    assert(FormatSniffer.detect(GzipFiles.synthGzip(bytes)) == "gzip")
    assert(FormatSniffer.detect(ZipFiles.synthZip(bytes)) == "zip")
    assert(FormatSniffer.detect(TarFiles.synthTar(bytes)) == "tar")
    assert(FormatSniffer.detect(WarcFiles.synthWarc(3L, bytes)) == "warc")
    assert(FormatSniffer.detect(AvroFiles.synthAvro(5L, bytes)) == "avro")
    assert(FormatSniffer.detect(ArrowIpc.synthArrowStream(docs)) == "arrow")
    // TFRecord has no magic: only its self-validating length-CRC admits it
    val tfr = TfRecordFiles.synthTfRecords(bytes)
    assert(FormatSniffer.detect(tfr) == "tfrecord")
    val corrupt = tfr.clone(); corrupt(9) = (corrupt(9) ^ 1).toByte
    assert(FormatSniffer.detect(corrupt) == "unknown",
      "a flipped length-crc byte must fail the tfrecord probe")
    assert(FormatSniffer.detect("hello world plain text".getBytes("UTF-8"))
      == "unknown")
    assert(FormatSniffer.detect(Array.emptyByteArray) == "unknown")
    // the header-trusting avro walk decodes without knowing the fileId
    val scan = AvroFiles.parseAvroSniffed(AvroFiles.synthAvro(7L, bytes))
    assert(scan.clean && scan.blocks.nonEmpty)
  }

  test("arrow dict: round-trip, OOB triage, constant metadata sizes") {
    import graft.sources.ArrowIpc
    val srcs = Seq("alpha", "beta", "gamma")
    val docs = (0L until 25L).map(i => (i, srcs((i % 3).toInt)))
    val stream = ArrowIpc.synthDictStream(docs)
    val scan = ArrowIpc.parseDictStream(stream)
    assert(scan.schemaOk, "dictionary schema did not verify")
    assert(scan.dict == srcs.sorted)
    assert(scan.eos && scan.clean && scan.consumed == stream.length)
    assert(scan.batches.map(_.nRows) == Vector(10L, 10L, 5L))
    docs.grouped(10).zip(scan.batches.iterator).foreach { case (g, batch) =>
      assert(batch.idSum == g.map(_._1).sum)
      val oob = g.head._1 % 17 == 0
      assert(batch.nOob == (if (oob) 1L else 0L),
        s"oob count for batch starting ${g.head._1}")
      // decoded source counts: the OOB plant nulls the LAST row only
      val expect = (if (oob) g.dropRight(1) else g)
        .groupBy(_._2).view.mapValues(_.length.toLong).toMap
      assert(batch.srcCounts == expect,
        s"source counts for batch starting ${g.head._1}")
    }
    // metadata sizes are content-independent (the byte census builds
    // on this)
    assert((ArrowIpc.dictionaryMessage(Seq("x", "yy", "zzz"))._1.length + 7)
      / 8 * 8 == ArrowIpc.dictMetaLen)
    assert((ArrowIpc.dictBatchMessage(docs.take(5).map {
      case (id, s) => (id, srcs.indexOf(s))
    }, 3)._1.length + 7) / 8 * 8 == ArrowIpc.dictBatchMetaLen)
  }

  test("arrow dict: delta dictionaries append; indices reach past the seed") {
    import graft.sources.ArrowIpc
    // batch 1 uses {a}, batch 2 introduces {b}, batch 3 introduces {c}:
    // the reader must decode indices 1 and 2 that exceed the INITIAL
    // dictionary's length via the isDelta appends
    val docs = (0L until 30L).map { i =>
      (i, if (i < 10) "alpha" else if (i < 20) "beta" else "gamma")
    }
    val stream = ArrowIpc.synthDictStreamDelta(docs)
    val scan = ArrowIpc.parseDictStream(stream)
    assert(scan.schemaOk && scan.eos && scan.clean,
      s"delta stream not clean: $scan")
    assert(scan.dict == Seq("alpha", "beta", "gamma"),
      s"final dictionary ${scan.dict}")
    assert(scan.batches.map(_.nRows) == Vector(10L, 10L, 10L))
    // batch 3's value only exists via the second delta append
    val b3 = scan.batches(2)
    val oob3 = 20L % 17 == 0 // the OOB plant keys off the first doc_id
    assert(b3.srcCounts.getOrElse("gamma", 0L) ==
      (if (oob3) 9L else 10L), s"batch 3 counts: ${b3.srcCounts}")
    // a plain (non-delta) second dictionary REPLACES: same docs through
    // the one-shot generator still decode — regression guard that the
    // replacement path didn't break the existing stream shape
    val plain = ArrowIpc.parseDictStream(ArrowIpc.synthDictStream(docs))
    assert(plain.clean && plain.dict == Seq("alpha", "beta", "gamma"))
  }

  test("arrow dict: total parse on every prefix and under byte flips") {
    import graft.sources.ArrowIpc
    val docs = (0L until 25L).map(i => (i, s"s${i % 4}"))
    val stream = ArrowIpc.synthDictStream(docs)
    (0 to stream.length).foreach { n =>
      val scan = ArrowIpc.parseDictStream(stream.take(n))
      assert(scan.consumed <= n)
      assert(!scan.clean || n == stream.length)
    }
    stream.indices.foreach { i =>
      val mutated = stream.clone()
      mutated(i) = (mutated(i) ^ 0x5a).toByte
      ArrowIpc.parseDictStream(mutated) // must not throw
    }
  }

  test("arrow ipc: total parse on every prefix and under byte flips") {
    import graft.sources.ArrowIpc
    val docs = (0L until 25L).map(i => (i, s"t$i"))
    val stream = ArrowIpc.synthArrowStream(docs)
    (0 to stream.length).foreach { n =>
      val scan = ArrowIpc.parseArrowStream(stream.take(n)) // must not throw
      assert(scan.consumed <= n)
      assert(!scan.clean || n == stream.length)
    }
    stream.indices.foreach { i =>
      val mutated = stream.clone()
      mutated(i) = (mutated(i) ^ 0x5a).toByte
      ArrowIpc.parseArrowStream(mutated) // must not throw
    }
  }

  test("msgpack: round-trip, ext skip, every int/str width, totality") {
    import graft.sources.MsgPackFiles
    // widths: id crosses fixint/uint8/uint16/uint32; text crosses
    // fixstr/str8/str16
    val docs = Seq(5L, 127L, 128L, 255L, 256L, 65535L, 65536L, 19L,
      38L, 0L).map { id =>
      val len = (id % 7) match {
        case 0 => 3 case 1 => 31 case 2 => 32 case 3 => 255
        case 4 => 256 case 5 => 40 case _ => 500
      }
      (id, Array.fill(len.toInt)('x'.toByte))
    }
    val mp = MsgPackFiles.synthMsgPack(docs)
    val scan = MsgPackFiles.parseMsgPack(mp)
    assert(scan.clean && scan.trailing == 0)
    assert(scan.docs.map(_.id) == docs.map(_._1).toVector)
    assert(scan.docs.map(_.textBytes) == docs.map(_._2.length).toVector)
    assert(scan.docs.map(_.nTags) == docs.map(d => (d._1 % 4).toInt).toVector)
    assert(scan.docs.map(_.hasExt) ==
      docs.map(_._1 % 19 == 0).toVector) // 0, 19, 38 carry ext
    // totality: every prefix parses without throwing, never claims
    // clean early; decoded docs are monotone in the prefix
    var prev = 0
    (0 to mp.length).foreach { n =>
      val s = MsgPackFiles.parseMsgPack(java.util.Arrays.copyOf(mp, n))
      assert(s.docs.size >= prev); prev = s.docs.size
      // clean only when the walk consumed the prefix exactly — i.e.
      // the cut landed on an object boundary
      assert(!s.clean || s.trailing == 0)
      assert(s.trailing >= 0 && s.trailing <= n)
    }
    // byte flips never throw
    mp.indices.foreach { i =>
      val mutated = mp.clone()
      mutated(i) = (mutated(i) ^ 0x5a).toByte
      MsgPackFiles.parseMsgPack(mutated)
    }
  }

}
