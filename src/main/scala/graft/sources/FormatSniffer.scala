package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** Magic-byte format dispatcher — the FRONT of a mixed-container data
  * lake, where shards arrive with lying or missing extensions and the
  * reader must route each one to the right walker by content alone.
  * Every rule is a public file-format signature:
  *
  *   - gzip: `1f 8b`
  *   - ZIP: `PK\3\4`
  *   - tar: `ustar` at offset 257 (the POSIX header magic)
  *   - WARC: the `WARC/1.` version line
  *   - Avro OCF: `Obj\1`
  *   - Arrow IPC stream: the `FFFFFFFF` continuation marker
  *   - TFRecord: NO magic exists — identified LAST by its
  *     self-validating frame (the masked CRC32C of the first 8 length
  *     bytes must match the stored length-crc; random non-TFRecord
  *     bytes pass with probability 2⁻³²)
  *
  * [[sniffAndWalk]] routes to the codec battery's own parsers, so the
  * dispatcher composes every container walker in `sources/` behind one
  * front door. Total on any input — unknown bytes classify as
  * `unknown`, never throw.
  */
object FormatSniffer {

  /** format tag, format-specific unit count (members/entries/records/
    * blocks/batches), and the walker's own clean verdict. */
  final case class Sniffed(format: String, nUnits: Long, clean: Boolean)

  private def u32le(b: Array[Byte], p: Int): Long =
    if (p < 0 || p > b.length - 4) -1L
    else (b(p) & 0xff).toLong | ((b(p + 1) & 0xff).toLong << 8) |
      ((b(p + 2) & 0xff).toLong << 16) | ((b(p + 3) & 0xff).toLong << 24)

  private[graft] def detect(b: Array[Byte]): String = {
    def at(i: Int, v: Int) = i < b.length && (b(i) & 0xff) == v
    if (at(0, 0x1f) && at(1, 0x8b)) "gzip"
    else if (at(0, 'P') && at(1, 'K') && at(2, 3) && at(3, 4)) "zip"
    else if (b.length >= 262 &&
      new String(b, 257, 5, UTF_8) == "ustar") "tar"
    else if (b.length >= 7 &&
      new String(b, 0, 7, UTF_8) == "WARC/1.") "warc"
    else if (at(0, 'O') && at(1, 'b') && at(2, 'j') && at(3, 1)) "avro"
    else if (at(0, 0xff) && at(1, 0xff) && at(2, 0xff) && at(3, 0xff))
      "arrow"
    else if (b.length >= 12 &&
      TfRecordFiles.mask(TfRecordFiles.crc32c(b, 0, 8)) == u32le(b, 8))
      "tfrecord"
    else "unknown"
  }

  private[graft] def sniffAndWalk(b: Array[Byte]): Sniffed =
    detect(b) match {
      case "gzip" =>
        val s = GzipFiles.parseGzip(b)
        Sniffed("gzip", s.members.size.toLong, s.clean)
      case "zip" =>
        val s = ZipFiles.parseZip(b)
        Sniffed("zip", s.entries.size.toLong, s.clean)
      case "tar" =>
        val s = TarFiles.parseTar(b)
        Sniffed("tar", s.members.size.toLong, s.clean)
      case "warc" =>
        val s = WarcFiles.parseWarc(b)
        Sniffed("warc", s.records.size.toLong, s.clean)
      case "avro" =>
        val s = AvroFiles.parseAvroSniffed(b)
        Sniffed("avro", s.blocks.size.toLong, s.clean)
      case "arrow" =>
        val s = ArrowIpc.parseArrowStream(b)
        Sniffed("arrow", s.batches.size.toLong, s.clean)
      case "tfrecord" =>
        val s = TfRecordFiles.parseTfRecords(b)
        Sniffed("tfrecord", s.records.size.toLong, s.clean)
      case u => Sniffed(u, 0L, clean = false)
    }
}
