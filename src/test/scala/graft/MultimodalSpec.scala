package graft

import org.apache.spark.sql.functions._

import graft.ops.MultimodalOps

/** Semantics checks for the multimodal family's perceptual near-dup
  * (the rest of the family is oracle-checked via the character-math
  * DuckDB recompute; here the invariants that the hash construction
  * must satisfy regardless of corpus):
  *  - identical payloads hash identically, so every injected
  *    cross-source duplicate pair lands at Hamming 0;
  *  - the band join misses nothing at the claimed radius (hamming ≤ 1
  *    counts equal a brute-force all-pairs recount).
  */
class MultimodalSpec extends SparkSpec {

  test("phash: exact duplicates at hamming 0, banding is lossless at r=1") {
    val got = MultimodalOps.phashNearDup(spark, sfTiny).collect()
      .map(r => r.getAs[Long]("hamming") -> r.getAs[Long]("n_pairs")).toMap
    // brute-force witness over the same 27-bin letter-histogram hash
    val texts = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def ahash(t: String): Long = {
      val bins = new Array[Long](32)
      t.getBytes("UTF-8").foreach(b => bins(b & 0x1F) += 1)
      (0 until 27).map(b => if (bins(b) * 27 > t.length) 1L << b else 0L).sum
    }
    val hs = texts.map { case (id, t) => id -> ahash(t) }
    val brute = (for {
      (i1, h1) <- hs; (i2, h2) <- hs if i1 < i2
      d = java.lang.Long.bitCount(h1 ^ h2) if d <= 1
    } yield d.toLong).groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got == brute, s"$got != $brute")
    // identical texts are a subset of the hamming-0 pairs
    val dupPairs = texts.groupBy(_._2).values.map(_.length.toLong)
      .map(n => n * (n - 1) / 2).sum
    assert(got.getOrElse(0L, 0L) >= dupPairs)
  }
}
