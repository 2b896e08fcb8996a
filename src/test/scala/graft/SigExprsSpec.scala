package graft

import graft.functions.SigKernels

/** Parity pins for the native LSH-signature kernels: the kernel's
  * MessageDigest + bit-arithmetic path must equal the same math spelled
  * out through Spark's OWN md5/conv SQL functions (the formulation the
  * DuckDB oracle mirrors). A divergence in the hex-prefix parse or the
  * modular arithmetic fails here before it can silently shift LSH
  * bucketing.
  */
class SigExprsSpec extends SparkSpec {

  private def registered = {
    graft.functions.SigExprs.register(spark)
    spark
  }

  test("minhash_sigs == min over md5/conv universal hashes (SQL path)") {
    val row = registered.sql(
      """SELECT minhash_sigs(array('alpha beta', 'gamma d', 'e')) AS sigs,
        |  array(
        |    CAST(conv(substring(md5('alpha beta'), 1, 15), 16, 10) AS BIGINT) % 2147483647,
        |    CAST(conv(substring(md5('gamma d'), 1, 15), 16, 10) AS BIGINT) % 2147483647,
        |    CAST(conv(substring(md5('e'), 1, 15), 16, 10) AS BIGINT) % 2147483647) AS h31s
        |""".stripMargin).head()
    val sigs = row.getSeq[Long](0)
    val h31s = row.getSeq[Long](1)
    assert(sigs.length == SigKernels.NumHashes)
    (0 until SigKernels.NumHashes).foreach { i =>
      val expected = h31s
        .map(h => (SigKernels.hA(i) * h + SigKernels.hB(i)) % SigKernels.MersP)
        .min
      assert(sigs(i) == expected, s"hash $i: ${sigs(i)} != $expected")
    }
  }

  test("minhash_sigs of an empty array is null (SQL MIN semantics)") {
    val row = registered.sql(
      "SELECT minhash_sigs(cast(array() AS array<string>)) AS sigs").head()
    assert(row.isNullAt(0))
  }

  test("NULL array elements are skipped, not NPE'd (public SQL surface)") {
    val row = registered.sql(
      """SELECT minhash_sigs(array('x', CAST(NULL AS STRING))) AS m1,
        |       minhash_sigs(array('x')) AS m2,
        |       minhash_sigs(array(CAST(NULL AS STRING))) AS m_all_null,
        |       simhash_sig(array('a', CAST(NULL AS STRING), 'a')) AS s1,
        |       simhash_sig(array('a', 'a')) AS s2,
        |       simhash_sig(array(CAST(NULL AS STRING))) AS s_all_null,
        |       simhash_sig(cast(array() AS array<string>)) AS s_empty
        |""".stripMargin).head()
    assert(row.getSeq[Long](0) == row.getSeq[Long](1))
    assert(row.isNullAt(2))
    assert(row.getLong(3) == row.getLong(4))
    // degenerate inputs must NOT produce a legitimate-looking all-zero
    // signature (it would band-match every other degenerate document)
    assert(row.isNullAt(5))
    assert(row.isNullAt(6))
  }

  test("simhash_sig == tf-weighted bit votes over md5/conv term hashes (SQL path)") {
    // 'a' appears twice — the tf weight must count it, not just distinct
    val words = Seq("a", "b", "a", "longer-token")
    val row = registered.sql(
      s"""SELECT simhash_sig(array(${words.map(w => s"'$w'").mkString(",")})) AS sig,
         |  array(${words.distinct.map(w =>
              s"CAST(conv(substring(md5('$w'), 1, 8), 16, 10) AS BIGINT)").mkString(",")}) AS hs
         |""".stripMargin).head()
    val sig = row.getLong(0)
    val hs = row.getSeq[Long](1)
    val tf = words.groupBy(identity).view.mapValues(_.size)
    val votes = new Array[Long](SigKernels.SimBits)
    words.distinct.zip(hs).foreach { case (w, h) =>
      (0 until SigKernels.SimBits).foreach { b =>
        if (((h >> b) & 1L) == 1L) votes(b) += tf(w) else votes(b) -= tf(w)
      }
    }
    val expected = (0 until SigKernels.SimBits)
      .map(b => if (votes(b) > 0) 1L << b else 0L).sum
    assert(sig == expected, s"$sig != $expected")
  }
}
