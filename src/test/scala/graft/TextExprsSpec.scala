package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.functions.TextExprs

/** RollingHash expression semantics: bit-parity with the higher-order
  * sequential fold it replaces (interpreted + codegen paths), analysis-
  * time type checking, and NULL propagation.
  */
class TextExprsSpec extends SparkSpec {

  test("roll_hash equals the HOF sequential fold on real documents") {
    TextExprs.register(spark)
    val bad = Tables.documents(spark, sfSmall)
      .select(
        expr("roll_hash(text)").as("fast"),
        expr("aggregate(transform(split(text, ''), ch -> CAST(ascii(ch) AS BIGINT)), " +
          "CAST(7 AS BIGINT), (acc, c) -> (acc * 31 + c) % 2147483647)").as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(bad == 0, s"$bad rows where RollingHash != HOF fold")
  }

  test("roll_hash: known value, empty string, NULL, type rejection") {
    TextExprs.register(spark)
    val r = spark.sql(
      "SELECT roll_hash('abc d'), roll_hash(''), roll_hash(CAST(NULL AS STRING))")
      .collect()(0)
    assert(r.getLong(0) == 293001343L) // cross-checked against DuckDB list_reduce
    assert(r.getLong(1) == 7L)         // seed survives the empty fold
    assert(r.isNullAt(2))
    intercept[AnalysisException] {
      spark.sql("SELECT roll_hash(42)").collect()
    }
  }
}
