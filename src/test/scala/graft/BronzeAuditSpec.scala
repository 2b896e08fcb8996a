package graft

import java.sql.Timestamp

import org.apache.spark.sql.types.{StringType, TimestampType}

import graft.etl.SilverMobility

/** F9: the `CURRENT_TIMESTAMP` audit column on the bronze ingest
  * projection (`dags/mitma/bronze_mitma.py:24,67`). The column is
  * nondeterministic, so it lives outside the oracle-hashed query surface
  * (documented in SilverMobility.bronzeIngest) — this spec is its
  * correctness gate: shape, type, and clock semantics.
  */
class BronzeAuditSpec extends SparkSpec {

  test("bronze ingest carries a TIMESTAMP ingestion_date audit column") {
    val df = SilverMobility.bronzeIngest(spark, sfTiny)
    val schema = df.schema
    assert(schema.fieldNames.toSeq ==
      Seq("fecha", "origen", "destino", "viajes", "ingestion_date"))
    // bronze payload columns are all VARCHAR; the audit column is the
    // one typed column, exactly the reference's bronze shape
    assert(schema.fields.take(4).forall(_.dataType == StringType))
    assert(schema("ingestion_date").dataType == TimestampType)
  }

  test("ingestion_date: non-null, single stamp per query, bounded skew") {
    val before = System.currentTimeMillis()
    val stamps = SilverMobility.bronzeIngest(spark, sfTiny)
      .select("ingestion_date").distinct().collect()
    val after = System.currentTimeMillis()

    // current_timestamp is QUERY-time, not row-time: one distinct value
    // across every row (DuckDB's transaction-time semantics; Spark pins
    // the clock once per query execution)
    assert(stamps.length == 1, s"expected one distinct stamp, got ${stamps.length}")
    val ts = stamps.head.getAs[Timestamp](0)
    assert(ts != null)
    // bounded clock skew: the stamp was taken while this test ran
    // (generous ±60s guard — the assertion is "this is the wall clock,
    // not a constant or an epoch default")
    assert(ts.getTime >= before - 60000 && ts.getTime <= after + 60000,
      s"ingestion_date $ts outside [$before, $after] ±60s")
  }
}
