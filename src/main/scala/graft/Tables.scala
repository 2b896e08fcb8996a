package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` function receives `(spark, sfDir)` and reads
  * only through here, so the scan layer is a single seam: at 100 TB the same
  * code points at a partitioned table location instead of one parquet file,
  * and Catalyst's parquet pushdown/pruning applies unchanged.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    * parquet reader rejects outright. Read nanos as long (legacy conf,
    * runtime-settable) and rebuild the timestamp with integral division —
    * `ts div 1000` stays in long arithmetic; a double division would lose
    * precision above 2^53 ns (~1970+104 days).
    */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    // set-if-absent guard: a per-call conf.set mutates session state on
    // every events read; one idempotent stamp per session is enough
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = eventsRaw(spark, sfDir)
    // the driver has shipped events.ts three ways across testdata
    // generations: TIMESTAMP(NANOS) (surfaces as long via nanosAsLong),
    // TIMESTAMP_NTZ(MICROS), and plain TIMESTAMP — normalize all three
    // to session-zone TIMESTAMP so downstream unix_millis()/window()
    // logic is generation-independent
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
