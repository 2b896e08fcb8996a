package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** S14 — catalog introspection, the reference's schema-adaptive layer:
  *
  *  - required-table existence checks before a pipeline runs
  *    (`dags/ducklake_utils.py:152-158`,
  *    `dags/gravity/verify_dependencies.py:12-31`);
  *  - `PRAGMA table_info` + candidate-column picking, so the long-trip
  *    transform adapts to whichever id/geometry columns the gold table
  *    actually has (`dags/bussiness_layer/
  *    transform_gold_long_trip_dependency.py:22-33,42-56`);
  *  - whole-catalog column dump (`dags/get_schema/get_shema.py:14`).
  *
  * Spark mapping: temp views + `spark.catalog.tableExists` /
  * `spark.table(t).schema`. Driver-side introspection only — no data
  * moves; the resolved names are injected into an ordinary pushed-down
  * DataFrame plan, exactly like the reference interpolates the resolved
  * column into its SQL string.
  */
object CatalogOps {

  private val CatalogTables = Seq("nation", "region", "customer", "orders", "documents")

  private def registerViews(spark: SparkSession, sfDir: String): Unit =
    CatalogTables.foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }

  // ------------------------------------------------------------------
  /** Catalog dump: per registered table, its column count, alphabetical
    * first column (from the schema — introspection, not data) and its
    * row count (from the data). The oracle states the known physical
    * schema as constants and recomputes the counts, so a wrong schema
    * read OR a wrong count both fail.
    */
  def catalogDump(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    val missing = CatalogTables.filterNot(spark.catalog.tableExists)
    require(missing.isEmpty, s"verify_dependencies failed: missing $missing")
    import spark.implicits._
    val schemaSide = CatalogTables.map { t =>
      val fields = spark.table(t).schema.fieldNames
      (t, fields.length, fields.min)
    }.toDF("table_name", "n_cols", "first_col_alpha")
    val countSide = CatalogTables.map(t =>
        spark.table(t).groupBy().agg(count(lit(1)).as("n_rows"))
          .select(lit(t).as("table_name"), col("n_rows")))
      .reduce(_.union(_))
    schemaSide.join(countSide, Seq("table_name"))
      .orderBy(col("table_name"))
  }

  private val catalogDumpOracle =
    """SELECT s.table_name, s.n_cols, s.first_col_alpha, c.n_rows
      |FROM (VALUES ('nation', 3, 'n_name'), ('region', 2, 'r_name'),
      |             ('customer', 5, 'c_acctbal'), ('orders', 6, 'o_custkey'),
      |             ('documents', 5, 'doc_id')) AS s(table_name, n_cols, first_col_alpha)
      |JOIN (SELECT 'nation' AS table_name, COUNT(*) AS n_rows FROM nation
      |      UNION ALL SELECT 'region', COUNT(*) FROM region
      |      UNION ALL SELECT 'customer', COUNT(*) FROM customer
      |      UNION ALL SELECT 'orders', COUNT(*) FROM orders
      |      UNION ALL SELECT 'documents', COUNT(*) FROM documents) c
      |  USING (table_name)
      |ORDER BY table_name""".stripMargin

  // ------------------------------------------------------------------
  /** Schema-adaptive aggregation: the amount/date columns are RESOLVED
    * at plan-build time from a candidate list against the actual schema
    * (`transform_gold_long_trip_dependency.py:42-56` picks
    * municipality/geometry columns the same way), then injected into a
    * plain pushed-down aggregate. The oracle hardcodes the columns the
    * resolution must arrive at.
    */
  def schemaAdaptive(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    val fields = spark.table("orders").schema.fieldNames.toSet
    def resolve(cands: Seq[String]): String =
      cands.find(fields.contains).getOrElse(
        sys.error(s"none of $cands present in orders(${fields.mkString(",")})"))
    val amountCol = resolve(Seq("total_amount", "order_total", "o_totalprice"))
    val dateCol = resolve(Seq("order_date", "created_at", "o_orderdate"))
    val statusCol = resolve(Seq("status", "o_orderstatus"))
    spark.table("orders")
      .groupBy(year(col(dateCol)).cast("int").as("yr"), col(statusCol).as("status"))
      .agg(count(lit(1)).as("n"),
        round(sum(col(amountCol)), 4).as("total_amount"))
      .orderBy(col("yr"), col("status"))
  }

  private val schemaAdaptiveOracle =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, o_orderstatus AS status,
      |       COUNT(*) AS n, ROUND(SUM(o_totalprice), 4) AS total_amount
      |FROM orders GROUP BY 1, 2 ORDER BY yr, status""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_catalog_dump" -> (catalogDump _),
    "q_schema_adaptive" -> (schemaAdaptive _)
  )

  def oracles: Map[String, String] = Map(
    "q_catalog_dump" -> catalogDumpOracle,
    "q_schema_adaptive" -> schemaAdaptiveOracle
  )
}
