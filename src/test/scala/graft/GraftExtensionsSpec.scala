package graft

import org.apache.spark.sql.SparkSessionExtensions

class GraftExtensionsSpec extends SparkSpec {

  test("registerAll exposes the whole function surface through SQL") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)),
        |               array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d,
        |       roll_hash('abc d') AS h,
        |       st_x(st_centroid('POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))')) AS cx
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == 293001343L)
    assert(r.getDouble(2) == 1.0)
    // the bloom pair is part of the registered surface too: a filter
    // built over keys 1..3 must admit its members (no false negatives);
    // might_contain demands a CONSTANT or scalar-subquery bloom side.
    // The probe key must reach codegen as a COLUMN, not a literal —
    // Spark's BloomFilterMightContain codegen mishandles foldable
    // probe inputs (emits `(Long)<literal>`, invalid Janino → "Expr
    // codegen error" WARN + interpreted fallback). A generator source
    // survives constant folding; a plain `SELECT 2L AS k` subquery
    // does not. The column probe is also the production shape
    // (q_bloom_prune).
    val bloom = spark.sql(
      """SELECT bloom_might_contain(
        |         (SELECT bloom_agg(id, 100L)
        |          FROM (SELECT explode(sequence(1L, 3L)) AS id)),
        |         k) AS hit
        |FROM (SELECT explode(sequence(2L, 2L)) AS k)
        |""".stripMargin).collect()(0)
    assert(bloom.getBoolean(0), "bloom filter dropped a member key")
  }

  test("st_* functions return NULL on NULL geometry instead of NPE-failing the task") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT st_centroid(CAST(NULL AS STRING)) AS c,
        |       st_area(CAST(NULL AS STRING)) AS a,
        |       st_within('POINT(0 0)', CAST(NULL AS STRING)) AS w,
        |       st_x(CAST(NULL AS STRING)) AS x
        |""".stripMargin).collect()(0)
    (0 until 4).foreach(i => assert(r.isNullAt(i), s"column $i must be NULL"))
  }

  test("GraftExtensions injects the native expressions into an extensions registry") {
    // SparkSessionExtensions has a public constructor (DeveloperApi);
    // apply the plugin and confirm the builders resolve and construct.
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders checked below
    import org.apache.spark.sql.functions.{col, expr}
    // the builders themselves are the ones registerAll uses — exercise
    // one end-to-end through SQL to pin the wiring
    GraftFunctions.registerAll(spark)
    val n = Tables.embeddings(spark, sfTiny).limit(5)
      .select(expr("vec_dot(embedding, embedding)").as("d"))
      .filter(col("d") >= 0).count()
    assert(n == 5)
  }
}
