package graft

import graft.expr.ExprCompiler
import graft.queries.MatrixQueries

/** The conformance-matrix batteries re-run through the Collection
  * facade (reference: the same filtering_case_matrix families execute
  * through the proxy's query path, not a bare expression evaluator).
  * `Collection.query` layers RLS, TTL, partial-load scope, dropped-field
  * strictness, and the optimizer rewrites on top of the compiler — a
  * divergence between the facade count and the direct-compile count is
  * exactly the silent-divergence class the index-consistency suite
  * guards against, so every case is pinned both ways.
  */
class MatrixFacadeSpec extends SparkSpec {

  private def runBattery(name: String, cases: Seq[MatrixQueries.MCase],
      df: org.apache.spark.sql.DataFrame, jsonCols: Set[String]): Unit = {
    val cached = df.cache()
    try {
      val c = Collection.create(spark,
        CollectionSchema(pkField = "id", jsonFields = jsonCols))
      c.insert(cached)
      cases.foreach { mc =>
        val direct = cached.filter(
          ExprCompiler.compile(mc.engine, cached, jsonColumns = jsonCols)).count()
        val facade = c.count(mc.engine)
        assert(facade == direct,
          s"$name/${mc.id}: facade=$facade direct=$direct for `${mc.engine}`")
      }
    } finally cached.unpersist()
  }

  test("typed numeric matrix answers identically through the facade") {
    runBattery("typed", MatrixQueries.TypedCases,
      MatrixQueries.typedDf(spark, sfDir), Set.empty)
  }

  test("array matrix answers identically through the facade") {
    runBattery("array", MatrixQueries.ArrayCases,
      MatrixQueries.arrayDf(spark, sfDir), Set.empty)
  }

  test("null/unknown matrix answers identically through the facade") {
    runBattery("null", MatrixQueries.NullCases,
      MatrixQueries.nullDf(spark, sfDir), Set("j"))
  }

  test("json kind-bucket matrix answers identically through the facade") {
    runBattery("jsonKind", MatrixQueries.JsonKindCases,
      MatrixQueries.jsonKindDf(spark, sfDir), Set("j"))
  }

  test("LIKE matrix answers identically through the facade") {
    runBattery("like", MatrixQueries.LikeCases,
      MatrixQueries.likeDf(spark, sfDir), Set.empty)
  }

  test("regression matrix answers identically through the facade") {
    runBattery("regression", MatrixQueries.RegressionCases,
      MatrixQueries.regressionDf(spark), Set("meta"))
  }

  test("regex matrix answers identically through the facade") {
    runBattery("regex", MatrixQueries.RegexCases,
      MatrixQueries.regexDf(spark), Set.empty)
  }

  test("undeclared json field diverges from declared (kind buckets are schema-driven)") {
    // Guard the jsonFields declaration itself: without it a StringType
    // field's paths extract untyped — the string "14" would compare
    // equal to the number 14 under Catalyst's implicit casts. The
    // declared collection must bucket by kind instead.
    import spark.implicits._
    val rows = Seq(
      (1L, """{"p": 14}"""),
      (2L, """{"p": "14"}""")).toDF("id", "j")
    val declared = Collection.create(spark,
      CollectionSchema(pkField = "id", jsonFields = Set("j")))
    declared.insert(rows)
    assert(declared.count("""j["p"] == 14""") == 1L)
    assert(declared.count("""j["p"] == "14"""") == 1L)
  }
}
