package graft.queries

import graft.SparkSpec
import graft.expr.{Binary, BinOp, ExprCompiler, Node, Parser, Unary, UnaryOp}

/** Pins the regression battery to the reference's EXACT expected_ids
  * (test_filter_regressions.py + filtering_case_matrix.py expression
  * lists over the verbatim build_order_rows fixture) — the oracle rows
  * pin cnt/id_sum against DuckDB, this pins full membership. Also
  * asserts each fanout case's leaf-predicate count, the reference's
  * assert_expression_fanout shape check.
  */
class RegressionMatrixSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = MatrixQueries.regressionDf(spark)

  private def ids(engine: String): Set[Long] =
    df.filter(ExprCompiler.compile(engine, df, jsonColumns = Set("meta")))
      .select($"id").as[Long].collect().toSet

  test("every case returns the reference's pinned id set") {
    for (c <- MatrixQueries.RegressionCases) {
      val want = MatrixQueries.RegressionExpected(c.id)
      val got = ids(c.engine)
      assert(got == want, s"case ${c.id}: got $got want $want")
    }
    assert(MatrixQueries.RegressionCases.map(_.id).toSet ==
      MatrixQueries.RegressionExpected.keySet)
  }

  test("order permutations and algebraic equivalences agree pairwise") {
    val byId = MatrixQueries.RegressionCases.map(c => c.id -> c.engine).toMap
    for (base <- Seq("ord1", "ord2", "ord3", "ord4", "eq_or_vs_in",
        "eq_demorgan", "eq_distrib")) {
      assert(ids(byId(s"${base}_l")) == ids(byId(s"${base}_r")),
        s"$base: left and right permutation disagree")
    }
  }

  test("fanout cases carry the declared number of leaf predicates") {
    // assert_expression_fanout: AND/OR fan out, NOT is transparent,
    // everything else is one leaf
    def fanout(n: Node): Int = n match {
      case Binary(BinOp.And | BinOp.Or, l, r) => fanout(l) + fanout(r)
      case Unary(UnaryOp.Not, c)              => fanout(c)
      case _                                  => 1
    }
    val declared = Seq(
      ("age > 10", 1),
      ("age > 10 and score <= 90", 2),
      ("age > 10 and score <= 90 and active == true", 3),
      ("""age > 10 and score <= 90 and active == false and tag != "ops" and meta["rank"] >= 3""", 5),
      ("""(age > 10 and meta["rank"] in [1, 3]) or active == true""", 3),
      ("""meta["p"] == 1 or meta["p"] == 2""", 2),
      ((1 to 5).map(i => s"""meta["p"] == $i""").mkString(" or "), 5),
      ((1 to 10).map(i => s"""meta["p"] == $i""").mkString(" or "), 10))
    for ((expr, n) <- declared)
      assert(fanout(Parser.parse(expr)) == n, s"fanout of `$expr` != $n")
  }
}
