package graft

import org.scalatest.funsuite.AnyFunSuite

/** Spark-free smoke for the query/oracle registries.
  *
  * Forces every registry map at class-load without starting Spark, so an
  * object-initialization-order landmine (a strict `val` map capturing a
  * member declared textually later — the round-11 harness crash) fails
  * here in milliseconds instead of killing Verify/Bench at runtime.
  */
class RegistrySmokeSpec extends AnyFunSuite {

  test("SparkEntry.queries loads and is non-empty") {
    val keys = SparkEntry.queries.keySet
    assert(keys.nonEmpty, "queries registry is empty")
  }

  test("SparkEntry.oracleSql loads and every oracle key has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql
    val orphans = o.keySet.diff(q)
    assert(orphans.isEmpty, s"oracleSql keys with no queries entry: $orphans")
  }

  test("every query has an oracle (driver correctness gate is two-sided)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val missing = q.diff(o)
    assert(missing.isEmpty, s"queries with no oracleSql entry: $missing")
  }

  test("no oracle SQL is blank or placeholder") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, s"$k: blank oracle")
      assert(!sql.contains("???"), s"$k: placeholder oracle")
    }
  }

  test("per-module battery declarations force cleanly") {
    // Touch the specific members behind the round-11 crash so a future
    // re-ordering regression is named, not just "queries failed to load".
    assert(graft.queries.MatrixQueries.TermCases.nonEmpty)
    assert(graft.queries.MatrixQueries.TermErrorCases.nonEmpty)
    assert(graft.queries.MatrixQueries.oracles.contains("q_term_matrix"))
    assert(graft.queries.MatrixQueries.oracles("q_term_matrix").nonEmpty)
  }
}
