package graft

/** Automated scale audit: no driver-gated query may plan a
  * CartesianProduct — the one physical operator that cannot survive a
  * 100× scale-up (a broadcast nested-loop with the nq-sized query side
  * broadcast is fine and expected for ANN scoring). The only whitelisted
  * entries are the row-capped exhaustive-verify helpers whose APIs
  * refuse unbounded input.
  */
class PlanAuditSpec extends SparkSpec {

  // bounded-by-API quadratic verify steps (jaccardPairsExhaustive caps
  // rows and exists as the oracle-side ground truth)
  private val cartesianWhitelist = Set("q_jaccard_pairs")

  test("no query plans an unbounded CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if cartesianWhitelist(name) => None
      case (name, fn) =>
        // PHYSICAL plan: the logical `Join Cross` of crossJoin(broadcast(q))
        // correctly plans as BroadcastNestedLoopJoin (nq-sized build side);
        // CartesianProduct is the shape that cannot scale
        val plan =
          try fn(spark, dir).queryExecution.sparkPlan.toString
          catch { case e: Throwable => s"PLANNING FAILED: $e" }
        if (plan.contains("PLANNING FAILED") || plan.contains("CartesianProduct"))
          Some(name -> plan.linesIterator.take(3).mkString(" | "))
        else None
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, p) => s"$n: $p" }.mkString("\n"))
  }
}
