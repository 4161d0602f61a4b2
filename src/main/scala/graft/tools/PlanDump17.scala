package graft.tools

import org.apache.spark.sql.functions._

/** Round-17 plan evidence: prints `explain("formatted")` for the
  * representative touched paths so the before/after files under
  * plans/r17/ can be regenerated. Usage:
  *   sbt "runMain graft.tools.PlanDump17 [sfDir]"
  *
  * Section `secondread`: the SECOND facade read of an unchanged
  * collection — the path the round-17 view memo + pin changed (before:
  * the full union -> MVCC collapse tree re-planned per call; after: an
  * InMemoryTableScan over the pinned view).
  */
object PlanDump17 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local()
    import org.apache.spark.sql.SparkSession

    def explainStr(df: org.apache.spark.sql.DataFrame): String = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
      out.toString
    }

    // 1. whole-query plans (returned DataFrames)
    Seq("q_time_fields", "q_orderby_spec", "q_expr_range", "q_topk_cosine")
      .foreach { n =>
        println(s"\n===== $n =====")
        println(explainStr(graft.SparkEntry.queries(n)(spark, sfDir)))
      }

    // 2. the second facade read of an unchanged collection (the
    // q_agg_matrix / battery pattern): build the same fixture shape,
    // read twice, explain the SECOND read's plan
    println("\n===== secondread (battery pattern: 2nd queryAgg on an unchanged collection) =====")
    val ev = graft.GraftSession.table(spark, sfDir, "events")
      .select(col("event_id").as("id"), (col("event_id") % 100).as("c2"),
        (col("event_id") % 7).as("c3"))
    val c = graft.Collection.create(spark,
      graft.CollectionSchema(pkField = "id"))
    c.insert(ev)
    // first read builds (and on the after-side registers) the view;
    // second read is the one every later battery call pays for
    c.queryAgg(outputFields = Seq("count(*)")).collect()
    val second = c.queryAgg(outputFields = Seq("count(c2)", "sum(c3)"))
    second.collect() // materialize the pin so the explain shows the cache
    println(explainStr(c.queryAgg(outputFields = Seq("count(c2)", "sum(c3)"))))
    spark.stop()
  }
}
