package graft.plans

import org.apache.spark.sql.functions._

import graft.queries.WriteQueries
import graft.{Collection, CollectionSchema, SparkSpec}

/** End-to-end guard for the engine's hottest predicate: the MVCC
  * visibility bound (`ts <= read_ts`) must reach the PHYSICAL parquet
  * scan's `PushedFilters` — not merely survive [[TsDomainRewrite]] in
  * isolation (TsDomainRewriteSpec covers the rule; this covers the
  * wiring through the real read paths). If a future Spark upgrade or
  * plan change silently un-pushes it, every read at 100 TB becomes a
  * full post-scan evaluation with no row-group pruning, and this spec
  * fails.
  */
class MvccPushdownSpec extends SparkSpec {

  private def pushedFiltersOf(df: org.apache.spark.sql.DataFrame): String = {
    // force real physical planning (AQE finalizes on execute)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("Collection sealed read pushes the normalized ts visibility bound") {
    import spark.implicits._
    val dir = "/tmp/graft_test_mvccpush_" + System.nanoTime()
    // timestamp-typed fixture — the driver-parquet shape that goes
    // through GraftSession.normalizeTs at the load boundary
    (0L until 100L).map(i => (i, s"r$i"))
      .toDF("pk", "payload")
      .withColumn("ts", timestamp_micros(
        unix_micros(to_timestamp(lit("2024-01-10 00:00:00"))) +
          col("pk") * 60000000L))
      .write.parquet(dir)
    val c = Collection.open(spark,
      CollectionSchema(pkField = "pk", tsField = "ts"), dir)
    val df = c.query("", Seq("pk", "payload"))
    val plan = pushedFiltersOf(df)
    assert(plan.matches("(?s).*PushedFilters:[^\\]]*LessThanOrEqual\\(ts,.*"),
      s"MVCC visibility ts bound not pushed to the sealed scan:\n$plan")
  }

  test("q_mvcc_visibility's own plan pushes its ts bound and TTL bound") {
    val df = WriteQueries.mvccVisibility(spark, sfDir)
    val plan = pushedFiltersOf(df)
    // visibility upper bound AND the TTL lower bound both pushdown-able
    // (o_orderdate is timestamp-typed; readTs and ttl fold to literals)
    assert(plan.matches("(?s).*PushedFilters:[^\\]]*LessThanOrEqual\\(o_orderdate,.*"),
      s"visibility bound not pushed on q_mvcc_visibility:\n$plan")
    assert(plan.matches("(?s).*PushedFilters:[^\\]]*GreaterThan\\(o_orderdate,.*"),
      s"TTL bound not pushed on q_mvcc_visibility:\n$plan")
  }
}
