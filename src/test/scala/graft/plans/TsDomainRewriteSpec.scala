package graft.plans

import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkSpec}

/** [[TsDomainRewrite]]: the normalized epoch-nanos ts predicate must
  * (a) produce exactly the rows the Long-domain semantics dictate —
  * including sub-microsecond literal bounds, where floor/ceil rounding
  * direction matters — and (b) land in the parquet scan's
  * `PushedFilters` instead of a post-scan filter.
  */
class TsDomainRewriteSpec extends SparkSpec {

  private def events = GraftSession.table(spark, sfDir, "events")

  // Scala-side oracle over the collected micros values (collected from
  // the raw parquet read, NOT through any plan the rule could touch).
  private lazy val microsVals: Seq[Long] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/events.parquet")
      .select(unix_micros(col("ts").cast("timestamp")))
      .as[Long].collect().toSeq
  }

  test("ns-domain bounds match a Scala oracle at microsecond-misaligned literals") {
    val someUs = microsVals.sorted.apply(microsVals.size / 2)
    // bounds straddling a real value at ±1ns and exact alignment
    val bounds = Seq(someUs * 1000L - 1, someUs * 1000L, someUs * 1000L + 1)
    for (n <- bounds) {
      assert(events.filter(col("ts") <= n).count() ==
        microsVals.count(_ * 1000L <= n).toLong, s"<= $n")
      assert(events.filter(col("ts") > n).count() ==
        microsVals.count(_ * 1000L > n).toLong, s"> $n")
      assert(events.filter(col("ts") < n).count() ==
        microsVals.count(_ * 1000L < n).toLong, s"< $n")
      assert(events.filter(col("ts") >= n).count() ==
        microsVals.count(_ * 1000L >= n).toLong, s">= $n")
      assert(events.filter(lit(n) >= col("ts")).count() ==
        microsVals.count(_ * 1000L <= n).toLong, s"$n >= ts (reversed)")
      assert(events.filter(lit(n) < col("ts")).count() ==
        microsVals.count(_ * 1000L > n).toLong, s"$n < ts (reversed)")
    }
    // equality: microsecond-aligned rewrites, misaligned is left alone —
    // both must still agree with the oracle
    assert(events.filter(col("ts") === someUs * 1000L).count() ==
      microsVals.count(_ == someUs).toLong)
    assert(events.filter(col("ts") === (someUs * 1000L + 1)).count() == 0L)
  }

  test("additive shifts fold into the pushed bound (the TTL predicate shape)") {
    val cutNs = microsVals.sorted.apply(microsVals.size / 3) * 1000L
    val ttlNs = 86400L * 1000000000L
    // ts + ttl > cut  — how Collection.readView applies TTL
    assert(events.filter(col("ts") + ttlNs > cutNs).count() ==
      microsVals.count(_ * 1000L + ttlNs > cutNs).toLong)
    assert(events.filter(col("ts") - lit(5L) <= cutNs).count() ==
      microsVals.count(_ * 1000L - 5L <= cutNs).toLong)
  }

  test("the rewritten range predicate reaches the parquet scan (PushedFilters)") {
    val cutNs = 1705708800000000000L // 2024-01-20 UTC
    val df = events.filter(col("ts") <= cutNs).select(col("event_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.matches("(?s).*PushedFilters:[^\\]]*LessThanOrEqual\\(ts,.*"),
      s"ts bound not pushed to the scan:\n$plan")
  }
}
