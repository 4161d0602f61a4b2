package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.GraftSession
import graft.operators.Mvcc

/** Driver-gated queries for §2.7 write/visibility semantics:
  * MVCC read-ts + tombstones + TTL, and upsert last-writer-wins.
  */
object WriteQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    GraftSession.table(s, dir, name)

  /** MVCC visibility: read at ts with delete tombstones + TTL
    * (PhyMvccNode). Data = orders (pk=o_orderkey, ts=o_orderdate);
    * tombstones delete all 1-URGENT orders at their own write ts;
    * TTL = 400 days.
    */
  def mvccVisibility(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val readTs = to_timestamp(lit("1997-06-01 00:00:00"))
    val tombs = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    Mvcc.visible(o, "o_orderkey", "o_orderdate", readTs,
        tombstones = Some(tombs), ttl = Some(expr("INTERVAL 400 DAYS")))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_orderkey"))
  }

  /** Upsert last-writer-wins (task_upsert.go semantics): latest event per
    * user via partial-aggregating max_by — no window shuffle-to-one.
    */
  def upsertLww(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    Mvcc.latestByPk(ev, "user_id", "ts", "event_id")
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 4).as("value"))
      .orderBy(col("user_id"))
  }

  /** Query aggregation surface (internal/agg/aggregate.go): group_by +
    * count/sum/avg/min/max + order_by + limit in one plan.
    */
  def aggEvents(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        round(sum(col("value")), 2).as("sum_value"),
        round(avg(col("value")), 4).as("avg_value"),
        round(min(col("value")), 4).as("min_value"),
        round(max(col("value")), 4).as("max_value"))
      .orderBy(col("cnt").desc, col("event_type"))
      .limit(10)
  }

  /** Query-iterator pagination (pk-cursor, plan.proto:377-381): page
    * after pk cursor 2000, pk-ordered.
    */
  def queryIterator(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders")
      .filter(col("o_orderkey") > 2000 && col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy(col("o_orderkey"))
      .limit(100)
  }

  /** Deterministic sample: the random_sample operator with a fixed
    * modulo predicate stand-in so the oracle can reproduce it (the
    * rand(seed) variant is exercised in ScalaTest).
    */
  def sampleMod(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem")
      .filter(pmod(col("l_orderkey") * 2654435761L % 1000000007L, lit(100)) < 10)
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
  }

  /** Partial-update upsert (task_upsert_partial_op.go): updates after the
    * cutoff set only `value`; `event_type` carries forward from the
    * user's latest pre-cutoff row.
    */
  def upsertPartial(s: SparkSession, dir: String): DataFrame = {
    // events.ts reads as long nanos (see GraftSession); cutoff 2024-01-20 UTC
    val cutoffNs = 1705708800000000000L
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val base = ev.filter(col("ts") <= cutoffNs)
    val updates = ev.filter(col("ts") > cutoffNs)
      .withColumn("event_type", lit(null).cast("string")) // only `value` is set
    graft.operators.Mvcc
      .partialUpsert(base, updates, "user_id", "ts", "event_id", Seq("event_type", "value"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 4).as("value"))
      .orderBy(col("user_id"))
  }

  /** Clustering compaction round-trip (compaction_policy_clustering.go →
    * repartitionByRange layout): rewrite lineitem clustered by l_partkey,
    * then a key-range scan over the clustered copy — results must match
    * the unclustered oracle while Parquet stats prune the files.
    */
  def clusteredScan(s: SparkSession, dir: String): DataFrame = {
    val path = s"${LifecycleQueries.scratchDir("clustered")}/data"
    graft.operators.Clustering.writeClustered(
      t(s, dir, "lineitem"), "l_partkey", path, numPartitions = 16)
    graft.operators.Clustering.prunedRead(s, path, "l_partkey", 100L, 300L)
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        min(col("l_partkey")).as("min_key"), max(col("l_partkey")).as("max_key"))
  }

  /** L0 / delete-merge compaction round-trip (compaction_l0_view.go):
    * fold pre-compactTs tombstones into a rewritten parquet layout, keep
    * residual tombstones, then read at a later ts applying only the
    * residuals — must equal the logical delete semantics end to end.
    */
  def compactFold(s: SparkSession, dir: String): DataFrame = {
    val path = s"${LifecycleQueries.scratchDir("l0")}/data"
    val o = t(s, dir, "orders")
    val tombs = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    graft.operators.Compaction.writeCompacted(o, tombs, "o_orderkey", "o_orderdate",
      to_timestamp(lit("1996-01-01 00:00:00")), path)
    graft.operators.Compaction.readCompacted(s, path, "o_orderkey", "o_orderdate",
        to_timestamp(lit("1997-06-01 00:00:00")))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_orderkey"))
  }

  /** Consistency levels wired end to end (proxy/util.go:1301-1320): a
    * sealed segment (parquet) unioned with two deterministic growing
    * batches — the session's own write at sealed+1h and a foreign write
    * at sealed+2h. With staleness 90min and now = sealed+2h:
    * BoundedStaleness reads at sealed+30m (sealed rows only), Session
    * reads at its own write ts (sealed + own write — read-your-writes),
    * Strong reads at the latest committed ts and Eventually at now
    * (both see everything).
    */
  def consistencyLevels(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{ConsistencyLevel, Mvcc}
    val sealedSeg = t(s, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val maxSealedTs = sealedSeg.agg(max(col("ts"))).head().getLong(0)
    val hourNs = 3600L * 1000000000L
    val ownTs = maxSealedTs + hourNs
    val foreignTs = maxSealedTs + 2 * hourNs
    def growing(pred: Column, idOffset: Long, ts: Long) =
      sealedSeg.filter(pred)
        .select((col("event_id") + idOffset).as("event_id"), lit(ts).as("ts"),
          col("user_id"), col("event_type"), col("value"))
    val union = sealedSeg
      .unionByName(growing(col("event_id") < 50, 1000000L, ownTs))
      .unionByName(growing(col("event_id") >= 50 && col("event_id") < 80, 2000000L, foreignTs))
    val now = foreignTs
    val staleness = hourNs * 3 / 2 // 90 min in the ts domain (ns)
    def tsFor(level: ConsistencyLevel.Value) =
      Mvcc.resolveReadTs(level, latestCommittedTs = foreignTs, now = now,
        staleness = staleness, sessionTs = ownTs)
    def readAt(tsv: Long, label: String) =
      Mvcc.visible(union, "event_id", "ts", lit(tsv))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .select(lit(label).as("level"), col("cnt"), col("sum_value"))
    readAt(tsFor(ConsistencyLevel.BoundedStaleness), "bounded")
      .unionByName(readAt(tsFor(ConsistencyLevel.Eventually), "eventually"))
      .unionByName(readAt(tsFor(ConsistencyLevel.Session), "session"))
      .unionByName(readAt(tsFor(ConsistencyLevel.Strong), "strong"))
      .orderBy(col("level"))
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_compact_fold" -> (compactFold _),
    "q_consistency_levels" -> (consistencyLevels _),
    "q_mvcc_visibility" -> (mvccVisibility _),
    "q_upsert_lww" -> (upsertLww _),
    "q_upsert_partial" -> (upsertPartial _),
    "q_clustered_scan" -> (clusteredScan _),
    "q_agg_events" -> (aggEvents _),
    "q_query_iterator" -> (queryIterator _),
    "q_sample_mod" -> (sampleMod _)
  )

  def oracles: Map[String, String] = Map(
    "q_compact_fold" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        | round(o_totalprice, 2) AS o_totalprice, o_orderdate
        |FROM orders
        |WHERE o_orderdate <= TIMESTAMP '1997-06-01 00:00:00'
        |  AND o_orderpriority <> '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin,
    "q_consistency_levels" ->
      """WITH own AS (SELECT count(*) c, sum(value) v FROM events WHERE event_id < 50),
        |  frn AS (SELECT count(*) c, sum(value) v FROM events
        |          WHERE event_id >= 50 AND event_id < 80),
        |  sld AS (SELECT count(*) c, sum(value) v FROM events)
        |SELECT 'bounded' AS level, sld.c AS cnt, round(sld.v, 2) AS sum_value
        |  FROM sld
        |UNION ALL
        |SELECT 'eventually', sld.c + own.c + frn.c,
        |  round(sld.v + own.v + frn.v, 2) FROM sld, own, frn
        |UNION ALL
        |SELECT 'session', sld.c + own.c, round(sld.v + own.v, 2) FROM sld, own
        |UNION ALL
        |SELECT 'strong', sld.c + own.c + frn.c,
        |  round(sld.v + own.v + frn.v, 2) FROM sld, own, frn
        |ORDER BY level""".stripMargin,
    "q_mvcc_visibility" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        | round(o_totalprice, 2) AS o_totalprice, o_orderdate
        |FROM orders
        |WHERE o_orderdate <= TIMESTAMP '1997-06-01 00:00:00'
        |  AND o_orderdate + INTERVAL 400 DAY > TIMESTAMP '1997-06-01 00:00:00'
        |  AND o_orderpriority <> '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin,
    "q_upsert_lww" ->
      """SELECT user_id, event_id, event_type, round(value, 4) AS value
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_agg_events" ->
      """SELECT event_type, count(*) AS cnt,
        | round(sum(value), 2) AS sum_value,
        | round(avg(value), 4) AS avg_value,
        | round(min(value), 4) AS min_value,
        | round(max(value), 4) AS max_value
        |FROM events GROUP BY event_type
        |ORDER BY cnt DESC, event_type LIMIT 10""".stripMargin,
    "q_query_iterator" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        |FROM orders WHERE o_orderkey > 2000 AND o_orderstatus = 'F'
        |ORDER BY o_orderkey LIMIT 100""".stripMargin,
    "q_sample_mod" ->
      """SELECT count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE ((l_orderkey * 2654435761 % 1000000007) % 100 + 100) % 100 < 10""".stripMargin,
    "q_upsert_partial" ->
      """WITH base AS (SELECT * FROM events WHERE ts <= TIMESTAMP '2024-01-20 00:00:00'),
        |cur AS (SELECT * FROM (SELECT *, row_number() OVER
        |          (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM base)
        |        WHERE rn = 1),
        |upd AS (SELECT e.event_id, e.ts, e.user_id, c.event_type, e.value
        |        FROM events e LEFT JOIN cur c ON e.user_id = c.user_id
        |        WHERE e.ts > TIMESTAMP '2024-01-20 00:00:00'),
        |merged AS (SELECT event_id, ts, user_id, event_type, value FROM upd
        |           UNION ALL
        |           SELECT event_id, ts, user_id, event_type, value FROM cur)
        |SELECT user_id, event_id, event_type, round(value, 4) AS value
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM merged)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_clustered_scan" ->
      """SELECT count(*) AS cnt, round(sum(l_extendedprice), 2) AS sum_price,
        | min(l_partkey) AS min_key, max(l_partkey) AS max_key
        |FROM lineitem WHERE l_partkey BETWEEN 100 AND 300""".stripMargin
  )
}
