package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Streaming ingest — the Spark re-expression of the reference's write
  * path (reference: WAL per vchannel internal/streamingnode/server/wal/;
  * growing-segment consumption querynodev2/pipeline/{filter,insert,
  * delete}_node.go; flush to sealed binlog flushcommon/, configs
  * datacoord.segment.maxSize/sealProportion milvus.yaml:708-711).
  *
  * Mapping:
  *  - WAL + growing segment → a streaming DataFrame (readStream) with an
  *    event-time `_ts` watermark; out-of-range messages are excluded by
  *    the watermark exactly like filter_node.go drops them.
  *  - flush/seal → `foreachBatch` append to the sealed Parquet table.
  *  - union read (sealed + growing) → `sealed.unionByName(growing)`;
  *    MVCC read-ts semantics from [[graft.operators.Mvcc]] apply to the
  *    union unchanged.
  *  - consistency levels (proxy/util.go:1301-1320): Strong = wait for
  *    watermark ≥ request ts; Bounded = watermark ≥ ts − staleness;
  *    Eventually = current snapshot. Expressed by the readTs the caller
  *    passes to Mvcc.visible.
  */
object Streaming {

  /** Continuous ingest: watermark + dedup by (pk, ts) — the WAL's
    * exactly-once handoff re-expressed (duplicate redeliveries collapse).
    */
  def dedupedIngest(stream: DataFrame, pkCol: String, tsCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(pkCol, tsCol)

  /** Streaming content-level dedup (training-pipeline corpus dedup on
    * the ingest path): rows whose `fpCol` content fingerprint was seen
    * before — in the same micro-batch, a replayed delivery, or any
    * earlier batch within the watermark horizon — are dropped, whatever
    * their event time. The streaming analogue of exact-dedup's hash
    * groupBy. State is bounded by the watermark: a fingerprint expires
    * once the watermark passes its event time + delay, so at
    * 100 TB/day state is proportional to the dedup horizon, not the
    * corpus.
    */
  def contentDedupIngest(stream: DataFrame, fpCol: String, tsCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(fpCol)

  /** Flush loop: seal each micro-batch to the Parquet table
    * (datanode write-buffer flush). Returns the StreamingQuery.
    *
    * Idempotent (exactly-once contents): each batch overwrites its own
    * deterministic `batch=<id>` directory, so a batch replayed after a
    * failure between the parquet write and the checkpoint commit
    * replaces itself instead of appending a duplicate copy. Readers of
    * `path` see a `batch` partition column (drop it or select the data
    * columns).
    */
  def flushToParquet(stream: DataFrame, path: String, checkpoint: String) =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$path/batch=$batchId")
      }
      .start()

  /** Event-time windowed aggregation with late-data handling (the
    * reference has no window aggs — this is the Spark-native upgrade the
    * brief asks for on streams).
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      window_ : String, slide: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), window_, slide), col(keyCol))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))

  case class SessionState(count: Long, lastTs: Long)
  case class SessionUpdate(key: Long, count: Long, closed: Boolean)

  /** Custom per-key state (KeyValueGroupedDataset.mapGroupsWithState):
    * running event count per user, optionally with idle-timeout session
    * close — the extension point the reference lacks natively.
    *
    * Default is NoTimeout: with ProcessingTimeTimeout the engine keeps
    * scheduling empty batches to evaluate timeouts, which prevents
    * `processAllAvailable` from ever settling in deterministic tests —
    * pass `idleTimeout` only for continuously-triggered production runs.
    */
  def sessionCounts(events: Dataset[(Long, Long)], idleTimeout: Option[String] = None)(
      implicit enc1: org.apache.spark.sql.Encoder[SessionUpdate]): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_._1)
      .mapGroupsWithState[SessionState, SessionUpdate](timeoutConf) {
        (key: Long, rows: Iterator[(Long, Long)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            SessionUpdate(key, st.count, closed = true)
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0L))
            val batch = rows.toSeq
            val next = SessionState(prev.count + batch.size,
              math.max(prev.lastTs, if (batch.isEmpty) 0L else batch.map(_._2).max))
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            SessionUpdate(key, next.count, closed = false)
          }
      }
  }
}
