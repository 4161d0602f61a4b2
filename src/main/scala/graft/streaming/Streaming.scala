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

  /** Clone `spark` with the shuffle-partition count sized for STATEFUL
    * streaming. Every stateful operator (dropDuplicatesWithinWatermark,
    * mapGroupsWithState, windowed aggregation) plans
    * `spark.sql.shuffle.partitions` state-store partitions per
    * micro-batch — AQE is disabled under streaming, so nothing
    * right-sizes them, and the count locks into the checkpoint at first
    * run. The batch default targets scan width, not state volume: a
    * trigger over modest state pays the full task fan-out in pure
    * scheduling overhead. The state-store partition count is a real
    * production knob — size it to expected state (keys × bytes) via
    * SPARK_GRAFT_STREAM_PARTS; the default keeps a fraction of the
    * cluster parallelism so small-state pipelines stop paying
    * one-task-per-core per trigger while large deployments still spread.
    */
  def stateScoped(spark: SparkSession): SparkSession = {
    val parts = sys.env.get("SPARK_GRAFT_STREAM_PARTS")
      .flatMap(_.toIntOption)
      .getOrElse(math.max(2, spark.sparkContext.defaultParallelism / 4))
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.shuffle.partitions", parts.toString)
    scoped
  }

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

  final case class NearDupVerdict(docId: Long, bucket: Long, dup: Boolean)

  /** Streaming MinHash near-dup (the LSH half of the dedup family on
    * the ingest path — [[contentDedupIngest]] only catches EXACT
    * content): each arriving doc's minhash signature is banded, and a
    * `flatMapGroupsWithState` per band bucket keeps the signatures of
    * bucket pioneers; an arrival whose estimated Jaccard vs any pioneer
    * reaches `threshold` is flagged. A doc flagged in ANY of its bands
    * is a near-dup — reduce verdicts per doc with `max(dup)` (batch
    * LSH's OR-across-bands), e.g. in the sink's foreachBatch.
    *
    * Within a micro-batch, bucket arrivals process in ascending doc id,
    * so pioneer-vs-dup attribution is deterministic. Non-dup signatures
    * join the bucket state up to `bucketCap` (the batch LSH bucket-cap
    * analogue — a hot bucket stops absorbing pioneers instead of
    * growing without bound), so each bucket's state is capped at
    * bucketCap × signature size.
    *
    * State across buckets: the number of DISTINCT band buckets grows
    * with distinct corpus content, so for an unbounded run pass
    * `stateTtl` — idle bucket states are evicted via
    * ProcessingTimeTimeout once no arrival has hit them for the TTL
    * (the dedup-horizon contract: total state ∝ active buckets within
    * the horizon × cap, independent of total corpus size). The default
    * None keeps NoTimeout for deterministic tests: with a timeout set,
    * the engine schedules empty batches to evaluate timeouts, which
    * prevents `processAllAvailable` from settling.
    */
  def minhashNearDupVerdicts(
      docs: DataFrame, // streaming (idCol, textCol)
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      shingleSize: Int = 3,
      bands: Int = 16,
      threshold: Double = 0.7,
      bucketCap: Int = 64,
      stateTtl: Option[String] = None): Dataset[NearDupVerdict] = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val spark = docs.sparkSession
    import spark.implicits._
    val rowsPerBand = numHashes / bands
    val sig = graft.functions.TextFunctions.minhashSignature(
      graft.functions.TextFunctions.tokenize(col(textCol)), numHashes, shingleSize)
    val banded = docs
      .withColumn("_sig", sig)
      .select(col(idCol).cast("long").as("doc_id"), col("_sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(lit("band"), b,
            slice(col("_sig"), b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)))
            .cast("long")))
          .as(Seq("_band", "_bucket")))
      .select(col("doc_id"), col("_sig").as("sig"), col("_bucket").as("bucket"))
      .as[(Long, Seq[Long], Long)]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .groupByKey(_._3)
      .flatMapGroupsWithState[Seq[Seq[Long]], NearDupVerdict](
        OutputMode.Append, timeoutConf) {
        (bucket: Long, rows: Iterator[(Long, Seq[Long], Long)],
            state: GroupState[Seq[Seq[Long]]]) =>
          if (state.hasTimedOut) {
            // idle bucket past the dedup horizon — evict its pioneers
            state.remove()
            Iterator.empty
          } else {
            var pioneers = state.getOption.getOrElse(Seq.empty)
            val out = rows.toSeq.sortBy(_._1).map { case (id, s, _) =>
              val isDup = pioneers.exists(p =>
                p.iterator.zip(s.iterator).count(t => t._1 == t._2).toDouble
                  / numHashes >= threshold)
              if (!isDup && pioneers.size < bucketCap) pioneers = pioneers :+ s
              NearDupVerdict(id, bucket, isDup)
            }
            state.update(pioneers)
            stateTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

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
