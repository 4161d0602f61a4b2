package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("deduped ingest collapses WAL redeliveries") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = input.toDF().toDF("pk", "ts", "v")
    val out = Streaming.dedupedIngest(df, "pk", "ts")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    input.addData((1L, t0, "a"), (1L, t0, "a"), (2L, t0, "b")) // duplicate delivery
    q.processAllAvailable()
    input.addData((1L, t0, "a")) // redelivery in a later batch
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dedup_out").select("pk").as[Long].collect().sorted
    assert(rows sameElements Array(1L, 2L))
  }

  test("content dedup drops same-fingerprint rows across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = input.toDF().toDF("doc_id", "ts", "text")
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
    val out = Streaming.contentDedupIngest(df, "fp", "ts")
    val q = out.writeStream.format("memory").queryName("cdedup_out")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    // doc 2 repeats doc 1's content (different pk — pk-dedup would keep it)
    input.addData((1L, t0, "Alpha beta."), (2L, t0, "alpha BETA"), (3L, t0, "gamma"))
    q.processAllAvailable()
    input.addData((4L, t0, "alpha beta"), (5L, t0, "delta")) // cross-batch replay
    q.processAllAvailable()
    q.stop()
    val fps = spark.table("cdedup_out").select("fp").as[String].collect()
    assert(fps.length == 3) // alpha-beta, gamma, delta — one survivor each
    assert(fps.distinct.length == 3)
  }

  test("windowed counts with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val out = Streaming.windowedCounts(df, "ts", "event_type",
      "10 minutes", "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2025-01-01 00:$m%02d:00")
    input.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0), (ts(11), "click", 4.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_out")
      .select(col("window.start").cast("string"), col("cnt"), col("sum_value"))
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(rows.length == 2)
    assert(rows(0)._2 == 2 && rows(0)._3 == 3.0)
    assert(rows(1)._2 == 1 && rows(1)._3 == 4.0)
  }

  test("streaming minhash near-dup flags near-copies across batches") {
    implicit val sqlCtx = spark.sqlContext
    def doc(n: Int, changed: Set[Int] = Set.empty): String =
      (0 until 50).map(i => if (changed(i)) s"alt$i" else s"tok$i").mkString(" ")
    val input = MemoryStream[(Long, String)]
    val verdicts = Streaming.minhashNearDupVerdicts(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", threshold = 0.6)
    val q = verdicts.toDF().writeStream.format("memory").queryName("ndup_out")
      .outputMode("append").start()
    // batch 1: two distinct originals
    input.addData((1L, doc(1)), (2L, (100 until 150).map(i => s"w$i").mkString(" ")))
    q.processAllAvailable()
    // batch 2: a near-copy of doc 1 (one token changed), and a fresh doc
    input.addData((3L, doc(1, changed = Set(7))),
      (4L, (200 until 250).map(i => s"v$i").mkString(" ")))
    q.processAllAvailable()
    q.stop()
    val dupByDoc = spark.table("ndup_out")
      .groupBy($"docId").agg(max($"dup").as("dup"))
      .as[(Long, Boolean)].collect().toMap
    assert(!dupByDoc(1L) && !dupByDoc(2L) && !dupByDoc(4L))
    assert(dupByDoc(3L)) // near-copy caught by at least one band
  }

  test("flush to parquet appends micro-batches (seal/flush path)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_flush").toString
    val input = MemoryStream[(Long, String)]
    val q = Streaming.flushToParquet(input.toDF().toDF("pk", "v"),
      s"$dir/data", s"$dir/ckpt")
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    val sealedDf = spark.read.parquet(s"$dir/data")
    assert(sealedDf.count() == 3)
    // idempotent seal: batches land in deterministic batch=<id> dirs
    assert(sealedDf.columns.contains("batch"))
    // sealed + growing union read (growing = not-yet-flushed batch)
    val growing = Seq((4L, "d")).toDF("pk", "v")
    assert(sealedDf.select("pk", "v").unionByName(growing).count() == 4)
  }

  test("per-key session state via mapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val out = Streaming.sessionCounts(input.toDS())
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("update").start()
    input.addData((7L, 100L), (7L, 200L), (9L, 50L))
    q.processAllAvailable()
    input.addData((7L, 300L))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("sess_out")
      .groupBy("key").agg(max("count").as("c"))
      .as[(Long, Long)].collect().toMap
    assert(last(7L) == 3L && last(9L) == 1L)
  }

  test("stateScoped sizes state partitions without touching the parent session") {
    val scoped = Streaming.stateScoped(spark)
    val expected = math.max(2, spark.sparkContext.defaultParallelism / 4)
    assert(scoped.conf.get("spark.sql.shuffle.partitions") == expected.toString)
    // the parent session's batch shuffle width is untouched
    assert(spark.conf.get("spark.sql.shuffle.partitions") ==
      spark.sparkContext.defaultParallelism.toString)
    // same context (no second Spark app), fresh conf only
    assert(scoped.sparkContext eq spark.sparkContext)
    // and a stateful query under the scope produces identical answers
    import spark.implicits._
    implicit val sqlCtx = scoped.sqlContext
    val input = MemoryStream[(Long, Long)]
    val out = Streaming.sessionCounts(input.toDS())
    val q = out.writeStream.format("memory").queryName("sess_scoped")
      .outputMode("update").start()
    input.addData((7L, 100L), (7L, 200L), (9L, 50L))
    q.processAllAvailable()
    q.stop()
    val last = scoped.table("sess_scoped")
      .groupBy("key").agg(max("count").as("c"))
      .as[(Long, Long)].collect().toMap
    assert(last(7L) == 2L && last(9L) == 1L)
  }
}
