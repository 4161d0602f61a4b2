package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.Streaming

/** Incremental BM25 statistics must track the full-rebuild oracle after
  * every batch (reference idf_oracle: df/avgdl stay globally fresh as
  * segments ingest).
  */
class Bm25IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "spark shuffles the hash join"),
    (1L, "broadcast join beats shuffle join"),
    (2L, "sort merge join spills"),
    (3L, "hash aggregate partial final"),
    (4L, "the broadcast variable rides the task binary"),
    (5L, "watermark bounds late data"),
    (6L, ""), // zero-token doc still counts toward n_docs/avgdl
    (7L, "join join join join"))

  private def scoresOf(m: Bm25.Model, terms: Seq[String]): Map[Long, Double] =
    Bm25.searchTerms(m, terms, k = 10)
      .select(col("doc_id"), round(col("_score"), 9))
      .as[(Long, Double)].collect().toMap

  test("batch-wise ingest == full rebuild after every batch") {
    val inc = new Bm25.Bm25Incremental("doc_id", "text")
    val batches = corpus.grouped(3).toSeq
    batches.zipWithIndex.foreach { case (b, i) =>
      inc.ingest(b.toDF("doc_id", "text"))
      val sofar = batches.take(i + 1).flatten
      val full = Bm25.build(sofar.toDF("doc_id", "text"), "doc_id", "text")
      // IDF freshness: scores after THIS batch match a rebuild over
      // everything ingested so far — for each batch prefix
      assert(scoresOf(inc.model, Seq("join", "broadcast")) ==
        scoresOf(full, Seq("join", "broadcast")), s"batch $i diverged")
    }
    // df table carries merged counts, not last-batch counts
    val df = inc.model.termStats.filter(col("term") === "join")
      .select(col("df")).as[Double].head()
    assert(df == 4.0)
  }

  test("release folds a segment's stats back out (idf_oracle Remove)") {
    val inc = new Bm25.Bm25Incremental("doc_id", "text")
    val batches = corpus.grouped(4).toSeq // two batches of 4
    batches.foreach(b => inc.ingest(b.toDF("doc_id", "text")))
    inc.release(batches(0).toDF("doc_id", "text"))
    val remaining = Bm25.build(batches(1).toDF("doc_id", "text"), "doc_id", "text")
    assert(scoresOf(inc.model, Seq("join", "broadcast", "watermark")) ==
      scoresOf(remaining, Seq("join", "broadcast", "watermark")))
    // df for a term wholly inside the released batch is gone, not zero-rowed
    assert(inc.model.termStats.filter(col("term") === "spark").count() == 0)
    assert(inc.model.globals.select(col("n_docs")).as[Double].head() == 4.0)
  }

  test("duplicate pk across live batches is refused (release invariant)") {
    val inc = new Bm25.Bm25Incremental("doc_id", "text")
    inc.ingest(corpus.take(4).toDF("doc_id", "text"))
    // re-ingesting pk 0 would double-score it and make a later release
    // strip both versions' postings while unwinding only one batch's stats
    val ex = intercept[IllegalArgumentException] {
      inc.ingest(Seq((0L, "re-ingested version")).toDF("doc_id", "text"))
    }
    assert(ex.getMessage.contains("duplicate pk"))
    // release-then-reingest is the sanctioned update path
    inc.release(corpus.take(1).toDF("doc_id", "text"))
    inc.ingest(Seq((0L, "join shuffles again")).toDF("doc_id", "text"))
    val expect = Bm25.build(
      (Seq((0L, "join shuffles again")) ++ corpus.slice(1, 4)).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(scoresOf(inc.model, Seq("join", "shuffle")) ==
      scoresOf(expect, Seq("join", "shuffle")))
  }

  test("streaming attach: scores track the oracle through dedup + micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val rows = corpus.map { case (id, text) => (id, 1700000000L + id, text) }
    input.addData(rows ++ rows) // at-least-once WAL redelivery
    val stream = input.toDF().toDF("doc_id", "ts", "text")
      .withColumn("ts_event", col("ts").cast("timestamp"))
    val deduped = Streaming.dedupedIngest(stream, "doc_id", "ts_event")
    val inc = new Bm25.Bm25Incremental("doc_id", "text")
    val q = inc.attachTo(deduped, s"/tmp/graft_bm25inc_ck_${System.nanoTime()}")
    q.processAllAvailable()
    q.stop()
    val full = Bm25.build(corpus.toDF("doc_id", "text"), "doc_id", "text")
    assert(scoresOf(inc.model, Seq("join", "shuffle", "watermark")) ==
      scoresOf(full, Seq("join", "shuffle", "watermark")))
    // dedup held: n_docs is 8, not 16
    assert(inc.model.globals.select(col("n_docs")).as[Double].head() == 8.0)
  }
}
