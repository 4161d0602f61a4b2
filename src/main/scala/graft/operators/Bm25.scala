package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.{Metric, TextFunctions, TopKFunctions}

/** BM25 full-text search as DataFrame algebra.
  *
  * Mirrors the reference's BM25 pipeline (reference: ingest function
  * text→term-freq sparse vector internal/util/function/bm25_function.go:135;
  * global IDF + avgdl maintained by the delegator's idf_oracle
  * internal/querynodev2/delegator/idf_oracle.go:64-96; scored with metric
  * BM25, k1/b defaults 1.2/0.75; conformance ground truth is standard
  * Lucene BM25 via bm25s, tests/python_client/common/common_func.py:225).
  *
  *   idf(t) = ln(1 + (N − df + 0.5) / (df + 0.5))
  *   score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *
  * Scale design: the "index build" is two hash aggregations (term
  * frequencies per doc, doc frequencies per term) — both partial+final,
  * no self-joins. Global N/avgdl stay a 1-row DataFrame cross-joined in
  * (never collected). Query-time: the per-term postings are filtered
  * with `term isin (query tokens)` — predicate-pushdown-friendly, and at
  * 100 TB the postings table is laid out (bucketed/sorted) by term, so
  * the scan prunes to the query's terms only. Final top-k uses the
  * partial-aggregating TopKAgg.
  */
object Bm25 {

  case class Model(
      /** (doc_id, term, tf, dl) — term frequencies + doc length. */
      postings: DataFrame,
      /** (term, df) — document frequencies. */
      termStats: DataFrame,
      /** 1-row (n_docs, avgdl). */
      globals: DataFrame,
      idCol: String,
      k1: Double,
      b: Double)

  /** Build the BM25 statistics for a corpus. */
  def build(docs: DataFrame, idCol: String, textCol: String,
      k1: Double = 1.2, b: Double = 0.75): Model =
    buildFromTokens(docs, idCol, TextFunctions.tokenize(col(textCol)), k1, b)

  /** Build from an arbitrary token expression — the multi-analyzer BM25
    * shape (reference: multi_analyzer_bm25_function.go — per-document
    * analyzer selection, e.g. by a language column, feeding one shared
    * statistics build). Pass e.g.
    * `when($"lang" === "de", Analyzers.analyze(...)).otherwise(tokenize(...))`.
    */
  def buildFromTokens(docs: DataFrame, idCol: String, toksCol: Column,
      k1: Double = 1.2, b: Double = 0.75): Model = {
    val toks = docs.select(col(idCol), toksCol.as("_toks"))
    val postings = toks
      .select(col(idCol), size(col("_toks")).cast("double").as("dl"),
        explode(col("_toks")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    val termStats = postings.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val globals = toks.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(size(col("_toks")).cast("double")).as("avgdl"))
    Model(postings, termStats, globals, idCol, k1, b)
  }

  /** Lucene-style IDF. */
  def idf(nDocs: Column, df: Column): Column =
    log(lit(1.0) + (nDocs - df + 0.5) / (df + 0.5))

  /** Score all docs containing ≥1 query term. Output: (idCol, _score). */
  def score(model: Model, query: String): DataFrame =
    scoreTerms(model, TextFunctions.tokenizeString(query))

  /** Score with pre-analyzed query terms (for non-standard analyzers —
    * the query must be tokenized with the same analyzer as its corpus).
    */
  def scoreTerms(model: Model, terms: Seq[String]): DataFrame = {
    val qTerms = terms.distinct
    if (qTerms.isEmpty)
      return model.postings.select(col(model.idCol), lit(0.0).as("_score")).limit(0)
    val matched = model.postings
      .filter(col("term").isin(qTerms: _*))
      .join(broadcast(model.termStats.filter(col("term").isin(qTerms: _*))), "term")
      .crossJoin(broadcast(model.globals))
    val tfComponent = col("tf") * (model.k1 + 1.0) /
      (col("tf") + lit(model.k1) * (lit(1.0) - model.b + lit(model.b) * col("dl") / col("avgdl")))
    matched
      .select(col(model.idCol), (idf(col("n_docs"), col("df")) * tfComponent).as("_part"))
      .groupBy(col(model.idCol))
      .agg(sum(col("_part")).as("_score"))
  }

  /** Incrementally-maintained BM25 statistics (reference: the
    * delegator's idf_oracle, internal/querynodev2/delegator/
    * idf_oracle.go:64-96 — global df/avgdl updated as segments ingest,
    * never recomputed from the full corpus). Each [[ingest]] batch
    * contributes one batch-local aggregate pass:
    *
    *  - per-term df deltas, merged into the running (term, df) table by
    *    a full-outer sum (vocabulary-sized, localCheckpoint'ed so the
    *    merge lineage stays O(1) deep across batches);
    *  - (n_docs, Σdl) deltas, folded into two driver-side scalars;
    *  - the batch's postings, appended (scoring needs them anyway).
    *
    * [[model]] assembles a standard [[Model]] whose scores are exactly
    * what a full rebuild over everything ingested so far would produce —
    * the freshness contract a streaming BM25 needs: inserting a batch
    * shifts every IDF immediately, at batch-sized cost. Attach to a
    * [[graft.streaming.Streaming.dedupedIngest]] stream via [[attachTo]].
    */
  final class Bm25Incremental(idCol: String, textCol: String,
      k1: Double = 1.2, b: Double = 0.75) {
    private var postings: Option[DataFrame] = None
    private var termDf: Option[DataFrame] = None // (term, df)
    private var nDocs: Long = 0L
    private var sumDl: Double = 0.0

    def ingest(batch: DataFrame): Unit = synchronized {
      val m = buildFromTokens(batch, idCol, TextFunctions.tokenize(col(textCol)), k1, b)
      // pin the batch's postings NOW (micro-batch frames are only valid
      // inside their trigger) and keep the union lineage shallow
      val batchPost = m.postings.localCheckpoint(true)
      // a pk must live in exactly ONE live batch (the segment model —
      // and the dedupedIngest attach point guarantees it upstream):
      // duplicate postings rows would double-score the doc, and release
      // by left_anti on the id would strip BOTH batches' postings while
      // decrementing df/n_docs/sumDl by one batch only. Enforced, not
      // assumed — re-ingesting a pk requires releasing it first.
      postings.foreach { prev =>
        val clash = prev.select(col(idCol))
          .join(batchPost.select(col(idCol)).distinct(), Seq(idCol), "left_semi")
          .limit(1)
        require(clash.isEmpty,
          s"duplicate pk across live BM25 batches (column $idCol) — " +
            "release the old version first, or dedupe upstream (dedupedIngest)")
      }
      val batchDf = batchPost.groupBy(col("term"))
        .agg(count(lit(1)).cast("double").as("_df_delta"))
      termDf = Some(termDf match {
        case None => batchDf.select(col("term"), col("_df_delta").as("df")).localCheckpoint(true)
        case Some(prev) => prev
          .join(batchDf, Seq("term"), "full_outer")
          .select(col("term"),
            (coalesce(col("df"), lit(0.0)) + coalesce(col("_df_delta"), lit(0.0))).as("df"))
          .localCheckpoint(true)
      })
      // deltas over the BATCH, not its postings: a zero-token doc still
      // counts toward n_docs/avgdl, exactly as a full rebuild would
      val Array(nDelta, dlDelta) = batch
        .select(size(TextFunctions.tokenize(col(textCol))).cast("double").as("_dl"))
        .agg(count(lit(1)).cast("double"), coalesce(sum(col("_dl")), lit(0.0)))
        .head().toSeq.map(_.asInstanceOf[Double]).toArray
      nDocs += nDelta.toLong
      sumDl += dlDelta
      postings = Some(postings.map(_.unionByName(batchPost)).getOrElse(batchPost))
    }

    /** Release previously-ingested rows (the idf_oracle's segment-
      * release path: a segment unloading DECREMENTS its df/avgdl
      * contribution — reference idf_oracle.go `Remove`). `batch` must
      * be the released rows with the same id/text columns; stats fold
      * out exactly as they folded in, so the model again equals a full
      * rebuild over what remains.
      */
    def release(batch: DataFrame): Unit = synchronized {
      val m = buildFromTokens(batch, idCol, TextFunctions.tokenize(col(textCol)), k1, b)
      val batchDf = m.postings.groupBy(col("term"))
        .agg(count(lit(1)).cast("double").as("_df_delta"))
      termDf = termDf.map(_.join(batchDf, Seq("term"), "full_outer")
        .select(col("term"),
          (coalesce(col("df"), lit(0.0)) - coalesce(col("_df_delta"), lit(0.0))).as("df"))
        .filter(col("df") > 0.0)
        .localCheckpoint(true))
      val Array(nDelta, dlDelta) = batch
        .select(size(TextFunctions.tokenize(col(textCol))).cast("double").as("_dl"))
        .agg(count(lit(1)).cast("double"), coalesce(sum(col("_dl")), lit(0.0)))
        .head().toSeq.map(_.asInstanceOf[Double]).toArray
      nDocs -= nDelta.toLong
      sumDl -= dlDelta
      postings = postings.map(_
        .join(batch.select(col(idCol)), Seq(idCol), "left_anti")
        .localCheckpoint(true))
    }

    /** The current global model — identical scores to a full rebuild. */
    def model: Model = synchronized {
      val post = postings.getOrElse(
        throw new IllegalStateException("no batches ingested yet"))
      val globals = post.sparkSession
        .sql(s"SELECT CAST($nDocs AS DOUBLE) AS n_docs, " +
          s"CAST(${if (nDocs == 0) 0.0 else sumDl / nDocs} AS DOUBLE) AS avgdl")
      Model(post, termDf.get, globals, idCol, k1, b)
    }

    /** Feed from a streaming source (typically the output of
      * [[graft.streaming.Streaming.dedupedIngest]]).
      */
    def attachTo(stream: DataFrame, checkpoint: String)
        : org.apache.spark.sql.streaming.StreamingQuery =
      stream.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          ingest(batch)
          ()
        }
        .start()
  }

  /** Full-text top-k search. Output: (idCol, rank, _score), best-first. */
  def search(model: Model, query: String, k: Int, roundTo: Option[Int] = None): DataFrame =
    searchTerms(model, TextFunctions.tokenizeString(query), k, roundTo)

  /** Top-k with pre-analyzed query terms. */
  def searchTerms(model: Model, terms: Seq[String], k: Int,
      roundTo: Option[Int] = None): DataFrame = {
    val scored = scoreTerms(model, terms)
    val s = roundTo.map(d => round(col("_score"), d)).getOrElse(col("_score"))
    val idType = scored.schema(model.idCol).dataType
    scored.select(col(model.idCol), s.as("_score"))
      .agg(TopKFunctions.top_k(col("_score"),
        TopKFunctions.tieFor(col(model.idCol), idType),
        struct(col(model.idCol)), k, ascending = false).as("_hits"))
      .select(posexplode(col("_hits")).as(Seq("_pos", "_hit")))
      .select(
        col(s"_hit.payload.${model.idCol}").as(model.idCol),
        (col("_pos") + 1).cast("long").as("rank"),
        col("_hit.score").as("_score"))
  }
}
