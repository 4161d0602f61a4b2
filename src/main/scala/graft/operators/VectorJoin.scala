package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.Metric

/** Vector-anchored joins (reference: design doc
  * 20260708-vector-anchored-join.md — "Milvus does vector-anchored
  * joins, not general joins"): a vector collection `V` carrying a
  * `join_key` column, joined against a separate frequently-updated
  * scalar side table `S` keyed by the same key. Three shapes, all with
  * vector search on the critical path:
  *
  *  1. enrichment (INNER / LEFT OUTER): vector top-K drives, `S` is
  *     probed by key — the doc's index-nested-loop over a Global KV
  *     Index.
  *  2. SEMI pre-filter: a predicate on `S` yields the qualified key
  *     set, pushed into the ANN scan.
  *  3. LATERAL: `S` drives; each driver row binds a query vector
  *     by-reference (anchor key into `V`) and ONE batched ANN
  *     (`nq = |driver|`) runs, with a hard cardinality guardrail.
  *
  * Spark-first shapes: the "Global KV Index multi-get" is a key-set
  * semi-join that touches only the needed keys; the "BF pushdown" is
  * the broadcast/semi join Catalyst already runs (and
  * `InjectRuntimeFilter` adds the bloom inline filter on its own when
  * beneficial); the lateral's "one batched ANN, not N RPCs" is exactly
  * [[VectorSearch.topK]] with nq = N broadcast queries. A scalar-only
  * table needs nothing special here — any keyed DataFrame/MVCC view is
  * one.
  */
object VectorJoin {

  /** Shape 1 — enrichment join: attach `sideCols` of `S` to vector-hit
    * rows by `joinKey`. LEFT OUTER by default (the doc's semantics: a
    * hit must not drop because its metadata row is missing).
    *
    * Scale shape: hits are nq·k rows — tiny. The side table is probed,
    * never scanned into the join whole: a broadcast of the hit keys
    * semi-joins `S` down to exactly the needed rows (the KV multi-get),
    * then the small result joins back outer-preserving.
    */
  def enrich(hits: DataFrame, joinKey: String, side: DataFrame,
      sideCols: Seq[String], leftOuter: Boolean = true): DataFrame = {
    val needed = side.join(
      broadcast(hits.select(col(joinKey)).distinct()), Seq(joinKey), "left_semi")
    hits.join(broadcast(needed.select((joinKey +: sideCols).distinct.map(col): _*)),
      Seq(joinKey), if (leftOuter) "left" else "inner")
  }

  /** Shape 2 — SEMI pre-filter: restrict the ANN corpus to rows whose
    * `joinKey` satisfies `predicate` evaluated on `S`. The qualified
    * key set is distinct-projected (keys only — the side table's
    * payload never moves) and semi-joined into the corpus before any
    * distance math; AQE broadcasts it when small and Spark's runtime
    * bloom filter gives the scan-level inline test the doc's BF
    * pushdown describes.
    */
  def semiPrefilter(corpus: DataFrame, joinKey: String,
      side: DataFrame, sideKey: String, predicate: Column): DataFrame = {
    val keys = side.filter(predicate)
      .select(col(sideKey).as(joinKey)).distinct()
    corpus.join(keys, Seq(joinKey), "left_semi")
  }

  /** Shape 3 — lateral vector search, by-reference binding: each driver
    * row's `anchorKey` resolves to a vector in `V` (rows whose anchor is
    * absent drop out, as a KV multi-get miss does), and a single batched
    * ANN with nq = |driver| returns top-k per driver row, stitched back
    * by the driver's pk as qid.
    *
    * `maxDriverRows` is the doc's non-negotiable guardrail: |filtered
    * driver| IS the query count; exceeding the cap is an explicit error
    * pointing at pagination, never a silent truncation.
    */
  def lateralSearch(
      driver: DataFrame,
      driverPk: String,
      anchorKey: String,
      corpus: DataFrame,
      corpusKey: String,
      vecCol: String,
      metric: Metric.Value,
      k: Int,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Nil,
      roundTo: Option[Int] = None,
      maxDriverRows: Long = 1024L): DataFrame = {
    val n = driver.count()
    require(n <= maxDriverRows,
      s"lateral driver has $n rows > cap $maxDriverRows — every driver row is " +
        "an ANN query; paginate the driver or raise the cap explicitly")
    // by-reference bind: anchor key → query vector, batched (one join)
    val queries = driver.select(col(driverPk).as("qid"), col(anchorKey).as("_anchor"))
      .join(corpus.select(col(corpusKey).as("_anchor"), col(vecCol).as("qvec")), "_anchor")
      .drop("_anchor")
    VectorSearch.topK(corpus, corpusKey, vecCol, queries, "qid", "qvec",
      metric, k, filter = filter, outputCols = outputCols, roundTo = roundTo)
  }
}
