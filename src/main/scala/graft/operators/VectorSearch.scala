package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.{Metric, TopKFunctions, VectorFunctions}

/** ANN / vector search over a corpus DataFrame, Spark-first.
  *
  * Semantics mirror the reference Search API (reference:
  * internal/proxy/task_search.go, internal/core/src/exec/operator/
  * VectorSearchNode.cpp): nq query vectors, boolean pre-filter, top-k per
  * query with metric-typed ordering, optional range bounds, optional
  * group-by, offset, and requery of output fields.
  *
  * Scale design: queries (nq rows) are always `broadcast()`; the corpus
  * is never shuffled for scoring — scoring is a map-only
  * broadcast-nested-loop join that stays in whole-stage codegen. The
  * top-k reduction uses [[graft.functions.TopKAgg]] (partial
  * aggregation → each map task emits ≤ nq·k rows), so the shuffle volume
  * is O(partitions · nq · k) regardless of corpus size.
  */
object VectorSearch {

  /** Exact-L2 re-rank of a candidate shortlist against the original
    * vectors — the shared refine half of the quantized-index
    * compositions ([[HnswQuantized.searchRefined]],
    * [[AisaqIndex.searchRefined]]). `cands` carries (qid, idCol) with at
    * most `want` ids per query; the shortlist broadcast is size-guarded
    * (nq·want ≤ 1M rows — the RabitqIndex.search rule) so a huge
    * nq/refine pool falls back to a shuffle join instead of OOMing.
    */
  def refineExactL2(cands: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, queries: Seq[(Long, Array[Float])], k: Int,
      want: Int, roundTo: Option[Int] = None): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val guarded =
      if (queries.size.toLong * want <= 1000000L) broadcast(cands)
      else cands
    val qDf = broadcast(
      queries.map { case (qid, v) => (qid, v.toSeq) }.toDF("qid", "_qvec"))
    val raw = VectorFunctions.l2(col(vecCol), col("_qvec"))
    val exact = guarded
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(qDf, "qid")
      .withColumn("_score", roundTo.map(d => round(raw, d)).getOrElse(raw))
    reduceTopK(exact, idCol, "qid", Metric.L2, k, Seq(idCol))
  }

  /** Score every (query, corpus row) pair. Map-only: broadcasts queries. */
  def score(
      corpus: DataFrame,
      vecCol: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      metric: Metric.Value,
      filter: Option[Column] = None,
      roundTo: Option[Int] = None): DataFrame = {
    val filtered = filter.map(corpus.filter).getOrElse(corpus)
    val raw = VectorFunctions.distance(col(vecCol), col(qvecCol), metric)
    val scoreCol = roundTo.map(d => round(raw, d)).getOrElse(raw)
    filtered
      .crossJoin(broadcast(queries))
      .withColumn("_score", scoreCol)
  }

  /** Exact brute-force top-k per query vector.
    *
    * Output: (qidCol, rank, _score, <corpus output cols>), rank 1-based,
    * best-first, ties broken by ascending `idCol` (deterministic).
    */
  def topK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      metric: Metric.Value,
      k: Int,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Nil,
      offset: Int = 0,
      roundTo: Option[Int] = None): DataFrame = {
    val out = if (outputCols.nonEmpty) outputCols else Seq(idCol)
    val scored = score(corpus, vecCol, queries, qidCol, qvecCol, metric, filter, roundTo)
    reduceTopK(scored, idCol, qidCol, metric, k, out, offset)
  }

  /** Top-k reduce of a pre-scored DataFrame (must carry `_score`). */
  def reduceTopK(
      scored: DataFrame,
      idCol: String,
      qidCol: String,
      metric: Metric.Value,
      k: Int,
      outputCols: Seq[String],
      offset: Int = 0): DataFrame = {
    val payload = struct(outputCols.distinct.map(col): _*)
    val asc = !Metric.higherIsBetter(metric)
    val idType = scored.schema(idCol).dataType
    val hits = scored
      .groupBy(col(qidCol))
      .agg(TopKFunctions
        .top_k(col("_score"), TopKFunctions.tieFor(col(idCol), idType), payload, offset + k, asc)
        .as("_hits"))
      .select(col(qidCol), posexplode(col("_hits")).as(Seq("_pos", "_hit")))
      .filter(col("_pos") >= offset)
      .select(
        Seq(col(qidCol), (col("_pos") + 1).cast("long").as("rank"),
          col("_hit.score").as("_score")) ++
          outputCols.distinct.map(c => col(s"_hit.payload.$c").as(c)): _*)
    hits
  }

  /** Range search (reference: radius / range_filter,
    * internal/proxy/search_util.go:588-597): keeps hits with
    * `radius < score <= range_filter` for similarity metrics and
    * `range_filter <= score < radius` for distance metrics; topk still
    * applies when > 0.
    */
  def rangeSearch(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      metric: Metric.Value,
      radius: Double,
      rangeFilter: Option[Double] = None,
      k: Int = 0,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Nil,
      roundTo: Option[Int] = None): DataFrame = {
    val out = if (outputCols.nonEmpty) outputCols else Seq(idCol)
    val scored = score(corpus, vecCol, queries, qidCol, qvecCol, metric, filter, roundTo)
    val s = col("_score")
    val bound =
      if (Metric.higherIsBetter(metric))
        rangeFilter.map(rf => s > radius && s <= rf).getOrElse(s > radius)
      else
        rangeFilter.map(rf => s < radius && s >= rf).getOrElse(s < radius)
    val inRange = scored.filter(bound)
    if (k > 0) reduceTopK(inRange, idCol, qidCol, metric, k, out)
    else inRange.select((col(qidCol) +: (out :+ "_score").distinct.map(col)): _*)
  }

  /** Grouping search (reference: PhySearchGroupByNode,
    * internal/core/src/exec/operator/search-groupby/SearchGroupByOperator
    * .{h,cpp}; proxy reduce internal/proxy/search_reduce_util.go:195-290):
    * per query, the best `k` groups — by composite `groupCols` key — each
    * contributing up to `groupSize` hits.
    *
    * `strictGroupSize` mirrors the reference knob (task.go:64,
    * CompositeGroupByMap.IsGroupResEnough): the reference walks hits in
    * score order, capping each group at groupSize and dropping groups
    * beyond k. With strict=true the walk runs until all k groups are
    * FULL, so every chosen group fills to groupSize when the data allows.
    * With strict=false (reference default) the walk stops the moment the
    * k-th distinct group appears, so hits ranked after that point are
    * excluded even from non-full chosen groups — expressed here without
    * re-walking: a hit survives iff its (score, tie) is at least as good
    * as the k-th chosen group's BEST hit (the walk's stopping point).
    *
    * Two partial-aggregating top-k passes — no windows, no wide shuffle:
    * pass 1 reduces to ≤ groupSize hits per (query, group); pass 2 ranks
    * groups per query by best-hit score (= first-appearance order of the
    * reference walk).
    */
  def groupBySearch(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      metric: Metric.Value,
      k: Int,
      groupCols: Seq[String],
      groupSize: Int = 1,
      strictGroupSize: Boolean = false,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Nil,
      roundTo: Option[Int] = None,
      groupScorer: String = "max",
      emitGroupScore: Boolean = false): DataFrame = {
    require(groupCols.nonEmpty, "groupBySearch needs at least one group column")
    // ValidateGroupScorer (function-chain operator_group_by.go:134-141):
    // the group's rank key is max/sum/avg over its KEPT (top groupSize)
    // hits — sum/avg let many-decent-hit groups outrank one-great-hit
    // groups (rank_group_scorer search param, search_pipeline.go:1289)
    require(groupScorer == "max" || groupScorer == "sum" || groupScorer == "avg",
      s"""invalid group scorer "$groupScorer", must be max/sum/avg""")
    val out = (if (outputCols.nonEmpty) outputCols else Seq(idCol)).distinct
    val asc = !Metric.higherIsBetter(metric)
    val scored = score(corpus, vecCol, queries, qidCol, qvecCol, metric, filter, roundTo)
    val idType = scored.schema(idCol).dataType
    val tie = TopKFunctions.tieFor(col(idCol), idType)
    // each hit carries its tie so the non-strict cutoff can compare
    // against the walk's total (score, tie) order after aggregation
    val payload = struct(out.map(col) :+ tie.as("_tie"): _*)
    // pass 1: per (query, group) keep the groupSize best hits
    val perGroup = scored
      .groupBy(col(qidCol) +: groupCols.map(col): _*)
      .agg(TopKFunctions
        .top_k(col("_score"), tie, payload, groupSize, asc)
        .as("_hits"))
      .withColumn("_best", col("_hits")(0)("score"))
      .withColumn("_best_tie", col("_hits")(0)("payload")("_tie"))
      // group score over the kept hits (post-trim, operator_group_by.go
      // Step 3); max ≡ the walk's best-hit key
      .withColumn("_gscore", groupScorer match {
        case "max" => col("_best")
        case "sum" => aggregate(col("_hits"), lit(0.0),
          (acc, h) => acc + h("score"))
        case "avg" => aggregate(col("_hits"), lit(0.0),
          (acc, h) => acc + h("score")) / size(col("_hits"))
      })
    // pass 2: per query keep the k best groups (by group score)
    val groupPayload =
      struct(groupCols.map(col) ++ Seq(col("_hits"), col("_best")): _*)
    val grouped = perGroup
      .groupBy(col(qidCol))
      .agg(TopKFunctions
        .top_k(col("_gscore"), col("_best_tie"), groupPayload, k, asc)
        .as("_groups"))
    // non-strict cutoff: the k-th chosen group's best hit is where the
    // reference walk stopped; with < k groups the walk ran to exhaustion
    // the walk-stop threshold is defined by the BEST-hit order, i.e. the
    // max scorer; sum/avg group ranking has no walk to grow, so the
    // sub-threshold drop is disabled there (strict trim)
    val withThr = grouped
      .withColumn("_full",
        size(col("_groups")) === k && lit(groupScorer == "max"))
      .withColumn("_thr_s", element_at(col("_groups"), -1)("payload")("_best"))
      .withColumn("_thr_t",
        element_at(col("_groups"), -1)("payload")("_hits")(0)("payload")("_tie"))
    val exploded = withThr
      .select(col(qidCol), col("_full"), col("_thr_s"), col("_thr_t"),
        posexplode(col("_groups")).as(Seq("_gpos", "_g")))
      .select(
        Seq(col(qidCol), col("_full"), col("_thr_s"), col("_thr_t"),
          (col("_gpos") + 1).cast("long").as("group_rank"),
          col("_g.score").as("_gscore_out")) ++
          groupCols.map(g => col(s"_g.payload.$g").as(g)) :+
          posexplode(col("_g.payload._hits")).as(Seq("_hpos", "_hit")): _*)
    val surviving =
      if (strictGroupSize) exploded
      else {
        val s = col("_hit.score"); val t = col("_hit.payload._tie")
        val betterOrEq =
          (if (asc) s < col("_thr_s") else s > col("_thr_s")) ||
            (s === col("_thr_s") && t <= col("_thr_t"))
        // trimmed hits are each group's worst suffix, so within-group
        // ranks stay contiguous
        exploded.filter(!col("_full") || betterOrEq)
      }
    surviving.select(
      Seq(col(qidCol), col("group_rank")) ++ groupCols.map(col) ++
        Seq((col("_hpos") + 1).cast("long").as("rank"), col("_hit.score").as("_score")) ++
        out.map(c => col(s"_hit.payload.$c").as(c)) ++
        // $group_score output (GroupScoreFieldName, operator_group_by
        // .go:162) — opt-in so pre-scorer result schemas stay stable
        (if (emitGroupScore) Seq(col("_gscore_out").as("group_score")) else Nil): _*)
  }

  /** Requery (reference: CreateRequeryPlan,
    * internal/parser/planparserv2/plan_parser_v2.go:530): after reduce,
    * fetch output fields for hit PKs. The hits side is tiny (nq·k rows)
    * → broadcast it against the base table.
    */
  def requery(hits: DataFrame, base: DataFrame, idCol: String, outputCols: Seq[String]): DataFrame = {
    val needed = base.select((idCol +: outputCols).distinct.map(col): _*)
    broadcast(hits).join(needed, Seq(idCol), "inner")
  }

  /** Paged search iterator (reference: CachedSearchIterator / last_bound
    * cursor, pkg/proto/plan.proto:78-82): returns the next `batch` hits
    * strictly beyond `lastBound` in metric order.
    */
  def searchIterator(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      metric: Metric.Value,
      batch: Int,
      lastBound: Option[Double],
      filter: Option[Column] = None,
      outputCols: Seq[String] = Nil,
      roundTo: Option[Int] = None): DataFrame = {
    val out = if (outputCols.nonEmpty) outputCols else Seq(idCol)
    val scored = score(corpus, vecCol, queries, qidCol, qvecCol, metric, filter, roundTo)
    val cursored = lastBound match {
      case Some(b) if Metric.higherIsBetter(metric) => scored.filter(col("_score") < b)
      case Some(b)                                  => scored.filter(col("_score") > b)
      case None                                     => scored
    }
    reduceTopK(cursored, idCol, qidCol, metric, batch, out)
  }

  /** Iterative post-filter search (reference: IterativeFilterNode.cpp +
    * the `iterative_filter` hint, proxy/search_util.go:589): ANN top-k′
    * WITHOUT the filter, filter the candidates, and if any query is left
    * short of k, retry with a grown k′ — falling back to the exact
    * pre-filtered scan once k′ would reach the corpus. Exact on
    * termination (a query is only emitted short when even the full
    * corpus can't fill k for it), and cheap when the filter is
    * permissive: most candidates survive the first round, so the
    * filter's (possibly expensive) predicate runs on nq·k′ rows instead
    * of the whole corpus.
    */
  def iterativePostFilter(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      metric: Metric.Value,
      k: Int,
      filter: Column,
      outputCols: Seq[String] = Nil,
      roundTo: Option[Int] = None,
      growthFactor: Int = 4): DataFrame = {
    require(growthFactor > 1, "growthFactor must be > 1")
    val out = if (outputCols.nonEmpty) outputCols else Seq(idCol)
    val corpusSize = corpus.count()
    val nq = queries.count()
    var kPrime = math.min(3L * k, corpusSize)
    while (kPrime < corpusSize) {
      val cand = topK(corpus, idCol, vecCol, queries, qidCol, qvecCol, metric,
        kPrime.toInt, filter = None, outputCols = out, roundTo = roundTo)
      val survivors = cand.filter(filter)
      val satisfied = survivors.groupBy(col(qidCol)).count()
        .filter(col("count") >= k).count()
      if (satisfied == nq)
        return reduceTopK(survivors, idCol, qidCol, metric, k, out)
      kPrime = math.min(kPrime * growthFactor, corpusSize)
    }
    // exact fallback: pre-filtered full scan
    topK(corpus, idCol, vecCol, queries, qidCol, qvecCol, metric, k,
      filter = Some(filter), outputCols = out, roundTo = roundTo)
  }

  /** Iterative post-filter THROUGH an IVF index — the indexed upgrade of
    * [[iterativePostFilter]]: growth rounds expand the probe set
    * (nprobe × growthFactor) alongside the candidate budget, so each
    * round scores only the probed clusters' rows instead of re-scoring
    * the full corpus (the round-2 structural caveat). Once nprobe
    * reaches nlist the rounds are exhaustive, and the terminal fallback
    * is the exact pre-filtered scan — so a query is only ever emitted
    * short when the whole corpus can't fill k for it; recall below
    * nlist probes is the index's, exactly as in the reference's
    * post-filtered index search.
    */
  def iterativePostFilterIndexed(
      clustered: DataFrame,
      idCol: String,
      vecCol: String,
      model: IvfIndex.Model,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      metric: Metric.Value,
      k: Int,
      filter: Column,
      outputCols: Seq[String] = Nil,
      roundTo: Option[Int] = None,
      growthFactor: Int = 4,
      nprobe0: Int = 1): DataFrame = {
    require(growthFactor > 1, "growthFactor must be > 1")
    val out = if (outputCols.nonEmpty) outputCols else Seq(idCol)
    val corpusSize = clustered.count()
    val nq = queries.count()
    var nprobe = math.min(math.max(1, nprobe0), model.nlist)
    var kPrime = math.min(3L * k, corpusSize)
    while (nprobe < model.nlist || kPrime < corpusSize) {
      val cand = IvfIndex.search(clustered, idCol, vecCol, model,
        queries, qidCol, qvecCol, metric, kPrime.toInt, nprobe,
        outputCols = out, roundTo = roundTo)
      val survivors = cand.drop("rank").filter(filter)
      val satisfied = survivors.groupBy(col(qidCol)).count()
        .filter(col("count") >= k).count()
      if (satisfied == nq)
        return reduceTopK(survivors, idCol, qidCol, metric, k, out)
      nprobe = math.min(nprobe * growthFactor, model.nlist)
      kPrime = math.min(kPrime * growthFactor, corpusSize)
    }
    // exact fallback: pre-filtered scan of the (still complete) layout
    topK(clustered, idCol, vecCol, queries, qidCol, qvecCol, metric, k,
      filter = Some(filter), outputCols = out, roundTo = roundTo)
  }

  /** Element-level search over a struct-array vector sub-field
    * (reference: design doc 20260602-struct_hybrid_search.md — one query
    * vector matched against INDIVIDUAL struct elements; hits are
    * identified by (primary key, element index), unlike embedding-list
    * search which stays row-level).
    *
    * Spark shape: `posexplode` the struct array (map-only — the narrow
    * explode runs inside the scan's stage), score elements like any
    * corpus, and reduce with the usual partial-agg top-k; the element's
    * identity (pk, element_index) rides in the payload while a hashed
    * composite id provides the deterministic tie-break.
    */
  def elementSearch(
      corpus: DataFrame,
      pkCol: String,
      structArrCol: String,
      vecField: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      metric: Metric.Value,
      k: Int,
      elementFilter: Option[Column] = None,
      roundTo: Option[Int] = None): DataFrame = {
    val elems0 = corpus
      .select(col(pkCol), posexplode(col(structArrCol)).as(Seq("element_index", "_elem")))
      .select(col(pkCol), col("element_index").cast("long").as("element_index"),
        col(s"_elem.$vecField").as("_evec"), col("_elem"))
    val elems = elementFilter.map(elems0.filter).getOrElse(elems0)
      .withColumn("_eid", xxhash64(col(pkCol), col("element_index")))
    topK(elems, "_eid", "_evec", queries, qidCol, qvecCol, metric, k,
        outputCols = Seq(pkCol, "element_index"), roundTo = roundTo)
      .drop("_eid")
  }

  /** Collapse element-level hits to row-level candidates (the doc's
    * collapse mode before rerank): one row per (query, pk), keeping the
    * best element's score, re-ranked.
    */
  def collapseElements(hits: DataFrame, pkCol: String, qidCol: String,
      metric: Metric.Value, k: Int): DataFrame = {
    val best = if (Metric.higherIsBetter(metric)) max(col("_score")) else min(col("_score"))
    val rows = hits.groupBy(col(qidCol), col(pkCol)).agg(best.as("_score"))
    reduceTopK(rows, pkCol, qidCol, metric, k, Seq(pkCol))
  }

  /** Two-stage search (reference: delegator_twostage.go:35-105 — stage 1
    * executes the filter alone and counts survivors; stage 2 picks the
    * physical strategy from that count): a selective filter scores ONLY
    * the survivors (retrieve-then-score), a permissive one goes ANN-first
    * with the iterative post-filter, where the predicate runs on nq·k′
    * candidates instead of every corpus row. Both paths are exact here,
    * so the choice is pure cost. Returns (chosenPath, result) so callers
    * and tests can observe the decision.
    */
  def twoStageSearch(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      metric: Metric.Value,
      k: Int,
      filter: Column,
      outputCols: Seq[String] = Nil,
      roundTo: Option[Int] = None,
      selectivityCutoff: Double = 0.2): (String, DataFrame) = {
    val total = math.max(1L, corpus.count())
    val matched = corpus.filter(filter).count() // stage 1: filter-only pass
    if (matched.toDouble / total <= selectivityCutoff) {
      ("retrieve-then-score",
        topK(corpus, idCol, vecCol, queries, qidCol, qvecCol, metric, k,
          filter = Some(filter), outputCols = outputCols, roundTo = roundTo))
    } else {
      ("ann-post-filter",
        iterativePostFilter(corpus, idCol, vecCol, queries, qidCol, qvecCol,
          metric, k, filter, outputCols, roundTo))
    }
  }
}
