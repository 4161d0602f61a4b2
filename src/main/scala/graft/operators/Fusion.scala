package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.Metric

/** Hybrid-search rank fusion + rescoring, as pure DataFrame algebra.
  *
  * Mirrors the reference rerank chain (reference:
  * internal/util/function/chain/rerank_builder.go,
  * operator_merge.go:318-614): N sub-search ranked lists are merged by
  * PK with RRF / weighted / decay scoring, then re-sorted and truncated.
  *
  * Each input DataFrame must carry (qidCol, idCol, "rank", "_score") as
  * produced by [[VectorSearch.topK]]. Inputs are nq·k rows each —
  * fusion cost is independent of corpus size, so any plan here is
  * 100 TB-safe by construction.
  */
object Fusion {

  /** Identical-subrequest dedup (reference:
    * planparserv2/check_identical.go — a hybrid search whose sub-requests
    * compile to the same plan runs the ANN once): returns the distinct
    * sub-results plus, for each original position, the index of its
    * representative. Detection is Catalyst semantic plan equality, so
    * differently-written but equivalent DataFrames dedup too. Callers
    * fuse using the multiplicity mapping; Spark then plans each distinct
    * subtree once and ReuseExchange shares the scan.
    */
  def dedupIdentical(results: Seq[DataFrame]): (Seq[DataFrame], Seq[Int]) = {
    val reps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // optimized (not analyzed) plans: trivially different formulations
    // (a pushed-down filter, a constant-true predicate) normalize away
    val mapping = results.map { df =>
      val plan = df.queryExecution.optimizedPlan
      reps.indexWhere(_.queryExecution.optimizedPlan.sameResult(plan)) match {
        case -1 => reps += df; reps.length - 1
        case i  => i
      }
    }
    (reps.toSeq, mapping)
  }

  /** Reciprocal Rank Fusion: score(pk) = Σ_i 1/(k + rank_i(pk)).
    * (reference: operator_merge.go:342 — rank is 1-based, default k=60)
    * Identical sub-requests are deduped first and contribute with
    * multiplicity (same arithmetic as evaluating each copy).
    */
  def rrf(
      results: Seq[DataFrame],
      qidCol: String,
      idCol: String,
      topK: Int,
      rrfK: Double = 60.0,
      orderedTies: Boolean = false): DataFrame = {
    val (reps, mapping) = dedupIdentical(results)
    val mult = mapping.groupBy(identity).view.mapValues(_.size).toMap
    val unioned = reps.zipWithIndex
      .map { case (df, i) => df.select(col(qidCol), col(idCol),
        (lit(mult(i).toDouble) / (lit(rrfK) + col("rank"))).as("_partial")) }
      .reduce(_ unionAll _)
    fuseAndRank(unioned, qidCol, idCol, topK, orderedTies)
  }

  /** Metric-aware score normalization to [0, 1], higher-is-better
    * (reference: operator_merge.go:586-614).
    */
  def normalizeScore(score: Column, metric: Metric.Value): Column = metric match {
    case Metric.COSINE => (lit(1.0) + score) * 0.5
    case Metric.IP     => lit(0.5) + atan(score) / math.Pi
    case Metric.L2     => lit(1.0) - lit(2.0) * atan(score) / math.Pi
  }

  /** Direction-only conversion for mixed-metric merges without full
    * normalization (reference: operator_merge.go:574-583).
    */
  def directionConvert(score: Column, metric: Metric.Value): Column =
    if (Metric.higherIsBetter(metric)) score
    else lit(1.0) - lit(2.0) * atan(score) / math.Pi

  /** Weighted fusion: score(pk) = Σ_i w_i · norm_i(score_i(pk))
    * (reference: rerank_builder.go:401-456 + operator_merge.go).
    */
  def weighted(
      results: Seq[DataFrame],
      metrics: Seq[Metric.Value],
      weights: Seq[Double],
      qidCol: String,
      idCol: String,
      topK: Int,
      normalize: Boolean = true,
      orderedTies: Boolean = false): DataFrame = {
    require(results.size == metrics.size && results.size == weights.size,
      "results, metrics and weights must align")
    val unioned = results.lazyZip(metrics).lazyZip(weights).map { (df, m, w) =>
      val norm = if (normalize) normalizeScore(col("_score"), m)
                 else directionConvert(col("_score"), m)
      df.select(col(qidCol), col(idCol), (lit(w) * norm).as("_partial"))
    }.reduce(_ unionAll _)
    fuseAndRank(unioned, qidCol, idCol, topK, orderedTies)
  }

  private def fuseAndRank(
      partials: DataFrame,
      qidCol: String,
      idCol: String,
      topK: Int,
      orderedTies: Boolean = false): DataFrame = {
    val fused = partials
      .groupBy(col(qidCol), col(idCol))
      .agg(sum(col("_partial")).as("_score"))
    if (orderedTies) {
      // rank by (score desc, id asc) with the id's NATURAL order — for
      // composite (struct) ids, whose Long tie in reduceTopK would fall
      // to a hash no oracle can replicate. Exact RRF ties are structural
      // (two ids each in one list at the same rank score identically),
      // so the tie order is part of the output contract here. The
      // candidate set is ≤ Σ nq·k rows, so a per-qid window is bounded.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(qidCol)).orderBy(col("_score").desc, col(idCol))
      fused.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= topK)
        .select(col(qidCol), col("rank"), col("_score"), col(idCol))
    } else {
      // candidate set is already ≤ Σ nq·k rows: a partial-agg top-k keeps
      // the final reduce shuffle-light
      VectorSearch.reduceTopK(fused, idCol, qidCol, Metric.IP /* higher=better */,
        topK, Seq(idCol))
    }
  }

  /** Decay rescoring on a numeric/time field (reference:
    * chain/expr/decay_expr.go:137-275): gauss / exp / linear decay of the
    * fused score by distance of `fieldValue` from `origin`, with `scale`,
    * `offset`, `decay` parameters.
    */
  def decayFactor(
      function: String,
      fieldValue: Column,
      origin: Double,
      scale: Double,
      offset: Double = 0.0,
      decay: Double = 0.5): Column = {
    val dist = greatest(lit(0.0), abs(fieldValue - origin) - offset)
    function.toLowerCase match {
      case "gauss" =>
        // exp(dist^2 * ln(decay) / scale^2)
        exp(dist * dist * math.log(decay) / (scale * scale))
      case "exp" =>
        exp(dist * math.log(decay) / scale)
      case "linear" =>
        greatest(lit(0.0), lit(1.0) - dist * (1.0 - decay) / scale)
      case other => throw new IllegalArgumentException(s"unknown decay function: $other")
    }
  }

  /** Model rerank (reference: rerank_builder.go:614-657 + providers in
    * internal/util/function/rerank/ — an external cross-encoder scores
    * (query, doc) pairs after fusion). The model call is pluggable; the
    * default `scorer` is a deterministic local stand-in (token-overlap
    * ratio) since external providers need egress. Hits are nq·k rows —
    * the scorer runs post-reduce, never against the corpus.
    */
  def modelRerank(
      hits: DataFrame,
      queryText: String,
      textCol: String,
      qidCol: String,
      idCol: String,
      topK: Int,
      scorer: (Column, String) => Column = tokenOverlapScorer): DataFrame = {
    val rescored = hits.withColumn("_score", scorer(col(textCol), queryText))
    VectorSearch.reduceTopK(rescored, idCol, qidCol, Metric.IP, topK, Seq(idCol, textCol))
  }

  /** Deterministic stand-in cross-encoder: |tokens(doc) ∩ tokens(query)|
    * / |tokens(query)|. Swap for a real provider by passing a different
    * `scorer` to [[modelRerank]].
    */
  def tokenOverlapScorer(text: Column, query: String): Column = {
    val qToks = graft.functions.TextFunctions.tokenizeString(query).distinct
    if (qToks.isEmpty) lit(0.0)
    else size(array_intersect(graft.functions.TextFunctions.tokenize(text),
      array(qToks.map(lit): _*))).cast("double") / qToks.size
  }

  /** Boost rescoring (reference: PhyRescoresNode,
    * internal/core/src/exec/operator/RescoresNode.cpp + plan.proto:383-412):
    * each (filter, weight) score-function boosts matching rows;
    * `functionMode` combines multiple matching boosts (multiply | sum),
    * `boostMode` combines the boost with the base score (multiply | sum).
    */
  def boost(
      hits: DataFrame,
      scoreCol: String,
      functions: Seq[(Column, Column)], // (filter, weight-or-random expr)
      boostMode: String = "multiply",
      functionMode: String = "multiply"): DataFrame = {
    val neutral = if (functionMode == "multiply") 1.0 else 0.0
    val factors = functions.map { case (pred, w) => when(pred, w).otherwise(lit(neutral)) }
    val combined = functionMode match {
      case "multiply" => factors.reduce(_ * _)
      case "sum"      => factors.reduce(_ + _)
      case other      => throw new IllegalArgumentException(s"unknown function_mode: $other")
    }
    val boosted = boostMode match {
      case "multiply" => col(scoreCol) * combined
      case "sum"      => col(scoreCol) + combined
      case other      => throw new IllegalArgumentException(s"unknown boost_mode: $other")
    }
    hits.withColumn(scoreCol, boosted)
  }
}
