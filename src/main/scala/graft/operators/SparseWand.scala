package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.TopKFunctions

/** SPARSE_WAND: sparse-vector top-k with term-upper-bound pruning.
  *
  * Reference semantics: the SPARSE_WAND index type (reference: index
  * names in tests/integration/util_index.go:32-46; sparse postings in
  * internal/core/src/index/SparseInvertedIndexImpl.h — per-term maximum
  * weights drive WAND's "can this doc still beat the threshold" skip).
  *
  * Spark-first re-expression of the WAND/MaxScore family: a native
  * engine advances per-term posting cursors and skips docs whose
  * upper-bound sum is below the current top-k threshold θ. A
  * distributed scan has no cursors, but the same algebra prunes at the
  * *term* level (the MaxScore essential/non-essential split):
  *
  *  1. θ = a lower bound on the final k-th score, computed from the
  *     single highest-upper-bound term's postings only (those docs'
  *     full scores are ≥ their one-term contribution, so the true k-th
  *     best is ≥ the k-th best one-term contribution).
  *  2. Sort query terms by upper bound UB_t = q_t · max_t(weight); the
  *     maximal suffix with Σ UB < θ is non-essential — a doc matching
  *     ONLY non-essential terms scores < θ and cannot reach the top k.
  *  3. Candidate docs = docs with ≥1 essential-term posting (a postings
  *     scan restricted to essential terms — the skip: non-essential
  *     postings are never touched for candidate generation).
  *  4. Exact rescore of candidates over all query terms, partial-agg
  *     top-k. Results are exactly brute force (pruned docs are strictly
  *     below the k-th score even under ties).
  *
  * Scale: postings are (term, doc, weight) — laid out by term, the
  * candidate scan prunes to essential terms via predicate pushdown;
  * rescore touches |candidates| · |query| postings, not the corpus.
  * θ estimation reads k rows from one term's postings.
  */
object SparseWand {

  /** @param postings   (idCol, term, weight) — one row per non-zero.
    * @param termBounds (term, max_weight, df) — WAND upper-bound stats.
    */
  final case class Index(postings: DataFrame, termBounds: DataFrame, idCol: String)

  /** Build the sparse inverted index from a `map<string,double>`-typed
    * sparse vector column (e.g. [[graft.functions.SparseFunctions.termFreqs]]).
    */
  def build(docs: DataFrame, idCol: String, sparseCol: Column): Index =
    fromPostings(docs
      .select(col(idCol), explode(map_entries(sparseCol)).as("_e"))
      .select(col(idCol), col("_e.key").as("term"),
        col("_e.value").cast("double").as("weight")), idCol)

  /** Build term-frequency postings straight from a token array — one
    * explode + hash agg, skipping the per-row sparse-map construction
    * (which is O(distinct·tokens) per doc). Equivalent index, the shape
    * to use when the sparse vector IS term frequencies.
    */
  def buildFromTokens(docs: DataFrame, idCol: String, toksCol: Column): Index =
    fromPostings(docs
      .select(col(idCol), explode(toksCol).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("weight")), idCol)

  private def fromPostings(postings: DataFrame, idCol: String): Index = {
    // min_weight rides along so essentialSplit can detect negative
    // DOCUMENT weights: θ (k-th best single-term contribution ≤ k-th
    // best full score) is only a valid lower bound when every other
    // contribution is ≥ 0 — a negative posting would let θ exceed the
    // true k-th score and over-prune, breaking the exactness contract
    val bounds = postings.groupBy(col("term"))
      .agg(max(col("weight")).as("max_weight"), min(col("weight")).as("min_weight"),
        count(lit(1)).as("df"))
    Index(postings, bounds, idCol)
  }

  /** Pin the index (postings + bounds) in storage: a search makes
    * several passes over the postings (θ estimation, candidates, exact
    * rescore) — built lazily they would each re-derive the index from
    * the corpus. On a cluster this is the written postings table; in a
    * session, persist().
    */
  def materialize(index: Index): Index =
    index.copy(postings = index.postings.persist(), termBounds = index.termBounds.persist())

  /** The essential/non-essential split for `query` at threshold θ:
    * returns (essential terms, θ). Exposed for specs to assert real
    * pruning. θ = 0 (fewer than k postings under the best term) makes
    * every term essential — the exhaustive fallback.
    */
  def essentialSplit(index: Index, query: Map[String, Double], k: Int): (Seq[String], Double) = {
    require(query.nonEmpty, "empty sparse query")
    val qTerms = query.keys.toSeq.sorted
    // the pruning bound (score ≤ Σ UB over matched terms) needs every
    // contribution non-negative; a negative weight makes partial sums
    // non-monotone, so such queries take the exhaustive path
    if (query.valuesIterator.exists(_ < 0)) return (qTerms, 0.0)
    val stats = index.termBounds
      .filter(col("term").isin(qTerms: _*))
      .select(col("term"), col("max_weight"), col("min_weight"))
      .collect()
    // a negative DOCUMENT weight under any query term makes θ unsound
    // (contributions are no longer all ≥ 0) — exhaustive path
    if (stats.exists(_.getDouble(2) < 0)) return (qTerms, 0.0)
    val bounds = stats
      .map(r => r.getString(0) -> r.getDouble(1) * query(r.getString(0)))
      .toMap
    if (bounds.isEmpty) return (qTerms, 0.0) // no postings at all
    val tStar = bounds.maxBy { case (t, ub) => (ub, t) }._1
    // k-th best single-term contribution under the top-UB term — a true
    // lower bound on the k-th best full score (weights are ≥ 0)
    val topContribs = index.postings
      .filter(col("term") === tStar)
      .select((col("weight") * lit(query(tStar))).as("_c"))
      .orderBy(col("_c").desc)
      .limit(k)
      .collect()
    val theta = if (topContribs.length < k) 0.0 else topContribs.last.getDouble(0)
    if (theta <= 0.0) return (qTerms, 0.0)
    // ascending-UB prefix with ΣUB < θ is prunable (strict: a doc worth
    // exactly θ must survive for correct tie handling)
    val asc = qTerms.sortBy(t => (bounds.getOrElse(t, 0.0), t))
    var acc = 0.0
    val nonEssential = asc.takeWhile { t =>
      acc += bounds.getOrElse(t, 0.0); acc < theta
    }.toSet
    (qTerms.filterNot(nonEssential), theta)
  }

  /** nq-batched pruned sparse top-k (the reference searches sparse
    * queries batched like dense ones): per-query essential terms are
    * resolved on the driver (|queries|·|terms| scalars), then ONE
    * candidate join over (term → qid) essential pairs and ONE rescore
    * join over (term → qid, weight) serve every query together — the
    * postings are scanned a constant number of times regardless of nq,
    * and the final per-query top-k is a partial-agg groupBy(qid).
    * Output: (qid, idCol, score, rank).
    */
  def searchMany(index: Index, queries: Seq[(Long, Map[String, Double])], k: Int,
      exhaustive: Boolean = false, roundTo: Option[Int] = None): DataFrame = {
    require(queries.nonEmpty, "no queries")
    val spark = index.postings.sparkSession
    import spark.implicits._
    val essential: Seq[(Long, String)] = queries.flatMap { case (qid, q) =>
      val terms = if (exhaustive) q.keys.toSeq.sorted else essentialSplit(index, q, k)._1
      terms.map(qid -> _)
    }
    val weights: Seq[(Long, String, Double)] = queries.flatMap { case (qid, q) =>
      q.toSeq.map { case (t, w) => (qid, t, w) }
    }
    val allTerms = weights.map(_._2).distinct
    val qp = index.postings.filter(col("term").isin(allTerms: _*))
    val candidates = qp
      .join(broadcast(essential.toDF("qid", "term")), Seq("term"))
      .select(col("qid"), col(index.idCol)).distinct()
    val scored = qp
      .join(broadcast(weights.toDF("qid", "term", "qw")), Seq("term"))
      .join(candidates, Seq("qid", index.idCol), "left_semi")
      .groupBy(col("qid"), col(index.idCol))
      .agg(sum(col("weight") * col("qw")).as("_raw"))
      .select(col("qid"), col(index.idCol),
        roundTo.map(d => round(col("_raw"), d)).getOrElse(col("_raw")).as("score"))
    val idType = scored.schema(index.idCol).dataType
    scored
      .groupBy(col("qid"))
      .agg(TopKFunctions.top_k(col("score"),
        TopKFunctions.tieFor(col(index.idCol), idType),
        struct(col(index.idCol), col("score")), k, ascending = false).as("_hits"))
      .select(col("qid"), posexplode(col("_hits")).as(Seq("_pos", "_hit")))
      .select(col("qid"),
        col(s"_hit.payload.${index.idCol}").as(index.idCol),
        col("_hit.payload.score").as("score"),
        (col("_pos") + 1).cast("long").as("rank"))
  }

  /** Pruned sparse top-k. Output: (idCol, score), best-first; equal to
    * brute force. `exhaustive = true` disables pruning (every term
    * essential) — the SPARSE_INVERTED_INDEX path.
    */
  def search(index: Index, query: Map[String, Double], k: Int,
      exhaustive: Boolean = false, roundTo: Option[Int] = None): DataFrame = {
    val qTerms = query.keys.toSeq.sorted
    val essential = if (exhaustive) qTerms else essentialSplit(index, query, k)._1
    val qPostings = index.postings.filter(col("term").isin(qTerms: _*))
    val candidates = qPostings
      .filter(col("term").isin(essential: _*))
      .select(col(index.idCol)).distinct()
    val qw: Column = element_at(
      typedlit(query), col("term")) // plan-time literal map: term -> query weight
    val scored = qPostings
      .join(candidates, Seq(index.idCol), "left_semi")
      .withColumn("_c", col("weight") * qw)
      .groupBy(col(index.idCol))
      .agg(sum(col("_c")).as("_raw"))
      .select(col(index.idCol),
        roundTo.map(d => round(col("_raw"), d)).getOrElse(col("_raw")).as("score"))
    val idType = scored.schema(index.idCol).dataType
    scored
      .agg(TopKFunctions.top_k(col("score"),
        TopKFunctions.tieFor(col(index.idCol), idType),
        struct(col(index.idCol), col("score")), k, ascending = false).as("_hits"))
      .select(explode(col("_hits")).as("_hit"))
      .select(col(s"_hit.payload.${index.idCol}").as(index.idCol),
        col("_hit.payload.score").as("score"))
  }
}
