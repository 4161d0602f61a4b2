package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftSession
import graft.functions.Metric
import graft.operators.{Fusion, VectorSearch}

/** Driver-gated queries for the §2.1/§2.3/§2.4 search surface beyond
  * plain top-k: IP metric, range search, grouping search, offset
  * pagination, search iterator, requery, RRF/weighted fusion, boost and
  * decay rescoring.
  */
object SearchQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    GraftSession.table(s, dir, name)

  private def queries(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  /** DuckDB CTE producing (qid, vec_id, label, score) for a metric. */
  private def scoredSql(metricExpr: String): String =
    s"""q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
       |      FROM embeddings WHERE vec_id < 5),
       |d AS (SELECT q.qid, e.vec_id, e.label,
       |        round($metricExpr, 4) AS score
       |      FROM q CROSS JOIN embeddings e)""".stripMargin

  private val cosineExpr = "list_cosine_similarity(q.qvec, CAST(e.embedding AS DOUBLE[]))"
  private val ipExpr = "list_inner_product(q.qvec, CAST(e.embedding AS DOUBLE[]))"
  private val l2Expr = "power(list_distance(q.qvec, CAST(e.embedding AS DOUBLE[])), 2)"

  def topkIp(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    VectorSearch.topK(emb, "vec_id", "embedding", queries(s, dir), "qid", "qvec",
        Metric.IP, k = 10, roundTo = Some(4))
      .select(col("qid"), col("rank"), col("_score").as("score"), col("vec_id"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Pre-filtered search (PhyFilterBitsNode → PhyVectorSearchNode): the
    * boolean filter applies BEFORE top-k, like the reference's bitset
    * pre-filter.
    */
  def topkFiltered(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    VectorSearch.topK(emb, "vec_id", "embedding", queries(s, dir), "qid", "qvec",
        Metric.COSINE, k = 10,
        filter = Some(graft.expr.ExprCompiler.compile("label in [1, 2, 3] and vec_id % 2 == 0", emb)),
        outputCols = Seq("vec_id", "label"), roundTo = Some(4))
      .select(col("qid"), col("rank"), col("_score").as("score"), col("vec_id"), col("label"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Offset pagination (search_util.go:28-47). */
  def topkOffset(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    VectorSearch.topK(emb, "vec_id", "embedding", queries(s, dir), "qid", "qvec",
        Metric.COSINE, k = 10, offset = 5, roundTo = Some(4))
      .select(col("qid"), col("rank"), col("_score").as("score"), col("vec_id"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Range search (radius/range_filter, SearchBruteForce.cpp:236). */
  def rangeSearch(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    VectorSearch.rangeSearch(emb, "vec_id", "embedding", queries(s, dir), "qid", "qvec",
        Metric.COSINE, radius = 0.25, rangeFilter = Some(0.40), roundTo = Some(4))
      .select(col("qid"), col("vec_id"), col("_score").as("score"))
      .orderBy(col("qid"), col("vec_id"))
  }

  /** Search iterator v2 (CachedSearchIterator): next page strictly below
    * the last score bound.
    */
  def searchIterator(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    VectorSearch.searchIterator(emb, "vec_id", "embedding", queries(s, dir), "qid", "qvec",
        Metric.COSINE, batch = 10, lastBound = Some(0.30), roundTo = Some(4))
      .select(col("qid"), col("rank"), col("_score").as("score"), col("vec_id"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Grouping search (PhySearchGroupByNode): top 3 label-groups per
    * query, 2 hits per group, strict (groups fill to group_size).
    */
  def groupBySearch(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    VectorSearch.groupBySearch(emb, "vec_id", "embedding", queries(s, dir), "qid", "qvec",
        Metric.COSINE, k = 3, groupCols = Seq("label"), groupSize = 2,
        strictGroupSize = true,
        outputCols = Seq("vec_id"), roundTo = Some(4))
      .select(col("qid"), col("group_rank"), col("label"),
        col("rank"), col("_score").as("score"), col("vec_id"))
      .orderBy(col("qid"), col("group_rank"), col("rank"))
  }

  /** rank_group_scorer=sum (function-chain operator_group_by.go:33-120,
    * search param search_pipeline.go:1289): groups rank by the SUM of
    * their kept hits' scores — a group with two decent hits outranks a
    * single great hit — and every row carries the $group_score output.
    */
  def groupScorerSearch(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    VectorSearch.groupBySearch(emb, "vec_id", "embedding",
        queries(s, dir), "qid", "qvec",
        Metric.COSINE, k = 3, groupCols = Seq("label"), groupSize = 2,
        strictGroupSize = true, outputCols = Seq("vec_id"),
        roundTo = Some(4), groupScorer = "sum", emitGroupScore = true)
      .select(col("qid"), col("group_rank"), col("label"), col("rank"),
        col("_score").as("score"), col("vec_id"),
        round(col("group_score"), 4).as("group_score"))
      .orderBy(col("qid"), col("group_rank"), col("rank"))
  }

  /** Composite (multi-field) grouping search with the reference-default
    * strict_group_size=false: hits ranked after the k-th distinct
    * group's first appearance are excluded even from non-full groups
    * (search_reduce_util.go walk semantics).
    */
  def groupByComposite(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .withColumn("parity", (col("vec_id") % 2).cast("long"))
    VectorSearch.groupBySearch(emb, "vec_id", "embedding", queries(s, dir), "qid", "qvec",
        Metric.COSINE, k = 3, groupCols = Seq("label", "parity"), groupSize = 2,
        strictGroupSize = false,
        outputCols = Seq("vec_id"), roundTo = Some(4))
      .select(col("qid"), col("group_rank"), col("label"), col("parity"),
        col("rank"), col("_score").as("score"), col("vec_id"))
      .orderBy(col("qid"), col("group_rank"), col("rank"))
  }

  /** Requery (CreateRequeryPlan): fetch output fields for hit PKs via
    * broadcast join back to the base table.
    */
  def requery(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val hits = VectorSearch.topK(emb, "vec_id", "embedding", queries(s, dir), "qid", "qvec",
      Metric.COSINE, k = 5, roundTo = Some(4))
    VectorSearch.requery(hits, emb, "vec_id", Seq("label"))
      .select(col("qid"), col("rank"), col("_score").as("score"),
        col("vec_id"), col("label"))
      .orderBy(col("qid"), col("rank"))
  }

  /** RRF fusion of a COSINE and an L2 sub-search (rerank_builder.go:367). */
  def rrfFusion(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = queries(s, dir)
    val sub1 = VectorSearch.topK(emb, "vec_id", "embedding", q, "qid", "qvec",
      Metric.COSINE, k = 20, roundTo = Some(4))
    val sub2 = VectorSearch.topK(emb, "vec_id", "embedding", q, "qid", "qvec",
      Metric.L2, k = 20, roundTo = Some(4))
    Fusion.rrf(Seq(sub1, sub2), "qid", "vec_id", topK = 10)
      .select(col("qid"), col("rank"), round(col("_score"), 6).as("score"), col("vec_id"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Weighted fusion with metric-aware normalization
    * (operator_merge.go:586-614).
    */
  def weightedFusion(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = queries(s, dir)
    val sub1 = VectorSearch.topK(emb, "vec_id", "embedding", q, "qid", "qvec",
      Metric.COSINE, k = 20, roundTo = Some(4))
    val sub2 = VectorSearch.topK(emb, "vec_id", "embedding", q, "qid", "qvec",
      Metric.L2, k = 20, roundTo = Some(4))
    Fusion.weighted(Seq(sub1, sub2), Seq(Metric.COSINE, Metric.L2), Seq(0.6, 0.4),
        "qid", "vec_id", topK = 10)
      .select(col("qid"), col("rank"), round(col("_score"), 6).as("score"), col("vec_id"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Boost rescoring (PhyRescoresNode): matching rows get score × 2. */
  def boostRescore(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val hits = VectorSearch.topK(emb, "vec_id", "embedding", queries(s, dir), "qid", "qvec",
      Metric.COSINE, k = 20, outputCols = Seq("vec_id", "label"), roundTo = Some(4))
    val boosted = Fusion.boost(hits, "_score",
      Seq((col("label") === 3, lit(2.0))), boostMode = "multiply")
    VectorSearch.reduceTopK(boosted, "vec_id", "qid", Metric.COSINE, 10,
        Seq("vec_id", "label"))
      .select(col("qid"), col("rank"), round(col("_score"), 6).as("score"),
        col("vec_id"), col("label"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Decay rescoring (gauss decay on the label field as a stand-in
    * numeric recency; chain/expr/decay_expr.go:137-275).
    */
  def decayRescore(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val hits = VectorSearch.topK(emb, "vec_id", "embedding", queries(s, dir), "qid", "qvec",
      Metric.COSINE, k = 20, outputCols = Seq("vec_id", "label"), roundTo = Some(4))
    val decayed = hits.withColumn("_score",
      col("_score") * Fusion.decayFactor("gauss", col("label").cast("double"),
        origin = 5.0, scale = 3.0))
    VectorSearch.reduceTopK(decayed, "vec_id", "qid", Metric.COSINE, 10,
        Seq("vec_id", "label"))
      .select(col("qid"), col("rank"), round(col("_score"), 6).as("score"),
        col("vec_id"), col("label"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Rerank function CHAIN (reference: chain/rerank_builder.go — the
    * function_chain suite applies rerankers sequentially): gauss decay
    * then conditional boost over one candidate set, one final reduce.
    */
  def rerankChain(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val hits = VectorSearch.topK(emb, "vec_id", "embedding", queries(s, dir), "qid", "qvec",
      Metric.COSINE, k = 20, outputCols = Seq("vec_id", "label"), roundTo = Some(4))
    val decayed = hits.withColumn("_score",
      col("_score") * Fusion.decayFactor("gauss", col("label").cast("double"),
        origin = 5.0, scale = 3.0))
    val boosted = Fusion.boost(decayed, "_score",
      Seq((col("label") === 3, lit(2.0))), boostMode = "multiply")
    VectorSearch.reduceTopK(boosted, "vec_id", "qid", Metric.COSINE, 10,
        Seq("vec_id", "label"))
      .select(col("qid"), col("rank"), round(col("_score"), 6).as("score"),
        col("vec_id"), col("label"))
      .orderBy(col("qid"), col("rank"))
  }

  /** IVF index build + exhaustive-probe search (nprobe = nlist ⇒ exact,
    * so the brute-force oracle applies; partial-probe recall is asserted
    * in ScalaTest).
    */
  def ivfExhaustive(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.IvfIndex
    val emb = t(s, dir, "embeddings")
    val model = IvfIndex.trainLocal(emb, "embedding", nlist = 16)
    val clustered = IvfIndex.layout(emb, "embedding", model)
    IvfIndex.search(clustered, "vec_id", "embedding", model, queries(s, dir),
        "qid", "qvec", Metric.COSINE, k = 10, nprobe = 16, roundTo = Some(4))
      .select(col("qid"), col("rank"), col("_score").as("score"), col("vec_id"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Int8 vector search: corpus quantized (×32, RNE-by-floor, clamped),
    * round-tripped through the packed-binary int8 codec (reference:
    * VECTOR_INT8, Types.h:105), widened to float in-scan, exact L2 top-k.
    * All values are exact small integers, so the oracle recomputes the
    * identical quantization in SQL.
    */
  def int8Search(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{VectorTypes => VT}
    val emb = t(s, dir, "embeddings")
    val quant = transform(col("embedding"), x =>
      greatest(lit(-127L), least(lit(127L),
        floor(x.cast("double") * 32.0 + 0.5))).cast("int"))
    val corpus = emb.select(col("vec_id"),
      VT.fromInt8(VT.int8(quant)).as("vec"))
    val qs = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))
    VectorSearch.topK(corpus, "vec_id", "vec", qs, "qid", "qvec",
        Metric.L2, k = 10, roundTo = Some(4))
      .select(col("qid"), col("rank"), col("_score").as("score"), col("vec_id"))
      .orderBy(col("qid"), col("rank"))
  }

  /** fp16 vector pipeline (reference: VECTOR_FLOAT16, Types.h:95): the
    * corpus rides as packed binary16 (half the scan bytes), an
    * approximate pass scores the fp16-decoded vectors, and an exact
    * float32 refine re-ranks — with shortlist ≥ corpus the output is
    * exact, so the brute-force oracle applies (fp16 precision itself is
    * asserted bit-exactly in VectorTypesSpec).
    */
  def fp16Search(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{VectorFunctions, VectorTypes => VT}
    val emb = t(s, dir, "embeddings")
    val corpus = emb.select(col("vec_id"), col("embedding"),
      VT.fromFp16(VT.fp16(col("embedding"))).as("_f16"))
    val qs = corpus.filter(col("vec_id") >= 6 && col("vec_id") < 9)
      .select(col("vec_id").as("qid"), col("_f16").as("qvec"))
    val n = emb.count().toInt
    val short = VectorSearch.topK(corpus, "vec_id", "_f16", qs, "qid", "qvec",
        Metric.L2, k = n)
      .select(col("qid"), col("vec_id"))
    val qExact = corpus.filter(col("vec_id") >= 6 && col("vec_id") < 9)
      .select(col("vec_id").as("qid"), col("embedding").as("_qvec"))
    val raw = VectorFunctions.l2(col("embedding"), col("_qvec"))
    // shortlist = corpus here (oracle mode): no broadcast hint — AQE
    // picks the join; production shortlists (nq·k') broadcast on their own
    val exact = short
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(qExact), "qid")
      .withColumn("_score", round(raw, 4))
    VectorSearch.reduceTopK(exact, "vec_id", "qid", Metric.L2, 10, Seq("vec_id"))
      .select(col("qid"), col("rank"), col("_score").as("score"), col("vec_id"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Search with the vector field in output_fields (reference:
    * tests/integration/getvector — the querynode fetches the hit rows'
    * vectors and returns them in the search result). The vector rides
    * the same top-k payload struct as any scalar output field — no
    * second fetch — then unnests to (pos, val) rows so the oracle can
    * value-compare the returned floats.
    */
  def searchGetVector(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    VectorSearch.topK(emb, "vec_id", "embedding", queries(s, dir), "qid", "qvec",
        Metric.L2, k = 3, outputCols = Seq("vec_id", "embedding"), roundTo = Some(4))
      .select(col("qid"), col("rank"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos0", "fval")))
      .select(col("qid"), col("rank"), col("vec_id"),
        (col("pos0") + 1).cast("long").as("pos"),
        round(col("fval").cast("double"), 5).as("val"))
      .orderBy(col("qid"), col("rank"), col("pos"))
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_search_getvector" -> (searchGetVector _),
    "q_fp16_search" -> (fp16Search _),
    "q_int8_search" -> (int8Search _),
    "q_ivf_exhaustive" -> (ivfExhaustive _),
    "q_topk_ip" -> (topkIp _),
    "q_topk_filtered" -> (topkFiltered _),
    "q_topk_offset" -> (topkOffset _),
    "q_range_search" -> (rangeSearch _),
    "q_search_iterator" -> (searchIterator _),
    "q_groupby_search" -> (groupBySearch _),
    "q_group_scorer" -> (groupScorerSearch _),
    "q_groupby_composite" -> (groupByComposite _),
    "q_requery" -> (requery _),
    "q_rrf_fusion" -> (rrfFusion _),
    "q_weighted_fusion" -> (weightedFusion _),
    "q_boost_rescore" -> (boostRescore _),
    "q_decay_rescore" -> (decayRescore _),
    "q_rerank_chain" -> (rerankChain _)
  )

  def oracles: Map[String, String] = Map(
    "q_search_getvector" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id, e.embedding,
        |        round(power(list_distance(q.qvec, CAST(e.embedding AS DOUBLE[])), 2), 4) AS score
        |      FROM q CROSS JOIN embeddings e),
        |r AS (SELECT qid, vec_id, embedding,
        |        row_number() OVER (PARTITION BY qid ORDER BY score ASC, vec_id) AS rank
        |      FROM d)
        |SELECT qid, rank, vec_id,
        |       CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
        |       round(CAST(unnest(embedding) AS DOUBLE), 5) AS val
        |FROM r WHERE rank <= 3
        |ORDER BY qid, rank, pos""".stripMargin,
    "q_fp16_search" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
        |           FROM embeddings WHERE vec_id >= 6 AND vec_id < 9),
        |d AS (SELECT q.qid, e.vec_id,
        |        round(power(list_distance(q.qvec, CAST(e.embedding AS DOUBLE[])), 2), 4) AS score
        |      FROM q CROSS JOIN embeddings e),
        |r AS (SELECT qid, vec_id, score,
        |        row_number() OVER (PARTITION BY qid ORDER BY score ASC, vec_id) AS rank
        |      FROM d)
        |SELECT qid, rank, score, vec_id FROM r WHERE rank <= 10
        |ORDER BY qid, rank""".stripMargin,
    "q_int8_search" ->
      """WITH qv AS (SELECT vec_id,
        |        list_transform(CAST(embedding AS DOUBLE[]),
        |          x -> greatest(-127.0, least(127.0, floor(x * 32.0 + 0.5)))) AS v
        |      FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qvec FROM qv WHERE vec_id < 3),
        |d AS (SELECT q.qid, e.vec_id,
        |        round(power(list_distance(q.qvec, e.v), 2), 4) AS score
        |      FROM q CROSS JOIN qv e),
        |r AS (SELECT qid, vec_id, score,
        |        row_number() OVER (PARTITION BY qid ORDER BY score ASC, vec_id) AS rank
        |      FROM d)
        |SELECT qid, rank, score, vec_id FROM r WHERE rank <= 10
        |ORDER BY qid, rank""".stripMargin,
    "q_ivf_exhaustive" ->
      s"""WITH ${scoredSql(cosineExpr)},
         |r AS (SELECT qid, vec_id, score,
         |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
         |      FROM d)
         |SELECT qid, rank, score, vec_id FROM r WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin,
    "q_topk_ip" ->
      s"""WITH ${scoredSql(ipExpr)},
         |r AS (SELECT qid, vec_id, score,
         |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
         |      FROM d)
         |SELECT qid, rank, score, vec_id FROM r WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin,
    "q_topk_filtered" ->
      s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
         |           FROM embeddings WHERE vec_id < 5),
         |d AS (SELECT q.qid, e.vec_id, e.label, round($cosineExpr, 4) AS score
         |      FROM q CROSS JOIN embeddings e
         |      WHERE e.label IN (1, 2, 3) AND e.vec_id % 2 = 0),
         |r AS (SELECT qid, vec_id, label, score,
         |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
         |      FROM d)
         |SELECT qid, rank, score, vec_id, label FROM r WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin,
    "q_topk_offset" ->
      s"""WITH ${scoredSql(cosineExpr)},
         |r AS (SELECT qid, vec_id, score,
         |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
         |      FROM d)
         |SELECT qid, rank, score, vec_id FROM r WHERE rank > 5 AND rank <= 15
         |ORDER BY qid, rank""".stripMargin,
    "q_range_search" ->
      s"""WITH ${scoredSql(cosineExpr)}
         |SELECT qid, vec_id, score FROM d
         |WHERE score > 0.25 AND score <= 0.40
         |ORDER BY qid, vec_id""".stripMargin,
    "q_search_iterator" ->
      s"""WITH ${scoredSql(cosineExpr)},
         |c AS (SELECT * FROM d WHERE score < 0.30),
         |r AS (SELECT qid, vec_id, score,
         |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
         |      FROM c)
         |SELECT qid, rank, score, vec_id FROM r WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin,
    "q_group_scorer" ->
      s"""WITH ${scoredSql(cosineExpr)},
         |h AS (SELECT qid, label, vec_id, score,
         |        row_number() OVER (PARTITION BY qid, label ORDER BY score DESC, vec_id) AS hr
         |      FROM d),
         |hh AS (SELECT * FROM h WHERE hr <= 2),
         |b AS (SELECT qid, label, vec_id AS best_tie FROM h WHERE hr = 1),
         |gs AS (SELECT qid, label, round(sum(score), 4) AS gsum
         |       FROM hh GROUP BY qid, label),
         |g AS (SELECT gs.qid, gs.label, gs.gsum, row_number() OVER
         |        (PARTITION BY gs.qid ORDER BY gs.gsum DESC, b.best_tie) AS group_rank
         |      FROM gs JOIN b ON gs.qid = b.qid AND gs.label = b.label)
         |SELECT g.qid, g.group_rank, g.label, hh.hr AS rank, hh.score,
         |       hh.vec_id, g.gsum AS group_score
         |FROM g JOIN hh ON g.qid = hh.qid AND g.label = hh.label
         |WHERE g.group_rank <= 3
         |ORDER BY g.qid, g.group_rank, rank""".stripMargin,
    "q_groupby_search" ->
      s"""WITH ${scoredSql(cosineExpr)},
         |h AS (SELECT qid, label, vec_id, score,
         |        row_number() OVER (PARTITION BY qid, label ORDER BY score DESC, vec_id) AS hr
         |      FROM d),
         |hh AS (SELECT * FROM h WHERE hr <= 2),
         |b AS (SELECT qid, label, score AS best, vec_id AS best_tie FROM h WHERE hr = 1),
         |g AS (SELECT qid, label, row_number() OVER
         |        (PARTITION BY qid ORDER BY best DESC, best_tie) AS group_rank
         |      FROM b)
         |SELECT g.qid, g.group_rank, g.label, hh.hr AS rank, hh.score, hh.vec_id
         |FROM g JOIN hh ON g.qid = hh.qid AND g.label = hh.label
         |WHERE g.group_rank <= 3
         |ORDER BY g.qid, g.group_rank, rank""".stripMargin,
    "q_groupby_composite" ->
      s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
         |           FROM embeddings WHERE vec_id < 5),
         |d AS (SELECT q.qid, e.vec_id, e.label, e.vec_id % 2 AS parity,
         |        round($cosineExpr, 4) AS score
         |      FROM q CROSS JOIN embeddings e),
         |rn AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
         |       FROM d),
         |g AS (SELECT qid, label, parity, vec_id, score, rn,
         |        row_number() OVER (PARTITION BY qid, label, parity ORDER BY rn) AS gr,
         |        min(rn) OVER (PARTITION BY qid, label, parity) AS first_rn
         |      FROM rn),
         |gord AS (SELECT qid, label, parity, first_rn,
         |           row_number() OVER (PARTITION BY qid ORDER BY first_rn) AS group_rank
         |         FROM (SELECT DISTINCT qid, label, parity, first_rn FROM g)),
         |thr AS (SELECT qid,
         |          max(CASE WHEN group_rank = 3 THEN first_rn END) AS t,
         |          count(*) AS ngroups
         |        FROM gord WHERE group_rank <= 3 GROUP BY qid)
         |SELECT g.qid, gord.group_rank, g.label, g.parity, g.gr AS rank, g.score, g.vec_id
         |FROM g
         |JOIN gord ON g.qid = gord.qid AND g.label = gord.label AND g.parity = gord.parity
         |JOIN thr ON g.qid = thr.qid
         |WHERE gord.group_rank <= 3 AND g.gr <= 2
         |  AND (thr.ngroups < 3 OR g.rn <= thr.t)
         |ORDER BY g.qid, gord.group_rank, rank""".stripMargin,
    "q_requery" ->
      s"""WITH ${scoredSql(cosineExpr)},
         |r AS (SELECT qid, vec_id, label, score,
         |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
         |      FROM d)
         |SELECT qid, rank, score, vec_id, label FROM r WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,
    "q_rrf_fusion" ->
      s"""WITH ${scoredSql(cosineExpr)},
         |d2 AS (SELECT q.qid, e.vec_id, round($l2Expr, 4) AS score
         |       FROM q CROSS JOIN embeddings e),
         |r1 AS (SELECT qid, vec_id,
         |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
         |       FROM d),
         |r2 AS (SELECT qid, vec_id,
         |         row_number() OVER (PARTITION BY qid ORDER BY score ASC, vec_id) AS rank
         |       FROM d2),
         |u AS (SELECT qid, vec_id, 1.0 / (60 + rank) AS part FROM r1 WHERE rank <= 20
         |      UNION ALL
         |      SELECT qid, vec_id, 1.0 / (60 + rank) AS part FROM r2 WHERE rank <= 20),
         |f AS (SELECT qid, vec_id, sum(part) AS s FROM u GROUP BY qid, vec_id),
         |rr AS (SELECT qid, vec_id, s,
         |         row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id) AS rank
         |       FROM f)
         |SELECT qid, rank, round(s, 6) AS score, vec_id FROM rr WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin,
    "q_weighted_fusion" ->
      s"""WITH ${scoredSql(cosineExpr)},
         |d2 AS (SELECT q.qid, e.vec_id, round($l2Expr, 4) AS score
         |       FROM q CROSS JOIN embeddings e),
         |r1 AS (SELECT qid, vec_id, score,
         |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
         |       FROM d),
         |r2 AS (SELECT qid, vec_id, score,
         |         row_number() OVER (PARTITION BY qid ORDER BY score ASC, vec_id) AS rank
         |       FROM d2),
         |u AS (SELECT qid, vec_id, 0.6 * ((1.0 + score) * 0.5) AS part
         |      FROM r1 WHERE rank <= 20
         |      UNION ALL
         |      SELECT qid, vec_id, 0.4 * (1.0 - 2.0 * atan(score) / pi()) AS part
         |      FROM r2 WHERE rank <= 20),
         |f AS (SELECT qid, vec_id, sum(part) AS s FROM u GROUP BY qid, vec_id),
         |rr AS (SELECT qid, vec_id, s,
         |         row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id) AS rank
         |       FROM f)
         |SELECT qid, rank, round(s, 6) AS score, vec_id FROM rr WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin,
    "q_boost_rescore" ->
      s"""WITH ${scoredSql(cosineExpr)},
         |r AS (SELECT qid, vec_id, label, score,
         |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
         |      FROM d),
         |h AS (SELECT qid, vec_id, label,
         |        score * (CASE WHEN label = 3 THEN 2.0 ELSE 1.0 END) AS s
         |      FROM r WHERE rank <= 20),
         |rr AS (SELECT qid, vec_id, label, s,
         |         row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id) AS rank
         |       FROM h)
         |SELECT qid, rank, round(s, 6) AS score, vec_id, label FROM rr WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin,
    "q_decay_rescore" ->
      s"""WITH ${scoredSql(cosineExpr)},
         |r AS (SELECT qid, vec_id, label, score,
         |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
         |      FROM d),
         |h AS (SELECT qid, vec_id, label,
         |        score * exp(greatest(0.0, abs(CAST(label AS DOUBLE) - 5.0) - 0.0) *
         |                    greatest(0.0, abs(CAST(label AS DOUBLE) - 5.0) - 0.0) *
         |                    ln(0.5) / 9.0) AS s
         |      FROM r WHERE rank <= 20),
         |rr AS (SELECT qid, vec_id, label, s,
         |         row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id) AS rank
         |       FROM h)
         |SELECT qid, rank, round(s, 6) AS score, vec_id, label FROM rr WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin,
    "q_rerank_chain" ->
      s"""WITH ${scoredSql(cosineExpr)},
         |r AS (SELECT qid, vec_id, label, score,
         |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
         |      FROM d),
         |h AS (SELECT qid, vec_id, label,
         |        score * exp(greatest(0.0, abs(CAST(label AS DOUBLE) - 5.0) - 0.0) *
         |                    greatest(0.0, abs(CAST(label AS DOUBLE) - 5.0) - 0.0) *
         |                    ln(0.5) / 9.0)
         |              * (CASE WHEN label = 3 THEN 2.0 ELSE 1.0 END) AS s
         |      FROM r WHERE rank <= 20),
         |rr AS (SELECT qid, vec_id, label, s,
         |         row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id) AS rank
         |       FROM h)
         |SELECT qid, rank, round(s, 6) AS score, vec_id, label FROM rr WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin
  )
}
