package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftSession
import graft.functions.{IngestFunctions, Metric}
import graft.operators.VectorSearch

/** Ingest FunctionSchema pipeline queries (reference:
  * internal/util/function/function.go — the BM25 / MinHash /
  * TextEmbedding runner triad applied at ingest time).
  */
object FunctionQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    GraftSession.table(s, dir, name)

  private val EmbedDim = 8
  private val QueryText = "vector stream table"

  /** TextEmbedding ingest → dense vector field → ANN search over it:
    * the full pipeline a reference collection with an embedding
    * FunctionSchema runs on every insert (function.go:42 +
    * embedding/function_executor.go), with the deterministic local
    * provider standing in for the egress-bound external APIs. The query
    * string goes through the SAME provider, exactly like the reference
    * embeds search text with the collection's function.
    */
  def embedIngest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val ingested = IngestFunctions.applyAll(docs, Seq(
      IngestFunctions.TextEmbeddingFunction("text", "emb", EmbedDim)))
    val qs = s.range(1).select(lit(0L).as("qid"),
      IngestFunctions.CharFreqEmbedding.embed(lit(QueryText), EmbedDim).as("qvec"))
    VectorSearch.topK(ingested, "doc_id", "emb", qs, "qid", "qvec",
        Metric.IP, k = 20, roundTo = Some(4))
      .select(col("qid"), col("rank"), col("_score").as("score"), col("doc_id"))
      .orderBy(col("qid"), col("rank"))
  }

  /** DuckDB twin of [[IngestFunctions.CharFreqEmbedding]]: letter counts
    * → L2 normalize → float32 quantization round-trip (the stored
    * embedding is array<float>; CAST(CAST(x AS FLOAT) AS DOUBLE) lands
    * on the same IEEE doubles Spark reads back), so both engines rank
    * bit-identical values.
    */
  private def charFreqSql(textExpr: String): String = {
    val counts = (0 until EmbedDim).map { j =>
      val ch = ('a' + j).toChar
      s"CAST(length(lower($textExpr)) - length(replace(lower($textExpr), '$ch', '')) AS DOUBLE)"
    }.mkString("[", ", ", "]")
    s"""(SELECT CASE WHEN nrm = 0 THEN list_transform(v, x -> CAST(CAST(x AS FLOAT) AS DOUBLE))
       |       ELSE list_transform(v, x -> CAST(CAST(x / nrm AS FLOAT) AS DOUBLE)) END
       | FROM (SELECT v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
       |       FROM (SELECT $counts AS v)))""".stripMargin
  }

  /** COLLECTION-ATTACHED function (AddCollectionFunction RPC): the
    * TextEmbedding FunctionSchema lives on the collection, every insert
    * computes the output field automatically, and search runs over the
    * generated vectors through the facade — same oracle arithmetic as
    * [[embedIngest]], but the pipeline is create → addFunction →
    * insert → search instead of a manual applyAll. Also pins the
    * output-field protection (a batch supplying the output is rejected)
    * via the engine path that the facade itself exercises.
    */
  def collectionFunctions(s: SparkSession, dir: String): DataFrame = {
    import graft.{Collection, CollectionSchema}
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    // the schema DECLARES the output vector field; the function FILLS it
    // (exactly the reference's FunctionSchema-into-vector-field shape)
    val c = Collection.create(s, CollectionSchema(pkField = "doc_id",
      vectorFields = Map("emb" -> EmbedDim)))
    c.addFunction(IngestFunctions.TextEmbeddingFunction("text", "emb", EmbedDim))
    c.insert(docs)
    val qvec = IngestFunctions.CharFreqEmbedding.embed(lit(QueryText), EmbedDim)
    val qs = s.range(1).select(lit(0L).as("qid"), qvec.as("qvec"))
    c.search("emb", qs, k = 20, metric = Metric.IP, outputFields = Seq("doc_id"),
        roundTo = Some(4))
      .select(col("qid"), col("rank"), col("_score").as("score"), col("doc_id"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Add-function-with-BACKFILL (reference:
    * 20260715-online-schema-evolution.md — an added function field
    * backfills historical data before publication): the rows are
    * inserted BEFORE the function exists, the add carries
    * backfill=true, and the search must score them exactly as if the
    * outputs had been ingest-computed — the same oracle as
    * q_collection_functions, with the DDL order inverted.
    */
  def functionBackfill(s: SparkSession, dir: String): DataFrame = {
    import graft.{Collection, CollectionSchema}
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val c = Collection.create(s, CollectionSchema(pkField = "doc_id",
      vectorFields = Map("emb" -> EmbedDim)))
    c.insert(docs) // BEFORE the function exists
    c.addFunction(
      IngestFunctions.TextEmbeddingFunction("text", "emb", EmbedDim),
      backfill = true)
    val qvec = IngestFunctions.CharFreqEmbedding.embed(lit(QueryText), EmbedDim)
    val qs = s.range(1).select(lit(0L).as("qid"), qvec.as("qvec"))
    c.search("emb", qs, k = 20, metric = Metric.IP, outputFields = Seq("doc_id"),
        roundTo = Some(4))
      .select(col("qid"), col("rank"), col("_score").as("score"), col("doc_id"))
      .orderBy(col("qid"), col("rank"))
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_ingest" -> (embedIngest _),
    "q_collection_functions" -> (collectionFunctions _),
    "q_function_backfill" -> (functionBackfill _)
  )

  def oracles: Map[String, String] = Map(
    "q_embed_ingest" ->
      s"""WITH de AS (SELECT doc_id, ${charFreqSql("text")} AS ev FROM documents),
         |qe AS (SELECT ${charFreqSql(s"'$QueryText'")} AS ev),
         |d AS (SELECT de.doc_id,
         |        round(list_inner_product(de.ev, qe.ev), 4) AS score
         |      FROM de CROSS JOIN qe),
         |r AS (SELECT doc_id, score,
         |        row_number() OVER (ORDER BY score DESC, doc_id) AS rank
         |      FROM d)
         |SELECT CAST(0 AS BIGINT) AS qid, rank, score, doc_id
         |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,
    "q_collection_functions" ->
      s"""WITH de AS (SELECT doc_id, ${charFreqSql("text")} AS ev FROM documents),
         |qe AS (SELECT ${charFreqSql(s"'$QueryText'")} AS ev),
         |d AS (SELECT de.doc_id,
         |        round(list_inner_product(de.ev, qe.ev), 4) AS score
         |      FROM de CROSS JOIN qe),
         |r AS (SELECT doc_id, score,
         |        row_number() OVER (ORDER BY score DESC, doc_id) AS rank
         |      FROM d)
         |SELECT CAST(0 AS BIGINT) AS qid, rank, score, doc_id
         |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,
    "q_function_backfill" ->
      s"""WITH de AS (SELECT doc_id, ${charFreqSql("text")} AS ev FROM documents),
         |qe AS (SELECT ${charFreqSql(s"'$QueryText'")} AS ev),
         |d AS (SELECT de.doc_id,
         |        round(list_inner_product(de.ev, qe.ev), 4) AS score
         |      FROM de CROSS JOIN qe),
         |r AS (SELECT doc_id, score,
         |        row_number() OVER (ORDER BY score DESC, doc_id) AS rank
         |      FROM d)
         |SELECT CAST(0 AS BIGINT) AS qid, rank, score, doc_id
         |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin
  )
}
