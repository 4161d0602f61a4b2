package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftSession
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Driver-gated queries for §2.5 text analysis + the training-data
  * dedup/quality operators (tokenize, lang-id, quality, fingerprint,
  * exact/fuzzy dedup, Jaccard pairs, SimHash, MinHash-LSH).
  */
object TextQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    GraftSession.table(s, dir, name)

  /** DuckDB-side tokenizer identical to TextFunctions.tokenize. */
  private val sqlToks =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** Token counting + punctuation ratio + fingerprint per document. */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("token_cnt"),
        round(TextFunctions.punctRatio(col("text")), 4).as("punct_ratio"),
        TextFunctions.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }

  /** Language-ID heuristic (stopword markers). */
  def langId(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "documents")
      .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang_id"))
      .orderBy(col("doc_id"))
  }

  /** Composite quality score. */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "documents")
      .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Normalization-invariant duplicate groups: the corpus unioned with a
    * case/whitespace-mangled copy of itself (ids +10000) must collapse
    * into pairs under the token fingerprint.
    */
  def dedupFingerprint(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 200)
    val mangled = base.select((col("doc_id") + 10000).as("doc_id"),
      concat(upper(col("text")), lit("  ")).as("text"))
    Dedup.fingerprintGroups(base.unionByName(mangled), "doc_id", "text")
      .select(col("dup_key"), col("cnt"),
        array_join(col("ids"), ",").as("ids"))
      .orderBy(col("dup_key"))
  }

  /** Exact token-set Jaccard near-dup pairs on a bounded subset
    * (quadratic verify step of the dedup pipeline).
    */
  def jaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").filter(col("doc_id") < 60)
    Dedup.jaccardPairs(d, "doc_id", "text", threshold = 0.30)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Embedding-cosine near-duplicate pairs (brute-force exact). */
  def embedCosinePairs(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Dedup.embeddingCosinePairs(e, "vec_id", "embedding", threshold = 0.35)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** MinHash LSH candidate pairs (banded bucket join). Probabilistic —
    * verified rows-only by the driver; recall/precision asserted in
    * ScalaTest against exact Jaccard.
    */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    // plant near-duplicates: append one token to a copy of each doc
    val nearDup = base.filter(col("doc_id") < 100)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" appended")).as("text"))
    Dedup.minhashLshPairs(base.unionByName(nearDup), "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.5)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SimHash near-dup pairs (pigeonhole banding on 16-bit chunks). */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val nearDup = base.filter(col("doc_id") < 100)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" zzz")).as("text"))
    Dedup.simhashPairs(base.unionByName(nearDup), "doc_id", "text", maxDist = 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Full-text match queries through the expr compiler (tantivy
    * text_match / phrase_match semantics re-expressed).
    */
  def textMatch(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.filter(graft.expr.ExprCompiler.compile(
        "text_match(text, 'filter window', minimum_should_match = 2) " +
          "and phrase_match(text, 'the fast')", d))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** BM25 full-text search (ingest stats + IDF/avgdl + scoring). */
  def bm25(s: SparkSession, dir: String): DataFrame = {
    val model = graft.operators.Bm25.build(t(s, dir, "documents"), "doc_id", "text")
    graft.operators.Bm25.search(model, "filter window stream", k = 15, roundTo = Some(4))
      .select(col("doc_id"), col("rank"), col("_score").as("score"))
      .orderBy(col("rank"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bm25" -> (bm25 _),
    "q_text_stats" -> (textStats _),
    "q_lang_id" -> (langId _),
    "q_quality_score" -> (qualityScore _),
    "q_dedup_fingerprint" -> (dedupFingerprint _),
    "q_jaccard_pairs" -> (jaccardPairs _),
    "q_embed_cosine_pairs" -> (embedCosinePairs _),
    "q_minhash_lsh" -> (minhashLsh _),
    "q_simhash_pairs" -> (simhashPairs _),
    "q_text_match" -> (textMatch _)
  )

  private val langValues = TextFunctions.LangMarkers.toSeq.sortBy(_._1).map {
    case (lang, words) => s"('$lang', [${words.map(w => s"'$w'").mkString(",")}])"
  }.mkString(", ")

  val oracles: Map[String, String] = Map(
    "q_bm25" ->
      s"""WITH toks AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |dt AS (SELECT doc_id, len(t) * 1.0 AS dl, unnest(t) AS term FROM toks),
         |tf AS (SELECT doc_id, term, count(*) * 1.0 AS tf, any_value(dl) AS dl
         |       FROM dt GROUP BY doc_id, term),
         |stats AS (SELECT term, count(*) * 1.0 AS df FROM tf GROUP BY term),
         |g AS (SELECT count(*) * 1.0 AS n, avg(len(t) * 1.0) AS avgdl FROM toks),
         |q(term) AS (VALUES ('filter'), ('window'), ('stream')),
         |s AS (SELECT tf.doc_id,
         |        sum(ln(1.0 + (g.n - st.df + 0.5) / (st.df + 0.5)) *
         |            tf.tf * 2.2 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / g.avgdl)))
         |          AS score
         |      FROM tf JOIN q USING (term) JOIN stats st USING (term) CROSS JOIN g
         |      GROUP BY tf.doc_id),
         |r AS (SELECT doc_id, round(score, 4) AS score,
         |        row_number() OVER (ORDER BY round(score, 4) DESC, doc_id) AS rank
         |      FROM s)
         |SELECT doc_id, rank, score FROM r WHERE rank <= 15 ORDER BY rank""".stripMargin,
    "q_text_stats" ->
      s"""SELECT doc_id,
         | len($sqlToks) AS token_cnt,
         | round(CASE WHEN len(text) = 0 THEN 0.0
         |   ELSE len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0 / len(text)
         | END, 4) AS punct_ratio,
         | md5(array_to_string($sqlToks, ' ')) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_lang_id" ->
      s"""WITH toks AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |langs(lang, words) AS (VALUES $langValues),
         |scores AS (
         |  SELECT doc_id, lang, len(list_intersect(t, words)) AS score
         |  FROM toks CROSS JOIN langs),
         |best AS (SELECT doc_id, lang, score,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
         |  FROM scores)
         |SELECT doc_id, CASE WHEN score = 0 THEN 'und' ELSE lang END AS lang_id
         |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_quality_score" ->
      s"""WITH f AS (
         |  SELECT doc_id, $sqlToks AS t,
         |    CASE WHEN len(text) = 0 THEN 0.0
         |      ELSE len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0 / len(text)
         |    END AS punct
         |  FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    least(len(t) / 20.0, 1.0) AS length_ok,
         |    greatest(0.0, 1.0 - punct * 4.0) AS punct_ok,
         |    least(len(list_intersect(t,
         |      ['the','and','of','to','in','is','that','it','was','for'])) / 3.0, 1.0) AS stop_ok,
         |    CASE WHEN len(t) = 0 THEN 0.0
         |         ELSE list_sum(list_transform(t, x -> len(x))) * 1.0 / len(t) END AS mtl
         |  FROM f)
         |SELECT doc_id,
         |  round((length_ok + punct_ok + stop_ok +
         |         CASE WHEN mtl >= 2.5 AND mtl <= 12.0 THEN 1.0 ELSE 0.0 END) / 4.0, 4)
         |    AS quality
         |FROM g ORDER BY doc_id""".stripMargin,
    "q_dedup_fingerprint" ->
      s"""WITH d AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 200
         |  UNION ALL
         |  SELECT doc_id + 10000, upper(text) || '  ' FROM documents WHERE doc_id < 200),
         |f AS (SELECT doc_id,
         |        md5(array_to_string($sqlToks, ' ')) AS dup_key FROM d)
         |SELECT dup_key, count(*) AS cnt,
         |  array_to_string(list_sort(list(doc_id)), ',') AS ids
         |FROM f GROUP BY dup_key HAVING count(*) > 1 ORDER BY dup_key""".stripMargin,
    "q_jaccard_pairs" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_distinct($sqlToks) AS t
         |  FROM documents WHERE doc_id < 60)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(len(list_intersect(a.t, b.t)) * 1.0 /
         |        len(list_distinct(list_concat(a.t, b.t))), 4) AS jaccard
         |FROM toks a CROSS JOIN toks b
         |WHERE a.doc_id < b.doc_id
         |  AND round(len(list_intersect(a.t, b.t)) * 1.0 /
         |      len(list_distinct(list_concat(a.t, b.t))), 4) >= 0.30
         |ORDER BY id_a, id_b""".stripMargin,
    "q_embed_cosine_pairs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.v, b.v), 4) AS cosine
        |FROM e a CROSS JOIN e b
        |WHERE a.vec_id < b.vec_id
        |  AND round(list_cosine_similarity(a.v, b.v), 4) >= 0.35
        |ORDER BY id_a, id_b""".stripMargin,
    "q_text_match" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE len(list_intersect(
        |        list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''),
        |        ['filter', 'window'])) >= 2
        |  AND (' ' || array_to_string(
        |        list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''),
        |        ' ') || ' ') LIKE '% the fast %'
        |ORDER BY doc_id""".stripMargin
    // q_minhash_lsh, q_simhash_pairs: probabilistic signatures (xxhash64
    // seeds differ across engines) → rows-only driver check; exactness
    // asserted in ScalaTest against true Jaccard.
  )
}
