package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftSession
import graft.functions.TextFunctions
import graft.operators.Dedup
import graft.streaming.Streaming

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

  /** Token counting (whitespace + BPE-ish pre-tokens) + punctuation
    * ratio + fingerprint per document.
    */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    // spread: the per-row stats (BPE count, fingerprint) are the cost
    val d = graft.GraftSession.spread(t(s, dir, "documents"))
    d.select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("token_cnt"),
        TextFunctions.bpeTokenCount(col("text")).cast("long").as("bpe_cnt"),
        round(TextFunctions.punctRatio(col("text")), 4).as("punct_ratio"),
        TextFunctions.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }

  /** Winnowing rolling-hash fingerprints, exploded to (doc_id, fp) —
    * both engines evaluate the same modular polynomial hash, so the
    * compare is exact (see [[TextFunctions.winnowFingerprints]]).
    */
  def winnowFingerprint(s: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.spread(t(s, dir, "documents"))
      .select(col("doc_id"),
        explode(TextFunctions.winnowFingerprints(col("text"))).as("fp"))
      .orderBy(col("doc_id"), col("fp"))
  }

  /** Winnow near-dup pairs on a corpus of docs + 80%-truncated copies
    * (ids +10000): containment-style overlap finds truncation pairs that
    * Jaccard would under-score. Both engines recompute the identical
    * rolling hash, so the compare is exact.
    */
  def winnowPairs(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 300)
    val truncated = base.select((col("doc_id") + 10000).as("doc_id"),
      expr("substring(text, 1, cast(floor(length(text)*0.8) as int))").as("text"))
    Dedup.winnowNearDupPairs(base.unionByName(truncated), "doc_id", "text",
        minOverlap = 0.5)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Language-ID heuristic (stopword markers). */
  def langId(s: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.spread(t(s, dir, "documents"))
      .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang_id"))
      .orderBy(col("doc_id"))
  }

  /** Composite quality score. */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.spread(t(s, dir, "documents"))
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
    * (quadratic verify step of the dedup pipeline; row-capped by API).
    */
  def jaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").filter(col("doc_id") < 60)
    Dedup.jaccardPairsExhaustive(d, "doc_id", "text", threshold = 0.30)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Embedding-cosine near-duplicate pairs via SRP-LSH bucketing +
    * exact in-bucket verification — the scale path (the brute-force
    * crossJoin survives only as the row-capped
    * `embeddingCosinePairsExhaustive` ground-truth helper). Near-dups
    * are planted deterministically (v + 0.02·rotate(v), ids shifted by
    * max(vec_id)+1 — a DYNAMIC offset: this query plants a copy of the
    * WHOLE corpus, so a fixed offset would collide with real ids at any
    * larger scale, silently corrupting the pair joins — cosine ≈ 0.9998)
    * so the oracle's exact self-join must agree pair-for-pair at
    * threshold 0.98.
    */
  def embedCosinePairs(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("vec"))
    val offset = e.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val rotated = concat(slice(col("vec"), lit(2), size(col("vec")) - 1),
      slice(col("vec"), 1, 1))
    val planted = e.select((col("vec_id") + offset).as("vec_id"),
      zip_with(col("vec"), rotated, (a, b) => a + lit(0.02) * b).as("vec"))
    Dedup.srpNearDupPairs(e.unionByName(planted), "vec_id", "vec",
        threshold = 0.98, roundTo = Some(4))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** MinHash-LSH near-dup pairs, exactly verified: LSH banding generates
    * candidates, exact shingle-set Jaccard keeps pairs ≥ 0.8 — so the
    * output is deterministic (banding at 21 bands × r=3 misses a J=0.8
    * pair with p ≈ 3·10⁻⁷) and the DuckDB oracle is a plain exact
    * Jaccard self-join over the same planted corpus.
    */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    // plant near-duplicates: append one token to a copy of each doc
    val nearDup = base.filter(col("doc_id") < 100)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" appended")).as("text"))
    Dedup.minhashNearDupPairs(base.unionByName(nearDup), "doc_id", "text",
        threshold = 0.8, numHashes = 63, bands = 21, roundTo = Some(4))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** End-to-end dedup: corpus minus near-duplicates (LSH pairs → graph
    * components → min-id survivor per cluster). Planted dups form
    * deterministic 2-node clusters, so the oracle is "drop every id that
    * an exact-Jaccard pair marks as the larger member".
    */
  def dedupSurvivors(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val nearDup = base.filter(col("doc_id") < 100)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" appended")).as("text"))
    Dedup.dropNearDuplicates(base.unionByName(nearDup), "doc_id", "text",
        threshold = 0.8, numHashes = 63, bands = 21)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
  }

  /** SimHash near-dup pairs over the PORTABLE 60-bit md5-derived
    * signature, pigeonhole banding (maxDist+1 chunks ⇒ exact recall) —
    * fully deterministic, so the oracle recomputes the identical
    * signature in SQL and all-pairs-checks hamming ≤ 3.
    */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val nearDup = base.filter(col("doc_id") < 100)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" zzz")).as("text"))
    Dedup.simhashPairs(base.unionByName(nearDup), "doc_id", "text", maxDist = 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** char_group tokenizer + lowercase/max_length/stop filter chain
    * (reference: char_group_tokenizer.rs + analyzer filter params) —
    * document frequency of the top surviving terms.
    */
  def analyzerCharGroup(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Analyzers
    val d = t(s, dir, "documents")
    val toks = Analyzers.analyzeWith(col("text"), Map(
      "tokenizer" -> "char_group", "delims" -> " .,;:!?",
      "filters" -> "lowercase,max_length,stop",
      "max_token_length" -> "8",
      "stop_words" -> "the,and,of,to,in,is"))
    // array_distinct before explode ⇒ (doc, term) pairs are already
    // unique ⇒ df is ONE hash-agg shuffle, no distinct() pass
    d.select(col("doc_id"), explode(array_distinct(toks)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term")).limit(20)
  }

  /** Jieba-style dictionary-free CJK segmentation (jieba_tokenizer.rs;
    * search-mode gram emission = every unigram + every bigram per Han
    * run). The corpus is synthetic ASCII, so the fixture maps a-z onto
    * 26 Han codepoints deterministically — the analyzer then sees real
    * multi-character Han runs; term counts over the emitted grams are
    * recomputed by the oracle with the same mapping.
    */
  /** Fixture alphabet for the Japanese analyzer: the 11 most frequent
    * letters map to hiragana (inflection-like runs) and the other 15 to
    * Han (stem-like runs), so translated words contain the script
    * transitions the tokenizer segments on. Shared with the oracle.
    */
  private val JaHira = "あいうえおかきくけこさ"
  private val JaHan = "的一是不了人我在有他这中大来上"
  private val JaAlphabet: String = {
    val kanaLetters = "aeiounsrhlt"
    var hi = 0
    var ha = 0
    "abcdefghijklmnopqrstuvwxyz".map { ch =>
      if (kanaLetters.contains(ch)) { val c = JaHira(hi); hi += 1; c }
      else { val c = JaHan(ha); ha += 1; c }
    }.mkString
  }

  /** Lindera-analyzer stand-in (dictionary-free Japanese script-run
    * segmentation): hottest terms over a mixed kanji/kana corpus —
    * whole kana runs plus Han uni+bigrams.
    */
  def analyzerJa(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Analyzers
    val d = t(s, dir, "documents").filter(col("lang") === "zh")
    val jaText = translate(regexp_replace(col("text"), "[^a-z ]", ""),
      "abcdefghijklmnopqrstuvwxyz", JaAlphabet)
    val toks = Analyzers.analyzeWith(jaText, Map("tokenizer" -> "lindera"))
    d.select(explode(toks).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(30)
  }

  /** Fixture for the icu/thai analyzers (UAX#29 WordBreak — reference
    * `tantivy-binding/src/analyzer/tokenizers/icu_tokenizer.rs`,
    * 20260403-arabic-thai-analyzer.md). The synthetic corpus has no
    * Thai/mixed-locale text, so each doc is assigned one of six fixed
    * sentences by `doc_id % 6`; the Spark side runs the REAL
    * BreakIterator analyzer, while the ORACLE carries each sentence's
    * precomputed token list verbatim (BreakIterator output is
    * deterministic for a fixed JDK — same precompute approach as the
    * q_analyzer_ja alphabet fixture). Counts stay data-dependent
    * through the per-sid document counts.
    */
  private val ThaiSentences = Seq(
    "สวัสดีครับผมชื่อสมชาย",
    "วันนี้อากาศดีมาก",
    "ฉันกินข้าวที่ร้านอาหาร",
    "ประเทศไทยมีชายหาดสวยงาม",
    "เด็กนักเรียนอ่านหนังสือในห้องสมุด",
    "ขอบคุณมากครับ")
  /** `BreakIterator.getWordInstance(th)` over [[ThaiSentences]] — the
    * Thai break dictionary splits the unspaced runs into real words.
    */
  private val ThaiTokens = Seq(
    Seq("สวัสดี", "ครับ", "ผม", "ชื่อ", "สม", "ชาย"),
    Seq("วัน", "นี้", "อากาศ", "ดี", "มาก"),
    Seq("ฉัน", "กิน", "ข้าว", "ที่", "ร้าน", "อาหาร"),
    Seq("ประเทศ", "ไทย", "มี", "ชาย", "หาด", "สวย", "งาม"),
    Seq("เด็ก", "นักเรียน", "อ่าน", "หนังสือ", "ใน", "ห้องสมุด"),
    Seq("ขอบคุณ", "มาก", "ครับ"))

  private val IcuSentences = Seq(
    "Hello world this is ICU tokenization",
    "مرحبا بالعالم من جديد",
    "今日は良い天気ですね",
    "Привет мир как дела сегодня",
    "C'est déjà l'été n'est-ce pas",
    "version 2.0 released on 2026-08-13")
  /** `BreakIterator.getWordInstance(ROOT)` over [[IcuSentences]] —
    * Latin/Cyrillic/Arabic split on spaces, CJK through the break
    * dictionary, apostrophes kept word-internal, numbers as units.
    */
  private val IcuTokens = Seq(
    Seq("Hello", "world", "this", "is", "ICU", "tokenization"),
    Seq("مرحبا", "بالعالم", "من", "جديد"),
    Seq("今日", "は", "良", "い", "天気", "ですね"),
    Seq("Привет", "мир", "как", "дела", "сегодня"),
    Seq("C'est", "déjà", "l'été", "n'est-ce", "pas"),
    Seq("version", "2.0", "released", "on", "2026", "08", "13"))

  private def sentenceCounts(
      s: SparkSession, dir: String,
      sentences: Seq[String], params: Map[String, String]): DataFrame = {
    import graft.functions.Analyzers
    val d = t(s, dir, "documents")
    val sent = element_at(array(sentences.map(lit): _*),
      (col("doc_id") % sentences.size).cast("int") + 1)
    val toks = Analyzers.analyzeWith(sent, params)
    d.select(explode(toks).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(25)
  }

  /** Fixture for the dictionary-backed jieba tokenizer (reference:
    * jieba_tokenizer.rs consumes a user dictionary; here it arrives
    * through the file-resource registry via `dict_resource`). The
    * expected tokens are derived BY HAND from the documented
    * longest-match semantics — 北京大学 wins whole (4-char dict entry),
    * 大学生 beats its prefix 大学 (longest match), OOV spans fall back
    * to uni+bigrams, latin spans tokenize as standard — so the oracle
    * pins intended behavior, not the implementation.
    */
  private val UserDictWords = Seq("中国", "大学", "大学生", "北京大学")
  private val UserDictSentences = Seq(
    "我在中国",          // OOV 我在 → grams; 中国 dict-whole
    "北京大学的学生",    // 北京大学 whole; OOV 的学生 → grams
    "大学生活",          // 大学生 beats 大学; OOV 活
    "Hello 中国 world")  // latin spans as standard, reading order
  private val UserDictTokens = Seq(
    Seq("我", "在", "我在", "中国"),
    Seq("北京大学", "的", "学", "生", "的学", "学生"),
    Seq("大学生", "活"),
    Seq("hello", "中国", "world"))

  def analyzerUserdict(s: SparkSession, dir: String): DataFrame = {
    graft.functions.FileResources.add("userdict_cjk_r8", UserDictWords.mkString("\n"))
    sentenceCounts(s, dir, UserDictSentences,
      Map("tokenizer" -> "jieba", "dict_resource" -> "userdict_cjk_r8"))
  }

  def analyzerThai(s: SparkSession, dir: String): DataFrame =
    sentenceCounts(s, dir, ThaiSentences, Map("tokenizer" -> "thai"))

  def analyzerIcu(s: SparkSession, dir: String): DataFrame =
    sentenceCounts(s, dir, IcuSentences, Map("tokenizer" -> "icu"))

  /** Fixture for the Porter `stemmer` filter (tantivy
    * stemmer_filter.rs). Every word and its stem comes from the rule
    * examples in Porter 1980 ("An algorithm for suffix stripping") —
    * the same published chains PorterStemmerSpec asserts one by one —
    * so the oracle's precomputed tokens are anchored to the paper, not
    * to this repo's implementation.
    */
  private val StemSentences = Seq(
    "caresses ponies ties caress cats",
    "plastered motoring sing hopping tanned",
    "falling hissing failing filing sized",
    "relational conditional rational valenci digitizer",
    "operator feudalism hopefulness formaliti triplicate",
    "generalizations oscillators adjustable dependent replacement")
  private val StemTokens = Seq(
    Seq("caress", "poni", "ti", "caress", "cat"),
    Seq("plaster", "motor", "sing", "hop", "tan"),
    Seq("fall", "hiss", "fail", "file", "size"),
    Seq("relat", "condit", "ration", "valenc", "digit"),
    Seq("oper", "feudal", "hope", "formal", "triplic"),
    Seq("gener", "oscil", "adjust", "depend", "replac"))

  def analyzerStem(s: SparkSession, dir: String): DataFrame =
    sentenceCounts(s, dir, StemSentences,
      Map("tokenizer" -> "standard", "filters" -> "lowercase,stemmer"))

  /** DuckDB VALUES rows `(sid, [tok, …])` for a precomputed-token
    * oracle (apostrophes doubled for the SQL literal).
    */
  private def sqlTokenRows(tokens: Seq[Seq[String]]): String =
    tokens.zipWithIndex.map { case (toks, sid) =>
      toks.map(t => "'" + t.replace("'", "''") + "'")
        .mkString(s"($sid, [", ",", "])")
    }.mkString(",\n        |  ")

  private def sentenceOracle(tokens: Seq[Seq[String]]): String =
    s"""WITH sents(sid, toks) AS (VALUES
       |  ${sqlTokenRows(tokens)}),
       |docs AS (SELECT CAST(doc_id % ${tokens.size} AS INT) AS sid FROM documents),
       |t AS (SELECT unnest(s.toks) AS term
       |      FROM docs d JOIN sents s ON d.sid = s.sid)
       |SELECT term, count(*) AS cnt FROM t GROUP BY term
       |ORDER BY cnt DESC, term LIMIT 25""".stripMargin

  def analyzerCjk(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Analyzers
    val d = t(s, dir, "documents").filter(col("lang") === "zh")
    val han = HanAlphabet
    val cjkText = translate(
      regexp_replace(col("text"), "[^a-z ]", ""),
      "abcdefghijklmnopqrstuvwxyz", han)
    val toks = Analyzers.analyzeWith(cjkText, Map("tokenizer" -> "jieba"))
    d.select(explode(toks).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(30)
  }

  /** Pinyin filter (MEP 20260209-pinyin_filter.md): Han "words" (the
    * deterministic a-z → Han fixture mapping) expand through the filter
    * with every option on — original Han token, per-syllable full
    * pinyin, joined full pinyin, and separate first letters — and the
    * hottest resulting terms are counted. The oracle recomputes the
    * whole expansion from the same 26-entry letter→(han, pinyin) table.
    */
  def analyzerPinyin(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Analyzers
    val d = t(s, dir, "documents").filter(col("lang") === "zh")
    val hanText = translate(
      regexp_replace(lower(col("text")), "[^a-z ]", ""),
      "abcdefghijklmnopqrstuvwxyz", HanAlphabet)
    val toks = Analyzers.analyzeWith(hanText, Map(
      "tokenizer" -> "whitespace",
      "filters" -> "pinyin",
      "keep_original" -> "true",
      "keep_full_pinyin" -> "true",
      "keep_joined_full_pinyin" -> "true",
      "keep_separate_first_letter" -> "true"))
    d.select(explode(toks).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(30)
  }

  /** ngram tokenizer (tantivy ngram_tokenizer_with_chars.rs): total
    * occurrence counts of the hottest character trigrams.
    */
  def analyzerNgram(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Analyzers
    val d = t(s, dir, "documents").filter(col("doc_id") < 50)
    d.select(explode(Analyzers.analyze(col("text"),
        Analyzers.Ngram(3, 3), Seq(Analyzers.Lowercase))).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram")).limit(15)
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

  /** Streaming-freshness BM25 (idf_oracle.go:64-96): the corpus ingests
    * in four micro-batch-sized increments through Bm25Incremental —
    * (df, avgdl) merge per batch, never a full recompute — and the final
    * scores must equal the oracle's whole-corpus BM25.
    */
  def bm25Stream(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val inc = new graft.operators.Bm25.Bm25Incremental("doc_id", "text")
    (0 until 4).foreach(b => inc.ingest(docs.filter(pmod(col("doc_id"), lit(4)) === b)))
    graft.operators.Bm25
      .searchTerms(inc.model, Seq("merge", "batch", "key"), k = 15, roundTo = Some(4))
      .select(col("doc_id"), col("rank"), col("_score").as("score"))
      .orderBy(col("rank"))
  }

  /** Multi-analyzer BM25 (multi_analyzer_bm25_function.go): German docs
    * tokenized with a char_group analyzer, everything else with the
    * standard analyzer — ONE shared statistics build and search.
    */
  def bm25Multilang(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Analyzers
    val d = t(s, dir, "documents")
    val toks = when(col("lang") === "de",
        Analyzers.analyze(col("text"),
          Analyzers.CharGroup(Seq(' ', '.', ',')), Seq(Analyzers.Lowercase)))
      .otherwise(TextFunctions.tokenize(col("text")))
    val model = graft.operators.Bm25.buildFromTokens(d, "doc_id", toks)
    graft.operators.Bm25
      .searchTerms(model, Seq("filter", "window", "stream"), k = 15, roundTo = Some(4))
      .select(col("doc_id"), col("rank"), col("_score").as("score"))
      .orderBy(col("rank"))
  }

  /** PII scrubbing pass (training-pipeline redaction; not a reference
    * operator — the pipeline step the brief's text-analysis family
    * implies). Documents are augmented with deterministic synthetic PII
    * (email/phone/IP derived from doc_id) so redaction is actually
    * exercised; output hashes the scrubbed text and counts matches per
    * kind, all RE2/Java-regex-portable so the oracle recomputes both.
    */
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    // spread: the regexp_replace scrub chain is the per-row cost
    val aug = graft.GraftSession.spread(t(s, dir, "documents"))
      .withColumn("aug", concat(col("text"),
        lit(" Contact user"), col("doc_id"), lit("@example.com or +1 (555) 010-"),
        lpad(col("doc_id").cast("string"), 4, "0"),
        lit(" at 10.0."), pmod(col("doc_id"), lit(256)), lit(".7 now")))
    aug.select(col("doc_id"),
        md5(TextFunctions.scrubPii(col("aug"))).as("scrub_md5"),
        TextFunctions.piiCount(col("aug")).cast("long").as("n_pii"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic stratified sampling / data mixing: downsample the
    * dominant language strata (en 10%, zh 50%), keep the rest — the
    * reproducible-mix step of corpus assembly (operators/Mixing.scala).
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    graft.operators.Mixing.stratifiedSample(
        t(s, dir, "documents"), "lang", "doc_id",
        rates = Map("en" -> 10, "zh" -> 50))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  /** Temperature-based source mixing (XLM/mT5-style sampler,
    * operators/Mixing.temperatureMix): source proportions flattened by
    * n_i^alpha with a deterministic ppm hash membership; the oracle
    * recomputes the rate table and the membership in plain SQL.
    */
  def temperatureMix(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val target = docs.count() / 2
    graft.operators.Mixing.temperatureMix(docs, "lang", "doc_id",
        alpha = 0.5, targetRows = target)
      .groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("lang"))
  }

  /** Context-window sequence packing (the pretraining batcher step):
    * docs sharded by id, greedy-filled into 512-token packs in ascending
    * id order; the oracle replicates the same greedy walk with a
    * recursive CTE per shard (exactly the sequential semantics, bounded
    * to a 300-doc subset so the recursion stays shallow).
    */
  def seqPack(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").filter(col("doc_id") < 300)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
    graft.operators.Mixing.packSequences(d, "doc_id", "n_tok",
        budget = 512L, shards = 4)
      .orderBy(col("doc_id"))
  }

  /** Benchmark decontamination (n-gram-overlap rule): documents sharing
    * a 5-token shingle with the "benchmark" (docs 0-19 + a planted
    * near-copy set) are flagged with their overlap count. Drop-side
    * (decontaminate) is the anti-join of this set — pinned by the same
    * oracle arithmetic.
    */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val benchmark = docs.filter(col("doc_id") < 20)
    graft.operators.Dedup.contaminated(docs, "doc_id", "text",
        benchmark, "text", n = 5)
      .orderBy(col("doc_id"))
  }

  /** Hybrid full-text + dense search — the reference's flagship hybrid
    * shape (HybridSearch with a BM25 FunctionSchema output field as one
    * AnnSearchRequest and a dense vector as the other, RRF-ranked;
    * docs/user_guides/ hybrid search). Both sub-searches run over the
    * same id space (documents.doc_id ↔ embeddings.vec_id) and meet in
    * the standard RRF reducer — lexical recall + semantic recall in one
    * result list.
    */
  def hybridBm25Dense(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Metric
    import graft.operators.{Bm25, Fusion, VectorSearch}
    val model = Bm25.build(t(s, dir, "documents"), "doc_id", "text")
    val textHits = Bm25.search(model, "filter window stream", k = 20, roundTo = Some(4))
      .select(lit(0L).as("qid"), col("rank"), col("doc_id"))
    val emb = t(s, dir, "embeddings")
    val qs = emb.filter(col("vec_id") === 0)
      .select(lit(0L).as("qid"), col("embedding").as("qvec"))
    val denseHits = VectorSearch.topK(emb, "vec_id", "embedding", qs, "qid", "qvec",
        Metric.COSINE, k = 20, roundTo = Some(4))
      .select(col("qid"), col("rank"), col("vec_id").as("doc_id"))
    Fusion.rrf(Seq(textHits, denseHits), "qid", "doc_id", topK = 10)
      .select(col("rank"), round(col("_score"), 6).as("score"), col("doc_id"))
      .orderBy(col("rank"))
  }

  /** Overlapping document chunking (training-pipeline context-window
    * packing / retrieval splitting): 200-char chunks striding by 150
    * (50-char overlap). Emits md5 + length per chunk so the full chunk
    * geometry — count, boundaries, content — is pinned; the oracle
    * recomputes the stride arithmetic with a lateral range + substr.
    * Pure column math over [[TextFunctions.chunkStarts]]: map-only, no
    * shuffle, chunking 100 TB is exactly as parallel as scanning it.
    */
  def docChunk(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    d.select(col("doc_id"), col("text"),
        posexplode(TextFunctions.chunkStarts(col("text"), size = 200, overlap = 50))
          .as(Seq("chunk_id", "start")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        md5(col("text").substr(col("start") + 1, lit(200))).as("chunk_md5"),
        length(col("text").substr(col("start") + 1, lit(200))).cast("long").as("chunk_len"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Streaming content dedup (the ingest-path half of the dedup family):
    * the corpus streams in two micro-batches, each delivered twice (an
    * at-least-once WAL), and batch 2 additionally replays all of
    * batch 1 — in-batch replays and cross-batch replays must all
    * collapse to ONE surviving row per distinct content fingerprint via
    * [[graft.streaming.Streaming.contentDedupIngest]] state. Survivor
    * attribution is arrival-order-dependent, so the emitted rows are
    * fingerprint-level facts only (fp, copies=1) — deterministic by
    * construction; the oracle recomputes the distinct-fingerprint set.
    * Event times are bounded (`doc_id mod 600` seconds) so the
    * watermark never classifies a replay as late at any scale factor.
    */
  def streamDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import s.implicits._
    val base = LifecycleQueries.scratchDir("sdedup")
    val path = s"$base/data"
    val ck = s"$base/ck"
    val rows = t(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val (b1, b2) = rows.partition(_._1 % 2 == 0)
    // stateful stream: state-sized shuffle partitions (Streaming.stateScoped)
    implicit val sqlCtx = Streaming.stateScoped(s).sqlContext
    val input = MemoryStream[(Long, String)]
    input.addData(b1 ++ b1) // duplicated WAL delivery within the batch
    input.addData(b2 ++ b2 ++ b1) // + full cross-batch replay of b1
    val stream = input.toDF().toDF("doc_id", "text")
      .withColumn("ts_event",
        timestamp_seconds(lit(1700000000L) + pmod(col("doc_id"), lit(600))))
      .withColumn("fp", TextFunctions.fingerprint(col("text")))
    val deduped = Streaming.contentDedupIngest(stream, "fp", "ts_event", "1 hour")
    val q = Streaming.flushToParquet(deduped, path, ck)
    q.processAllAvailable()
    q.stop()
    s.read.parquet(path)
      .groupBy(col("fp")).agg(count(lit(1)).as("copies"))
      .orderBy(col("fp"))
  }

  /** Repetition filter (the Gopher-rules duplicate-n-gram family of
    * training-data quality signals): per document, the fraction of
    * word 2-grams and 3-grams that are repeats of an earlier occurrence
    * (1 − distinct/total), plus the flag a filtering pipeline would cut
    * on. Pure column math — tokenize, shingle, distinct-count — so the
    * pass stays map-only at corpus scale; the oracle recomputes the
    * shingles and ratios in SQL.
    */
  def repetition(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val toks = TextFunctions.tokenize(col("text"))
    // total shingle count is pure arithmetic (t−n+1, min 1 — matching
    // the under-n whole-doc shingle); the distinct count uses the fused
    // one-pass codegen'd shingle set. An interpreted HOF
    // transform+array_distinct chain here re-evaluates the tokenize
    // subtree per reference and ran ~25× slower (the q_minhash_lsh
    // round-1 lesson, BENCH_LOCAL.md).
    def dupFrac(n: Int) = {
      val total = greatest(size(toks) - (n - 1), lit(1)).cast("double")
      val distinct = size(TextFunctions.shingleSet(toks, n)).cast("double")
      round(lit(1.0) - distinct / total, 4)
    }
    d.select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        dupFrac(2).as("dup2"),
        dupFrac(3).as("dup3"))
      .withColumn("flagged", col("dup3") > 0.1)
      .orderBy(col("doc_id"))
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_repetition" -> (repetition _),
    "q_doc_chunk" -> (docChunk _),
    "q_stream_dedup" -> (streamDedup _),
    "q_hybrid_bm25_dense" -> (hybridBm25Dense _),
    "q_decontaminate" -> (decontaminate _),
    "q_pii_scrub" -> (piiScrub _),
    "q_stratified_sample" -> (stratifiedSample _),
    "q_temperature_mix" -> (temperatureMix _),
    "q_seq_pack" -> (seqPack _),
    "q_bm25" -> (bm25 _),
    "q_bm25_stream" -> (bm25Stream _),
    "q_bm25_multilang" -> (bm25Multilang _),
    "q_text_stats" -> (textStats _),
    "q_winnow_fingerprint" -> (winnowFingerprint _),
    "q_winnow_pairs" -> (winnowPairs _),
    "q_lang_id" -> (langId _),
    "q_quality_score" -> (qualityScore _),
    "q_dedup_fingerprint" -> (dedupFingerprint _),
    "q_jaccard_pairs" -> (jaccardPairs _),
    "q_embed_cosine_pairs" -> (embedCosinePairs _),
    "q_minhash_lsh" -> (minhashLsh _),
    "q_dedup_survivors" -> (dedupSurvivors _),
    "q_simhash_pairs" -> (simhashPairs _),
    "q_text_match" -> (textMatch _),
    "q_analyzer_chargroup" -> (analyzerCharGroup _),
    "q_analyzer_ngram" -> (analyzerNgram _),
    "q_analyzer_cjk" -> (analyzerCjk _),
    "q_analyzer_pinyin" -> (analyzerPinyin _),
    "q_analyzer_ja" -> (analyzerJa _),
    "q_analyzer_userdict" -> (analyzerUserdict _),
    "q_analyzer_thai" -> (analyzerThai _),
    "q_analyzer_icu" -> (analyzerIcu _),
    "q_analyzer_stem" -> (analyzerStem _)
  )

  /** 26 Han codepoints standing in for a-z in the CJK analyzer fixture
    * (shared between the Spark query and its DuckDB oracle).
    */
  private[queries] val HanAlphabet =
    "的一是不了人我在有他" +
    "这中大来上国个到说们" +
    "为子和你地出"

  private val langValues = TextFunctions.LangMarkers.toSeq.sortBy(_._1).map {
    case (lang, words) => s"('$lang', [${words.map(w => s"'$w'").mkString(",")}])"
  }.mkString(", ")

  def oracles: Map[String, String] = Map(
    "q_repetition" ->
      s"""WITH toks AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |g AS (
         |  SELECT doc_id, len(t) AS n_tokens,
         |    CASE WHEN len(t) < 2 THEN ['x']
         |         ELSE list_transform(range(1, len(t)),
         |                i -> t[i] || ' ' || t[i+1]) END AS g2,
         |    CASE WHEN len(t) < 3 THEN ['x']
         |         ELSE list_transform(range(1, len(t) - 1),
         |                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END AS g3
         |  FROM toks),
         |r AS (
         |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |    round(1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 4) AS dup2,
         |    round(1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3), 4) AS dup3
         |  FROM g)
         |SELECT doc_id, n_tokens, dup2, dup3, dup3 > 0.1 AS flagged
         |FROM r ORDER BY doc_id""".stripMargin,
    "q_doc_chunk" ->
      """SELECT d.doc_id, CAST(g.i // 150 AS BIGINT) AS chunk_id,
        |  md5(substr(d.text, CAST(g.i AS INTEGER) + 1, 200)) AS chunk_md5,
        |  CAST(length(substr(d.text, CAST(g.i AS INTEGER) + 1, 200)) AS BIGINT)
        |    AS chunk_len
        |FROM documents d, UNNEST(range(0, greatest(length(d.text), 1), 150)) AS g(i)
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "q_stream_dedup" ->
      s"""WITH f AS (
         |  SELECT DISTINCT md5(array_to_string($sqlToks, ' ')) AS fp
         |  FROM documents)
         |SELECT fp, CAST(1 AS BIGINT) AS copies FROM f ORDER BY fp""".stripMargin,
    "q_analyzer_pinyin" -> {
      // letter → (han, pinyin) VALUES built from the SAME tables the
      // Spark side uses (HanAlphabet + Analyzers.PinyinTable) — no drift
      val vals = HanAlphabet.zipWithIndex.map { case (h, i) =>
        s"('${('a' + i).toChar}','$h','${graft.functions.Analyzers.PinyinTable(h)}')"
      }.mkString(", ")
      s"""WITH ws AS (
         |  SELECT ROW_NUMBER() OVER () AS rid, w FROM (
         |    SELECT unnest(list_filter(string_split(
         |      regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' '),
         |      x -> x <> '')) AS w
         |    FROM documents WHERE lang = 'zh')),
         |m(ch, han, py) AS (VALUES $vals),
         |chars AS (
         |  SELECT ws.rid, g.i, substr(ws.w, CAST(g.i AS INT), 1) AS ch
         |  FROM ws, UNNEST(range(1, length(ws.w) + 1)) AS g(i)),
         |perword AS (
         |  SELECT c.rid,
         |    string_agg(m.han, '' ORDER BY c.i) AS hanw,
         |    list(m.py ORDER BY c.i) AS sylls,
         |    string_agg(m.py, '' ORDER BY c.i) AS joinedw
         |  FROM chars c JOIN m ON c.ch = m.ch GROUP BY c.rid),
         |terms AS (
         |  SELECT hanw AS term FROM perword
         |  UNION ALL SELECT unnest(sylls) FROM perword
         |  UNION ALL SELECT joinedw FROM perword
         |  UNION ALL SELECT unnest(list_transform(sylls, s -> substr(s, 1, 1)))
         |    FROM perword)
         |SELECT term, count(*) AS cnt FROM terms GROUP BY term
         |ORDER BY cnt DESC, term LIMIT 30""".stripMargin
    },
    "q_analyzer_thai" -> sentenceOracle(ThaiTokens),
    "q_analyzer_userdict" -> sentenceOracle(UserDictTokens),
    "q_analyzer_icu" -> sentenceOracle(IcuTokens),
    "q_analyzer_stem" -> sentenceOracle(StemTokens),
    "q_analyzer_ja" ->
      s"""WITH src AS (
        |  SELECT translate(regexp_replace(text, '[^a-z ]', '', 'g'),
        |    'abcdefghijklmnopqrstuvwxyz', '$JaAlphabet') AS t
        |  FROM documents WHERE lang = 'zh'),
        |hanruns AS (SELECT unnest(regexp_extract_all(t, '[$JaHan]+')) AS run FROM src),
        |hantoks AS (
        |  SELECT unnest(list_concat(
        |    list_transform(range(1, length(run) + 1), i -> substr(run, CAST(i AS INT), 1)),
        |    CASE WHEN length(run) > 1
        |      THEN list_transform(range(1, length(run)), i -> substr(run, CAST(i AS INT), 2))
        |      ELSE CAST([] AS VARCHAR[]) END)) AS term
        |  FROM hanruns WHERE run <> ''),
        |kana AS (SELECT unnest(regexp_extract_all(t, '[$JaHira]+')) AS term FROM src),
        |toks AS (SELECT term FROM hantoks
        |         UNION ALL SELECT term FROM kana WHERE term <> '')
        |SELECT term, count(*) AS cnt FROM toks GROUP BY term
        |ORDER BY cnt DESC, term LIMIT 30""".stripMargin,
    "q_analyzer_cjk" ->
      s"""WITH runs AS (
        |  SELECT unnest(string_split(translate(regexp_replace(text, '[^a-z ]', '', 'g'),
        |    'abcdefghijklmnopqrstuvwxyz', '$HanAlphabet'), ' ')) AS run
        |  FROM documents WHERE lang = 'zh'),
        |toks AS (
        |  SELECT unnest(list_concat(
        |    list_transform(range(1, length(run) + 1), i -> substr(run, CAST(i AS INT), 1)),
        |    CASE WHEN length(run) > 1
        |      THEN list_transform(range(1, length(run)), i -> substr(run, CAST(i AS INT), 2))
        |      ELSE CAST([] AS VARCHAR[]) END)) AS term
        |  FROM runs WHERE run <> '')
        |SELECT term, count(*) AS cnt FROM toks GROUP BY term
        |ORDER BY cnt DESC, term LIMIT 30""".stripMargin,
    "q_decontaminate" ->
      s"""WITH toks AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) < 5
         |         THEN [array_to_string(t, ' ')]
         |         ELSE [array_to_string(t[i:i+4], ' ')
         |               for i in generate_series(1, len(t) - 4)] END) AS s
         |       FROM toks),
         |bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id < 20),
         |hits AS (SELECT doc_id, unnest(s) AS g FROM sh)
         |SELECT h.doc_id, count(*) AS n_hits
         |FROM hits h JOIN bench b ON h.g = b.g
         |GROUP BY h.doc_id ORDER BY h.doc_id""".stripMargin,
    "q_pii_scrub" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    text || ' Contact user' || CAST(doc_id AS VARCHAR)
        |      || '@example.com or +1 (555) 010-'
        |      || lpad(CAST(doc_id AS VARCHAR), 4, '0')
        |      || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 now' AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |      '([0-9]{1,3}\.){3}[0-9]{1,3}', '[IPV4]', 'g'),
        |      '\+?[0-9][0-9 ()./-]{5,}[0-9]', '[PHONE]', 'g')) AS scrub_md5,
        |  len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |  + len(regexp_extract_all(aug, '([0-9]{1,3}\.){3}[0-9]{1,3}'))
        |  + len(regexp_extract_all(aug, '\+?[0-9][0-9 ()./-]{5,}[0-9]')) AS n_pii
        |FROM aug ORDER BY doc_id""".stripMargin,
    "q_seq_pack" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, len($sqlToks) AS n_tok,
         |    doc_id % 4 AS shard,
         |    row_number() OVER (PARTITION BY doc_id % 4 ORDER BY doc_id) AS rn
         |  FROM documents WHERE doc_id < 300),
         |walk(shard, rn, doc_id, pack_idx, acc) AS (
         |  SELECT shard, rn, doc_id, CAST(0 AS BIGINT), n_tok
         |  FROM d WHERE rn = 1
         |  UNION ALL
         |  SELECT d.shard, d.rn, d.doc_id,
         |    CASE WHEN w.acc + d.n_tok > 512 THEN w.pack_idx + 1 ELSE w.pack_idx END,
         |    CASE WHEN w.acc + d.n_tok > 512 THEN d.n_tok ELSE w.acc + d.n_tok END
         |  FROM walk w JOIN d ON d.shard = w.shard AND d.rn = w.rn + 1)
         |SELECT doc_id, shard, pack_idx FROM walk ORDER BY doc_id""".stripMargin,
    // rate derivation mirrors Mixing.temperatureMix EXACTLY: p_i =
    // sqrt(n_i)/Z, ppm_i = min(1e6, floor(target·p_i/n_i·1e6)), target
    // = corpus//2; membership is the same Knuth hash at ppm granularity
    "q_temperature_mix" ->
      """WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |z AS (SELECT sum(power(n, 0.5)) AS z,
        |             (SELECT count(*) // 2 FROM documents) AS target FROM n),
        |r AS (SELECT n.lang, CAST(least(1000000,
        |        floor(z.target * (power(n.n, 0.5) / z.z) / n.n * 1000000))
        |        AS BIGINT) AS ppm
        |      FROM n, z)
        |SELECT d.lang, count(*) AS cnt
        |FROM documents d JOIN r ON d.lang = r.lang
        |WHERE (((d.doc_id % 1000000007) * 2654435761 % 1000000007)
        |        % 1000000 + 1000000) % 1000000 < r.ppm
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "q_stratified_sample" ->
      """SELECT lang, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE (((doc_id % 1000000007) * 2654435761 % 1000000007) % 100 + 100) % 100 <
        |      CASE lang WHEN 'en' THEN 10 WHEN 'zh' THEN 50 ELSE 100 END
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // same polynomial: pows = 257^(4-j) mod 2^31-1 = [67503107, 16974593, 66049, 257, 1]
    "q_winnow_fingerprint" ->
      """WITH c AS (SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS txt
        |           FROM documents),
        |h AS (SELECT doc_id,
        |        list_transform(range(1, length(txt)-5+2), i ->
        |          (ascii(substr(txt,i::INT,1))::BIGINT*67503107 % 2147483647
        |         + ascii(substr(txt,(i+1)::INT,1))::BIGINT*16974593 % 2147483647
        |         + ascii(substr(txt,(i+2)::INT,1))::BIGINT*66049 % 2147483647
        |         + ascii(substr(txt,(i+3)::INT,1))::BIGINT*257 % 2147483647
        |         + ascii(substr(txt,(i+4)::INT,1))::BIGINT) % 2147483647) AS hashes
        |      FROM c WHERE length(txt) >= 5),
        |m AS (SELECT doc_id, CASE WHEN len(hashes) >= 4 THEN
        |        list_transform(range(1, len(hashes)-4+2), i -> list_aggregate(hashes[i:i+3], 'min'))
        |      ELSE [list_aggregate(hashes, 'min')] END AS mins
        |      FROM h),
        |f AS (SELECT doc_id, unnest(list_sort(list_distinct(mins))) AS fp FROM m)
        |SELECT doc_id, fp FROM f ORDER BY doc_id, fp""".stripMargin,
    "q_winnow_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 300
        |  UNION ALL
        |  SELECT doc_id + 10000, substring(text, 1, CAST(floor(length(text)*0.8) AS INT))
        |  FROM documents WHERE doc_id < 300),
        |c AS (SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS txt
        |      FROM corpus),
        |h AS (SELECT doc_id,
        |        list_transform(range(1, length(txt)-5+2), i ->
        |          (ascii(substr(txt,i::INT,1))::BIGINT*67503107 % 2147483647
        |         + ascii(substr(txt,(i+1)::INT,1))::BIGINT*16974593 % 2147483647
        |         + ascii(substr(txt,(i+2)::INT,1))::BIGINT*66049 % 2147483647
        |         + ascii(substr(txt,(i+3)::INT,1))::BIGINT*257 % 2147483647
        |         + ascii(substr(txt,(i+4)::INT,1))::BIGINT) % 2147483647) AS hashes
        |      FROM c WHERE length(txt) >= 5),
        |m AS (SELECT doc_id, CASE WHEN len(hashes) >= 4 THEN
        |        list_transform(range(1, len(hashes)-4+2), i -> list_aggregate(hashes[i:i+3], 'min'))
        |      ELSE [list_aggregate(hashes, 'min')] END AS mins
        |      FROM h),
        |f AS (SELECT doc_id, unnest(list_sort(list_distinct(mins))) AS fp FROM m),
        |rare AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= 1000),
        |ff AS (SELECT f.doc_id, f.fp FROM f JOIN rare USING (fp)),
        |sizes AS (SELECT doc_id, count(*) AS nfp FROM ff GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |          FROM ff a JOIN ff b USING (fp) WHERE a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT id_a, id_b, shared,
        |  round(shared * 1.0 / least(sa.nfp, sb.nfp), 4) AS overlap
        |FROM pairs JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
        |WHERE shared * 1.0 / least(sa.nfp, sb.nfp) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q_hybrid_bm25_dense" ->
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
         |tr AS (SELECT doc_id,
         |         row_number() OVER (ORDER BY round(score, 4) DESC, doc_id) AS rank
         |       FROM s),
         |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0),
         |d AS (SELECT e.vec_id AS doc_id,
         |        round(list_cosine_similarity(qv.qvec, CAST(e.embedding AS DOUBLE[])), 4) AS score
         |      FROM qv CROSS JOIN embeddings e),
         |dr AS (SELECT doc_id,
         |         row_number() OVER (ORDER BY score DESC, doc_id) AS rank
         |       FROM d),
         |u AS (SELECT doc_id, 1.0 / (60 + rank) AS part FROM tr WHERE rank <= 20
         |      UNION ALL
         |      SELECT doc_id, 1.0 / (60 + rank) AS part FROM dr WHERE rank <= 20),
         |f AS (SELECT doc_id, sum(part) AS sc FROM u GROUP BY doc_id),
         |rr AS (SELECT doc_id, sc,
         |         row_number() OVER (ORDER BY sc DESC, doc_id) AS rank
         |       FROM f)
         |SELECT rank, round(sc, 6) AS score, doc_id FROM rr WHERE rank <= 10
         |ORDER BY rank""".stripMargin,
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
    "q_bm25_stream" ->
      s"""WITH toks AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |dt AS (SELECT doc_id, len(t) * 1.0 AS dl, unnest(t) AS term FROM toks),
         |tf AS (SELECT doc_id, term, count(*) * 1.0 AS tf, any_value(dl) AS dl
         |       FROM dt GROUP BY doc_id, term),
         |stats AS (SELECT term, count(*) * 1.0 AS df FROM tf GROUP BY term),
         |g AS (SELECT count(*) * 1.0 AS n, avg(len(t) * 1.0) AS avgdl FROM toks),
         |q(term) AS (VALUES ('merge'), ('batch'), ('key')),
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
    "q_bm25_multilang" ->
      s"""WITH toks AS (SELECT doc_id,
         |         CASE WHEN lang = 'de'
         |           THEN list_filter(string_split_regex(lower(text), '[ .,]+'), x -> x <> '')
         |           ELSE $sqlToks END AS t
         |       FROM documents),
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
         | len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]+')) AS bpe_cnt,
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
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |planted AS (SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings) AS vec_id,
        |    [v[i] + 0.02 * (CASE WHEN i = len(v) THEN v[1] ELSE v[i+1] END)
        |     for i in generate_series(1, len(v))] AS v
        |  FROM base),
        |e AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.v, b.v), 4) AS cosine
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.98
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_survivors" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' appended' FROM documents WHERE doc_id < 100),
         |toks AS (SELECT doc_id, $sqlToks AS t FROM d),
         |sh AS (SELECT doc_id, CASE WHEN len(t) < 3
         |         THEN [array_to_string(t, ' ')]
         |         ELSE [array_to_string(t[i:i+2], ' ') for i in generate_series(1, len(t) - 2)]
         |       END AS s FROM toks),
         |ds AS (SELECT doc_id, list_distinct(s) AS s FROM sh),
         |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |       FROM ds a JOIN ds b ON a.doc_id < b.doc_id
         |       WHERE round(len(list_intersect(a.s, b.s)) * 1.0 /
         |             len(list_distinct(list_concat(a.s, b.s))), 4) >= 0.8),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pr
         |          UNION ALL SELECT id_b, id_a FROM pr),
         |reach AS (
         |  SELECT a AS id, a AS r FROM edges
         |  UNION
         |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id),
         |comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
         |losers AS (SELECT id FROM comp WHERE comp < id)
         |SELECT doc_id, text FROM d
         |WHERE doc_id NOT IN (SELECT id FROM losers)
         |ORDER BY doc_id""".stripMargin,
    "q_minhash_lsh" ->
      s"""WITH d AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' appended' FROM documents WHERE doc_id < 100),
         |toks AS (SELECT doc_id, $sqlToks AS t FROM d),
         |sh AS (SELECT doc_id, CASE WHEN len(t) < 3
         |         THEN [array_to_string(t, ' ')]
         |         ELSE [array_to_string(t[i:i+2], ' ') for i in generate_series(1, len(t) - 2)]
         |       END AS s FROM toks),
         |ds AS (SELECT doc_id, list_distinct(s) AS s FROM sh),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |        round(len(list_intersect(a.s, b.s)) * 1.0 /
         |              len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
         |      FROM ds a JOIN ds b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,
    "q_simhash_pairs" ->
      s"""WITH d AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' zzz' FROM documents WHERE doc_id < 100),
         |toks AS (SELECT doc_id, list_distinct($sqlToks) AS t FROM d),
         |th AS (SELECT doc_id, unnest(t) AS tok FROM toks),
         |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM th),
         |bits AS (SELECT unnest(generate_series(0, 59)) AS j),
         |votes AS (SELECT doc_id, j,
         |            sum(CASE WHEN ((hv >> j) & 1) = 1 THEN 1 ELSE -1 END) AS v
         |          FROM h CROSS JOIN bits GROUP BY doc_id, j),
         |sig0 AS (SELECT doc_id,
         |           CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS sim
         |         FROM votes GROUP BY doc_id),
         |sig AS (SELECT t.doc_id, coalesce(s.sim, 0) AS sim
         |        FROM toks t LEFT JOIN sig0 s ON t.doc_id = s.doc_id)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sim, b.sim)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,
    "q_text_match" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE len(list_intersect(
        |        list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''),
        |        ['filter', 'window'])) >= 2
        |  AND (' ' || array_to_string(
        |        list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''),
        |        ' ') || ' ') LIKE '% the fast %'
        |ORDER BY doc_id""".stripMargin,
    "q_analyzer_chargroup" ->
      """WITH raw AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '[ .,;:!?]+')) AS t0
        |  FROM documents),
        |f AS (SELECT DISTINCT doc_id, lower(t0) AS term FROM raw
        |      WHERE t0 <> '' AND len(t0) <= 8
        |        AND lower(t0) NOT IN ('the','and','of','to','in','is'))
        |SELECT term, count(*) AS df FROM f GROUP BY term
        |ORDER BY df DESC, term LIMIT 20""".stripMargin,
    "q_analyzer_ngram" ->
      """WITH g AS (
        |  SELECT unnest(list_transform(generate_series(1, len(text) - 2),
        |           i -> lower(substr(text, i, 3)))) AS gram
        |  FROM documents WHERE doc_id < 50)
        |SELECT gram, count(*) AS cnt FROM g GROUP BY gram
        |ORDER BY cnt DESC, gram LIMIT 15""".stripMargin
  )
}
