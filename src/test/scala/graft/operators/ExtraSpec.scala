package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expr.ExprCompiler
import graft.functions.{SparseFunctions, TextFunctions}

class ExtraSpec extends SparkSpec {
  import spark.implicits._

  test("sparse term freqs + dot product") {
    val df = Seq("a b a c", "b b d").toDF("text")
      .withColumn("tf", SparseFunctions.termFreqs(TextFunctions.tokenize(col("text"))))
    val scores = df
      .select(SparseFunctions.sparseDotLiteral(col("tf"),
        Map("a" -> 2.0, "b" -> 1.0, "z" -> 5.0)).as("s"))
      .as[Double].collect()
    assert(scores.toSeq == Seq(2 * 2.0 + 1.0, 2.0)) // a:2,b:1 | b:2
    val dot = df.withColumn("q",
        map_from_arrays(array(lit("b"), lit("z")), array(lit(3.0), lit(1.0))))
      .select(SparseFunctions.sparseDot(col("tf"), col("q")).as("d"))
      .as[Double].collect()
    assert(dot.toSeq == Seq(3.0, 6.0))
  }

  test("multimodal payload features are exact and deterministic") {
    val df = Seq((1L, "abcdefghij"), (2L, "x")).toDF("doc_id", "text")
    val out = MultiModal
      .extractFeatures(MultiModal.attachPayload(df, "doc_id", "text"), "doc_id", stride = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    // "abcdefghij": bytes 97..106; sampled at 0,4,8 -> 97+101+105
    assert(out(0) == ((1L, 10L, 3L, 97L, 97L + 101L + 105L)))
    assert(out(1) == ((2L, 1L, 1L, 120L, 120L)))
  }

  test("highlight wraps whole-word matches only") {
    val got = Seq("vector vectors Vector!").toDF("t")
      .select(TextFunctions.highlight(col("t"), Seq("vector")).as("h"))
      .as[String].head()
    assert(got == "<em>vector</em> vectors <em>Vector</em>!")
  }

  test("highlightWith tokenizes with the declared analyzer") {
    def mark(text: String, params: Map[String, String], q: String): String =
      Seq(text).toDF("t")
        .select(TextFunctions.highlightWith(col("t"), params, q).as("h"))
        .as[String].head()
    // char_group: boundaries are the DECLARED delims — "-" binds,
    // periods split; lowercase filter makes the match case-insensitive
    assert(mark("Filter.window filter-x x filter",
        Map("tokenizer" -> "char_group", "delims" -> " .,",
          "filters" -> "lowercase"), "FILTER") ==
      "<em>Filter</em>.window filter-x x <em>filter</em>")
    // whitespace without lowercase is case-SENSITIVE and binds punctuation
    assert(mark("Filter filter filter.", Map("tokenizer" -> "whitespace"),
        "filter") ==
      "Filter <em>filter</em> filter.")
    // standard: alphanumeric token runs, case-insensitive; adjacent
    // matches each wrap (the boundary is never consumed)
    assert(mark("a,a a", Map.empty, "A") ==
      "<em>a</em>,<em>a</em> <em>a</em>")
    // synonym expansion on the query side highlights the expansions too
    assert(mark("car and automobile", Map("tokenizer" -> "char_group",
        "delims" -> " ", "filters" -> "synonym",
        "synonyms" -> "car:automobile"), "car") ==
      "<em>car</em> and <em>automobile</em>")
    // span-less tokenizers are rejected by name
    val e = intercept[IllegalArgumentException] {
      mark("abc", Map("tokenizer" -> "ngram", "min_gram" -> "2",
        "max_gram" -> "2"), "ab")
    }
    assert(e.getMessage.contains("ngram"))
    // multi-analyzer: the name column picks the pipeline per row
    val rows = Seq(("de", "Stream x"), ("en", "Stream x"))
      .toDF("lang", "t")
      .select(col("lang"), TextFunctions.highlightByAnalyzer(col("t"),
        col("lang"),
        Map("default" -> Map.empty[String, String],
          "de" -> Map("tokenizer" -> "whitespace")),
        "stream x").as("h"))
      .orderBy("lang").as[(String, String)].collect()
    assert(rows(0) == (("de", "Stream <em>x</em>")), rows(0)) // case-sensitive
    assert(rows(1) == (("en", "<em>Stream</em> <em>x</em>")), rows(1))
  }

  test("highlight fragments reproduce the reference option matrix") {
    // the reference fixture's two water docs
    // (test_milvus_client_highlighter.py:236-420)
    val d1 = "Must be water."
    val d2 = "I have the seat full of water! Like, full of water!"
    def frags(text: String, q: String, pre: Seq[String], post: Seq[String],
        offset: Int, size: Int, num: Int): Seq[String] =
      Seq(text).toDF("t")
        .select(TextFunctions.highlightFragmentsWith(col("t"), Map.empty, q,
          pre, post, offset, size, num).as("f"))
        .head().getSeq[String](0).toSeq
    // basic: fragment_size=10, num=1
    assert(frags(d1, "water", Seq("<<<<<<<"), Seq(">>>>>>"), 0, 10, 1) ==
      Seq("<<<<<<<water>>>>>>."))
    assert(frags(d2, "water", Seq("<<<<<<<"), Seq(">>>>>>"), 0, 10, 1) ==
      Seq("<<<<<<<water>>>>>>! Lik"))
    // fragment parameter matrix (size x num)
    assert(frags(d2, "water", Seq("{"), Seq("}"), 0, 1, 0) == Nil)
    assert(frags(d2, "water", Seq("{"), Seq("}"), 0, 1, 1) == Seq("{water}"))
    assert(frags(d2, "water", Seq("{"), Seq("}"), 0, 1, 2) ==
      Seq("{water}", "{water}"))
    assert(frags(d1, "water", Seq("{"), Seq("}"), 0, 9, 1) == Seq("{water}."))
    assert(frags(d2, "water", Seq("{"), Seq("}"), 0, 9, 2) ==
      Seq("{water}! Li", "{water}!"))
    // size=100 merges every match of the doc into ONE fragment
    assert(frags(d2, "water", Seq("{"), Seq("}"), 0, 100, 2) ==
      Seq("{water}! Like, full of {water}!"))
    // fragment_offset: leading context, clamped to the doc start; an
    // already-consumed match in a later fragment's context is untagged
    assert(frags(d2, "water", Seq("="), Seq("="), 5, 5, 2) ==
      Seq("l of =water=", "l of =water="))
    assert(frags(d1, "water", Seq("="), Seq("="), 100, 5, 2) ==
      Seq("Must be =water="))
    assert(frags(d2, "water", Seq("="), Seq("="), 100, 5, 2) ==
      Seq("I have the seat full of =water=",
        "I have the seat full of water! Like, full of =water="))
    // multiple tag pairs cycle by GLOBAL match ordinal
    val keys = (1 to 8).map(_ => "key").mkString(" ")
    assert(frags(keys, "key", Seq("{", "<", "="), Seq("}", ">", "="), 0, 100, 1) ==
      Seq("{key} <key> =key= {key} <key> =key= {key} <key>"))
  }

  test("CJK (jieba) highlight merges overlapping uni+bigram spans (:703,:751)") {
    // the reference's Chinese highlighter fixture docs
    // (test_milvus_client_highlighter.py:168,:203)
    def mark(text: String, q: String): String = Seq(text).toDF("t")
      .select(TextFunctions.highlightWith(col("t"),
        Map("tokenizer" -> "jieba"), q, "{", "}").as("h"))
      .as[String].head()
    // :703 — a single-character query wraps just that character
    assert(mark("A B C D 一二三四 milvus结巴分词器中文测试", "二") ==
      "A B C D 一{二}三四 milvus结巴分词器中文测试")
    // :727-747 — a multi-character query's overlapping unigram/bigram
    // hits merge into ONE tag pair, not five nested marks
    assert(mark("A B C D 一二三四 milvus结巴分词器中文测试", "结巴分词器") ==
      "A B C D 一二三四 milvus{结巴分词器}中文测试")
    // :751 — long text: the isolated unigram hit (呼 inside 呼应) tags
    // alone; the full phrase merges; fragment order = match ordinal
    val long = "黄昏降临在静谧城镇，灯影沿着街道缓缓铺展。青年林舟怀着不安在巷道行走，" +
      "心跳与脚步相互呼应。他渴望找到方向，却被往昔失落缠绕。" +
      "残破遗迹映入眼帘，石壁布满岁月痕迹。踏入其内，柔亮光点缓缓旋转，如同呼吸般起伏。"
    val frags = Seq(long).toDF("t")
      .select(TextFunctions.highlightFragmentsWith(col("t"),
        Map("tokenizer" -> "jieba"), "如同呼吸般起伏",
        Seq("{"), Seq("}"), 0, 1, 10).as("f"))
      .head().getSeq[String](0).toSeq
    assert(frags == Seq("{呼}", "{如同呼吸般起伏}"), frags)
    // mixed latin+CJK query: latin tokens match as standard word tokens,
    // case-insensitively; classes tag separately (no cross-class merge)
    assert(mark("milvus结巴分词器 and Milvus again", "milvus结巴") ==
      "{milvus}{结巴}分词器 and {Milvus} again")
    // a latin hit inside a longer word does NOT tag (word boundaries)
    assert(mark("key keyword 键", "key 键") == "{key} keyword {键}")
    // dict-mode jieba (the reference fixture declares
    // dict ["结巴分词器"], :62): a multi-char dict token matches
    // longest-first; its characters still merge with neighboring hits
    val dictParams = Map("tokenizer" -> "jieba", "dict" -> "结巴分词器")
    def markDict(text: String, q: String): String = Seq(text).toDF("t")
      .select(TextFunctions.highlightWith(col("t"), dictParams, q, "{", "}").as("h"))
      .as[String].head()
    assert(markDict("milvus结巴分词器中文测试", "结巴分词器") ==
      "milvus{结巴分词器}中文测试")
    // tag-pair cycling by match ordinal over repeating CJK text (:931's
    // 甲乙丙 fixture shape)
    val cyc = Seq("甲，甲乙，甲乙丙").toDF("t")
      .select(TextFunctions.highlightFragmentsWith(col("t"),
        Map("tokenizer" -> "jieba"), "甲乙",
        Seq("{", "<"), Seq("}", ">"), 0, 100, 1).as("f"))
      .head().getSeq[String](0).toSeq
    assert(cyc == Seq("{甲}，<甲乙>，{甲乙}丙"), cyc)
  }

  test("phrase_match slop semantics") {
    val df = Seq("a x b", "a b", "b a", "a x y b").toDF("text")
    def matches(e: String) =
      df.filter(ExprCompiler.compile(e, df)).as[String].collect().toSet
    assert(matches("phrase_match(text, 'a b')") == Set("a b"))
    assert(matches("phrase_match(text, 'a b', 1)") == Set("a b", "a x b"))
    assert(matches("phrase_match(text, 'a b', 2)") == Set("a b", "a x b", "a x y b"))
  }

  test("inverted index lookup intersects posting lists") {
    val df = Seq((1L, "a b c"), (2L, "a c"), (3L, "b"), (4L, "a b"))
      .toDF("id", "text")
    val idx = InvertedIndex.buildTokenIndex(df, "id",
      TextFunctions.tokenize(col("text")))
    def ids(terms: String*) =
      InvertedIndex.lookupAll(idx, terms).as[Long].collect().sorted.toSeq
    assert(ids("a", "b") == Seq(1L, 4L))
    assert(ids("a") == Seq(1L, 2L, 4L))
    assert(ids("a", "zzz") == Seq()) // missing term → empty intersection
  }

  test("struct sub-field inverted index agrees with the plain element filter") {
    // the reference's struct_array_subfield_index_consistency contract:
    // an INVERTED index built over the projected sub-field arrays must
    // answer exactly like the unindexed element predicate
    val df = Seq(
      (1L, Seq((10L, "qa"), (5L, "dev"))),
      (2L, Seq((12L, "ops"))),
      (3L, Seq((1L, "qa"), (2L, "qa"))),
      (4L, Seq.empty[(Long, String)]))
      .toDF("id", "raw")
      .select(col("id"), transform(col("raw"), e =>
        struct(e.getField("_1").as("rank"), e.getField("_2").as("tag"))).as("events"))
    // the index column IS the grammar's projection events[tag]
    val proj = ExprCompiler.compile("events[tag]", df)
    val idx = InvertedIndex.buildTokenIndex(df, "id", proj)
    for (term <- Seq("qa", "ops", "missing")) {
      val viaIdx = InvertedIndex.lookupAll(idx, Seq(term))
        .as[Long].collect().sorted.toSeq
      val plain = df.filter(ExprCompiler.compile(
          s"""match_any(events, $$[tag] == "$term")""", df))
        .select("id").as[Long].collect().sorted.toSeq
      assert(viaIdx == plain, s"index/plain divergence on '$term'")
    }
  }

  test("pair-table index answers identically to the postings-array index") {
    val df = Seq((1L, "a b c b"), (2L, "a c"), (3L, "b"), (4L, "a b"))
      .toDF("id", "text")
    val arrIdx = InvertedIndex.buildTokenIndex(df, "id",
      TextFunctions.tokenize(col("text")))
    val pairIdx = InvertedIndex.buildTokenPairs(df, "id",
      array_distinct(TextFunctions.tokenize(col("text"))))
    for (terms <- Seq(Seq("a", "b"), Seq("b"), Seq("a", "zzz"), Seq("a", "a", "c"))) {
      val viaArr = InvertedIndex.lookupAll(arrIdx, terms).as[Long].collect().sorted.toSeq
      val viaPairs = InvertedIndex.lookupAllPairs(pairIdx, terms)
        .as[Long].collect().sorted.toSeq
      assert(viaArr == viaPairs, s"divergence on $terms")
    }
  }

  test("positional phrase index matches adjacency incl. repeated terms") {
    val df = Seq(
      (1L, "a b c d"), (2L, "b a c"), (3L, "x a b y"), (4L, "a x b"),
      (5L, "a b a b"), (6L, "b b b"))
      .toDF("id", "text")
    val idx = InvertedIndex.buildPositionalIndex(df, "id",
      TextFunctions.tokenize(col("text")))
    def ids(terms: String*) =
      InvertedIndex.phraseSearch(idx, terms).as[Long].collect().sorted.toSeq
    assert(ids("a", "b") == Seq(1L, 3L, 5L))
    assert(ids("a", "b", "a") == Seq(5L))   // repeated term in phrase
    assert(ids("b", "b") == Seq(6L))        // doc 5's b's (pos 1,3) are not adjacent
    assert(ids("c", "d") == Seq(1L))
    assert(ids("d") == Seq(1L))             // single term
    assert(ids("a", "z") == Seq())
  }

  test("model rerank orders by deterministic cross-encoder score") {
    val hits = Seq((0L, 1L, "x y"), (0L, 2L, "x y z"), (0L, 3L, "q"))
      .toDF("qid", "doc_id", "text")
    val got = Fusion.modelRerank(hits, "x y z", "text", "qid", "doc_id", 2)
      .select("doc_id", "rank").as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 1L), (1L, 2L)))
  }

  test("binary vector pack/hamming/jaccard") {
    import graft.functions.BinaryVector
    // 65 dims → 2 words; sign pattern differs in exactly 3 positions
    val a = Array.fill(65)(1.0f)
    val b = a.clone(); b(0) = -1f; b(63) = -1f; b(64) = -1f
    val df = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(BinaryVector.binarize(col("a")).as("pa"),
        BinaryVector.binarize(col("b")).as("pb"))
    val (ham, jac) = df.select(
        BinaryVector.hamming(col("pa"), col("pb")),
        BinaryVector.jaccardBinary(col("pa"), col("pb")))
      .as[(Long, Double)].head()
    assert(ham == 3L)
    assert(math.abs(jac - 62.0 / 65.0) < 1e-12)
    // packing is faithful: 65 ones → words (all-ones-64, 1)
    val words = df.select($"pa").as[Seq[Long]].head()
    assert(words == Seq(-1L, 1L))
  }

  test("ngram index multi-LIKE equals full-scan LIKE conjunction") {
    val docs = Seq(
      (1L, "the vector stream flows"),
      (2L, "a vector without the other word"),
      (3L, "streaming tables, no v-word"),
      (4L, "Vector STREAM mixed case"), // case-sensitive refine must drop this
      (5L, "xy") // shorter than a gram
    ).toDF("doc_id", "text")
    val index = NgramIndex.build(docs, "doc_id", "text", n = 3)
    val viaIndex = NgramIndex.likeSearch(docs, "doc_id", "text", index,
      Seq("ector", "stream")).select("doc_id").as[Long].collect().toSet
    val fullScan = docs.filter(col("text").contains("ector") && col("text").contains("stream"))
      .select("doc_id").as[Long].collect().toSet
    assert(viaIndex == fullScan && fullScan == Set(1L))
    // short patterns fall back to the full scan rather than mis-pruning
    val short = NgramIndex.likeSearch(docs, "doc_id", "text", index, Seq("xy"))
      .select("doc_id").as[Long].collect().toSet
    assert(short == Set(5L))
  }

  test("search facets bucket hits with bounded top_hits") {
    val hits = Seq(
      (0L, 1, 0.9, 10L), (0L, 1, 0.8, 11L), (0L, 2, 0.7, 12L),
      (1L, 1, 0.95, 13L), (1L, 2, 0.6, 14L), (1L, 2, 0.65, 15L))
      .toDF("qid", "label", "_score", "vec_id")
    val got = SearchAgg.facets(hits, Seq("label"), "_score", "vec_id", topHits = 2)
      .orderBy("label")
      .select("label", "doc_count", "best_score", "top_hit_ids")
      .as[(Int, Long, Double, Seq[Long])].collect()
    assert(got(0) == ((1, 3L, 0.95, Seq(13L, 10L))))
    assert(got(1) == ((2, 3L, 0.7, Seq(12L, 15L))))
  }
}
