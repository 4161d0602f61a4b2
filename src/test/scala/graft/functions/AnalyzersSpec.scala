package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Analyzers._

class AnalyzersSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String, tok: Tokenizer, fs: Seq[Filter] = Nil): Seq[String] =
    Seq(text).toDF("t")
      .select(analyze(col("t"), tok, fs).as("toks"))
      .as[Seq[String]].head()

  test("standard tokenizer lowercases and splits on non-alnum") {
    assert(run("Hello, World-42!", Standard) == Seq("hello", "world", "42"))
  }

  test("whitespace tokenizer preserves case and punctuation") {
    assert(run("Hello,  World-42!", Whitespace) == Seq("Hello,", "World-42!"))
  }

  test("keyword tokenizer emits the whole value") {
    assert(run("Hello World", Keyword) == Seq("Hello World"))
  }

  test("ngram tokenizer emits all grams in [min,max], in n order") {
    assert(run("abcd", Ngram(3, 4)) == Seq("abc", "bcd", "abcd"))
    assert(run("ab", Ngram(3, 4)) == Seq.empty) // shorter than minGram
  }

  test("char_group splits on the delimiter set (regex metachars escaped)") {
    assert(run("a.b|c d", CharGroup(Seq('.', '|', ' '))) == Seq("a", "b", "c", "d"))
  }

  test("filters apply in order: lowercase, stop, max_length, alphanumonly") {
    val got = run("The QUICK brown-fox extraordinarily runs", Whitespace,
      Seq(Lowercase, Stop(Seq("the")), MaxLength(14), AlphaNumOnly))
    assert(got == Seq("quick", "runs")) // "brown-fox" non-alnum, long word dropped
  }

  test("stemmer filter porter-stems the token stream") {
    assert(run("ponies plastered generalizations", Whitespace,
      Seq(Lowercase, Stem("english"))) == Seq("poni", "plaster", "gener"))
    intercept[IllegalArgumentException] {
      run("x y", Whitespace, Seq(Stem("german")))
    }
  }

  test("removepunct drops tokens containing ANY punctuation") {
    assert(run("ok don't fine trailing.", Whitespace, Seq(RemovePunct)) ==
      Seq("ok", "fine"))
  }

  test("cncharonly / cnalphanumonly keep Han (and alnum) tokens") {
    assert(run("中文 mixed中 latin 42", Whitespace, Seq(CnCharOnly)) ==
      Seq("中文", "mixed中"))
    assert(run("中文 mixed中 latin! 42", Whitespace, Seq(CnAlphaNumOnly)) ==
      Seq("中文", "mixed中", "42"))
  }

  test("asciifolding strips diacritics via NFD") {
    assert(run("déjà naïve Ångström", Whitespace, Seq(AsciiFolding)) ==
      Seq("deja", "naive", "Angstrom"))
  }

  test("regex filter keeps only matching tokens") {
    assert(run("alpha beta42 gamma7", Whitespace, Seq(RegexKeep("\\d"))) ==
      Seq("beta42", "gamma7"))
  }

  test("synonym filter expands matches in place, stream order preserved") {
    val syn = Synonym(Map("big" -> Seq("large", "huge")))
    assert(run("a big dog", Whitespace, Seq(syn)) ==
      Seq("a", "big", "large", "huge", "dog"))
  }

  test("decompounder splits fully-decomposable compounds, keeps the rest") {
    val d = Decompounder(Seq("butter", "milk", "cream"))
    assert(run("buttermilk buttercup milkcream", Whitespace, Seq(d)) ==
      Seq("butter", "milk", "buttercup", "milk", "cream"))
  }

  test("param-map dispatch reaches the new filters") {
    val df = Seq("Generalizations WERE big-news überall").toDF("t")
    val got = df.select(analyzeWith(col("t"), Map(
      "tokenizer" -> "whitespace",
      "filters" -> "lowercase,asciifolding,removepunct,stemmer,synonym",
      // the stemmer runs first, so the synonym key is the STEM
      "synonyms" -> "uberal:everywhere")).as("toks")).as[Seq[String]].head()
    // big-news dropped by removepunct; überall folded, stemmed, expanded
    assert(got == Seq("gener", "were", "uberal", "everywhere"))
  }

  test("param-map dispatch matches the typed API and rejects unknown tokenizers") {
    val df = Seq("One two,three").toDF("t")
    val viaMap = df.select(analyzeWith(col("t"), Map(
      "tokenizer" -> "char_group", "delims" -> " ,",
      "filters" -> "lowercase")).as("toks")).as[Seq[String]].head()
    assert(viaMap == Seq("one", "two", "three"))
    intercept[IllegalArgumentException] {
      analyzeWith(col("t"), Map("tokenizer" -> "no_such_tokenizer"))
    }
  }

  test("icu: UAX#29 word break keeps mid-word punctuation, drops the rest") {
    assert(run("Can't stop the rain.", WordBreak("")) ==
      Seq("Can't", "stop", "the", "rain"))
    // Han runs stay whole segments under the JDK's root-locale rules
    assert(run("中文 ok", WordBreak("")) == Seq("中文", "ok"))
    // param-map dispatch; hyphenated compounds stay one segment
    val viaMap = Seq("a-b c").toDF("t")
      .select(analyzeWith(col("t"), Map("tokenizer" -> "icu")).as("x"))
      .as[Seq[String]].head()
    assert(viaMap == Seq("a-b", "c"))
  }

  test("thai: JDK break dictionary segments Thai words (no spaces in input)") {
    // สวัสดีครับ = สวัสดี (hello) + ครับ (polite particle)
    assert(run("สวัสดีครับ",
      WordBreak("th")) ==
      Seq("สวัสดี", "ครับ"))
    // param-map: "thai" defaults the locale to th
    val viaMap = Seq("สวัสดี ok").toDF("t")
      .select(analyzeWith(col("t"), Map("tokenizer" -> "thai")).as("x"))
      .as[Seq[String]].head()
    assert(viaMap == Seq("สวัสดี", "ok"))
  }

  test("lindera (dictionary-free): Japanese script runs segment at boundaries") {
    // kanji stem + hiragana inflection: 食べる → Han run 食 (uni only,
    // single char) + kana run べる kept whole
    assert(run("食べる", Analyzers.JaScriptRuns) == Seq("食", "べる"))
    // katakana loanword and hiragana particle stay separate runs
    assert(run("データを分析する", Analyzers.JaScriptRuns) ==
      Seq("分", "析", "分析", "データ", "を", "する"))
    // latin text passes through as standard tokens
    assert(run("Spark で処理", Analyzers.JaScriptRuns) ==
      Seq("spark", "処", "理", "処理", "で"))
    // param-map: "lindera" resolves to the script-run mode
    val viaMap = Seq("食べる ok").toDF("t")
      .select(analyzeWith(col("t"), Map("tokenizer" -> "lindera")).as("x"))
      .as[Seq[String]].head()
    assert(viaMap == Seq("ok", "食", "べる"))
  }

  test("jieba (dictionary-free): CJK runs emit unigrams AND bigrams") {
    // search-mode gram emission: n unigrams + (n-1) bigrams per run
    assert(run("中文分词", Analyzers.CjkMixed) ==
      Seq("中", "文", "分", "词",
        "中文", "文分", "分词"))
    // single-char run: unigram only, no empty bigram slots
    assert(run("single 字 char", Analyzers.CjkMixed) ==
      Seq("single", "char", "字"))
    // param-map: "jieba" resolves to the mixed mode; lang_ident opts in
    // via cjk_mode=mixed
    val viaJieba = Seq("中文 ok").toDF("t")
      .select(Analyzers.analyzeWith(col("t"), Map("tokenizer" -> "jieba")).as("x"))
      .as[Seq[String]].head()
    assert(viaJieba == Seq("ok", "中", "文", "中文"))
    val viaMode = Seq("中文 ok").toDF("t")
      .select(Analyzers.analyzeWith(col("t"),
        Map("tokenizer" -> "lang_ident", "cjk_mode" -> "mixed")).as("x"))
      .as[Seq[String]].head()
    assert(viaMode == viaJieba)
  }

  test("lang_ident: CJK runs become char bigrams, latin stays standard") {
    assert(run("\u4e2d\u6587\u5206\u8bcd", Analyzers.LangIdent) ==
      Seq("\u4e2d\u6587", "\u6587\u5206", "\u5206\u8bcd"))
    assert(run("single \u5b57 char", Analyzers.LangIdent) ==
      Seq("single", "char", "\u5b57"))
    assert(run("Spark\u5f15\u64ce fast", Analyzers.LangIdent) ==
      Seq("spark", "fast", "\u5f15\u64ce"))
    assert(run("no cjk at all", Analyzers.LangIdent) ==
      Seq("no", "cjk", "at", "all"))
    // hangul + katakana runs bigram too
    assert(run("\ud55c\uad6d\uc5b4", Analyzers.LangIdent) ==
      Seq("\ud55c\uad6d", "\uad6d\uc5b4"))
    // param-map dispatch reaches it
    val viaParams = Seq("\u4e2d\u6587 ok").toDF("t")
      .select(Analyzers.analyzeWith(col("t"), Map("tokenizer" -> "lang_ident")).as("x"))
      .as[Seq[String]].head()
    assert(viaParams == Seq("ok", "\u4e2d\u6587"))
  }

  test("arabic normalization + decimal digit filters (Lucene-compatible)") {
    // hamza-alef variants fold to bare alef
    assert(run("\u0623\u062d\u0645\u062f", Analyzers.Whitespace,
      Seq(Analyzers.ArabicNormalization)) ==
      run("\u0627\u062d\u0645\u062f", Analyzers.Whitespace, Nil))
    // teh marbuta to heh; alef maksura to yeh
    assert(run("\u0645\u062f\u0631\u0633\u0629", Analyzers.Whitespace,
      Seq(Analyzers.ArabicNormalization)).head.endsWith("\u0647"))
    assert(run("\u0645\u0646\u0649", Analyzers.Whitespace,
      Seq(Analyzers.ArabicNormalization)).head.endsWith("\u064a"))
    // harakat (diacritics) and tatweel removed
    assert(run("\u0643\u064e\u062a\u064e\u0628\u064e", Analyzers.Whitespace,
      Seq(Analyzers.ArabicNormalization)) == Seq("\u0643\u062a\u0628"))
    assert(run("\u0643\u0640\u0640\u062a\u0628", Analyzers.Whitespace,
      Seq(Analyzers.ArabicNormalization)) == Seq("\u0643\u062a\u0628"))
    // digit systems fold to ASCII: arabic-indic, thai, fullwidth
    assert(run("\u0661\u0662\u0663 \u0e54\u0e55 \uff17\uff18", Analyzers.Whitespace,
      Seq(Analyzers.DecimalDigit)) == Seq("123", "45", "78"))
    // param-map dispatch
    val viaParams = Seq("\u0623\u0628 \u0661\u0660").toDF("t")
      .select(Analyzers.analyzeWith(col("t"), Map("tokenizer" -> "whitespace",
        "filters" -> "arabic_normalization,decimaldigit")).as("x"))
      .as[Seq[String]].head()
    assert(viaParams == Seq("\u0627\u0628", "10"))
  }

  test("pinyin filter: full syllables, joined, initials, keep_original") {
    // \u5f20\u4e09 \u2192 zhang, san (the MEP's motivating name-lookup example)
    assert(run("\u5f20\u4e09", Whitespace, Seq(Pinyin())) == Seq("zhang", "san"))
    assert(run("\u5f20\u4e09", Whitespace,
      Seq(Pinyin(keepFullPinyin = false, keepJoinedFullPinyin = true))) ==
      Seq("zhangsan"))
    assert(run("\u5f20\u4e09", Whitespace,
      Seq(Pinyin(keepFullPinyin = false, keepSeparateFirstLetter = true))) ==
      Seq("z", "s"))
    assert(run("\u5f20\u4e09", Whitespace, Seq(Pinyin(keepOriginal = true))) ==
      Seq("\u5f20\u4e09", "zhang", "san"))
    // non-Han tokens pass through untouched; unknown Han rides along
    assert(run("hello \u4e2d\u56fd", Whitespace, Seq(Pinyin())) ==
      Seq("hello", "zhong", "guo"))
    assert(run("\u4e2dX", Whitespace, Seq(Pinyin())) == Seq("zhong", "X"))
    // param-map dispatch
    val viaParams2 = Seq("\u5317\u4eac ok").toDF("t")
      .select(Analyzers.analyzeWith(col("t"), Map("tokenizer" -> "whitespace",
        "filters" -> "pinyin", "keep_joined_full_pinyin" -> "true")).as("x"))
      .as[Seq[String]].head()
    assert(viaParams2 == Seq("bei", "jing", "beijing", "ok"))
  }

  test("file resources: analyzer params resolve dictionaries by resource name") {
    val res = s"stop_${System.nanoTime()}"
    FileResources.add(res, "the\nand\nof")
    // idempotent re-add with identical content; different content errors
    FileResources.add(res, "the\nand\nof")
    intercept[IllegalArgumentException](FileResources.add(res, "different"))
    assert(FileResources.list.contains(res))
    val toks = Seq("The roof of the house and the tree").toDF("t")
      .select(Analyzers.analyzeWith(col("t"), Map("tokenizer" -> "standard",
        "filters" -> "stop", "stop_words_resource" -> res)).as("x"))
      .as[Seq[String]].head()
    assert(toks == Seq("roof", "house", "tree"))
    // resource lines merge AHEAD of any inline stop_words
    val toks2 = Seq("the quick brown fox").toDF("t")
      .select(Analyzers.analyzeWith(col("t"), Map("tokenizer" -> "standard",
        "filters" -> "stop", "stop_words_resource" -> res,
        "stop_words" -> "quick")).as("x"))
      .as[Seq[String]].head()
    assert(toks2 == Seq("brown", "fox"))
    // synonym dictionary via resource: one row per line
    val syn = s"syn_${System.nanoTime()}"
    FileResources.add(syn, "happy:joyful|glad")
    val toks3 = Seq("happy days").toDF("t")
      .select(Analyzers.analyzeWith(col("t"), Map("tokenizer" -> "standard",
        "filters" -> "synonym", "synonyms_resource" -> syn)).as("x"))
      .as[Seq[String]].head()
    assert(toks3 == Seq("happy", "joyful", "glad", "days"))
    // unknown / removed resources error loudly
    intercept[NoSuchElementException](FileResources.get("no_such_resource"))
    FileResources.remove(res)
    intercept[NoSuchElementException](FileResources.remove(res))
    intercept[NoSuchElementException] {
      Seq("x").toDF("t").select(Analyzers.analyzeWith(col("t"),
        Map("tokenizer" -> "standard", "filters" -> "stop",
          "stop_words_resource" -> res)).as("x")).as[Seq[String]].head()
    }
    FileResources.remove(syn)
  }

  test("jieba with a user dictionary: longest match, OOV grams, latin order") {
    val dict = Seq("中国", "大学", "大学生", "北京大学")
    // longest match wins: 北京大学 whole, not 北京+大学 or grams
    assert(run("北京大学的学生", CjkDict(dict, ja = false)) ==
      Seq("北京大学", "的", "学", "生", "的学", "学生"))
    // a longer dict word beats its own dict prefix (大学生 over 大学)
    assert(run("大学生活", CjkDict(dict, ja = false)) == Seq("大学生", "活"))
    // OOV spans before a dict hit fall back to uni+bigrams
    assert(run("我在中国", CjkDict(dict, ja = false)) ==
      Seq("我", "在", "我在", "中国"))
    // latin spans tokenize as standard, tokens in reading order
    assert(run("Hello 中国 world", CjkDict(dict, ja = false)) ==
      Seq("hello", "中国", "world"))
    // empty dictionary refuses at build time
    intercept[IllegalArgumentException](CjkDict(Nil, ja = false))
  }

  test("lindera with a user dictionary: dict words cross scripts, OOV script runs") {
    // dict entry spanning Han+kana (a real lindera-dictionary shape):
    // the whole compound comes out as one token
    val dict = Seq("東京タワー", "食べる")
    assert(run("東京タワーを見た", CjkDict(dict, ja = true)) ==
      Seq("東京タワー", "を", "見", "た"))
    // OOV spans fall back to script-run segmentation: kana runs whole,
    // Han runs as uni+bigrams
    assert(run("日本語です", CjkDict(dict, ja = true)) ==
      Seq("日", "本", "語", "日本", "本語", "です"))
    // the prolonged sound mark stays inside a katakana loanword run;
    // katakana and hiragana are distinct OOV runs (loanword vs particle)
    assert(run("データを食べる", CjkDict(dict, ja = true)) ==
      Seq("データ", "を", "食べる"))
  }

  test("dict_resource param routes jieba/lindera through the registry") {
    val res = s"userdict_${System.nanoTime()}"
    FileResources.add(res, "中国\n大学生")
    val viaRes = Seq("大学生在中国").toDF("t")
      .select(Analyzers.analyzeWith(col("t"),
        Map("tokenizer" -> "jieba", "dict_resource" -> res)).as("x"))
      .as[Seq[String]].head()
    assert(viaRes == Seq("大学生", "在", "中国"))
    // inline dict words merge with (after) the resource lines
    val merged = Seq("大学生在北京").toDF("t")
      .select(Analyzers.analyzeWith(col("t"),
        Map("tokenizer" -> "jieba", "dict_resource" -> res,
          "dict" -> "北京")).as("x"))
      .as[Seq[String]].head()
    assert(merged == Seq("大学生", "在", "北京"))
    // without a dict the tokenizers keep their dictionary-free fallbacks
    val noDict = Seq("中国").toDF("t")
      .select(Analyzers.analyzeWith(col("t"),
        Map("tokenizer" -> "jieba")).as("x")).as[Seq[String]].head()
    assert(noDict == Seq("中", "国", "中国"))
    // lindera honors the same param
    val ja = Seq("東京です").toDF("t")
      .select(Analyzers.analyzeWith(col("t"),
        Map("tokenizer" -> "lindera", "dict" -> "東京")).as("x"))
      .as[Seq[String]].head()
    assert(ja == Seq("東京", "です"))
    FileResources.remove(res)
  }
}
