package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Configurable analyzer pipeline: tokenizer + token filters, mirroring
  * the reference's analyzer params (reference: Go dispatch
  * internal/util/analyzer/analyzer.go + tantivy tokenizers
  * internal/core/thirdparty/tantivy/tantivy-binding/src/analyzer/
  * tokenizers/ — standard, whitespace, char_group
  * (char_group_tokenizer.rs), ngram (ngram_tokenizer_with_chars.rs),
  * keyword — and filters lowercase / stop / length / alphanumonly).
  *
  * jieba/lindera ship without their bundled dictionary assets here: a
  * user-supplied dictionary (inline `dict` or a file-resource registry
  * `dict_resource`) drives longest-match segmentation ([[CjkDict]]);
  * without one they map to the standard dictionary-free fallbacks
  * (mixed uni+bigrams / script-run segmentation); icu/thai map to the
  * JDK's ICU-derived UAX#29 word break, which bundles the Thai break
  * dictionary.
  *
  * Everything compiles to built-in codegen'd string/array functions —
  * an analyzer runs inside whole-stage codegen on the corpus scan, so
  * tokenization at 100 TB is a map-only pass with no UDF boundary.
  */
/** Single-pass n-gram emitter (the tantivy ngram tokenizer's gram
  * enumeration as a native Catalyst expression): for each n in
  * [minGram, maxGram], every code-point gram of that length, in n-major
  * then position order — identical to the substring formulation it
  * replaces but LINEAR in output size (one code-point walk; per-gram
  * `substring` re-seeks UTF-8 from the start and goes quadratic on long
  * LOB payloads). Code points, not UTF-16 units, so surrogate-pair text
  * grams exactly like SQL substr on both engine and oracle sides.
  */
case class NgramArray(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    minGram: Int, maxGram: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_array"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis
        .TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$prettyName needs a string, got $other")
    }

  /** Shared kernel — also the interpreted path (public: the generated
    * code invokes it through a reference object).
    */
  def gramsOf(s: String): Array[org.apache.spark.unsafe.types.UTF8String] = {
    val cps = s.codePoints().toArray
    val len = cps.length
    var total = 0
    var n = minGram
    while (n <= maxGram) { if (len >= n) total += len - n + 1; n += 1 }
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](total)
    var k = 0
    n = minGram
    while (n <= maxGram) {
      var i = 0
      val last = len - n
      while (i <= last) {
        out(k) = org.apache.spark.unsafe.types.UTF8String
          .fromString(new String(cps, i, n))
        k += 1
        i += 1
      }
      n += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      gramsOf(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ngramArray", this, classOf[NgramArray].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) $self.gramsOf($v.toString()));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = c)
}

object Analyzers {

  sealed trait Tokenizer
  /** Lowercase + split on non-alphanumerics (tantivy "standard" + the
    * default lowercase filter — same rules as [[TextFunctions.tokenize]]). */
  case object Standard extends Tokenizer
  /** Split on Unicode whitespace only; preserves case (filters may lower). */
  case object Whitespace extends Tokenizer
  /** Whole value as a single token. */
  case object Keyword extends Tokenizer
  /** All character n-grams with minGram <= n <= maxGram (tantivy NgramTokenizer). */
  final case class Ngram(minGram: Int, maxGram: Int) extends Tokenizer {
    require(minGram >= 1 && maxGram >= minGram, s"bad ngram range [$minGram,$maxGram]")
  }
  /** Split whenever a character from `delims` is seen (char_group_tokenizer.rs). */
  final case class CharGroup(delims: Seq[Char]) extends Tokenizer {
    require(delims.nonEmpty, "char_group needs at least one delimiter")
  }
  /** Script-aware dispatch (tantivy lang_ident tokenizer: detect the
    * language, tokenize accordingly). Without dictionary assets
    * (jieba/lindera/icu), CJK runs tokenize as character bigrams — the
    * standard dictionary-free CJK search tokenization — and everything
    * else as `standard`. Mixed-script text yields both token kinds.
    */
  case object LangIdent extends Tokenizer
  /** Dictionary-free jieba-style CJK segmentation (reference:
    * tokenizers/jieba_tokenizer.rs — jieba's search mode emits words AND
    * their sub-grams; without the frequency dictionary the standard
    * fallback is every unigram plus every bigram of a CJK run: bigram
    * precision with unigram recall, so single-character words — most of
    * the function-word vocabulary — stay findable). Non-CJK text
    * tokenizes as `standard`, like [[LangIdent]].
    */
  case object CjkMixed extends Tokenizer
  /** Dictionary-free lindera-style Japanese segmentation (reference:
    * tokenizers/lindera_tokenizer.rs — IPADIC morpheme segmentation).
    * Without the dictionary, script-run boundaries are the standard
    * fallback: transitions between Han / Hiragana / Katakana closely
    * track morpheme boundaries in Japanese (kanji stems vs kana
    * inflections vs katakana loanwords). Each maximal kana run is one
    * token; Han runs emit uni+bigrams like [[CjkMixed]] (multi-kanji
    * compounds stay findable at both granularities); everything else
    * tokenizes as `standard`.
    */
  case object JaScriptRuns extends Tokenizer
  /** Dictionary-backed CJK segmentation (reference: jieba_tokenizer.rs
    * and lindera_tokenizer.rs consume user dictionaries; the
    * file-resource registry supplies one here via the `dict_resource`
    * analyzer param). Forward longest-match over each CJK run: at every
    * position the longest dictionary word wins (`北京大学` beats a
    * hypothetical `北京`; `大学生` beats `大学`), out-of-dictionary
    * spans fall back to the dictionary-free treatment — uni+bigrams in
    * jieba mode ([[CjkMixed]]), script-run segmentation in lindera mode
    * ([[JaScriptRuns]]) — and non-CJK spans tokenize as `standard`.
    * Tokens come out in reading order. Imperative per-string walk → a
    * UDF like [[WordBreak]]: analyzer cost sits at ingest/index-build
    * time, off the scan hot path; the dictionary rides into the closure
    * as a broadcast-sized literal, so executors never read files.
    */
  final case class CjkDict(words: Seq[String], ja: Boolean) extends Tokenizer {
    require(words.nonEmpty, "dictionary tokenizer needs at least one word")
    require(words.forall(_.nonEmpty), "dictionary words must be non-empty")
  }

  /** UAX#29 word segmentation via the JDK's BreakIterator (reference:
    * tokenizers/icu_tokenizer.rs wraps ICU's word-break; the JDK ships
    * the same ICU-derived break rules AND dictionaries — including the
    * Thai one, so `thai` needs no external assets either). Empty tag =
    * root locale. Imperative per-string iteration → a UDF, not a native
    * expression; analyzer cost sits at ingest/index-build time, off the
    * scan hot path.
    */
  final case class WordBreak(languageTag: String) extends Tokenizer

  sealed trait Filter
  case object Lowercase extends Filter
  /** Drop tokens in the stop set (after earlier filters). */
  final case class Stop(words: Seq[String]) extends Filter
  /** Drop tokens longer than `max` chars (tantivy RemoveLongFilter). */
  final case class MaxLength(max: Int) extends Filter
  /** Drop tokens containing any non-[a-zA-Z0-9] char (AlphaNumOnlyFilter). */
  case object AlphaNumOnly extends Filter
  /** Lucene-compatible Arabic normalization (reference:
    * 20260403-arabic-thai-analyzer.md, arabic_normalization_filter.rs):
    * hamza/alef variants → bare alef, teh marbuta → heh, alef maksura →
    * yeh, harakat (U+064B..U+065F) and tatweel (U+0640) removed.
    */
  case object ArabicNormalization extends Filter
  /** Non-ASCII decimal digits → ASCII 0-9 (decimaldigit filter; the
    * common systems: Arabic-Indic, Extended Arabic-Indic, Thai,
    * Devanagari, Bengali, Fullwidth).
    */
  case object DecimalDigit extends Filter
  /** Porter-stem each token (tantivy `stemmer` filter,
    * stemmer_filter.rs; only "english" is supported — porter is an
    * English algorithm and the sandbox carries no other snowball data).
    */
  final case class Stem(language: String) extends Filter
  /** Drop tokens containing any punctuation or whitespace character
    * (remove_punct_filter.rs drops on an unanchored `[\p{Punct}\s]+`
    * match, i.e. ANY punct inside the token kills it).
    */
  case object RemovePunct extends Filter
  /** Keep only tokens containing a Han character (cn_char_filter.rs
    * CnCharOnlyFilter); [[CnAlphaNumOnly]] also admits ASCII
    * alphanumerics.
    */
  case object CnCharOnly extends Filter
  case object CnAlphaNumOnly extends Filter
  /** Strip diacritics: NFD-decompose then drop combining marks
    * (asciifolding — the Lucene ASCIIFoldingFilter's dominant case).
    */
  case object AsciiFolding extends Filter
  /** Keep only tokens matching `expr` (regex_filter.rs: the stream
    * advances past non-matching tokens).
    */
  final case class RegexKeep(expr: String) extends Filter
  /** Expand tokens through a synonym dictionary: a matching token is
    * followed by its synonyms (synonym_filter.rs with expand=true —
    * the index-side expansion shape).
    */
  final case class Synonym(dict: Map[String, Seq[String]]) extends Filter
  /** Split compound words fully decomposable into dictionary parts
    * (decompounder_filter.rs / split_compound_words); tokens that
    * don't fully decompose stay whole.
    */
  final case class Decompounder(dict: Seq[String]) extends Filter
  /** Pinyin romanization filter (MEP 20260209-pinyin_filter.md): a
    * token containing known Han characters expands to its pinyin forms
    * — per-syllable tokens (`keepFullPinyin`, "张三" → zhang, san), the
    * joined form (`keepJoinedFullPinyin`, zhangsan), the per-char
    * initials (`keepSeparateFirstLetter`, z, s) — optionally keeping
    * the original Han token (`keepOriginal`). Tokens without a known
    * Han character pass through untouched. Ships a BOUNDED built-in
    * char→pinyin table (the reference bundles a full dictionary; this
    * covers the engine's Han fixture set plus common name/search
    * characters — widen [[Analyzers.PinyinTable]] the same way jieba
    * would gain its frequency dictionary).
    */
  final case class Pinyin(
      keepOriginal: Boolean = false,
      keepFullPinyin: Boolean = true,
      keepJoinedFullPinyin: Boolean = false,
      keepSeparateFirstLetter: Boolean = false) extends Filter

  /** Escaped character class — works identically in Java regex (Spark)
    * and RE2 (oracle side); \Q..\E quoting is Java-only, so escape
    * per-char instead.
    */
  /** The escaped character-class BODY for a delimiter set — shared with
    * the analyzer-aware highlighter so highlight boundaries and
    * char_group token splits can never diverge.
    */
  private[graft] def charClass(delims: Seq[Char]): String =
    delims.map(c => if (c.isLetterOrDigit) c.toString else "\\" + c).mkString

  private def regexClass(delims: Seq[Char]): String =
    s"[${charClass(delims)}]+"

  private def tokensOf(c: Column, tok: Tokenizer): Column = tok match {
    case Standard       => TextFunctions.tokenize(c)
    case Whitespace     => filter(split(c, "\\s+"), t => t =!= "")
    case Keyword        => array(c)
    case Ngram(lo, hi)  =>
      // a NATIVE single-pass expression, not transform(sequence →
      // substring): per-gram substring re-seeks the UTF-8 char offset
      // from the string's start, turning gram emission quadratic — a
      // 64 KiB LOB payload would pay ~4.5e9 char scans per row. The
      // kernel walks the string once (String.charAt is O(1)), linear in
      // output bytes whatever the payload size.
      org.apache.spark.sql.graft.ColumnBridge.column(
        NgramArray(org.apache.spark.sql.graft.ColumnBridge.expression(c), lo, hi))
    case CharGroup(ds)  => filter(split(c, regexClass(ds)), t => t =!= "")
    case LangIdent      =>
      cjkDispatch(c, run =>
        when(length(run) === 1, array(run)).otherwise(
          transform(sequence(lit(1), length(run) - 1), i => run.substr(i, lit(2)))))
    case CjkMixed       =>
      cjkDispatch(c, run => concat(
        transform(sequence(lit(1), length(run)), i => run.substr(i, lit(1))),
        when(length(run) > 1,
          transform(sequence(lit(1), length(run) - 1), i => run.substr(i, lit(2))))
          .otherwise(array().cast("array<string>"))))
    case JaScriptRuns   =>
      // U+30FC (prolonged sound mark) is Script=Common but belongs
      // inside katakana loanwords (データ) — include it explicitly
      val jp = "[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}ー]"
      val latin = TextFunctions.tokenize(regexp_replace(c, jp, " "))
      val hanRuns = regexp_extract_all(c, lit("[\\p{IsHan}]+"), lit(0))
      // hira and kata runs extracted separately: a loanword in katakana
      // and its following hiragana particle are distinct morphemes
      val kanaRuns = regexp_extract_all(
        c, lit("[\\p{IsHiragana}]+|[\\p{IsKatakana}ー]+"), lit(0))
      val hanGrams = flatten(transform(hanRuns, run => concat(
        transform(sequence(lit(1), length(run)), i => run.substr(i, lit(1))),
        when(length(run) > 1,
          transform(sequence(lit(1), length(run) - 1), i => run.substr(i, lit(2))))
          .otherwise(array().cast("array<string>")))))
      concat(latin, hanGrams, kanaRuns)
    case WordBreak(tag) => wordBreakUdf(c, lit(tag))
    case CjkDict(ws, ja) => cjkDictUdf(ws, ja)(c)
  }

  /** Longest-match dictionary segmentation over the full string: CJK
    * runs walk the dictionary, everything between tokenizes as
    * `standard`. See [[CjkDict]].
    */
  private def cjkDictUdf(dictWords: Seq[String], ja: Boolean) = {
    val words = dictWords.toSet
    val maxLen = words.iterator.map(_.length).max
    // lindera mode scopes to Japanese scripts (incl. U+30FC inside
    // loanwords); jieba mode covers the full CJK class like cjkDispatch
    val runRe =
      if (ja) "[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}ー]+"
      else "[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}]+"
    udf { (s: String) =>
      if (s == null) null
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        // OOV fallback = the dictionary-free treatment of that span
        def grams(span: String): Unit = {
          var i = 0
          while (i < span.length) { out += span.substring(i, i + 1); i += 1 }
          i = 0
          while (i < span.length - 1) { out += span.substring(i, i + 2); i += 1 }
        }
        def fallback(span: String): Unit =
          if (!ja) grams(span)
          else {
            // script runs: kana runs whole, Han runs as uni+bigrams
            val m = java.util.regex.Pattern
              .compile("[\\p{IsHiragana}]+|[\\p{IsKatakana}ー]+|[\\p{IsHan}]+")
              .matcher(span)
            while (m.find()) {
              val r = m.group()
              if (r.head.toString.matches("[\\p{IsHan}]")) grams(r) else out += r
            }
          }
        def segRun(run: String): Unit = {
          var i = 0
          var oov = -1
          while (i < run.length) {
            var l = math.min(maxLen, run.length - i)
            var hit = 0
            while (l >= 1 && hit == 0) {
              if (words.contains(run.substring(i, i + l))) hit = l
              l -= 1
            }
            if (hit > 0) {
              if (oov >= 0) { fallback(run.substring(oov, i)); oov = -1 }
              out += run.substring(i, i + hit)
              i += hit
            } else {
              if (oov < 0) oov = i
              i += 1
            }
          }
          if (oov >= 0) fallback(run.substring(oov))
        }
        val m = java.util.regex.Pattern.compile(runRe).matcher(s)
        var last = 0
        while (m.find()) {
          if (m.start > last)
            out ++= TextFunctions.tokenizeString(s.substring(last, m.start))
          segRun(m.group())
          last = m.end
        }
        if (last < s.length)
          out ++= TextFunctions.tokenizeString(s.substring(last))
        out.toSeq
      }
    }
  }

  /** BreakIterator word extraction: keeps segments containing at least
    * one letter/digit (UAX#29 emits punctuation/space segments too).
    * getWordInstance clones a prototype per call — cheap enough for the
    * per-row ingest path.
    */
  private val wordBreakUdf = udf { (s: String, tag: String) =>
    if (s == null) Seq.empty[String]
    else {
      val loc = if (tag.isEmpty) java.util.Locale.ROOT
                else java.util.Locale.forLanguageTag(tag)
      val bi = java.text.BreakIterator.getWordInstance(loc)
      bi.setText(s)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      var start = bi.first()
      var end = bi.next()
      while (end != java.text.BreakIterator.DONE) {
        val w = s.substring(start, end)
        if (w.exists(Character.isLetterOrDigit)) buf += w
        start = end
        end = bi.next()
      }
      buf.toSeq
    }
  }

  /** Script-aware split: non-CJK spans tokenize as `standard`; each
    * maximal CJK run feeds `gramsOf`. Mixed-script text yields both.
    */
  private def cjkDispatch(c: Column, gramsOf: Column => Column): Column = {
    val cjkClass = "[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}]"
    val latin = TextFunctions.tokenize(regexp_replace(c, cjkClass, " "))
    val runs = regexp_extract_all(c, lit(cjkClass + "+"), lit(0))
    concat(latin, flatten(transform(runs, gramsOf)))
  }

  private val DigitFrom =
    "٠١٢٣٤٥٦٧٨٩" + // Arabic-Indic
    "۰۱۲۳۴۵۶۷۸۹" + // Extended Arabic
    "๐๑๒๓๔๕๖๗๘๙" + // Thai
    "०१२३४५६७८९" + // Devanagari
    "০১২৩৪৫৬৭৮৯" + // Bengali
    "０１２３４５６７８９"   // Fullwidth
  private val DigitTo = "0123456789" * 6

  private def applyFilter(tokens: Column, f: Filter): Column = f match {
    case Lowercase     => transform(tokens, lower(_))
    case Stop(words)   =>
      val stopArr = array(words.map(lit): _*)
      filter(tokens, t => !array_contains(stopArr, t))
    case MaxLength(m)  => filter(tokens, t => length(t) <= m)
    case AlphaNumOnly  => filter(tokens, t => t.rlike("^[a-zA-Z0-9]+$"))
    case ArabicNormalization =>
      // آأإ (hamza/alef) → ا; ة (teh marbuta) →
      // ه; ى (alef maksura) → ي; strip harakat + tatweel
      transform(tokens, t => regexp_replace(
        translate(t, "آأإةى", "اااهي"),
        "[ً-ٟـ]", ""))
    case DecimalDigit  => transform(tokens, t => translate(t, DigitFrom, DigitTo))
    case Stem(lang) =>
      require(lang == "english", s"stemmer language '$lang' not supported (english only)")
      stemUdf(tokens)
    case RemovePunct   => filter(tokens, t => !t.rlike("[\\p{Punct}\\s]"))
    case CnCharOnly    => filter(tokens, t => t.rlike("\\p{IsHan}"))
    case CnAlphaNumOnly => filter(tokens, t => t.rlike("^[\\p{IsHan}a-zA-Z0-9]+$"))
    case AsciiFolding  => foldUdf(tokens)
    case RegexKeep(e)  => filter(tokens, t => t.rlike(e))
    case Synonym(dict) =>
      val entries = dict.toSeq.sortBy(_._1)
      val keys = array(entries.map(e => lit(e._1)): _*)
      val vals = array(entries.map(e => array((e._1 +: e._2).map(lit): _*)): _*)
      // token → [token] or [token, syn…], flattened back to one stream
      flatten(transform(tokens, t => {
        val idx = array_position(keys, t)
        when(idx > 0, element_at(vals, idx.cast("int"))).otherwise(array(t))
      }))
    case Decompounder(dict) => decompoundUdf(dict)(tokens)
    case Pinyin(orig, full, joined, initials) =>
      pinyinUdf(orig, full, joined, initials)(tokens)
  }

  /** Bounded char→toneless-pinyin table: the 26-char Han fixture
    * alphabet the analyzer suites exercise plus common name/search
    * characters. Unknown Han passes through unchanged.
    */
  private[graft] val PinyinTable: Map[Char, String] = Map(
    '的' -> "de", '一' -> "yi", '是' -> "shi", '不' -> "bu", '了' -> "le",
    '人' -> "ren", '我' -> "wo", '在' -> "zai", '有' -> "you", '他' -> "ta",
    '这' -> "zhe", '中' -> "zhong", '大' -> "da", '来' -> "lai", '上' -> "shang",
    '国' -> "guo", '个' -> "ge", '到' -> "dao", '说' -> "shuo", '们' -> "men",
    '为' -> "wei", '子' -> "zi", '和' -> "he", '你' -> "ni", '地' -> "di",
    '出' -> "chu",
    // common name/search characters (the MEP's motivating lookups)
    '张' -> "zhang", '三' -> "san", '李' -> "li", '王' -> "wang", '好' -> "hao",
    '小' -> "xiao", '明' -> "ming", '天' -> "tian", '学' -> "xue", '生' -> "sheng",
    '山' -> "shan", '水' -> "shui", '日' -> "ri", '月' -> "yue", '文' -> "wen",
    '北' -> "bei", '京' -> "jing", '四' -> "si", '五' -> "wu", '火' -> "huo")

  // UDFs sit at ingest/index-build time like the WordBreak tokenizers,
  // never on the scan path
  private lazy val stemUdf =
    udf((ts: Seq[String]) => if (ts == null) null else ts.map(PorterStemmer.stem))
  private lazy val foldUdf = udf { (ts: Seq[String]) =>
    if (ts == null) null
    else ts.map(t => java.text.Normalizer
      .normalize(t, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}", ""))
  }
  private def pinyinUdf(keepOriginal: Boolean, keepFull: Boolean,
      keepJoined: Boolean, keepInitials: Boolean) = udf { (ts: Seq[String]) =>
    if (ts == null) null
    else ts.flatMap { t =>
      if (t == null || !t.exists(PinyinTable.contains)) Seq(t)
      else {
        val sylls = t.map(ch => PinyinTable.getOrElse(ch, ch.toString))
        val out = Seq.newBuilder[String]
        if (keepOriginal) out += t
        if (keepFull) out ++= sylls
        if (keepJoined) out += sylls.mkString
        if (keepInitials) out ++= sylls.map(_.take(1))
        out.result()
      }
    }
  }

  private def decompoundUdf(dict: Seq[String]) = udf { (ts: Seq[String]) =>
    if (ts == null) null
    else {
      val words = dict.toSet
      val maxLen = if (words.isEmpty) 0 else words.iterator.map(_.length).max
      // DP full-cover segmentation, longest-part-first at each split
      def split(t: String): Seq[String] = {
        val n = t.length
        val from = Array.fill[Int](n + 1)(-1)
        from(0) = 0
        var i = 0
        while (i < n) {
          if (from(i) >= 0) {
            var l = math.min(maxLen, n - i)
            while (l >= 1) {
              if (from(i + l) < 0 && words.contains(t.substring(i, i + l)))
                from(i + l) = i
              l -= 1
            }
          }
          i += 1
        }
        if (from(n) < 0) Seq(t)
        else {
          var parts = List.empty[String]
          var j = n
          while (j > 0) { val s = from(j); parts = t.substring(s, j) :: parts; j = s }
          parts
        }
      }
      ts.flatMap(split)
    }
  }

  /** Tokenize `c` with the given tokenizer, then apply filters in order. */
  def analyze(c: Column, tokenizer: Tokenizer, filters: Seq[Filter] = Nil): Column =
    filters.foldLeft(tokensOf(c, tokenizer))(applyFilter)

  // query-side tokenization cache: filter COMPILE must not pay a Spark
  // job per match construct (some compile paths run under a collection's
  // state lock). Keyed by the FileResources epoch + the full analyzer
  // param map + the query text (the epoch invalidates entries whose
  // `*_resource` dictionaries were replaced); bounded by a wholesale
  // clear — match queries repeat heavily, a smarter eviction buys
  // nothing at this size.
  private val queryTokenCache = new java.util.concurrent.ConcurrentHashMap[
    (Long, Map[String, String], String), Seq[String]]()
  private val QueryTokenCacheMax = 4096

  /** Run an analyzer pipeline over ONE driver-local string and return
    * the tokens — the query side of match/phrase compilation. The plan
    * is a Project over a LocalRelation, which Catalyst's
    * ConvertToLocalRelation rule evaluates driver-side at optimization
    * time, so no Spark job is scheduled and no dependency on which
    * session is `active` beyond expression resolution. Results cache per
    * (resource epoch, analyzer_params, query).
    */
  def analyzeLocal(params: Map[String, String], text: String): Seq[String] = {
    val key = (FileResources.epoch, params, text)
    val hit = queryTokenCache.get(key)
    if (hit != null) hit
    else {
      // evict OUTSIDE any map callback: clear() from inside a
      // computeIfAbsent mapping function can deadlock two threads
      // holding different bins (the ConcurrentHashMap recursive-update
      // contract)
      if (queryTokenCache.size >= QueryTokenCacheMax) queryTokenCache.clear()
      val s = org.apache.spark.sql.SparkSession.active
      import s.implicits._
      val toks = Seq(Tuple1(text)).toDF("_q")
        .select(analyzeWith(org.apache.spark.sql.functions.col("_q"), params).as("_t"))
        .head().getSeq[String](0).toSeq
      val prev = queryTokenCache.putIfAbsent(key, toks)
      if (prev != null) prev else toks
    }
  }

  /** Param-map dispatch matching the reference's analyzer_params shape:
    * `{"tokenizer": "char_group", "delims": " .,", "filters":
    * "lowercase,stop", "stop_words": "the,and", ...}`. Unknown
    * tokenizers fail fast.
    */
  def analyzeWith(c: Column, params: Map[String, String]): Column = {
    // `<param>_resource` indirection (AddFileResource contract): the
    // named registry entry's LINES splice in ahead of any inline value —
    // resolved here at analyzer-build time, so the dictionary rides into
    // the compiled expression as a literal
    def withResource(inlineKey: String, resourceKey: String, sep: String): Seq[String] = {
      val inline = params.getOrElse(inlineKey, "")
        .split(sep).toSeq.map(_.trim).filter(_.nonEmpty)
      val fromResource = params.get(resourceKey).toSeq.flatMap(name =>
        FileResources.get(name).linesIterator.map(_.trim).filter(_.nonEmpty))
      fromResource ++ inline
    }
    // jieba/lindera with a user dictionary (inline `dict` or a
    // registry `dict_resource`) segment by longest match; without one
    // they keep the documented dictionary-free fallbacks
    def dictWords: Seq[String] = withResource("dict", "dict_resource", ",")
    val tok = params.getOrElse("tokenizer", "standard") match {
      case "standard"   => Standard
      case "whitespace" => Whitespace
      case "keyword"    => Keyword
      case "ngram"      => Ngram(
        params.getOrElse("min_gram", "1").toInt, params.getOrElse("max_gram", "2").toInt)
      case "char_group" => CharGroup(params.getOrElse("delims", " ").toSeq)
      case "lang_ident" =>
        if (params.get("cjk_mode").contains("mixed")) CjkMixed else LangIdent
      // jieba without its frequency dictionary = search-mode gram
      // emission; lindera without IPADIC = script-run boundaries;
      // icu/thai map to the JDK's ICU-derived UAX#29 word break (the
      // JDK bundles the Thai break dictionary)
      case "jieba"      =>
        val dw = dictWords; if (dw.nonEmpty) CjkDict(dw, ja = false) else CjkMixed
      case "lindera"    =>
        val dw = dictWords; if (dw.nonEmpty) CjkDict(dw, ja = true) else JaScriptRuns
      case "icu"        => WordBreak(params.getOrElse("locale", ""))
      case "thai"       => WordBreak(params.getOrElse("locale", "th"))
      case other        => throw new IllegalArgumentException(
        s"tokenizer '$other' not supported (lang_ident covers CJK via char " +
          "bigrams, jieba via mixed uni+bigrams, lindera via script-run " +
          "segmentation, icu/thai via JDK UAX#29 word break)")
    }
    val filters = params.get("filters").map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Nil).map {
        case "lowercase"    => Lowercase
        case "stop"         => Stop(withResource("stop_words", "stop_words_resource", ","))
        case "max_length"   => MaxLength(params.getOrElse("max_token_length", "40").toInt)
        case "alphanumonly" => AlphaNumOnly
        case "arabic_normalization" => ArabicNormalization
        case "decimaldigit" => DecimalDigit
        case "stemmer"      => Stem(params.getOrElse("language", "english"))
        case "removepunct"  => RemovePunct
        case "cncharonly"   => CnCharOnly
        case "cnalphanumonly" => CnAlphaNumOnly
        case "asciifolding" => AsciiFolding
        case "regex"        => RegexKeep(params.getOrElse("expr",
          throw new IllegalArgumentException("regex filter needs 'expr'")))
        // synonyms: "key:syn1|syn2;key2:syn" (the tantivy dict-file rows
        // rendered into one param string); a synonyms_resource's LINES
        // are the same rows, one per line
        case "synonym"      => Synonym(
          withResource("synonyms", "synonyms_resource", ";").map { e =>
            val Array(k, vs) = e.split(":", 2)
            k.trim -> vs.split("\\|").toSeq.map(_.trim).filter(_.nonEmpty)
          }.toMap)
        case "decompounder" => Decompounder(
          withResource("word_list", "word_list_resource", ","))
        case "pinyin"       => Pinyin(
          keepOriginal = params.getOrElse("keep_original", "false").toBoolean,
          keepFullPinyin = params.getOrElse("keep_full_pinyin", "true").toBoolean,
          keepJoinedFullPinyin =
            params.getOrElse("keep_joined_full_pinyin", "false").toBoolean,
          keepSeparateFirstLetter =
            params.getOrElse("keep_separate_first_letter", "false").toBoolean)
        case other          => throw new IllegalArgumentException(s"filter '$other' not supported")
      }
    analyze(c, tok, filters)
  }
}
