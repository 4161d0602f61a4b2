package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis functions: analyzer/tokenizer, token matching helpers,
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * The tokenizer mirrors the reference's "standard" analyzer behavior
  * (reference: internal/core/thirdparty/tantivy tokenizers + Go wrapper
  * internal/util/analyzer/ — lowercase + split on non-alphanumerics).
  * Implemented with built-in codegen'd string functions so scans stay in
  * whole-stage codegen; the SAME rules are exposed Scala-side
  * ([[tokenizeString]]) so query-time constants tokenize identically.
  */
object TextFunctions {

  val TokenSplitRegex = "[^a-z0-9]+"

  /** Standard analyzer: lowercase, split on non-alphanumerics, drop empties. */
  def tokenize(c: Column): Column =
    filter(split(lower(c), TokenSplitRegex), t => t =!= "")

  /** Scala-side twin of [[tokenize]] for query constants. */
  def tokenizeString(s: String): Seq[String] =
    s.toLowerCase.split(TokenSplitRegex).filter(_.nonEmpty).toSeq

  /** Whitespace-token count (cheap, for token budgeting). */
  def tokenCount(c: Column): Column = size(tokenize(c))

  /** BPE-ish pre-tokenization pattern (GPT-2-style word/number/punct
    * split, simplified to constructs Java regex and RE2 treat
    * identically): letter runs, single digits, punctuation runs.
    */
  val BpeSplitRegex = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]+"

  /** LLM token-budget estimate: count of BPE-ish pre-tokens. A closer
    * proxy for real tokenizer counts than whitespace words (numbers
    * count per digit, punctuation separates) without shipping a merges
    * table.
    */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeSplitRegex), lit(0)))

  /** Start offsets for overlapping fixed-size character chunks
    * (training-pipeline document chunking: context-window packing and
    * retrieval splitting). Offsets stride by `size - overlap`; every
    * non-empty document yields at least one chunk (an empty text yields
    * exactly one empty chunk, so no document silently disappears). Pure
    * column math (`sequence`), map-only and codegen-friendly — at
    * 100 TB chunking is a projection, never a shuffle.
    */
  def chunkStarts(text: Column, size: Int, overlap: Int): Column = {
    require(size > 0, s"chunk size must be positive (got $size)")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size) (got $overlap for size $size)")
    sequence(lit(0), greatest(length(text) - 1, lit(0)), lit(size - overlap))
  }

  /** Fused one-pass DISTINCT shingle set (see [[TokenShingles]]) —
    * equals `array_distinct(shingles(tokens, n))` without the
    * interpreted HOF chain; use on hot dedup/decontamination paths.
    */
  def shingleSet(tokens: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      TokenShingles(
        org.apache.spark.sql.graft.ColumnBridge.expression(tokens), n, distinct = true))

  /** Word n-gram shingles over the token array, joined by single spaces. */
  def shingles(tokens: Column, n: Int): Column =
    when(size(tokens) < n, array(array_join(tokens, " ")))
      .otherwise(transform(
        sequence(lit(0), size(tokens) - n),
        i => array_join(slice(tokens, i + 1, lit(n)), " ")))

  /** Character n-grams of a string (for fuzzy/similarity work). */
  def charNgrams(c: Column, n: Int): Column = {
    val s = lower(c)
    when(length(s) < n, array(s)).otherwise(
      transform(sequence(lit(1), length(s) - (n - 1)), i => substring(s, i, lit(n))))
  }

  /** MinHash signature: array of `numHashes` 64-bit minima over shingle
    * hashes (reference: internal/util/function/minhash_function.go:29-72 —
    * text → k-shingles → per-seed min-hash signature). Seeded via
    * xxhash64(seed, shingle).
    *
    * Built as ONE `transform` over the seed sequence rather than
    * `array(...)` of 64 independent subtrees: the latter embeds 64 copies
    * of the shingle-array expression and Spark re-evaluates each copy per
    * row (HOFs defeat common-subexpression elimination) — a 64×
    * evaluation blowup measured at sf0.1.
    */
  def minhash(shingleArr: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(shingleArr, s => xxhash64(seed, s))))

  /** Fused tokens→shingles→signature in one codegen'd expression —
    * bit-identical to `minhash(shingles(tokens, shingleSize), numHashes)`
    * but single-pass (see [[graft.functions.MinHashSignature]]). Use this
    * on the corpus-scan hot path.
    */
  def minhashSignature(tokens: Column, numHashes: Int, shingleSize: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MinHashSignature(
        org.apache.spark.sql.graft.ColumnBridge.expression(tokens), numHashes, shingleSize))

  /** Estimated Jaccard similarity of two equal-length minhash signatures. */
  def minhashJaccard(sigA: Column, sigB: Column): Column =
    aggregate(
      zip_with(sigA, sigB, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0),
      (acc, x) => acc + x).cast("double") / size(sigA)

  /** Exact token-set Jaccard similarity of two token arrays. */
  def jaccard(tokensA: Column, tokensB: Column): Column = {
    val inter = size(array_intersect(tokensA, tokensB)).cast("double")
    val union = size(array_union(tokensA, tokensB)).cast("double")
    when(union === 0.0, 0.0).otherwise(inter / union)
  }

  /** Document fingerprint: md5 of the normalized token stream — exact
    * near-whitespace/punctuation-invariant dedup key.
    */
  def fingerprint(c: Column): Column = md5(array_join(tokenize(c), " "))

  /** Winnowing rolling-hash fingerprints over the normalized char stream
    * — one fused codegen'd pass (see [[graft.functions.WinnowFingerprint]]
    * for semantics, the DuckDB-recomputable hash, and why this must NOT
    * be written with higher-order functions). Empty array for docs
    * shorter than k normalized chars.
    */
  def winnowFingerprints(text: Column, k: Int = 5, w: Int = 4): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      WinnowFingerprint(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          regexp_replace(lower(text), "[^a-z0-9]", "")), k, w))

  /** Lexical highlighter (reference: internal/proxy/highlighter.go:41-171
    * — post-search markup of matched terms): wraps whole-word, case-
    * insensitive occurrences of the query terms in pre/post tags.
    */
  def highlight(c: Column, terms: Seq[String], pre: String = "<em>",
      post: String = "</em>"): Column = {
    val patt = terms.map(java.util.regex.Pattern.quote).mkString("(?i)\\b(", "|", ")\\b")
    regexp_replace(c, patt, pre + "$1" + post)
  }

  /** Analyzer-aware lexical highlighter (reference:
    * internal/proxy/highlighter.go:75-116 — the highlight task resolves
    * the FIELD's declared analyzer before tokenizing, so a field
    * declared with e.g. char_group delimiters highlights exactly the
    * spans its text_match matches): the query text tokenizes through
    * the field's analyzer pipeline (driver-side, cached), and doc-side
    * token boundaries come from the TOKENIZER's split class — not the
    * default `\b` word boundary. Case-insensitive iff the pipeline
    * lowercases. Filters that rewrite token surface forms (stemmer,
    * pinyin) highlight occurrences of their OUTPUT forms — synonym
    * expansion works because [[graft.functions.Analyzers.analyzeLocal]]
    * expands the query set. The jieba (CJK uni+bigram) tokenizer takes
    * its own pattern shape — see [[cjkMergedPattern]]. Every other
    * tokenizer without a contiguous-span split or a merge path (ngram,
    * lindera, …) is rejected by name — the reference serves those
    * through its offset-carrying tokenizer, which has no
    * boundary-class equivalent.
    */
  /** The analyzer-derived occurrence regex for `queryText` over a field
    * declared with `analyzerParams` — query tokens from the field's
    * pipeline, doc-side boundaries from the TOKENIZER's split class as
    * width-1 negative lookarounds (the boundary is never consumed, so
    * adjacent matches can share one delimiter), case-insensitive iff
    * the pipeline lowercases. None when the analyzed query is empty.
    */
  private def analyzerOccurrencePattern(analyzerParams: Map[String, String],
      queryText: String): Option[String] = {
    val qTokens = Analyzers.analyzeLocal(analyzerParams, queryText)
      .distinct.filter(_.nonEmpty)
    if (qTokens.isEmpty) return None
    val tokenizer = analyzerParams.getOrElse("tokenizer", "standard")
    if (tokenizer == "jieba") return Some(cjkMergedPattern(qTokens))
    val (nonDelim, lowercases) =
      tokenizer match {
        case "standard"   => ("[a-zA-Z0-9]", true) // standard lowercases
        case "whitespace" => ("\\S", false)
        case "char_group" =>
          val cls = Analyzers.charClass(
            analyzerParams.getOrElse("delims", " ").toSeq)
          (s"[^$cls]", false)
        case other => throw new IllegalArgumentException(
          s"highlight does not support tokenizer '$other' — no contiguous " +
            "token spans to wrap")
      }
    val filters = analyzerParams.get("filters").toSeq
      .flatMap(_.split(",")).map(_.trim)
    val ci = if (lowercases || filters.contains("lowercase")) "(?i)" else ""
    val alt = qTokens.map(java.util.regex.Pattern.quote).mkString("|")
    Some(s"$ci(?<!$nonDelim)($alt)(?!$nonDelim)")
  }

  /** Occurrence pattern for the jieba (CJK uni+bigram) tokenizer
    * (reference test_milvus_client_highlighter.py:703,751 — a query's
    * overlapping unigram/bigram hits on the same doc region merge into
    * ONE tag pair: searching 如同呼吸般起伏 over a doc containing the
    * phrase highlights `{如同呼吸般起伏}`, not seven nested marks).
    * CJK-only query tokens become a `(?:tok|…)+` alternation, longest
    * token first: the `+` consumes consecutive touching hits, so the
    * match region is exactly the union of overlapping/adjacent token
    * spans. The merge is EXACT for the uni+bigram analyzer because the
    * analyzed query always carries every character of every token as a
    * unigram token — coverage can always extend one character at a
    * time, so a maximal match = a maximal covered run. (With a
    * user-dict analyzer whose multi-char words lack their unigrams the
    * `+` falls back to leftmost/longest-first — still the reference's
    * behavior for non-overlapping dict hits.) Latin tokens out of the
    * mixed-text dispatch match as standard word tokens,
    * case-insensitively (the latin half of the pipeline lowercases).
    */
  private def cjkMergedPattern(qTokens: Seq[String]): String = {
    import java.lang.Character.UnicodeScript
    def isCjk(cp: Int): Boolean = UnicodeScript.of(cp) match {
      case UnicodeScript.HAN | UnicodeScript.HIRAGANA |
           UnicodeScript.KATAKANA | UnicodeScript.HANGUL => true
      case _ => false
    }
    val (cjk, latin) = qTokens.partition(
      _.codePoints().allMatch(cp => isCjk(cp)))
    def quoted(ts: Seq[String]) =
      ts.map(java.util.regex.Pattern.quote).mkString("|")
    val parts =
      // possessive `++`: nothing follows the group, so never giving
      // back is semantics-neutral and caps the matcher at one forward
      // pass over a long covered run (LOB-sized CJK payloads)
      (if (cjk.isEmpty) Nil
       else Seq(s"(?:${quoted(cjk.sortBy(t => -t.length))})++")) ++
      (if (latin.isEmpty) Nil
       else Seq(s"(?i:(?<![a-zA-Z0-9])(?:${quoted(latin)})(?![a-zA-Z0-9]))"))
    "(" + parts.mkString("|") + ")"
  }

  def highlightWith(c: Column, analyzerParams: Map[String, String],
      queryText: String, pre: String = "<em>", post: String = "</em>"): Column =
    analyzerOccurrencePattern(analyzerParams, queryText) match {
      case Some(patt) => regexp_replace(c, patt, pre + "$1" + post)
      case None       => c
    }

  /** Fragment-mode highlight (the reference highlighter's actual output
    * shape: `fragments` snippets around the matched spans, not the whole
    * marked document — see [[graft.functions.HighlightFragments]] for
    * the pinned option semantics). Returns `array<string>`.
    */
  def highlightFragmentsWith(c: Column, analyzerParams: Map[String, String],
      queryText: String, preTags: Seq[String] = Seq("<em>"),
      postTags: Seq[String] = Seq("</em>"), fragmentOffset: Int = 0,
      fragmentSize: Int = 100, numFragments: Int = 5): Column =
    analyzerOccurrencePattern(analyzerParams, queryText) match {
      case Some(patt) =>
        org.apache.spark.sql.graft.ColumnBridge.column(
          HighlightFragments(
            org.apache.spark.sql.graft.ColumnBridge.expression(c),
            patt, preTags, postTags, fragmentOffset, fragmentSize,
            numFragments))
      case None => array().cast("array<string>")
    }

  /** Multi-analyzer highlight (highlighter.go:97-116 — the field's
    * multi-analyzer NAME column picks each row's analyzer; rows whose
    * name has no declared analyzer take `"default"`): a CASE dispatch
    * over [[highlightWith]] columns, one branch per declared analyzer.
    */
  def highlightByAnalyzer(c: Column, nameCol: Column,
      analyzers: Map[String, Map[String, String]], queryText: String,
      pre: String = "<em>", post: String = "</em>"): Column = {
    require(analyzers.contains("default"),
      "multi-analyzer highlight requires a 'default' analyzer")
    val fallback = highlightWith(c, analyzers("default"), queryText, pre, post)
    analyzers.view.filterKeys(_ != "default").foldLeft(fallback) {
      case (acc, (name, params)) =>
        when(nameCol === name, highlightWith(c, params, queryText, pre, post))
          .otherwise(acc)
    }
  }

  // --- language ID (n-gram/stopword heuristic) -----------------------

  /** Tiny per-language stopword marker sets (public common words). */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "une", "dans", "pour", "que"),
    "es" -> Seq("el", "la", "los", "las", "es", "una", "por", "con", "para", "del"),
    "it" -> Seq("il", "la", "di", "che", "non", "una", "per", "con", "del", "sono"),
    "pt" -> Seq("o", "a", "os", "as", "de", "que", "um", "uma", "para", "com"))

  /** Per-language stopword hit count over a token array. */
  def langScore(tokens: Column, lang: String): Column =
    size(array_intersect(tokens, array(LangMarkers(lang).map(lit): _*)))

  /** Heuristic language ID: the language with the most distinct stopword
    * hits; "und" (undetermined) when no marker matches.
    */
  def langId(text: Column): Column = {
    val tokens = tokenize(text)
    val scored = LangMarkers.keys.toSeq.sorted.map { lang =>
      struct(langScore(tokens, lang).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") === 0, "und").otherwise(best.getField("lang"))
  }

  // --- quality scoring -----------------------------------------------

  /** Ratio of non-alphanumeric, non-space chars to total length. */
  def punctRatio(c: Column): Column = {
    val total = length(c).cast("double")
    when(total === 0.0, 0.0).otherwise(
      length(regexp_replace(c, "[A-Za-z0-9\\s]", "")).cast("double") / total)
  }

  /** Mean token length in characters. */
  def meanTokenLength(c: Column): Column = {
    val toks = tokenize(c)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
  }

  /** Composite document quality score in [0,1] — length, punctuation,
    * stopword presence, token-length sanity (the usual pretraining
    * heuristics; each sub-signal clamped then averaged).
    */
  def qualityScore(text: Column): Column = {
    val toks = tokenize(text)
    val nTok = size(toks).cast("double")
    val lengthOk = least(nTok / 20.0, lit(1.0)) // ≥20 tokens → full credit
    val punctOk = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4.0)
    val enStops = langScore(toks, "en").cast("double")
    val stopOk = least(enStops / 3.0, lit(1.0))
    val mtl = meanTokenLength(text)
    val tokLenOk = when(mtl >= 2.5 && mtl <= 12.0, 1.0).otherwise(0.0)
    round((lengthOk + punctOk + stopOk + tokLenOk) / 4.0, 4)
  }

  // ---- PII scrubbing (training-pipeline redaction pass) ----

  /** Conservative PII patterns: email, IPv4, international-ish phone
    * (7+ chars of digits/separators, digit-delimited). Deliberately
    * RE2-compatible (no lookaround) so the exact same regexes run in
    * Spark's codegen'd `regexp_replace`, the DuckDB oracle, and any
    * external audit tooling; greedy leftmost matching consumes a whole
    * digit run, so long ids aren't half-redacted.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4"  -> "([0-9]{1,3}\\.){3}[0-9]{1,3}",
    "phone" -> "\\+?[0-9][0-9 ()./-]{5,}[0-9]")

  /** Redact PII spans to `[TYPE]` tags — one chained `regexp_replace`
    * per pattern, all codegen'd, no UDFs; order matters (emails first so
    * their digit runs aren't half-eaten by the phone pattern, IPv4
    * before phone because the phone separator class includes dots).
    */
  def scrubPii(c: Column): Column =
    PiiPatterns.foldLeft(c) { case (acc, (name, re)) =>
      regexp_replace(acc, re, s"[${name.toUpperCase}]")
    }

  /** Count of PII matches per document (for filtering/reporting). */
  def piiCount(c: Column): Column =
    PiiPatterns.map { case (_, re) => size(regexp_extract_all(c, lit(re), lit(0))) }
      .reduce(_ + _)
}
