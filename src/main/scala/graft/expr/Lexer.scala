package graft.expr

/** Tokenizer for the filter-expression language (reference grammar:
  * internal/parser/planparserv2/Plan.g4 lexer rules; new implementation).
  */
object Lexer {

  sealed trait Token
  case class TInt(v: Long) extends Token
  case class TFloat(v: Double) extends Token

  /** A string literal carrying its RAW inner text — escape processing
    * is deferred to the CONSUMER, like the reference's split between
    * convertEscapeSingle (strict strconv.Unquote rules for plain string
    * values) and extractRegexPattern (regex operands keep `\d`, `\.`,
    * `\p{...}` as-is; parser_visitor.go:674-711). [[v]] applies the
    * strict rules and throws LazILY on unknown escapes, so a regex
    * operand holding `\p{Han}` never pays the strict check.
    */
  final class TString(val rawInner: String, val isRaw: Boolean,
      val quote: Char) extends Token {
    /** Plain-string value (strict escapes; raw strings verbatim). */
    lazy val v: String = cookString(rawInner, isRaw)
    /** Regex-operand value (backslash sequences preserved as-is; only
      * `\<quote>` and `\\` are processed; raw strings verbatim).
      */
    lazy val regexValue: String = cookRegex(rawInner, isRaw, quote)
    override def toString: String = s"TString($rawInner)"
    override def hashCode: Int = rawInner.hashCode
    override def equals(o: Any): Boolean = o match {
      case t: TString => t.rawInner == rawInner && t.isRaw == isRaw
      case _          => false
    }
  }
  object TString {
    def unapply(t: TString): Option[String] = Some(t.v)
  }
  case class TIdent(name: String) extends Token
  /** `$[field]` struct-array sub-field reference (element_filter scope). */
  case class TStructSub(name: String) extends Token
  /** Multi- and single-char operators and punctuation, by literal text. */
  case class TOp(text: String) extends Token
  /** Case-insensitive word keywords: and or not in like exists is null
    * true false iso interval
    */
  case class TKeyword(word: String) extends Token
  case object TEof extends Token

  private val keywords = Set(
    "and", "or", "not", "in", "like", "exists", "is", "null",
    "true", "false", "iso", "interval")

  case class LexError(msg: String, pos: Int) extends RuntimeException(s"$msg at $pos")

  /** Strict escape cooking for a NORMAL string's raw inner text.
    * The reference's arbiter is Go's strconv.Unquote, reached through a
    * quote-normalization pre-pass (convertEscapeSingle,
    * planparserv2/utils.go:622-661): bare `"` gains an escape, `\'`
    * drops its backslash, then the whole thing is unquoted as a Go
    * double-quoted literal. Phase 1 here mirrors that pre-pass
    * character-for-character (the escapeChCount parity walk); phase 2
    * ([[unquoteGo]]) ports strconv.UnquoteChar's exact rules. Raw
    * strings are verbatim (VisitRawString).
    */
  private[expr] def cookString(inner: String, isRaw: Boolean): String = {
    if (isRaw) return inner
    val norm = new StringBuilder
    var bs = 0
    var k = 0
    while (k < inner.length) {
      val c = inner.charAt(k)
      if (c == '\\') { bs += 1; norm += c }
      else {
        if (c == '"' && bs % 2 == 0) { norm += '\\'; norm += '"' }
        else if (c == '\'' && bs % 2 != 0) {
          norm.setLength(norm.length - 1); norm += '\''
        } else norm += c
        bs = 0
      }
      k += 1
    }
    unquoteGo(norm.toString)
  }

  /** Byte-exact port of Go strconv.Unquote for the inner text of a
    * double-quoted literal (Go strconv/quote.go, unquoteChar with
    * quote='"'): `\x` takes EXACTLY 2 hex digits and emits a raw BYTE
    * (so `"\x41B"` is "AB", and two `\x` escapes can compose one UTF-8
    * code point); octal takes EXACTLY 3 digits with value ≤ 255 and
    * also emits a byte (`"\10"` is a syntax error); `\u`/`\U` take
    * exactly 4/8 hex digits and reject surrogate halves and
    * > 0x10FFFF (utf8.ValidRune); a raw newline is rejected (Unquote's
    * contains(s, '\n') pre-check); unknown escapes (`\%`, `\d`, `\?`)
    * are errors. Output accumulates as UTF-8 bytes and decodes at the
    * end, reproducing Go's byte-string composition.
    */
  private def unquoteGo(s: String): String = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    def hex(c: Char, at: Int): Int = {
      val v = Character.digit(c, 16)
      if (v < 0) throw LexError(s"invalid hex digit '$c' in escape", at)
      v
    }
    def putRune(cp: Int): Unit = {
      val bytes = new String(Character.toChars(cp))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.write(bytes, 0, bytes.length)
    }
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      // strconv.Unquote pre-checks only '\n' (contains(s, '\n')); a bare
      // carriage return inside a quoted literal is legal and passes
      // through as its byte.
      if (c == '\n')
        throw LexError("raw newline in string literal", i)
      if (c != '\\') {
        val cp = s.codePointAt(i)
        putRune(cp)
        i += Character.charCount(cp)
      } else {
        if (i + 1 >= n) throw LexError("trailing backslash in string", i)
        val e = s.charAt(i + 1)
        i += 2
        e match {
          case 'a'  => out.write(7)
          case 'b'  => out.write(8)
          case 'f'  => out.write(12)
          case 'n'  => out.write(10)
          case 'r'  => out.write(13)
          case 't'  => out.write(9)
          case 'v'  => out.write(11)
          case '\\' => out.write('\\'.toInt)
          case '"'  => out.write('"'.toInt)
          case 'x' =>
            if (i + 2 > n)
              throw LexError("short \\x escape (need exactly 2 hex digits)", i)
            out.write((hex(s.charAt(i), i) << 4) | hex(s.charAt(i + 1), i + 1))
            i += 2
          case 'u' | 'U' =>
            val nd = if (e == 'u') 4 else 8
            if (i + nd > n)
              throw LexError(s"short \\$e escape (need exactly $nd hex digits)", i)
            var v = 0L
            var j = 0
            while (j < nd) { v = (v << 4) | hex(s.charAt(i + j), i + j); j += 1 }
            i += nd
            if (v > 0x10FFFFL || (v >= 0xD800L && v <= 0xDFFFL))
              throw LexError(f"invalid unicode code point U+$v%X in escape", i)
            putRune(v.toInt)
          case d if d >= '0' && d <= '7' =>
            if (i + 2 > n)
              throw LexError("short octal escape (need exactly 3 digits)", i)
            var v = d - '0'
            var j = 0
            while (j < 2) {
              val oc = s.charAt(i + j)
              if (oc < '0' || oc > '7')
                throw LexError(s"invalid octal digit '$oc' in escape", i + j)
              v = v * 8 + (oc - '0')
              j += 1
            }
            i += 2
            if (v > 255)
              throw LexError(s"octal escape value $v exceeds 255", i)
            out.write(v)
          case other =>
            throw LexError(s"invalid escape sequence \\$other in string", i)
        }
      }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Regex-operand extraction (reference extractRegexPattern,
    * parser_visitor.go:674-711): backslash sequences pass through AS-IS
    * so `\d`, `\.`, `\p{Han}`, `\n` reach the regex engine un-mangled;
    * only `\<quote>` and `\\` are processed (the delimiter model stays
    * consistent with the strict path).
    */
  private[expr] def cookRegex(inner: String, isRaw: Boolean, quote: Char): String = {
    if (isRaw) return inner
    val sb = new StringBuilder
    var i = 0
    while (i < inner.length) {
      val ch = inner.charAt(i)
      if (ch == '\\' && i + 1 < inner.length) {
        val next = inner.charAt(i + 1)
        if (next == quote) sb += quote
        else if (next == '\\') sb += '\\'
        else { sb += '\\'; sb += next }
        i += 2
      } else { sb += ch; i += 1 }
    }
    sb.toString
  }

  def tokenize(input: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = input.length

    def peek(off: Int = 0): Char = if (i + off < n) input.charAt(i + off) else ' '

    // scans a quoted string starting at input(i); advances i past it.
    // Escape processing is DEFERRED (see TString): here a backslash
    // just consumes the next char, which also implements the raw-string
    // rule that a backslash before the delimiter prevents termination.
    def lexString(raw: Boolean): TString = {
      val quote = input.charAt(i)
      i += 1
      val start = i
      var closed = false
      while (i < n && !closed) {
        val ch = input.charAt(i)
        if (ch == quote) { closed = true; i += 1 }
        else if (ch == '\\') {
          i += 1
          if (i >= n) throw LexError("unterminated escape", i)
          i += 1
        } else i += 1
      }
      if (!closed) throw LexError("unterminated string", i)
      new TString(input.substring(start, i - 1), raw, quote)
    }

    while (i < n) {
      val c = input.charAt(i)
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n') { i += 1 }
      else if (c.isDigit || (c == '.' && peek(1).isDigit)) {
        val start = i
        var isFloat = false
        if (c == '0' && (peek(1) == 'x' || peek(1) == 'X')) {
          i += 2
          while (i < n && (peek().isDigit || "abcdefABCDEF".indexOf(peek().toInt) >= 0)) i += 1
          out += TInt(java.lang.Long.parseLong(input.substring(start + 2, i), 16))
        } else if (c == '0' && (peek(1) == 'b' || peek(1) == 'B')) {
          i += 2
          while (i < n && (peek() == '0' || peek() == '1')) i += 1
          out += TInt(java.lang.Long.parseLong(input.substring(start + 2, i), 2))
        } else {
          while (i < n && peek().isDigit) i += 1
          if (peek() == '.') {
            isFloat = true; i += 1
            while (i < n && peek().isDigit) i += 1
          }
          if (peek() == 'e' || peek() == 'E') {
            isFloat = true; i += 1
            if (peek() == '+' || peek() == '-') i += 1
            while (i < n && peek().isDigit) i += 1
          }
          val text = input.substring(start, i)
          if (isFloat) out += TFloat(text.toDouble)
          else if (text.length > 1 && text.startsWith("0"))
            out += TInt(java.lang.Long.parseLong(text, 8)) // octal per grammar
          else out += TInt(text.toLong)
        }
      } else if (c == '$' && peek(1) == '[') {
        // $[ident] — struct sub-field (grammar StructSubFieldIdentifier)
        i += 2
        val start = i
        while (i < n && (peek().isLetterOrDigit || peek() == '_')) i += 1
        if (i == start || peek() != ']')
          throw LexError("expected $[identifier]", i)
        out += TStructSub(input.substring(start, i))
        i += 1 // ']'
      } else if (c.isLetter || c == '_' || c == '$') {
        if ((c == 'r' || c == 'R') && (peek(1) == '\'' || peek(1) == '"')) {
          i += 1
          out += lexString(raw = true)
        } else if ((c == 'u' || c == 'U' || c == 'L') && (peek(1) == '\'' || peek(1) == '"')) {
          // EncodingPrefix (u/U/L) — strings are already unicode here
          i += 1
          out += lexString(raw = false)
        } else if (c == 'u' && peek(1) == '8' && (peek(2) == '\'' || peek(2) == '"')) {
          i += 2 // u8 prefix
          out += lexString(raw = false)
        } else {
          val start = i
          i += 1
          while (i < n && (peek().isLetterOrDigit || peek() == '_')) i += 1
          val word = input.substring(start, i)
          if (keywords.contains(word.toLowerCase)) out += TKeyword(word.toLowerCase)
          else out += TIdent(word)
        }
      } else if (c == '\'' || c == '"') {
        out += lexString(raw = false)
      } else {
        val two = if (i + 1 < n) input.substring(i, i + 2) else ""
        two match {
          case "**" | "<<" | ">>" | "<=" | ">=" | "==" | "!=" | "=~" | "!~" | "&&" | "||" =>
            out += TOp(two); i += 2
          case _ =>
            if ("+-*/%<>&|^~!()[]{},=".indexOf(c.toInt) >= 0) {
              out += TOp(c.toString); i += 1
            } else throw LexError(s"unexpected character '$c'", i)
        }
      }
    }
    out += TEof
    out.result()
  }
}
