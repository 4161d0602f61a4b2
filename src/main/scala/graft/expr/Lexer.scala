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

  /** Strict escape cooking for a NORMAL string's raw inner text
    * (strconv.Unquote parity via convertEscapeSingle,
    * planparserv2/utils.go:622-661 — unknown escapes like `\%` or `\d`
    * are errors; write `\\%` or a raw string). Raw strings are verbatim
    * (VisitRawString).
    */
  private[expr] def cookString(inner: String, isRaw: Boolean): String = {
    if (isRaw) return inner
    val sb = new StringBuilder
    var i = 0
    val n = inner.length
    while (i < n) {
      val ch = inner.charAt(i)
      if (ch == '\\') {
        i += 1
        val esc = inner.charAt(i) // lexString guarantees a next char
        esc match {
          case 'n' => sb += '\n'; i += 1
          case 't' => sb += '\t'; i += 1
          case 'r' => sb += '\r'; i += 1
          case 'b' => sb += '\b'; i += 1
          case 'f' => sb += '\f'; i += 1
          case 'a' => sb += 7.toChar; i += 1
          case 'v' => sb += 11.toChar; i += 1
          case 'x' => // \xHH.. hex escape (grammar EscapeSequence)
            i += 1
            val st = i
            while (i < n && i - st < 8 &&
              "0123456789abcdefABCDEF".indexOf(inner.charAt(i).toInt) >= 0) i += 1
            if (i == st) throw LexError("empty \\x escape", i)
            sb += Integer.parseInt(inner.substring(st, i), 16).toChar
          case 'u' | 'U' => // \uHHHH / \UHHHHHHHH universal char
            val quads = if (esc == 'u') 4 else 8
            i += 1
            if (i + quads > n) throw LexError("short unicode escape", i)
            val cp = Integer.parseInt(inner.substring(i, i + quads), 16)
            sb ++= Character.toChars(cp)
            i += quads
          case d if d >= '0' && d <= '7' => // octal, 1-3 digits
            val st = i
            while (i < n && i - st < 3 &&
              inner.charAt(i) >= '0' && inner.charAt(i) <= '7') i += 1
            sb += Integer.parseInt(inner.substring(st, i), 8).toChar
          case '\\' | '\'' | '"' => sb += esc; i += 1
          case other =>
            throw LexError(s"invalid escape sequence \\$other in string", i)
        }
      } else { sb += ch; i += 1 }
    }
    sb.toString
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
