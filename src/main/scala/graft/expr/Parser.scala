package graft.expr

import Lexer._

/** Hand-written Pratt parser for the filter-expression language.
  *
  * Precedence follows the reference grammar's alternative order
  * (reference: internal/parser/planparserv2/Plan.g4 — note the grammar
  * places bitwise &, ^, | BELOW equality, unlike C):
  *
  *   primary/postfix > ** > unary > * / % > + - > << >> >
  *   in/like/=~ > range/relational > == != > & > ^ > | > and > or
  */
object Parser {

  case class ParseError(msg: String) extends RuntimeException(msg)

  def parse(input: String): Node = {
    val tokens = Lexer.tokenize(input)
    val p = new P(tokens)
    val node = p.parseExpr(0)
    p.expectEof()
    node
  }

  private val POW = 90
  private val UNARY = 80
  private val MUL = 70
  private val ADD = 60
  private val SHIFT = 50
  private val TERM = 40 // in / like / =~ / !~
  private val REL = 35
  private val EQ = 30
  private val BAND = 27
  private val BXOR = 26
  private val BOR = 25
  private val LAND = 20
  private val LOR = 10

  private class P(tokens: Vector[Token]) {
    private var pos = 0

    private def cur: Token = tokens(pos)
    private def la(off: Int): Token =
      if (pos + off < tokens.length) tokens(pos + off) else TEof
    private def advance(): Token = { val t = cur; pos += 1; t }

    private def expectOp(text: String): Unit = cur match {
      case TOp(t) if t == text => pos += 1
      case other               => throw ParseError(s"expected '$text', got $other")
    }

    def expectEof(): Unit =
      if (cur != TEof) throw ParseError(s"trailing input at token $cur")

    /** A regex operand: string literals take the TOLERANT extraction
      * (reference extractRegexPattern — `\d`/`\.`/`\p{...}` pass
      * through un-mangled, unlike the strict plain-string rules);
      * anything else (template vars, parenthesized exprs) parses
      * normally.
      */
    private def regexOperand(): Node = cur match {
      case t: Lexer.TString => advance(); StringLit(t.regexValue)
      case _                => parseExpr(TERM + 1)
    }

    def parseExpr(minBp: Int): Node = {
      var left = parsePrefix()
      var continue = true
      while (continue) {
        cur match {
          case TOp("**") if POW >= minBp =>
            advance(); left = Binary(BinOp.Pow, left, parseExpr(POW)) // right-assoc
          case TOp("*") if MUL >= minBp =>
            advance(); left = Binary(BinOp.Mul, left, parseExpr(MUL + 1))
          case TOp("/") if MUL >= minBp =>
            advance(); left = Binary(BinOp.Div, left, parseExpr(MUL + 1))
          case TOp("%") if MUL >= minBp =>
            advance(); left = Binary(BinOp.Mod, left, parseExpr(MUL + 1))
          case TOp("+") if ADD >= minBp =>
            advance(); left = Binary(BinOp.Add, left, parseExpr(ADD + 1))
          case TOp("-") if ADD >= minBp =>
            advance(); left = Binary(BinOp.Sub, left, parseExpr(ADD + 1))
          case TOp("<<") if SHIFT >= minBp =>
            advance(); left = Binary(BinOp.Shl, left, parseExpr(SHIFT + 1))
          case TOp(">>") if SHIFT >= minBp =>
            advance(); left = Binary(BinOp.Shr, left, parseExpr(SHIFT + 1))

          case TKeyword("in") if TERM >= minBp =>
            advance(); left = In(left, parseExpr(TERM + 1), negated = false)
          case TKeyword("not") if TERM >= minBp && la(1) == TKeyword("in") =>
            advance(); advance(); left = In(left, parseExpr(TERM + 1), negated = true)
          case TKeyword("like") if TERM >= minBp =>
            advance()
            cur match {
              case TString(patt) => advance(); left = Like(left, patt)
              case other         => throw ParseError(s"LIKE requires string pattern, got $other")
            }
          case TOp("=~") if TERM >= minBp =>
            advance(); left = RegexMatch(left, regexOperand(), negated = false)
          case TOp("!~") if TERM >= minBp =>
            advance(); left = RegexMatch(left, regexOperand(), negated = true)

          case TOp("<") | TOp("<=") if REL >= minBp =>
            val op1 = advance().asInstanceOf[TOp].text
            val mid = parseExpr(REL + 1)
            cur match {
              case TOp("<") | TOp("<=") =>
                val op2 = advance().asInstanceOf[TOp].text
                val hi = parseExpr(REL + 1)
                left = RangeCmp(left, op1 == "<=", mid, op2 == "<=", hi)
              case _ =>
                left = Binary(if (op1 == "<") BinOp.Lt else BinOp.Le, left, mid)
            }
          case TOp(">") | TOp(">=") if REL >= minBp =>
            val op1 = advance().asInstanceOf[TOp].text
            val mid = parseExpr(REL + 1)
            cur match {
              case TOp(">") | TOp(">=") =>
                val op2 = advance().asInstanceOf[TOp].text
                val lo = parseExpr(REL + 1)
                // a > x > b  ≡  b < x < a
                left = RangeCmp(lo, op2 == ">=", mid, op1 == ">=", left)
              case _ =>
                left = Binary(if (op1 == ">") BinOp.Gt else BinOp.Ge, left, mid)
            }

          case TOp("==") if EQ >= minBp =>
            advance(); left = Binary(BinOp.Eq, left, parseExpr(EQ + 1))
          case TOp("!=") if EQ >= minBp =>
            advance(); left = Binary(BinOp.Ne, left, parseExpr(EQ + 1))

          case TOp("&") if BAND >= minBp =>
            advance(); left = Binary(BinOp.BAnd, left, parseExpr(BAND + 1))
          case TOp("^") if BXOR >= minBp =>
            advance(); left = Binary(BinOp.BXor, left, parseExpr(BXOR + 1))
          case TOp("|") if BOR >= minBp =>
            advance(); left = Binary(BinOp.BOr, left, parseExpr(BOR + 1))

          case TOp("&&") if LAND >= minBp =>
            advance(); left = Binary(BinOp.And, left, parseExpr(LAND + 1))
          case TKeyword("and") if LAND >= minBp =>
            advance(); left = Binary(BinOp.And, left, parseExpr(LAND + 1))
          case TOp("||") if LOR >= minBp =>
            advance(); left = Binary(BinOp.Or, left, parseExpr(LOR + 1))
          case TKeyword("or") if LOR >= minBp =>
            advance(); left = Binary(BinOp.Or, left, parseExpr(LOR + 1))

          // postfix IS [NOT] NULL
          case TKeyword("is") =>
            advance()
            cur match {
              case TKeyword("not") if la(1) == TKeyword("null") =>
                advance(); advance(); left = IsNull(left, negated = true)
              case TKeyword("null") =>
                advance(); left = IsNull(left, negated = false)
              case other => throw ParseError(s"expected NULL after IS, got $other")
            }

          case _ => continue = false
        }
      }
      left
    }

    private def parsePrefix(): Node = cur match {
      case TInt(v)    => advance(); IntLit(v)
      case TFloat(v)  => advance(); FloatLit(v)
      case TString(v) => advance(); StringLit(v)
      case TKeyword("true")  => advance(); BoolLit(true)
      case TKeyword("false") => advance(); BoolLit(false)
      case TKeyword("not") => advance(); Unary(UnaryOp.Not, parseExpr(UNARY))
      case TOp("!")        => advance(); Unary(UnaryOp.Not, parseExpr(UNARY))
      case TOp("~")        => advance(); Unary(UnaryOp.BNot, parseExpr(UNARY))
      case TOp("-")        => advance(); Unary(UnaryOp.Neg, parseExpr(UNARY))
      case TOp("+")        => advance(); Unary(UnaryOp.Pos, parseExpr(UNARY))
      case TKeyword("exists") => advance(); ExistsPath(parseExpr(UNARY))
      case TKeyword("iso") =>
        // iso'...' OP field [± INTERVAL '...']  (TimestamptzCompareReverse)
        advance()
        val ts = cur match {
          case TString(s) => advance(); s
          case other      => throw ParseError(s"expected string after iso, got $other")
        }
        cur match {
          case TOp(o @ ("<" | "<=" | ">" | ">=" | "==" | "!=")) =>
            advance()
            val field = cur match {
              case TIdent(f) => advance(); f
              case other => throw ParseError(s"expected field in timestamptz compare, got $other")
            }
            val (sign, interval) = parseIntervalSuffix()
            TsCompare(field, sign, interval, binOpOf(o), ts, reversed = true)
          case _ =>
            // plain iso literal operand: `ts_col == iso'...'`
            IsoLit(ts)
        }

      case TOp("(") =>
        advance(); val e = parseExpr(0); expectOp(")"); e
      case TOp("[") =>
        advance()
        val items = Seq.newBuilder[Node]
        if (cur != TOp("]")) {
          items += parseExpr(0)
          while (cur == TOp(",")) {
            advance()
            if (cur != TOp("]")) items += parseExpr(0)
          }
        }
        expectOp("]")
        ArrayLit(items.result())
      case TOp("{") =>
        advance()
        val name = cur match {
          case TIdent(id) => advance(); id
          case other      => throw ParseError(s"expected template name, got $other")
        }
        expectOp("}")
        TemplateVar(name)

      case TStructSub(name) => advance(); StructSubField(name)

      case TIdent(name) =>
        advance()
        cur match {
          case TOp("(") => parseCall(name)
          case TOp("[") => parsePath(name)
          case TOp("+") | TOp("-") if la(1) == TKeyword("interval") =>
            // field ± INTERVAL '...' OP iso'...'  (TimestamptzCompareForward)
            val (sign, interval) = parseIntervalSuffix()
            val op = cur match {
              case TOp(o @ ("<" | "<=" | ">" | ">=" | "==" | "!=")) => advance(); o
              case other => throw ParseError(s"expected comparison in timestamptz expr, got $other")
            }
            cur match {
              case TKeyword("iso") =>
                advance()
                val ts = cur match {
                  case TString(s) => advance(); s
                  case other      => throw ParseError(s"expected string after iso, got $other")
                }
                TsCompare(name, sign, interval, binOpOf(op), ts, reversed = false)
              case other => throw ParseError(s"expected iso'...' in timestamptz expr, got $other")
            }
          case TKeyword("interval") => // shouldn't happen standalone
            throw ParseError("INTERVAL without preceding +/-")
          case _ => Ident(name)
        }

      case TKeyword("null") =>
        // reference #50882 (test_filter_expression_issue_mining.py:649):
        // a NULL literal in operand position — `id in [1, NULL, 2]` —
        // gets a MEANINGFUL rejection naming the construct, never a
        // confusing field-resolution error for a column called "null"
        throw ParseError(
          "NULL literal is not supported in expressions — use `is null` / `is not null`")

      case other => throw ParseError(s"unexpected token $other")
    }

    /** `+ INTERVAL 'str'` / `- INTERVAL 'str'` suffix, if present. */
    private def parseIntervalSuffix(): (Int, Option[String]) = cur match {
      case TOp("+") | TOp("-") if la(1) == TKeyword("interval") =>
        val sign = if (advance() == TOp("+")) 1 else -1
        advance() // interval
        cur match {
          case TString(s) => advance(); (sign, Some(s))
          case other      => throw ParseError(s"expected string after INTERVAL, got $other")
        }
      case _ => (1, None)
    }

    private def binOpOf(op: String): BinOp = op match {
      case "<" => BinOp.Lt; case "<=" => BinOp.Le
      case ">" => BinOp.Gt; case ">=" => BinOp.Ge
      case "==" => BinOp.Eq; case "!=" => BinOp.Ne
    }

    /** field["a"][0]... JSON/array path */
    private def parsePath(field: String): Node = {
      val parts = Seq.newBuilder[Either[String, Int]]
      while (cur == TOp("[")) {
        advance()
        cur match {
          case TString(s) => advance(); parts += Left(s)
          case TInt(v)    => advance(); parts += Right(v.toInt)
          // bare identifier: struct sub-field (grammar StructFieldIdentifier
          // `f[sub]` / StructIndexFieldIdentifier `f[0][sub]`)
          case TIdent(s)  => advance(); parts += Left(s)
          case other      => throw ParseError(s"expected string, int, or identifier index, got $other")
        }
        expectOp("]")
      }
      JsonPath(field, parts.result())
    }

    /** name(arg, ..., opt = v, ...) */
    private def parseCall(name: String): Node = {
      expectOp("(")
      val args = Seq.newBuilder[Node]
      val opts = Map.newBuilder[String, Node]
      var first = true
      while (cur != TOp(")")) {
        if (!first) expectOp(",")
        first = false
        if (cur == TOp(")")) () // trailing comma
        else (cur, la(1)) match {
          case (TIdent(optName), TOp("=")) =>
            advance(); advance()
            opts += (optName.toLowerCase -> parseExpr(0))
          case _ =>
            args += parseExpr(0)
        }
      }
      expectOp(")")
      Call(name.toLowerCase, args.result(), opts.result())
    }
  }
}
