package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Add => CatalystAdd, Cast, EvalMode, Expression => CatalystExpr, Like => CatalystLike, Literal, Multiply => CatalystMultiply, Subtract => CatalystSubtract}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Compiles a filter-expression string into a Catalyst `Column`.
  *
  * This is the Spark-side equivalent of the reference's expression
  * compiler (reference: internal/parser/planparserv2/plan_parser_v2.go →
  * planpb.Expr → segcore kernels, SURVEY.md §2.1). We compile straight to
  * Catalyst expressions so every filter benefits from predicate pushdown,
  * Parquet row-group pruning, and whole-stage codegen — the Spark analogue
  * of the reference's index fast paths + zone-map skipping.
  */
object ExprCompiler {

  /** The (field → match query texts) of a filter's text-match
    * constructs (reference: highlighter.go initHighlightQueries — the
    * highlight_query mode collects the TextMatch/PhraseMatch queries
    * per field from the request's own filter instead of taking caller
    * terms). Template variables resolve through `params`; the
    * element-quantifier overloads of match_* (non-string second arg)
    * are not text queries and do not collect.
    */
  def matchQueriesOf(expr: String,
      params: Map[String, Any] = Map.empty): Map[String, Seq[String]] = {
    val textCalls = Set("text_match", "phrase_match", "text_match_fuzzy",
      "match_all", "match_any", "match_least", "match_most", "match_exact")
    def str(n: Node): Option[String] = n match {
      case StringLit(v)   => Some(v)
      case TemplateVar(t) => params.get(t).collect { case v: String => v }
      case _              => None
    }
    def walk(n: Node): Seq[(String, String)] = n match {
      case Call(name, args, opts) =>
        val own = (name, args) match {
          case (nm, Seq(Ident(f), q, _*)) if textCalls.contains(nm) =>
            str(q).map(f -> _).toSeq
          case _ => Nil
        }
        own ++ args.flatMap(walk) ++ opts.valuesIterator.flatMap(walk)
      case Binary(_, l, r)             => walk(l) ++ walk(r)
      case Unary(_, c)                 => walk(c)
      case RangeCmp(lo, _, t, _, hi)   => walk(lo) ++ walk(t) ++ walk(hi)
      case In(t, v, _)                 => walk(t) ++ walk(v)
      case RegexMatch(t, pt, _)        => walk(t) ++ walk(pt)
      case IsNull(t, _)                => walk(t)
      case ExistsPath(t)               => walk(t)
      case Like(t, _)                  => walk(t)
      case ArrayLit(items)             => items.flatMap(walk)
      case _                           => Nil
    }
    walk(Parser.parse(expr)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }


  case class Ctx(
      schema: StructType,
      /** StringType columns that hold JSON documents. */
      jsonColumns: Set[String] = Set.empty,
      /** Dynamic-field catch-all column (reference: `$meta`). */
      metaColumn: Option[String] = None,
      /** Template variable values (`{name}` placeholders). */
      params: Map[String, Any] = Map.empty,
      /** Seed for random_sample so plans stay deterministic per query. */
      sampleSeed: Long = 42L,
      /** Lambda element binding while compiling an `element_filter`
        * element expression: the bound element Column plus its struct
        * schema (None for scalar arrays, where `$[x]` is the element
        * itself).
        */
      element: Option[(Column, Option[StructType])] = None,
      /** Reject identifiers absent from `schema` at COMPILE time instead
        * of deferring to Catalyst. The facade needs this: Spark's
        * ResolveMissingReferences resolves filter attributes through a
        * projection, so a filter on a schema-dropped field would
        * otherwise silently read the masked physical column.
        */
      strictColumns: Boolean = false,
      /** IANA timezone for NAIVE timestamptz literals (reference: the
        * `timezone` collection/database property, pkg/util/timestamptz
        * ParseTimeTz — TZ-aware strings keep their offset, naive ones
        * are interpreted here; default UTC).
        */
      timezone: String = "UTC",
      /** Int64 columns that CARRY the timestamptz domain (epoch-nanos —
        * the engine's MVCC ts columns plus any schema-declared
        * TIMESTAMPTZ field normalized at the load boundary). Only these
        * take the iso-literal epoch fold; a plain int64 field compared
        * against an iso literal is the reference's type-mismatch error,
        * not a silent epoch compare.
        */
      tstzFields: Set[String] = Set("ts", "_ts"),
      /** Set while compiling the operands of an integral arithmetic
        * tree that cannot be proven to fit DECIMAL(38,0): the whole
        * tree must then evaluate in plain int64 (wrap on overflow, the
        * reference's native kernel behavior) — a fitting SUBTREE going
        * decimal under a non-fitting parent would overflow decimal into
        * non-ANSI nulls and silently drop rows.
        */
      forcePlainArith: Boolean = false,
      /** Fields DECLARED without enable_match: text_match /
        * phrase_match / token match_* over them raise the reference's
        * "does not enable match" error at compile (proxy-side
        * validation — test_milvus_client_text_lob.py:2260). Undeclared
        * fields stay permissive, so schemaless DataFrame use keeps
        * working.
        */
      noMatchFields: Set[String] = Set.empty,
      /** Per-field analyzer params (the FieldSchema analyzer_params of
        * fields declared with enable_analyzer and a NON-DEFAULT
        * pipeline): token-matching constructs tokenize the column AND
        * the query with the field's declared analyzer instead of the
        * default tokenizer, the reference's TextMatchIndex behavior.
        * Fields absent here keep the default pipeline.
        */
      fieldAnalyzers: Map[String, Map[String, String]] = Map.empty) {

    def fieldType(name: String): Option[DataType] =
      schema.fields.find(_.name == name).map(_.dataType)
    def isJson(name: String): Boolean =
      jsonColumns.contains(name) || name == "$meta"
  }

  case class CompileError(msg: String) extends RuntimeException(msg)

  def compile(exprStr: String, df: DataFrame, jsonColumns: Set[String] = Set.empty,
      params: Map[String, Any] = Map.empty): Column =
    compile(Parser.parse(exprStr), Ctx(df.schema, jsonColumns, params = params))

  def compile(exprStr: String, ctx: Ctx): Column =
    compile(Parser.parse(exprStr), ctx)

  // ---------------------------------------------------------------

  private def tryCast(c: Column, dt: DataType): Column = {
    val e = ColumnBridge.expression(c)
    ColumnBridge.column(Cast(e, dt, None, EvalMode.TRY))
  }

  /** Static type of a literal-ish node, for JSON-path cast targets. */
  /** The static Spark type of a TYPED column reference (never a JSON
    * path — those take the typed-bucket semantics instead): a plain
    * field, an element sub-field inside an element expression, or a
    * `f[idx][sub]` struct-array access.
    */
  private def typedColumnType(n: Node, ctx: Ctx): Option[DataType] = n match {
    case Ident(f) if !isJsonPathNode(n, ctx) => ctx.fieldType(f)
    case StructSubField(name) =>
      ctx.element.flatMap(_._2).flatMap(st =>
        st.fields.find(_.name == name).map(_.dataType))
    case JsonPath(f, parts) if !isJsonPathNode(n, ctx) =>
      ctx.fieldType(f).flatMap { t =>
        parts.foldLeft(Option(t)) {
          case (Some(ArrayType(et, _)), Right(_))  => Some(et)
          case (Some(st: StructType), Left(key))   =>
            st.fields.find(_.name == key).map(_.dataType)
          case _ => None
        }
      }
    case _ => None
  }

  /** Reject a typed column compared against a literal of the wrong
    * KIND (numeric/bool column vs string literal, string column vs
    * numeric/bool literal) at compile time with the reference's error
    * shape, instead of surfacing an ANSI cast failure mid-query.
    */
  private def strictLiteralClash(colNode: Node, litNode: Node, ctx: Ctx): Unit =
    typedColumnType(colNode, ctx).foreach { t =>
      def fail(litKind: String): Nothing = throw CompileError(
        s"comparisons between ${t.simpleString} and $litKind are not supported")
      litNode match {
        case StringLit(_)
            if t.isInstanceOf[NumericType] || t == BooleanType ||
              t == TimestampType => fail("VarChar")
        case IntLit(_) | FloatLit(_) |
             Unary(UnaryOp.Neg, IntLit(_)) | Unary(UnaryOp.Neg, FloatLit(_))
            if t == StringType || t == BooleanType => fail("numeric")
        case BoolLit(_) if t.isInstanceOf[NumericType] || t == StringType =>
          fail("Bool")
        case _ => ()
      }
    }

  private def literalType(n: Node, ctx: Ctx): Option[DataType] = n match {
    case IntLit(_)    => Some(LongType)
    case FloatLit(_)  => Some(DoubleType)
    case BoolLit(_)   => Some(BooleanType)
    case StringLit(_) => Some(StringType)
    case IsoLit(_)    => Some(TimestampType)
    case Unary(UnaryOp.Neg | UnaryOp.Pos, c) => literalType(c, ctx)
    case Binary(BinOp.Add | BinOp.Sub | BinOp.Mul | BinOp.Mod | BinOp.Pow, l, r) =>
      (literalType(l, ctx), literalType(r, ctx)) match {
        case (Some(DoubleType), _) | (_, Some(DoubleType)) => Some(DoubleType)
        case (Some(LongType), Some(LongType))              => Some(LongType)
        case _                                             => None
      }
    case Binary(BinOp.Div, l, r) =>
      // Div yields Double, but only when BOTH operands are themselves
      // constants — `(field / 2)` must not claim a literal type
      if (literalType(l, ctx).isDefined && literalType(r, ctx).isDefined)
        Some(DoubleType)
      else None
    case TemplateVar(name) => ctx.params.get(name).map {
      case _: Long | _: Int => LongType
      case _: Double | _: Float => DoubleType
      case _: Boolean => BooleanType
      case _: String => StringType
      case _ => StringType
    }
    case _ => None
  }

  /** A runtime template value as the literal node it would have been
    * inline — so template-delivered lists share the inline compile
    * paths (typed JSON unions, strictness) instead of diverging.
    */
  private def valueToLiteralNode(v: Any, templateName: String): Node = v match {
    case i: Int     => IntLit(i.toLong)
    case l: Long    => IntLit(l)
    case s: Short   => IntLit(s.toLong)
    case b: Byte    => IntLit(b.toLong)
    case d: Double  => FloatLit(d)
    case f: Float   => FloatLit(f.toDouble)
    case b: Boolean => BoolLit(b)
    case s: String  => StringLit(s)
    case other => throw CompileError(
      s"template {$templateName} holds unsupported element $other")
  }

  private def isJsonPathNode(n: Node, ctx: Ctx): Boolean = n match {
    case JsonPath(f, _) => ctx.isJson(f) || ctx.fieldType(f).isEmpty
    case Ident(name)    => ctx.fieldType(name).isEmpty && ctx.metaColumn.isDefined
    case _              => false
  }

  /** get_json_object path string for a JsonPath. */
  private def jsonPathString(parts: Seq[Either[String, Int]]): String =
    "$" + parts.map {
      case Left(key)  => if (key.matches("[A-Za-z_][A-Za-z0-9_]*")) s".$key" else s"['$key']"
      case Right(idx) => s"[$idx]"
    }.mkString

  def compile(node: Node, ctx: Ctx): Column = node match {
    case IntLit(v)    => lit(v)
    case FloatLit(v)  => lit(v)
    case BoolLit(v)   => lit(v)
    case StringLit(v) => lit(v)
    case TemplateVar(name) =>
      ctx.params.get(name) match {
        case Some(seq: Seq[_]) => lit(seq.toArray[Any](scala.reflect.ClassTag.Any))
        case Some(v)           => lit(v)
        case None              => throw CompileError(s"missing template parameter {$name}")
      }

    case Ident(name) =>
      ctx.fieldType(name) match {
        case Some(_) => col(name)
        case None =>
          ctx.metaColumn match {
            // dynamic field: pull from the $meta JSON catch-all
            case Some(meta) => get_json_object(col(meta), s"$$.$name")
            case None if ctx.strictColumns =>
              throw CompileError(s"unknown field '$name' " +
                s"(schema: ${ctx.schema.fieldNames.mkString(", ")})")
            case None => col(name) // let Catalyst raise unresolved
          }
      }

    case StructSubField(name) =>
      ctx.element match {
        case Some((elem, Some(st))) =>
          if (!st.fieldNames.contains(name))
            throw CompileError(s"struct array has no sub-field $name " +
              s"(available: ${st.fieldNames.mkString(", ")})")
          elem.getField(name)
        case Some((elem, None)) => elem // scalar array: $[x] is the element
        case None =>
          throw CompileError(s"$$[$name] is only valid inside element_filter")
      }

    case jp @ JsonPath(field, parts) =>
      ctx.fieldType(field) match {
        case Some(ArrayType(et, _)) =>
          // try_element_at: out-of-bounds index yields null → the row
          // fails the predicate (the reference's OOB semantics) instead
          // of an ANSI runtime error aborting the whole query
          parts match {
            case Seq(Right(idx)) => try_element_at(col(field), lit(idx + 1)) // 0-based → 1-based
            case Seq(Right(idx), Left(key)) => et match {
              // StructIndexFieldIdentifier `f[0][sub]` (grammar Plan.g4)
              case st: StructType if st.fieldNames.contains(key) =>
                try_element_at(col(field), lit(idx + 1)).getField(key)
              case st: StructType => throw CompileError(
                s"struct array $field has no sub-field $key " +
                  s"(available: ${st.fieldNames.mkString(", ")})")
              case other => throw CompileError(
                s"$field[$idx][$key] needs an array of structs, $field is array<$other>")
            }
            // sub-field PROJECTION `f[sub]` (reference: StructArray
            // sub-field access — `events[tag]` is the ARRAY of that
            // sub-field's values, fed to array_contains/_any/_all)
            case Seq(Left(key)) => et match {
              case st: StructType if st.fieldNames.contains(key) =>
                transform(col(field), e => e.getField(key))
              case st: StructType => throw CompileError(
                s"struct array $field has no sub-field $key " +
                  s"(available: ${st.fieldNames.mkString(", ")})")
              case other => throw CompileError(
                s"$field[$key] needs an array of structs, $field is array<$other>")
            }
            case _ => throw CompileError(
              s"array field $field supports [int], [int][subField], or [subField] access")
          }
        case Some(StructType(_)) =>
          parts.foldLeft(col(field)) {
            case (c, Left(key))  => c.getField(key)
            case (c, Right(idx)) => try_element_at(c, lit(idx + 1))
          }
        case _ =>
          val base = if (ctx.fieldType(field).isDefined) col(field)
                     else ctx.metaColumn.map(col).getOrElse(col(field))
          val prefix = if (ctx.fieldType(field).isDefined) "" else s".$field"
          get_json_object(base, "$" + prefix + jsonPathString(parts).drop(1))
      }

    case Unary(op, child) =>
      val c = compile(child, ctx)
      op match {
        case UnaryOp.Neg  => negate(c)
        case UnaryOp.Pos  => c
        case UnaryOp.Not  => !boolish(child, c, ctx)
        case UnaryOp.BNot => bitwise_not(c)
      }

    case Binary(op, l, r) => compileBinary(op, l, r, ctx)

    case RangeCmp(lo, loInc, target, hiInc, hi) =>
      val t = compileCmpSide(target, literalType(lo, ctx).orElse(literalType(hi, ctx)), ctx)
      val loC = compile(lo, ctx)
      val hiC = compile(hi, ctx)
      val lower = if (loInc) t >= loC else t > loC
      val upper = if (hiInc) t <= hiC else t < hiC
      lower && upper

    case In(target, values, negated) =>
      // VisitTerm's target contract (parser_visitor.go:1154-1180): a
      // constant anchors no term, and the target must be a SINGLE FIELD
      // (plain, path-qualified, or an element sub-field) — `x % 13 in
      // [...]` is a named parse error in the reference
      // (test_mix_scenes.py test_no_index_query_with_invalid_expr), not
      // an evaluated expression
      target match {
        case ArrayLit(_) =>
          throw CompileError(
            s"'term' can only be used on non-const expression, but got: $target")
        case _ if literalType(target, ctx).isDefined =>
          throw CompileError(
            s"'term' can only be used on non-const expression, but got: $target")
        case Ident(_) | JsonPath(_, _) | StructSubField(_) => ()
        case other =>
          throw CompileError(
            s"'term' can only be used on single field, but got: $other")
      }
      // castValue parity (utils.go:264-305 via VisitTerm:1196-1211): a
      // list element that cannot cast to the column's type is a named
      // error — int lists take no floats/strings, string columns take
      // only strings; JSON paths stay exempt (castValue passes JSON
      // through; the typed-union machinery owns those semantics)
      (termTargetType(target, ctx), values) match {
        case (Some(dt), ArrayLit(items)) =>
          items.foreach(termCastCheck(dt, _))
        case _ => ()
      }
      val t = compileInTarget(target, values, ctx)
      val membership = values match {
        case ArrayLit(items) if items.isEmpty => lit(false)
        case ArrayLit(items) if isJsonPathNode(target, ctx) =>
          compileJsonInUnion(target, items, ctx)
        case ArrayLit(items) =>
          t.isin(items.map(litValue(_, ctx)): _*)
        case TemplateVar(name) =>
          ctx.params.get(name) match {
            case Some(seq: Seq[_]) if seq.isEmpty => lit(false)
            case Some(seq: Seq[_]) if isJsonPathNode(target, ctx) =>
              // template lists take the SAME typed-union expansion as
              // inline lists — delivery mechanism must not change which
              // rows a JSON IN matches (#51489/#51617 parity)
              compileJsonInUnion(target,
                seq.map(valueToLiteralNode(_, name)), ctx)
            case Some(seq: Seq[_])                => t.isin(seq: _*)
            case other => throw CompileError(s"template {$name} must be a list, got $other")
          }
        case other => throw CompileError(s"IN requires a literal list, got $other")
      }
      if (negated) !membership else membership

    case Like(target, pattern) =>
      stringKindGuarded(target, ctx)(t => compileLike(t, pattern))

    case RegexMatch(target, pattern, negated) =>
      val guarded = stringKindGuarded(target, ctx) { t =>
        pattern match {
          case StringLit(s) =>
            validateRe2(s)
            regexToLike(s) match {
            case Some(("eq", l))      => t === lit(l)
            case Some(("prefix", l))  => t.startsWith(l)
            case Some(("postfix", l)) => t.endsWith(l)
            case _                    => t.rlike(re2ToJava(s))
          }
          case _ =>
            // dynamic pattern: the dot-nl default still applies; the
            // dialect shims need the literal text, so they are
            // literal-only (the reference's patterns are always literals)
            regexp_like(t, concat(lit("(?s)"), compile(pattern, ctx)))
        }
      }
      if (negated) !guarded else guarded

    case IsNull(target, negated) =>
      val t = compile(target, ctx)
      if (negated) t.isNotNull else t.isNull

    case ExistsPath(target) =>
      target match {
        case jp: JsonPath => compile(jp, ctx).isNotNull
        case Ident(name)  => compile(Ident(name), ctx).isNotNull
        case other        => throw CompileError(s"exists requires a JSON path, got $other")
      }

    case TsCompare(field, sign, interval, op, iso, reversed) =>
      val (months, days, micros) = interval match {
        case Some(isoDur) =>
          val (m, d, us) = parseIsoDuration(isoDur)
          (m * sign, d * sign, us * sign)
        case None => (0, 0, 0L)
      }
      def cmp(l: Column, r: Column): Column = op match {
        case BinOp.Lt => l < r; case BinOp.Le => l <= r
        case BinOp.Gt => l > r; case BinOp.Ge => l >= r
        case BinOp.Eq => l === r; case BinOp.Ne => l =!= r
        case other    => throw CompileError(s"bad timestamptz op $other")
      }
      // The MVCC ts domain carries TIMESTAMPTZ as epoch-nanos int64
      // (the reference's boundary conversion, Types.h:70-102); calendar
      // business-time columns stay timestamp-typed. Dispatch on the
      // column's actual type — and only a tstz-DOMAIN int64 takes the
      // epoch fold: a plain int64 in a timestamptz compare (reversed
      // plain form or interval arithmetic) is the reference's strict
      // type error, never a silent raw-vs-epoch compare.
      if (ctx.fieldType(field).contains(LongType)) {
        if (!ctx.tstzFields.contains(field)) throw CompileError(
          "comparisons between Int64 and Timestamptz are not supported")
        val litNs = parseTsMicros(iso, ctx.timezone) * 1000L
        if (months == 0) {
          // fixed-duration interval: fold the shift into the literal so
          // the predicate stays `ts <op> constant` — a plain range
          // filter the parquet scan pushes down and zone-map-prunes
          // (col + c <op> lit  ⟺  col <op> lit - c).
          val shiftNs = days * 86400000000000L + micros * 1000L
          val (l, r) =
            if (reversed) (lit(litNs - shiftNs), col(field))
            else (col(field), lit(litNs - shiftNs))
          cmp(l, r)
        } else {
          // month components are calendar-dependent relative to the row
          // value — do the arithmetic in the timestamp domain (rare
          // path; not pushdown-eligible by construction).
          // `div` = integer division (Column./ would go through Double)
          val asTs = timestamp_micros(expr(s"`$field` div 1000"))
          val shifted = asTs + expr(
            s"make_interval(0, $months, 0, $days, 0, 0, ${micros / 1000000.0})")
          val tsLit = timestamp_micros(lit(litNs / 1000L))
          val (l, r) = if (reversed) (tsLit, shifted) else (shifted, tsLit)
          cmp(l, r)
        }
      } else {
        val base = col(field)
        val shifted =
          if (months == 0 && days == 0 && micros == 0L) base
          else base + expr(
            s"make_interval(0, $months, 0, $days, 0, 0, ${micros / 1000000.0})")
        val tsLit = timestamp_micros(lit(parseTsMicros(iso, ctx.timezone)))
        val (l, r) = if (reversed) (tsLit, shifted) else (shifted, tsLit)
        cmp(l, r)
      }

    case IsoLit(v) =>
      timestamp_micros(lit(parseTsMicros(v, ctx.timezone)))

    case ArrayLit(items) => array(items.map(compile(_, ctx)): _*)

    case c: Call => Calls.compileCall(c, ctx)
  }

  /** Anchored PURE-LITERAL regexes lower to Equal/Prefix/Postfix
    * (reference tryOptimizeRegexToLike, parser_visitor.go:714-790) —
    * pushable codegen'd operators instead of the regex kernel, and
    * exactly RE2's strict `$` (end-of-text; Java's find would also
    * accept a trailing newline). Escaped metacharacters count as
    * literal; shorthand classes (`\d`, `\w`, …) and any unescaped
    * metacharacter keep the regex path; unanchored literals stay regex
    * too (the reference keeps RE2's literal PartialMatch there).
    */
  private[graft] def regexToLike(pattern: String): Option[(String, String)] = {
    if (pattern.isEmpty) return None
    var inner = pattern
    var hasStart = false
    var hasEnd = false
    if (inner.startsWith("^")) { hasStart = true; inner = inner.drop(1) }
    if (inner.endsWith("$") &&
        (inner.length < 2 || inner.charAt(inner.length - 2) != '\\')) {
      hasEnd = true; inner = inner.dropRight(1)
    }
    val metas = ".+*?{}()|[]^$"
    val sb = new StringBuilder
    var i = 0
    while (i < inner.length) {
      val c = inner.charAt(i)
      if (c == '\\' && i + 1 < inner.length) {
        val next = inner.charAt(i + 1)
        if (metas.indexOf(next.toInt) >= 0 || next == '\\') { sb += next; i += 2 }
        else return None // \d, \w, \s, … — not purely literal
      } else if (metas.indexOf(c.toInt) >= 0) return None
      else { sb += c; i += 1 }
    }
    val l = sb.toString
    if (l.isEmpty) {
      if (hasStart && hasEnd) Some(("eq", "")) else None
    } else (hasStart, hasEnd) match {
      case (true, true)  => Some(("eq", l))
      case (true, false) => Some(("prefix", l))
      case (false, true) => Some(("postfix", l))
      case _             => None
    }
  }

  /** RE2 → Java regex dialect shims. The reference's `=~` kernel is RE2
    * with dot_nl=true (test_milvus_client_regex_filter.py:409-424:
    * `c.d` matches across a newline unless the pattern carries an
    * inline `(?-s)`), bare Unicode SCRIPT classes (`\p{Han}`; Java
    * spells them `\p{IsHan}`), and `(?P<name>...)` named groups (the
    * RE2-20230301 spelling; Java only knows `(?<name>...)`). Substring
    * (find) semantics are shared by RE2 PartialMatch and Spark's RLike,
    * so only these three dialect points need translation. Residual
    * difference: Java backtracks where RE2 runs linear-time, so a
    * pathological nested quantifier is slower here — run time, never
    * membership.
    */
  private[graft] def re2ToJava(pattern: String): String = {
    val script = """\\([pP])\{(\w+)\}""".r
    val shimmed = script.replaceAllIn(pattern, m => {
      val name = m.group(2)
      val isScript =
        try { Character.UnicodeScript.forName(name); true }
        catch { case _: Exception => false } // category/POSIX names pass through
      java.util.regex.Matcher.quoteReplacement(
        if (isScript) s"\\${m.group(1)}{Is$name}" else m.matched)
    }).replace("(?P<", "(?<")
    "(?s)" + escapeLiteralBraces(shimmed)
  }

  /** A `{` that does not open a numeric repetition is a LITERAL in RE2
    * (`a{,5}`, `a{}`, `a{x}` all match those characters) while Java
    * throws "Illegal repetition" — escape it for the Java engine.
    */
  private val numericBrace = """^\{\d+(,\d*)?\}""".r
  private def escapeLiteralBraces(p: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inClass = false
    while (i < p.length) {
      val c = p.charAt(i)
      if (c == '\\' && i + 1 < p.length) {
        val e = p.charAt(i + 1)
        sb += c += e; i += 2
        // the brace after \p / \P / \x belongs to the escape
        if ((e == 'p' || e == 'P' || e == 'x') &&
          i < p.length && p.charAt(i) == '{') {
          while (i < p.length && p.charAt(i) != '}') { sb += p.charAt(i); i += 1 }
          if (i < p.length) { sb += '}'; i += 1 }
        }
      } else if (inClass) {
        if (c == ']') inClass = false
        sb += c; i += 1
      } else if (c == '[') { inClass = true; sb += c; i += 1 }
      else if (c == '{') {
        numericBrace.findFirstIn(p.substring(i)) match {
          case Some(rep) => sb ++= rep; i += rep.length
          case None      => sb ++= "\\{"; i += 1
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** RE2 compile-error contract (reference RegexQuery.h:58-63: the
    * pattern is compiled by RE2 at plan time and a failure raises
    * "Failed to compile regex pattern: <re2 error>"). Java's engine
    * ACCEPTS several constructs RE2 rejects — backreferences,
    * lookarounds, atomic groups, possessive quantifiers, \Z/\G/\K,
    * repetition counts past kMaxRepeat=1000 — so membership would
    * silently diverge from accept-vs-error without this scan. The
    * Pattern.compile backstop at the end catches Java-invalid shapes
    * with the same contract.
    */
  private[graft] def validateRe2(p: String): Unit = {
    def fail(msg: String): Nothing =
      throw CompileError(s"Failed to compile regex pattern: $msg")
    var i = 0
    val n = p.length
    var prevQuant = false
    while (i < n) {
      p.charAt(i) match {
        case '\\' =>
          if (i + 1 >= n) fail("trailing backslash")
          val e = p.charAt(i + 1)
          if (e >= '1' && e <= '9') fail(s"invalid escape sequence: \\$e")
          if (e == 'k' || e == 'K' || e == 'Z' || e == 'G')
            fail(s"invalid escape sequence: \\$e")
          prevQuant = false
          i += 2
        case '[' =>
          i += 1
          if (i < n && p.charAt(i) == '^') i += 1
          var closed = false
          while (i < n && !closed) {
            if (p.charAt(i) == '\\') i += 2
            else if (p.charAt(i) == ']') { closed = true; i += 1 }
            else i += 1
          }
          prevQuant = false
        case '(' if i + 1 < n && p.charAt(i + 1) == '?' =>
          val rest = p.substring(i + 2)
          if (rest.startsWith("=")) fail("invalid perl operator: (?=")
          if (rest.startsWith("!")) fail("invalid perl operator: (?!")
          if (rest.startsWith("<=")) fail("invalid perl operator: (?<=")
          if (rest.startsWith("<!")) fail("invalid perl operator: (?<!")
          if (rest.startsWith(">")) fail("invalid perl operator: (?>")
          if (rest.startsWith("P=")) fail("invalid named capture: (?P=")
          if (rest.startsWith("(")) fail("invalid perl operator: (?(")
          prevQuant = false
          i += 2
        case c @ ('*' | '+' | '?') =>
          if (prevQuant && c == '+') fail("bad repetition operator")
          prevQuant = true
          i += 1
        case '{' =>
          numericBrace.findFirstIn(p.substring(i)) match {
            case Some(rep) =>
              val bounds = rep.substring(1, rep.length - 1).split(",", -1)
              if (bounds.exists(b => b.nonEmpty && (b.length > 4 || b.toInt > 1000)))
                fail("invalid repetition size: " + rep)
              prevQuant = true
              i += rep.length
            case None => prevQuant = false; i += 1 // literal brace
          }
        case _ =>
          prevQuant = false
          i += 1
      }
    }
    try java.util.regex.Pattern.compile(re2ToJava(p))
    catch {
      case e: java.util.regex.PatternSyntaxException =>
        fail(e.getMessage.linesIterator.next())
    }
  }

  /** LIKE / regex over a JSON path run the STRING kernel only
    * (reference UnaryExpr.cpp: a kStringVal pattern dispatches
    * ExecRangeVisitorImplJson<std::string>, and GetValueFromJson fails
    * for non-string kinds): the number 1 at a path must NOT match
    * `like "1%"` even though get_json_object extracts both as "1". A
    * missing path / JSON null stays UNKNOWN under 3VL, a kind mismatch
    * is definitely false — the same contract as typedJsonGuard.
    * Non-JSON targets pass through untouched.
    */
  private def stringKindGuarded(target: Node, ctx: Ctx)
      (mk: Column => Column): Column = target match {
    // a bare ARRAY field never pattern-matches implicitly — the
    // reference rejects it at plan time (test_milvus_client_regex_filter
    // .py:690-707); element access (`tags[0] =~ ...`) stays fine
    case Ident(name) if ctx.fieldType(name).exists(_.isInstanceOf[ArrayType]) =>
      throw CompileError("can not comparisons array fields directly")
    // the ROOT of a declared JSON column gets the same per-row kind
    // gate as a path: an object/number document never matches, a
    // string-typed document matches on its UNQUOTED value, and the
    // design is NO error — other rows may hold a matching kind
    // (:710-726)
    case Ident(name) if ctx.isJson(name) && ctx.fieldType(name).isDefined =>
      val kind = schema_of_variant(try_parse_json(col(name)))
      when(kind.isNull || kind === "VOID", lit(null).cast(BooleanType))
        .otherwise(kind === "STRING" && mk(get_json_object(col(name), "$")))
    case _ =>
      val matched = mk(compileCmpSide(target, Some(StringType), ctx))
      jsonKindOf(target, ctx).map(kind =>
        when(kind.isNull || kind === "VOID", lit(null).cast(BooleanType))
          .otherwise(kind === "STRING" && matched)).getOrElse(matched)
  }

  /** One logical char of a LIKE pattern after escape processing:
    * `wildcard` is true only for an UNescaped `%` or `_`.
    */
  private[graft] final case class LikeToken(c: Char, wildcard: Boolean)

  /** Tokenizes a LIKE pattern with the reference's canonical escape
    * model (reference: planparserv2/pattern_match.go:39-61
    * scanLikePattern, kept in lock-step with
    * core/src/common/RegexQuery.cpp translate_pattern_match_to_regex):
    * a backslash escapes the NEXT char — whatever it is — so the
    * backslash is consumed and the following char becomes a literal
    * (`\%` → `%`, `\\` → `\`, `\a` → `a`); an unescaped `%` or `_` is a
    * wildcard; a lone trailing backslash has nothing to escape and is
    * ExprInvalid (RegexQuery.cpp raises; we raise at compile).
    */
  private[graft] def scanLikePattern(pattern: String): Vector[LikeToken] = {
    val out = Vector.newBuilder[LikeToken]
    var escapeMode = false
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (escapeMode) { out += LikeToken(c, wildcard = false); escapeMode = false }
      else if (c == '\\') escapeMode = true
      else out += LikeToken(c, wildcard = c == '%' || c == '_')
      i += 1
    }
    if (escapeMode)
      throw CompileError(
        "Invalid LIKE pattern: trailing backslash with nothing to escape")
    out.result()
  }

  /** Lowers a LIKE to the cheapest equivalent operator, mirroring the
    * reference's optimizeLikePattern (pattern_match.go:86-135): when the
    * only wildcards are leading/trailing `%` runs the pattern becomes
    * Equal / Prefix / Postfix / Inner (codegen'd `===`/startsWith/
    * endsWith/contains that Parquet pushdown + the NGRAM rewrite rule
    * understand); anything with a `_` or an interior `%` keeps the
    * generic match path — Catalyst's `Like` kernel with the pattern
    * re-emitted in canonical `\`-escaped form (literal `%`/`_`/`\`
    * escaped, wildcards bare), whose `_`/`%` semantics equal the
    * reference's translate_pattern_match_to_regex (`(?s)` dotall, one
    * char / any run).
    */
  private def compileLike(t: Column, pattern: String): Column = {
    val tokens = scanLikePattern(pattern)
    val leading = tokens.takeWhile(tk => tk.wildcard && tk.c == '%').size
    if (tokens.isEmpty) return t === lit("")
    // the whole pattern is '%'s → every non-null value matches
    if (leading == tokens.size) return t.startsWith(lit(""))
    val trailing =
      tokens.reverseIterator.takeWhile(tk => tk.wildcard && tk.c == '%').size
    val core = tokens.slice(leading, tokens.size - trailing)
    if (!core.exists(_.wildcard)) {
      val operand = core.map(_.c).mkString
      (leading > 0, trailing > 0) match {
        case (true, true)   => t.contains(operand)
        case (true, false)  => t.endsWith(operand)
        case (false, true)  => t.startsWith(operand)
        case (false, false) => t === lit(operand)
      }
    } else {
      val canonical = tokens.iterator.map {
        case LikeToken(c, true)                  => c.toString
        case LikeToken(c @ ('%' | '_' | '\\'), _) => s"\\$c"
        case LikeToken(c, _)                     => c.toString
      }.mkString
      val generic = ColumnBridge.column(CatalystLike(
        ColumnBridge.expression(t), Literal(canonical), '\\'))
      // the generic Like pushes NO source filter; a fixed literal prefix
      // (chars before the first wildcard — the reference's
      // extract_fixed_prefix_from_pattern, RegexQuery.cpp:69-95) is
      // implied by the pattern, so conjoin a StartsWith the parquet scan
      // CAN push — `user_%` keeps row-group min/max pruning on "user"
      val fixedPrefix = tokens.takeWhile(!_.wildcard).map(_.c).mkString
      if (fixedPrefix.nonEmpty) t.startsWith(fixedPrefix) && generic
      else generic
    }
  }

  /** A timestamptz literal → epoch MICROseconds (reference ParseTimeTz,
    * pkg/util/timestamptz/timestamptz.go:50-100): TZ-aware strings
    * (RFC3339 `T` or the PostgreSQL space variant) keep their offset,
    * which must lie in [-12:00, +14:00]; NAIVE strings are interpreted
    * in the configured timezone (the `timezone` collection/database
    * property, default UTC).
    */
  private[graft] def parseTsMicros(s: String, timezone: String): Long = {
    import java.time._
    val norm = s.trim
    def micros(i: Instant): Long = i.getEpochSecond * 1000000L + i.getNano / 1000L
    def bounded(o: OffsetDateTime): Long = {
      val sec = o.getOffset.getTotalSeconds
      if (sec > 14 * 3600 || sec < -12 * 3600)
        throw CompileError(s"UTC offset hour ${sec / 3600} is out of the " +
          "valid range [-12, 14]")
      micros(o.toInstant)
    }
    Seq(norm, norm.replaceFirst(" ", "T")).distinct.foreach { c =>
      try return bounded(OffsetDateTime.parse(c))
      catch { case _: DateTimeException => () }
    }
    val zone =
      try ZoneId.of(timezone)
      catch { case _: DateTimeException =>
        throw CompileError(s"invalid timezone string '$timezone'") }
    val naive = norm.replaceFirst(" ", "T")
    val ldt =
      try {
        if (naive.contains("T")) LocalDateTime.parse(naive)
        else LocalDate.parse(naive).atStartOfDay()
      } catch { case _: DateTimeException => throw CompileError(
        s"invalid timestamp string: '$s'. Does not match any known format") }
    micros(ldt.atZone(zone).toInstant)
  }

  /** ISO-8601 duration → (months, days, microseconds). */
  private[graft] def parseIsoDuration(s: String): (Int, Int, Long) = {
    val upper = s.toUpperCase
    val tIdx = upper.indexOf('T')
    val (datePart, timePart) =
      if (tIdx >= 0) (upper.substring(0, tIdx), "P" + upper.substring(tIdx + 1))
      else (upper, "")
    val period = java.time.Period.parse(if (datePart == "P") "P0D" else datePart)
    val duration =
      if (timePart.isEmpty || timePart == "P") java.time.Duration.ZERO
      else java.time.Duration.parse("PT" + timePart.drop(1))
    (period.getYears * 12 + period.getMonths, period.getDays,
      duration.getSeconds * 1000000L + duration.getNano / 1000L)
  }

  private def litValue(n: Node, ctx: Ctx): Any = n match {
    case IntLit(v)    => v
    case FloatLit(v)  => v
    case BoolLit(v)   => v
    case StringLit(v) => v
    case Unary(UnaryOp.Neg, IntLit(v))   => -v
    case Unary(UnaryOp.Neg, FloatLit(v)) => -v
    case other => throw CompileError(s"expected literal, got $other")
  }

  /** Compile a comparison operand; JSON paths get TRY-cast to the other
    * side's literal type (reference semantics: type-mismatched JSON
    * comparisons are false, not errors).
    */
  private def compileCmpSide(n: Node, otherType: Option[DataType], ctx: Ctx): Column = {
    val c = compile(n, ctx)
    if (isJsonPathNode(n, ctx)) otherType match {
      case Some(StringType) | None => c
      // the JSON number bucket: int and float literals both compare
      // numerically (1 == 1.0 — #51568's same-bucket contract), so the
      // extracted lexeme casts to a NUMERIC type wider than the literal
      // (a LONG cast would null out "1.0" against an int literal).
      // DECIMAL(38,10), not DOUBLE: int64 values above 2^53 must
      // compare exactly against integral literals (snowflake ids) —
      // a double cast would round both sides and match off-by-one ids.
      case Some(_: NumericType)    => tryCast(c, DecimalType(38, 10))
      case Some(dt)                => tryCast(c, dt)
    } else c
  }

  /** The variant type name at a JSON path ("STRING", "BIGINT",
    * "DECIMAL(p,s)", "BOOLEAN", … — null when missing), for the typed
    * comparison buckets. `get_json_object` strips quotes, so the number
    * 1 and the string "1" extract identically — but the reference's
    * JSON comparison semantics are TYPED (the #51489/#51567 typed-union
    * contract: bool/int/string literals match only values of their own
    * JSON kind, never coerced). The raw kind is recovered from a
    * variant re-parse of the document; only JSON-path comparisons pay
    * it, and those never reach parquet pushdown anyway.
    */
  private def jsonKindOf(n: Node, ctx: Ctx): Option[Column] = n match {
    case JsonPath(field, parts)
        if isJsonPathNode(n, ctx) &&
          !ctx.fieldType(field).exists(t =>
            t.isInstanceOf[ArrayType] || t.isInstanceOf[StructType]) =>
      val base = if (ctx.fieldType(field).isDefined) col(field)
                 else ctx.metaColumn.map(col).getOrElse(col(field))
      val prefix = if (ctx.fieldType(field).isDefined) "" else s".$field"
      val path = "$" + prefix + jsonPathString(parts).drop(1)
      Some(schema_of_variant(try_variant_get(try_parse_json(base), path, "variant")))
    case Ident(name) if isJsonPathNode(n, ctx) && ctx.metaColumn.isDefined =>
      Some(schema_of_variant(try_variant_get(
        try_parse_json(col(ctx.metaColumn.get)), s"$$.$name", "variant")))
    case _ => None
  }

  /** kind-bucket predicate for a literal: string literals need a STRING
    * value, booleans a BOOLEAN, numerics any numeric kind (int and
    * float share the JSON number bucket, per #51568).
    */
  private def kindMatches(kind: Column, literal: Node): Column = literal match {
    case StringLit(_) => kind === "STRING"
    case BoolLit(_)   => kind === "BOOLEAN"
    case IntLit(_) | FloatLit(_) |
         Unary(UnaryOp.Neg, IntLit(_)) | Unary(UnaryOp.Neg, FloatLit(_)) =>
      kind.isin("BIGINT", "INT", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT") ||
        kind.startsWith("DECIMAL")
    case _ => lit(true)
  }

  /** Comparison guard: when one side is a JSON path and the other a
    * literal, require the path's JSON kind to match the literal's
    * bucket. A missing path or a JSON null is UNKNOWN (NULL), not
    * false — `not (p == 1)` over a null p must stay excluded under
    * three-valued logic, while a genuine KIND mismatch is definitely
    * false (so its negation is definitely true). Non-JSON or
    * non-literal comparisons pass through.
    */
  private def typedJsonGuard(l: Node, r: Node, ctx: Ctx): Option[Column] = {
    def side(pathNode: Node, litNode: Node): Option[Column] =
      if (literalType(litNode, ctx).isDefined)
        jsonKindOf(pathNode, ctx).map(kind =>
          when(kind.isNull || kind === "VOID", lit(null).cast(BooleanType))
            .otherwise(kindMatches(kind, litNode)))
      else None
    side(l, r).orElse(side(r, l))
  }

  /** Typed-union canonicalization for a JSON-path IN (reference #51625/
    * #51489: a JSON IN is EXACTLY the OR expansion of typed equalities —
    * mixed-type lists match per literal kind, never coerced; homogeneous
    * lists get the same expansion so IN ≡ OR always holds). The list is
    * partitioned by CONCRETE literal kind and each bucket compiles to
    * ONE guarded membership test, so an N-element IN pays one variant
    * kind-derivation and one cast per bucket (≤4) instead of per
    * element. Int and float literals keep separate buckets: the int
    * bucket compares in DECIMAL(38,10) (snowflake-id exactness above
    * 2^53), the float bucket in the double domain — the same pairwise
    * semantics the per-element expansion had.
    */
  private def compileJsonInUnion(target: Node, items: Seq[Node], ctx: Ctx): Column = {
    val kindOpt = jsonKindOf(target, ctx)
    // UNKNOWN propagation matches typedJsonGuard: missing path / JSON
    // null is NULL (3VL), a genuine kind mismatch is definitely false
    def bucket(sample: Node, values: Seq[Node]): Column = {
      val c = compileCmpSide(target, literalType(sample, ctx), ctx)
      val m =
        if (values.lengthCompare(1) == 0) c === lit(litValue(values.head, ctx))
        else c.isin(values.map(litValue(_, ctx)): _*)
      kindOpt.map(kind =>
        when(kind.isNull || kind === "VOID", lit(null).cast(BooleanType))
          .otherwise(kindMatches(kind, sample)) && m).getOrElse(m)
    }
    def isIntish(n: Node) = n match {
      case IntLit(_) | Unary(UnaryOp.Neg, IntLit(_)) => true
      case _ => false
    }
    def isFloatish(n: Node) = n match {
      case FloatLit(_) | Unary(UnaryOp.Neg, FloatLit(_)) => true
      case _ => false
    }
    def isSimple(n: Node) = isIntish(n) || isFloatish(n) ||
      n.isInstanceOf[BoolLit] || n.isInstanceOf[StringLit]
    val (simple, complex) = items.partition(isSimple)
    val buckets = Seq(
      simple.filter(isIntish), simple.filter(isFloatish),
      simple.filter(_.isInstanceOf[StringLit]),
      simple.filter(_.isInstanceOf[BoolLit]))
      .filter(_.nonEmpty).map(vs => bucket(vs.head, vs))
    // non-scalar elements (array literals, …) keep the per-element
    // equality path — they have no kind bucket
    val rest = complex.map(i => compileBinary(BinOp.Eq, target, i, ctx))
    (buckets ++ rest).reduce(_ || _)
  }

  /** IN target: JSON paths cast to element type of the value list. */
  /** The concrete column type a term list must cast against — None for
    * JSON paths (castValue passes JSON through), element sub-fields
    * (typed downstream by the element compiler), and anything not
    * statically resolvable.
    */
  private def termTargetType(target: Node, ctx: Ctx): Option[DataType] =
    if (isJsonPathNode(target, ctx)) None
    else target match {
      case Ident(f) => ctx.fieldType(f)
      case JsonPath(f, parts) => ctx.fieldType(f) match {
        // arr[i] compares as the ELEMENT type (VisitTerm:1172-1175)
        case Some(ArrayType(et, _)) if parts.forall(_.isRight) => Some(et)
        case _ => None
      }
      case _ => None
    }

  /** castValue's accept matrix (utils.go:264-305): string↔string,
    * bool↔bool, int→int, int/float→float; a mismatch is the named
    * "cannot be casted" error. Timestamps pass through (tstz literals
    * carry their own parse validation).
    */
  private def termCastCheck(dt: DataType, item: Node): Unit = {
    def kindOf(n: Node): String = n match {
      case IntLit(_)                              => "int"
      case FloatLit(_)                            => "float"
      case BoolLit(_)                             => "bool"
      case StringLit(_)                           => "string"
      case IsoLit(_)                              => "ts"
      case Unary(UnaryOp.Neg | UnaryOp.Pos, c)    => kindOf(c)
      case _                                      => "expr"
    }
    val kind = kindOf(item)
    if (kind == "expr") return // non-literal elements error downstream
    val ok = dt match {
      case StringType                             => kind == "string"
      case BooleanType                            => kind == "bool"
      case LongType | IntegerType | ShortType | ByteType => kind == "int"
      case FloatType | DoubleType | _: DecimalType =>
        kind == "int" || kind == "float"
      case TimestampType                          => true
      case _                                      => false
    }
    if (!ok) throw CompileError(
      s"value '$item' in list cannot be casted to ${dt.simpleString}")
  }

  private def compileInTarget(target: Node, values: Node, ctx: Ctx): Column = {
    val elemType = values match {
      case ArrayLit(items) if items.nonEmpty => literalType(items.head, ctx)
      case _                                 => None
    }
    compileCmpSide(target, elemType, ctx)
  }

  /** JSON paths used in boolean position get cast to boolean. */
  private def boolish(n: Node, c: Column, ctx: Ctx): Column =
    if (isJsonPathNode(n, ctx)) tryCast(c, BooleanType) else c

  private def compileBinary(op: BinOp, l: Node, r: Node, ctx: Ctx): Column = {
    import BinOp._
    op match {
      case And => boolish(l, compile(l, ctx), ctx) && boolish(r, compile(r, ctx), ctx)
      case Or  => boolish(l, compile(l, ctx), ctx) || boolish(r, compile(r, ctx), ctx)
      case Lt | Le | Gt | Ge | Eq | Ne =>
        // A PLAIN iso compare against the int64 TIMESTAMPTZ carry takes
        // the same epoch-nanos fold as the interval form (TsCompare with
        // a zero shift): `ts >= iso'...'` stays attribute-vs-literal and
        // pushes to the scan. Timestamp-typed columns fall through to
        // the generic compare (IsoLit compiles to a timestamp literal).
        // The fold fires ONLY for int64 columns in the tstz domain
        // (ctx.tstzFields); a plain int64 field vs an iso literal is
        // the reference's strict type error, not a silent epoch compare.
        (l, r) match {
          case (Ident(f), IsoLit(v)) if ctx.fieldType(f).contains(LongType) =>
            if (!ctx.tstzFields.contains(f)) throw CompileError(
              "comparisons between Int64 and Timestamptz are not supported")
            return compile(TsCompare(f, 1, None, op, v, reversed = false), ctx)
          case (IsoLit(v), Ident(f)) if ctx.fieldType(f).contains(LongType) =>
            if (!ctx.tstzFields.contains(f)) throw CompileError(
              "comparisons between Int64 and Timestamptz are not supported")
            return compile(TsCompare(f, 1, None, op, v, reversed = true), ctx)
          case _ => ()
        }
        // strict typed-field vs literal check (reference planparserv2:
        // "comparisons between Int64 and VarChar are not supported" —
        // a TYPED column against a literal of the wrong kind is a
        // compile error, not a runtime cast failure aborting the query;
        // JSON paths are exempt: their typed buckets make a kind
        // mismatch FALSE instead)
        strictLiteralClash(l, r, ctx); strictLiteralClash(r, l, ctx)
        val lc = compileCmpSide(l, literalType(r, ctx), ctx)
        val rc = compileCmpSide(r, literalType(l, ctx), ctx)
        val cmp = op match {
          case Lt => lc < rc; case Le => lc <= rc
          case Gt => lc > rc; case Ge => lc >= rc
          case Eq => lc === rc; case Ne => lc =!= rc
          case _  => throw new IllegalStateException
        }
        // typed JSON buckets (reference #51489/#51567): a literal only
        // matches a JSON value of its own kind — the string "1" is not
        // the number 1. A kind mismatch (or a missing path) makes the
        // comparison false, never an error, Ne included (the reference's
        // type-mismatched-comparisons-are-false rule).
        typedJsonGuard(l, r, ctx).map(_ && cmp).getOrElse(cmp)
      case _ =>
        val numType = Some(DoubleType).filter(_ =>
          literalType(l, ctx).contains(DoubleType) || literalType(r, ctx).contains(DoubleType))
        // exact integer arithmetic (reference #48440,
        // test_filter_expression_issue_mining.py: `i64 + 33 <= 19974`
        // over INT64_MAX must compare by the TRUE arithmetic value —
        // neither wrapping nor aborting the scan on ANSI overflow).
        // The exact path goes through DECIMAL(38,0), so it only fires
        // when a conservative magnitude bound PROVES the whole subtree
        // fits (a single int64 +,−,× always does: |a×b| ≤ 2^126 < 10^38;
        // a three-way int64 product reaches 2^189 and does NOT). A tree
        // past the bound — or any tree nested under one — evaluates in
        // plain int64 end-to-end via forcePlainArith, keeping overflow
        // behavior consistent (wrap, never decimal-overflow nulls).
        // The bound is max-monotone (includes child bounds), so a parent
        // that fits proves every child fits too.
        def bound(n: Node): Option[BigInt] = n match {
          case Ident(f) => ctx.fieldType(f).collect {
            case ByteType    => BigInt(1) << 7
            case ShortType   => BigInt(1) << 15
            case IntegerType => BigInt(1) << 31
            case LongType    => BigInt(1) << 63
          }
          case IntLit(v)                           => Some(BigInt(v).abs)
          case Unary(UnaryOp.Neg | UnaryOp.Pos, c) => bound(c)
          case Binary(Add | Sub, a, b) =>
            for { x <- bound(a); y <- bound(b) } yield (x + y).max(x).max(y)
          case Binary(Mul, a, b) =>
            for { x <- bound(a); y <- bound(b) } yield (x * y).max(x).max(y)
          case Binary(Mod, a, b) =>
            for { x <- bound(a); y <- bound(b) } yield x.max(y)
          case _ => None
        }
        val maxDec = BigInt(10).pow(38)
        val treeBound =
          if (op == Add || op == Sub || op == Mul) bound(Binary(op, l, r))
          else None
        val exact = !ctx.forcePlainArith && treeBound.exists(_ < maxDec)
        val childCtx =
          if (!exact && treeBound.isDefined && !ctx.forcePlainArith)
            ctx.copy(forcePlainArith = true)
          else ctx
        val lc = compileCmpSide(l, numType.orElse(Some(LongType)), childCtx)
        val rc = compileCmpSide(r, numType.orElse(Some(LongType)), childCtx)
        def dec(c: Column): Column = c.cast(DecimalType(38, 0))
        // integral but past the decimal bound: evaluate with LEGACY
        // (wrapping) kernels — ANSI long ops would ABORT the scan on the
        // first overflowing row, and the reference's native int64
        // kernels wrap, never error
        val wrapInts = !exact && treeBound.isDefined
        def legacy(f: (CatalystExpr, CatalystExpr, EvalMode.Value) => CatalystExpr): Column =
          ColumnBridge.column(f(ColumnBridge.expression(lc),
            ColumnBridge.expression(rc), EvalMode.LEGACY))
        op match {
          case Add =>
            if (exact) dec(lc) + dec(rc)
            else if (wrapInts) legacy(CatalystAdd.apply) else lc + rc
          case Sub =>
            if (exact) dec(lc) - dec(rc)
            else if (wrapInts) legacy(CatalystSubtract.apply) else lc - rc
          case Mul =>
            if (exact) dec(lc) * dec(rc)
            else if (wrapInts) legacy(CatalystMultiply.apply) else lc * rc
          case Div => lc / rc
          case Mod => lc % rc
          case Pow =>
            // reference planparserv2 VisitPower (parser_visitor.go:2076):
            // `**` folds constants only — a field operand is a compile
            // error, it never reaches an arithmetic kernel
            if (literalType(l, ctx).isEmpty || literalType(r, ctx).isEmpty)
              throw CompileError(s"power can only apply on constants")
            pow(lc, rc)
          case Shl => r match {
            case IntLit(v) => shiftleft(lc, v.toInt)
            case _         => throw CompileError("<< requires integer literal shift")
          }
          case Shr => r match {
            case IntLit(v) => shiftright(lc, v.toInt)
            case _         => throw CompileError(">> requires integer literal shift")
          }
          case BAnd => lc.bitwiseAND(rc)
          case BOr  => lc.bitwiseOR(rc)
          case BXor => lc.bitwiseXOR(rc)
          case _    => throw new IllegalStateException
        }
    }
  }
}
