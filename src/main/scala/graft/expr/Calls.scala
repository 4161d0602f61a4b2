package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.expr.ExprCompiler.{CompileError, Ctx}
import graft.functions.TextFunctions

/** Compilation of named function constructs in filter expressions
  * (reference: Plan.g4 call-style rules + the built-in function registry
  * internal/core/src/exec/expression/function/FunctionFactory.cpp:64-65).
  */
private[expr] object Calls {

  def compileCall(call: Call, ctx: Ctx): Column = {
    val Call(name, args, opts) = call

    def fieldArg(i: Int): (String, Column) = args(i) match {
      case Ident(f)       => (f, ExprCompiler.compile(Ident(f), ctx))
      case jp: JsonPath   => (jp.field, ExprCompiler.compile(jp, ctx))
      case other          => throw CompileError(s"$name requires a field, got $other")
    }

    /** fieldArg + the enable_match gate (proxy validation: token
      * matching over a field DECLARED with enable_match=false is the
      * reference's named query error, not an empty result —
      * test_milvus_client_text_lob.py:2260).
      */
    def matchFieldArg(i: Int): (String, Column) = {
      val (f, c) = fieldArg(i)
      if (ctx.noMatchFields.contains(f))
        throw CompileError(s"field $f does not enable match")
      (f, c)
    }

    /** Doc-side tokens for a match construct: the field's DECLARED
      * analyzer when one is in scope (reference TextMatchIndex — the
      * match evaluates over the field's analyzer output), the default
      * pipeline otherwise.
      */
    def docTokens(f: String, c: Column): Column =
      ctx.fieldAnalyzers.get(f)
        .map(p => graft.functions.Analyzers.analyzeWith(c, p))
        .getOrElse(TextFunctions.tokenize(c))

    /** Query-side tokens under the same analyzer. Analyzer pipelines are
      * Column programs (filters/HOFs that only evaluate inside a plan);
      * the declared-analyzer path evaluates driver-locally through
      * [[graft.functions.Analyzers.analyzeLocal]] — cached per
      * (analyzer, query), no Spark job at filter-compile time.
      */
    def queryTokens(f: String, q: String): Seq[String] =
      ctx.fieldAnalyzers.get(f) match {
        case Some(p) => graft.functions.Analyzers.analyzeLocal(p, q)
        case None    => TextFunctions.tokenizeString(q)
      }

    def stringArg(i: Int): String = args(i) match {
      case StringLit(s) => s
      case TemplateVar(n) => ctx.params.get(n) match {
        case Some(s: String) => s
        case other           => throw CompileError(s"template must be string, got $other")
      }
      case other => throw CompileError(s"$name requires a string, got $other")
    }

    def intOpt(key: String, default: Long): Long = opts.get(key) match {
      case Some(IntLit(v)) => v
      case None            => default
      case other           => throw CompileError(s"option $key must be int, got $other")
    }

    name match {
      // ---- text matching (reference: MatchExpr.cpp, TextMatchIndex) ----
      case "text_match" =>
        val (f, c) = matchFieldArg(0)
        val qTokens = queryTokens(f, stringArg(1)).distinct
        val msm = intOpt("minimum_should_match", 1)
        matchedCount(docTokens(f, c), qTokens) >= msm
      case "text_match_fuzzy" =>
        val (f, c) = matchFieldArg(0)
        val q = stringArg(1)
        val d = intOpt("threshold", 2)
        // a declared analyzer tokenizes the query too (case and
        // segmentation must match the doc side); the default path keeps
        // the raw lowercased needle
        val qs =
          if (ctx.fieldAnalyzers.contains(f)) queryTokens(f, q)
          else Seq(q.toLowerCase)
        if (qs.isEmpty) lit(false)
        else exists(docTokens(f, c),
          t => qs.map(n => levenshtein(t, lit(n)) <= d.toInt).reduce(_ || _))
      case "phrase_match" =>
        val (f, c) = matchFieldArg(0)
        val q = stringArg(1)
        val slop = if (args.length > 2) args(2) match {
          case IntLit(v) => v
          case other     => throw CompileError(s"phrase_match slop must be int, got $other")
        } else 0L
        phraseMatch(docTokens(f, c), queryTokens(f, q), slop.toInt)
      // MATCH_ALL/ANY/LEAST are overloaded in the reference grammar: a
      // STRING second arg is token matching (MatchExpr.cpp), an element
      // expression (`$[sub]` predicate) is the struct-array quantifier
      // family (test_milvus_client_struct_array_element_query.py
      // MATCH_ALL/MATCH_ANY/MATCH_LEAST). Dispatch on the arg shape.
      case "match_all" if isElementQuantifier(args) =>
        val (arr, pred) = elementPredicate(args(0), args(1), ctx, name)
        forall(arr, pred) // empty array: vacuously true; null: excluded
      case "match_any" if isElementQuantifier(args) =>
        val (arr, pred) = elementPredicate(args(0), args(1), ctx, name)
        exists(arr, pred)
      case "match_least" if isElementQuantifier(args) =>
        val (arr, pred) = elementPredicate(args(0), args(1), ctx, name)
        val n = intOpt("threshold", 1)
        // reference: "count in MATCH_LEAST must be positive"
        if (n <= 0) throw CompileError("count in MATCH_LEAST must be positive")
        size(filter(arr, pred)) >= n
      case "match_most" if isElementQuantifier(args) =>
        val (arr, pred) = elementPredicate(args(0), args(1), ctx, name)
        size(filter(arr, pred)) <= intOpt("threshold", 1)
      case "match_exact" if isElementQuantifier(args) =>
        val (arr, pred) = elementPredicate(args(0), args(1), ctx, name)
        size(filter(arr, pred)) === intOpt("threshold", 1) // threshold=0 is legal
      case "match_all" =>
        val (f, c) = matchFieldArg(0)
        val qTokens = queryTokens(f, stringArg(1)).distinct
        matchedCount(docTokens(f, c), qTokens) === qTokens.size
      case "match_any" =>
        val (f, c) = matchFieldArg(0)
        matchedCount(docTokens(f, c), queryTokens(f, stringArg(1)).distinct) >= 1
      case "match_least" =>
        val (f, c) = matchFieldArg(0)
        matchedCount(docTokens(f, c), queryTokens(f, stringArg(1)).distinct) >=
          intOpt("threshold", 1)
      case "match_most" =>
        val (f, c) = matchFieldArg(0)
        matchedCount(docTokens(f, c), queryTokens(f, stringArg(1)).distinct) <=
          intOpt("threshold", 1)
      case "match_exact" =>
        val (f, c) = matchFieldArg(0)
        matchedCount(docTokens(f, c), queryTokens(f, stringArg(1)).distinct) ===
          intOpt("threshold", 1)

      // ---- json / array containment (reference: JsonContainsExpr.cpp) ----
      case "json_contains" | "array_contains" =>
        checkContainsElements(args(0), "Contains", args(1),
          strictCast = true, ctx)
        val arr = containerColumn(args(0), args(1), ctx)
        array_contains(arr, litCol(args(1), ctx))
      case "json_contains_all" | "array_contains_all" =>
        requireListElement("ContainsAll", args(1), ctx)
        checkContainsElements(args(0), "ContainsAll", args(1),
          strictCast = false, ctx)
        val arr = containerColumn(args(0), args(1), ctx)
        if (isEmptyList(args(1), ctx)) arr.isNotNull // vacuously true (#51617)
        else {
          val values = litArray(args(1), ctx)
          size(array_except(values, arr)) === 0 && arr.isNotNull
        }
      case "json_contains_any" | "array_contains_any" =>
        requireListElement("ContainsAny", args(1), ctx)
        checkContainsElements(args(0), "ContainsAny", args(1),
          strictCast = false, ctx)
        val arr = containerColumn(args(0), args(1), ctx)
        if (isEmptyList(args(1), ctx)) lit(false) // nothing to overlap (#51617)
        else arrays_overlap(arr, litArray(args(1), ctx))
      case "array_length" =>
        args(0) match {
          case Ident(f) if ctx.fieldType(f).exists(_.isInstanceOf[ArrayType]) =>
            array_size(col(f))
          case jp: JsonPath =>
            json_array_length(ExprCompiler.compile(jp, ctx))
          case Ident(f) if ctx.isJson(f) =>
            json_array_length(col(f))
          case other => throw CompileError(s"array_length: unsupported target $other")
        }

      // ---- sampling (reference: RandomSampleNode.cpp) ----
      case "random_sample" =>
        val factor = args(0) match {
          case FloatLit(v) => v
          case IntLit(v)   => v.toDouble
          case other       => throw CompileError(s"random_sample factor must be number, got $other")
        }
        require(factor > 0 && factor < 1, "random_sample factor must be in (0,1)")
        rand(ctx.sampleSeed) < factor

      // ---- built-in scalar registry (reference: FunctionFactory.cpp:64-65) ----
      case "empty" =>
        val (_, c) = fieldArg(0)
        length(c) === 0
      case "starts_with" =>
        val a = ExprCompiler.compile(args(0), ctx)
        val b = ExprCompiler.compile(args(1), ctx)
        a.startsWith(b)

      // ---- approximate membership (reference: BloomFilterExpr.cpp +
      // tests/integration/bloommatch — `bloom_match(field, blob)` keeps
      // rows whose field MIGHT be in the serialized filter; false
      // positives allowed, false negatives never). The blob is a
      // base64-encoded Spark BloomFilterAggregate image built over
      // xxhash64(field) — engine-specific bytes behind the reference's
      // call shape, exactly like the index file formats.
      case "bloom_match" =>
        import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
        import org.apache.spark.sql.graft.ColumnBridge
        val (_, c) = fieldArg(0)
        val blob = java.util.Base64.getDecoder.decode(stringArg(1))
        ColumnBridge.column(BloomFilterMightContain(
          Literal(blob, BinaryType),
          ColumnBridge.expression(xxhash64(c))))

      // ---- geo (reference: GISFunctionFilterExpr.cpp) — custom exprs ----
      case g if g.startsWith("st_") =>
        graft.functions.GeoFunctions.compileCall(call, ctx)

      // ---- per-element array predicates (reference:
      // ElementFilterBitsNode.cpp + IterativeElementFilterNode.cpp,
      // grammar Plan.g4:28/154) — a document matches when ANY element of
      // the struct array satisfies the element expression, with `$[sub]`
      // reading that element's sub-field. The per-element conjunction is
      // the point: parallel array_contains on separate sub-fields can't
      // express "the SAME element has qty>5 and type='A'". Compiles to
      // `exists(field, elem => pred)` — codegen'd, no shuffle, and the
      // whole predicate stays pushdown-eligible.
      case "element_filter" =>
        if (args.length != 2)
          throw CompileError("element_filter(field, element_expr) takes exactly 2 args")
        val (arr, pred) = elementPredicate(args(0), args(1), ctx, name)
        exists(arr, pred)

      case other =>
        throw CompileError(s"unknown function: $other")
    }
  }

  /** A MATCH_* second arg that is NOT a string (or a template that
    * would resolve to one) selects the struct-array element-quantifier
    * overload instead of token matching.
    */
  private def isElementQuantifier(args: Seq[Node]): Boolean =
    args.length == 2 && !args(1).isInstanceOf[StringLit] &&
      !args(1).isInstanceOf[TemplateVar]

  /** Shared element machinery for element_filter and the MATCH_*
    * quantifiers: the array column plus the element-scoped predicate
    * compiler (`$[sub]` resolves against the element).
    */
  private def elementPredicate(fieldNode: Node, predNode: Node, ctx: Ctx,
      name: String): (Column, Column => Column) = {
    if (ctx.element.isDefined)
      throw CompileError(s"nested $name element expression is not supported")
    val fname = fieldNode match {
      case Ident(f) => f
      case other    => throw CompileError(s"$name requires a field, got $other")
    }
    val elemSchema = ctx.fieldType(fname) match {
      case Some(ArrayType(st: StructType, _)) => Some(st)
      case Some(ArrayType(_, _))              => None
      case other =>
        throw CompileError(s"$name requires an ARRAY field, $fname is $other")
    }
    (col(fname), (elem: Column) =>
      ExprCompiler.compile(predNode, ctx.copy(element = Some((elem, elemSchema)))))
  }

  /** Count of distinct query tokens present in the field's token set. */
  private def matchedCount(tokens: Column, qTokens: Seq[String]): Column =
    if (qTokens.isEmpty) lit(0)
    else size(array_intersect(tokens, array(qTokens.map(lit): _*)))

  /** Phrase match with slop (reference: PhraseMatch semantics — query
    * tokens must appear in order within a window allowing `slop` skips).
    * slop=0 compiles to adjacency via substring-of-normalized-stream;
    * slop>0 bounds the TOTAL number of inserted filler tokens across the
    * whole phrase at `slop` (tantivy's slop is a total move budget, not
    * per-gap): gap distributions summing to `slop` are enumerated into
    * one regex alternation — C(slop+n-2, n-2) branches, small for real
    * phrases. Divergence from tantivy: out-of-order matches
    * (transpositions, move cost 2 there) are never matched here.
    */
  private def phraseMatch(tokens: Column, qTokens: Seq[String], slop: Int): Column = {
    if (qTokens.isEmpty) lit(true)
    else {
      // the joiner must be a char NO analyzer token can contain — a
      // keyword/char_group token may hold spaces, so a space-joined
      // stream would cross token boundaries (false positives); NUL
      // never survives any tokenizer here, making it a safe in-band
      // separator (identical semantics for the default pipeline, whose
      // tokens are [a-z0-9]+ only)
      val J = "\u0000"
      val stream = concat(lit(J), array_join(tokens, J), lit(J))
      if (slop == 0 || qTokens.size == 1) {
        stream.contains(J + qTokens.mkString(J) + J)
      } else {
        // branch count is C(slop+n-2, n-2): fine for real phrases, but
        // user-supplied (phrase length × slop) combinations can explode
        // combinatorially (12 tokens × slop 20 ≈ 30M branches) — reject
        // past a budget instead of hanging compilation / OOMing the
        // driver on an adversarial query
        def choose(n: Int, k: Int): BigInt =
          (0 until k).foldLeft(BigInt(1))((acc, i) => acc * (n - i) / (i + 1))
        val nBranches = choose(slop + qTokens.size - 2, qTokens.size - 2)
        if (nBranches > 5000)
          throw CompileError(
            s"phrase_match slop=$slop over ${qTokens.size} tokens expands to " +
              s"$nBranches regex branches (cap 5000) — lower the slop or shorten the phrase")
        // No `.*` anchors: rlike is a substring search already, and a
        // leading `(^|.*)` causes catastrophic backtracking on
        // non-matching rows (measured 20× slower at sf0.1).
        val quoted = qTokens.map(java.util.regex.Pattern.quote)
        val alts = compositions(qTokens.size - 1, slop).map { gaps =>
          J + quoted.head + gaps.zip(quoted.tail).map { case (g, t) =>
            (if (g == 0) "" else s"($J[^$J]+){0,$g}") + J + t
          }.mkString + J
        }
        stream.rlike(alts.map(a => s"(?:$a)").mkString("|"))
      }
    }
  }

  /** All ways to split `total` into `parts` non-negative integers. Each
    * composition's per-gap bounds are `{0,g_i}`, so together they cover
    * every gap vector with sum ≤ total.
    */
  private def compositions(parts: Int, total: Int): Seq[Seq[Int]] =
    if (parts <= 1) Seq(Seq(total))
    else (0 to total).flatMap(h => compositions(parts - 1, total - h).map(h +: _))

  /** The array being probed: an ARRAY column, or a JSON path decoded via
    * from_json with element type inferred from the probe value.
    */
  /** checkContainsElement's FIRST rule (planparserv2/utils.go:789-791):
    * the _any/_all operand must itself be a list — a scalar raises the
    * named "element must be an array" error, never a silent wrap.
    */
  private def requireListElement(op: String, values: Node, ctx: Ctx): Unit =
    values match {
      case ArrayLit(_) => ()
      case TemplateVar(name) if ctx.params.get(name).exists(_.isInstanceOf[Seq[_]]) => ()
      case _ => throw CompileError(s"$op operation element must be an array")
    }

  /** checkContainsElement's TYPED rule (planparserv2/utils.go:793-814,
    * pinned by test_mix_scenes.py
    * test_bitmap_index_query_with_invalid_array_params): when the
    * container is a typed ARRAY field, every probe literal must be
    * comparable to the array's element type — and for the singular
    * `contains`, CASTABLE to it (castValue: an int array takes no float
    * probe). A nested list probe on a scalar-element array is the
    * reference's "can't compare between array element type" error.
    * JSON containers stay exempt (kind-union semantics own those).
    */
  private def checkContainsElements(target: Node, op: String, values: Node,
      strictCast: Boolean, ctx: Ctx): Unit = {
    val elemType: Option[DataType] = target match {
      case Ident(f) => ctx.fieldType(f) match {
        case Some(ArrayType(et, _)) => Some(et)
        case _                      => None
      }
      case jp: JsonPath => ctx.fieldType(jp.field) match {
        case Some(ArrayType(st: StructType, _)) => jp.path match {
          case Seq(Left(sub)) => st.fields.find(_.name == sub).map(_.dataType)
          case _              => None
        }
        case _ => None
      }
      case _ => None
    }
    def kindOf(n: Node): String = n match {
      case IntLit(_)                           => "int"
      case FloatLit(_)                         => "float"
      case BoolLit(_)                          => "bool"
      case StringLit(_)                        => "string"
      case ArrayLit(_)                         => "array"
      case Unary(UnaryOp.Neg | UnaryOp.Pos, c) => kindOf(c)
      case _                                   => "expr"
    }
    elemType.foreach { et =>
      val items: Seq[Node] = values match {
        // _any/_all operate element-wise over their list operand; the
        // singular contains probe is ONE element — a list probe there is
        // kind "array" and must raise the named error (castValue has no
        // array→scalar cast), not flatten into its elements.
        case ArrayLit(is) if !strictCast => is
        case v                           => Seq(v)
      }
      items.foreach { item =>
        val kind = kindOf(item)
        if (kind != "expr") {
          val ok = et match {
            case StringType  => kind == "string"
            case BooleanType => kind == "bool"
            case LongType | IntegerType | ShortType | ByteType =>
              if (strictCast) kind == "int" else kind == "int" || kind == "float"
            case FloatType | DoubleType | _: DecimalType =>
              kind == "int" || kind == "float"
            case _ => false
          }
          if (!ok) throw CompileError(
            s"$op operation can't compare between array element type: " +
              s"${et.simpleString} and $kind")
        }
      }
    }
  }

  private def containerColumn(target: Node, probe: Node, ctx: Ctx): Column = {
    target match {
      case Ident(f) if ctx.fieldType(f).exists(_.isInstanceOf[ArrayType]) => col(f)
      // typed struct-array sub-field projection `f[sub]`: already an
      // array column of the sub-field's values — no JSON re-parse
      case jp: JsonPath if ctx.fieldType(jp.field).exists(_.isInstanceOf[ArrayType]) =>
        ExprCompiler.compile(jp, ctx)
      case jp: JsonPath if jp.path.nonEmpty || ctx.isJson(jp.field) =>
        from_json(ExprCompiler.compile(jp, ctx), ArrayType(probeElementType(probe, ctx)))
      case Ident(f) if ctx.isJson(f) =>
        from_json(col(f), ArrayType(probeElementType(probe, ctx)))
      case other => throw CompileError(s"containment: unsupported target $other")
    }
  }

  private def probeElementType(probe: Node, ctx: Ctx): DataType = probe match {
    case IntLit(_)    => LongType
    case FloatLit(_)  => DoubleType
    case BoolLit(_)   => BooleanType
    case StringLit(_) => StringType
    case ArrayLit(items) if items.nonEmpty => probeElementType(items.head, ctx)
    case ArrayLit(_)  => StringType
    case _            => StringType
  }

  private def litCol(n: Node, ctx: Ctx): Column = ExprCompiler.compile(n, ctx)

  private def litArray(n: Node, ctx: Ctx): Column = n match {
    case a: ArrayLit => ExprCompiler.compile(a, ctx)
    case TemplateVar(name) => ctx.params.get(name) match {
      // element-wise lits: a Seq[Any] materialized as Array[Object]
      // would hit Spark's "Unsupported component type" on lit()
      case Some(seq: Seq[_]) => array(seq.map(v => lit(v)): _*)
      case other             => throw CompileError(s"template must be list, got $other")
    }
    case other => throw CompileError(s"expected array literal, got $other")
  }

  /** Is this values node a statically-empty list (inline `[]` or a
    * template resolving to one)? The reference pins the empty-list
    * semantics (#51617): contains_all([]) is vacuously TRUE on any
    * non-null container, contains_any([]) is FALSE — and an empty
    * `array()` literal is NullType-typed in Spark, so the generic
    * array_except/arrays_overlap forms would type-clash anyway.
    */
  private def isEmptyList(n: Node, ctx: Ctx): Boolean = n match {
    case ArrayLit(items) => items.isEmpty
    case TemplateVar(name) => ctx.params.get(name) match {
      case Some(seq: Seq[_]) => seq.isEmpty
      case _                 => false
    }
    case _ => false
  }
}
