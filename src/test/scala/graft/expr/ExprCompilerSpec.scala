package graft.expr

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Expression-matrix tests, modeled on the reference's filter matrix
  * (tests/python_client/milvus_client/expressions/filtering_case_matrix.py):
  * each filter string is compiled and checked against a Spark-SQL oracle
  * predicate over the same fixture rows.
  */
case class ExprFixtureRow(id: Long, f: Double, s: String, b: Boolean,
    arr: Seq[Long], sarr: Seq[String], js: String, ts: java.sql.Timestamp)

class ExprCompilerSpec extends SparkSpec {
  import spark.implicits._
  private type R = ExprFixtureRow
  private val R = ExprFixtureRow

  private lazy val df: DataFrame = {
    val rows = (0L until 100L).map { i =>
      R(i, i * 0.5, s"name_$i" + (if (i % 3 == 0) "_x" else ""), i % 2 == 0,
        Seq(i, i + 1, i + 2), Seq(s"t$i", "common"),
        s"""{"a": $i, "b": "v$i", "c": [1, 2, ${i % 5}], "flag": ${i % 2 == 0}, "nested": {"x": ${i % 7}}}""",
        java.sql.Timestamp.valueOf(s"2025-01-${(i % 28) + 1} 00:00:00"))
    }
    rows.toDF()
  }

  private def check(expr: String, oracle: org.apache.spark.sql.Column): Unit = {
    val got = df.filter(ExprCompiler.compile(expr, df, jsonColumns = Set("js")))
      .select("id").as[Long].collect().toSet
    val want = df.filter(oracle).select("id").as[Long].collect().toSet
    assert(got == want, s"expr [$expr]: got ${got.size} rows, want ${want.size}; " +
      s"diff=${(got diff want) ++ (want diff got)}")
  }

  test("typed JSON buckets: literals match only their own JSON kind") {
    // the classic blur: "1" (string), 1 (number), true (bool), 1.0
    // (float) at the same path — get_json_object extracts all of them
    // as "1"/"true", so only the variant-kind guard separates them
    // (reference #51489/#51567 typed-union semantics)
    val rows = Seq(
      (0L, """{"p": 1}"""),          // number (int)
      (1L, """{"p": "1"}"""),        // string that looks numeric
      (2L, """{"p": true}"""),       // bool
      (3L, """{"p": 1.0}"""),        // number (float)
      (4L, """{"p": "x"}"""),        // plain string
      (5L, """{"q": 9}"""),          // missing path
      (6L, """{"p": null}""")        // json null
    ).toDF("id", "js")
    def ids(expr: String): Set[Long] =
      rows.filter(ExprCompiler.compile(expr, rows, jsonColumns = Set("js")))
        .select("id").as[Long].collect().toSet
    // LIKE/regex over a JSON path hit the STRING kernel only: the
    // number 1 and float 1.0 extract as "1"/"1.0" but must not match
    assert(ids("""js["p"] like "1%"""") == Set(1L))
    assert(ids("""js["p"] =~ "^1.*"""") == Set(1L))
    // kind mismatch is definitely-false: its negation INCLUDES the
    // numbers, while missing/json-null paths stay excluded (3VL)
    assert(ids("""not (js["p"] like "1%")""") == Set(0L, 2L, 3L, 4L))
    // int literal matches the number bucket only (int and float share it)
    assert(ids("""js["p"] == 1""") == Set(0L, 3L))
    // string literal matches strings only — NOT the number 1
    assert(ids("""js["p"] == "1"""") == Set(1L))
    // bool literal matches booleans only
    assert(ids("""js["p"] == true""") == Set(2L))
    // != is also typed: kind mismatch is false, not true
    assert(ids("""js["p"] != 1""") == Set.empty[Long])
    assert(ids("""js["p"] != "1"""") == Set(4L))
    // mixed-type IN = the typed OR expansion (#51489)
    assert(ids("""js["p"] in [1, "1"]""") == Set(0L, 1L, 3L))
    assert(ids("""js["p"] in [true, 1]""") == Set(0L, 2L, 3L))
    assert(ids("""js["p"] in ["x", "1"]""") == Set(1L, 4L))
    // homogeneous IN agrees with its OR expansion (equivalence contract)
    assert(ids("""js["p"] in [1, 2]""") ==
      ids("""js["p"] == 1 or js["p"] == 2"""))
    // ranges are typed too: the string "1" is not in numeric ranges
    assert(ids("""js["p"] < 2""") == Set(0L, 3L))
    // not-in over a missing path / json null excludes the row (3VL)
    assert(ids("""js["p"] not in [1]""") == Set(1L, 2L, 4L))
    // template-delivered lists take the SAME typed union as inline ones
    def tids(expr: String, params: Map[String, Any]): Set[Long] =
      rows.filter(ExprCompiler.compile(Parser.parse(expr),
        ExprCompiler.Ctx(rows.schema, jsonColumns = Set("js"), params = params)))
        .select("id").as[Long].collect().toSet
    assert(tids("""js["p"] in {vals}""", Map("vals" -> Seq(1))) == Set(0L, 3L))
    assert(tids("""js["p"] in {vals}""", Map("vals" -> Seq(1, "1"))) == Set(0L, 1L, 3L))
    assert(tids("""js["p"] in {vals}""", Map("vals" -> Seq(true, 1))) == Set(0L, 2L, 3L))
  }

  test("JSON int64 comparisons above 2^53 stay exact (no double rounding)") {
    val rows = Seq(
      (0L, """{"p": 9007199254740993}"""), // 2^53 + 1
      (1L, """{"p": 9007199254740992}"""), // 2^53
      (2L, """{"p": 1.5}""")
    ).toDF("id", "js")
    def ids(expr: String): Set[Long] =
      rows.filter(ExprCompiler.compile(expr, rows, jsonColumns = Set("js")))
        .select("id").as[Long].collect().toSet
    // a DOUBLE cast would round both ids to the same value and match both
    assert(ids("""js["p"] == 9007199254740992""") == Set(1L))
    assert(ids("""js["p"] == 9007199254740993""") == Set(0L))
    assert(ids("""js["p"] > 9007199254740992""") == Set(0L))
    // fractional values still land in the shared number bucket
    assert(ids("""js["p"] == 1.5""") == Set(2L))
  }

  test("bloom_match keeps every true member and only false-positive extras") {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.functions.xxhash64
    import org.apache.spark.sql.graft.ColumnBridge
    // serialize a filter over ids 0..19, probe the fixture through the
    // expression language: no false negatives, any extras must at least
    // be marked might-contain by the SAME filter (false positives)
    val members = df.filter($"id" < 20)
    val bfAgg = ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64($"id")),
      Literal(100L), Literal(4096L)).toAggregateExpression())
    val blob = members.agg(bfAgg.as("bf")).head.getAs[Array[Byte]]("bf")
    val b64 = java.util.Base64.getEncoder.encodeToString(blob)
    val got = df.filter(ExprCompiler.compile(s"""bloom_match(id, "$b64")""", df))
      .select("id").as[Long].collect().toSet
    assert((0L until 20L).toSet.subsetOf(got), "bloom_match lost a true member")
    assert(got.size <= 30, "implausible false-positive volume for 4096 bits")
  }

  test("ranges and arithmetic") {
    check("id > 50", $"id" > 50)
    check("id >= 50 and id < 60", $"id" >= 50 && $"id" < 60)
    check("10 < id <= 20", $"id" > 10 && $"id" <= 20)
    check("30 >= id > 20", $"id" <= 30 && $"id" > 20)
    check("(id % 3) == 0", $"id" % 3 === 0)
    check("id * 2 + 1 > 100", $"id" * 2 + 1 > 100)
    // `id ** 2` is rejected — VisitPower folds constants only (see the
    // dedicated #48440/pow test below)
    check("-id >= -10", negate($"id") >= -10)
    check("f / 2 > 10.0", $"f" / 2 > 10.0)
  }

  test("equality, in, like, regex") {
    check("s == 'name_7'", $"s" === "name_7")
    check("s != 'name_7'", $"s" =!= "name_7")
    check("id in [1, 2, 3]", $"id".isin(1, 2, 3))
    check("id not in [1, 2, 3]", !$"id".isin(1, 2, 3))
    // '_' is a one-char wildcard (pattern_match.go:9-12) — Spark SQL
    // LIKE shares the model, so Column.like is a fair oracle here
    check("s like 'name_1%'", $"s".like("name_1%"))
    check("s like '%_x'", $"s".like("%_x"))
    check("s like '%me_1%'", $"s".like("%me_1%"))
    // escaped '_' is the literal char (RegexQuery.cpp escape-next model)
    check("""s like 'name\\_1%'""", $"s".startsWith("name_1"))
    check("""s like '%\\_x'""", $"s".endsWith("_x"))
    check("s =~ 'name_[0-9]_x'", $"s".rlike("name_[0-9]_x"))
    check("s !~ 'name_[0-9]_x'", !$"s".rlike("name_[0-9]_x"))
    // a bare ARRAY field never pattern-matches implicitly (plan-time
    // rejection, test_milvus_client_regex_filter.py:690-707)
    val e = intercept[ExprCompiler.CompileError](
      ExprCompiler.compile("""sarr =~ "common"""", df))
    assert(e.getMessage.contains("array fields directly"))
    intercept[ExprCompiler.CompileError](
      ExprCompiler.compile("""sarr like "common%"""", df))
    // ...but element access is fine, and OOB indexes quietly miss
    check("""sarr[1] =~ "^common$"""", lit(true))
    check("""sarr[9] =~ ".*"""", lit(false))
    // anchored pure-literal regex lowers to Equal/Prefix/Postfix
    // (tryOptimizeRegexToLike); escaped metas count as literal,
    // shorthand classes and unanchored literals stay regex
    assert(ExprCompiler.regexToLike("^abc$") == Some(("eq", "abc")))
    assert(ExprCompiler.regexToLike("^abc") == Some(("prefix", "abc")))
    assert(ExprCompiler.regexToLike("abc$") == Some(("postfix", "abc")))
    assert(ExprCompiler.regexToLike("""^a\.b$""") == Some(("eq", "a.b")))
    assert(ExprCompiler.regexToLike("^$") == Some(("eq", "")))
    assert(ExprCompiler.regexToLike("abc").isEmpty)      // unanchored
    assert(ExprCompiler.regexToLike("""^a\d$""").isEmpty) // shorthand class
    // an escaped trailing $ is a LITERAL char, not an end anchor
    assert(ExprCompiler.regexToLike("""^ab\$""") == Some(("prefix", "ab$")))
    assert(ExprCompiler.regexToLike("^a.c$").isEmpty)    // unescaped meta
  }

  test("LIKE wildcard/escape model matches pattern_match.go") {
    // decoy-rich fixture: every case has both a positive the OTHER
    // interpretation would miss and a decoy it would wrongly admit
    // (mirrors test_milvus_client_scalar_filtering.py:1133,1183)
    val rows = Seq(
      (0L, "user_1"), (1L, "userX1"), (2L, "user%1"), (3L, "user\\1"),
      (4L, "user1"), (5L, "a%b"), (6L, "a_b"), (7L, "ab"), (8L, "axb"),
      (9L, ""), (10L, null)
    ).toDF("id", "s")
    def ids(expr: String): Set[Long] =
      rows.filter(ExprCompiler.compile(expr, rows))
        .select("id").as[Long].collect().toSet
    // unescaped '_' matches exactly one char
    assert(ids("""s like "user_1"""") == Set(0L, 1L, 2L, 3L))
    assert(ids("""s like "a_b"""") == Set(5L, 6L, 8L))
    // '\_' / '\%' are the literal chars; string layer halves '\\' first
    assert(ids("""s like "user\\_1"""") == Set(0L))
    assert(ids("""s like "a\\%b"""") == Set(5L))
    // raw strings skip the string-literal escape layer (VisitRawString)
    assert(ids("""s like r"a\%b"""") == Set(5L))
    assert(ids("""s like r"user\_1"""") == Set(0L))
    // '\\' collapses to one literal backslash (escape-next, any byte)
    assert(ids("""s like "user\\\\1"""") == Set(3L))
    assert(ids("""s like r"user\\1"""") == Set(3L))
    // '%' spans any run; empty pattern is Equal("")
    assert(ids("""s like "a%b"""") == Set(5L, 6L, 7L, 8L))
    assert(ids("""s like "%"""") == (0L to 9L).toSet) // null never matches
    assert(ids("""s like """"") == Set(9L))
    // postfix with an escaped '%' literal
    assert(ids("""s like "%\\%1"""") == Set(2L))
    // a backslash escapes ANY next byte: "\a" -> literal 'a'
    assert(ids("""s like r"\a\b"""") == Set(7L))
    // dangling trailing backslash is ExprInvalid (RegexQuery.cpp:40-67);
    // in a RAW string a backslash before the delimiter prevents
    // termination (grammar DoubleRChar), so that spelling is a lex error
    intercept[ExprCompiler.CompileError](ids("""s like "abc\\""""))
    intercept[Lexer.LexError](ids("""s like r"abc\""""))
    // unknown escape at the STRING layer is a parse error (strconv
    // .Unquote parity): write "\\%" or a raw string to reach LIKE's layer
    intercept[Lexer.LexError](ids("""s like "a\%b""""))
  }

  test("boolean algebra and precedence") {
    check("id > 90 or id < 10 and b", $"id" > 90 || ($"id" < 10 && $"b"))
    check("not (id > 10)", !($"id" > 10))
    check("!(id > 10) && b", !($"id" > 10) && $"b")
    check("b == true", $"b" === true)
    // grammar: & binds LOOSER than == (Plan.g4 alternative order)
    assert(Parser.parse("id & 1 == 1") ==
      Binary(BinOp.BAnd, Ident("id"), Binary(BinOp.Eq, IntLit(1), IntLit(1))))
  }

  test("bitwise and shifts") {
    check("(id & 3) == 1", ($"id".bitwiseAND(3)) === 1)
    check("(id | 4) == 5", ($"id".bitwiseOR(4)) === 5)
    check("(id ^ 1) == 0", ($"id".bitwiseXOR(1)) === 0)
    check("(id << 1) > 100", shiftleft($"id", 1) > 100)
    check("(id >> 1) == 5", shiftright($"id", 1) === 5)
  }

  test("null checks") {
    check("s is null", $"s".isNull)
    check("s is not null", $"s".isNotNull)
  }

  test("array ops") {
    check("arr[0] == 5", element_at($"arr", 1) === 5)
    check("array_contains(arr, 7)", array_contains($"arr", 7L))
    check("array_contains_all(arr, [5, 6])",
      array_contains($"arr", 5L) && array_contains($"arr", 6L))
    check("array_contains_any(arr, [5, 200])",
      array_contains($"arr", 5L) || array_contains($"arr", 200L))
    check("array_length(arr) == 3", size($"arr") === 3)
    check("sarr[0] == 't5'", element_at($"sarr", 1) === "t5")
  }

  test("term target contract: single non-const field, castable list elements") {
    // VisitTerm (parser_visitor.go:1154-1211): arithmetic or constant
    // LHS is a named parse error (test_mix_scenes.py
    // test_no_index_query_with_invalid_expr), and list elements must
    // cast to the column type (castValue utils.go:264-305)
    def rejected(e: String, fragment: String): Unit = {
      val err = intercept[ExprCompiler.CompileError](
        df.filter(ExprCompiler.compile(e, df)).count())
      assert(err.getMessage.contains(fragment),
        s"wrong message for [$e]: ${err.getMessage}")
    }
    rejected("id % 13 in [0, 1, 2]", "single field")
    rejected("id + 1 in [21]", "single field")
    rejected("-id in [5]", "single field")
    rejected("5 in [1, 5]", "non-const expression")
    rejected("(3 + 4) in [7]", "non-const expression")
    rejected("""id in [1, 2.5]""", "cannot be casted")
    rejected("""id in [1, "x"]""", "cannot be casted")
    rejected("id in [true]", "cannot be casted")
    rejected("""s in ["name_1", 5]""", "cannot be casted")
    rejected("b in [1]", "cannot be casted")
    rejected("""f in [0.5, "x"]""", "cannot be casted")
    // whole-array target: scalar elements cannot cast to the array type
    rejected("arr in [1, 2]", "cannot be casted")
    // accept side: plain fields, negatives, int widening into float,
    // subscripted elements, bool lists
    assert(df.filter(ExprCompiler.compile("id in [1, 2]", df)).count() == 2)
    assert(df.filter(ExprCompiler.compile("f in [1, 2.5]", df)).count() == 2)
    assert(df.filter(ExprCompiler.compile("b in [true]", df)).count() == 50)
    assert(df.filter(ExprCompiler.compile("arr[0] in [3, 5]", df)).count() == 2)
    assert(df.filter(ExprCompiler.compile("(id) in [1]", df)).count() == 1)
  }

  test("containment element contract: list operand, comparable elements") {
    // checkContainsElement (utils.go:788-816), pinned by
    // test_bitmap_index_query_with_invalid_array_params: nested lists
    // and type-mismatched probes are named errors, not silent falses
    def rejected(e: String, fragment: String): Unit = {
      val err = intercept[ExprCompiler.CompileError](
        df.filter(ExprCompiler.compile(e, df)).count())
      assert(err.getMessage.contains(fragment),
        s"wrong message for [$e]: ${err.getMessage}")
    }
    rejected("""array_contains_any(sarr, [["a", "b"]])""", "can't compare")
    rejected("""array_contains_all(sarr, [["a"]])""", "can't compare")
    rejected("array_contains_any(sarr, [1])", "can't compare")
    rejected("""array_contains_any(arr, ["x"])""", "can't compare")
    rejected("""array_contains_any(sarr, "a")""", "must be an array")
    rejected("array_contains_all(arr, 3)", "must be an array")
    // singular contains: STRICT castValue — no float probe on int array
    rejected("array_contains(arr, 3.5)", "can't compare")
    rejected("""array_contains(arr, "a")""", "can't compare")
    // loose _any/_all comparability: float probes on int arrays pass
    assert(df.filter(ExprCompiler.compile(
      "array_contains_any(arr, [3, 200.0])", df)).count() == 3)
    assert(df.filter(ExprCompiler.compile(
      """array_contains(sarr, "common")""", df)).count() == 100)
  }

  test("json path access") {
    check("""js["a"] > 50""", get_json_object($"js", "$.a").cast("long") > 50)
    check("""js["b"] == "v7"""", get_json_object($"js", "$.b") === "v7")
    check("""js["nested"]["x"] == 3""",
      get_json_object($"js", "$.nested.x").cast("long") === 3)
    check("""js["c"][2] == 4""", get_json_object($"js", "$.c[2]").cast("long") === 4)
    check("""js["flag"] == true""",
      get_json_object($"js", "$.flag").cast("boolean") === true)
    check("""exists js["a"]""", get_json_object($"js", "$.a").isNotNull)
    check("""exists js["zzz"]""", get_json_object($"js", "$.zzz").isNotNull)
    check("""json_contains(js["c"], 2)""", lit(true)) // every row has 2
    check("""js["a"] in [1, 2, 3]""",
      get_json_object($"js", "$.a").cast("long").isin(1, 2, 3))
    check("""js["a"] is null""", get_json_object($"js", "$.a").isNull)
    check("""array_length(js["c"]) == 3""", lit(true))
  }

  test("text match functions") {
    val txt = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "pack my box with five dozen jugs"),
      (3L, "quick brown dogs and quick cats"),
      (4L, "")).toDF("id", "text")
    def got(e: String) =
      txt.filter(ExprCompiler.compile(e, txt)).select("id").as[Long].collect().toSet
    assert(got("text_match(text, 'quick fox')") == Set(1L, 3L))
    assert(got("text_match(text, 'quick fox', minimum_should_match = 2)") == Set(1L))
    assert(got("match_all(text, 'quick brown')") == Set(1L, 3L))
    assert(got("match_any(text, 'fox jugs')") == Set(1L, 2L))
    assert(got("match_least(text, 'quick brown fox', threshold = 3)") == Set(1L))
    assert(got("match_most(text, 'quick brown fox', threshold = 1)") == Set(2L, 4L))
    assert(got("match_exact(text, 'quick brown fox', threshold = 2)") == Set(3L))
    assert(got("phrase_match(text, 'quick brown')") == Set(1L, 3L))
    assert(got("phrase_match(text, 'quick fox')") == Set.empty)
    assert(got("phrase_match(text, 'quick fox', 1)") == Set(1L))
    assert(got("text_match_fuzzy(text, 'quik', threshold = 1)") == Set(1L, 3L))
    assert(got("empty(text)") == Set(4L))
    assert(got("starts_with(text, 'pack')") == Set(2L))
  }

  test("timestamptz compare with interval") {
    check("ts + INTERVAL 'P3D' > iso'2025-01-20T00:00:00Z'",
      $"ts" + expr("INTERVAL 3 DAYS") > to_timestamp(lit("2025-01-20 00:00:00")))
    check("ts - INTERVAL 'PT12H' >= iso'2025-01-10T00:00:00Z'",
      $"ts" - expr("INTERVAL 12 HOURS") >= to_timestamp(lit("2025-01-10 00:00:00")))
    check("iso'2025-01-15T00:00:00Z' < ts",
      to_timestamp(lit("2025-01-15 00:00:00")) < $"ts")
    check("ts == iso'2025-01-05T00:00:00Z'",
      $"ts" === to_timestamp(lit("2025-01-05 00:00:00")))
  }

  test("iso-literal epoch fold only fires for tstz-domain int64 columns") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sch = StructType(Seq(StructField("f", LongType),
      StructField("ts", LongType), StructField("evt", LongType)))
    // plain int64 vs iso: the reference's strict type error, never a
    // silent raw-int64-vs-epoch-nanos compare
    val e = intercept[ExprCompiler.CompileError](
      ExprCompiler.compile("f > iso'2024-01-01T00:00:00Z'",
        ExprCompiler.Ctx(sch)))
    assert(e.getMessage ==
      "comparisons between Int64 and Timestamptz are not supported")
    intercept[ExprCompiler.CompileError](
      ExprCompiler.compile("iso'2024-01-01T00:00:00Z' <= f",
        ExprCompiler.Ctx(sch)))
    // the default tstz set ('ts'/'_ts') folds to an epoch-nanos literal,
    // and a declared extra field folds too
    ExprCompiler.compile("ts >= iso'2024-01-01T00:00:00Z'",
      ExprCompiler.Ctx(sch))
    ExprCompiler.compile("evt >= iso'2024-01-01T00:00:00Z'",
      ExprCompiler.Ctx(sch, tstzFields = Set("ts", "_ts", "evt")))
  }

  test("typed-field vs wrong-kind literal is a compile error, not a runtime cast") {
    // reference planparserv2: "comparisons between Int64 and VarChar
    // are not supported" — typed columns reject kind-mismatched
    // literals at COMPILE time; JSON paths instead take the typed
    // buckets (mismatch = false), never an error
    val rows = Seq((1L, 5L, "a", """{"p": 1}""")).toDF("id", "rank", "tag", "js")
    def c(e: String) = rows.filter(ExprCompiler.compile(Parser.parse(e),
      ExprCompiler.Ctx(rows.schema, jsonColumns = Set("js")))).count()
    intercept[ExprCompiler.CompileError] { c("""rank == "bad"""") }
    intercept[ExprCompiler.CompileError] { c("""rank != "bad"""") }
    intercept[ExprCompiler.CompileError] { c("tag == 5") }
    intercept[ExprCompiler.CompileError] { c("tag > 1.5") }
    intercept[ExprCompiler.CompileError] { c("rank == true") }
    // numeric widths interconvert; JSON paths stay bucket-false
    assert(c("rank == 5.0") == 1)
    assert(c("""js["p"] == "1"""") == 0) // kind mismatch: false, not error
    // element sub-fields get the same strictness
    val sdf = Seq((1L, Seq((10L, "qa")))).toDF("id", "raw")
      .select(col("id"), transform(col("raw"), e =>
        struct(e.getField("_1").as("rank"), e.getField("_2").as("tag"))).as("events"))
    intercept[ExprCompiler.CompileError] {
      sdf.filter(ExprCompiler.compile("""element_filter(events, $[rank] == "bad")""", sdf)).count()
    }
  }

  test("empty-list containment: contains_all([]) is true, contains_any([]) is false") {
    // the reference's #51617 pinned semantics, inline and via template
    val rows = Seq(
      (1L, Seq("a", "b"), """{"tags": [1, 2]}"""),
      (2L, Seq.empty[String], """{"tags": []}""")
    ).toDF("id", "tags", "meta")
    def ids(e: String, params: Map[String, Any] = Map.empty): Set[Long] =
      rows.filter(ExprCompiler.compile(Parser.parse(e),
        ExprCompiler.Ctx(rows.schema, jsonColumns = Set("meta"), params = params)))
        .select("id").as[Long].collect().toSet
    assert(ids("array_contains_all(tags, [])") == Set(1L, 2L))
    assert(ids("array_contains_any(tags, [])") == Set.empty[Long])
    assert(ids("""json_contains_all(meta["tags"], [])""") == Set(1L, 2L))
    assert(ids("""json_contains_any(meta["tags"], [])""") == Set.empty[Long])
    // template-delivered empty list matches the inline literal
    assert(ids("array_contains_all(tags, {values})",
      Map("values" -> Seq.empty[Any])) == Set(1L, 2L))
    assert(ids("array_contains_any(tags, {values})",
      Map("values" -> Seq.empty[Any])) == Set.empty[Long])
  }

  test("tstz interval arithmetic over NULL timestamps stays UNKNOWN (3VL)") {
    // the reference's #51538 regression class: a NULL ts under
    // `ts ± INTERVAL OP iso` must stay NULL — excluded by the positive
    // filter AND by its outer negation, on BOTH interval paths (fixed
    // durations fold to a pushed literal, months take the calendar path)
    val rows = Seq(
      (1L, Some(java.sql.Timestamp.valueOf("2025-01-01 00:00:00"))),
      (2L, Some(java.sql.Timestamp.valueOf("2025-01-02 00:00:00"))),
      (5L, None)
    ).toDF("id", "ev")
    def ids(e: String): Set[Long] =
      rows.filter(ExprCompiler.compile(e, rows)).select("id").as[Long].collect().toSet
    // non-null controls
    assert(ids("ev + INTERVAL 'P1D' < iso'2025-01-03T00:00:00Z'") == Set(1L))
    assert(ids("ev + INTERVAL 'P1M' < iso'2025-02-02T00:00:00Z'") == Set(1L))
    // positive filter against an impossible bound: nothing (not the null row)
    assert(ids("ev + INTERVAL 'P1D' < iso'2000-01-01T00:00:00Z'").isEmpty)
    assert(ids("ev + INTERVAL 'P1M' < iso'2000-01-01T00:00:00Z'").isEmpty)
    // outer NOT of an always-false bound: non-null rows only — a null
    // ts must NOT resurface through the negation
    assert(ids("not (ev + INTERVAL 'P1D' < iso'1900-01-01T00:00:00Z')") == Set(1L, 2L))
    assert(ids("not (ev + INTERVAL 'P1M' < iso'1900-01-01T00:00:00Z')") == Set(1L, 2L))
    // is-null predicates still see the row
    assert(ids("ev is null") == Set(5L))
  }

  test("template variables") {
    val got = df.filter(ExprCompiler.compile(
      Parser.parse("id > {low} and id in {ids}"),
      ExprCompiler.Ctx(df.schema, params = Map("low" -> 10L, "ids" -> Seq(5L, 15L, 25L)))))
      .select("id").as[Long].collect().toSet
    assert(got == Set(15L, 25L))
  }

  test("dynamic $meta fallback") {
    val meta = Seq((1L, """{"extra": 5}"""), (2L, """{"extra": 50}""")).toDF("id", "_meta")
    val ctx = ExprCompiler.Ctx(meta.schema, metaColumn = Some("_meta"))
    val got = meta.filter(ExprCompiler.compile(Parser.parse("extra > 10"), ctx))
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L))
  }

  test("iso duration parsing") {
    assert(ExprCompiler.parseIsoDuration("P3D") == ((0, 3, 0L)))
    assert(ExprCompiler.parseIsoDuration("P1Y2M") == ((14, 0, 0L)))
    assert(ExprCompiler.parseIsoDuration("PT1H30M") == ((0, 0, 5400000000L)))
    assert(ExprCompiler.parseIsoDuration("P1DT1S") == ((0, 1, 1000000L)))
  }

  test("element_filter over struct arrays and scalar arrays") {
    val sdf = Seq(
      (1L, Seq((1L, 10.0), (2L, 50.0)), Seq(1L, 2L)),
      (2L, Seq((1L, 60.0), (3L, 70.0)), Seq(5L, 6L)),
      (3L, Seq((4L, 99.0)), Seq.empty[Long])
    ).toDF("id", "raw", "tags")
      .select(col("id"),
        transform(col("raw"), e =>
          struct(e.getField("_1").as("ln"), e.getField("_2").as("qty"))).as("items"),
        col("tags"))
    def ids(e: String): Set[Long] =
      sdf.filter(ExprCompiler.compile(e, sdf)).select("id").as[Long].collect().toSet
    // per-element conjunction: id=2 has (1,60) — early AND large on the
    // SAME element; id=1 has early(1,10) and large(2,50) on DIFFERENT
    // elements and must not match; id=3's large element is late.
    assert(ids("element_filter(items, $[qty] > 45.0 and $[ln] <= 1)") == Set(2L))
    assert(ids("element_filter(items, $[qty] > 45.0)") == Set(1L, 2L, 3L))
    // scalar arrays: $[x] is the element itself
    assert(ids("element_filter(tags, $[x] >= 5)") == Set(2L))
    // unknown sub-field and nested element_filter are rejected
    intercept[ExprCompiler.CompileError] {
      ids("element_filter(items, $[nope] > 1)")
    }
    intercept[ExprCompiler.CompileError] {
      ids("element_filter(items, element_filter(items, $[qty] > 1))")
    }
    intercept[ExprCompiler.CompileError] { ids("$[qty] > 45.0") }
    // arity errors surface as CompileError even with zero args
    intercept[ExprCompiler.CompileError] { ids("element_filter()") }
    // MATCH_* element-quantifier overloads (second arg is an element
    // expression, not a string): ALL / ANY / LEAST-with-threshold
    assert(ids("match_any(items, $[qty] > 45.0 and $[ln] <= 1)") == Set(2L))
    assert(ids("match_all(items, $[qty] > 5.0)") == Set(1L, 2L, 3L))
    assert(ids("match_all(items, $[qty] > 20.0)") == Set(2L, 3L)) // id=1: qty 10 fails
    assert(ids("match_least(items, $[qty] > 40.0, threshold=2)") == Set(2L))
    assert(ids("match_least(items, $[qty] > 40.0)") == Set(1L, 2L, 3L))
    // MATCH_MOST (≤ threshold) and MATCH_EXACT (== threshold, 0 legal)
    assert(ids("match_most(items, $[qty] > 40.0, threshold=1)") == Set(1L, 3L))
    assert(ids("match_exact(items, $[qty] > 40.0, threshold=2)") == Set(2L))
    assert(ids("match_exact(items, $[qty] > 100.0, threshold=0)") == Set(1L, 2L, 3L))
    // MATCH_LEAST rejects non-positive thresholds (reference error)
    intercept[ExprCompiler.CompileError] {
      ids("match_least(items, $[qty] > 1.0, threshold=0)")
    }
    // sub-field PROJECTION f[sub]: the array of that sub-field's values
    assert(ids("array_contains(items[ln], 3)") == Set(2L))
    assert(ids("array_contains_any(items[qty], [10.0, 99.0])") == Set(1L, 3L))
    intercept[ExprCompiler.CompileError] { ids("array_contains(items[nope], 3)") }
    // the STRING overload still routes to token matching (no regression)
    val tdf = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("id", "txt")
    assert(tdf.filter(ExprCompiler.compile("""match_all(txt, "alpha beta")""", tdf))
      .select("id").as[Long].collect().toSet == Set(1L))
    // StructIndexFieldIdentifier `f[0][sub]` (bare-identifier bracket)
    assert(ids("items[0][qty] > 45.0") == Set(2L, 3L))
    assert(ids("items[1][ln] == 2") == Set(1L))
    intercept[ExprCompiler.CompileError] { ids("items[0][nope] > 1") }
    intercept[ExprCompiler.CompileError] { ids("tags[0][sub] > 1") }
  }

  test("phrase_match rejects combinatorial slop x phrase-length explosions") {
    val d = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e = intercept[ExprCompiler.CompileError] {
      d.filter(ExprCompiler.compile(
        "phrase_match(text, 'one two three four five six seven eight nine ten eleven twelve', 20)",
        d)).collect()
    }
    assert(e.getMessage.contains("regex branches"))
    // real-sized slop still compiles
    d.filter(ExprCompiler.compile("phrase_match(text, 'a c', 2)", d)).collect()
  }

  test("grammar corners: literal radices, raw strings, escapes, arrays") {
    // Plan.g4 IntegerConstant: octal (leading 0), hex, binary
    check("id == 0x14", $"id" === 20)
    check("id == 0b10100", $"id" === 20)
    check("id == 024", $"id" === 20)
    // unary plus / bitwise not
    check("+id == 20", $"id" === 20)
    check("~id == -21", $"id" === 20) // ~x = -x-1
    // raw strings keep backslashes verbatim (RawStringLiteral)
    check("""s =~ r'name_\d_x'""", $"s".rlike("name_\\d_x"))
    // escape decoding per strconv.Unquote: \x exactly 2 hex digits,
    // octal exactly 3 digits
    assert(Lexer.tokenize("""'\x41 B\102'""") match {
      case Vector(s: Lexer.TString, Lexer.TEof) => s.v == "A BB"
      case _                                    => false
    })
    // trailing comma + empty array literals
    check("id in [1, 2, 3,]", $"id".isin(1, 2, 3))
    check("id in []", lit(false))
    // double-quoted strings are interchangeable with single
    check("s == \"name_7\"", $"s" === "name_7")
    // encoding prefixes (grammar EncodingPrefix: u8 | u | U | L)
    check("""s == u8'name_7'""", $"s" === "name_7")
    check("""s == L"name_7"""", $"s" === "name_7")
  }

  test("string escapes: convertEscapeSingle + strconv.Unquote parity") {
    def cook(src: String): String = Lexer.tokenize(src) match {
      case Vector(s: Lexer.TString, Lexer.TEof) => s.v
      case other => fail(s"unexpected tokens for $src: $other")
    }
    def bad(src: String): Unit =
      assertThrows[Lexer.LexError](cook(src))

    // the reference's own vectors, verbatim (utils_test.go:184-201)
    val goVectors = Seq(
      "\"\\'\"" -> "'",
      "\"\\\\'\"" -> "\\'",
      "\"\\\\\\'\"" -> "\\'",
      "\"\\\\\\\\'\"" -> "\\\\'",
      "\"\\\\\\\\\\'\"" -> "\\\\'",
      "'\"'" -> "\"",
      "'\"\"'" -> "\"\"",
      "'\"\"\"'" -> "\"\"\"",
      "'\"\\\"\"'" -> "\"\"\"",
      "'a\"b\\\"c\\\\\"d'" -> "a\"b\"c\\\"d",
      "\"a\\\"b\\\"c\\\\\\\"d\"" -> "a\"b\"c\\\"d",
      "'A \"test\"'" -> "A \"test\"",
      "\"A \\\"test\\\"\"" -> "A \"test\"",
      "'\\\"'" -> "\"",
      "'\\\\\"'" -> "\\\"",
      "'\\\\\\\"'" -> "\\\"",
      "'\\\\\\\\\"'" -> "\\\\\"",
      "'\\\\\\\\\\\"'" -> "\\\\\"")
    for ((in, want) <- goVectors)
      assert(cook(in) == want, s"convertEscapeSingle($in)")
    // and its error vectors: octal > 255, bad octal digit
    bad("\"\\423\"")
    bad("'\\378'")

    // \x takes EXACTLY 2 hex digits; following hex chars stay literal
    assert(cook("'\\x41B'") == "AB")
    assert(cook("'\\x41\\x42'") == "AB")
    // two \x bytes compose one UTF-8 code point, as Go byte strings do
    assert(cook("'\\xC3\\xA9'") == "\u00e9")
    // a lone invalid UTF-8 byte decodes to U+FFFD (Go keeps the raw
    // byte; both sides never match any valid-UTF-8 stored string)
    assert(cook("'\\xff'") == "\ufffd")
    bad("'\\x4'")    // short hex
    bad("'\\xG1'")   // non-hex digit
    bad("'\\x'")     // empty

    // octal: exactly 3 digits, ≤ 255, byte semantics
    assert(cook("'\\101'") == "A")
    assert(cook("'\\000'") == "\u0000")
    assert(cook("'\\303\\251'") == "\u00e9")
    bad("'\\10'")    // 2 digits — reference parse error
    bad("'\\7'")     // 1 digit

    // \u / \U: exactly 4/8 hex digits; surrogates and > 0x10FFFF error
    assert(cook("'\\u00e9'") == "\u00e9")
    assert(cook("'\\U0001F600'") == new String(Character.toChars(0x1F600)))
    bad("'\\uD800'")
    bad("'\\uDFFF'")
    bad("'\\U00110000'")
    bad("'\\u00e'")

    // unknown escapes are errors (write \\% or a raw string)
    bad("'\\%'")
    bad("'\\d'")
    bad("'\\?'")
    bad("'\\ '")

    // end-to-end through the compiler: membership must follow byte rules
    val d = Seq("AB", "\u041b", "A", "it's").toDF("s")
    def hits(e: String): Long =
      d.filter(ExprCompiler.compile(e, d)).count()
    assert(hits("s == \"\\x41B\"") == 1)     // "AB", NOT U+041B
    assert(hits("s == '\\u041b'") == 1)
    assert(hits("""s == "it\'s"""") == 1)
  }

  test("RE2 compile-error contract: Java-only constructs are rejected") {
    val d = Seq("aa", "foobar", "abc").toDF("s")
    def run(e: String): Long =
      d.filter(ExprCompiler.compile(e, d)).count()
    def rejected(e: String): Unit = {
      val err = intercept[ExprCompiler.CompileError](run(e))
      assert(err.getMessage.contains("Failed to compile regex pattern"),
        s"wrong message for $e: ${err.getMessage}")
    }
    // RE2 rejects at compile; Java would accept every one of these
    rejected("""s =~ "(a)\1"""")        // backreference
    rejected("""s =~ "foo(?=bar)"""")   // lookahead
    rejected("""s =~ "foo(?!bar)"""")   // negative lookahead
    rejected("""s =~ "(?<=foo)bar"""")  // lookbehind
    rejected("""s =~ "(?<!foo)bar"""")  // negative lookbehind
    rejected("""s =~ "ab*+"""")         // possessive quantifiers
    rejected("""s =~ "ab++"""")
    rejected("""s =~ "ab?+"""")
    rejected("""s =~ "a{2}+"""")
    rejected("""s =~ "(?>ab)c"""")      // atomic group
    rejected("""s =~ "a{1001}"""")      // kMaxRepeat = 1000
    rejected("""s =~ "a\Z"""")          // \Z / \G / \k are not RE2
    rejected("""s =~ "\Ga"""")
    rejected("""s =~ "(a)\k<g>"""")
    // Java-invalid shapes hit the backstop with the same contract
    rejected("""s =~ "(unclosed"""")
    rejected("""s =~ "a{2,1}"""")
    // valid RE2 still compiles: named groups, escaped metachars,
    // lazy quantifiers, repetition at the bound, classes
    assert(run("""s =~ "(?P<g>a)a"""") == 1)
    assert(run("""s =~ "a\+?b"""") == 1) // optional literal plus: "abc"
    assert(run("""s =~ "a+?"""") == 3)
    assert(run("""s =~ "a{1,2}"""") == 3)
    assert(run("""s =~ "[+*?]"""") == 0)
    assert(run("""s =~ "a{1000}"""") == 0)
    // a `{` that opens no numeric repetition is an RE2 LITERAL;
    // Java alone would throw "Illegal repetition"
    val e = Seq("a{,5}", "a{}x", "{x}").toDF("s")
    def hits(expr: String): Long =
      e.filter(ExprCompiler.compile(expr, e)).count()
    assert(hits("""s =~ "a\{,5\}"""") == 1)
    assert(hits("""s =~ "a{,5}"""") == 1)
    assert(hits("""s =~ "a{}"""") == 1)
    assert(hits("""s =~ "^\{x\}$"""") == 1)
  }

  test("three-valued logic over nullable fields (reference 3VL suite)") {
    // nullable long column: null rows must behave per SQL 3VL — a null
    // comparison is UNKNOWN, filters keep only TRUE, NOT(UNKNOWN) stays
    // UNKNOWN, and IS NULL is the only way to select the null rows
    val ndf = Seq[(Long, Option[Long])]((1L, Some(5L)), (2L, None), (3L, Some(10L)))
      .toDF("id", "v")
    def ids(e: String): Set[Long] =
      ndf.filter(ExprCompiler.compile(e, ndf)).select("id").as[Long].collect().toSet
    assert(ids("v > 4") == Set(1L, 3L))
    assert(ids("not (v > 4)") == Set.empty)          // UNKNOWN stays out under NOT
    assert(ids("v > 4 or v is null") == Set(1L, 2L, 3L))
    assert(ids("v > 4 and v is null") == Set.empty)
    assert(ids("v is null") == Set(2L))
    assert(ids("v is not null") == Set(1L, 3L))
    assert(ids("v == 5 or v == 10") == Set(1L, 3L))
    assert(ids("v != 5") == Set(3L))                  // null is neither = nor !=
    assert(ids("v in [5, 10]") == Set(1L, 3L))
    assert(ids("not (v in [5])") == Set(3L))          // null excluded from NOT IN
  }

  test("parse errors are informative") {
    intercept[Parser.ParseError](Parser.parse("id >"))
    intercept[Parser.ParseError](Parser.parse("id in (1,2)"))
    intercept[Lexer.LexError](Parser.parse("id == 'unterminated"))
  }

  test("NULL literal in operand position is meaningfully rejected (#50882)") {
    val e = intercept[Parser.ParseError](Parser.parse("id in [1, NULL, 2]"))
    assert(e.getMessage.contains("NULL literal is not supported"))
    val e2 = intercept[Parser.ParseError](Parser.parse("id == null"))
    assert(e2.getMessage.contains("NULL literal is not supported"))
    // `is null` / `is not null` remain the supported forms
    Parser.parse("id is null"); Parser.parse("id is not null")
  }

  test("integer arithmetic at int64 boundaries uses exact math (#48440)") {
    val rows = Seq(
      (0L, Long.MaxValue - 1), (1L, 100L), (2L, Long.MinValue), (3L, -1L),
      (4L, 0L), (5L, 1L), (6L, Long.MaxValue), (7L, Long.MinValue + 1),
      (8L, 20000L), (9L, 19950L)).toDF("id", "v")
    def ids(e: String): Set[Long] =
      rows.filter(ExprCompiler.compile(e, rows)).select("id").as[Long]
        .collect().toSet
    // exact-math truths computed with arbitrary precision (the
    // reference's predicate side): MAX + 33 is ABOVE 19974, not a
    // wrapped negative and not an ANSI abort
    assert(ids("v + 33 <= 19974") == Set(1L, 2L, 3L, 4L, 5L, 7L))
    assert(ids("v - 1 >= 0") == Set(0L, 1L, 5L, 6L, 8L, 9L))
    assert(ids("v * 2 > 1") == Set(0L, 1L, 5L, 6L, 8L, 9L))
    // mixed float arithmetic keeps its double path
    assert(ids("v * 2.0 > 1.0").contains(1L))
    // `**` folds constants only (reference parser_visitor.go:2076) — a
    // field operand is rejected at compile, matching VisitPower
    val e = intercept[ExprCompiler.CompileError](
      rows.filter(ExprCompiler.compile("v ** 2 == 100", rows)).count())
    assert(e.getMessage.contains("power can only apply on constants"))
    // a field hiding under a Div no longer sneaks past the constant
    // check (literalType used to claim Some(Double) for any Div)
    val e2 = intercept[ExprCompiler.CompileError](
      rows.filter(ExprCompiler.compile("(v / 2) ** 2 == 100", rows)).count())
    assert(e2.getMessage.contains("power can only apply on constants"))
    assert(ids("2 ** 3 == 8") == (0L to 9L).toSet) // constant fold fine
    assert(ids("(4 / 2) ** 2 == 4.0") == (0L to 9L).toSet)
  }

  test("timestamptz literals: offsets honored and bounded, naive uses timezone") {
    import ExprCompiler.parseTsMicros
    val utc = parseTsMicros("2025-01-10T12:00:00", "UTC")
    // an explicit offset wins regardless of the configured timezone
    assert(parseTsMicros("2025-01-10T12:00:00+00:00", "America/New_York") == utc)
    assert(parseTsMicros("2025-01-10T07:00:00-05:00", "UTC") == utc)
    // the PostgreSQL space variant parses too (ParseTimeTz layouts)
    assert(parseTsMicros("2025-01-10 12:00:00Z", "Asia/Shanghai") == utc)
    // a naive literal is interpreted in the zone (NY = UTC-5 in January)
    assert(parseTsMicros("2025-01-10T07:00:00", "America/New_York") == utc)
    assert(parseTsMicros("2025-01-10 20:00:00", "Asia/Shanghai") == utc)
    // offsets outside [-12:00, +14:00] and junk inputs are rejected
    intercept[ExprCompiler.CompileError](
      parseTsMicros("2025-01-10T12:00:00+15:00", "UTC"))
    intercept[ExprCompiler.CompileError](
      parseTsMicros("2025-01-10T00:00:00", "Not/AZone"))
    intercept[ExprCompiler.CompileError](parseTsMicros("not-a-time", "UTC"))
  }

  test("integral trees past DECIMAL(38,0) evaluate plain int64, no null drop") {
    val rows = Seq(
      (0L, Long.MaxValue), (1L, 3L), (2L, -2L), (3L, 0L)).toDF("id", "v")
    def ids(e: String): Set[Long] =
      rows.filter(ExprCompiler.compile(e, rows)).select("id").as[Long]
        .collect().toSet
    // a three-way int64 product can reach 2^189 — past decimal(38,0).
    // The whole tree must evaluate in plain int64 (wrap), matching what
    // Spark's own long arithmetic does, and never decimal-overflow to
    // null (which would silently drop rows from BOTH branches).
    val wrapped = Long.MaxValue * Long.MaxValue * Long.MaxValue // JVM wrap
    assert(ids(s"v * v * v == $wrapped") == Set(0L))
    // every row answers the predicate (no null-dropped rows): the
    // disjunction of == and != must cover all of them
    assert(ids(s"v * v * v == $wrapped") ++
      ids(s"v * v * v != $wrapped") == (0L to 3L).toSet)
    // a single product still takes the exact path (true-value compare)
    assert(ids("v * v >= 0") == (0L to 3L).toSet) // squares: exact, all ≥ 0
  }

  test("raw CR in a string literal passes; raw LF rejects (strconv.Unquote)") {
    val rows = Seq((1L, "CR\rX"), (2L, "plain")).toDF("id", "s")
    def ids(e: String): Set[Long] =
      rows.filter(ExprCompiler.compile(e, rows)).select("id").as[Long]
        .collect().toSet
    // Go's Unquote pre-checks contains(s, '\n') ONLY — a bare carriage
    // return inside the quotes is accepted and passes through as 0x0D
    assert(ids("s == \"CR\rX\"") == Set(1L))
    // a bare line feed is the one rejected raw control char
    val lfErr = intercept[Exception](
      rows.filter(ExprCompiler.compile("s == \"CR\nX\"", rows)).count())
    assert(lfErr.getMessage.toLowerCase.contains("newline") ||
      lfErr.getMessage.toLowerCase.contains("string"))
  }

  test("singular array_contains with a list probe raises the named error") {
    val rows = Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq(7L))).toDF("id", "nums")
    val e = intercept[ExprCompiler.CompileError](
      ExprCompiler.compile("array_contains(nums, [1, 2])", rows))
    assert(e.getMessage.contains("can't compare between array element type"))
    // _any still flattens its list operand element-wise
    assert(rows.filter(
      ExprCompiler.compile("array_contains_any(nums, [1, 7])", rows))
      .count() == 2L)
  }
}
