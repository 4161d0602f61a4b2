package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.GraftSession
import graft.expr.ExprCompiler

/** Conformance-matrix batteries mirroring the reference's systematic
  * filtering case families (reference:
  * tests/python_client/milvus_client/expressions/filtering_case_matrix.py —
  * NUMERIC_SCALAR_FIELDS sweep :283-341, ARRAY_FILTER_CASES :420-466,
  * JSON mixed-type issue buckets #51568/#51489/#51567 :100-238,
  * NULL/UNKNOWN families :359-394, BITWISE_PENDING_50964 :276).
  *
  * Design: each battery derives a typed fixture from the `events` table
  * with IDENTICAL arithmetic on the Spark side and inside the DuckDB
  * oracle SQL (casts + CASE sentinels), then evaluates every case as a
  * conditional count in ONE single-scan aggregate — N cases cost one
  * codegen'd pass over the table, the same harness q_expr_matrix uses.
  * The oracle recomputes each count independently with DuckDB's own
  * typed/JSON machinery (json_type kind gates mirror the engine's
  * variant-kind buckets), so the two sides share no evaluation path.
  */
object MatrixQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    GraftSession.table(s, dir, name)

  /** One matrix case: engine filter-language expr + independent DuckDB
    * predicate over the same derived fixture.
    */
  final case class MCase(id: String, engine: String, duck: String)

  /** Single-scan harness: every case becomes a conditional-sum
    * aggregate over the derived fixture — one pass, no shuffle beyond
    * the final 1-row reduce.
    */
  private def battery(s: SparkSession, base: DataFrame, cases: Seq[MCase],
      jsonCols: Set[String] = Set.empty, spread: Boolean = false): DataFrame = {
    val counters = cases.map { c =>
      sum(when(ExprCompiler.compile(c.engine, base, jsonColumns = jsonCols),
        1L).otherwise(0L)).as(c.id)
    }
    // spread (opt-in): heavy case predicates (the JSON kind dispatch
    // re-parses the document to variant per comparison) live in
    // AGGREGATE expressions, which do not push below a repartition —
    // spreading the one-row-group scan runs the partial agg in parallel
    // (a no-op at real file counts). Cheap batteries skip it: the
    // round-robin exchange costs more than their predicates
    // (measured: typed/like/array regress ~0.2 s, json-kind -1.3 s).
    val spreadBase = if (spread) graft.GraftSession.spread(base) else base
    val row = spreadBase.agg(counters.head, counters.tail: _*).head()
    import s.implicits._
    cases.map(c => (c.id, row.getAs[Long](c.id)))
      .toDF("case_id", "cnt").orderBy(col("case_id"))
  }

  private def oracleFor(cases: Seq[MCase], derivSql: String): String =
    cases.map(c =>
      s"SELECT '${c.id}' AS case_id, count(*) AS cnt FROM ($derivSql) WHERE ${c.duck}")
      .mkString("SELECT * FROM (\n", "\nUNION ALL ", "\n) ORDER BY case_id")

  // =================================================================
  // Battery 1 — typed numeric scalar sweep (six widths + sentinels)
  // reference filtering_case_matrix.py NUMERIC_SCALAR_FIELDS :283-341,
  // NUMERIC_DISTINCT :343, BITWISE :269-280, ARITHMETIC_EXTENDED :396
  // =================================================================

  /** The reference's value formula: ((row + shift - 1) % 10) + 1 per
    * width, with width-extreme sentinels at rows 11/12.
    */
  private[graft] def typedDf(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val id = col("event_id")
    def cyc(shift: Int): Column = ((id + lit(shift)) % 10) + 1
    ev.select(
      id.as("id"),
      when(id === 11, 127).when(id === 12, -128)
        .otherwise(cyc(0)).cast("tinyint").as("i8"),
      when(id === 11, 32767).when(id === 12, -32768)
        .otherwise(cyc(1)).cast("smallint").as("i16"),
      when(id === 11, 2147483647L).when(id === 12, -2147483648L)
        .otherwise(cyc(2)).cast("int").as("i32"),
      when(id === 11, Long.MaxValue).when(id === 12, Long.MinValue)
        .otherwise(cyc(9)).cast("bigint").as("i64"),
      when(id === 11, 127.5).when(id === 12, -127.5)
        .otherwise(cyc(3).cast("double")).cast("float").as("f"),
      when(id === 11, 1000000000000.25).when(id === 12, -1000000000000.25)
        .otherwise(cyc(4).cast("double")).as("d"),
      (id % 8).as("flags"),
      (id % 2 === 0).as("active"),
      when(id % 10 === 0, concat(lit("system_"), id.cast("string")))
        .otherwise(concat(lit("user_"), (id % 10).cast("string"))).as("name"))
  }

  private val typedSql: String =
    """SELECT event_id AS id,
      |  CAST(CASE WHEN event_id = 11 THEN 127 WHEN event_id = 12 THEN -128
      |    ELSE ((event_id + 0) % 10) + 1 END AS TINYINT) AS i8,
      |  CAST(CASE WHEN event_id = 11 THEN 32767 WHEN event_id = 12 THEN -32768
      |    ELSE ((event_id + 1) % 10) + 1 END AS SMALLINT) AS i16,
      |  CAST(CASE WHEN event_id = 11 THEN 2147483647 WHEN event_id = 12 THEN -2147483648
      |    ELSE ((event_id + 2) % 10) + 1 END AS INTEGER) AS i32,
      |  CAST(CASE WHEN event_id = 11 THEN 9223372036854775807 WHEN event_id = 12 THEN -9223372036854775808
      |    ELSE ((event_id + 9) % 10) + 1 END AS BIGINT) AS i64,
      |  CAST(CASE WHEN event_id = 11 THEN 127.5 WHEN event_id = 12 THEN -127.5
      |    ELSE ((event_id + 3) % 10) + 1 END AS FLOAT) AS f,
      |  CAST(CASE WHEN event_id = 11 THEN 1000000000000.25 WHEN event_id = 12 THEN -1000000000000.25
      |    ELSE ((event_id + 4) % 10) + 1 END AS DOUBLE) AS d,
      |  event_id % 8 AS flags,
      |  (event_id % 2) = 0 AS active,
      |  CASE WHEN event_id % 10 = 0 THEN 'system_' || CAST(event_id AS VARCHAR)
      |    ELSE 'user_' || CAST(event_id % 10 AS VARCHAR) END AS name
      |FROM events""".stripMargin

  private val numericFields = Seq("i8", "i16", "i32", "i64", "f", "d")

  private[graft] val TypedCases: Seq[MCase] = {
    val sweep = numericFields.flatMap { fld =>
      Seq(
        MCase(s"${fld}_eq_3", s"$fld == 3", s"$fld = 3"),
        MCase(s"${fld}_range_3_6", s"$fld > 3 and $fld <= 6",
          s"$fld > 3 AND $fld <= 6"),
        MCase(s"${fld}_in_odd", s"$fld in [1, 3, 5]", s"$fld IN (1, 3, 5)"),
        MCase(s"${fld}_not_in_odd", s"$fld not in [1, 3, 5]",
          s"$fld NOT IN (1, 3, 5)"))
    }
    val sentinels = Seq(
      MCase("i8_max", "i8 == 127", "i8 = 127"),
      MCase("i8_min", "i8 == -128", "i8 = -128"),
      MCase("i16_max", "i16 == 32767", "i16 = 32767"),
      MCase("i32_min", "i32 == -2147483648", "i32 = -2147483648"),
      MCase("i64_max", "i64 == 9223372036854775807",
        "i64 = 9223372036854775807"),
      MCase("f_fraction", "f > 127.4 and f < 127.6", "f > 127.4 AND f < 127.6"),
      MCase("d_fraction", "d > 1000000000000.2 and d < 1000000000000.3",
        "d > 1000000000000.2 AND d < 1000000000000.3"))
    // bitwise control + the issue-50964 pending family (shift/NOT),
    // over a sentinel-free column so neither side can overflow
    val bitwise = Seq(
      MCase("bit_and_ctl", "(flags & 1) == 1", "(flags & 1) = 1"),
      MCase("bit_or_ctl", "(flags | 1) == 1", "(flags | 1) = 1"),
      MCase("bit_xor_ctl", "(flags ^ 1) == 0", "(flags ^ 1) = 0"),
      MCase("shl_50964", "(flags << 1) == 4", "(flags << 1) = 4"),
      MCase("shr_50964", "(flags >> 2) == 1", "(flags >> 2) = 1"),
      MCase("bnot_50964", "~flags == -1", "~flags = -1"))
    // exact integer arithmetic at the width boundaries (reference
    // #48440, test_filter_expression_issue_mining.py
    // INT64_OVERFLOW_CASES + NARROW_INTEGER_ARITHMETIC_CASES): the
    // sentinel rows hold i64 MAX/MIN (and i32/i16/i8 extremes), so
    // `i64 + 33` must compare by its TRUE value — DuckDB mirrors with
    // HUGEINT casts, the engine with DECIMAL(38,0) internal math
    val exactArith = Seq(
      MCase("ovf_add_48440", "i64 + 33 <= 19974",
        "CAST(i64 AS HUGEINT) + 33 <= 19974"),
      MCase("ovf_sub_48440", "i64 - 1 >= 0",
        "CAST(i64 AS HUGEINT) - 1 >= 0"),
      MCase("ovf_mul_48440", "i64 * 2 > 1",
        "CAST(i64 AS HUGEINT) * 2 > 1"),
      MCase("ovf_i32_add", "i32 + 33 <= 19974",
        "CAST(i32 AS HUGEINT) + 33 <= 19974"),
      MCase("ovf_i32_mul", "i32 * 2 > 1",
        "CAST(i32 AS HUGEINT) * 2 > 1"),
      MCase("ovf_i16_add", "i16 + 2 > 0",
        "CAST(i16 AS HUGEINT) + 2 > 0"),
      MCase("ovf_i8_add", "i8 + 2 > 0",
        "CAST(i8 AS HUGEINT) + 2 > 0"))
    val arith = Seq(
      MCase("arith_mod_div_pow",
        "(i64 % 2 == 0 and i64 / 2 >= 2) or (2 ** 3 == 8 and i64 == 3)",
        "(i64 % 2 = 0 AND i64 / 2 >= 2) OR (power(2, 3) = 8 AND i64 = 3)"),
      MCase("arith_pow_false_ctl",
        "(2 ** 3 == 7 and i64 == 3) or i64 == 4",
        "(power(2, 3) = 7 AND i64 = 3) OR i64 = 4"))
    val other = Seq(
      // reference LIKE = SQL LIKE ('%' any-run, '_' one char,
      // '\'-escape; pattern_match.go:9-61) — DuckDB's native semantics
      MCase("varchar_like_prefix", """name like "user_%"""",
        "name LIKE 'user_%'"),
      MCase("varchar_like_esc_underscore", """name like "user\\_%"""",
        raw"name LIKE 'user\_%' ESCAPE '\'"),
      MCase("varchar_in", """name in ["user_1", "user_3"]""",
        "name IN ('user_1', 'user_3')"),
      MCase("bool_true", "active == true", "active = true"),
      MCase("bool_false", "active == false", "active = false"),
      MCase("i16_between_two_sided", "3 < i16 <= 6", "i16 > 3 AND i16 <= 6"),
      MCase("cross_width_cmp", "i8 <= i16", "i8 <= i16"))
    sweep ++ sentinels ++ bitwise ++ exactArith ++ arith ++ other
  }

  def typedMatrix(s: SparkSession, dir: String): DataFrame =
    battery(s, typedDf(s, dir), TypedCases)

  private[graft] val typedMatrixOracle: String = oracleFor(TypedCases, typedSql)

  // =================================================================
  // Battery 2 — array families (typed arrays, lengths, null/empty)
  // reference ARRAY_FILTER_CASES :420, ARRAY_LENGTH :432,
  // ARRAY_OTHER_TYPE :442, ARRAY_NULL_EMPTY :449, order pairs :460
  // =================================================================

  private[graft] def arrayDf(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val withM = ev.select(col("event_id").as("id"),
      (col("event_id") % 10).as("m"))
    val m = col("m")
    def strs(xs: String*): Column = array(xs.map(lit): _*)
    def dbls(xs: Double*): Column = array(xs.map(lit): _*)
    withM.select(
      col("id"), m,
      when(m === 0, array(lit(10L))).otherwise(array(m - 2, m - 1, m))
        .as("arr_i64"),
      when(m === 1, strs("green", "red", "amber"))
        .when(m === 2, strs("green", "blue", "amber"))
        .when(m === 3, strs("red")).when(m === 4, strs("blue"))
        .when(m === 5, strs("green")).when(m === 6, strs("green"))
        .when(m === 7, strs("yellow")).when(m === 8, strs("yellow"))
        .when(m === 9, strs("black")).otherwise(strs("white"))
        .as("arr_varchar"),
      when(m === 3, dbls(30.0, 3.5, 31.0)).when(m === 4, dbls(3.0, 40.5))
        .otherwise(array(m.cast("double"), m.cast("double") + 0.5))
        .cast("array<float>").as("arr_float"),
      when(m === 2, dbls(20.0, 2.25, 21.0)).when(m === 3, dbls(2.0, 30.25))
        .when(m === 9, dbls(90.0, 9.25, 91.0)).when(m === 0, dbls(9.0, 100.25))
        .otherwise(array(m.cast("double"), m.cast("double") + 0.25))
        .as("arr_double"),
      when(m === 1, array(lit(true), lit(true)))
        .when(m === 2, array(lit(false), lit(false)))
        .when(m === 8, array(lit(false), lit(true), lit(false)))
        .when(m === 9, array(lit(true), lit(false), lit(true)))
        .otherwise(array(m % 2 === 0)).as("arr_bool"),
      when(m === 6, lit(null).cast("array<bigint>"))
        .when(m === 0, array().cast("array<bigint>"))
        .otherwise(array(m)).as("nullable_arr_i64"),
      (col("id") % 2 === 0).as("active"))
  }

  private val arraySql: String =
    """SELECT id, m,
      |  CASE WHEN m = 0 THEN [CAST(10 AS BIGINT)] ELSE [m - 2, m - 1, m] END AS arr_i64,
      |  CASE m WHEN 1 THEN ['green', 'red', 'amber'] WHEN 2 THEN ['green', 'blue', 'amber']
      |    WHEN 3 THEN ['red'] WHEN 4 THEN ['blue'] WHEN 5 THEN ['green'] WHEN 6 THEN ['green']
      |    WHEN 7 THEN ['yellow'] WHEN 8 THEN ['yellow'] WHEN 9 THEN ['black']
      |    ELSE ['white'] END AS arr_varchar,
      |  CAST(CASE WHEN m = 3 THEN [30.0, 3.5, 31.0] WHEN m = 4 THEN [3.0, 40.5]
      |    ELSE [m + 0.0, m + 0.5] END AS FLOAT[]) AS arr_float,
      |  CAST(CASE WHEN m = 2 THEN [20.0, 2.25, 21.0] WHEN m = 3 THEN [2.0, 30.25]
      |    WHEN m = 9 THEN [90.0, 9.25, 91.0] WHEN m = 0 THEN [9.0, 100.25]
      |    ELSE [m + 0.0, m + 0.25] END AS DOUBLE[]) AS arr_double,
      |  CASE WHEN m = 1 THEN [true, true] WHEN m = 2 THEN [false, false]
      |    WHEN m = 8 THEN [false, true, false] WHEN m = 9 THEN [true, false, true]
      |    ELSE [m % 2 = 0] END AS arr_bool,
      |  CASE WHEN m = 6 THEN NULL WHEN m = 0 THEN CAST([] AS BIGINT[])
      |    ELSE [m] END AS nullable_arr_i64,
      |  (id % 2) = 0 AS active
      |FROM (SELECT event_id AS id, event_id % 10 AS m FROM events)""".stripMargin

  private[graft] val ArrayCases: Seq[MCase] = Seq(
    MCase("arr_i64_contains_3", "array_contains(arr_i64, 3)",
      "list_contains(arr_i64, 3)"),
    MCase("arr_i64_contains_any", "array_contains_any(arr_i64, [3, 7])",
      "list_has_any(arr_i64, [3, 7])"),
    MCase("arr_i64_contains_all", "array_contains_all(arr_i64, [3, 4])",
      "list_has_all(arr_i64, [3, 4])"),
    MCase("arr_varchar_contains_red", """array_contains(arr_varchar, "red")""",
      "list_contains(arr_varchar, 'red')"),
    MCase("arr_varchar_contains_any",
      """array_contains_any(arr_varchar, ["red", "blue"])""",
      "list_has_any(arr_varchar, ['red', 'blue'])"),
    MCase("arr_i64_length_3", "array_length(arr_i64) == 3",
      "len(arr_i64) = 3"),
    MCase("nullable_arr_length_0", "array_length(nullable_arr_i64) == 0",
      "len(nullable_arr_i64) = 0"),
    MCase("nullable_arr_length_1", "array_length(nullable_arr_i64) == 1",
      "len(nullable_arr_i64) = 1"),
    MCase("arr_float_contains_3_5", "array_contains(arr_float, 3.5)",
      "list_contains(arr_float, 3.5)"),
    MCase("arr_double_contains_any",
      "array_contains_any(arr_double, [2.25, 9.25])",
      "list_has_any(arr_double, [2.25, 9.25])"),
    MCase("arr_bool_contains_true", "array_contains(arr_bool, true)",
      "list_contains(arr_bool, true)"),
    MCase("arr_bool_contains_false", "array_contains(arr_bool, false)",
      "list_contains(arr_bool, false)"),
    MCase("nullable_arr_is_null", "nullable_arr_i64 is null",
      "nullable_arr_i64 IS NULL"),
    MCase("nullable_arr_is_not_null", "nullable_arr_i64 is not null",
      "nullable_arr_i64 IS NOT NULL"),
    MCase("nullable_arr_contains_ctl", "array_contains(nullable_arr_i64, 5)",
      "list_contains(nullable_arr_i64, 5)"),
    // 3VL: NULL array → UNKNOWN → excluded; [] → contains false → kept
    MCase("nullable_arr_not_contains",
      "not array_contains(nullable_arr_i64, 10)",
      "NOT list_contains(nullable_arr_i64, 10)"),
    // #51617 empty-list contracts: any([]) = false, all([]) = vacuous
    MCase("empty_contains_any", "array_contains_any(arr_i64, [])", "1 = 0"),
    MCase("empty_contains_all", "array_contains_all(arr_i64, [])",
      "arr_i64 IS NOT NULL"),
    // operand-order pair (ORDER_ARRAY_FUNCTION_EXPRESSIONS :460)
    MCase("arr_and_scalar_a", "array_contains(arr_i64, 3) and active == true",
      "list_contains(arr_i64, 3) AND active = true"),
    MCase("arr_and_scalar_b", "active == true and array_contains(arr_i64, 3)",
      "active = true AND list_contains(arr_i64, 3)"))

  def arrayMatrix(s: SparkSession, dir: String): DataFrame =
    battery(s, arrayDf(s, dir), ArrayCases)

  private[graft] val arrayMatrixOracle: String = oracleFor(ArrayCases, arraySql)

  // =================================================================
  // Battery 3 — NULL / UNKNOWN composition families
  // reference NULL_FILTER_CASES :359, JSON_KEY_NULL :372,
  // UNKNOWN_BOOLEAN_COMPOSITION :384, UNARY_NOT :353
  // =================================================================

  private[graft] def nullDf(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val withM = ev.select(col("event_id").as("id"),
      (col("event_id") % 12).as("m12"))
    val m12 = col("m12")
    withM.select(
      col("id"), m12,
      when(m12.isin(3, 4, 7), lit(null)).otherwise(col("id"))
        .cast("bigint").as("nullable_i64"),
      when(m12.isin(4, 8), lit(null))
        .otherwise(concat(lit("nullable_"), m12.cast("string")))
        .cast("string").as("nullable_varchar"),
      when(m12 === 5, lit(null)).otherwise(col("id") % 2 === 0)
        .cast("boolean").as("nullable_bool"),
      when(m12 === 2,
        concat(lit("{\"rank\": "), m12.cast("string"),
          lit(", \"maybe_null\": null}")))
        .otherwise(concat(lit("{\"rank\": "), m12.cast("string"),
          lit(", \"maybe_null\": "), m12.cast("string"), lit("}")))
        .as("j"))
  }

  private val nullSql: String =
    """SELECT id, m12,
      |  CASE WHEN m12 IN (3, 4, 7) THEN NULL ELSE id END AS nullable_i64,
      |  CASE WHEN m12 IN (4, 8) THEN NULL
      |    ELSE 'nullable_' || CAST(m12 AS VARCHAR) END AS nullable_varchar,
      |  CASE WHEN m12 = 5 THEN NULL ELSE (id % 2) = 0 END AS nullable_bool,
      |  CASE WHEN m12 = 2 THEN '{"rank": ' || CAST(m12 AS VARCHAR) || ', "maybe_null": null}'
      |    ELSE '{"rank": ' || CAST(m12 AS VARCHAR) || ', "maybe_null": ' || CAST(m12 AS VARCHAR) || '}'
      |  END AS j
      |FROM (SELECT event_id AS id, event_id % 12 AS m12 FROM events)""".stripMargin

  /** The engine's typed-bucket guard, mirrored in DuckDB: missing path
    * or JSON null → UNKNOWN (NULL); kind mismatch → definitely false.
    */
  private def jGuard(path: String, kindPred: String, cmp: String): String = {
    val jt = s"json_type(j, '$path')"
    s"(CASE WHEN $jt IS NULL OR $jt = 'NULL' THEN NULL ELSE ($kindPred AND $cmp) END)"
  }
  private[graft] val NullCases: Seq[MCase] = Seq(
    MCase("nullable_i64_is_null", "nullable_i64 is null",
      "nullable_i64 IS NULL"),
    MCase("nullable_i64_is_not_null", "nullable_i64 is not null",
      "nullable_i64 IS NOT NULL"),
    MCase("nullable_varchar_is_null", "nullable_varchar is null",
      "nullable_varchar IS NULL"),
    MCase("nullable_varchar_is_not_null", "nullable_varchar is not null",
      "nullable_varchar IS NOT NULL"),
    MCase("nullable_bool_is_null", "nullable_bool is null",
      "nullable_bool IS NULL"),
    MCase("nullable_bool_is_not_null", "nullable_bool is not null",
      "nullable_bool IS NOT NULL"),
    MCase("json_present_null_is_null", """j["maybe_null"] is null""",
      "json_extract_string(j, '$.maybe_null') IS NULL"),
    MCase("json_present_null_is_not_null", """j["maybe_null"] is not null""",
      "json_extract_string(j, '$.maybe_null') IS NOT NULL"),
    MCase("json_missing_key_is_null", """j["missing_key"] is null""",
      "json_extract_string(j, '$.missing_key') IS NULL"),
    MCase("json_missing_key_is_not_null", """j["missing_key"] is not null""",
      "json_extract_string(j, '$.missing_key') IS NOT NULL"),
    // UNKNOWN stays UNKNOWN under NOT: zero rows, not "all rows"
    MCase("json_missing_outer_not_eq", """not (j["missing_key"] == 1)""",
      "NOT (CASE WHEN json_type(j, '$.missing_key') IS NULL THEN NULL " +
        "ELSE TRY_CAST(json_extract_string(j, '$.missing_key') AS DECIMAL(38,10)) = 1 END)"),
    MCase("unknown_or_true", """j["missing_key"] == 1 or id in [1, 2]""",
      "(CASE WHEN json_type(j, '$.missing_key') IS NULL THEN NULL " +
        "ELSE TRY_CAST(json_extract_string(j, '$.missing_key') AS DECIMAL(38,10)) = 1 END) " +
        "OR id IN (1, 2)"),
    MCase("unknown_and_true", """j["missing_key"] == 1 and id in [1, 2]""",
      "(CASE WHEN json_type(j, '$.missing_key') IS NULL THEN NULL " +
        "ELSE TRY_CAST(json_extract_string(j, '$.missing_key') AS DECIMAL(38,10)) = 1 END) " +
        "AND id IN (1, 2)"),
    MCase("not_unknown_or_true", """not ((j["missing_key"] == 1) or id == 1)""",
      "NOT ((CASE WHEN json_type(j, '$.missing_key') IS NULL THEN NULL " +
        "ELSE TRY_CAST(json_extract_string(j, '$.missing_key') AS DECIMAL(38,10)) = 1 END) " +
        "OR id = 1)"),
    MCase("is_null_then_not_eq_unknown",
      """j["missing_key"] is null and not (j["missing_key"] == 1)""",
      "json_extract_string(j, '$.missing_key') IS NULL AND " +
        "NOT (CASE WHEN json_type(j, '$.missing_key') IS NULL THEN NULL " +
        "ELSE TRY_CAST(json_extract_string(j, '$.missing_key') AS DECIMAL(38,10)) = 1 END)"),
    MCase("not_json_key_is_null", """not (j["maybe_null"] is null)""",
      "NOT (json_extract_string(j, '$.maybe_null') IS NULL)"),
    MCase("not_nullable_bool_true", "not (nullable_bool == true)",
      "NOT (nullable_bool = true)"),
    MCase("not_json_rank_ge_3", """not (j["rank"] >= 3)""",
      "NOT (TRY_CAST(json_extract_string(j, '$.rank') AS DECIMAL(38,10)) >= 3)"),
    MCase("nullable_cmp_3vl", "nullable_i64 >= 5", "nullable_i64 >= 5"),
    // NULL rows stay excluded from BOTH a comparison and its negation
    MCase("nullable_cmp_3vl_not", "not (nullable_i64 >= 5)",
      "NOT (nullable_i64 >= 5)"),
    MCase("nullable_varchar_like", """nullable_varchar like "nullable_%"""",
      "nullable_varchar LIKE 'nullable_%'"))

  def nullMatrix(s: SparkSession, dir: String): DataFrame =
    battery(s, nullDf(s, dir), NullCases, jsonCols = Set("j"), spread = true)

  private[graft] val nullMatrixOracle: String = oracleFor(NullCases, nullSql)

  // =================================================================
  // Battery 4 — JSON typed-kind buckets (mixed-type IN / OR / bool)
  // reference issue families #51568 :100, #51489 :161, #51567 :184-236
  // =================================================================

  /** Six JSON kinds cycling by row: int, float, string-number, array,
    * missing key, json null — every typed-bucket transition in one
    * derived column pair (p for value kinds, b for bool/int/string).
    */
  private[graft] def jsonKindDf(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val withM = ev.select(col("event_id").as("id"),
      (col("event_id") % 6).as("m6"))
    val m6 = col("m6")
    val idS = col("id").cast("string")
    withM.select(
      col("id"), m6,
      when(m6 === 0, concat(lit("{\"p\": "), idS, lit(", \"b\": true}")))
        .when(m6 === 1, concat(lit("{\"p\": "), idS, lit(".5, \"b\": false}")))
        .when(m6 === 2, concat(lit("{\"p\": \""), idS, lit("\", \"b\": 1}")))
        .when(m6 === 3, concat(lit("{\"p\": ["), idS, lit("], \"b\": 0}")))
        .when(m6 === 4, lit("{\"b\": \"yes\"}"))
        .otherwise(lit("{\"p\": null, \"b\": \"no\"}"))
        .as("j"))
  }

  private val jsonKindSql: String =
    """SELECT id, m6,
      |  CASE m6
      |    WHEN 0 THEN '{"p": ' || CAST(id AS VARCHAR) || ', "b": true}'
      |    WHEN 1 THEN '{"p": ' || CAST(id AS VARCHAR) || '.5, "b": false}'
      |    WHEN 2 THEN '{"p": "' || CAST(id AS VARCHAR) || '", "b": 1}'
      |    WHEN 3 THEN '{"p": [' || CAST(id AS VARCHAR) || '], "b": 0}'
      |    WHEN 4 THEN '{"b": "yes"}'
      |    ELSE '{"p": null, "b": "no"}'
      |  END AS j
      |FROM (SELECT event_id AS id, event_id % 6 AS m6 FROM events)""".stripMargin

  private def num(path: String, cmp: String): String =
    jGuard(path, s"json_type(j, '$path') IN ('UBIGINT', 'BIGINT', 'DOUBLE')",
      s"TRY_CAST(json_extract_string(j, '$path') AS DECIMAL(38,10)) $cmp")
  private def str(path: String, cmp: String): String =
    jGuard(path, s"json_type(j, '$path') = 'VARCHAR'",
      s"json_extract_string(j, '$path') $cmp")
  private def bool(path: String, cmp: String): String =
    jGuard(path, s"json_type(j, '$path') = 'BOOLEAN'",
      s"TRY_CAST(json_extract_string(j, '$path') AS BOOLEAN) $cmp")

  private[graft] val JsonKindCases: Seq[MCase] = Seq(
    // #51568 same-number-bucket: ints and floats compare numerically
    MCase("pure_int_in_ctl", """j["p"] in [12, 24, 36]""",
      num("$.p", "IN (12, 24, 36)")),
    MCase("int_or_expansion_ctl",
      """j["p"] == 12 or j["p"] == 24 or j["p"] == 36""",
      s"${num("$.p", "= 12")} OR ${num("$.p", "= 24")} OR ${num("$.p", "= 36")}"),
    MCase("mixed_numeric_in", """j["p"] in [12.0, 24, 36]""",
      num("$.p", "IN (12.0, 24, 36)")),
    MCase("float_frac_eq", """j["p"] == 13.5""", num("$.p", "= 13.5")),
    MCase("int_eq_on_float_row_ctl", """j["p"] == 13""", num("$.p", "= 13")),
    // #51489 typed union: string literals match only VARCHAR values
    MCase("str_eq", """j["p"] == "14"""", str("$.p", "= '14'")),
    MCase("str_no_coerce_ctl", """j["p"] == "12"""", str("$.p", "= '12'")),
    MCase("int_no_coerce_ctl", """j["p"] == 14""", num("$.p", "= 14")),
    MCase("mixed_in_int_string", """j["p"] in [12, "14"]""",
      s"${num("$.p", "= 12")} OR ${str("$.p", "= '14'")}"),
    MCase("mixed_or_int_string", """j["p"] == 12 or j["p"] == "14"""",
      s"${num("$.p", "= 12")} OR ${str("$.p", "= '14'")}"),
    MCase("in_with_missing_str", """j["p"] in [12, "missing"]""",
      s"${num("$.p", "= 12")} OR ${str("$.p", "= 'missing'")}"),
    MCase("not_in_3vl", """not (j["p"] in [12, "14"])""",
      s"NOT (${num("$.p", "= 12")} OR ${str("$.p", "= '14'")})"),
    // #51567 bool bucket: true ≠ 1, false ≠ 0, never coerced
    MCase("b_true", """j["b"] == true""", bool("$.b", "= true")),
    MCase("b_int1", """j["b"] == 1""", num("$.b", "= 1")),
    MCase("b_int0", """j["b"] == 0""", num("$.b", "= 0")),
    MCase("b_in_true_1", """j["b"] in [true, 1]""",
      s"${bool("$.b", "= true")} OR ${num("$.b", "= 1")}"),
    MCase("b_in_false_1", """j["b"] in [false, 1]""",
      s"${bool("$.b", "= false")} OR ${num("$.b", "= 1")}"),
    MCase("b_str_yes", """j["b"] in [true, "yes"]""",
      s"${bool("$.b", "= true")} OR ${str("$.b", "= 'yes'")}"),
    MCase("b_mixed_3", """j["b"] in [true, 1, "true"]""",
      s"${bool("$.b", "= true")} OR ${num("$.b", "= 1")} OR ${str("$.b", "= 'true'")}"),
    MCase("b_or_order", """(j["b"] == 1) or (j["b"] == 0) or (j["b"] == true)""",
      s"${num("$.b", "= 1")} OR ${num("$.b", "= 0")} OR ${bool("$.b", "= true")}"),
    MCase("b_bool_only_in_ctl", """j["b"] in [true, false]""",
      s"${bool("$.b", "= true")} OR ${bool("$.b", "= false")}"),
    MCase("b_int_only_in_ctl", """j["b"] in [0, 1]""",
      num("$.b", "IN (0, 1)")),
    // array-subscript paths (#51489 json_array_subscript_mixed_in)
    MCase("arr_subscript_eq", """j["p"][0] == 15""", num("$.p[0]", "= 15")),
    MCase("arr_subscript_mixed_in", """j["p"][0] in [15, "21"]""",
      s"${num("$.p[0]", "= 15")} OR ${str("$.p[0]", "= '21'")}"),
    // containment + length on the JSON array kind
    MCase("json_contains_arr", """json_contains(j["p"], 15)""",
      "json_type(j, '$.p') = 'ARRAY' AND " +
        "list_contains(TRY_CAST(j->'$.p' AS BIGINT[]), 15)"),
    MCase("json_arr_len", """array_length(j["p"]) == 1""",
      "json_type(j, '$.p') = 'ARRAY' AND json_array_length(j, '$.p') = 1"),
    MCase("exists_p", """exists j["p"]""",
      "json_extract_string(j, '$.p') IS NOT NULL"),
    // LIKE / regex over a JSON path run the STRING kernel only
    // (UnaryExpr.cpp kStringVal dispatch): the NUMBER 1x at m6=0/1 must
    // NOT match like "1%" even though it extracts as the same text the
    // string "1x" does at m6=2
    MCase("str_like_kind", """j["p"] like "1%"""",
      str("$.p", "LIKE '1%'")),
    MCase("str_like_kind_not", """not (j["p"] like "1%")""",
      s"NOT (${str("$.p", "LIKE '1%'")})"),
    MCase("str_regex_kind", """j["p"] =~ "^1.*"""",
      str("$.p", "SIMILAR TO '1.*'")))

  def jsonKindMatrix(s: SparkSession, dir: String): DataFrame =
    battery(s, jsonKindDf(s, dir), JsonKindCases, jsonCols = Set("j"),
      spread = true)

  private[graft] val jsonKindMatrixOracle: String =
    oracleFor(JsonKindCases, jsonKindSql)

  // =================================================================
  // Battery 5 — scalar index consistency sweep
  // reference expressions/test_filtering_index_consistency.py: the same
  // filter family through each scalar index type must equal the plain
  // unindexed scan. Each case runs BOTH paths in the engine and emits
  // (kind, case_id, n_indexed, n_scan, n_diff); the oracle pins
  // n_indexed = n_scan = the DuckDB truth and n_diff = 0, so a
  // divergence in either count OR membership breaks the row hash.
  // =================================================================

  private def consistencyRow(s: SparkSession, kind: String, caseId: String,
      idxIds: DataFrame, scanIds: DataFrame): DataFrame = {
    val a = idxIds.select(col("id").as("ia"))
    val b = scanIds.select(col("id").as("ib"))
    a.join(b, a("ia") === b("ib"), "full_outer").agg(
      count(col("ia")).as("n_indexed"),
      count(col("ib")).as("n_scan"),
      sum(when(col("ia").isNull || col("ib").isNull, 1L).otherwise(0L))
        .as("n_diff"))
      .select(lit(kind).as("kind"), lit(caseId).as("case_id"),
        col("n_indexed"), col("n_scan"), coalesce(col("n_diff"), lit(0L)).as("n_diff"))
  }

  // The index-consistency battery is SPLIT in two (scalar-dictionary
  // kinds here, MIXED/special types in [[indexConsistencyMixed]]): each
  // row pays a dictionary build, and one query carrying 17 builds was
  // the driver bench's tail — two self-contained halves keep every row
  // while halving the per-query fixture cost.
  def indexConsistency(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{InvertedIndex, NgramIndex}
    val cust = t(s, dir, "customer")
    val docs = t(s, dir, "documents")
    val part = t(s, dir, "part")
    val ev = t(s, dir, "events")
    def scan(base: DataFrame, idCol: String, filter: String,
        json: Set[String] = Set.empty): DataFrame =
      base.filter(ExprCompiler.compile(filter, base, jsonColumns = json))
        .select(col(idCol).as("id"))

    // dictionaries are tiny (cardinality-many rows) — reuse per table.
    // NOTE (r18, measured 7-round medians): pre-materializing the
    // multi-leg dictionaries does NOT pay here — lazy persist serialized
    // the adaptive union (r17 experiment, 2.35->12.3 s), eager
    // sequential localCheckpoint regressed _mixed 2.24->2.47 s, and
    // eager CONCURRENT checkpoints were a wash (1.89 vs 1.83 s) — the
    // duplicate builds pipeline on idle cores inside the one adaptive
    // action, so the wall is driver/AQE latency, not the rebuilds.
    // The builds stay embedded in their legs.
    val natIdx = InvertedIndex.buildValueIndex(cust, "c_custkey", "c_nationkey")
    val langIdx = InvertedIndex.buildValueIndex(docs, "doc_id", "lang")
    val brandIdx = InvertedIndex.buildValueIndex(part, "p_partkey", "p_brand")
    val ncharsIdx = InvertedIndex.buildHybridIndex(docs, "doc_id", "n_chars")._2
    val jsonIdx = InvertedIndex.buildJsonPathIndexTyped(
      ev, "event_id", "props", "$.k",
      org.apache.spark.sql.types.LongType, "STL_SORT")._2
    val ngramIdx = NgramIndex.build(docs, "doc_id", "text", n = 3)
    // one pk dictionary definition shared by both bitset-boundary legs
    val custKeyIdx = InvertedIndex.buildValueIndex(cust, "c_custkey", "c_custkey")

    val rows = Seq(
      consistencyRow(s, "INVERTED", "nationkey_in",
        InvertedIndex.lookupValues(natIdx, "c_nationkey", Seq(5, 7)),
        scan(cust, "c_custkey", "c_nationkey in [5, 7]")),
      // arithmetic through the dictionary (reference
      // int64_inverted_arithmetic): the index evaluates the SAME
      // compiled expression over distinct values
      consistencyRow(s, "INVERTED", "nationkey_arith",
        InvertedIndex.lookupExpr(natIdx, "c_nationkey", "c_nationkey",
          "(c_nationkey + 5) >= 10 and (c_nationkey + 5) <= 15"),
        scan(cust, "c_custkey",
          "(c_nationkey + 5) >= 10 and (c_nationkey + 5) <= 15")),
      consistencyRow(s, "BITMAP", "lang_in",
        InvertedIndex.lookupValues(langIdx, "lang", Seq("en", "de")),
        scan(docs, "doc_id", """lang in ["en", "de"]""")),
      // NOT over the dictionary: complete value enumeration makes
      // negation index-serviceable
      consistencyRow(s, "BITMAP", "lang_not_in",
        InvertedIndex.lookupExpr(langIdx, "lang", "lang",
          """lang not in ["en", "zh"]"""),
        scan(docs, "doc_id", """lang not in ["en", "zh"]""")),
      consistencyRow(s, "TRIE", "brand_prefix",
        InvertedIndex.lookupPrefix(brandIdx, "p_brand", "Brand#1"),
        scan(part, "p_partkey", """p_brand like "Brand#1%"""")),
      consistencyRow(s, "STL_SORT", "nationkey_range",
        InvertedIndex.lookupRange(natIdx, "c_nationkey", 5, 10),
        scan(cust, "c_custkey", "c_nationkey >= 5 and c_nationkey <= 10")),
      // bitset word / row-id boundaries (reference coverage matrix
      // FILTER-BOUNDARY-63-65 / FILTER-BOUNDARY-1023-1025,
      // test_filtering_index_consistency.py): IN straddling 64 and 1024
      // through the index equals the scan — the off-by-one class a
      // word-addressed bitset implementation regresses on
      consistencyRow(s, "INVERTED", "in_boundary_63_65",
        InvertedIndex.lookupValues(custKeyIdx,
          "c_custkey", Seq(62L, 63L, 64L, 65L, 66L)),
        scan(cust, "c_custkey", "c_custkey in [62, 63, 64, 65, 66]")),
      consistencyRow(s, "INVERTED", "in_boundary_1023_1025",
        InvertedIndex.lookupValues(custKeyIdx,
          "c_custkey", Seq(1022L, 1023L, 1024L, 1025L, 1026L)),
        scan(cust, "c_custkey",
          "c_custkey in [1022, 1023, 1024, 1025, 1026]")),
      consistencyRow(s, "NGRAM", "multi_like",
        NgramIndex.likeSearch(docs, "doc_id", "text", ngramIdx,
          patterns = Seq("ecto", "tream"), n = 3)
          .select(col("doc_id").as("id")),
        scan(docs, "doc_id", """text like "%ecto%" and text like "%tream%"""")),
      consistencyRow(s, "JSON_TYPED", "props_k_range",
        InvertedIndex.lookupRange(jsonIdx, "value", 40L, 50L),
        scan(ev, "event_id", """props["k"] >= 40 and props["k"] <= 50""",
          json = Set("props"))),
      consistencyRow(s, "HYBRID", "nchars_range",
        InvertedIndex.lookupRange(ncharsIdx, "n_chars", 100, 200),
        scan(docs, "doc_id", "n_chars >= 100 and n_chars <= 200"))) ++
      // Unicode through the index paths (reference test_mix_scenes.py:
      // 2417 test_index_unicode_string_query, :2443 array variant — CJK
      // equality / LIKE through BITMAP and INVERTED dictionaries, and
      // array contains over CJK elements, must equal the plain scan)
      locally {
        val u1 = typedlit(Seq("国", "中", "江", "鄷", "核", "薞", "麚", "臥"))
        val u2 = typedlit(Seq("红", "华", "环", "父"))
        val c1 = element_at(u1, (col("doc_id") % 8 + 1).cast("int"))
        val c2 = element_at(u2, (col("doc_id") % 4 + 1).cast("int"))
        val uniDocs = docs.select(col("doc_id"), concat(c1, c2).as("utag"))
        val uniIdx = InvertedIndex.buildValueIndex(uniDocs, "doc_id", "utag")
        Seq(
          consistencyRow(s, "BITMAP", "unicode_eq",
            InvertedIndex.lookupValues(uniIdx, "utag", Seq("国红")),
            scan(uniDocs, "doc_id", """utag == "国红"""")),
          consistencyRow(s, "INVERTED", "unicode_like_prefix",
            InvertedIndex.lookupPrefix(uniIdx, "utag", "国"),
            scan(uniDocs, "doc_id", """utag like "国%"""")),
          consistencyRow(s, "INVERTED", "unicode_like_postfix",
            InvertedIndex.lookupExpr(uniIdx, "utag", "utag",
              """utag like "%华""""),
            scan(uniDocs, "doc_id", """utag like "%华"""")))
      }
    rows.reduce(_ unionAll _).orderBy(col("kind"), col("case_id"))
  }

  /** The MIXED/special-types half of the index-consistency battery
    * (reference test_milvus_client_data_integrity_new.py — conjunctions
    * over fully-indexed collections answer each leg from its own scalar
    * index and AND the bitsets; test_filtering_special_types for
    * RTREE/TIMESTAMPTZ; test_array_index_consistency). Spark shape of
    * the intersection: each leg is a dictionary lookup, the AND is one
    * ids-only left-semi join — posting lists shuffle, never rows.
    */
  def indexConsistencyMixed(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.InvertedIndex
    val cust = t(s, dir, "customer")
    val docs = t(s, dir, "documents")
    val part = t(s, dir, "part")
    val ev = t(s, dir, "events")
    def scan(base: DataFrame, idCol: String, filter: String,
        json: Set[String] = Set.empty): DataFrame =
      base.filter(ExprCompiler.compile(filter, base, jsonColumns = json))
        .select(col(idCol).as("id"))
    def and(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b.select(col("id")), Seq("id"), "left_semi")

    val jsonIdx = InvertedIndex.buildJsonPathIndexTyped(
      ev, "event_id", "props", "$.k",
      org.apache.spark.sql.types.LongType, "STL_SORT")._2
    // NOTE (r18, measured): pre-materializing this fixture's multi-leg
    // dictionaries (eager localCheckpoint, even with overlapped builds)
    // REGRESSED it 2.24->2.47 s — the duplicate builds here are over
    // small tables and pipeline fully inside the one adaptive union,
    // while the checkpoints add driver-blocking jobs. Left embedded.
    val langIdx = InvertedIndex.buildValueIndex(docs, "doc_id", "lang")
    val ncharsIdx = InvertedIndex.buildHybridIndex(docs, "doc_id", "n_chars")._2

    val rows = Seq(
      // RTREE (reference test_filtering_special_types geometry index
      // cases; gis_filter_coarse_refine_split_fusion.md): the
      // bbox-materialized coarse→refine path must equal the
      // refine-only scan over raw WKT
      locally {
        val evPts = ev.withColumn("geom", concat(lit("POINT("),
          col("value").cast("string"), lit(" "),
          (col("user_id") % 100).cast("string"), lit(")")))
        val evGeo = graft.functions.GeoFunctions.prepareGeometry(evPts, "geom")
        val pred =
          "st_within(geom, 'POLYGON((10 10, 90 10, 90 60, 10 60, 10 10))')"
        consistencyRow(s, "RTREE", "point_within",
          scan(evGeo, "event_id", pred), scan(evPts, "event_id", pred))
      },
      // TIMESTAMPTZ (reference test_filtering_special_types
      // timestamptz index consistency): the interval compare through a
      // sorted ts dictionary equals the plain scan — the TsDomainRewrite
      // fold applies identically on both sides
      locally {
        val tsIdx = InvertedIndex.buildValueIndex(ev, "event_id", "ts")
        val pred = "ts + INTERVAL 'P3D' > iso'2024-01-25T00:00:00Z'"
        consistencyRow(s, "TIMESTAMPTZ", "interval_cmp",
          InvertedIndex.lookupExpr(tsIdx, "ts", "ts", pred),
          scan(ev, "event_id", pred))
      }) ++
      // Struct-array SUBFIELD indexes (reference coverage matrix
      // FILTER-STRUCTARRAY-SUBFIELD-INDEX,
      // filtering_case_matrix.py:139-176): MATCH_ANY range over an
      // element dictionary built on one subfield, and a fixed-position
      // subfield IN through a value index, must equal the plain scan
      locally {
        val evs = ev.select(col("event_id"), array(
          struct((col("user_id") % 20).cast("long").as("rank")),
          struct(((col("user_id") + 7) % 20).cast("long").as("rank")))
          .as("evs"))
        val rankElemIdx = InvertedIndex.buildElementIndex(
          evs.withColumn("_ranks", transform(col("evs"), e => e.getField("rank"))),
          "event_id", "_ranks")
        val rank0Idx = InvertedIndex.buildValueIndex(
          evs.withColumn("_r0", col("evs")(0).getField("rank")),
          "event_id", "_r0")
        Seq(
          consistencyRow(s, "STRUCT_ARRAY", "subfield_rank_match_any",
            InvertedIndex.lookupRange(rankElemIdx, "element", 10L, Long.MaxValue)
              .distinct(),
            scan(evs, "event_id", "match_any(evs, $[rank] >= 10)")),
          consistencyRow(s, "STRUCT_ARRAY", "subfield_in_fixed",
            InvertedIndex.lookupValues(rank0Idx, "_r0", Seq(10L, 11L, 13L)),
            scan(evs, "event_id", "evs[0][rank] in [10, 11, 13]")))
      } ++
      // MIXED predicates through INDEX INTERSECTION (reference
      // test_milvus_client_data_integrity_new.py — the all-expr DQL
      // battery runs conjunctions like `int64 >= 0 && varchar >= "0"`
      // over fully-indexed collections; the engine serves each leg from
      // its own scalar index and ANDs the bitsets).
      locally {
        val natIdx2 = InvertedIndex.buildValueIndex(cust, "c_custkey", "c_nationkey")
        val segIdx = InvertedIndex.buildValueIndex(cust, "c_custkey", "c_mktsegment")
        val typeIdx = InvertedIndex.buildValueIndex(ev, "event_id", "event_type")
        val sizeIdx = InvertedIndex.buildValueIndex(part, "p_partkey", "p_size")
        val brandIdx2 = InvertedIndex.buildValueIndex(part, "p_partkey", "p_brand")
        // the text-match leg's index is the token element dictionary
        // (the TextMatchIndex shape: token → posting list)
        val tokIdx = InvertedIndex.buildElementIndex(
          docs.withColumn("_toks",
            graft.functions.TextFunctions.tokenize(col("text"))),
          "doc_id", "_toks")
        // json_contains leg: the element dictionary over the json
        // array path's parsed values
        val jdocs = docs.withColumn("meta", to_json(struct(
          array(col("lang"), col("source")).as("tags"))))
        val tagsElemIdx = InvertedIndex.buildElementIndex(
          jdocs.withColumn("_tags", array(col("lang"), col("source"))),
          "doc_id", "_tags")
        Seq(
          // the battery's own default expr shape: int64 range && varchar compare
          consistencyRow(s, "MIXED", "int64_and_varchar",
            and(InvertedIndex.lookupRange(natIdx2, "c_nationkey", 5, 15),
              InvertedIndex.lookupExpr(segIdx, "c_mktsegment", "c_mktsegment",
                """c_mktsegment >= "F"""")),
            scan(cust, "c_custkey",
              """c_nationkey >= 5 and c_nationkey <= 15 and c_mktsegment >= "F"""")),
          // json path range && varchar LIKE prefix
          consistencyRow(s, "MIXED", "jsonpath_and_like",
            and(InvertedIndex.lookupRange(jsonIdx, "value", 40L, 70L),
              InvertedIndex.lookupPrefix(typeIdx, "event_type", "c")),
            scan(ev, "event_id",
              """props["k"] >= 40 and props["k"] <= 70 and event_type like "c%"""",
              json = Set("props"))),
          // arithmetic leg && LIKE-prefix leg, both through dictionaries
          consistencyRow(s, "MIXED", "arith_and_prefix",
            and(InvertedIndex.lookupExpr(sizeIdx, "p_size", "p_size",
                "(p_size + 1) >= 10"),
              InvertedIndex.lookupPrefix(brandIdx2, "p_brand", "Brand#2")),
            scan(part, "p_partkey",
              """(p_size + 1) >= 10 and p_brand like "Brand#2%"""")),
          // IN leg && range leg on a second table
          consistencyRow(s, "MIXED", "in_and_range",
            and(InvertedIndex.lookupValues(langIdx, "lang", Seq("en", "de")),
              InvertedIndex.lookupRange(ncharsIdx, "n_chars", 100, 300)),
            scan(docs, "doc_id",
              """lang in ["en", "de"] and n_chars >= 100 and n_chars <= 300""")),
          // text_match leg through the token dictionary && scalar leg —
          // the TEXT-match-index ∩ scalar-index case the integrity
          // battery sweeps indexed-vs-unindexed
          consistencyRow(s, "MIXED", "text_match_and_scalar",
            and(InvertedIndex.lookupElementsAny(tokIdx, Seq("vector", "stream"))
                .distinct(),
              InvertedIndex.lookupValues(langIdx, "lang", Seq("en"))),
            scan(docs, "doc_id",
              """text_match(text, "vector stream") and lang == "en"""")),
          // json_contains_any leg through the element dictionary && a
          // range leg through the hybrid dictionary
          consistencyRow(s, "MIXED", "json_contains_and_range",
            and(InvertedIndex.lookupElementsAny(tagsElemIdx, Seq("en", "de"))
                .distinct(),
              InvertedIndex.lookupRange(ncharsIdx, "n_chars", 100, 300)),
            scan(jdocs, "doc_id",
              """json_contains_any(meta["tags"], ["en", "de"]) and """ +
                "n_chars >= 100 and n_chars <= 300",
              json = Set("meta"))))
      } ++
      // ARRAY element index (reference test_array_index_consistency,
      // test_milvus_client_scalar_filtering.py:1479): contains /
      // contains_any / contains_all through the element dictionary
      // must equal the plain array scan — plus the CJK-element variant
      // (test_mix_scenes.py:2443)
      locally {
        val evArr = ev.select(col("event_id"),
          array(col("user_id") % 10, (col("user_id") + 3) % 10,
            col("user_id") % 7).as("tags"))
        val elemIdx = InvertedIndex.buildElementIndex(evArr, "event_id", "tags")
        val u1 = typedlit(Seq("国", "中", "江", "鄷", "核", "薞", "麚", "臥"))
        val u2 = typedlit(Seq("红", "华", "环", "父"))
        val c1 = element_at(u1, (col("doc_id") % 8 + 1).cast("int"))
        val c2 = element_at(u2, (col("doc_id") % 4 + 1).cast("int"))
        val uniDocs = docs.select(col("doc_id"), array(c1, c2).as("utags"))
        val uniElemIdx = InvertedIndex.buildElementIndex(uniDocs, "doc_id", "utags")
        Seq(
          consistencyRow(s, "ARRAY", "contains",
            InvertedIndex.lookupElementsAny(elemIdx, Seq(4L)),
            scan(evArr, "event_id", "array_contains(tags, 4)")),
          consistencyRow(s, "ARRAY", "contains_any",
            InvertedIndex.lookupElementsAny(elemIdx, Seq(4L, 8L)),
            scan(evArr, "event_id", "array_contains_any(tags, [4, 8])")),
          consistencyRow(s, "ARRAY", "contains_all",
            InvertedIndex.lookupElementsAll(elemIdx, Seq(4L, 8L)),
            scan(evArr, "event_id", "array_contains_all(tags, [4, 8])")),
          consistencyRow(s, "ARRAY", "unicode_contains_any",
            InvertedIndex.lookupElementsAny(uniElemIdx, Seq("中", "华")),
            scan(uniDocs, "doc_id",
              """array_contains_any(utags, ["中", "华"])""")))
      }
    rows.reduce(_ unionAll _).orderBy(col("kind"), col("case_id"))
  }

  private def consistencyOracle(cases: Seq[(String, String, String, String)]): String =
    cases.map { case (kind, cid, table, pred) =>
      s"SELECT '$kind' AS kind, '$cid' AS case_id, count(*) AS n_indexed, " +
        s"count(*) AS n_scan, CAST(0 AS BIGINT) AS n_diff FROM $table WHERE $pred"
    }.mkString("SELECT * FROM (\n", "\nUNION ALL ", "\n) ORDER BY kind, case_id")

  private val uc1 = "(['国','中','江','鄷','核','薞','麚','臥'])[CAST(doc_id % 8 AS INT) + 1]"
  private val uc2 = "(['红','华','环','父'])[CAST(doc_id % 4 AS INT) + 1]"

  private val indexConsistencyOracle: String = consistencyOracle(Seq(
    ("BITMAP", "unicode_eq", "documents", s"$uc1 || $uc2 = '国红'"),
    ("INVERTED", "unicode_like_prefix", "documents",
      s"$uc1 || $uc2 LIKE '国%'"),
    ("INVERTED", "unicode_like_postfix", "documents",
      s"$uc1 || $uc2 LIKE '%华'"),
    ("INVERTED", "nationkey_in", "customer", "c_nationkey IN (5, 7)"),
    ("INVERTED", "nationkey_arith", "customer",
      "(c_nationkey + 5) >= 10 AND (c_nationkey + 5) <= 15"),
    ("BITMAP", "lang_in", "documents", "lang IN ('en', 'de')"),
    ("BITMAP", "lang_not_in", "documents", "lang NOT IN ('en', 'zh')"),
    ("TRIE", "brand_prefix", "part", "p_brand LIKE 'Brand#1%'"),
    ("STL_SORT", "nationkey_range", "customer",
      "c_nationkey >= 5 AND c_nationkey <= 10"),
    ("INVERTED", "in_boundary_63_65", "customer",
      "c_custkey IN (62, 63, 64, 65, 66)"),
    ("INVERTED", "in_boundary_1023_1025", "customer",
      "c_custkey IN (1022, 1023, 1024, 1025, 1026)"),
    ("NGRAM", "multi_like", "documents",
      "text LIKE '%ecto%' AND text LIKE '%tream%'"),
    ("JSON_TYPED", "props_k_range", "events",
      "TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) >= 40 AND " +
        "TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) <= 50"),
    ("HYBRID", "nchars_range", "documents",
      "n_chars >= 100 AND n_chars <= 200")))

  private val indexConsistencyMixedOracle: String = consistencyOracle(Seq(
    ("ARRAY", "unicode_contains_any", "documents",
      s"list_has_any([$uc1, $uc2], ['中', '华'])"),
    ("STRUCT_ARRAY", "subfield_rank_match_any", "events",
      "(user_id % 20) >= 10 OR ((user_id + 7) % 20) >= 10"),
    ("STRUCT_ARRAY", "subfield_in_fixed", "events",
      "(user_id % 20) IN (10, 11, 13)"),
    ("RTREE", "point_within", "events",
      "value > 10 AND value < 90 AND (user_id % 100) > 10 AND (user_id % 100) < 60"),
    ("TIMESTAMPTZ", "interval_cmp", "events",
      "ts + INTERVAL 3 DAY > TIMESTAMP '2024-01-25 00:00:00'"),
    ("MIXED", "int64_and_varchar", "customer",
      "c_nationkey >= 5 AND c_nationkey <= 15 AND c_mktsegment >= 'F'"),
    ("MIXED", "jsonpath_and_like", "events",
      "TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) >= 40 AND " +
        "TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) <= 70 AND " +
        "event_type LIKE 'c%'"),
    ("MIXED", "arith_and_prefix", "part",
      "(p_size + 1) >= 10 AND p_brand LIKE 'Brand#2%'"),
    ("MIXED", "in_and_range", "documents",
      "lang IN ('en', 'de') AND n_chars >= 100 AND n_chars <= 300"),
    ("MIXED", "text_match_and_scalar", "documents",
      "list_has_any(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''), " +
        "['vector', 'stream']) AND lang = 'en'"),
    ("MIXED", "json_contains_and_range", "documents",
      "(lang IN ('en', 'de') OR source IN ('en', 'de')) AND " +
        "n_chars >= 100 AND n_chars <= 300"),
    ("ARRAY", "contains", "events",
      "list_contains([user_id % 10, (user_id + 3) % 10, user_id % 7], 4)"),
    ("ARRAY", "contains_any", "events",
      "list_has_any([user_id % 10, (user_id + 3) % 10, user_id % 7], [4, 8])"),
    ("ARRAY", "contains_all", "events",
      "list_has_all([user_id % 10, (user_id + 3) % 10, user_id % 7], [4, 8])")))

  // =================================================================

  // =================================================================
  // Battery 5 — LIKE wildcard/escape conformance
  // reference pattern_match.go:9-61 scanLikePattern + RegexQuery.cpp
  // translate_pattern_match_to_regex; regression families
  // test_milvus_client_scalar_filtering.py:1133,1183 (#43864):
  // '_' one-char wildcard with literal decoys, '\%'/'\_' escaped
  // literals with wildcard decoys, '\\' collapse, raw strings. DuckDB
  // shares the SQL LIKE model natively (ESCAPE '\' where escapes
  // appear), so the two sides evaluate the pattern independently.
  // =================================================================

  /** Decoy-rich fixture: for every case there is a row only the
    * wildcard reading admits AND a row only the literal reading admits.
    */
  private[graft] def likeDf(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val m = col("event_id") % 17
    ev.select(col("event_id").as("id"), m.as("m"),
      when(m === 0, "user_1").when(m === 1, "userX1")
        .when(m === 2, "user%1").when(m === 3, "user\\1")
        .when(m === 4, "user1").when(m === 5, "a%b")
        .when(m === 6, "a_b").when(m === 7, "ab").when(m === 8, "axb")
        .when(m === 9, "prefix_mid_suffix")
        .when(m === 10, "prefixXmidXsuffix")
        // unicode values (gen_varchar_unicode_expression,
        // test_mix_scenes.py TestIndexUnicodeString)
        .when(m === 11, "国abc").when(m === 12, "abc中")
        // a value whose MIDDLE is a newline: wildcards must span it
        .when(m === 13, "multi\nline")
        // issue 32294's JSON-looking VARCHAR (LIKE over '{', '?', '"')
        .when(m === 14, """{"Header 1": "Foo1?", "type": "passage"}""")
        // issue 32294's FIRST value verbatim — the multi-line JSON text
        // (string_values[0], testcases/test_issues.py:102): inner LIKE
        // must match across the embedded newlines
        .when(m === 15,
          "{\n\"Header 1\": \"Foo1?\", \n\"document_category\": \"acme\", " +
            "\n\"type\": \"passage\"\n}")
        .otherwise(lit(null).cast("string")).as("s"))
  }

  private val likeSql: String =
    """SELECT event_id AS id, event_id % 17 AS m,
      |  CASE event_id % 17
      |    WHEN 0 THEN 'user_1' WHEN 1 THEN 'userX1'
      |    WHEN 2 THEN 'user%1' WHEN 3 THEN 'user\1'
      |    WHEN 4 THEN 'user1' WHEN 5 THEN 'a%b'
      |    WHEN 6 THEN 'a_b' WHEN 7 THEN 'ab' WHEN 8 THEN 'axb'
      |    WHEN 9 THEN 'prefix_mid_suffix'
      |    WHEN 10 THEN 'prefixXmidXsuffix'
      |    WHEN 11 THEN '国abc' WHEN 12 THEN 'abc中'
      |    WHEN 13 THEN 'multi' || chr(10) || 'line'
      |    WHEN 14 THEN '{"Header 1": "Foo1?", "type": "passage"}'
      |    WHEN 15 THEN '{' || chr(10) || '"Header 1": "Foo1?", ' || chr(10) ||
      |      '"document_category": "acme", ' || chr(10) ||
      |      '"type": "passage"' || chr(10) || '}'
      |    ELSE NULL
      |  END AS s
      |FROM events""".stripMargin

  private[graft] val LikeCases: Seq[MCase] = Seq(
    // unescaped '_' matches exactly one char (userX1/user%1/user\1 in,
    // user1 out)
    MCase("wild_underscore_eq", """s like "user_1"""", "s LIKE 'user_1'"),
    MCase("wild_underscore_one", """s like "a_b"""", "s LIKE 'a_b'"),
    // escaped '_' / '%' are the literal chars; the string-literal layer
    // halves '\\' first (convertEscapeSingle), LIKE's layer unescapes
    MCase("esc_underscore_eq", """s like "user\\_1"""",
      raw"s LIKE 'user\_1' ESCAPE '\'"),
    MCase("esc_percent_eq", """s like "a\\%b"""",
      raw"s LIKE 'a\%b' ESCAPE '\'"),
    // raw strings skip the string-literal escape layer (VisitRawString)
    MCase("raw_esc_percent", """s like r"a\%b"""",
      raw"s LIKE 'a\%b' ESCAPE '\'"),
    // inner wildcard vs escaped-literal inner
    MCase("wild_underscore_inner", """s like "%mid_s%"""",
      "s LIKE '%mid_s%'"),
    MCase("esc_underscore_inner", """s like "%mid\\_s%"""",
      raw"s LIKE '%mid\_s%' ESCAPE '\'"),
    // '\\' collapses to one literal backslash (escape-next, any byte)
    MCase("esc_backslash_eq", """s like "user\\\\1"""",
      raw"s LIKE 'user\\1' ESCAPE '\'"),
    // plain wildcard families over the decoys
    MCase("pct_any", """s like "a%b"""", "s LIKE 'a%b'"),
    MCase("wild_prefix", """s like "user_%"""", "s LIKE 'user_%'"),
    MCase("all_pct", """s like "%%"""", "s LIKE '%%'"),
    MCase("postfix_esc_pct", """s like "%\\%1"""",
      raw"s LIKE '%\%1' ESCAPE '\'"),
    MCase("prefix_esc_pct", """s like "user\\%%"""",
      raw"s LIKE 'user\%%' ESCAPE '\'"),
    // NULL rows match neither a LIKE nor its negation (3VL)
    MCase("not_like_pct", """not (s like "a%b")""", "NOT (s LIKE 'a%b')"),
    // unicode wildcards (reference gen_varchar_unicode_expression:
    // CJK prefix/postfix/inner behave exactly like ASCII)
    MCase("unicode_prefix", """s like "国%"""", "s LIKE '国%'"),
    MCase("unicode_postfix", """s like "%中"""", "s LIKE '%中'"),
    MCase("unicode_inner", """s like "%国%"""", "s LIKE '%国%'"),
    // '%' and '_' both span/match a NEWLINE inside the value — a
    // regex-backed LIKE without dot-nl would silently drop m=13
    MCase("newline_pct_span", """s like "multi%ne"""", "s LIKE 'multi%ne'"),
    MCase("newline_underscore", """s like "multi_line"""",
      "s LIKE 'multi_line'"),
    MCase("newline_generic_mix", """s like "m_lti%l_ne"""",
      "s LIKE 'm_lti%l_ne'"),
    // issue #32294's shape: inner LIKE over a JSON-looking VARCHAR —
    // '{', '"', '?' are plain literals to the LIKE layer. Matches BOTH
    // the single-line (m=14) and the newline-bearing (m=15) JSON values;
    // a regex-backed LIKE without dot-matches-newline drops m=15.
    MCase("json_varchar_inner", """s like "%passage%"""",
      "s LIKE '%passage%'"),
    MCase("qmark_literal", """s like "%Foo1?%"""", "s LIKE '%Foo1?%'"),
    MCase("brace_prefix", """s like "{\"Header%"""",
      """s LIKE '{"Header%'"""),
    // anchored through an ESCAPED newline in the pattern itself: the
    // string-literal layer decodes \n, the brace+newline prefix reaches
    // only the multi-line JSON value
    MCase("newline_json_prefix", "s like \"{\\n\\\"Header%\"",
      """s LIKE ('{' || chr(10) || '"Header%')"""),
    // inner match that must cross TWO embedded newlines (category →
    // passage spans the \n-separated JSON lines)
    MCase("newline_json_span", """s like "%category%passage%"""",
      "s LIKE '%category%passage%'"))

  def likeMatrix(s: SparkSession, dir: String): DataFrame =
    battery(s, likeDf(s, dir), LikeCases)

  private[graft] val likeMatrixOracle: String = oracleFor(LikeCases, likeSql)

  // =================================================================
  // Battery 5b — string-literal escape layer (convertEscapeSingle →
  // strconv.Unquote, planparserv2/utils.go:622-661 + Go strconv
  // unquoteChar). The engine side goes through the full lexer → cook →
  // compile pipeline; the DuckDB side pins every expected string with
  // chr()/'' doubling, so the escape decode is evaluated independently
  // on both sides. Decoys both directions: the fixture holds BOTH
  // "AB" (the byte-exact reading of "\x41B") and U+041B (the old
  // greedy-hex reading), both "café" byte-composed and plain "é".
  // =================================================================

  /** m = id % 12 selects one of 12 strings, several reachable only
    * through a specific escape reading.
    */
  private[graft] def escapeDf(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val m = col("event_id") % 12
    ev.select(col("event_id").as("id"), m.as("m"),
      when(m === 0, "AB")
        .when(m === 1, "Л")          // greedy-hex decoy for \x41B
        .when(m === 2, "A\tB")
        .when(m === 3, "it's")
        .when(m === 4, "say \"hi\"")
        .when(m === 5, "back\\slash")
        .when(m === 6, "é")
        .when(m === 7, "café")
        .when(m === 8, "bell")
        .when(m === 9, new String(Character.toChars(0x1F600)))
        .when(m === 10, "A")
        .when(m === 11, "CR\rX") // bare carriage return: legal in-literal
        .otherwise(lit(null).cast("string")).as("s"))
  }

  private val escapeSql: String =
    """SELECT event_id AS id, event_id % 12 AS m,
      |  CASE event_id % 12
      |    WHEN 0 THEN 'AB' WHEN 1 THEN chr(1051)
      |    WHEN 2 THEN 'A' || chr(9) || 'B' WHEN 3 THEN 'it''s'
      |    WHEN 4 THEN 'say "hi"' WHEN 5 THEN 'back' || chr(92) || 'slash'
      |    WHEN 6 THEN chr(233) WHEN 7 THEN 'caf' || chr(233)
      |    WHEN 8 THEN chr(7) || 'bell' WHEN 9 THEN chr(128512)
      |    WHEN 10 THEN 'A'
      |    WHEN 11 THEN 'CR' || chr(13) || 'X'
      |    ELSE NULL
      |  END AS s
      |FROM events""".stripMargin

  private[graft] val EscapeCases: Seq[MCase] = Seq(
    // \x consumes EXACTLY 2 hex digits; 'B' stays literal → "AB",
    // NOT U+041B (the fixture holds both readings)
    MCase("x_two_digits", """s == "\x41B"""", "s = 'AB'"),
    MCase("x_pair", """s == "\x41\x42"""", "s = 'AB'"),
    // \u is exactly 4 hex digits → the greedy decoy row (the engine
    // text is built by splicing so scalac's own \u pre-processing
    // can't eat the escape before the lexer sees it)
    MCase("u_four_digits", "s == \"" + "\\" + "u041b\"", "s = chr(1051)"),
    MCase("u_then_literal", """s == "AB"""", "s = 'AB'"),
    MCase("cap_u_eight", """s == "\U0001F600"""", "s = chr(128512)"),
    // byte semantics: two \x / octal escapes compose one UTF-8 point
    MCase("x_utf8_compose", """s == "\xC3\xA9"""", "s = chr(233)"),
    MCase("octal_utf8_compose", """s == "caf\303\251"""",
      "s = 'caf' || chr(233)"),
    // octal is exactly 3 digits
    MCase("octal_three", """s == "\101"""", "s = 'A'"),
    // named single-char escapes
    MCase("tab", """s == "A\tB"""", "s = 'A' || chr(9) || 'B'"),
    MCase("bell", """s == "\abell"""", "s = chr(7) || 'bell'"),
    // quote handling (convertEscapeSingle's two rewrite rules)
    MCase("squote_escaped", """s == "it\'s"""", "s = 'it''s'"),
    MCase("squote_bare_in_dq", """s == "it's"""", "s = 'it''s'"),
    MCase("dquote_in_sq", """s == 'say "hi"'""", "s = 'say \"hi\"'"),
    MCase("backslash_pair", """s == "back\\slash"""",
      "s = 'back' || chr(92) || 'slash'"),
    // raw strings skip the escape layer entirely (VisitRawString)
    MCase("raw_verbatim", """s == r"back\slash"""",
      "s = 'back' || chr(92) || 'slash'"),
    // escape decode feeds LIKE before its own wildcard layer runs
    MCase("x_in_like_prefix", """s like "\x41%"""", "s LIKE 'A%'"),
    // strconv.Unquote rejects only a raw '\n'; a bare carriage return
    // inside a quoted literal passes through as its byte (the Scala
    // "\r" below compiles to an actual CR in the expression text)
    MCase("raw_cr_in_literal", "s == \"CR\rX\"",
      "s = 'CR' || chr(13) || 'X'"))

  def escapeMatrix(s: SparkSession, dir: String): DataFrame =
    battery(s, escapeDf(s, dir), EscapeCases)

  private[graft] val escapeMatrixOracle: String =
    oracleFor(EscapeCases, escapeSql)

  // =================================================================
  // Battery 6 — order/fanout/equivalence regression families
  // reference test_filter_regressions.py: boolean-fanout generalized
  // counts (:961-996), expression order permutations + algebraic
  // equivalences (:996-1020, filtering_case_matrix.py:9-53), one-doc
  // negative + empty-collection controls for the JSON mixed-type
  // families (:907-940, #51568). The fixture is the reference's
  // build_order_rows 14-row table VERBATIM (:456-570) plus a one-doc
  // control row, so the reference's pinned expected_ids apply directly
  // (RegressionMatrixSpec asserts them as exact id sets). Each case
  // emits cnt AND id_sum — membership divergence breaks the row even
  // when counts collide.
  // =================================================================

  /** (id, age, score, active, tag, tbl, meta) — rows 1-14 are the
    * reference's order/fanout fixture; row 15 is the #51568 one-doc
    * control ({"p": 1}), scoped via tbl.
    */
  private[graft] val RegressionRows: Seq[(Long, Long, Double, Boolean,
      String, String, String)] = Seq(
    (1L, 8L, 85.0, true, "qa", "multi", """{"group": "qa", "rank": 1, "p": 1}"""),
    (2L, 12L, 91.0, true, "qa", "multi", """{"group": "qa", "rank": 1, "p": 2}"""),
    (3L, 13L, 89.0, false, "dev", "multi", """{"group": "dev", "rank": 3, "p": 3}"""),
    (4L, 14L, 80.0, true, "qa", "multi", """{"group": "qa", "rank": 2, "p": 4}"""),
    (5L, 15L, 91.0, false, "ops", "multi", """{"group": "ops", "rank": 5, "p": 5}"""),
    (6L, 16L, 70.0, false, "ops", "multi", """{"group": "ops", "rank": 6, "p": 6}"""),
    (7L, 17L, 75.0, false, "dev", "multi", """{"group": "dev", "rank": 7, "p": 7}"""),
    (8L, 18L, 76.0, false, "dev", "multi", """{"group": "dev", "rank": 8, "p": 8}"""),
    (9L, 19L, 77.0, false, "dev", "multi", """{"group": "dev", "rank": 9, "p": 9}"""),
    (10L, 20L, 78.0, false, "dev", "multi", """{"group": "dev", "rank": 10, "p": 10}"""),
    (11L, 12L, 80.0, false, "dev", "multi", """{"group": "control", "rank": 1, "p": 11}"""),
    (12L, 8L, 80.0, false, "dev", "multi", """{"group": "control", "rank": 3, "p": 12}"""),
    (13L, 12L, 95.0, false, "dev", "multi", """{"group": "control", "rank": 3, "p": 13}"""),
    (14L, 12L, 80.0, true, "dev", "multi", """{"group": "control", "rank": 3, "p": 14}"""),
    (15L, 0L, 0.0, false, "x", "onedoc", """{"p": 1}"""))

  private[graft] def regressionDf(s: SparkSession): DataFrame = {
    import s.implicits._
    RegressionRows.toDF("id", "age", "score", "active", "tag", "tbl", "meta")
  }

  private[graft] val regressionSql: String = {
    val values = RegressionRows.map { case (id, age, score, active, tag, tbl, meta) =>
      s"($id, $age, $score, $active, '$tag', '$tbl', '$meta')"
    }.mkString(",\n    ")
    s"SELECT * FROM (VALUES\n    $values\n) AS t(id, age, score, active, tag, tbl, meta)"
  }

  // DuckDB-side JSON accessors over the fixture's known kinds
  private def rNum(path: String, cmp: String): String =
    s"TRY_CAST(json_extract_string(meta, '$path') AS DECIMAL(38,10)) $cmp"
  private def rStr(path: String, cmp: String): String =
    s"json_extract_string(meta, '$path') $cmp"

  private[graft] val RegressionCases: Seq[MCase] = {
    val multi = "tbl == \"multi\""
    val multiD = "tbl = 'multi'"
    def m(id: String, engine: String, duck: String) =
      MCase(id, s"$multi and ($engine)", s"$multiD AND ($duck)")
    // order permutations: each pair must answer identically, pinned by
    // emitting BOTH sides (filtering_case_matrix.py ORDER_SENSITIVE)
    val order = Seq(
      m("ord1_l", "age > 10 and score <= 90", "age > 10 AND score <= 90"),
      m("ord1_r", "score <= 90 and age > 10", "score <= 90 AND age > 10"),
      m("ord2_l", """age > 10 and meta["group"] == "qa"""",
        s"age > 10 AND ${rStr("$.group", "= 'qa'")}"),
      m("ord2_r", """meta["group"] == "qa" and age > 10""",
        s"${rStr("$.group", "= 'qa'")} AND age > 10"),
      m("ord3_l", """tag == "ops" or active == true""",
        "tag = 'ops' OR active = true"),
      m("ord3_r", """active == true or tag == "ops"""",
        "active = true OR tag = 'ops'"),
      m("ord4_l", """(age > 10 and meta["rank"] in [1, 3]) or active == true""",
        s"(age > 10 AND ${rNum("$.rank", "IN (1, 3)")}) OR active = true"),
      m("ord4_r", """active == true or (meta["rank"] in [1, 3] and age > 10)""",
        s"active = true OR (${rNum("$.rank", "IN (1, 3)")} AND age > 10)"))
    // algebraic equivalences (EQUIVALENT_EXPRESSION_CASES)
    val equiv = Seq(
      m("eq_or_vs_in_l",
        """meta["p"] == 1 or meta["p"] == 3 or meta["p"] == 5""",
        s"${rNum("$.p", "= 1")} OR ${rNum("$.p", "= 3")} OR ${rNum("$.p", "= 5")}"),
      m("eq_or_vs_in_r", """meta["p"] in [1, 3, 5]""",
        rNum("$.p", "IN (1, 3, 5)")),
      m("eq_demorgan_l", "not (age <= 10 or active == false)",
        "NOT (age <= 10 OR active = false)"),
      m("eq_demorgan_r", "age > 10 and active == true",
        "age > 10 AND active = true"),
      m("eq_distrib_l",
        """(age > 10 and active == true) or (age > 10 and tag == "ops")""",
        "(age > 10 AND active = true) OR (age > 10 AND tag = 'ops')"),
      m("eq_distrib_r", """age > 10 and (active == true or tag == "ops")""",
        "age > 10 AND (active = true OR tag = 'ops')"))
    // boolean-fanout generalized counts (BOOLEAN_FANOUT_*_L2)
    val fanout = Seq(
      m("fan_1", "age > 10", "age > 10"),
      m("fan_and2", "age > 10 and score <= 90", "age > 10 AND score <= 90"),
      m("fan_and3", "age > 10 and score <= 90 and active == true",
        "age > 10 AND score <= 90 AND active = true"),
      m("fan_and5",
        """age > 10 and score <= 90 and active == false and tag != "ops" and meta["rank"] >= 3""",
        "age > 10 AND score <= 90 AND active = false AND tag <> 'ops' AND " +
          rNum("$.rank", ">= 3")),
      m("fan_or2", """meta["p"] == 1 or meta["p"] == 2""",
        s"${rNum("$.p", "= 1")} OR ${rNum("$.p", "= 2")}"),
      m("fan_or5",
        (1 to 5).map(i => s"""meta["p"] == $i""").mkString(" or "),
        (1 to 5).map(i => rNum("$.p", s"= $i")).mkString(" OR ")),
      m("fan_or10",
        (1 to 10).map(i => s"""meta["p"] == $i""").mkString(" or "),
        (1 to 10).map(i => rNum("$.p", s"= $i")).mkString(" OR ")))
    // bool literal in logical position (#48443: `true or (f > v)` must
    // parse AND answer correctly, in both operand orders)
    val boolLit = Seq(
      m("bool_lit_or_true", "true or (age > 10)", "true OR age > 10"),
      m("bool_lit_or_right", "(age > 10) or true", "age > 10 OR true"),
      m("bool_lit_and_true", "true and (age > 10)", "true AND age > 10"),
      m("bool_lit_or_false", "false or (age > 10)", "false OR age > 10"))
    // #51568 one-doc negative / later-int positive / empty controls:
    // float and int literals share the numeric bucket, and an absent
    // match set yields ZERO rows, never an error value
    val controls = Seq(
      MCase("onedoc_negative",
        """tbl == "onedoc" and (meta["p"] == 2.0 or meta["p"] == 3 or meta["p"] == 4 or meta["p"] == 5)""",
        s"tbl = 'onedoc' AND (${rNum("$.p", "= 2.0")} OR ${rNum("$.p", "= 3")} OR ${rNum("$.p", "= 4")} OR ${rNum("$.p", "= 5")})"),
      MCase("onedoc_positive",
        """tbl == "onedoc" and (meta["p"] == 2.0 or meta["p"] == 1 or meta["p"] == 3 or meta["p"] == 4)""",
        s"tbl = 'onedoc' AND (${rNum("$.p", "= 2.0")} OR ${rNum("$.p", "= 1")} OR ${rNum("$.p", "= 3")} OR ${rNum("$.p", "= 4")})"),
      MCase("empty_control",
        """tbl == "none" and (meta["p"] == 1.0 or meta["p"] == 2 or meta["p"] == 3 or meta["p"] == 4)""",
        s"tbl = 'none' AND (${rNum("$.p", "= 1.0")} OR ${rNum("$.p", "= 2")} OR ${rNum("$.p", "= 3")} OR ${rNum("$.p", "= 4")})"))
    order ++ equiv ++ fanout ++ boolLit ++ controls
  }

  /** The reference's pinned expected_ids per case (expression lists in
    * filtering_case_matrix.py / test_filter_regressions.py) — asserted
    * as exact sets by RegressionMatrixSpec.
    */
  private[graft] val RegressionExpected: Map[String, Set[Long]] = {
    val ord1 = Set(3L, 4L, 6L, 7L, 8L, 9L, 10L, 11L, 14L)
    val ord4 = Set(1L, 2L, 3L, 4L, 11L, 13L, 14L)
    Map(
      "ord1_l" -> ord1, "ord1_r" -> ord1,
      "ord2_l" -> Set(2L, 4L), "ord2_r" -> Set(2L, 4L),
      "ord3_l" -> Set(1L, 2L, 4L, 5L, 6L, 14L),
      "ord3_r" -> Set(1L, 2L, 4L, 5L, 6L, 14L),
      "ord4_l" -> ord4, "ord4_r" -> ord4,
      "eq_or_vs_in_l" -> Set(1L, 3L, 5L), "eq_or_vs_in_r" -> Set(1L, 3L, 5L),
      "eq_demorgan_l" -> Set(2L, 4L, 14L), "eq_demorgan_r" -> Set(2L, 4L, 14L),
      "eq_distrib_l" -> Set(2L, 4L, 5L, 6L, 14L),
      "eq_distrib_r" -> Set(2L, 4L, 5L, 6L, 14L),
      "fan_1" -> Set(2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L, 13L, 14L),
      "fan_and2" -> ord1,
      "fan_and3" -> Set(4L, 14L),
      "fan_and5" -> Set(3L, 7L, 8L, 9L, 10L),
      "fan_or2" -> Set(1L, 2L),
      "fan_or5" -> Set(1L, 2L, 3L, 4L, 5L),
      "fan_or10" -> (1L to 10L).toSet,
      "bool_lit_or_true" -> (1L to 14L).toSet,
      "bool_lit_or_right" -> (1L to 14L).toSet,
      "bool_lit_and_true" ->
        Set(2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L, 13L, 14L),
      "bool_lit_or_false" ->
        Set(2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L, 13L, 14L),
      "onedoc_negative" -> Set.empty[Long],
      "onedoc_positive" -> Set(15L),
      "empty_control" -> Set.empty[Long])
  }

  // =================================================================
  // Battery 7 — regex dialect conformance (RE2 semantics)
  // reference test_milvus_client_regex_filter.py: the `=~` kernel is
  // RE2 with dot_nl=true (`c.d` spans a newline unless inline (?-s)),
  // substring (PartialMatch) semantics, bare script classes \p{Han},
  // (?i) inline flags, empty-pattern-matches-all, and the tolerant
  // regex-operand string extraction (`\.`/`\p` pass through where a
  // plain string literal would reject them). DuckDB's regexp_matches
  // IS RE2, so the oracle runs the same engine family natively (option
  // 's' supplies the dot_nl default the engine bakes in).
  // =================================================================

  /** The reference's regex fixture verbatim (rows :38-167): newline and
    * tab payloads, CJK, emoji, empty string, a NULL email, a
    * case-different GMAIL.
    */
  private[graft] val RegexRows: Seq[(Long, String, String, Seq[String], String)] = Seq(
    (1L, "ERROR E1001: connection timeout", "alice@gmail.com",
      Seq("release-v1", "prod"), """{"level": "ERROR"}"""),
    (2L, "WARN W2002: retry later", "bob@example.com",
      Seq("release-v2", "staging"), """{"level": "WARN"}"""),
    (3L, "DEBUG cache hit", "carol@GMAIL.com",
      Seq("debug", "dev"), """{"level": "DEBUG"}"""),
    (4L, "中文日志 error code 555-1234", null,
      Seq("cn", "release-alpha"), """{"level": "INFO"}"""),
    (5L, "multi\nline c\nd pattern", "dave@gmail.com",
      Seq("release-v1-hotfix", "prod"), """{"level": "ERROR"}"""),
    (6L, "", "empty@gmail.com", Seq("", "empty"), """{"level": ""}"""),
    (7L, "status OK ✅ deploy success 🚀", "emo@dev.io",
      Seq("emoji", "dev"), """{"level": "INFO"}"""),
    (8L, "line1\ttabbed", "a@test.com", Seq.empty, "{}"),
    (9L, "line1\nline2", "b@test.com", Seq.empty, "{}"))

  private[graft] def regexDf(s: SparkSession): DataFrame = {
    import s.implicits._
    RegexRows.toDF("id", "txt", "email", "tags", "meta")
  }

  private val regexSql: String =
    """SELECT * FROM (VALUES
      |  (1, 'ERROR E1001: connection timeout', 'alice@gmail.com',
      |    ['release-v1', 'prod'], '{"level": "ERROR"}'),
      |  (2, 'WARN W2002: retry later', 'bob@example.com',
      |    ['release-v2', 'staging'], '{"level": "WARN"}'),
      |  (3, 'DEBUG cache hit', 'carol@GMAIL.com',
      |    ['debug', 'dev'], '{"level": "DEBUG"}'),
      |  (4, '中文日志 error code 555-1234', NULL,
      |    ['cn', 'release-alpha'], '{"level": "INFO"}'),
      |  (5, 'multi' || chr(10) || 'line c' || chr(10) || 'd pattern', 'dave@gmail.com',
      |    ['release-v1-hotfix', 'prod'], '{"level": "ERROR"}'),
      |  (6, '', 'empty@gmail.com', ['', 'empty'], '{"level": ""}'),
      |  (7, 'status OK ✅ deploy success 🚀', 'emo@dev.io',
      |    ['emoji', 'dev'], '{"level": "INFO"}'),
      |  (8, 'line1' || chr(9) || 'tabbed', 'a@test.com', CAST([] AS VARCHAR[]), '{}'),
      |  (9, 'line1' || chr(10) || 'line2', 'b@test.com', CAST([] AS VARCHAR[]), '{}')
      |) AS t(id, txt, email, tags, meta)""".stripMargin

  private def re2(col: String, pat: String): String =
    s"regexp_matches($col, '$pat', 's')"

  private[graft] val RegexCases: Seq[MCase] = Seq(
    // substring (PartialMatch) semantics + anchors
    MCase("substr", """txt =~ "timeout"""", re2("txt", "timeout")),
    MCase("anchor_start", """txt =~ "^ERROR"""", re2("txt", "^ERROR")),
    MCase("anchor_end", """txt =~ "hit$"""", re2("txt", "hit$")),
    MCase("full_anchor", """txt =~ "^DEBUG cache hit$"""",
      re2("txt", "^DEBUG cache hit$")),
    // classes/quantifiers; the escaped dot survives the regex-operand
    // extraction (extractRegexPattern) un-halved
    MCase("classes", """txt =~ "E[0-9]{4}:"""", re2("txt", "E[0-9]{4}:")),
    MCase("quant", """txt =~ "[0-9]{3}-[0-9]{4}"""",
      re2("txt", "[0-9]{3}-[0-9]{4}")),
    MCase("ci_flag", """email =~ "(?i)gmail\.com$"""",
      re2("email", raw"(?i)gmail\.com$$")),
    // dot_nl=true by default; inline (?-s) disables it
    MCase("dot_nl_default", """txt =~ "c.d"""", re2("txt", "c.d")),
    MCase("dot_nl_off", """txt =~ "(?-s)c.d"""", re2("txt", "(?-s)c.d")),
    // RE2 script class + emoji literal + control chars in data
    MCase("unicode_han", """txt =~ "\p{Han}+"""", re2("txt", raw"\p{Han}+")),
    MCase("emoji", """txt =~ "✅"""", re2("txt", "✅")),
    MCase("tab_escape", """txt =~ "\t"""", re2("txt", raw"\t")),
    MCase("nl_escape", """txt =~ "\n"""", re2("txt", raw"\n")),
    // RE2-20230301 named groups ((?P<name>...), not Java's (?<name>...))
    MCase("named_group", """txt =~ "(?P<level>ERROR|WARN)"""",
      re2("txt", "(?P<level>ERROR|WARN)")),
    // empty pattern matches every non-NULL value; 3VL on NULL email
    MCase("empty_pattern", """txt =~ """"", re2("txt", "")),
    MCase("null_value", """email =~ "gmail"""", re2("email", "gmail")),
    MCase("negated", """txt !~ "^DEBUG"""", s"NOT ${re2("txt", "^DEBUG")}"),
    MCase("raw_string_class", """txt =~ r"E\d{4}"""", re2("txt", raw"E\d{4}")),
    // NULL composes with !~ under 3VL; `or is null` re-admits the row
    MCase("neg_or_isnull", """email !~ "gmail" or email is null""",
      s"(NOT ${re2("email", "gmail")}) OR email IS NULL"),
    // array ELEMENT access regexes fine; an out-of-range index is a
    // quiet empty result, never an error (:679-688)
    MCase("arr_elem", """tags[0] =~ "^release-v[0-9]+"""",
      re2("tags[1]", "^release-v[0-9]+")),
    MCase("arr_elem_empty", """tags[0] =~ "^$"""", re2("tags[1]", "^$")),
    MCase("arr_oob", """tags[10] =~ ".*"""", re2("tags[11]", ".*")),
    // a JSON ROOT object never matches (per-row kind gate, no error —
    // :710-726); the path under it does
    MCase("json_root", """meta =~ "ERROR"""",
      "json_type(CAST(meta AS JSON)) = 'VARCHAR' AND " +
        re2("json_extract_string(meta, '$')", "ERROR")),
    MCase("json_path_regex", """meta["level"] =~ "ERROR"""",
      "json_type(CAST(meta AS JSON), '$.level') = 'VARCHAR' AND " +
        re2("json_extract_string(meta, '$.level')", "ERROR")))

  /** RE2-invalid constructs Java's engine would happily accept: the
    * reference errors at plan time ("Failed to compile regex pattern",
    * RegexQuery.h:58-63). Pinned as cnt = -1 rows: the ENGINE must
    * throw CompileError to earn the -1 (a silent accept surfaces the
    * real row count and hash-mismatches the oracle's pinned -1), and
    * the ORACLE pin of -1 encodes "DuckDB's own RE2 rejects this too".
    */
  private[graft] val RegexErrorCases: Seq[(String, String)] = Seq(
    ("err_backref", """txt =~ "(a)\1""""),
    ("err_lookahead", """txt =~ "foo(?=bar)""""),
    ("err_lookbehind", """txt =~ "(?<=foo)bar""""),
    ("err_possessive", """txt =~ "ab*+""""),
    ("err_atomic_group", """txt =~ "(?>ab)c""""),
    ("err_huge_repeat", """txt =~ "a{1001}""""))

  def regexMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = battery(s, regexDf(s), RegexCases, jsonCols = Set("meta"))
    val errRows = RegexErrorCases.map { case (id, expr) =>
      val cnt =
        try {
          val df = regexDf(s)
          df.filter(ExprCompiler.compile(expr, df, jsonColumns = Set("meta")))
            .count()
        } catch { case _: ExprCompiler.CompileError => -1L }
      (id, cnt)
    }.toDF("case_id", "cnt")
    base.unionByName(errRows).orderBy(col("case_id"))
  }

  private[graft] val regexMatrixOracle: String =
    (RegexCases.map(c =>
      s"SELECT '${c.id}' AS case_id, count(*) AS cnt FROM ($regexSql) WHERE ${c.duck}") ++
      RegexErrorCases.map { case (id, _) =>
        s"SELECT '$id' AS case_id, CAST(-1 AS BIGINT) AS cnt" })
      .mkString("SELECT * FROM (\n", "\nUNION ALL ", "\n) ORDER BY case_id")

  /** cnt + id_sum per case: identical counts with different members
    * still break the row.
    */
  private def batteryWithIdSum(s: SparkSession, base: DataFrame,
      cases: Seq[MCase], jsonCols: Set[String]): DataFrame = {
    val counters = cases.flatMap { c =>
      val cond = ExprCompiler.compile(c.engine, base, jsonColumns = jsonCols)
      Seq(sum(when(cond, 1L).otherwise(0L)).as(c.id + "_cnt"),
        sum(when(cond, col("id")).otherwise(0L)).as(c.id + "_sum"))
    }
    val row = base.agg(counters.head, counters.tail: _*).head()
    import s.implicits._
    cases.map(c => (c.id, row.getAs[Long](c.id + "_cnt"),
        row.getAs[Long](c.id + "_sum")))
      .toDF("case_id", "cnt", "id_sum").orderBy(col("case_id"))
  }

  def regressionMatrix(s: SparkSession, dir: String): DataFrame =
    batteryWithIdSum(s, regressionDf(s), RegressionCases, Set("meta"))

  private[graft] val regressionMatrixOracle: String =
    RegressionCases.map(c =>
      s"SELECT '${c.id}' AS case_id, count(*) AS cnt, " +
        s"CAST(COALESCE(sum(id), 0) AS BIGINT) AS id_sum " +
        s"FROM ($regressionSql) WHERE ${c.duck}")
      .mkString("SELECT * FROM (\n", "\nUNION ALL ", "\n) ORDER BY case_id")

  // =================================================================
  // Battery 11 — expression-equivalence / order-insensitivity / OR
  // fanout contract (reference filtering_case_matrix.py:
  // EQUIVALENT_EXPRESSION_CASES, ORDER_SENSITIVE_EXPRESSIONS,
  // SAME_FIELD_OR_FANOUT_CASES, BOOLEAN_FANOUT_*_L2,
  // JSON_MIXED_TYPE_IN_51489 / JSON_BOOL_MIXED_IN_51567): two
  // expressions the engine PROMISES equivalent must select the exact
  // same rows — De Morgan, distributivity, OR↔IN (scalar and typed
  // JSON buckets), conjunct/disjunct reordering, and OR fanout widths.
  // The engine emits cnt(A) plus the symmetric difference |A Δ B| per
  // case in ONE pass; the oracle recomputes cnt from an independent
  // flattened derivation (no JSON) and pins the difference at 0 —
  // equivalence alone can't hide a shared-path bug from the oracle
  // count, and the count alone can't hide a membership swap from Δ.
  // =================================================================

  final case class EqCase(id: String, exprA: String, exprB: String,
      duck: String)

  private[graft] def equivDf(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val id = col("event_id")
    ev.select(id.as("id"),
      (id % 25).as("age"),
      col("value").as("score"),
      (id % 2 === 0).as("active"),
      col("event_type").as("tag"),
      to_json(struct((id % 7).as("p"), (id % 5).as("rank"),
        when(id % 3 === 0, "qa").otherwise("ops").as("group"),
        (id % 2 === 0).as("b"))).as("meta"))
  }

  /** The oracle derives p/rank/grp/b FLAT from events — it never parses
    * the JSON the engine filters through.
    */
  private val equivSql: String =
    """SELECT event_id AS id, event_id % 25 AS age, value AS score,
      |  event_id % 2 = 0 AS active, event_type AS tag,
      |  event_id % 7 AS p, event_id % 5 AS rank,
      |  CASE WHEN event_id % 3 = 0 THEN 'qa' ELSE 'ops' END AS grp,
      |  event_id % 2 = 0 AS b
      |FROM events""".stripMargin

  private[graft] val EquivCases: Seq[EqCase] = Seq(
    EqCase("eq_or_vs_in_json",
      """meta["p"] == 1 or meta["p"] == 3 or meta["p"] == 5""",
      """meta["p"] in [1, 3, 5]""",
      "p IN (1, 3, 5)"),
    EqCase("eq_de_morgan",
      "not (age <= 10 or active == false)",
      "age > 10 and active == true",
      "age > 10 AND active = true"),
    EqCase("eq_distributive",
      """(age > 10 and active == true) or (age > 10 and tag == "click")""",
      """age > 10 and (active == true or tag == "click")""",
      "age > 10 AND (active = true OR tag = 'click')"),
    EqCase("eq_and_swap",
      "age > 10 and score <= 90",
      "score <= 90 and age > 10",
      "age > 10 AND score <= 90"),
    EqCase("eq_and_json_swap",
      """age > 10 and meta["group"] == "qa"""",
      """meta["group"] == "qa" and age > 10""",
      "age > 10 AND grp = 'qa'"),
    EqCase("eq_or_swap",
      """tag == "click" or active == true""",
      """active == true or tag == "click"""",
      "tag = 'click' OR active = true"),
    EqCase("eq_mixed_depth_swap",
      """(age > 10 and meta["rank"] in [1, 3]) or active == true""",
      """active == true or (meta["rank"] in [1, 3] and age > 10)""",
      "(age > 10 AND rank IN (1, 3)) OR active = true"),
    EqCase("eq_or5_fanout_vs_in",
      (1 to 5).map(i => s"""meta["p"] == $i""").mkString(" or "),
      """meta["p"] in [1, 2, 3, 4, 5]""",
      "p IN (1, 2, 3, 4, 5)"),
    EqCase("eq_or10_fanout_vs_in",
      (1 to 10).map(i => s"""meta["p"] == $i""").mkString(" or "),
      s"""meta["p"] in [${(1 to 10).mkString(", ")}]""",
      "p IN (1, 2, 3, 4, 5, 6)"), // p ∈ [0, 6]: branches 7-10 are empty
    EqCase("eq_and5_cross_field_swap",
      """age > 10 and score <= 90 and active == false and tag != "click" and meta["rank"] >= 3""",
      """meta["rank"] >= 3 and tag != "click" and active == false and score <= 90 and age > 10""",
      "age > 10 AND score <= 90 AND active = false AND tag <> 'click' AND rank >= 3"),
    EqCase("eq_not_unary",
      "not (active == true)",
      "active == false",
      "active = false"),
    // #51625 canonicalization: a mixed-kind IN partitions by literal
    // kind — the string "2" bucket never matches an int-valued path
    EqCase("eq_mixed_in_51489",
      """meta["p"] in [1, "2"]""",
      """(meta["p"] == 1) or (meta["p"] == "2")""",
      "p = 1"),
    // bool and int stay disjoint buckets (#51567)
    EqCase("eq_bool_in_51567",
      """meta["b"] in [true, 1]""",
      """(meta["b"] == true) or (meta["b"] == 1)""",
      "b = true"))

  def equivMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = equivDf(s, dir)
    val counters = EquivCases.flatMap { c =>
      val a = coalesce(
        ExprCompiler.compile(c.exprA, base, jsonColumns = Set("meta")), lit(false))
      val b = coalesce(
        ExprCompiler.compile(c.exprB, base, jsonColumns = Set("meta")), lit(false))
      Seq(sum(when(a, 1L).otherwise(0L)).as(c.id + "_cnt"),
        sum(when(a =!= b, 1L).otherwise(0L)).as(c.id + "_diff"))
    }
    // 26 json-kind-dispatching predicates — spread like jsonKindMatrix
    val row = graft.GraftSession.spread(base)
      .agg(counters.head, counters.tail: _*).head()
    EquivCases.map(c => (c.id, row.getAs[Long](c.id + "_cnt"),
        row.getAs[Long](c.id + "_diff")))
      .toDF("case_id", "cnt", "n_diff").orderBy(col("case_id"))
  }

  private[graft] val equivMatrixOracle: String =
    EquivCases.map(c =>
      s"SELECT '${c.id}' AS case_id, count(*) AS cnt, " +
        s"CAST(0 AS BIGINT) AS n_diff FROM ($equivSql) WHERE ${c.duck}")
      .mkString("SELECT * FROM (\n", "\nUNION ALL ", "\n) ORDER BY case_id")

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_equiv_matrix" -> (equivMatrix _),
    "q_typed_matrix" -> (typedMatrix _),
    "q_array_matrix" -> (arrayMatrix _),
    "q_null_matrix" -> (nullMatrix _),
    "q_json_kind_matrix" -> (jsonKindMatrix _),
    "q_like_matrix" -> (likeMatrix _),
    "q_escape_matrix" -> (escapeMatrix _),
    "q_regression_matrix" -> (regressionMatrix _),
    "q_regex_matrix" -> (regexMatrix _),
    "q_term_matrix" -> (termMatrix _),
    "q_agg_matrix" -> (aggMatrix _),
    "q_index_consistency" -> (indexConsistency _),
    "q_index_consistency_mixed" -> (indexConsistencyMixed _))

  // def, not val: oracle bodies reference case/sql vals declared later
  // in the file; a strict map would force them during <clinit> while
  // they are still null (the round-11 harness crash).
  def oracles: Map[String, String] = Map(
    "q_equiv_matrix" -> equivMatrixOracle,
    "q_typed_matrix" -> typedMatrixOracle,
    "q_array_matrix" -> arrayMatrixOracle,
    "q_null_matrix" -> nullMatrixOracle,
    "q_json_kind_matrix" -> jsonKindMatrixOracle,
    "q_like_matrix" -> likeMatrixOracle,
    "q_escape_matrix" -> escapeMatrixOracle,
    "q_regression_matrix" -> regressionMatrixOracle,
    "q_regex_matrix" -> regexMatrixOracle,
    "q_term_matrix" -> termMatrixOracle,
    "q_agg_matrix" -> aggMatrixOracle,
    "q_index_consistency" -> indexConsistencyOracle,
    "q_index_consistency_mixed" -> indexConsistencyMixedOracle)

  // =================================================================
  // Battery 9 — TermExpr / containment operand contracts
  // reference parser_visitor.go VisitTerm:1154-1211 (single-field
  // target, non-const target, castValue per list element) +
  // planparserv2/utils.go checkContainsElement:788-816, pinned by
  // test_mix_scenes.py test_no_index_query_with_invalid_expr and
  // test_bitmap_index_query_with_invalid_array_params
  // =================================================================

  private[graft] def termDf(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (1L, 20L, 2.5, "ann", true, Seq("a", "b"), Seq(1L, 2L, 3L)),
      (2L, 30L, 1.0, "bob", false, Seq("c"), Seq(3L, 7L)),
      (3L, -5L, 1.5, "中文名", true, Seq("a"), Seq(10L)),
      (4L, 25L, 0.5, "dave", false, Seq.empty[String], Seq(7L)))
      .toDF("id", "age", "score", "name", "flag", "tags", "nums")
  }

  private lazy val termSql: String =
    """SELECT * FROM (VALUES
      |  (1, 20, 2.5, 'ann', true, ['a','b'], [1,2,3]),
      |  (2, 30, 1.0, 'bob', false, ['c'], [3,7]),
      |  (3, -5, 1.5, '中文名', true, ['a'], [10]),
      |  (4, 25, 0.5, 'dave', false, CAST([] AS VARCHAR[]), [7])
      |) AS t(id, age, score, name, flag, tags, nums)""".stripMargin

  /** Valid term shapes — the accept side of the contract. */
  private[graft] lazy val TermCases: Seq[MCase] = Seq(
    MCase("t_int_in", "age in [20, 30]", "age IN (20, 30)"),
    MCase("t_int_not_in", "age not in [20]", "age NOT IN (20)"),
    MCase("t_neg_in", "age in [-5, 99]", "age IN (-5, 99)"),
    // castValue widens int literals into a float column (utils.go:291-298)
    MCase("t_float_in_ints", "score in [1, 2.5]", "score IN (1, 2.5)"),
    MCase("t_str_in", """name in ["ann", "中文名"]""",
      "name IN ('ann', '中文名')"),
    MCase("t_bool_in", "flag in [true]", "flag IN (true)"),
    // array SUBSCRIPT compares as the element type (VisitTerm:1172-1175)
    MCase("t_elem_in", "nums[0] in [1, 7]", "nums[1] IN (1, 7)"),
    // _any/_all comparability is LOOSE across numerics
    // (canBeComparedDataType: arithmetic↔arithmetic)
    MCase("t_contains_any_loose", "array_contains_any(nums, [3, 7.0])",
      "list_has_any(nums, [3, 7.0])"))

  /** Reject side: each must raise the engine's named compile error to
    * earn the pinned -1 (a silent accept surfaces its real count and
    * hash-mismatches the oracle).
    */
  private[graft] lazy val TermErrorCases: Seq[(String, String)] = Seq(
    // 'term' can only be used on single field
    ("e_mod_lhs", "age % 13 in [0, 1, 2]"),
    ("e_arith_lhs", "age + 1 in [21]"),
    // 'term' can only be used on non-const expression
    ("e_const_lhs", "5 in [1, 5]"),
    // castValue: list element not castable to the column type
    ("e_float_into_int", "age in [20, 1.5]"),
    ("e_str_into_int", """age in [20, "x"]"""),
    ("e_bool_into_int", "age in [true]"),
    ("e_int_into_str", """name in ["ann", 5]"""),
    ("e_int_into_bool", "flag in [1]"),
    ("e_str_into_float", """score in [2.5, "x"]"""),
    // right-hand side must be a list
    ("e_scalar_rhs", "age in 20"),
    // checkContainsElement: _any/_all operand must be an array; every
    // element must be comparable to the array's element type
    ("e_nested_list_any", """array_contains_any(tags, [["a", "b"]])"""),
    ("e_int_probe_str_any", "array_contains_any(tags, [1])"),
    ("e_scalar_any", """array_contains_any(tags, "a")"""),
    ("e_scalar_all", "array_contains_all(nums, 3)"),
    // singular contains takes castValue's STRICT rules (no float→int)
    ("e_float_contains_int", "array_contains(nums, 3.5)"),
    ("e_str_contains_int", """array_contains(nums, "a")"""),
    // a LIST probe to singular contains is one element of kind array —
    // castValue has no array→scalar cast, so this is the named
    // "can't compare between array element type" error, never a flatten
    ("e_list_contains_int", "array_contains(nums, [1, 2])"),
    ("e_list_contains_str", """array_contains(tags, ["a", "b"])"""))

  def termMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = battery(s, termDf(s), TermCases)
    val errRows = TermErrorCases.map { case (id, expr) =>
      val cnt =
        try {
          val df = termDf(s)
          df.filter(ExprCompiler.compile(expr, df)).count()
        } catch {
          case _: ExprCompiler.CompileError => -1L
          case _: graft.expr.Parser.ParseError => -1L
        }
      (id, cnt)
    }.toDF("case_id", "cnt")
    base.unionByName(errRows).orderBy(col("case_id"))
  }

  // lazy: referenced by the `oracles` map textually above this section
  private[graft] lazy val termMatrixOracle: String =
    (TermCases.map(c =>
      s"SELECT '${c.id}' AS case_id, count(*) AS cnt FROM ($termSql) WHERE ${c.duck}") ++
      TermErrorCases.map { case (id, _) =>
        s"SELECT '$id' AS case_id, CAST(-1 AS BIGINT) AS cnt" })
      .mkString("SELECT * FROM (\n", "\nUNION ALL ", "\n) ORDER BY case_id")

  // =================================================================
  // Battery 10 — query-aggregation contract (the aggregation RPC:
  // proxy/task_query.go:560-604,834-836 + internal/agg/{aggregate,
  // type_check,aggregate_util}.go + reduce/orderby/types.go), pinned by
  // test_query_aggregation.py: count(*) vs count(field) null semantics,
  // typed sum/avg returns, varchar min/max, nullable group keys (NULL
  // is a group), group-by/order-by type & membership restrictions,
  // count(*) pagination rejection. Accept cases reduce each queryAgg
  // result to ONE double; reject cases pin the named parameter error
  // as -1. The oracle recomputes every reduction in DuckDB SQL.
  // =================================================================

  /** Typed fixture from `orders`: c2 nullable int16, c3 int32,
    * c4 double, c5 varchar (3 values), c6 nullable int64 (3 values + a
    * NULL group). Engine-only columns exercise the reject matrix:
    * gbool/gfloat/js/arr are unsupported group-by / aggregate targets.
    */
  private[graft] def aggFixture(s: SparkSession, dir: String): DataFrame = {
    // value-bounded subset: the battery pins the aggregation CONTRACT
    // (35 facade calls), not data scale — capping by key keeps the
    // 35-job fixture cost flat across scale factors
    val o = t(s, dir, "orders").filter(col("o_orderkey") <= 3000)
    o.select(
      col("o_orderkey").as("id"),
      when(col("o_orderkey") % 7 === 0, lit(null))
        .otherwise(col("o_orderkey") % 100).cast("smallint").as("c2"),
      (col("o_orderkey") % 1000).cast("int").as("c3"),
      col("o_totalprice").as("c4"),
      col("o_orderstatus").as("c5"),
      when(col("o_orderkey") % 11 === 0, lit(null))
        .otherwise(col("o_orderkey") % 3).cast("bigint").as("c6"))
      .withColumn("gbool", col("c3") % 2 === 0)
      .withColumn("gfloat", col("c4").cast("float"))
      .withColumn("js", to_json(struct(col("c3").as("k"))))
      .withColumn("arr", array(col("c3").cast("long")))
  }

  private lazy val aggFixtureSql: String =
    """SELECT o_orderkey AS id,
      |  CASE WHEN o_orderkey % 7 = 0 THEN NULL
      |       ELSE CAST(o_orderkey % 100 AS SMALLINT) END AS c2,
      |  CAST(o_orderkey % 1000 AS INTEGER) AS c3,
      |  o_totalprice AS c4,
      |  o_orderstatus AS c5,
      |  CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderkey % 3 END AS c6
      |FROM orders WHERE o_orderkey <= 3000""".stripMargin

  /** Accept side: (case id, engine reduction over queryAgg, oracle SQL
    * scalar over the same fixture). Engine reductions round with
    * HALF_UP to match DuckDB's round().
    */
  private def round3(x: Double): Double =
    BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble

  def aggMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.{Collection, CollectionSchema}
    val c = Collection.create(s, CollectionSchema(pkField = "id",
      jsonFields = Set("js")))
    c.insert(aggFixture(s, dir))

    def one(df: DataFrame): org.apache.spark.sql.Row = df.head()

    val accept: Seq[(String, () => Double)] = Seq(
      "a_count_star" -> (() =>
        one(c.queryAgg(outputFields = Seq("count(*)"))).getLong(0).toDouble),
      "a_count_field" -> (() =>
        one(c.queryAgg(outputFields = Seq("count(c2)"))).getLong(0).toDouble),
      // count(*) and count(nullable) TOGETHER (reference issue #47509):
      // the difference is exactly the null count
      "a_star_vs_field" -> (() => {
        val r = one(c.queryAgg(outputFields = Seq("count(*)", "count(c2)")))
        (r.getLong(0) - r.getLong(1)).toDouble
      }),
      "a_sum_int" -> (() =>
        one(c.queryAgg(outputFields = Seq("sum(c3)"))).getLong(0).toDouble),
      "a_sum_double" -> (() => round3(
        one(c.queryAgg(outputFields = Seq("sum(c4)"))).getDouble(0) / 1e6)),
      "a_avg_double" -> (() => round3(
        one(c.queryAgg(outputFields = Seq("avg(c4)"))).getDouble(0))),
      "a_case_insensitive" -> (() => {
        val r = one(c.queryAgg(outputFields = Seq("COUNT(c3)", "SUM(c3)")))
        (r.getLong(0) + r.getLong(1)).toDouble
      }),
      "a_filtered" -> (() => {
        val r = one(c.queryAgg("c2 >= 50",
          outputFields = Seq("count(c2)", "sum(c3)")))
        (r.getLong(0) + r.getLong(1)).toDouble
      }),
      "a_minmax_varchar" -> (() => {
        val r = one(c.queryAgg(outputFields = Seq("min(c5)", "max(c5)")))
        (r.getString(0).charAt(0).toInt + r.getString(1).charAt(0).toInt).toDouble
      }),
      // spread of per-group sums pins every group's aggregate at once
      "g_group_sums" -> (() => {
        val sums = c.queryAgg(outputFields = Seq("c5", "sum(c3)"),
          groupByFields = Seq("c5")).collect().map(_.getLong(1))
        (sums.max - sums.min).toDouble
      }),
      // NULL is its own group (test_group_by_nullable_*)
      "g_null_group" -> (() => {
        val rows = c.queryAgg(outputFields = Seq("c6", "count(*)"),
          groupByFields = Seq("c6")).collect()
        (rows.length * 100000L +
          rows.find(_.isNullAt(0)).map(_.getLong(1)).getOrElse(0L)).toDouble
      }),
      "g_limit" -> (() =>
        c.queryAgg(outputFields = Seq("c5", "count(c3)"),
          groupByFields = Seq("c5"), limit = 2).collect().length.toDouble),
      "g_orderby_desc" -> (() =>
        one(c.queryAgg(outputFields = Seq("c5", "count(*)"),
          groupByFields = Seq("c5"), orderByFields = Seq("c5:desc")))
          .getString(0).charAt(0).toInt.toDouble),
      // group key sorts even when NOT an output field
      // (test_group_by_field_not_required_in_output_fields)
      "g_orderby_key_not_output" -> (() =>
        one(c.queryAgg(outputFields = Seq("count(*)"),
          groupByFields = Seq("c5"), orderByFields = Seq("c5:desc")))
          .getLong(0).toDouble),
      // group keys only = one row per group
      "g_keys_only" -> (() =>
        c.queryAgg(outputFields = Seq("c5"), groupByFields = Seq("c5"))
          .collect().length.toDouble),
      "g_empty_result" -> (() =>
        c.queryAgg("c3 > 100000", outputFields = Seq("c5", "count(*)"),
          groupByFields = Seq("c5")).collect().length.toDouble),
      // ONE unbounded accept row: the contract cases above ride the
      // key-capped fixture (35 flat facade calls), but the data path
      // itself must scale with sf in the bench — this aggregate reads
      // the FULL orders table through a second collection
      "a_unbounded_count_avg" -> (() => {
        val cu = Collection.create(s, CollectionSchema(pkField = "id"))
        cu.insert(t(s, dir, "orders").select(
          col("o_orderkey").as("id"), col("o_totalprice").as("c4")))
        val r = one(cu.queryAgg(outputFields = Seq("count(*)", "avg(c4)")))
        r.getLong(0).toDouble + round3(r.getDouble(1))
      }))

    require(accept.map(_._1) == aggMatrixOracleAccept.map(_._1),
      "agg battery accept/oracle case ids out of sync")

    // Reject side: each must raise the proxy's named parameter error
    val reject: Seq[(String, () => DataFrame)] = Seq(
      "e_gb_bool" -> (() => c.queryAgg(outputFields = Seq("count(*)"),
        groupByFields = Seq("gbool"))),
      "e_gb_float" -> (() => c.queryAgg(outputFields = Seq("count(*)"),
        groupByFields = Seq("gfloat"))),
      "e_gb_double" -> (() => c.queryAgg(outputFields = Seq("count(*)"),
        groupByFields = Seq("c4"))),
      "e_gb_json" -> (() => c.queryAgg(outputFields = Seq("count(*)"),
        groupByFields = Seq("js"))),
      "e_gb_array" -> (() => c.queryAgg(outputFields = Seq("count(*)"),
        groupByFields = Seq("arr"))),
      "e_gb_missing" -> (() => c.queryAgg(outputFields = Seq("count(*)"),
        groupByFields = Seq("nope"))),
      "e_sum_varchar" -> (() => c.queryAgg(outputFields = Seq("sum(c5)"))),
      "e_avg_bool" -> (() => c.queryAgg(outputFields = Seq("avg(gbool)"))),
      "e_min_json" -> (() => c.queryAgg(outputFields = Seq("min(js)"))),
      "e_star_sum" -> (() => c.queryAgg(outputFields = Seq("sum(*)"))),
      "e_agg_missing" -> (() => c.queryAgg(outputFields = Seq("sum(nope)"))),
      "e_mixed_grouped" -> (() => c.queryAgg(outputFields = Seq("c5", "c3"),
        groupByFields = Seq("c5"))),
      "e_mixed_global" -> (() =>
        c.queryAgg(outputFields = Seq("count(*)", "c3"))),
      "e_orderby_agg" -> (() => c.queryAgg(
        outputFields = Seq("c5", "count(*)"), groupByFields = Seq("c5"),
        orderByFields = Seq("count(*)"))),
      "e_orderby_nongroup" -> (() => c.queryAgg(outputFields = Seq("c5"),
        groupByFields = Seq("c5"), orderByFields = Seq("c3"))),
      "e_orderby_dir" -> (() => c.queryAgg(outputFields = Seq("c5"),
        groupByFields = Seq("c5"), orderByFields = Seq("c5:sideways"))),
      "e_orderby_nulls" -> (() => c.queryAgg(outputFields = Seq("c5"),
        groupByFields = Seq("c5"), orderByFields = Seq("c5:asc:nulls_center"))),
      "e_countstar_limit" -> (() =>
        c.queryAgg(outputFields = Seq("count(*)"), limit = 10)),
      "e_bad_fn" -> (() => c.queryAgg(outputFields = Seq("median(c3)"))))

    val rows =
      accept.map { case (id, f) => (id, f()) } ++
        reject.map { case (id, f) =>
          val v =
            try { f().collect(); Double.NaN } // a silent accept mismatches
            catch { case _: IllegalArgumentException => -1.0 }
          (id, v)
        }
    rows.toDF("case_id", "val").orderBy(col("case_id"))
  }

  private[graft] lazy val aggMatrixOracle: String = {
    val acceptSelects = aggMatrixOracleAccept.map { case (id, sql) =>
      s"SELECT '$id' AS case_id, CAST(($sql) AS DOUBLE) AS val"
    } // each sql is a scalar subquery over the CTE fixture
    val rejectIds = Seq("e_gb_bool", "e_gb_float", "e_gb_double", "e_gb_json",
      "e_gb_array", "e_gb_missing", "e_sum_varchar", "e_avg_bool",
      "e_min_json", "e_star_sum", "e_agg_missing", "e_mixed_grouped",
      "e_mixed_global", "e_orderby_agg", "e_orderby_nongroup",
      "e_orderby_dir", "e_orderby_nulls", "e_countstar_limit", "e_bad_fn")
    val rejectSelects = rejectIds.map(id =>
      s"SELECT '$id' AS case_id, CAST(-1 AS DOUBLE) AS val")
    s"WITH f AS ($aggFixtureSql)\nSELECT * FROM (\n" +
      (acceptSelects ++ rejectSelects).mkString("\nUNION ALL ") +
      "\n) ORDER BY case_id"
  }

  /** Oracle scalar per accept case — kept beside the engine reductions
    * in [[aggMatrix]]; duplicated here for the lazy oracle builder.
    */
  private lazy val aggMatrixOracleAccept: Seq[(String, String)] = Seq(
    "a_count_star" -> "SELECT count(*) FROM f",
    "a_count_field" -> "SELECT count(c2) FROM f",
    "a_star_vs_field" -> "SELECT count(*) - count(c2) FROM f",
    "a_sum_int" -> "SELECT sum(c3) FROM f",
    "a_sum_double" -> "SELECT round(sum(c4) / 1e6, 3) FROM f",
    "a_avg_double" -> "SELECT round(avg(c4), 3) FROM f",
    "a_case_insensitive" -> "SELECT count(c3) + sum(c3) FROM f",
    "a_filtered" -> "SELECT count(c2) + sum(c3) FROM f WHERE c2 >= 50",
    "a_minmax_varchar" -> "SELECT ascii(min(c5)) + ascii(max(c5)) FROM f",
    "g_group_sums" ->
      "SELECT max(s) - min(s) FROM (SELECT sum(c3) AS s FROM f GROUP BY c5)",
    "g_null_group" ->
      ("SELECT (SELECT count(*) FROM (SELECT c6 FROM f GROUP BY c6)) * 100000" +
        " + (SELECT count(*) FROM f WHERE c6 IS NULL)"),
    "g_limit" ->
      "SELECT count(*) FROM (SELECT c5 FROM f GROUP BY c5 LIMIT 2)",
    "g_orderby_desc" -> "SELECT ascii(max(c5)) FROM f",
    "g_orderby_key_not_output" ->
      "SELECT count(*) FROM f WHERE c5 = (SELECT max(c5) FROM f)",
    "g_keys_only" -> "SELECT count(DISTINCT c5) FROM f",
    "g_empty_result" ->
      "SELECT count(*) FROM (SELECT c5 FROM f WHERE c3 > 100000 GROUP BY c5)",
    "a_unbounded_count_avg" ->
      "SELECT count(*) + round(avg(o_totalprice), 3) FROM orders")
}
