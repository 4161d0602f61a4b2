package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Metric
import graft.operators.{Fusion, VectorSearch}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2, with a
  * DuckDB-runnable oracle in [[oracleSql]] (column names aligned; float
  * aggregates rounded in BOTH so the hash compare is stable).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    GraftSession.table(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Queries.topkCosine(spark, dir)
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ graft.queries.SearchQueries.all ++
      graft.queries.TextQueries.all ++ graft.queries.WriteQueries.all ++
      graft.queries.ExtraQueries.all ++ graft.queries.LifecycleQueries.all ++
      graft.queries.FunctionQueries.all ++ graft.queries.MatrixQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.oracles ++ graft.queries.SearchQueries.oracles ++
      graft.queries.TextQueries.oracles ++ graft.queries.WriteQueries.oracles ++
      graft.queries.ExtraQueries.oracles ++ graft.queries.LifecycleQueries.oracles ++
      graft.queries.FunctionQueries.oracles ++ graft.queries.MatrixQueries.oracles
}

/** The operator-coverage query suite (grows with SURVEY.md §2). */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    GraftSession.table(s, dir, name)

  // --- §2.2 aggregation: groupBy + sum/avg/min/max/count (hash agg, partial+final)
  def aggGroup(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // --- §2.1 filter + count (count compiled to aggregate, PlanProto.cpp:441-476)
  def countFilter(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem")
      .filter(col("l_quantity") > 30 && col("l_discount") <= 0.05)
      .agg(count(lit(1)).as("cnt"))
  }

  // --- §2.3 multi-key sort + limit (PhyQueryOrderByNode)
  def orderByLimit(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders")
      .filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(50)
  }

  private def embQueries(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  // --- §2.1 PhyVectorSearchNode: brute-force exact top-k, COSINE
  def topkCosine(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    VectorSearch.topK(emb, "vec_id", "embedding",
        embQueries(s, dir), "qid", "qvec",
        Metric.COSINE, k = 10, roundTo = Some(4))
      .select(col("qid"), col("rank"), col("_score").as("score"), col("vec_id"))
      .orderBy(col("qid"), col("rank"))
  }

  // --- §2.1 PhyVectorSearchNode: brute-force exact top-k, squared L2
  def topkL2(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    VectorSearch.topK(emb, "vec_id", "embedding",
        embQueries(s, dir), "qid", "qvec",
        Metric.L2, k = 10, roundTo = Some(4))
      .select(col("qid"), col("rank"), col("_score").as("score"), col("vec_id"))
      .orderBy(col("qid"), col("rank"))
  }

  // --- §2.1 expr kernels via the filter-expression compiler (M0) ---

  /** UnaryRange + Conjunct + compare kernels (PhyUnaryRangeFilterExpr …). */
  def exprRange(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(graft.expr.ExprCompiler.compile(
        "l_quantity > 30.0 and l_discount <= 0.05 and l_returnflag == 'R'", li))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"), col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** BinaryRange (two-sided), arith-op-eval-range, modulo kernels. */
  def exprArith(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(graft.expr.ExprCompiler.compile(
        "10 < l_quantity <= 20 and (l_partkey % 10) == 3", li))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Term-IN + LIKE (prefix/inner) + OR conjunct kernels. */
  def exprInLike(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    p.filter(graft.expr.ExprCompiler.compile(
        "p_type like '%BRASS%' or (p_size in [5, 10, 15] and p_brand like 'Brand#1%')", p))
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"), col("p_size"))
      .orderBy(col("p_partkey"))
  }

  /** JSON-path compare + exists kernels over a JSON column. */
  def exprJson(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    ev.filter(graft.expr.ExprCompiler.compile(
        """props["k"] > 50 and event_type == "click" and exists props["k"]""",
        ev, jsonColumns = Set("props")))
      .select(col("event_id"), col("user_id"), col("event_type"), col("props"))
      .orderBy(col("event_id"))
  }

  /** `time_fields` result extraction (reference proxy/util.go:3405-3483
    * via the TimefieldsKey query/search param, pinned by
    * test_milvus_client_timestamptz.py:536): timestamptz output columns
    * become array<int64> of the requested wall-clock components in the
    * request timezone. Asia/Shanghai is a fixed UTC+8 zone, so the
    * oracle reproduces it with interval arithmetic — no DuckDB session
    * timezone dependence.
    */
  def timeFieldsExtract(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("ts"))
      .filter(col("event_id") % 97 === 0)
    val c = graft.Collection.create(s,
      graft.CollectionSchema(pkField = "event_id"))
    c.insert(ev)
    c.query("event_id % 97 == 0", Seq("event_id", "event_type", "ts"),
        timeFields = Seq("year", "month", "day", "hour", "minute",
          "second", "microsecond"),
        timezone = Some("Asia/Shanghai"))
      // the oracle gate hashes scalars — join the component array to a
      // string (the array SHAPE is pinned by TimeFieldsSpec)
      .select(col("event_id"), col("event_type"),
        concat_ws(",", col("ts").cast("array<string>")).as("ts_parts"))
      .orderBy(col("event_id"))
  }

  /** String order-by specs on the plain query path (reference
    * ParseOrderByFields, orderby/types.go:106-180: "field[:dir[:nulls]]"
    * with PostgreSQL nulls defaults). The driver compare sorts rows, so
    * the ORDER is pinned through the LIMIT: nulls-first + tiebreak
    * selects a row SET only the right ordering produces.
    */
  def orderBySpec(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"),
      when(col("o_orderkey") % 7 === 0, lit(null))
        .otherwise(col("o_orderkey") % 5).cast("bigint").as("rank5"))
    val c = graft.Collection.create(s,
      graft.CollectionSchema(pkField = "o_orderkey"))
    c.insert(o)
    c.query("o_orderkey >= 0", Seq("o_orderkey", "rank5"),
      orderByFields = Seq("rank5:desc:nulls_first", "o_orderkey:asc"),
      limit = 77)
  }

  /** Timestamptz interval arithmetic compare kernel. */
  def exprTsArith(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(graft.expr.ExprCompiler.compile(
        "l_shipdate + INTERVAL 'P30D' > iso'1998-09-01T00:00:00Z' and l_linenumber == 1", li))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .orderBy(col("l_orderkey"))
  }

  /** Timestamptz interval compare over the epoch-nanos MVCC ts domain
    * (reference TimestamptzArithCompareExpr.cpp over TIMESTAMPTZ carried
    * as int64 epoch, Types.h:70-102): the fixed-duration interval folds
    * into the comparison literal — a plain pushdown range filter on the
    * int64 ts — while the month interval takes the calendar path; the
    * reversed `iso'...' OP field ± INTERVAL` form is exercised too.
    */
  def tstzCompare(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    ev.filter(graft.expr.ExprCompiler.compile(
        "ts + INTERVAL 'P3D' > iso'2024-01-25T00:00:00Z' and " +
        "iso'2024-02-25T00:00:00Z' >= ts + INTERVAL 'P1M' and " +
        """event_type == "view"""", ev))
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
  }

  /** Column-vs-column compare kernel (PhyCompareFilterExpr). */
  def exprCompareCols(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(graft.expr.ExprCompiler.compile("l_discount > l_tax", li))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_discount"), col("l_tax"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** NullExpr kernel (PhyNullExpr, plan.proto:186-194): IS NULL over a
    * JSON path that is absent for some rows.
    */
  def exprNull(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    ev.filter(graft.expr.ExprCompiler.compile(
        """props["k"] is null and event_type == "view"""", ev, jsonColumns = Set("props")))
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
  }

  /** CallExpr registry (FunctionFactory.cpp:64-65 — exactly
    * `empty(varchar)` and `starts_with(varchar, varchar)`).
    */
  def exprCall(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    p.filter(graft.expr.ExprCompiler.compile(
        "starts_with(p_brand, 'Brand#2') and not empty(p_name)", p))
      .select(col("p_partkey"), col("p_brand"), col("p_name"))
      .orderBy(col("p_partkey"))
  }

  /** Bitwise arith-op-eval-range kernels (&, ^, <<, >> —
    * BinaryArithOpEvalRangeExpr, plan.proto:29-42).
    */
  def exprBitwise(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(graft.expr.ExprCompiler.compile(
        "(l_partkey & 7) == 3 and ((l_suppkey >> 2) == 5 or (l_linenumber ^ 1) == 0) " +
          "and (l_linenumber << 1) <= 8", li))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_expr_null" -> (exprNull _),
    "q_expr_call" -> (exprCall _),
    "q_expr_bitwise" -> (exprBitwise _),
    "q_agg_group" -> (aggGroup _),
    "q_count_filter" -> (countFilter _),
    "q_orderby_limit" -> (orderByLimit _),
    "q_topk_cosine" -> (topkCosine _),
    "q_topk_l2" -> (topkL2 _),
    "q_expr_range" -> (exprRange _),
    "q_expr_arith" -> (exprArith _),
    "q_expr_in_like" -> (exprInLike _),
    "q_expr_json" -> (exprJson _),
    "q_expr_ts_arith" -> (exprTsArith _),
    "q_tstz_compare" -> (tstzCompare _),
    "q_time_fields" -> (timeFieldsExtract _),
    "q_orderby_spec" -> (orderBySpec _),
    "q_expr_compare_cols" -> (exprCompareCols _)
  )

  def oracles: Map[String, String] = Map(
    "q_expr_null" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE (props->>'$.k') IS NULL AND event_type = 'view'
        |ORDER BY event_id""".stripMargin,
    "q_expr_call" ->
      """SELECT p_partkey, p_brand, p_name FROM part
        |WHERE p_brand LIKE 'Brand#2%' AND len(p_name) <> 0
        |ORDER BY p_partkey""".stripMargin,
    "q_expr_bitwise" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM lineitem
        |WHERE (l_partkey & 7) = 3
        |  AND ((l_suppkey >> 2) = 5 OR xor(l_linenumber, 1) = 0)
        |  AND (l_linenumber << 1) <= 8
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(min(l_extendedprice), 2) AS min_price,
        | round(max(l_extendedprice), 2) AS max_price,
        | count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_count_filter" ->
      "SELECT count(*) AS cnt FROM lineitem WHERE l_quantity > 30 AND l_discount <= 0.05",
    "q_orderby_limit" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice, o_orderpriority
        |FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY round(o_totalprice, 2) DESC, o_orderkey ASC LIMIT 50""".stripMargin,
    "q_topk_cosine" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id,
        |        round(list_cosine_similarity(q.qvec, CAST(e.embedding AS DOUBLE[])), 4) AS score
        |      FROM q CROSS JOIN embeddings e),
        |r AS (SELECT qid, vec_id, score,
        |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
        |      FROM d)
        |SELECT qid, rank, score, vec_id FROM r WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,
    "q_topk_l2" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id,
        |        round(power(list_distance(q.qvec, CAST(e.embedding AS DOUBLE[])), 2), 4) AS score
        |      FROM q CROSS JOIN embeddings e),
        |r AS (SELECT qid, vec_id, score,
        |        row_number() OVER (PARTITION BY qid ORDER BY score ASC, vec_id) AS rank
        |      FROM d)
        |SELECT qid, rank, score, vec_id FROM r WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,
    "q_expr_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE l_quantity > 30.0 AND l_discount <= 0.05 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_expr_arith" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM lineitem
        |WHERE l_quantity > 10 AND l_quantity <= 20 AND (l_partkey % 10) = 3
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_orderby_spec" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |       ELSE o_orderkey % 5 END AS rank5
        |FROM orders
        |ORDER BY rank5 DESC NULLS FIRST, o_orderkey ASC LIMIT 77""".stripMargin,
    "q_time_fields" ->
      """SELECT event_id, event_type,
        |  year(ts2) || ',' || month(ts2) || ',' || day(ts2) || ',' ||
        |  hour(ts2) || ',' || minute(ts2) || ',' || second(ts2) || ',' ||
        |  (microsecond(ts2) % 1000000) AS ts_parts
        |FROM (SELECT event_id, event_type, ts + INTERVAL 8 HOUR AS ts2
        |      FROM events WHERE event_id % 97 = 0)
        |ORDER BY event_id""".stripMargin,
    "q_expr_in_like" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size
        |FROM part
        |WHERE p_type LIKE '%BRASS%'
        |   OR (p_size IN (5, 10, 15) AND p_brand LIKE 'Brand#1%')
        |ORDER BY p_partkey""".stripMargin,
    "q_expr_json" ->
      """SELECT event_id, user_id, event_type, props
        |FROM events
        |WHERE TRY_CAST(props->>'$.k' AS BIGINT) > 50
        |  AND event_type = 'click' AND (props->>'$.k') IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "q_expr_ts_arith" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate + INTERVAL 30 DAY > TIMESTAMP '1998-09-01 00:00:00'
        |  AND l_linenumber = 1
        |ORDER BY l_orderkey""".stripMargin,
    "q_tstz_compare" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE ts + INTERVAL 3 DAY > TIMESTAMP '2024-01-25 00:00:00'
        |  AND ts + INTERVAL 1 MONTH <= TIMESTAMP '2024-02-25 00:00:00'
        |  AND event_type = 'view'
        |ORDER BY event_id""".stripMargin,
    "q_expr_compare_cols" ->
      """SELECT l_orderkey, l_linenumber, l_discount, l_tax
        |FROM lineitem WHERE l_discount > l_tax
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
