package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Collection, CollectionSchema, SparkSpec}

/** Query-aggregation contract (reference proxy/task_query.go +
  * internal/agg + test_query_aggregation.py) — the unit-level pins the
  * q_agg_matrix battery can't express: result dtypes, timestamptz
  * min/max, nulls placement defaults, and the physical plan shape.
  */
class QueryAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val coll: Collection = {
    val df = Seq(
      (1L, Some(10.toShort), 100, 1.5, "b", Some(Timestamp.valueOf("2025-01-01 00:00:00"))),
      (2L, None, 200, 2.5, "a", Some(Timestamp.valueOf("2025-03-01 00:00:00"))),
      (3L, Some(30.toShort), 300, 3.5, "b", None),
      (4L, Some(40.toShort), 400, 4.5, null, Some(Timestamp.valueOf("2024-12-01 00:00:00"))))
      .toDF("id", "c2", "c3", "c4", "c5", "ts")
      .withColumn("c2", col("c2").cast("smallint"))
    val c = Collection.create(spark, CollectionSchema(pkField = "id"))
    c.insert(df)
    c
  }

  test("result dtypes: int sum -> int64, double sum -> double, avg -> double, count -> int64") {
    val r = coll.queryAgg(outputFields =
      Seq("count(*)", "count(c2)", "sum(c2)", "sum(c3)", "sum(c4)", "avg(c2)", "avg(c4)"))
    val s = r.schema
    assert(s("count(*)").dataType == LongType)
    assert(s("count(c2)").dataType == LongType)
    assert(s("sum(c2)").dataType == LongType)   // int16 sum widens to int64
    assert(s("sum(c3)").dataType == LongType)   // int32 sum widens to int64
    assert(s("sum(c4)").dataType == DoubleType) // double sum stays double
    assert(s("avg(c2)").dataType == DoubleType) // avg ALWAYS double
    assert(s("avg(c4)").dataType == DoubleType)
    val row = r.head()
    assert(row.getLong(0) == 4L)   // count(*) counts null rows
    assert(row.getLong(1) == 3L)   // count(c2) excludes the null
    assert(row.getLong(2) == 80L)
    assert(row.getDouble(5) == 80.0 / 3) // avg skips nulls
  }

  test("min/max on varchar and timestamptz; nulls skipped") {
    val r = coll.queryAgg(outputFields =
      Seq("min(c5)", "max(c5)", "min(ts)", "max(ts)")).head()
    assert(r.getString(0) == "a" && r.getString(1) == "b") // null c5 skipped
    assert(r.getTimestamp(2) == Timestamp.valueOf("2024-12-01 00:00:00"))
    assert(r.getTimestamp(3) == Timestamp.valueOf("2025-03-01 00:00:00"))
  }

  test("group by nullable varchar: NULL forms its own group") {
    val rows = coll.queryAgg(outputFields = Seq("c5", "count(*)"),
      groupByFields = Seq("c5")).collect()
    assert(rows.length == 3) // "a", "b", NULL
    assert(rows.find(_.isNullAt(0)).exists(_.getLong(1) == 1L))
  }

  test("order-by defaults follow PostgreSQL nulls placement") {
    // ASC -> NULLS LAST
    val asc = coll.queryAgg(outputFields = Seq("c5"),
      groupByFields = Seq("c5"), orderByFields = Seq("c5")).collect()
    assert(asc.map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq ==
      Seq("a", "b", null))
    // DESC -> NULLS FIRST
    val desc = coll.queryAgg(outputFields = Seq("c5"),
      groupByFields = Seq("c5"), orderByFields = Seq("c5:desc")).collect()
    assert(desc.map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq ==
      Seq(null, "b", "a"))
    // explicit override wins
    val over = coll.queryAgg(outputFields = Seq("c5"),
      groupByFields = Seq("c5"),
      orderByFields = Seq("c5:asc:nulls_first")).collect()
    assert(over.head.isNullAt(0))
  }

  test("timestamptz group-by is supported; float group-by is not") {
    val byTs = coll.queryAgg(outputFields = Seq("ts", "count(*)"),
      groupByFields = Seq("ts")).collect()
    assert(byTs.length == 4) // 3 distinct ts + NULL group
    val e = intercept[IllegalArgumentException](
      coll.queryAgg(outputFields = Seq("count(*)"), groupByFields = Seq("c4")))
    assert(e.getMessage.contains("unsupported data type Double"))
  }

  test("aggregation exempts the empty-filter limit rule; filter composes") {
    // no filter, no limit — legal for aggregation (bounded result)
    assert(coll.queryAgg(outputFields = Seq("count(*)")).head().getLong(0) == 4L)
    // filter applies before aggregation; 3VL excludes the null c2 row
    assert(coll.queryAgg("c2 >= 30", outputFields = Seq("count(*)"))
      .head().getLong(0) == 2L)
  }

  test("plan shape: partial (map-side) aggregation before the shuffle") {
    val plan = coll.queryAgg(outputFields = Seq("c5", "sum(c3)"),
      groupByFields = Seq("c5")).queryExecution.executedPlan.toString
    // two HashAggregate levels around the exchange: partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("matchAgg fuzz: only anchored known-op expressions match") {
    val rnd = new scala.util.Random(42)
    val real = Seq("sum", "count", "avg", "min", "max")
    val fake = Seq("median", "stddev", "mode", "xsum")
    (1 to 2000).foreach { _ =>
      val isReal = rnd.nextBoolean()
      val op0 = if (isReal) real(rnd.nextInt(real.length))
                else fake(rnd.nextInt(fake.length))
      val op = if (rnd.nextBoolean()) op0.toUpperCase else op0
      val pre = if (rnd.nextInt(4) == 0) "x" else ""
      val post = if (rnd.nextInt(4) == 0) " + 1" else ""
      val ws1 = " " * rnd.nextInt(3); val ws2 = " " * rnd.nextInt(3)
      val field = Seq("c2", "*", "", "f_1")(rnd.nextInt(4))
      val s = s"$pre$op$ws1($ws2$field$ws2)$post"
      val shouldMatch = isReal && pre.isEmpty && post.isEmpty
      assert(QueryAgg.matchAgg(s).isDefined == shouldMatch, s)
      if (shouldMatch)
        assert(QueryAgg.matchAgg(s).contains((op0.toLowerCase, field)), s)
    }
  }

  test("the agg expression regex is anchored and whitespace-tolerant") {
    assert(QueryAgg.matchAgg("COUNT( * )").contains(("count", "*")))
    assert(QueryAgg.matchAgg("sum ( c2 )").contains(("sum", "c2")))
    assert(QueryAgg.matchAgg("sum(c2) + 1").isEmpty) // anchored
    assert(QueryAgg.matchAgg("median(c2)").isEmpty)
    assert(QueryAgg.matchAgg("count()").contains(("count", "")))
  }
}
