package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Collection, CollectionSchema, SparkSpec}

/** `time_fields` extraction contract (reference proxy/util.go:3405-3483,
  * TimefieldsKey proxy/task.go:80, request `timezone` param
  * task_query.go:107; test_milvus_client_timestamptz.py:536): every
  * timestamptz OUTPUT column becomes array<int64> of the requested
  * wall-clock components in the request timezone.
  */
class TimeFieldsSpec extends SparkSpec {
  import spark.implicits._

  private def mkColl(): Collection = {
    val df = Seq(
      (1L, Timestamp.valueOf("2025-06-15 23:30:45.123456"), "a"),
      (2L, Timestamp.valueOf("2024-12-31 20:00:00.000001"), "b"))
      .toDF("id", "when", "tag")
    val c = Collection.create(spark, CollectionSchema(pkField = "id"))
    c.insert(df)
    c
  }

  test("timestamptz output becomes array<int64> in request order; others untouched") {
    val r = mkColl().query("id >= 1", Seq("id", "when", "tag"),
      timeFields = Seq("year", "month", "day", "hour", "minute", "second",
        "microsecond"))
    assert(r.schema("when").dataType == ArrayType(LongType, containsNull = true))
    assert(r.schema("tag").dataType == StringType)
    val row = r.orderBy(col("id")).head()
    // session tz is UTC; Timestamp.valueOf parses in JVM-default (UTC in
    // the test env) — components echo the literal
    assert(row.getSeq[Long](1) == Seq(2025L, 6L, 15L, 23L, 30L, 45L, 123456L))
  }

  test("request timezone shifts the wall clock (Asia/Shanghai = UTC+8)") {
    val r = mkColl().query("id == 1", Seq("id", "when"),
      timeFields = Seq("year", "month", "day", "hour"),
      timezone = Some("Asia/Shanghai")).head()
    // 2025-06-15T23:30Z + 8h = 2025-06-16T07:30 local
    assert(r.getSeq[Long](1) == Seq(2025L, 6L, 16L, 7L))
  }

  test("component subset and ordering are caller-controlled; names case-insensitive") {
    val r = mkColl().query("id == 2", Seq("when"),
      timeFields = Seq("Second", "YEAR", "microsecond")).head()
    assert(r.getSeq[Long](0) == Seq(0L, 2024L, 1L))
  }

  test("named errors: unknown component, invalid timezone") {
    val c = mkColl()
    val e1 = intercept[IllegalArgumentException](
      c.query("id == 1", Seq("when"), timeFields = Seq("millennium")))
    assert(e1.getMessage.contains("unsupported field for extraction: millennium"))
    val e2 = intercept[IllegalArgumentException](
      c.query("id == 1", Seq("when"), timeFields = Seq("year"),
        timezone = Some("Not/AZone")))
    assert(e2.getMessage.contains("got invalid timezone: Not/AZone"))
  }

  test("search results take the same extraction") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), Timestamp.valueOf("2025-01-02 03:04:05.0")),
      (2L, Seq(0.0f, 1.0f), Timestamp.valueOf("2025-02-03 04:05:06.0")))
      .toDF("id", "vec", "when")
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      vectorFields = Map("vec" -> 2)))
    c.insert(df)
    val q = Seq((0L, Seq(1.0f, 0.0f))).toDF("qid", "qvec")
    val hits = c.search("vec", q, k = 1,
      outputFields = Seq("id", "when"),
      timeFields = Seq("year", "month", "day"))
    val row = hits.head()
    assert(hits.schema("when").dataType == ArrayType(LongType, containsNull = true))
    assert(row.getAs[scala.collection.Seq[Long]]("when").toSeq ==
      Seq(2025L, 1L, 2L))
  }

  test("request timezone also drives NAIVE literal parsing in filters") {
    // ts domain: epoch-nanos long (GraftSession convention)
    val df = Seq(
      (1L, java.time.Instant.parse("2025-01-01T06:00:00Z")),
      (2L, java.time.Instant.parse("2025-01-01T18:00:00Z")))
      .map { case (id, i) => (id, i.toEpochMilli * 1000000L) }
      .toDF("id", "ts")
    val c = Collection.create(spark, CollectionSchema(pkField = "id"))
    c.insert(df)
    // naive 2025-01-01T12:00:00 in Asia/Shanghai = 04:00Z -> both rows
    val sh = c.query("ts >= iso'2025-01-01T12:00:00'", Seq("id"),
      timezone = Some("Asia/Shanghai")).count()
    assert(sh == 2L)
    // the same literal in UTC = 12:00Z -> only the 18:00Z row
    val utc = c.query("ts >= iso'2025-01-01T12:00:00'", Seq("id"),
      timezone = Some("UTC")).count()
    assert(utc == 1L)
  }

  test("collection timezone property is the fallback; request param wins") {
    val c = mkColl()
    c.alterCollection(Map("timezone" -> "Asia/Shanghai"))
    val viaProp = c.query("id == 1", Seq("when"),
      timeFields = Seq("hour")).head()
    assert(viaProp.getSeq[Long](0) == Seq(7L)) // 23:30Z + 8h
    val viaReq = c.query("id == 1", Seq("when"),
      timeFields = Seq("hour"), timezone = Some("UTC")).head()
    assert(viaReq.getSeq[Long](0) == Seq(23L))
  }
}
