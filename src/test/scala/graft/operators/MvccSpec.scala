package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MvccSpec extends SparkSpec {
  import spark.implicits._

  // (pk, ts, v): two versions of pk=1, one of pk=2, late row pk=3
  private lazy val data = Seq(
    (1L, 10L, "a1"), (1L, 20L, "a2"), (2L, 15L, "b1"), (3L, 100L, "c1")
  ).toDF("pk", "ts", "v")

  test("visibility: read-ts filters future rows") {
    val got = Mvcc.visible(data, "pk", "ts", lit(50L))
      .select("v").as[String].collect().toSet
    assert(got == Set("a1", "a2", "b1"))
  }

  test("visibility: tombstone hides rows written at or before delete ts") {
    val tombs = Seq((1L, 25L)).toDF("pk", "ts") // delete pk=1 at ts=25
    val got = Mvcc.visible(data, "pk", "ts", lit(50L), Some(tombs))
      .select("v").as[String].collect().toSet
    assert(got == Set("b1"))
  }

  test("visibility: tombstone in the future of read-ts is ignored") {
    val tombs = Seq((1L, 60L)).toDF("pk", "ts")
    val got = Mvcc.visible(data, "pk", "ts", lit(50L), Some(tombs))
      .select("v").as[String].collect().toSet
    assert(got == Set("a1", "a2", "b1"))
  }

  test("visibility: reinsert after delete is visible") {
    val tombs = Seq((1L, 15L)).toDF("pk", "ts") // deletes a1, not a2
    val got = Mvcc.visible(data, "pk", "ts", lit(50L), Some(tombs))
      .select("v").as[String].collect().toSet
    assert(got == Set("a2", "b1"))
  }

  test("TTL expires old rows") {
    val got = Mvcc.visible(data, "pk", "ts", lit(50L), ttl = Some(lit(32L)))
      .select("v").as[String].collect().toSet
    assert(got == Set("a2")) // 20+32>50; 10+32<=50; 15+32<=50
  }

  test("upsert: last writer wins, ties broken by tiebreak column") {
    val base = Seq((1L, 10L, 7L, "old"), (2L, 10L, 8L, "keep")).toDF("pk", "ts", "seq", "v")
    val updates = Seq((1L, 20L, 9L, "new"), (3L, 5L, 10L, "ins")).toDF("pk", "ts", "seq", "v")
    val got = Mvcc.upsert(base, updates, "pk", "ts", "seq")
      .select("pk", "v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "new"), (2L, "keep"), (3L, "ins")))
  }

  test("consistency levels resolve the read timestamp") {
    import ConsistencyLevel._
    val latest = 1000L; val now = 1200L
    assert(Mvcc.resolveReadTs(Strong, latest, now, staleness = 300) == 1000L)
    assert(Mvcc.resolveReadTs(BoundedStaleness, latest, now, staleness = 300) == 900L)
    assert(Mvcc.resolveReadTs(Session, latest, now, staleness = 300,
      sessionTs = 1100L) == 1100L) // session floor wins over staleness
    assert(Mvcc.resolveReadTs(Eventually, latest, now, staleness = 300) == 1200L)
  }

  test("partial upsert with array append/remove field ops") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Seq(
      (1L, 1L, Seq("a", "b"), Seq(1L, 2L), 10.0),
      (2L, 1L, Seq("x"), Seq(9L), 20.0)
    ).toDF("pk", "ts", "tags", "nums", "score")
    val updates = Seq(
      (1L, 2L, Seq("c", "b"), Seq(2L), Option.empty[Double]),
      (3L, 2L, Seq("new"), Seq(7L), Some(30.0)) // no current row: append to empty
    ).toDF("pk", "ts", "tags", "nums", "score")
    val out = Mvcc.partialUpsertOps(base, updates, "pk", "ts", "pk",
        Map("tags" -> Mvcc.ArrayAppend, "nums" -> Mvcc.ArrayRemove,
          "score" -> Mvcc.SetOp))
      .select(col("pk"), col("tags"), col("nums"), col("score"))
      .as[(Long, Seq[String], Seq[Long], Double)].collect().sortBy(_._1)
    assert(out(0) == ((1L, Seq("a", "b", "c", "b"), Seq(1L), 10.0))) // append dups kept; 2 removed; score carried
    assert(out(1) == ((2L, Seq("x"), Seq(9L), 20.0)))                // untouched
    assert(out(2) == ((3L, Seq("new"), Seq(), 30.0)))                // fresh row
  }
}
