package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class JsonShredSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 40L).map { i =>
    val rare = if (i % 8 == 0) s""","rare":${i * 10}""" else ""
    val nested = s""","meta":{"depth":${i % 3}}"""
    (i, s"""{"k":$i,"name":"doc$i"$nested$rare}""")
  }.toDF("id", "doc")

  test("analyze shreds frequent typed paths and skips rare ones") {
    val m = JsonShred.analyze(docs, "doc", minFreq = 0.5, maxPaths = 8)
    val byPath = m.paths.map(p => p.path -> p).toMap
    assert(byPath.contains("k") && byPath("k").dataType == LongType)
    assert(byPath.contains("name") && byPath("name").dataType == StringType)
    assert(byPath.contains("meta.depth"), "nested scalar leaves shred too")
    assert(!byPath.contains("rare"), "a 12.5%-present path stays fallback")
    assert(byPath("k").freq == 1.0)
  }

  test("shredded probe equals fallback evaluation, nested paths included") {
    val m = JsonShred.analyze(docs, "doc", minFreq = 0.5, maxPaths = 8)
    val dir = Files.createTempDirectory("graft_jsonshred_").toString
    JsonShred.write(docs, m, dir, numPartitions = 2)
    val idx = JsonShred.load(spark, dir)
    // shredded route
    val viaShred = idx.filter(JsonShred.pathCol(m, "k", LongType).between(5, 15) &&
        JsonShred.pathCol(m, "meta.depth", LongType) === 1)
      .select($"id").as[Long].collect().sorted.toSeq
    // ground truth straight off the raw JSON
    val direct = docs.filter(
        get_json_object($"doc", "$.k").cast("long").between(5, 15) &&
        get_json_object($"doc", "$.meta.depth").cast("long") === 1)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(viaShred == direct && viaShred.nonEmpty)
    // fallback route (rare path is not in the manifest)
    val viaFallback = idx.filter(JsonShred.pathCol(m, "rare", LongType) >= 100)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(viaFallback == Seq(16L, 24L, 32L))
  }

  test("shredded path filters reach the parquet scan as pushed filters") {
    val m = JsonShred.analyze(docs, "doc", minFreq = 0.5, maxPaths = 8)
    val dir = Files.createTempDirectory("graft_jsonshred_push_").toString
    JsonShred.write(docs, m, dir, numPartitions = 2)
    val plan = JsonShred.load(spark, dir)
      .filter(JsonShred.pathCol(m, "k", LongType) === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains(JsonShred.shredColName("k")),
      s"expected a pushed filter on the shredded column, got:\n$plan")
  }

  test("empty manifest (no shreddable paths) degrades to pure fallback") {
    val weird = Seq((1L, """{"arr":[1,2,3]}"""), (2L, """{"arr":[]}"""))
      .toDF("id", "doc")
    val m = JsonShred.analyze(weird, "doc")
    assert(m.paths.isEmpty)
    assert(JsonShred.shred(weird, m).columns.toSeq == Seq("id", "doc"))
    val ids = weird.filter(JsonShred.pathCol(m, "arr[0]", LongType) === 1L)
      .select($"id").as[Long].collect().toSeq
    assert(ids == Seq(1L))
  }
}
