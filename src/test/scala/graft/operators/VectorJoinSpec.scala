package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Metric

class VectorJoinSpec extends SparkSpec {
  import spark.implicits._

  // V: 20 vectors carrying join_key = id; S: metadata for even ids only
  private lazy val v = spark.range(20)
    .select(col("id"),
      array((0 until 3).map(d => (pmod(col("id") * (d + 2), lit(23)) / lit(23.0))
        .cast("float")): _*).as("vec"))
    .cache()
  private lazy val s_ = (0L until 20L by 2)
    .map(i => (i, i * 10.0, i % 4 == 0)).toDF("item_id", "price", "active")
  private lazy val qs = v.filter($"id" === 5).select(lit(0L).as("qid"), $"vec".as("qvec"))

  test("enrichment join is LEFT OUTER: hits with no metadata survive with nulls") {
    val hits = VectorSearch.topK(v, "id", "vec", qs, "qid", "qvec", Metric.L2, 6)
    val enriched = VectorJoin.enrich(hits, "id",
      s_.withColumnRenamed("item_id", "id"), Seq("price"))
    assert(enriched.count() == 6)
    val (withMeta, without) = enriched.select($"id", $"price")
      .collect().partition(!_.isNullAt(1))
    assert(withMeta.forall(_.getLong(0) % 2 == 0)) // evens have metadata
    assert(without.forall(_.getLong(0) % 2 == 1))  // odds survive with null
    // inner variant drops them
    assert(VectorJoin.enrich(hits, "id",
      s_.withColumnRenamed("item_id", "id"), Seq("price"), leftOuter = false)
      .collect().forall(_.getAs[Long]("id") % 2 == 0))
  }

  test("semi pre-filter restricts the ANN corpus to qualified keys") {
    val restricted = VectorJoin.semiPrefilter(v, "id", s_, "item_id", $"active")
    val hits = VectorSearch.topK(restricted, "id", "vec", qs, "qid", "qvec",
      Metric.L2, 20)
    val ids = hits.select($"id").as[Long].collect().toSet
    assert(ids == (0L until 20L by 4).toSet) // active ⇔ id % 4 == 0
  }

  test("lateral search: one batched ANN per driver row, missing anchors drop") {
    val driver = s_.filter($"price" >= 100) // item_id 10..18 (5 rows)
      .withColumn("anchor", $"item_id")
    val res = VectorJoin.lateralSearch(driver, "item_id", "anchor",
      v, "id", "vec", Metric.L2, k = 2)
    val byDriver = res.groupBy($"qid").count().as[(Long, Long)].collect().toMap
    assert(byDriver.keySet == Set(10L, 12L, 14L, 16L, 18L))
    assert(byDriver.values.forall(_ == 2))
    // rank 1 per driver is the anchor itself (distance 0)
    val r1 = res.filter($"rank" === 1).select($"qid", $"id").as[(Long, Long)].collect()
    assert(r1.forall(p => p._1 == p._2))
    // absent anchor = KV miss: a driver keyed past the corpus drops out
    val ghost = Seq((99L, 99L)).toDF("item_id", "anchor")
    assert(VectorJoin.lateralSearch(ghost, "item_id", "anchor",
      v, "id", "vec", Metric.L2, k = 2).count() == 0)
  }

  test("lateral guardrail: exceeding the driver cap is an explicit error") {
    val big = spark.range(100).select($"id".as("item_id"), $"id".as("anchor"))
    intercept[IllegalArgumentException] {
      VectorJoin.lateralSearch(big, "item_id", "anchor", v, "id", "vec",
        Metric.L2, k = 1, maxDriverRows = 50)
    }
  }
}
