package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  // 3 groups × 100 values, deterministic
  private lazy val df = spark.range(300)
    .select(
      (col("id") % 3).as("g"),
      col("id").as("tie"),
      ((col("id") * 37 % 101).cast("double")).as("score"))

  private def windowTopK(k: Int, asc: Boolean) = {
    val ord = if (asc) Seq(col("score").asc, col("tie").asc)
              else Seq(col("score").desc, col("tie").asc)
    df.withColumn("rn", row_number().over(Window.partitionBy("g").orderBy(ord: _*)))
      .filter(col("rn") <= k)
      .select(col("g"), col("score"), col("tie"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
  }

  private def aggTopK(k: Int, asc: Boolean, partitions: Int) = {
    df.repartition(partitions)
      .groupBy("g")
      .agg(TopKFunctions.top_k(col("score"), col("tie"),
        struct(col("tie")), k, asc).as("hits"))
      .select(col("g"), explode(col("hits")).as("h"))
      .select(col("g"), col("h.score"), col("h.payload.tie"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
  }

  test("top_k matches window row_number, descending") {
    assert(aggTopK(10, asc = false, partitions = 7) == windowTopK(10, asc = false))
  }

  test("top_k matches window row_number, ascending") {
    assert(aggTopK(10, asc = true, partitions = 7) == windowTopK(10, asc = true))
  }

  test("partition-count invariant (exercises merge + serialize paths)") {
    val single = aggTopK(5, asc = false, partitions = 1)
    val many = aggTopK(5, asc = false, partitions = 13)
    assert(single == many)
  }

  test("k larger than group size returns whole group, ordered best-first") {
    val rows = df.filter(col("g") === 0)
      .groupBy("g")
      .agg(TopKFunctions.top_k(col("score"), col("tie"),
        struct(col("tie")), 1000, ascending = false).as("hits"))
      .select(posexplode(col("hits")).as(Seq("pos", "h")))
      .select(col("pos"), col("h.score"))
      .collect()
    assert(rows.length == 100)
    val scores = rows.sortBy(_.getInt(0)).map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("large topk (reference testcases/large_topk: k = 16384)") {
    // 20 query groups × 5k rows, k far above group size AND at the
    // reference's max topk — exercises heap growth + merge at size
    val big = spark.range(100000)
      .select((col("id") % 20).as("g"), col("id").as("tie"),
        ((col("id") * 131 % 99991).cast("double")).as("score"))
    val counts = big.repartition(16)
      .groupBy("g")
      .agg(TopKFunctions.top_k(col("score"), col("tie"),
        struct(col("tie")), 16384, ascending = true).as("hits"))
      .select(col("g"), size(col("hits")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(counts.size == 20 && counts.values.forall(_ == 5000))
    // and k smaller than the group still truncates correctly at scale
    val k = 4096
    val first = big.repartition(16).groupBy("g")
      .agg(TopKFunctions.top_k(col("score"), col("tie"),
        struct(col("tie")), k, ascending = true).as("hits"),
        min(col("score")).as("true_best"))
      .select(col("g"), size(col("hits")).as("n"),
        element_at(col("hits"), 1).getField("score").as("best"), col("true_best"))
      .collect()
    assert(first.forall(_.getInt(1) == k))
    assert(first.forall(r => r.getDouble(2) == r.getDouble(3))) // heap head = true min
  }

  test("duplicate scores break ties by ascending tie column") {
    val dup = Seq((1L, 5.0, 10L), (1L, 5.0, 3L), (1L, 5.0, 7L)).toDF("g", "score", "tie")
    val got = dup.groupBy("g")
      .agg(TopKFunctions.top_k(col("score"), col("tie"),
        struct(col("tie")), 2, ascending = false).as("hits"))
      .select(explode(col("hits")).as("h")).select(col("h.payload.tie"))
      .as[Long].collect()
    assert(got sameElements Array(3L, 7L))
  }
}
