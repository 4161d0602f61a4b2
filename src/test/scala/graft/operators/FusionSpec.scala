package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FusionSpec extends SparkSpec {
  import spark.implicits._

  // two ranked lists shaped like VectorSearch.topK output
  private lazy val listA = Seq((0L, 10L, 1L, 0.9), (0L, 11L, 2L, 0.8), (0L, 12L, 3L, 0.7))
    .toDF("qid", "id", "rank", "_score")
  private lazy val listB = Seq((0L, 12L, 1L, 0.95), (0L, 10L, 2L, 0.5))
    .toDF("qid", "id", "rank", "_score")

  test("identical sub-requests dedup to one representative with multiplicity") {
    // a semantically identical but differently-constructed copy of listA
    val listA2 = listA.filter(lit(true))
    val (reps, mapping) = Fusion.dedupIdentical(Seq(listA, listA2, listB))
    assert(reps.length == 2 && mapping == Seq(0, 0, 1))
  }

  test("rrf with duplicated sub-request equals rrf over explicit copies") {
    def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.select(col("id"), col("_score")).collect()
        .map(r => r.getLong(0) -> (math.rint(r.getDouble(1) * 1e9) / 1e9)).toMap
    // multiplicity arithmetic: dedup path must equal the naive union of
    // the duplicate inputs
    val naive = {
      val unioned = Seq(listA, listA, listB)
        .map(df => df.select(col("qid"), col("id"),
          (lit(1.0) / (lit(60.0) + col("rank"))).as("_partial")))
        .reduce(_ unionAll _)
        .groupBy(col("qid"), col("id")).agg(sum(col("_partial")).as("_score"))
      unioned
    }
    val fused = Fusion.rrf(Seq(listA, listA, listB), "qid", "id", topK = 10)
    assert(scores(fused) == scores(naive))
  }
}
