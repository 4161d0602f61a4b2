package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{Metric, VectorFunctions}

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  test("PQ encode/ADC search recalls exact L2 neighbors") {
    val emb = graft.GraftSession.table(spark, "/root/testdata/sf0.001", "embeddings")
    // random synthetic vectors are PQ's worst case — use fine subspaces
    val model = PqIndex.train(emb, "embedding", m = 16, k = 32, dim = 64)
    assert(model.codebooks.length == 16 && model.codebooks.head.length == 32)

    val encoded = emb.withColumn("codes", PqIndex.encode(model, col("embedding")))
    // codes are within range and deterministic
    val maxCode = encoded.select(max(array_max(col("codes")))).as[Int].head()
    assert(maxCode < 32)

    val q = emb.filter($"vec_id" === 0)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].head()
    val approx = PqIndex.search(encoded, "vec_id", "codes", model,
        Seq((q._1, q._2)), k = 10)
      .select($"vec_id").as[Long].collect().toSet

    val exact = VectorSearch.topK(emb, "vec_id", "embedding",
        Seq((0L, q._2.toSeq)).toDF("qid", "qvec"), "qid", "qvec",
        Metric.L2, k = 10)
      .select($"vec_id").as[Long].collect().toSet

    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.2, s"raw ADC recall@10 too low: $recall") // coarse on random data
    assert(approx.contains(0L)) // the query vector itself must be found

    // ADC shortlist + exact refine recovers near-exact results
    val encodedWithVec = emb.withColumn("codes", PqIndex.encode(model, col("embedding")))
    val refined = PqIndex.searchRefined(encodedWithVec, "vec_id", "codes",
        "embedding", model, Seq((q._1, q._2)), k = 10, shortlist = 150)
      .select($"vec_id").as[Long].collect().toSet
    val refinedRecall = refined.intersect(exact).size.toDouble / exact.size
    assert(refinedRecall >= 0.9, s"refined recall@10 too low: $refinedRecall")
  }

  test("trainLocal codebooks are deterministic and exact under full refine") {
    val emb = graft.GraftSession.table(spark, "/root/testdata/sf0.001", "embeddings")
    val m1 = PqIndex.trainLocal(emb, "embedding", m = 8, k = 16, dim = 64)
    val m2 = PqIndex.trainLocal(emb, "embedding", m = 8, k = 16, dim = 64)
    assert(m1.codebooks.flatten.flatten.toSeq == m2.codebooks.flatten.flatten.toSeq,
      "seeded local training must be deterministic")

    val encoded = emb.withColumn("codes", PqIndex.encode(m1, col("embedding")))
    val q = emb.filter($"vec_id" === 1)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].head()
    val n = emb.count().toInt
    // shortlist = corpus ⇒ output equals brute-force L2 for ANY codebook
    val refined = PqIndex.searchRefined(encoded, "vec_id", "codes", "embedding",
        m1, Seq((q._1, q._2)), k = 10, shortlist = n)
      .select($"vec_id").as[Long].collect().toSet
    val exact = VectorSearch.topK(emb, "vec_id", "embedding",
        Seq((1L, q._2.toSeq)).toDF("qid", "qvec"), "qid", "qvec",
        Metric.L2, k = 10)
      .select($"vec_id").as[Long].collect().toSet
    assert(refined == exact)
  }
}
