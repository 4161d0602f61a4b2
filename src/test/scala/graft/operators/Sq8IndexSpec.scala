package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Metric

class Sq8IndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.GraftSession.table(spark, sfDir, "embeddings")
  private lazy val model = Sq8Index.train(emb, "embedding")

  test("sq8 roundtrip error is bounded by half a quantization step per dim") {
    val rt = emb.limit(100)
      .select($"embedding", Sq8Index.decode(model, Sq8Index.encode(model, $"embedding")).as("rt"))
      .as[(Array[Float], Array[Float])].collect()
    for ((orig, dec) <- rt; i <- orig.indices) {
      val step = model.diffs(i) / 255.0f
      assert(math.abs(dec(i) - orig(i)) <= step / 2 + 1e-6,
        s"dim $i: ${orig(i)} -> ${dec(i)} step=$step")
    }
  }

  test("sq8 refine with shortlist = corpus equals brute-force L2") {
    val encoded = emb.withColumn("codes", Sq8Index.encode(model, $"embedding"))
    val q = emb.filter($"vec_id" === 2)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].head()
    val n = emb.count().toInt
    val refined = Sq8Index.searchRefined(encoded, "vec_id", "codes", "embedding",
        model, Seq((q._1, q._2)), k = 10, shortlist = n)
      .select($"vec_id").as[Long].collect().toSeq
    val exact = VectorSearch.topK(emb, "vec_id", "embedding",
        Seq((2L, q._2.toSeq)).toDF("qid", "qvec"), "qid", "qvec", Metric.L2, k = 10)
      .select($"vec_id").as[Long].collect().toSeq
    assert(refined == exact)
  }

  test("sq8 approximate shortlist has high recall at modest multiplier") {
    val encoded = emb.withColumn("codes", Sq8Index.encode(model, $"embedding"))
    val q = emb.filter($"vec_id" === 5)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].head()
    val refined = Sq8Index.searchRefined(encoded, "vec_id", "codes", "embedding",
        model, Seq((q._1, q._2)), k = 10, shortlist = 30)
      .select($"vec_id").as[Long].collect().toSet
    val exact = VectorSearch.topK(emb, "vec_id", "embedding",
        Seq((5L, q._2.toSeq)).toDF("qid", "qvec"), "qid", "qvec", Metric.L2, k = 10)
      .select($"vec_id").as[Long].collect().toSet
    assert(refined.intersect(exact).size >= 9,
      s"recall@10 too low: ${refined.intersect(exact).size}/10")
  }
}
