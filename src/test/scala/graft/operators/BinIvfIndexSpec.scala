package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BinaryVector

class BinIvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.GraftSession.table(spark, sfDir, "embeddings")
    .withColumn("_bin", BinaryVector.binarize(col("embedding")))

  test("binary k-majority training is deterministic") {
    val m1 = BinIvfIndex.train(emb, "_bin", nlist = 8, nbits = 64)
    val m2 = BinIvfIndex.train(emb, "_bin", nlist = 8, nbits = 64)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
  }

  test("declared nbits must match the packed width; probe width must match the codebook") {
    val e = intercept[IllegalArgumentException] {
      BinIvfIndex.train(emb, "_bin", nlist = 8, nbits = 128)
    }
    assert(e.getMessage.contains("bits"))
    val model = BinIvfIndex.train(emb, "_bin", nlist = 8, nbits = 64)
    val wide = emb.withColumn("_bin2", concat(col("_bin"), col("_bin")))
    val err = intercept[Exception] {
      wide.select(BinIvfIndex.assign(model, col("_bin2"))).collect()
    }
    assert(err.getMessage != null)
  }

  test("exhaustive probes equal brute-force hamming; pruned probes keep recall") {
    val model = BinIvfIndex.train(emb, "_bin", nlist = 8, nbits = 64)
    val clustered = BinIvfIndex.layout(emb, "_bin", model)
    val q = emb.filter($"vec_id" === 4).select($"vec_id".as("qid"), $"_bin".as("_qbin"))

    val brute = emb.crossJoin(broadcast(q))
      .withColumn("_score", BinaryVector.hamming($"_bin", $"_qbin").cast("double"))
    val exact = VectorSearch
      .reduceTopK(brute, "vec_id", "qid", graft.functions.Metric.L2, 10, Seq("vec_id"))
      .select($"vec_id").as[Long].collect().toSeq

    val full = BinIvfIndex.search(clustered, "vec_id", "_bin", model, q, "qid", "_qbin",
        k = 10, nprobe = model.nlist)
      .select($"vec_id").as[Long].collect().toSeq
    assert(full == exact)

    val pruned = BinIvfIndex.search(clustered, "vec_id", "_bin", model, q, "qid", "_qbin",
        k = 10, nprobe = 3)
      .select($"vec_id").as[Long].collect().toSet
    assert(pruned.intersect(exact.toSet).size >= 6,
      s"nprobe=3 recall too low: ${pruned.intersect(exact.toSet).size}/10")
  }
}
