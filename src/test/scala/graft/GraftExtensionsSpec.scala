package graft

import org.apache.spark.sql.functions._

import graft.functions.{Metric, TextFunctions, VectorFunctions, VectorTypes}
import graft.operators.Dedup

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL functions registered via extensions match the Column API") {
    Seq((1L, Seq(1f, 2f, 3f), Seq(3f, 2f, 1f), "a b c a"))
      .toDF("id", "va", "vb", "text")
      .createOrReplaceTempView("ext_t")

    val sql = spark.sql(
      """SELECT
        |  vector_distance(va, vb, 'L2') AS l2,
        |  vector_distance(va, vb, 'COSINE') AS cos,
        |  simhash60(split(text, ' ')) AS sim,
        |  minhash_signature(split(text, ' '), 16, 2) AS mh,
        |  int8_decode(int8_encode(array(1, 200, -5))) AS i8,
        |  fp16_decode(fp16_encode(va)) AS f16,
        |  token_shingles(split(text, ' '), 2, true) AS sh
        |FROM ext_t""".stripMargin).head()

    val viaCols = spark.table("ext_t").select(
      VectorFunctions.distance(col("va"), col("vb"), Metric.L2).as("l2"),
      VectorFunctions.distance(col("va"), col("vb"), Metric.COSINE).as("cos"),
      Dedup.simhash60(split(col("text"), " ")).as("sim"),
      TextFunctions.minhashSignature(split(col("text"), " "), 16, 2).as("mh"),
      VectorTypes.fromInt8(VectorTypes.int8(array(lit(1), lit(200), lit(-5)))).as("i8"),
      VectorTypes.fromFp16(VectorTypes.fp16(col("va"))).as("f16"),
      TextFunctions.shingleSet(split(col("text"), " "), 2).as("sh")).head()

    assert(sql.getDouble(0) == viaCols.getDouble(0))
    assert(sql.getDouble(1) == viaCols.getDouble(1))
    assert(sql.getLong(2) == viaCols.getLong(2))
    assert(sql.getSeq[Long](3) == viaCols.getSeq[Long](3))
    assert(sql.getSeq[Float](4) == Seq(1f, 127f, -5f))
    assert(sql.getSeq[Float](5) == viaCols.getSeq[Float](5))
    assert(sql.getSeq[String](6) == viaCols.getSeq[String](6))
    assert(sql.getSeq[String](6) == Seq("a b", "b c", "c a"))
  }

  test("non-literal metric / wrong arity fail fast") {
    Seq((Seq(1f), Seq(1f), "x")).toDF("a", "b", "m").createOrReplaceTempView("ext_bad")
    intercept[Exception] {
      spark.sql("SELECT vector_distance(a, b, m) FROM ext_bad").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT simhash60(a, b) FROM ext_bad").collect()
    }
  }
}
