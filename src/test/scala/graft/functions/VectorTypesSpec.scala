package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{VectorTypes => VT}

class VectorTypesSpec extends SparkSpec {
  import spark.implicits._

  test("fp16 roundtrip is the identity on ALL 65536 half bit patterns") {
    var h = 0
    while (h < 0x10000) {
      val s = h.toShort
      val f = VT.halfToFloat(s)
      if (!f.isNaN) {
        assert(VT.floatToHalf(f) == s,
          f"half bits 0x$h%04x -> $f -> 0x${VT.floatToHalf(f) & 0xffff}%04x")
      } else {
        assert((VT.floatToHalf(f) & 0x7c00) == 0x7c00 && (VT.floatToHalf(f) & 0x3ff) != 0)
      }
      h += 1
    }
  }

  test("fp16 rounds to nearest even and saturates correctly") {
    assert(VT.floatToHalf(1.0f) == 0x3c00.toShort)
    assert(VT.floatToHalf(65504f) == 0x7bff.toShort)      // max finite half
    assert(VT.floatToHalf(65520f) == 0x7c00.toShort)      // rounds to +inf
    assert(VT.floatToHalf(65519.9f) == 0x7bff.toShort)    // just under tie
    assert(VT.floatToHalf(-2.0f) == 0xc000.toShort)
    assert(VT.floatToHalf(0f) == 0)
    assert(VT.floatToHalf(-0f) == 0x8000.toShort)
    // 2^-25 is the tie between 0 and the min subnormal → even (0)
    assert(VT.floatToHalf(math.pow(2, -25).toFloat) == 0)
    assert(VT.floatToHalf(math.pow(2, -24).toFloat) == 1)  // min subnormal
    // 1 + 2^-11 ties between 1.0 and 1+2^-10 → even mantissa (1.0)
    assert(VT.floatToHalf(1f + math.pow(2, -11).toFloat) == 0x3c00.toShort)
    // 1 + 3*2^-11 ties → rounds up to even mantissa 2
    assert(VT.floatToHalf(1f + 3 * math.pow(2, -11).toFloat) == 0x3c02.toShort)
  }

  test("bf16 roundtrip is the identity on all bf16 patterns; RNE on encode") {
    var h = 0
    while (h < 0x10000) {
      val s = h.toShort
      val f = VT.bf16ToFloat(s)
      if (!f.isNaN) assert(VT.floatToBf16(f) == s)
      h += 1
    }
    assert(VT.floatToBf16(1.0f) == 0x3f80.toShort)
    // 1 + 2^-8 ties between 1.0 and 1+2^-7 → even (1.0)
    assert(VT.floatToBf16(1f + math.pow(2, -8).toFloat) == 0x3f80.toShort)
    assert(VT.floatToBf16(1f + 3 * math.pow(2, -8).toFloat) == 0x3f82.toShort)
  }

  test("column codecs roundtrip on real embeddings within precision bounds") {
    val emb = graft.GraftSession.table(spark, sfDir, "embeddings").limit(200)
      .select($"vec_id", $"embedding")
    val rt = emb.select(
        $"embedding",
        VT.fromFp16(VT.fp16($"embedding")).as("fp16rt"),
        VT.fromBf16(VT.bf16($"embedding")).as("bf16rt"))
      .as[(Array[Float], Array[Float], Array[Float])].collect()
    for ((orig, f16, b16) <- rt) {
      assert(f16.length == orig.length && b16.length == orig.length)
      for (i <- orig.indices) {
        val x = orig(i)
        assert(math.abs(f16(i) - x) <= math.max(math.abs(x) * 4.9e-4, 6e-8),
          s"fp16 $x -> ${f16(i)}")
        assert(math.abs(b16(i) - x) <= math.abs(x) * 3.92e-3 + 1e-38,
          s"bf16 $x -> ${b16(i)}")
      }
    }
  }

  test("int8 codec clamps and widens exactly; binary is 1 byte per element") {
    val df = Seq((1L, Seq(0, 127, -128, 300, -300, 5))).toDF("id", "v")
    val enc = df.select(VT.int8($"v").as("b"))
    assert(enc.select(length($"b")).as[Int].head() == 6)
    val dec = enc.select(VT.fromInt8($"b")).as[Seq[Float]].head()
    assert(dec == Seq(0f, 127f, -128f, 127f, -128f, 5f))
  }

  test("fp16-decoded search equals brute force over the decoded corpus") {
    val emb = graft.GraftSession.table(spark, sfDir, "embeddings")
    val corpus = emb.select($"vec_id", VT.fromFp16(VT.fp16($"embedding")).as("vec"))
    val qs = corpus.filter($"vec_id" === 7).select($"vec_id".as("qid"), $"vec".as("qvec"))
    val got = graft.operators.VectorSearch.topK(
        corpus, "vec_id", "vec", qs, "qid", "qvec", Metric.L2, k = 5)
      .select($"vec_id").as[Long].collect().toSeq
    // reference result computed driver-side on the same decoded values
    val all = corpus.as[(Long, Array[Float])].collect()
    val q = all.find(_._1 == 7L).get._2
    val expect = all.map { case (id, v) =>
      (id, v.zip(q).map { case (a, b) => (a - b).toDouble * (a - b) }.sum)
    }.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSeq
    assert(got == expect)
  }
}
