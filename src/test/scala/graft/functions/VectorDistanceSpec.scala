package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorDistanceSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Array(1.0f, 2.0f), Array(3.0f, 5.0f)),
    (Array(0.0f, 0.0f), Array(1.0f, 1.0f)),
    (Array(1.0f, 0.0f), Array(1.0f, 0.0f))
  ).toDF("a", "b")

  test("l2 = squared euclidean") {
    val got = df.select(VectorFunctions.l2($"a", $"b")).as[Double].collect()
    assert(got sameElements Array(13.0, 2.0, 0.0))
  }

  test("ip = dot product") {
    val got = df.select(VectorFunctions.ip($"a", $"b")).as[Double].collect()
    assert(got sameElements Array(13.0, 0.0, 1.0))
  }

  test("cosine similarity, zero-norm safe") {
    val got = df.select(VectorFunctions.cosine($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0) - 13.0 / math.sqrt(5.0 * 34.0)) < 1e-12)
    assert(got(1) == 0.0) // zero vector → 0, not NaN
    assert(got(2) == 1.0)
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.InternalRow
    val pairs = Seq(
      (Array(1.0f, 2.0f), Array(3.0f, 5.0f)),
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)))
    val codegen = df.limit(0) // schema only
    for (m <- Seq(Metric.L2, Metric.IP, Metric.COSINE); (a, b) <- pairs) {
      val e = VectorDistance(Literal(a), Literal(b), m)
      val interpreted = e.eval(InternalRow.empty).asInstanceOf[Double]
      val viaDf = Seq((a, b)).toDF("a", "b")
        .select(VectorFunctions.distance($"a", $"b", m)).as[Double].head()
      assert(math.abs(interpreted - viaDf) < 1e-12, s"$m $interpreted vs $viaDf")
    }
    assert(codegen.count() == 0)
  }

  test("null inputs → null") {
    val withNull = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    val got = withNull.select(VectorFunctions.ip($"a", $"b")).collect()
    assert(got(0).isNullAt(0))
  }

  test("SQL registration works") {
    VectorFunctions.register(spark)
    df.createOrReplaceTempView("vd_test")
    val got = spark.sql("SELECT vec_ip(a, b) FROM vd_test").as[Double].collect()
    assert(got sameElements Array(13.0, 0.0, 1.0))
  }
}
