package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The generated-code paths of the centroid-assignment expressions must
  * agree bit-for-bit with their interpreted nullSafeEval — these run on
  * every corpus row during index builds, so a codegen/interpreted drift
  * would silently mis-assign clusters at scale while every unit test of
  * the interpreted path stays green.
  */
class AssignCodegenSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(11L)
  private val dim = 16
  private lazy val vecs = (0L until 300L)
    .map(i => (i, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))

  test("ivf_assign codegen equals interpreted (nprobe = 1)") {
    val model = IvfIndex.Model(
      Array.fill(7)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f)), 7)
    val df = vecs.toDF("id", "vec")
    val got = df.select(col("id"), IvfIndex.assign(model, col("vec")).as("c"))
      .as[(Long, Int)].collect().toMap
    // interpreted oracle: direct nullSafeEval over driver rows
    vecs.foreach { case (id, v) =>
      val want = model.centroids.indices.minBy { c =>
        v.indices.map(j => { val d = (v(j) - model.centroids(c)(j)).toDouble; d * d }).sum
      }
      assert(got(id) == want, s"id=$id")
    }
  }

  test("scann_assign codegen equals interpreted") {
    val centroids = Array.fill(9)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val eta = 3.0
    val model = ScannIndex.Model(Array(centroids), dim, eta)
    val df = vecs.toDF("id", "vec")
    val got = df.select(col("id"),
        ScannIndex.encode(model, col("vec")).getItem(0).as("c"))
      .as[(Long, Int)].collect().toMap
    def loss(x: Array[Float], c: Array[Float]): Double = {
      var rr = 0.0; var rx = 0.0; var xx = 0.0
      x.indices.foreach { j =>
        val r = (x(j) - c(j)).toDouble
        rr += r * r; rx += r * x(j); xx += x(j).toDouble * x(j)
      }
      if (xx == 0) rr else rr + (eta - 1.0) * rx * rx / xx
    }
    vecs.foreach { case (id, v) =>
      val want = centroids.indices.minBy(c => loss(v, centroids(c)))
      assert(got(id) == want, s"id=$id")
    }
  }

  test("bin_ivf_assign codegen equals interpreted (nprobe = 1)") {
    val words = 3
    val packed = (0L until 200L)
      .map(i => (i, Array.fill(words)(rnd.nextLong())))
    val centroids = Array.fill(5)(Array.fill(words)(rnd.nextLong()))
    val df = packed.toDF("id", "bits")
    val assigned = org.apache.spark.sql.graft.ColumnBridge.column(
      NearestBinaryCentroids(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("bits")),
        centroids, 1))
    val got = df.select(col("id"), assigned.as("c"))
      .as[(Long, Int)].collect().toMap
    packed.foreach { case (id, bits) =>
      val want = centroids.indices.minBy { c =>
        bits.indices.map(i =>
          java.lang.Long.bitCount(bits(i) ^ centroids(c)(i))).sum
      }
      assert(got(id) == want, s"id=$id")
    }
  }
}
