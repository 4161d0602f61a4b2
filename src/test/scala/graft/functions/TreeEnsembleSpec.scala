package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TreeEnsemble._

class TreeEnsembleSpec extends SparkSpec {
  import spark.implicits._

  // two hand-built trees over (price, ctr)
  private val model = Model(Seq(
    Split("price", 50.0,
      left = Split("ctr", 0.1, left = Leaf(-0.2), right = Leaf(0.7)),
      right = Leaf(-0.5)),
    Split("ctr", 0.3, left = Leaf(0.0), right = Leaf(0.4))),
    baseScore = 0.1)

  private def margin(price: java.lang.Double, ctr: java.lang.Double): Double = {
    val t1 =
      if (price == null) { if (ctr != null && ctr >= 0.1) 0.7 else -0.2 } // missing → left
      else if (price < 50) { if (ctr == null || ctr < 0.1) -0.2 else 0.7 }
      else -0.5
    val t2 = if (ctr == null || ctr < 0.3) 0.0 else 0.4
    t1 + t2 + 0.1
  }

  test("compiled ensemble matches hand evaluation incl. missing-value routing") {
    val rows: Seq[(java.lang.Double, java.lang.Double)] = Seq(
      (10.0, 0.5), (10.0, 0.05), (80.0, 0.5), (49.9, 0.3),
      (null, 0.5), (10.0, null), (null, null))
    val df = rows.toDF("price", "ctr")
    val got = df.select(round(rawScore(model), 9).as("m")).as[Double].collect()
    val want = rows.map { case (p, c) => math.round(margin(p, c) * 1e9) / 1e9 }
    assert(got.toList == want.toList)
    // probability is the logistic of the margin
    val p = df.select(probability(model).as("p")).as[Double].collect()
    got.zip(p).foreach { case (m, prob) =>
      assert(math.abs(prob - 1.0 / (1.0 + math.exp(-m))) < 1e-12)
    }
  }

  test("rerank reorders hits by the model and truncates to k") {
    val hits = Seq(
      (0L, 1L, 1L, 10.0, 0.5),  // margin 0.7+0.4+0.1 = 1.2
      (0L, 2L, 2L, 80.0, 0.9),  // -0.5+0.4+0.1 = 0.0
      (0L, 3L, 3L, 10.0, 0.05), // -0.2+0.0+0.1 = -0.1
      (1L, 4L, 1L, 60.0, 0.0)   // -0.5+0.0+0.1 = -0.4
    ).toDF("qid", "id", "rank", "price", "ctr")
    val out = TreeEnsemble.rerank(hits, model, "qid", k = 2)
    val q0 = out.filter($"qid" === 0L).orderBy($"rank")
      .select($"id", $"_rerank").as[(Long, Double)].collect().toList
    assert(q0 == List((1L, 1.2), (2L, 0.0)))
    assert(out.filter($"qid" === 1L).select($"id").as[Long].collect().toList == List(4L))
  }
}
