package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IVF_RABITQ contract (reference client ivf.go:140-178; algorithm from
  * the public RaBitQ paper): estimator quality at a partial shortlist,
  * multi-bit codes, the rbq_bits range error, and rotation sanity.
  */
class RabitqIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = {
    val rnd = new scala.util.Random(7)
    (0L until 400L).map(i =>
      (i, Seq.fill(24)(rnd.nextGaussian().toFloat))).toDF("id", "vec")
  }

  private def bruteTop(qs: Seq[(Long, Array[Float])], k: Int): Map[Long, Set[Long]] = {
    val rows = corpus.as[(Long, Seq[Float])].collect()
    qs.map { case (qid, q) =>
      qid -> rows.map { case (id, v) =>
        (id, v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.sortBy(_._2).take(k).map(_._1).toSet
    }.toMap
  }

  private def queriesOf(n: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(13)
    (0 until n).map(i => (i.toLong, Array.fill(24)(rnd.nextGaussian().toFloat)))
  }

  test("exhaustive probes + corpus shortlist reproduce brute force exactly") {
    val model = RabitqIndex.train(corpus, "vec", nlist = 4, bits = 1)
    val encoded = RabitqIndex.layout(corpus, "vec", model)
    val qs = queriesOf(3)
    val got = RabitqIndex.search(encoded, "id", "vec", model, qs,
      k = 10, nprobe = 4, shortlist = 400)
      .select("qid", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got == bruteTop(qs, 10))
  }

  test("1-bit estimator ranks a 4x shortlist with high recall") {
    val model = RabitqIndex.train(corpus, "vec", nlist = 1, bits = 1)
    val encoded = RabitqIndex.layout(corpus, "vec", model)
    val qs = queriesOf(8)
    val brute = bruteTop(qs, 10)
    val got = RabitqIndex.search(encoded, "id", "vec", model, qs,
      k = 10, nprobe = 1, shortlist = 40)
      .select("qid", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = qs.map { case (qid, _) =>
      (got(qid) intersect brute(qid)).size.toDouble / 10.0
    }.sum / qs.size
    assert(recall >= 0.8, s"1-bit recall@10 with 4x shortlist: $recall")
  }

  test("more bits estimate better: bits=5 recall >= bits=1 recall at a tight shortlist") {
    val qs = queriesOf(8)
    val brute = bruteTop(qs, 10)
    def recallAt(bits: Int): Double = {
      val model = RabitqIndex.train(corpus, "vec", nlist = 1, bits = bits)
      val encoded = RabitqIndex.layout(corpus, "vec", model)
      val got = RabitqIndex.search(encoded, "id", "vec", model, qs,
        k = 10, nprobe = 1, shortlist = 15)
        .select("qid", "id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      qs.map { case (qid, _) =>
        (got(qid) intersect brute(qid)).size.toDouble / 10.0
      }.sum / qs.size
    }
    val r1 = recallAt(1)
    val r5 = recallAt(5)
    assert(r5 >= r1, s"bits=5 recall $r5 < bits=1 recall $r1")
    assert(r5 >= 0.85, s"bits=5 recall@10 with 1.5x shortlist: $r5")
  }

  test("rbq_bits outside [1, 9] is an error, not a silent default") {
    val e1 = intercept[IllegalArgumentException](
      RabitqIndex.train(corpus, "vec", nlist = 2, bits = 0))
    assert(e1.getMessage.contains("should be in range [1, 9]"))
    val e2 = intercept[IllegalArgumentException](
      RabitqIndex.train(corpus, "vec", nlist = 2, bits = 10))
    assert(e2.getMessage.contains("should be in range [1, 9]"))
  }

  test("the seeded rotation is orthonormal and deterministic") {
    val p = RabitqIndex.randomRotation(16, seed = 42L)
    val q = RabitqIndex.randomRotation(16, seed = 42L)
    assert(p.flatten.toSeq == q.flatten.toSeq) // deterministic
    for (i <- 0 until 16; j <- i until 16) {
      val dot = (0 until 16).map(k => p(i)(k).toDouble * p(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-4, s"row $i · row $j = $dot")
    }
  }
}
