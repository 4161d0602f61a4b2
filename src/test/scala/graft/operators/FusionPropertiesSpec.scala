package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.Metric

/** ScalaCheck-generated invariants for the fusion/reduce layer (SURVEY
  * §5: rank monotonicity, pk dedup, RRF commutativity). Fixtures are
  * generated, the properties are exact.
  */
class FusionPropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** A ranked result list: (qid, id, rank, _score), ranks 1..n per qid. */
  private val listGen: Gen[Seq[(Long, Long, Long, Double)]] = for {
    nq <- Gen.choose(1, 3)
    perQ <- Gen.choose(1, 12)
    ids <- Gen.listOfN(nq * perQ, Gen.choose(0L, 40L))
  } yield {
    for {
      q <- 0 until nq
      (id, r) <- ids.slice(q * perQ, (q + 1) * perQ).distinct.zipWithIndex
    } yield (q.toLong, id, (r + 1).toLong, 1.0 / (r + 1))
  }

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def df(rows: Seq[(Long, Long, Long, Double)]) =
    rows.toDF("qid", "id", "rank", "_score")

  private def collectRanked(out: org.apache.spark.sql.DataFrame) =
    out.select($"qid", $"rank", $"id").as[(Long, Long, Long)]
      .collect().sortBy(t => (t._1, t._2)).toList

  test("RRF is commutative in the order of its input lists") {
    for (seed <- 1L to 25L) {
      val dfs = (0 until 3).map(i => df(sample(listGen, seed * 97 + i)))
      val a = collectRanked(Fusion.rrf(dfs, "qid", "id", topK = 10))
      val b = collectRanked(Fusion.rrf(dfs.reverse, "qid", "id", topK = 10))
      assert(a == b, s"seed=$seed")
    }
  }

  test("RRF over a single list preserves its ranking (rank monotonicity)") {
    for (seed <- 1L to 25L) {
      val list = sample(listGen, seed)
      val fused = Fusion.rrf(Seq(df(list)), "qid", "id", topK = 50)
        .select($"qid", $"rank", $"id").as[(Long, Long, Long)].collect()
      val want = list.groupBy(_._1).flatMap { case (q, rows) =>
        rows.sortBy(_._3).take(50).zipWithIndex
          .map { case (r, i) => (q, (i + 1).toLong, r._2) }
      }.toList.sortBy(t => (t._1, t._2))
      assert(fused.sortBy(t => (t._1, t._2)).toList == want, s"seed=$seed")
    }
  }

  test("fused output never repeats a pk within a query (pk dedup)") {
    for (seed <- 1L to 25L) {
      val dfs = (0 until 3).map(i => df(sample(listGen, seed * 13 + i)))
      val fused = Fusion.rrf(dfs, "qid", "id", topK = 50)
        .select($"qid", $"id").as[(Long, Long)].collect()
      assert(fused.length == fused.distinct.length, s"seed=$seed")
      val w = Fusion.weighted(dfs, Seq.fill(3)(Metric.COSINE), Seq(0.2, 0.3, 0.5),
        "qid", "id", topK = 50).select($"qid", $"id").as[(Long, Long)].collect()
      assert(w.length == w.distinct.length, s"seed=$seed")
    }
  }

  test("reduceTopK caps per-query output at k with best-first scores") {
    for (seed <- 1L to 15L) {
      val scored = sample(listGen, seed * 7)
        .map { case (q, id, _, s) => (q, id, s) }.toDF("qid", "id", "_score")
      val k = 1 + (seed % 5).toInt
      val out = VectorSearch.reduceTopK(scored, "id", "qid", Metric.COSINE, k, Seq("id"))
        .select($"qid", $"rank", $"_score").as[(Long, Long, Double)].collect()
      out.groupBy(_._1).foreach { case (q, rows) =>
        assert(rows.length <= k, s"seed=$seed q=$q")
        val scores = rows.sortBy(_._2).map(_._3)
        assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
          s"seed=$seed q=$q not best-first: ${scores.toList}")
      }
    }
  }

  test("connected components match a union-find oracle on random graphs") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 10) {
      val n = 20 + rnd.nextInt(40)
      val edges = Seq.fill(n)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        // driver union-find oracle
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) => parent(find(a)) = find(b) }
        val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .map(v => v -> find(v)).groupBy(_._2).values
          .map(_.map(_._1).toSet).toSet
        // the operator, forced through BOTH paths
        for (cap <- Seq(0L, 4000000L)) {
          val got = Dedup.connectedComponents(
              edges.toDF("id_a", "id_b"), localEdgeCap = cap)
            .as[(Long, Long)].collect()
            .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
          assert(got == want, s"trial=$trial cap=$cap")
        }
      }
    }
  }
}
