package graft

import org.apache.spark.sql.functions._

/** Practical-parameter recall curves for the graph/quantized ANN
  * indexes (VERDICT r7 Next #7): recall@10 vs the search-time knob —
  * Vamana beam width L and nprobe, SCANN ADC shortlist — against
  * brute-force ground truth on the sf0.1 embeddings. Three points per
  * knob; results land in BENCH_LOCAL.md so future tuning can't walk
  * off a recall cliff silently.
  *
  * Not part of the driver contract.
  */
object BenchRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName = "graft-bench-recall")
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.Metric
    import graft.operators.{IvfIndex, ScannIndex, VamanaIndex, VectorSearch}

    val emb = GraftSession.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val nq = 50
    val k = 10
    val queriesDf = emb.filter(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .localCheckpoint(true)
    val queryPairs = queriesDf.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

    // ground truth: brute-force top-k per query (L2 — the graph metric)
    val truth = VectorSearch.topK(emb, "vec_id", "embedding",
      queriesDf, "qid", "qvec", Metric.L2, k)
      .select(col("qid"), col("vec_id"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

    // Vamana hits carry the internal "id" column; flat/SCANN keep vec_id
    def recallOf(hits: org.apache.spark.sql.DataFrame, idCol: String): Double = {
      val got = hits.select(col("qid"), col(idCol))
        .collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
      truth.map { case (q, t) =>
        got.get(q).map(g => (g & t).size.toDouble / t.size).getOrElse(0.0)
      }.sum / truth.size
    }

    println(f"${"index"}%-8s ${"knob"}%-14s ${"value"}%7s ${"recall@10"}%10s")

    // Vamana: recall vs beam width L (exhaustive over partitions), then
    // vs nprobe on the IVF-clustered variant at fixed L
    val vidx = VamanaIndex.build(emb, "vec_id", "embedding",
      numParts = 8, r = 16, l = 32)
    Seq(16, 32, 64).foreach { l =>
      val r = recallOf(VamanaIndex.search(vidx, queryPairs, k = k, l = l), "id")
      println(f"${"vamana"}%-8s ${"beam_l"}%-14s $l%7d $r%10.3f")
    }
    val ivfModel = IvfIndex.trainLocal(emb, "embedding", nlist = 16,
      maxTrainRows = 5000)
    val cidx = VamanaIndex.buildClustered(emb, "vec_id", "embedding",
      ivfModel, r = 16, l = 32)
    Seq(2, 4, 8).foreach { np =>
      val r = recallOf(VamanaIndex.searchPruned(cidx, ivfModel, queryPairs,
        k = k, l = 64, nprobe = np), "id")
      println(f"${"vamana"}%-8s ${"nprobe(L=64)"}%-14s $np%7d $r%10.3f")
    }

    // SCANN: recall vs ADC shortlist size (exact-IP refine on shortlist)
    val model = ScannIndex.trainLocal(emb, "embedding", m = 8, k = 16, dim = 64)
    val encoded = emb.withColumn("_codes",
      ScannIndex.encode(model, col("embedding"))).localCheckpoint(true)
    // SCANN refines by exact IP — ground-truth against IP for this curve
    val ipTruth = VectorSearch.topK(emb, "vec_id", "embedding",
      queriesDf, "qid", "qvec", Metric.IP, k)
      .select(col("qid"), col("vec_id"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def ipRecallOf(hits: org.apache.spark.sql.DataFrame): Double = {
      val got = hits.select(col("qid"), col("vec_id"))
        .collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
      ipTruth.map { case (q, t) =>
        got.get(q).map(g => (g & t).size.toDouble / t.size).getOrElse(0.0)
      }.sum / ipTruth.size
    }
    Seq(50, 100, 200).foreach { sl =>
      val r = ipRecallOf(ScannIndex.searchRefined(encoded, "vec_id", "_codes",
        "embedding", model, queryPairs, k = k, shortlist = sl))
      println(f"${"scann"}%-8s ${"shortlist"}%-14s $sl%7d $r%10.3f")
    }

    // IVF_HNSW (round 13): recall vs nprobe at a fixed practical beam
    import graft.operators.{AisaqIndex, IvfHnswIndex}
    val ihModel = IvfHnswIndex.train(emb, "embedding", nlist = 16,
      m = 8, efConstruction = 32)
    val ihIdx = IvfHnswIndex.build(emb, "vec_id", "embedding", ihModel)
      .localCheckpoint(true)
    Seq(2, 4, 8, 16).foreach { np =>
      val r = recallOf(IvfHnswIndex.search(ihIdx, ihModel, queryPairs,
        k = k, ef = 64, nprobe = np), "id")
      println(f"${"ivfhnsw"}%-8s ${"nprobe(ef=64)"}%-14s $np%7d $r%10.3f")
    }

    // AISAQ (round 13): recall vs search_list (PQ beam + exact refine)
    val aModel = AisaqIndex.train(emb, "embedding", m = 16, k = 32,
      dim = 64, numParts = 8, r = 16, l = 32)
    val aIdx = AisaqIndex.build(emb, "vec_id", "embedding", aModel)
      .localCheckpoint(true)
    Seq(32, 64, 128).foreach { sl =>
      val r = recallOf(AisaqIndex.searchRefined(aIdx, emb, "vec_id",
        "embedding", queryPairs, k = k, searchList = sl, refineMult = 6),
        "vec_id")
      println(f"${"aisaq"}%-8s ${"search_list"}%-14s $sl%7d $r%10.3f")
    }
    spark.stop()
  }
}
