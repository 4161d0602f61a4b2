package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Local scale-audit for the dedup family (the 100 TB story's local
  * proxy): runs MinHash-LSH, SimHash, winnowing, and connected-
  * components survivor selection over 1×/5×/10× replications of the
  * sf0.1 `documents` corpus (5k → 50k docs ≈ sf1) and prints wall
  * seconds per (op, scale) plus the measured scaling exponent.
  *
  * Each replica gets a per-copy Caesar-shifted alphabet so copies are
  * NOT near-duplicates of each other — corpus size grows without the
  * pair structure going quadratic in the copy count (which would
  * measure the workload change, not the engine's scaling). Within-copy
  * dup structure is preserved exactly.
  *
  * Not part of the driver contract — results land in BENCH_LOCAL.md.
  */
object BenchScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName = "graft-bench-scale")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val base = GraftSession.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val nBase = base.count()

    def replicate(copies: Int): DataFrame =
      (0 until copies).map { c =>
        val abc = "abcdefghijklmnopqrstuvwxyz"
        val shifted = abc.drop(c % 26) + abc.take(c % 26)
        base.select((col("doc_id") + lit(c.toLong * nBase)).as("doc_id"),
          translate(col("text"), abc, shifted).as("text"))
      }.reduce(_ unionByName _)

    def time(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val ops: Seq[(String, DataFrame => Long)] = Seq(
      "bm25_build_q" -> { d =>
        // full-text build + 16 query strings. The build ARTIFACT is
        // materialized (localCheckpoint) before querying — otherwise
        // every search(...).count() re-runs the corpus tokenize/explode
        // lineage and the benchmark measures 17 corpus scans, not
        // build-once-query-many; with it, query cost ∝ the query
        // terms' postings.
        val raw = graft.operators.Bm25.build(d, "doc_id", "text")
        val idx = raw.copy(
          postings = raw.postings.localCheckpoint(true),
          termStats = raw.termStats.localCheckpoint(true),
          globals = raw.globals.localCheckpoint(true))
        val queries = (0 until 16).map(i => s"vector stream table $i")
        queries.map(q =>
          graft.operators.Bm25.search(idx, q, k = 10).count()).sum
      },
      "minhash_lsh" -> (d => Dedup.minhashNearDupPairs(d, "doc_id", "text").count()),
      "simhash" -> (d => Dedup.simhashPairs(d, "doc_id", "text").count()),
      "winnow" -> (d => Dedup.winnowNearDupPairs(d, "doc_id", "text").count()),
      "survivors" -> { d =>
        val pairs = Dedup.minhashNearDupPairs(d, "doc_id", "text")
        Dedup.connectedComponents(pairs).count()
      })

    // --- vector family over replicated embeddings: brute-force top-k
    // (the reduce path's shuffle volume must stay O(partitions·nq·k))
    // and IVF build+probe (train sample bounded, probes prune clusters)
    val embBase = GraftSession.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val nEmb = embBase.count()

    /** Per-copy deterministic perturbation so replicas are distinct
      * vectors (not exact duplicates) without changing the geometry's
      * scale — corpus grows, per-query work per row stays constant.
      */
    def replicateEmb(copies: Int): DataFrame =
      (0 until copies).map { c =>
        embBase.select((col("vec_id") + lit(c.toLong * nEmb)).as("vec_id"),
          transform(col("embedding"),
            x => x * (lit(1.0f) + lit(c.toFloat * 0.001f))).as("embedding"))
      }.reduce(_ unionByName _)

    val queries = embBase.filter(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .localCheckpoint(true)

    import graft.functions.Metric
    import graft.operators.{IvfIndex, VectorSearch}
    val queryPairs = queries.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val vecOps: Seq[(String, DataFrame => Long)] = Seq(
      "topk_brute" -> (d => VectorSearch.topK(d, "vec_id", "embedding",
        queries, "qid", "qvec", Metric.COSINE, k = 10).count()),
      "ivf_build_q" -> { d =>
        val model = IvfIndex.trainLocal(d, "embedding", nlist = 32, maxTrainRows = 5000)
        val layout = IvfIndex.layout(d, "embedding", model)
        IvfIndex.search(layout, "vec_id", "embedding", model,
          queries, "qid", "qvec", Metric.COSINE, k = 10, nprobe = 4).count()
      },
      // round-7 additions: graph build dominates Vamana (two robust-prune
      // passes per partition — the per-partition sequential cost the
      // segment-size choice bounds); SCANN is train + map-only encode +
      // shortlist/refine
      "vamana_build_q" -> { d =>
        val parts = math.max(8, (d.count() / 4000L).toInt)
        val idx = graft.operators.VamanaIndex.build(d, "vec_id", "embedding",
          numParts = parts, r = 16, l = 32)
        graft.operators.VamanaIndex.search(idx, queryPairs.take(16), k = 10,
          l = 64).count()
      },
      "scann_build_q" -> { d =>
        val model = graft.operators.ScannIndex.trainLocal(d, "embedding",
          m = 8, k = 16, dim = 64)
        val encoded = d.withColumn("_codes",
          graft.operators.ScannIndex.encode(model, col("embedding")))
        graft.operators.ScannIndex.searchRefined(encoded, "vec_id", "_codes",
          "embedding", model, queryPairs.take(16), k = 10, shortlist = 100).count()
      })

    val scales = Seq(1, 5, 10)
    println(f"${"op"}%-12s ${"copies"}%7s ${"rows"}%8s ${"pairs/cc"}%9s ${"sec"}%8s")
    val results = for (copies <- scales; (name, fn) <- ops) yield {
      val corpus = replicate(copies).localCheckpoint(true) // exclude build cost
      val (sec, n) = time(fn(corpus))
      println(f"$name%-12s $copies%7d ${nBase * copies}%8d $n%9d $sec%8.2f")
      (name, copies, sec)
    }
    // vectors are cheap per row — push the corpus two decades so the
    // curve is work-dominated, not session-overhead-dominated
    val vecScales = Seq(1, 20, 100)
    val vecResults = for (copies <- vecScales; (name, fn) <- vecOps) yield {
      val corpus = replicateEmb(copies).localCheckpoint(true)
      val (sec, n) = time(fn(corpus))
      println(f"$name%-12s $copies%7d ${nEmb * copies}%8d $n%9d $sec%8.2f")
      (name, copies, sec)
    }
    // scaling exponent between the smallest and largest scale:
    // log(tMax/t1)/log(max); ≤ ~1.3 reads as linear-with-overhead,
    // ≥ ~2 as quadratic
    def exponent(all: Seq[(String, Int, Double)], name: String, top: Int): Double = {
      val t1 = all.collect { case (`name`, 1, s) => s }.head
      val tN = all.collect { case (`name`, `top`, s) => s }.head
      math.log(tN / t1) / math.log(top.toDouble)
    }
    ops.foreach { case (name, _) =>
      println(f"$name%-12s scaling exponent (1x→10x): ${exponent(results, name, 10)}%.2f")
    }
    vecOps.foreach { case (name, _) =>
      println(f"$name%-12s scaling exponent (1x→100x): ${exponent(vecResults, name, 100)}%.2f")
    }
    spark.stop()
  }
}
