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
    // --- round-8 additions: the r7 collection surfaces with no prior
    // scale-audit row — mutable-column overlay (patch-log join), struct
    // element-level hybrid, searchByPk.

    // mutable-column overlay: FIXED corpus, patch volume scaled — the
    // read pays one pk join per patched field against the latest-visible
    // patch aggregate, so time should grow sublinearly in log size
    // (the corpus side dominates until the log rivals the corpus)
    val patchScales = Seq(1, 20, 100)
    val overlayResults = {
      val corpus10 = replicateEmb(10).localCheckpoint(true) // ~10× rows
      patchScales.map { scale =>
        val c = Collection.create(spark,
          CollectionSchema(pkField = "pk", vectorFields = Map("emb" -> 64)))
        c.insert(corpus10.select(col("vec_id").as("pk"),
          col("embedding").as("emb"), (col("vec_id") % 7).as("grp")))
        val nRows = nEmb * 10
        // patch log: `scale`×600 rows across 3 LWW generations; gen is
        // taken MOD the stride so every generation patches rows even at
        // stride 1 (the every-row-patched top scale — a plain `=== gen`
        // would leave generations 1..2 empty there and measure a third
        // of the intended log with no LWW contention)
        val stride = (nRows / (200L * scale)) max 1L
        (0 until 3).foreach { gen =>
          val patch = corpus10.filter(col("vec_id") % lit(stride) === (gen % stride))
            .select(col("vec_id").as("pk"), (col("vec_id") + gen).as("grp"))
          c.setField("grp", patch)
        }
        val (sec, n) = time(c.query("grp >= 0", Seq("pk", "grp")).count())
        println(f"${"mutcol_read"}%-12s $scale%7d $nRows%8d $n%9d $sec%8.2f")
        ("mutcol_read", scale, sec)
      }
    }

    // struct element hybrid + searchByPk: corpus scaled — element hits
    // are nq·k-bounded, so the curve should track the element scan
    val colScales = Seq(1, 5, 10)
    val colResults = colScales.flatMap { copies =>
      val corpus = replicateEmb(copies).localCheckpoint(true)
      val c = Collection.create(spark,
        CollectionSchema(pkField = "pk", vectorFields = Map("emb" -> 64)))
      // two elements per row: the embedding and a deterministic twist
      c.insert(corpus.select(col("vec_id").as("pk"), col("embedding").as("emb"),
        array(
          struct(col("embedding").as("cvec")),
          struct(transform(col("embedding"), x => -x).as("cvec"))).as("chunks")))
      val qs = queries.limit(16).localCheckpoint(true)
      val (hSec, hN) = time(c.hybridSearch(Seq(
        c.SubSearch("cvec", qs, Metric.COSINE, k = 10,
          structArrayField = Some("chunks"), collapseToRows = false),
        c.SubSearch("cvec", qs, Metric.IP, k = 10,
          structArrayField = Some("chunks"), collapseToRows = false)),
        k = 10).count())
      println(f"${"struct_hyb"}%-12s $copies%7d ${nEmb * copies}%8d $hN%9d $hSec%8.2f")
      val (pSec, pN) = time(c.searchByPk("emb", (0L until 16L), k = 10,
        metric = Metric.COSINE, outputFields = Seq("pk")).count())
      println(f"${"search_bypk"}%-12s $copies%7d ${nEmb * copies}%8d $pN%9d $pSec%8.2f")
      Seq(("struct_hyb", copies, hSec), ("search_bypk", copies, pSec))
    }

    // --- round-9 additions: the r8 oracle-gated surfaces with no scale
    // row — element quantifiers/offsets over replicated struct arrays,
    // external-table function-output reads across a refresh, and the
    // function-backfill lazy-coalesce read.
    val r9Scales = Seq(1, 5, 10)
    val r9Results = r9Scales.flatMap { copies =>
      val emb = replicateEmb(copies).localCheckpoint(true)

      // element quantifiers: 4 struct elements per row — match_any is a
      // codegen'd exists over the array column (map-only); the
      // element_filter ROOT explodes only filter-surviving rows
      val ec = Collection.create(spark, CollectionSchema(pkField = "pk"))
      ec.insert(emb.select(col("vec_id").as("pk"),
        array((0 until 4).map(i =>
          struct(((col("vec_id") + i) % 97).cast("double").as("score"),
            lit(i.toLong).as("ord"))): _*).as("chunks")))
      val (qSec, qN) = time(ec.count("match_any(chunks, $[score] > 90.0)"))
      println(f"${"elem_quant"}%-12s $copies%7d ${nEmb * copies}%8d $qN%9d $qSec%8.2f")
      val (oSec, oN) = time(ec.query(
        "element_filter(chunks, $[score] > 90.0)", Seq("pk")).count())
      println(f"${"elem_offsets"}%-12s $copies%7d ${nEmb * copies}%8d $oN%9d $oSec%8.2f")

      // external-table function outputs across a refresh: two fragments
      // of `copies`× documents each; the read computes the MinHash
      // output over the mapped column inside the fragment scan
      val docs = replicate(copies).localCheckpoint(true)
      val extDir = s"/tmp/graft_bscale_ext_${copies}_${System.nanoTime()}"
      docs.write.parquet(s"$extDir/frag0")
      val et = graft.sources.ExternalTable.create(spark, "parquet", extDir,
        Map("doc_id" -> "doc_id", "text" -> "text"),
        Seq(graft.functions.IngestFunctions.MinHashFunction(
          "text", "sig", numHashes = 16)))
      docs.select((col("doc_id") + lit(nBase * copies)).as("doc_id"), col("text"))
        .write.parquet(s"$extDir/frag1")
      et.refresh()
      val (eSec, eN) = time(
        et.read().agg(sum(size(col("sig")))).head().getLong(0))
      println(f"${"ext_fn_read"}%-12s $copies%7d ${2 * nBase * copies}%8d $eN%9d $eSec%8.2f")

      // backfill read: historical rows serve the COMPUTED output via the
      // lazy coalesce — cost rides the corpus scan, no segment rewrite
      val bc = Collection.create(spark, CollectionSchema(pkField = "doc_id"))
      bc.insert(docs)
      bc.addFunction(graft.functions.IngestFunctions.MinHashFunction(
        "text", "sig", numHashes = 16), backfill = true)
      val (bSec, bN) = time(
        bc.query("", Seq("doc_id", "sig"))
          .agg(sum(size(col("sig")))).head().getLong(0))
      println(f"${"backfill_read"}%-12s $copies%7d ${nBase * copies}%8d $bN%9d $bSec%8.2f")
      Seq(("elem_quant", copies, qSec), ("elem_offsets", copies, oSec),
        ("ext_fn_read", copies, eSec), ("backfill_read", copies, bSec))
    }

    // --- round-10 additions: flush-time summary-stats publish cost vs
    // segment count (constant corpus — the per-seal aggregate must cost
    // per-segment overhead, not corpus-proportional re-work), and the
    // conformance-battery cost vs case count (N conditional sums share
    // ONE codegen'd scan, so the curve must be flat).
    val segScales = Seq(1, 4, 16)
    val statsResults = {
      val corpus = replicateEmb(10)
        .select(col("vec_id").as("pk"), col("embedding").as("emb"))
        .localCheckpoint(true)
      val nRows = nEmb * 10
      segScales.map { segs =>
        val c = Collection.create(spark,
          CollectionSchema(pkField = "pk", vectorFields = Map("emb" -> 64)))
        val path = s"/tmp/graft_bscale_stats_${segs}_${System.nanoTime()}"
        val per = nRows / segs
        val (sec, _) = time {
          (0 until segs).foreach { i =>
            val lo = i * per
            val hi = if (i == segs - 1) nRows else (i + 1) * per
            c.insert(corpus.filter(col("pk") >= lo && col("pk") < hi))
            c.flush(path)
          }
          c.segmentStatistics.values.map(_.rows).sum
        }
        println(f"${"stats_publish"}%-12s $segs%7d $nRows%8d ${segs}%9d $sec%8.2f")
        ("stats_publish", segs, sec)
      }
    }
    val caseScales = Seq(1, 2, 4) // ×13 cases: 13 / 26 / 52
    val matrixResults = {
      val typed = graft.queries.MatrixQueries.typedDf(spark, sfDir)
        .localCheckpoint(true)
      val allCases = graft.queries.MatrixQueries.TypedCases
      caseScales.map { k =>
        val cases = allCases.take(13 * k)
        val counters = cases.map(c =>
          sum(when(graft.expr.ExprCompiler.compile(c.engine, typed),
            1L).otherwise(0L)).as(c.id))
        val (sec, _) = time {
          typed.agg(counters.head, counters.tail: _*).head(); cases.size.toLong
        }
        println(f"${"matrix_cases"}%-12s $k%7d ${cases.size}%8d ${cases.size}%9d $sec%8.2f")
        ("matrix_cases", k, sec)
      }
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
    println(f"${"mutcol_read"}%-12s scaling exponent (1x→100x patches): ${exponent(overlayResults, "mutcol_read", 100)}%.2f")
    Seq("struct_hyb", "search_bypk").foreach { name =>
      println(f"$name%-12s scaling exponent (1x→10x): ${exponent(colResults, name, 10)}%.2f")
    }
    Seq("elem_quant", "elem_offsets", "ext_fn_read", "backfill_read").foreach { name =>
      println(f"$name%-12s scaling exponent (1x→10x): ${exponent(r9Results, name, 10)}%.2f")
    }
    println(f"${"stats_publish"}%-12s scaling exponent (1→16 segments): ${exponent(statsResults, "stats_publish", 16)}%.2f")
    println(f"${"matrix_cases"}%-12s scaling exponent (13→52 cases): ${exponent(matrixResults, "matrix_cases", 4)}%.2f")
    spark.stop()
  }
}
