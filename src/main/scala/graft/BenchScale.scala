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
      "minhash_lsh" -> (d => Dedup.minhashNearDupPairs(d, "doc_id", "text").count()),
      "simhash" -> (d => Dedup.simhashPairs(d, "doc_id", "text").count()),
      "winnow" -> (d => Dedup.winnowNearDupPairs(d, "doc_id", "text").count()),
      "survivors" -> { d =>
        val pairs = Dedup.minhashNearDupPairs(d, "doc_id", "text")
        Dedup.connectedComponents(pairs).count()
      })

    val scales = Seq(1, 5, 10)
    println(f"${"op"}%-12s ${"copies"}%7s ${"rows"}%8s ${"pairs/cc"}%9s ${"sec"}%8s")
    val results = for (copies <- scales; (name, fn) <- ops) yield {
      val corpus = replicate(copies).localCheckpoint(true) // exclude build cost
      val (sec, n) = time(fn(corpus))
      println(f"$name%-12s $copies%7d ${nBase * copies}%8d $n%9d $sec%8.2f")
      (name, copies, sec)
    }
    // scaling exponent between 1× and 10×: log(t10/t1)/log(10);
    // ≤ ~1.3 reads as linear-with-overhead, ≥ ~2 as quadratic
    ops.foreach { case (name, _) =>
      val t1 = results.collect { case (`name`, 1, s) => s }.head
      val t10 = results.collect { case (`name`, 10, s) => s }.head
      println(f"$name%-12s scaling exponent (1x→10x): ${math.log(t10 / t1) / math.log(10.0)}%.2f")
    }
    spark.stop()
  }
}
