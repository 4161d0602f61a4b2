package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Reproduces the reference's clustering-compaction pruning study
  * (reference: docs/user_guides/clustering_compaction.md:81-95 — QPS vs
  * prune ratio on a clustering key, 25× at 99% prune) on this engine:
  * lineitem clustered by l_partkey via repartitionByRange, then timed
  * key-range scans at increasing selectivity. Prints prune %, files
  * read, wall time, and speedup vs the full scan.
  */
object PruneCurve {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val path = "/tmp/graft_prunecurve"
    val li = GraftSession.table(spark, dir, "lineitem")
    val maxKey = li.agg(max("l_partkey")).head().getLong(0)
    graft.operators.Clustering.writeClustered(li, "l_partkey", path, numPartitions = 64)

    // per-file key ranges from the clustered layout's own stats — a file
    // whose [min,max] misses the predicate range contributes zero row
    // groups to the scan (parquet footer pruning; at cluster scale the
    // same ranges drive partition-level listing pruning)
    val fileRanges = graft.operators.Clustering.fileStats(spark, path, "l_partkey")
      .collect().map(r => (r.getAs[Long]("key_min"), r.getAs[Long]("key_max")))

    def scan(lo: Long, hi: Long): (Double, Long, Long) = {
      val df = spark.read.parquet(path)
        .filter(col("l_partkey") >= lo && col("l_partkey") <= hi)
        .agg(count(lit(1)).as("cnt"), sum("l_extendedprice"))
      val t0 = System.nanoTime()
      df.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val overlapping = fileRanges.count { case (mn, mx) => mn <= hi && mx >= lo }
      val rows = spark.read.parquet(path)
        .filter(col("l_partkey") >= lo && col("l_partkey") <= hi).count()
      (sec, overlapping.toLong, rows)
    }

    // warm the file cache / codegen with one full pass
    scan(0, maxKey)
    val total = li.count()
    val cases = Seq(
      ("full scan (0% prune)", 0L, maxKey),
      ("~40% prune", (maxKey * 0.2).toLong, (maxKey * 0.8).toLong),
      ("~60% prune", (maxKey * 0.2).toLong, (maxKey * 0.6).toLong),
      ("~80% prune", (maxKey * 0.2).toLong, (maxKey * 0.4).toLong),
      ("~99% prune", (maxKey * 0.5).toLong, (maxKey * 0.5).toLong + maxKey / 100))
    val base = scan(cases.head._2, cases.head._3)
    println(f"[curve] ${cases.head._1}%-22s files=${base._2}%3d rows=${base._3}%8d " +
      f"t=${base._1}%6.3fs speedup=1.00x")
    cases.tail.foreach { case (label, lo, hi) =>
      val r = scan(lo, hi)
      val pruneRows = 100.0 * (1.0 - r._3.toDouble / total)
      println(f"[curve] $label%-22s files=${r._2}%3d rows=${r._3}%8d " +
        f"t=${r._1}%6.3fs speedup=${base._1 / r._1}%.2fx (rows pruned $pruneRows%.1f%%)")
    }
    spark.stop()
  }
}
