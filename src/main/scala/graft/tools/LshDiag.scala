package graft.tools

import graft.{GraftSession, SparkEntry}

/** Times individual SparkEntry queries (fully materialized via noop
  * write) — e.g. `runMain graft.tools.LshDiag /root/testdata/sf0.1
  * q_minhash_lsh q_simhash_pairs`.
  */
object LshDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q_minhash_lsh")
    val spark = GraftSession.local()
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[diag] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
