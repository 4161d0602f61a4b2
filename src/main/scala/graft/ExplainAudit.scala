package graft

/** Prints formatted physical plans for representative queries so scan
  * pushdown (`PushedFilters`, `ReadSchema`), broadcast topology, and
  * whole-stage-codegen coverage can be audited by eye.
  *
  * Usage: sbt "runMain graft.ExplainAudit [sfDir] [query...]"
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_expr_range", "q_topk_cosine", "q_requery", "q_mvcc_visibility",
        "q_bm25", "q_minhash_lsh", "q_clustered_scan", "q_ngram_rule",
        "q_partition_key", "q_lob_gc",
        // round-7 additions
        "q_vamana_exhaustive", "q_scann_exhaustive", "q_mutable_column",
        "q_struct_hybrid", "q_seq_pack")
    val spark = GraftSession.local()
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
