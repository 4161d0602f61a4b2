package graft.tools

/** Scratch profiler for the q_dedup_survivors bench spread (VERDICT r6
  * watch #1). Mode A: warm repeats (CacheManager reuses the persisted
  * sets/pairs across runs — the bench's in-JVM shape). Mode B: cold
  * repeats (catalog cache cleared between runs — every run recomputes
  * the LSH pipeline). The spread between A and B bounds what cache
  * eviction by OTHER bench queries can do to this query's wall time.
  */
object SurvivorProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "survivor-profile")
    spark.sparkContext.setLogLevel("WARN")
    def run(label: String, clear: Boolean): Unit = for (i <- 1 to 5) {
      if (clear) spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = graft.queries.TextQueries.dedupSurvivors(spark, sf).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"$label $i: $wall%.2f s rows=$n")
    }
    run("warm", clear = false)
    run("cold", clear = true)
    spark.stop()
  }
}
