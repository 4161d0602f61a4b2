package graft.tools

import org.apache.spark.sql.functions._

import graft.{Collection, CollectionSchema, GraftSession}

/** Measures the pk segment-pruning win (MEP 20260324) the way
  * [[PruneCurve]] measures clustering pruning: a 64-segment collection,
  * point lookups dispatched through the pk min/max+bloom registry vs a
  * CONTROL carrying the same physical filter in a shape the domain
  * extractor conservatively refuses (`pk == X or pk == X` — Catalyst
  * simplifies it to the identical pushed predicate, so the only
  * difference is the 64-dir vs 1-dir file list). Prints dispatch widths,
  * median wall seconds, and the speedup. Not part of the driver
  * contract — results land in BENCH_LOCAL.md.
  */
object PrunePoint {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // dispatch overhead vs segment count: r9 measured 64; pass 256 to
    // show the prune win GROWS with segment count (the pruned side stays
    // one-segment flat while the control opens every footer)
    val segments = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = GraftSession.table(spark, dir, "events")
      .select(col("event_id").as("pk"), col("event_type"), col("value"))
    val n = emb.count()
    val per = math.max(n / segments, 1L)
    val c = Collection.create(spark, CollectionSchema(pkField = "pk"))
    val path = s"/tmp/graft_prunepoint_${System.nanoTime()}"
    (0 until segments).foreach { i =>
      val lo = i * per
      val hi = if (i == segments - 1) n else (i + 1) * per
      c.insert(emb.filter(col("pk") >= lo && col("pk") < hi))
      c.flush(path)
    }
    println(s"[prunepoint] corpus=$n rows, ${segments} sealed segments")

    def timeMedian(body: => Long, runs: Int = 5): Double = {
      val ts = (0 until runs).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(runs / 2)
    }
    c.count() // warm the session / codegen

    val probes = Seq(7L, n / 3, n / 2, (2L * n) / 3, n - 5)
    val pruned = timeMedian(probes.map(x => c.count(s"pk == $x")).sum)
    val control = timeMedian(probes.map(x =>
      c.count(s"pk == $x or pk == $x")).sum)
    val dispatchPruned = c.plannedSegments(s"pk == ${n / 2}").size
    val dispatchCtl = c.plannedSegments(s"pk == ${n / 2} or pk == ${n / 2}").size
    println(f"[prunepoint] point lookup ×${probes.size}: " +
      f"pruned $pruned%.3f s (dispatch $dispatchPruned/$segments) vs " +
      f"control $control%.3f s (dispatch $dispatchCtl/$segments) — " +
      f"speedup ${control / pruned}%.2fx")

    // IN-list and iterator-cursor shapes
    val inPruned = timeMedian(c.count(s"pk in [5, ${n / 2}, ${n - 3}]"))
    val inCtl = timeMedian(c.count(
      s"(pk in [5, ${n / 2}, ${n - 3}]) or pk == 5"))
    println(f"[prunepoint] IN(3): pruned $inPruned%.3f s " +
      f"(dispatch ${c.plannedSegments(s"pk in [5, ${n / 2}, ${n - 3}]").size}) " +
      f"vs control $inCtl%.3f s — speedup ${inCtl / inPruned}%.2fx")
    val cursor = n - per // last segment only
    val iterPruned = timeMedian(
      c.queryIterator("", Seq("pk"), batch = 100, lastPk = Some(cursor)).count())
    println(f"[prunepoint] iterator tail page (cursor past ${segments - 1}/$segments): " +
      f"$iterPruned%.3f s (dispatch ${c.plannedSegments(s"pk > $cursor").size})")
    spark.stop()
  }
}
