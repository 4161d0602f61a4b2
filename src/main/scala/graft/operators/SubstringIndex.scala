package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Positional-gram substring index — the Spark re-expression of the
  * reference's FMINDEX (reference: internal/core/src/index/FMIndex.cpp;
  * index name in indexparamcheck). An FM-index answers "which docs
  * contain this arbitrary substring" from the index alone, any pattern
  * length, no raw-text access. Its compressed-suffix-array machinery is
  * per-query pointer chasing with no good distributed shape — but its
  * CONTRACT distributes cleanly as positional q-grams:
  *
  *  - postings = (gram, id, pos) for every position (not distinct — the
  *    position is the payload). Laid out by gram, a probe prunes to the
  *    pattern's gram values via ordinary predicate pushdown.
  *  - pattern shorter than the gram size: `p` occurs in a doc iff some
  *    gram CONTAINS `p` (any occurrence lies inside the gram starting at
  *    its position, or inside the final gram) — one contains-probe,
  *    exact, no scan of the raw text. This is the case the plain NGRAM
  *    index cannot serve (it would fall back to a full corpus scan).
  *  - pattern of length ≥ gram size: q-gram chain verification — grams
  *    at chunk offsets 0, n, 2n, …, |p|−n must all match at a common
  *    start: the chunks cover every character of `p`, so the postings
  *    intersection on (id, pos − offset) reconstructs the full pattern
  *    exactly. One pruned probe per chunk (~|p|/n), a partial-agg count
  *    intersection, no raw-text refine.
  *
  * Versus [[NgramIndex]] (the LIKE fast path): that index stores
  * distinct grams only and re-checks candidates against the raw text;
  * this one is self-contained and length-complete — the FMINDEX
  * workload. Docs shorter than the gram size index their whole text as
  * one gram, so nothing is unsearchable.
  */
object SubstringIndex {

  /** Build the positional postings (gram, id, pos) over lowercase text. */
  def build(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    require(n >= 2, s"gram size $n too small")
    val t = lower(col(textCol))
    val grams = when(length(t) < n,
        array(struct(t.as("gram"), lit(0).as("pos"))))
      .otherwise(transform(sequence(lit(1), length(t) - (n - 1)),
        i => struct(t.substr(i, lit(n)).as("gram"), (i - 1).as("pos"))))
    Dedup.parallelize(df)
      .select(col(idCol).as("id"), explode(grams).as("_e"))
      .select(col("_e.gram").as("gram"), col("id"), col("_e.pos").as("pos"))
  }

  /** Persist the postings laid out BY GRAM — range-partitioned and
    * sorted, so a chained probe's `gram = '…'` equality filters prune
    * whole row groups via parquet zone maps before any row is read (the
    * at-scale index form; same layout argument as
    * [[InvertedIndex.writeTokenPairs]]). Sub-gram containment probes
    * still scan the gram column only (column pruning), never the corpus.
    */
  def write(index: DataFrame, path: String, numPartitions: Int): Unit =
    index.repartitionByRange(numPartitions, col("gram"))
      .sortWithinPartitions(col("gram"), col("id"), col("pos"))
      .write.mode("overwrite").parquet(path)

  def load(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Ids of docs containing `pattern` — answered from the index alone,
    * exact for every pattern length ≥ 1.
    */
  def matchIds(index: DataFrame, pattern: String, n: Int = 3): DataFrame = {
    val p = pattern.toLowerCase
    require(p.nonEmpty, "empty pattern")
    if (p.length <= n) {
      // existence via containment: exact, because every occurrence of a
      // pattern no longer than a gram lies wholly inside some gram
      index.filter(col("gram").contains(p)).select(col("id")).distinct()
    } else {
      val ks = ((0 until p.length - n by n) :+ (p.length - n)).distinct
      val chunks = ks.map(k => (k, p.substring(k, k + n)))
      val sides = chunks.map { case (k, g) =>
        index.filter(col("gram") === g)
          .select(col("id"), (col("pos") - k).as("_start"))
      }
      // all chunks must anchor at one common start: each (id, start) row
      // is a distinct posting, so a full count means every constraint
      // held and the chunks jointly spell out the whole pattern
      sides.reduce(_ unionByName _)
        .groupBy(col("id"), col("_start"))
        .agg(count(lit(1)).as("_m"))
        .filter(col("_m") === chunks.size)
        .select(col("id")).distinct()
    }
  }
}
