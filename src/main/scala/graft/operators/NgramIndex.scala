package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.TextFunctions

/** Character-ngram inverted index for inner-wildcard LIKE — the Spark
  * re-expression of the reference's NGRAM index + fused multi-LIKE fast
  * path (reference: internal/core/src/index/NgramInvertedIndex.cpp,
  * exec/expression/LikeConjunctExpr.cpp:110 — conjunctions of LIKE
  * patterns share one index probe, then an exact post-filter).
  *
  * Without this, every `%inner%` LIKE over 100 TB is a full scan. With
  * it: the query pattern's ngrams prune to a candidate posting
  * intersection (tiny, index-side), and only candidates are re-checked
  * with the exact, case-sensitive predicate. The index is built on
  * LOWERCASED grams, so candidates are a superset of case-sensitive
  * matches — the refine step restores exactness.
  *
  * For the reference's FMINDEX workload — arbitrary-length substring
  * queries answered from the index alone, including patterns shorter
  * than the gram size — see [[SubstringIndex]] (positional grams +
  * chain verification); this index keeps the lean distinct-gram form
  * that the LIKE fast path wants.
  */
object NgramIndex {

  /** Build the flat (gram, id) pair index over `textCol`'s distinct
    * lowercase `n`-grams — the scale-safe representation (a hot gram
    * like "the" never materializes a single giant postings cell; see
    * [[InvertedIndex.buildTokenPairs]]). At scale, persist with
    * [[InvertedIndex.writeTokenPairs]] so gram filters prune row groups.
    */
  def build(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    // adaptive repartition: the per-row gram explode is the expensive
    // pass — don't let a single small row group serialize it
    InvertedIndex.buildTokenPairs(Dedup.parallelize(df), idCol,
      array_distinct(TextFunctions.charNgrams(col(textCol), n)))

  /** The lowercase n-grams a candidate must contain to possibly match
    * `%pattern%`. Empty when the pattern is too short to index.
    */
  private[graft] def patternGrams(pattern: String, n: Int): Seq[String] = {
    val p = pattern.toLowerCase
    if (p.length < n) Seq.empty
    else (0 to p.length - n).map(i => p.substring(i, i + n)).distinct
  }

  /** Candidate ids for a CONJUNCTION of inner-LIKE patterns — one fused
    * index probe over the union of all patterns' grams (the
    * LikeConjunctExpr shape: N LIKEs cost one intersection, not N scans).
    */
  def candidateIds(index: DataFrame, patterns: Seq[String], n: Int = 3): DataFrame = {
    val grams = patterns.flatMap(patternGrams(_, n)).distinct
    require(grams.nonEmpty,
      s"no indexable grams (all patterns shorter than $n chars) — use a full scan")
    InvertedIndex.lookupAllPairs(index, grams)
  }

  /** Exact fused multi-LIKE: rows of `df` matching ALL `%pattern%`s,
    * routed through the ngram index when every pattern is indexable and
    * falling back to a full scan otherwise. The exact `contains` refine
    * runs only on the (broadcast) candidate ids.
    */
  def likeSearch(df: DataFrame, idCol: String, textCol: String,
      index: DataFrame, patterns: Seq[String], n: Int = 3): DataFrame = {
    require(patterns.nonEmpty, "need at least one pattern")
    val exact: Column = patterns.map(p => col(textCol).contains(p)).reduce(_ && _)
    if (patterns.exists(patternGrams(_, n).isEmpty)) df.filter(exact)
    else {
      val ids = candidateIds(index, patterns, n)
      // no broadcast hint: candidate count is data-dependent — selective
      // patterns give a tiny set (AQE broadcasts it on its own), but a
      // pattern of frequent grams can select a corpus-sized candidate
      // set, and a forced broadcast would OOM the driver
      df.join(ids, df(idCol) === ids("id"), "left_semi")
        .filter(exact)
    }
  }
}
