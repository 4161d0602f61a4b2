package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** FMINDEX re-expression: index-only substring matching must equal a
  * contains() scan for every pattern length, including lengths the
  * plain NGRAM index can't serve.
  */
class SubstringIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox"),
    (1L, "pack my box with five dozen jugs"),
    (2L, "ab"),                    // shorter than the gram size
    (3L, "abcabcabc"),             // periodic: repeated-chunk chaining
    (4L, "QUICKSILVER runs"),      // case folds at build AND probe
    (5L, "fox at the end is a fo") // tail occurrence of a short pattern
  ).toDF("doc_id", "text")

  private lazy val idx = SubstringIndex.build(docs, "doc_id", "text", n = 3)

  private def got(p: String): Set[Long] =
    SubstringIndex.matchIds(idx, p).as[Long].collect().toSet

  private def want(p: String): Set[Long] =
    docs.filter(lower(col("text")).contains(p.toLowerCase))
      .select(col("doc_id")).as[Long].collect().toSet

  test("every pattern length matches the contains() oracle") {
    for (p <- Seq(
        "q",            // single char (< n: NGRAM would full-scan)
        "ox",           // length 2, incl. a tail occurrence in doc 5
        "ab",           // matches both the short doc and the periodic one
        "fox",          // == n
        "quick",        // spans a chunk boundary
        "abcabc",       // repeated chunks anchor at one start
        "ck my box wi", // long chain across spaces
        "quicksilver",  // case-insensitive
        "zebra"))       // no match
      assert(got(p) == want(p), s"pattern '$p'")
  }

  test("chain verification rejects scrambled chunks (no false positives)") {
    // doc 3 contains 'abc' and 'cab' but never 'abccab' — the chunks
    // exist separately; only a common anchor may match
    assert(got("abccab") == want("abccab"))
    assert(got("abccab").isEmpty)
  }

  test("whole-short-doc gram keeps sub-gram docs searchable") {
    assert(got("ab").contains(2L))
    assert(got("b").contains(2L))
  }

  test("persisted layout: chained probes push gram equality to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("ssidx").toString
    SubstringIndex.write(idx, dir, numPartitions = 2)
    val loaded = SubstringIndex.load(spark, dir)
    val q = SubstringIndex.matchIds(loaded, "quick")
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // chunks 'qui' and 'ick' must reach the parquet scan as pushed
    // equality filters (row-group pruning on the gram-sorted layout)
    assert(plan.contains("EqualTo(gram,qui)") && plan.contains("EqualTo(gram,ick)"),
      s"expected gram pushdown in plan:\n$plan")
    assert(q.as[Long].collect().toSet == want("quick"))
  }
}
