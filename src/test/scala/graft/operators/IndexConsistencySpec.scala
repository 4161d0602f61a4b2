package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expr.ExprCompiler

/** Index-vs-scan consistency invariants beyond the oracle counts
  * (reference: expressions/test_filtering_index_consistency.py): the
  * dictionary-expression lookup must return the SAME id set as the
  * compiled scan for every predicate shape, including NULL dictionary
  * entries and empty results.
  */
class IndexConsistencySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq[(Long, Option[Long], String)](
    (1L, Some(10L), "alpha"), (2L, Some(20L), "beta"),
    (3L, None, "alpha"), (4L, Some(20L), "gamma"),
    (5L, Some(30L), "beta"), (6L, None, "delta"))
    .toDF("id", "v", "s")

  private def scanIds(filter: String): Set[Long] =
    df.filter(ExprCompiler.compile(filter, df))
      .select($"id").as[Long].collect().toSet

  private def idxIds(valueCol: String, filter: String): Set[Long] = {
    val idx = InvertedIndex.buildValueIndex(df, "id", valueCol)
    InvertedIndex.lookupExpr(idx, valueCol, valueCol, filter)
      .as[Long].collect().toSet
  }

  test("dictionary-expression lookup equals the scan across predicate shapes") {
    for (f <- Seq("v == 20", "v >= 20", "v in [10, 30]", "v not in [10, 30]",
        "(v + 5) >= 25", "v % 20 == 0", """s == "alpha"""",
        """s like "b%"""", """s not in ["alpha"]""")) {
      val (i, sc) = (idxIds(if (f.startsWith("s")) "s" else "v", f),
        scanIds(f))
      assert(i == sc, s"filter `$f`: index=$i scan=$sc")
    }
  }

  test("NULL dictionary entries fail predicates exactly like their rows") {
    // rows 3 and 6 hold NULL v: excluded from both paths, including
    // under negation (3VL — NOT(NULL cmp) stays UNKNOWN)
    assert(idxIds("v", "v != 20") == scanIds("v != 20"))
    assert(!idxIds("v", "not (v == 20)").contains(3L))
    assert(idxIds("v", "not (v == 20)") == scanIds("not (v == 20)"))
  }

  test("empty index results match empty scans") {
    assert(idxIds("v", "v == 999").isEmpty)
    assert(scanIds("v == 999").isEmpty)
  }

  test("element index answers contains/_any/_all like the array scan") {
    // duplicate elements within a row (id 1: two 4s) and across probed
    // values (id 2 holds BOTH 4 and 8) — the dedup + distinct paths
    // must not double-count either
    val arr = Seq(
      (1L, Seq(4L, 4L, 1L)), (2L, Seq(4L, 8L)), (3L, Seq(8L)),
      (4L, Seq(2L, 3L)), (5L, Seq.empty[Long]))
      .toDF("id", "tags")
    val idx = InvertedIndex.buildElementIndex(arr, "id", "tags")
    def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
      d.as[Long].collect().toSet
    def scan(f: String): Set[Long] =
      arr.filter(ExprCompiler.compile(f, arr)).select($"id")
        .as[Long].collect().toSet
    assert(ids(InvertedIndex.lookupElementsAny(idx, Seq(4L))) ==
      scan("array_contains(tags, 4)"))
    assert(ids(InvertedIndex.lookupElementsAny(idx, Seq(4L, 8L))) ==
      scan("array_contains_any(tags, [4, 8])"))
    assert(ids(InvertedIndex.lookupElementsAll(idx, Seq(4L, 8L))) ==
      scan("array_contains_all(tags, [4, 8])"))
    assert(ids(InvertedIndex.lookupElementsAll(idx, Seq(4L, 8L))) == Set(2L))
  }
}
