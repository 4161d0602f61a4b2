package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{InvertedIndex, NgramIndex}

class NgramRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val dataPath = "/tmp/graft_test_ngramrule/data"
  private val indexPath = "/tmp/graft_test_ngramrule/index"

  private lazy val fixture: Unit = {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "quick zephyrs blow, vexing daft jim"),
      (4L, "BROWN paper packages"), // case differs: index is lowercase, refine exact
      (5L, "sphinx of black quartz judge my vow"))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(dataPath)
    val pairs = NgramIndex.build(spark.read.parquet(dataPath), "doc_id", "text")
    InvertedIndex.writeTokenPairs(pairs, indexPath, numPartitions = 2)
    NgramRewrite.register(dataPath, "doc_id", "text", indexPath)
    NgramRewrite.install(spark)
  }

  private def relation = { fixture; spark.read.parquet(dataPath) }

  test("contains-filter is rewritten to an index semi join + exact refine") {
    val q = relation.filter($"text".contains("quick")).select($"doc_id")
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi join in:\n$plan")
    assert("""term#\d+ IN""".r.findFirstIn(plan).isDefined, s"index not probed in:\n$plan")
    assert(q.as[Long].collect().sorted.toList == List(1L, 3L))
  }

  test("conjunction of LIKEs fuses into one probe and stays exact") {
    val q = relation
      .filter($"text".like("%quick%") && $"text".contains("brown"))
      .select($"doc_id")
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"))
    // one index probe, not two: the grams of both patterns share it
    assert("""Filter term#\d+ IN""".r.findAllIn(plan).size == 1, plan)
    assert("""\bqui\b""".r.findFirstIn(plan).isDefined &&
      """\bbro\b""".r.findFirstIn(plan).isDefined, plan)
    assert(q.as[Long].collect().toList == List(1L))
  }

  test("case-sensitive refine survives the lowercase index") {
    // 'brown' candidates include doc 4 ("BROWN"), refine must drop it
    val got = relation.filter($"text".contains("brown"))
      .select($"doc_id").as[Long].collect().sorted
    assert(got.toList == List(1L))
  }

  test("OR conditions and non-literal patterns are left alone") {
    val q = relation
      .filter($"text".contains("quick") || $"text".contains("sphinx"))
      .select($"doc_id")
    assert(!q.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(q.as[Long].collect().sorted.toList == List(1L, 3L, 5L))
  }

  test("patterns below the gram width fall back to a scan") {
    val q = relation.filter($"text".contains("my")).select($"doc_id")
    assert(!q.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(q.as[Long].collect().sorted.toList == List(2L, 5L))
  }

  test("expressions over the text column are NOT rewritten (bytes differ)") {
    // reverse(text) contains 'kciuq' matches docs containing 'quick' —
    // but 'kciuq' grams don't exist in the index; a rewrite would drop rows
    val q = relation.filter(reverse($"text").contains("kciuq")).select($"doc_id")
    assert(!q.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(q.as[Long].collect().sorted.toList == List(1L, 3L))
  }

  test("unregistered tables are untouched") {
    val other = "/tmp/graft_test_ngramrule/other"
    Seq((9L, "quick")).toDF("doc_id", "text").write.mode("overwrite").parquet(other)
    val q = spark.read.parquet(other).filter($"text".contains("quick"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(q.count() == 1)
  }

  test("rewrite agrees with full scan on the sf corpus") {
    val docs = graft.GraftSession.table(spark, sfDir, "documents")
    val scanned = docs.filter($"text".contains("data"))
      .select($"doc_id").as[Long].collect().sorted
    // route through a freshly built + registered index
    val dPath = "/tmp/graft_test_ngramrule/sfdocs"
    val iPath = "/tmp/graft_test_ngramrule/sfindex"
    docs.select($"doc_id", $"text").write.mode("overwrite").parquet(dPath)
    InvertedIndex.writeTokenPairs(
      NgramIndex.build(spark.read.parquet(dPath), "doc_id", "text"), iPath, 2)
    NgramRewrite.register(dPath, "doc_id", "text", iPath)
    NgramRewrite.install(spark)
    val q = spark.read.parquet(dPath).filter($"text".contains("data")).select($"doc_id")
    assert(q.queryExecution.optimizedPlan.toString.contains("LeftSemi"), q.queryExecution.optimizedPlan.toString)
    assert(q.as[Long].collect().sorted.toList == scanned.toList)
  }
}
