package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expr.ExprCompiler

/** The LIKE fast paths must reach the PHYSICAL parquet scan: a
  * prefix-only pattern lowers to StartsWith and an escaped-literal
  * pattern to EqualTo (optimizeLikePattern's Equal/Prefix classes), so
  * row groups prune on string min/max stats. If the compile ever
  * regresses to a generic Like for these shapes, 100 TB prefix lookups
  * lose their pushdown and this spec fails.
  */
class LikePushdownSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = "/tmp/graft_test_likepush_" + System.nanoTime()
    (0L until 200L).map(i => (i, if (i % 7 == 0) s"user_$i" else s"name%$i"))
      .toDF("id", "s").write.parquet(d)
    d
  }

  private def plannedWith(filter: String): String = {
    val df = spark.read.parquet(dir)
    val out = df.filter(ExprCompiler.compile(filter, df))
    out.collect()
    out.queryExecution.executedPlan.toString
  }

  test("prefix LIKE pushes StringStartsWith to the parquet scan") {
    val plan = plannedWith("""s like "user\\_1%"""")
    assert(plan.matches("(?s).*PushedFilters:[^\\]]*StringStartsWith\\(s,user_1.*"),
      s"prefix LIKE not pushed as StartsWith:\n$plan")
  }

  test("escaped-literal LIKE pushes EqualTo to the parquet scan") {
    val plan = plannedWith("""s like "name\\%42"""")
    assert(plan.matches("(?s).*PushedFilters:[^\\]]*EqualTo\\(s,name%42.*"),
      s"escaped-literal LIKE not pushed as EqualTo:\n$plan")
  }

  test("anchored literal regex lowers to pushed StartsWith (regexToLike)") {
    val plan = plannedWith("""s =~ "^user"""")
    assert(plan.matches("(?s).*PushedFilters:[^\\]]*StringStartsWith\\(s,user\\).*"),
      s"anchored-literal regex not pushed as StartsWith:\n$plan")
  }

  test("generic wildcard LIKE still pushes its fixed literal prefix") {
    // '_' forces the generic Like kernel, but the chars before the
    // first wildcard are implied — the conjoined StartsWith must reach
    // the scan so row groups keep pruning (extract_fixed_prefix_from_
    // pattern's job in the reference)
    val plan = plannedWith("""s like "user_1%"""")
    assert(plan.matches("(?s).*PushedFilters:[^\\]]*StringStartsWith\\(s,user\\).*"),
      s"fixed prefix of a wildcard LIKE not pushed:\n$plan")
  }
}
