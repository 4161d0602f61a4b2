package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Stage-by-stage timing of the simhash near-dup pipeline at one SF. */
object SimhashDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = GraftSession.table(spark, dir, "documents").select(col("doc_id"), col("text"))
    val nearDup = base.filter(col("doc_id") < 100)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" zzz")).as("text"))
    val d = base.unionByName(nearDup)
    time("0 count corpus")(d.count())
    val sigs = d.select(col("doc_id"),
      Dedup.simhash60(TextFunctions.tokenize(col("text"))).as("sim"))
    time("1 signatures only")(sigs.write.format("noop").mode("overwrite").save())
    time("2 full simhashPairs")(
      Dedup.simhashPairs(d, "doc_id", "text", maxDist = 3)
        .write.format("noop").mode("overwrite").save())
    time("3 full again (warm)")(
      Dedup.simhashPairs(d, "doc_id", "text", maxDist = 3)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
