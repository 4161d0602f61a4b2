package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("clustered layout yields near-disjoint per-file key ranges") {
    val df = (0 until 10000).map(i => ((i * 7919) % 1000, i.toLong)).toDF("key", "v")
    val path = Files.createTempDirectory("graft_cluster").toString + "/data"
    Clustering.writeClustered(df, "key", path, numPartitions = 8)

    val stats = Clustering.fileStats(spark, path, "key")
      .select($"key_min".as[Int], $"key_max".as[Int]).collect().sortBy(_._1)
    assert(stats.length >= 4)
    // range partitioning → file ranges may touch at boundaries but not nest
    stats.sliding(2).foreach { case Array((_, aMax), (bMin, _)) =>
      assert(bMin >= aMax - 1, s"overlapping file ranges: $aMax vs $bMin")
    case _ => ()
    }
    // pruned read returns exactly the filtered rows
    val got = Clustering.prunedRead(spark, path, "key", 100L, 200L).count()
    val want = df.filter($"key".between(100, 200)).count()
    assert(got == want)
  }

  test("partial upsert keeps unset columns from the current row") {
    val base = Seq(
      (1L, 10L, "click", 1.0), (1L, 20L, "view", 2.0), (2L, 15L, "buy", 3.0))
      .toDF("pk", "ts", "etype", "value")
    val updates = Seq(
      (1L, 30L, Option.empty[String], 9.0), // partial: only value
      (3L, 5L, Option.empty[String], 7.0))  // new pk, no current row
      .toDF("pk", "ts", "etype", "value")
    val got = Mvcc.partialUpsert(base, updates, "pk", "ts", "ts", Seq("etype", "value"))
      .select($"pk", $"ts", $"etype", $"value")
      .as[(Long, Long, Option[String], Double)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 30L, Some("view"), 9.0))) // etype carried forward
    assert(got(1) == ((2L, 15L, Some("buy"), 3.0)))  // untouched
    assert(got(2) == ((3L, 5L, None, 7.0)))          // new row, no carry
  }
}
