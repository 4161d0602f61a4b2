package graft.operators

import graft.SparkSpec

class IndexDispatchSpec extends SparkSpec {
  import spark.implicits._

  test("hybrid index picks BITMAP below the cardinality cap, INVERTED above") {
    val low = Seq.tabulate(100)(i => (i.toLong, s"v${i % 5}")).toDF("id", "v")
    val high = Seq.tabulate(100)(i => (i.toLong, s"v$i")).toDF("id", "v")
    assert(InvertedIndex.buildHybridIndex(low, "id", "v", 10)._1 == "BITMAP")
    assert(InvertedIndex.buildHybridIndex(high, "id", "v", 10)._1 == "INVERTED")
    // both forms answer the same lookup
    val (_, idx) = InvertedIndex.buildHybridIndex(low, "id", "v", 10)
    val ids = InvertedIndex.lookupValues(idx, "v", Seq("v3"))
      .as[Long].collect().toSet
    assert(ids == (0 until 100).filter(_ % 5 == 3).map(_.toLong).toSet)
  }

  test("autoindex selects by dtype and cardinality") {
    val lowStr = Seq.tabulate(50)(i => (i.toLong, s"s${i % 3}")).toDF("id", "v")
    val highStr = Seq.tabulate(50)(i => (i.toLong, s"s$i")).toDF("id", "v")
    val highNum = Seq.tabulate(50)(i => (i.toLong, i * 1.5)).toDF("id", "v")
    assert(InvertedIndex.autoIndexType(lowStr, "v", 10) == "BITMAP")
    assert(InvertedIndex.autoIndexType(highStr, "v", 10) == "TRIE")
    assert(InvertedIndex.autoIndexType(highNum, "v", 10) == "STL_SORT")
  }
}
