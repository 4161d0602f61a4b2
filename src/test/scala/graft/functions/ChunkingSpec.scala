package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, size: Int, overlap: Int): Seq[String] = {
    val starts = Seq(text).toDF("text")
      .select(explode(TextFunctions.chunkStarts(col("text"), size, overlap)).as("s"))
      .as[Int].collect().toSeq
    starts.map(s => text.slice(s, s + size))
  }

  test("chunks tile the document with the requested overlap") {
    val text = "a" * 450
    val cs = chunksOf(text, size = 200, overlap = 50)
    assert(cs.map(_.length) == Seq(200, 200, 150))
    // reassembly: drop each successor's overlapping prefix
    val rebuilt = cs.head + cs.tail.map(_.drop(50)).mkString
    assert(rebuilt == text)
  }

  test("short and empty documents still yield exactly one chunk") {
    assert(chunksOf("tiny", 200, 50) == Seq("tiny"))
    assert(chunksOf("", 200, 50) == Seq(""))
  }

  test("zero overlap means disjoint chunks covering every char") {
    val text = (0 until 500).map(i => ('a' + i % 26).toChar).mkString
    val cs = chunksOf(text, size = 128, overlap = 0)
    assert(cs.mkString == text)
  }

  test("invalid geometry is rejected") {
    intercept[IllegalArgumentException](
      TextFunctions.chunkStarts(col("text"), size = 0, overlap = 0))
    intercept[IllegalArgumentException](
      TextFunctions.chunkStarts(col("text"), size = 100, overlap = 100))
  }
}
