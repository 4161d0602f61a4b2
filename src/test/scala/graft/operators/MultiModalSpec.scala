package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultiModalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.GraftSession.table(spark, sfDir, "documents")
    .filter($"doc_id" < 20)
  private lazy val withPayload = MultiModal.attachPayload(docs, "doc_id", "text")

  test("resize maps every payload to exactly the target size") {
    val resized = MultiModal.resize(withPayload, "doc_id", targetBytes = 64)
    val sizes = resized.select($"n_bytes").as[Long].collect()
    assert(sizes.nonEmpty && sizes.forall(_ == 64L))
    // deterministic: first byte of the resized payload is the original head
    val pair = withPayload.select($"doc_id", $"payload")
      .join(resized.select($"doc_id", $"payload".as("resized")), "doc_id")
      .as[(Long, Array[Byte], Array[Byte])].head()
    assert(pair._3(0) == pair._2(0))
  }

  test("frame sampling fans one row out to one row per sampled frame") {
    val frames = MultiModal.sampleFrames(withPayload, "doc_id", frameBytes = 16, stride = 2)
    val byDoc = frames.groupBy($"doc_id").agg(count(lit(1)).as("n"),
        min($"frame_idx").as("lo"), max($"frame_idx").as("hi"))
      .as[(Long, Long, Long, Long)].collect()
    val lens = withPayload.select($"doc_id", length($"payload").cast("long"))
      .as[(Long, Long)].collect().toMap
    byDoc.foreach { case (id, n, lo, hi) =>
      val expect = (0 until (lens(id) / 16).toInt by 2).size.toLong
      assert(n == expect, s"doc $id: $n frames, expected $expect")
      assert(lo == 0L && hi == (expect - 1) * 2)
    }
    // every frame is exactly frameBytes long
    assert(frames.select(length($"frame")).as[Int].collect().forall(_ == 16))
  }
}
