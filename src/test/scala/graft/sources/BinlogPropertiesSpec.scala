package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** ScalaCheck-generated coverage for the binlog payload + file codecs:
  * arbitrary values of every supported type must survive encode→decode
  * exactly, including empty payloads, empty strings, unicode, and
  * extreme numerics — the byte format is a MIGRATION surface, so
  * robustness here is correctness, not polish.
  */
class BinlogPropertiesSpec extends SparkSpec {
  import Binlog.DType

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val longs = Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
  private val doubles = Gen.listOf(Gen.oneOf(
    Gen.chooseNum(-1e12, 1e12),
    Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, 1e308)))
  private val strings = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr,
    Gen.const(""),
    Gen.const("héllo wörld — 中文 ไทย"),
    Gen.asciiPrintableStr))
  private val vectors = Gen.listOf(
    Gen.listOfN(4, Gen.chooseNum(-1e6f, 1e6f)).map(_.toSeq))

  test("Int64 payloads round-trip exactly") {
    (1L to 20L).foreach { seed =>
      val vs = sample(longs, seed)
      assert(Binlog.decodePayload(DType.Int64,
        Binlog.encodePayload(DType.Int64, vs)) == vs)
    }
  }

  test("Double payloads round-trip exactly (bit-level)") {
    (1L to 20L).foreach { seed =>
      val vs = sample(doubles, seed)
      val got = Binlog.decodePayload(DType.Double,
        Binlog.encodePayload(DType.Double, vs))
      assert(got.map(v => java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double]))
        == vs.map(java.lang.Double.doubleToRawLongBits))
    }
  }

  test("VarChar payloads round-trip exactly, unicode included") {
    (1L to 20L).foreach { seed =>
      val vs = sample(strings, seed)
      assert(Binlog.decodePayload(DType.VarChar,
        Binlog.encodePayload(DType.VarChar, vs)) == vs)
    }
  }

  test("FloatVector payloads round-trip exactly") {
    (1L to 20L).foreach { seed =>
      val vs = sample(vectors, seed)
      assert(Binlog.decodePayload(DType.FloatVector,
        Binlog.encodePayload(DType.FloatVector, vs)) == vs)
    }
  }

  test("file round trip: arbitrary event splits preserve concatenated values") {
    val valuesAndSplit = for {
      vs <- Gen.listOfN(30, Gen.chooseNum(-1000L, 1000L))
      cut <- Gen.chooseNum(0, 30)
    } yield (vs, cut)
    (1L to 10L).foreach { seed =>
      val (vs, cut) = sample(valuesAndSplit, seed)
      val dir = java.nio.file.Files.createTempDirectory("graft_binlog_prop_")
      val f = s"$dir/log"
      val (a, b) = vs.splitAt(cut)
      Binlog.writeFile(f,
        Binlog.Descriptor(1, 1, 1, 100, 1, 2, Binlog.DType.Int64, "pk"),
        Seq(Binlog.DataEvent(1, 1, 1, a), Binlog.DataEvent(1, 2, 2, b)))
      val (_, events) = Binlog.readFile(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)))
      assert(events.flatMap(_.values) == vs)
    }
  }
}
