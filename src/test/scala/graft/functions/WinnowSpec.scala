package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fps(texts: (Long, String)*): Map[Long, Seq[Long]] =
    texts.toSeq.toDF("id", "text")
      .select(col("id"), TextFunctions.winnowFingerprints(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  test("fingerprints match a reference python-style model (k=5, w=4)") {
    // independently computed: normalize, polynomial k-gram hashes
    // (base 257 mod 2^31-1), min per window of 4, distinct sorted
    def model(text: String, k: Int = 5, w: Int = 4): Seq[Long] = {
      val P = 2147483647L
      val t = text.toLowerCase.filter(c => c.isDigit || (c >= 'a' && c <= 'z'))
      if (t.length < k) return Seq.empty
      val hashes = (0 to t.length - k).map { i =>
        t.substring(i, i + k).foldLeft(0L)((h, c) => (h * 257 + c) % P)
      }
      val mins =
        if (hashes.size < w) Seq(hashes.min)
        else (0 to hashes.size - w).map(i => hashes.slice(i, i + w).min)
      mins.distinct.sorted
    }
    val texts = Seq(
      1L -> "The quick brown fox jumps over the lazy dog, again & AGAIN!",
      2L -> "pack my box with five dozen liquor jugs",
      3L -> "ab",            // shorter than k after normalization -> empty
      4L -> "abcdef",        // m=2 hashes < w -> single min
      5L -> "")
    val got = fps(texts: _*)
    texts.foreach { case (id, txt) => assert(got(id) == model(txt), s"doc $id") }
  }

  test("shared substrings of length >= k+w-1 share a fingerprint; disjoint docs do not") {
    val shared = "acommonstretchofcharacters"
    val got = fps(
      1L -> s"first document body $shared tail one",
      2L -> s"totally different prefix $shared other end",
      3L -> "zq9 xv7 kpw unrelated content entirely 318")
    assert(got(1L).toSet.intersect(got(2L).toSet).nonEmpty)
    assert(got(1L).toSet.intersect(got(3L).toSet).isEmpty)
  }

  test("whitespace / punctuation / case changes do not alter fingerprints") {
    val got = fps(
      1L -> "Winnowing picks robust document fingerprints",
      2L -> "  WINNOWING, picks; robust -- document FINGERPRINTS!?")
    assert(got(1L) == got(2L))
  }

  test("randomized strings agree with the independent model (seeded)") {
    def model(text: String, k: Int = 5, w: Int = 4): Seq[Long] = {
      val P = 2147483647L
      val t = text.toLowerCase.filter(c => c.isDigit || (c >= 'a' && c <= 'z'))
      if (t.length < k) return Seq.empty
      val hashes = (0 to t.length - k).map { i =>
        t.substring(i, i + k).foldLeft(0L)((h, c) => (h * 257 + c) % P)
      }
      val mins =
        if (hashes.size < w) Seq(hashes.min)
        else (0 to hashes.size - w).map(i => hashes.slice(i, i + w).min)
      mins.distinct.sorted
    }
    val rnd = new scala.util.Random(20260812L)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 .,;!?ÄÖüß中文"
    val texts = (1L to 60L).map { id =>
      val len = rnd.nextInt(40) // includes lengths straddling k and k+w-1
      id -> Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val got = fps(texts: _*)
    texts.foreach { case (id, txt) =>
      assert(got(id) == model(txt), s"doc $id text='$txt'")
    }
  }

  test("SQL registration evaluates the same expression") {
    val viaSql = spark.sql(
      """SELECT winnow_fingerprint(
        |  regexp_replace(lower('Pack my Box!'), '[^a-z0-9]', ''), 5, 4) AS fp""".stripMargin)
      .collect().head.getSeq[Long](0)
    assert(viaSql == fps(1L -> "Pack my Box!")(1L))
  }
}
