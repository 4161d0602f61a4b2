package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Mixing

class PiiMixingSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.scrubPii($"t")).head().getString(0)

  test("scrubPii redacts emails, phones, ipv4 and leaves clean text alone") {
    assert(scrub("mail me at jo.doe+spam@sub.example.co.uk today") ==
      "mail me at [EMAIL] today")
    assert(scrub("call +1 (555) 010-7788 now") == "call [PHONE] now")
    assert(scrub("host 10.0.42.7 down") == "host [IPV4] down")
    assert(scrub("a perfectly clean sentence") == "a perfectly clean sentence")
  }

  test("a long digit run is consumed whole, never half-redacted") {
    val out = scrub("order 123456789012345 shipped")
    assert(out == "order [PHONE] shipped") // whole run, no trailing digits
  }

  test("piiCount counts matches per kind over the raw text") {
    val n = Seq("x@y.io and 10.0.0.1 and 555-010-7788").toDF("t")
      .select(TextFunctions.piiCount($"t")).head().getInt(0)
    // ip also matches the dotted-phone shape: email(1) + ipv4(1) + phone(2)
    assert(n == 4)
  }

  test("stratified sample is deterministic and respects per-stratum rates") {
    val df = (0L until 10000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val once = Mixing.stratifiedSample(df, "lang", "id", Map("en" -> 10))
    val twice = Mixing.stratifiedSample(df, "lang", "id", Map("en" -> 10))
    assert(once.collect().toSet == twice.collect().toSet) // reproducible
    val byLang = once.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(byLang("de") == 5000) // default 100%: untouched
    val enRate = byLang("en").toDouble / 5000
    assert(enRate > 0.05 && enRate < 0.15, s"en kept $enRate, wanted ~0.10")
  }

  test("stratified sample rejects out-of-range rates") {
    val df = Seq((1L, "en")).toDF("id", "lang")
    intercept[IllegalArgumentException](
      Mixing.stratifiedSample(df, "lang", "id", Map("en" -> 101)))
  }
}
