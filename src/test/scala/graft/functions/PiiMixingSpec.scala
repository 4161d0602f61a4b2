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

  test("sequence packing: budget respected, greedy order, oversized isolated") {
    val rnd = new scala.util.Random(5L)
    val docs = (0L until 500L).map(i =>
      (i, if (i == 123L) 900L else 1L + rnd.nextInt(200).toLong))
      .toDF("id", "n_tok")
    val packed = Mixing.packSequences(docs, "id", "n_tok", budget = 512L,
        shards = 8)
      .as[(Long, Long, Long)].collect()
    assert(packed.length == 500 && packed.map(_._1).toSet == (0L until 500L).toSet)
    val tok = docs.as[(Long, Long)].collect().toMap
    // every pack's total fits the budget — except a pack holding one
    // oversized doc alone
    packed.groupBy(p => (p._2, p._3)).foreach { case (key, members) =>
      val total = members.map(m => tok(m._1)).sum
      assert(total <= 512L || members.length == 1,
        s"pack $key overflows with ${members.length} docs, $total tokens")
    }
    // the oversized doc sits alone in its pack
    val (oShard, oPack) = packed.find(_._1 == 123L).map(p => (p._2, p._3)).get
    assert(packed.count(p => p._2 == oShard && p._3 == oPack) == 1)
    // greedy within shard: pack ids are non-decreasing in ascending id order
    packed.groupBy(_._2).values.foreach { ms =>
      val byId = ms.sortBy(_._1).map(_._3)
      assert(byId.zip(byId.drop(1)).forall { case (a, b) => b >= a })
    }
    // deterministic
    val again = Mixing.packSequences(docs, "id", "n_tok", budget = 512L,
      shards = 8).as[(Long, Long, Long)].collect()
    assert(packed.toSet == again.toSet)
  }

  test("sequence packing auto-scales shards with the corpus") {
    // the formula: floor 64 at test scale, grows ~1 shard per 8M docs,
    // capped — so a 100 TB corpus (~25B docs) gets ~3k parallel walks
    // instead of 64 giant serial ones
    assert(Mixing.autoShards(60000L) == 64)
    assert(Mixing.autoShards(512000000L) == 65)
    assert(Mixing.autoShards(25000000000L) == 3126)
    assert(Mixing.autoShards(Long.MaxValue) == (1 << 20))
    // default (AutoShards) packs correctly at the floor and matches an
    // explicit shards=64 run — same pure function of (ids, toks, budget)
    val docs = (0L until 300L).map(i => (i, 1L + i % 200L)).toDF("id", "n_tok")
    val auto = Mixing.packSequences(docs, "id", "n_tok", budget = 512L)
      .as[(Long, Long, Long)].collect()
    val pinned = Mixing.packSequences(docs, "id", "n_tok", budget = 512L,
      shards = 64).as[(Long, Long, Long)].collect()
    assert(auto.toSet == pinned.toSet && auto.length == 300)
  }

  test("temperature mixing flattens source proportions deterministically") {
    // skewed corpus: big 9000 rows, small 1000 rows
    val rows = (0L until 10000L)
      .map(i => (i, if (i < 9000) "big" else "small")).toDF("id", "src")
    val mixed = Mixing.temperatureMix(rows, "src", "id",
      alpha = 0.5, targetRows = 4000L)
    val bySrc = mixed.groupBy("src").count()
      .as[(String, Long)].collect().toMap
    // alpha=0.5: p_big = sqrt(9000)/Z ≈ 0.75, p_small ≈ 0.25 — the
    // small source's MIX share (~25%) far exceeds its natural 10%
    val total = bySrc.values.sum.toDouble
    assert(bySrc("small") / total > 0.18, bySrc.toString)
    assert(bySrc("big") / total < 0.82)
    // expected-size: within hash noise of the target
    assert(math.abs(total - 4000.0) < 400.0, total.toString)
    // deterministic: identical membership run-to-run
    val again = Mixing.temperatureMix(rows, "src", "id", 0.5, 4000L)
      .as[(Long, String)].collect().toSet
    assert(mixed.as[(Long, String)].collect().toSet == again)
    // alpha=1 keeps natural proportions (uniform rate across sources)
    val nat = Mixing.temperatureMix(rows, "src", "id", 1.0, 5000L)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    val natTotal = nat.values.sum.toDouble
    assert(math.abs(nat("big") / natTotal - 0.9) < 0.03, nat.toString)
    // named validation errors
    intercept[IllegalArgumentException](
      Mixing.temperatureMix(rows, "src", "id", 0.0, 100L))
    intercept[IllegalArgumentException](
      Mixing.temperatureMix(rows, "src", "id", 0.5, 0L))
  }

  test("temperature mixing: non-string strata and NULL as its own stratum") {
    // int source column (any type works — strata key by string VALUE)
    val intSrc = (0L until 6000L).map(i => (i, (i % 3).toInt)).toDF("id", "src")
    val m1 = Mixing.temperatureMix(intSrc, "src", "id", 0.5, 3000L)
    val srcs = m1.select("src").distinct().as[Int].collect().toSet
    assert(srcs == Set(0, 1, 2), srcs.toString)
    // NULL source rows are a stratum with a rate like any other — never
    // silently dropped by a rate-0 CASE default
    val withNull = (0L until 6000L)
      .map(i => (i, if (i % 3 == 0) null else s"s${i % 3}"))
      .toDF("id", "src")
    val m2 = Mixing.temperatureMix(withNull, "src", "id", 0.5, 3000L)
    val nullKept = m2.filter(col("src").isNull).count()
    assert(nullKept > 500, s"null stratum kept $nullKept rows")
    // determinism holds across the null stratum too
    val again = Mixing.temperatureMix(withNull, "src", "id", 0.5, 3000L)
    assert(m2.select("id").as[Long].collect().toSet ==
      again.select("id").as[Long].collect().toSet)
  }
}
