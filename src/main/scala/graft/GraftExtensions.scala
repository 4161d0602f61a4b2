package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions._

/** SparkSessionExtensions wiring: registers graft's custom Catalyst
  * expressions as SQL functions, so the engine's surface is reachable
  * from plain `spark.sql(...)` (and thus from JDBC/thrift frontends)
  * exactly as from the Column API. Attach with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` —
  * [[GraftSession.local]] does.
  *
  * Only expressions that are self-contained (no driver-trained model
  * object in the constructor) are registered; model-bound expressions
  * (IVF/PQ/SQ8 codebooks, SRP planes) stay Column-API-only by design —
  * their state is a training artifact, not a literal.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litString(e: Expression, fn: String, arg: String): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a string literal, got $other")
  }

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // MVCC ts predicates over normalizeTs'd columns fold back to plain
    // timestamp comparisons so the parquet scan pushes + zone-map-prunes
    // them (the engine's hottest filter — see TsDomainRewrite).
    ext.injectOptimizerRule(_ => graft.plans.TsDomainRewrite)

    ext.injectFunction((FunctionIdentifier("vector_distance"),
      info("vector_distance", "_FUNC_(a, b, 'L2'|'IP'|'COSINE') - typed vector distance"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "vector_distance(a, b, metric)")
        VectorDistance(children(0), children(1),
          Metric.parse(litString(children(2), "vector_distance", "metric")))
      }))

    ext.injectFunction((FunctionIdentifier("simhash60"),
      info("simhash60", "_FUNC_(tokens) - portable 60-bit md5 simhash"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "simhash60(tokens)")
        SimHash60(children.head)
      }))

    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "_FUNC_(tokens, numHashes, shingleSize) - fused minhash signature"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "minhash_signature(tokens, numHashes, shingleSize)")
        MinHashSignature(children.head,
          litInt(children(1), "minhash_signature", "numHashes"),
          litInt(children(2), "minhash_signature", "shingleSize"))
      }))

    ext.injectFunction((FunctionIdentifier("token_shingles"),
      info("token_shingles",
        "_FUNC_(tokens, n, distinct) - fused word n-gram shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "token_shingles(tokens, n, distinct)")
        val distinct = children(2) match {
          case Literal(b: Boolean, _) => b
          case other => throw new IllegalArgumentException(
            s"token_shingles: distinct must be a boolean literal, got $other")
        }
        TokenShingles(children.head,
          litInt(children(1), "token_shingles", "n"), distinct)
      }))

    ext.injectFunction((FunctionIdentifier("winnow_fingerprint"),
      info("winnow_fingerprint",
        "_FUNC_(normalizedText, k, w) - winnowing rolling-hash fingerprints"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "winnow_fingerprint(normalizedText, k, w)")
        WinnowFingerprint(children.head,
          litInt(children(1), "winnow_fingerprint", "k"),
          litInt(children(2), "winnow_fingerprint", "w"))
      }))

    for ((name, mode) <- Seq(
        "fp16_encode" -> NarrowVectorCodec.Fp16Enc,
        "fp16_decode" -> NarrowVectorCodec.Fp16Dec,
        "bf16_encode" -> NarrowVectorCodec.Bf16Enc,
        "bf16_decode" -> NarrowVectorCodec.Bf16Dec,
        "int8_encode" -> NarrowVectorCodec.Int8Enc,
        "int8_decode" -> NarrowVectorCodec.Int8Dec)) {
      ext.injectFunction((FunctionIdentifier(name),
        info(name, s"_FUNC_(v) - ${mode.name} narrow-vector codec"),
        (children: Seq[Expression]) => {
          require(children.length == 1, s"$name(v)")
          NarrowVectorCodec(children.head, mode)
        }))
    }
  }
}
