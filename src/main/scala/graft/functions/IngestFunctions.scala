package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Ingest-time function dispatch (reference: FunctionSchema dispatch in
  * internal/util/function/function.go:36-47 — BM25, MinHash and
  * TextEmbedding runners derive output fields from input fields at
  * insert/import time; providers under internal/util/function/embedding/
  * call external embedding APIs).
  *
  * Spark-first shape: a function schema is a declarative (input column →
  * output column) mapping compiled to native Column expressions, applied
  * to any DataFrame before it lands — the same expression serves batch
  * inserts, bulk import, and the streaming ingest path, and stays inside
  * whole-stage codegen (no UDF). The dense-embedding provider is
  * pluggable exactly like [[graft.operators.Fusion.modelRerank]]'s
  * scorer: external providers (openai / cohere / bedrock / ali in the
  * reference) need egress, so the default is a deterministic local
  * stand-in and the external names reject explicitly.
  */
object IngestFunctions {

  sealed trait FunctionSchema {
    def inputField: String
    def outputField: String
  }

  /** BM25: text → sparse term-frequency map. The corpus statistics (df,
    * avgdl) live in the index build ([[graft.operators.Bm25.build]]),
    * exactly like the reference where the ingest function emits raw term
    * frequencies and the IDF oracle aggregates globally.
    */
  final case class Bm25Function(inputField: String, outputField: String)
      extends FunctionSchema

  /** MinHash: text → fixed-length signature (Array[Long]) via the
    * codegen'd [[MinHashSignature]] expression.
    */
  final case class MinHashFunction(inputField: String, outputField: String,
      numHashes: Int = 64, shingleSize: Int = 3) extends FunctionSchema

  /** TextEmbedding: text → dense Array[Float] of `dim`, through a
    * provider (reference providers: embedding/openai_embedding_provider.go
    * et al.; dim validation mirrors ParseAndCheckFieldDim).
    */
  final case class TextEmbeddingFunction(inputField: String, outputField: String,
      dim: Int, provider: EmbeddingProvider = CharFreqEmbedding)
      extends FunctionSchema

  /** A dense-embedding provider: text Column → Array[Float] Column of
    * `dim`. Implementations must be deterministic per (text, dim).
    */
  trait EmbeddingProvider {
    def name: String
    def embed(text: Column, dim: Int): Column
  }

  /** Deterministic local stand-in provider: the L2-normalized
    * letter-frequency vector of the lowercased text over the first `dim`
    * letters of the alphabet. Not a semantic embedding — it is the
    * egress-free stand-in that keeps the whole ingest→store→search
    * pipeline real (schema, dim checks, search integration), the same
    * posture as Fusion.tokenOverlapScorer for model rerank. Pure native
    * expressions → whole-stage codegen.
    */
  object CharFreqEmbedding extends EmbeddingProvider {
    val name = "local_charfreq"
    private val alphabet = "abcdefghijklmnopqrstuvwxyz"

    def embed(text: Column, dim: Int): Column = {
      require(dim >= 1 && dim <= alphabet.length,
        s"local_charfreq supports dim in [1, ${alphabet.length}], got $dim")
      val lowered = lower(text)
      // count of letter j = len(text) - len(text with letter j removed);
      // integer-valued doubles, so the norm arithmetic below is exact in
      // IEEE terms and reproducible across engines
      val counts = (0 until dim).map { j =>
        (length(lowered) -
          length(replace(lowered, lit(alphabet(j).toString), lit(""))))
          .cast("double")
      }
      val arr = array(counts: _*)
      val norm = sqrt(aggregate(arr, lit(0.0d), (acc, x) => acc + x * x))
      when(norm === lit(0.0d), arr.cast("array<float>"))
        .otherwise(transform(arr, x => x / norm).cast("array<float>"))
    }
  }

  /** External embedding providers are egress-bound — named so a schema
    * written for the reference still parses, but use rejects explicitly
    * (the same stance as the dictionary analyzers).
    */
  final case class ExternalEmbedding(providerName: String) extends EmbeddingProvider {
    val name: String = providerName
    def embed(text: Column, dim: Int): Column =
      throw new UnsupportedOperationException(
        s"embedding provider '$providerName' requires external API egress; " +
          "supply a local EmbeddingProvider instead")
  }

  /** The output expression for one function schema (the BatchRun
    * analogue — but declarative, so Catalyst fuses it into the ingest
    * scan instead of a row-batch callback).
    */
  def outputColumn(schema: FunctionSchema): Column = schema match {
    case Bm25Function(in, _) =>
      SparseFunctions.termFreqs(TextFunctions.tokenize(col(in)))
    case MinHashFunction(in, _, n, k) =>
      TextFunctions.minhashSignature(TextFunctions.tokenize(col(in)), n, k)
    case TextEmbeddingFunction(in, _, dim, provider) =>
      provider.embed(col(in), dim)
  }

  /** Apply function schemas to an ingest batch: each adds its output
    * column (reference: the proxy runs collection FunctionSchemas on
    * every insert/import batch before the data lands).
    */
  def applyAll(df: DataFrame, schemas: Seq[FunctionSchema]): DataFrame = {
    schemas.foreach { s =>
      require(df.columns.contains(s.inputField),
        s"ingest function input field '${s.inputField}' missing from batch")
      require(!df.columns.contains(s.outputField),
        s"ingest function output field '${s.outputField}' already present")
    }
    schemas.foldLeft(df)((d, s) => d.withColumn(s.outputField, outputColumn(s)))
  }
}
