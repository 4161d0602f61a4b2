package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IndexParamCheck._

/** indexparamcheck contract (constraints.go ranges + the per-kind
  * checkers) — accept/reject matrix, Spark-free.
  */
class IndexParamCheckSpec extends AnyFunSuite {

  private def rejects(msgPart: String)(f: => Unit): Unit = {
    val e = intercept[IllegalArgumentException](f)
    assert(e.getMessage.contains(msgPart), e.getMessage)
  }

  test("metric compatibility per vector family") {
    check("IVF_FLAT", FloatVector, Map("metric_type" -> "COSINE"))
    check("BIN_IVF_FLAT", BinaryVector, Map("metric_type" -> "JACCARD"))
    check("SPARSE_WAND", SparseVector, Map("metric_type" -> "BM25"))
    rejects("not found or not supported")(
      check("IVF_FLAT", FloatVector, Map("metric_type" -> "HAMMING")))
    rejects("not found or not supported")(
      check("SPARSE_WAND", SparseVector, Map("metric_type" -> "L2")))
    rejects("not found or not supported")(
      check("BIN_FLAT", BinaryVector, Map("metric_type" -> "COSINE")))
    // missing metric is a rejection, never a silent default
    rejects("not found or not supported")(
      check("HNSW", FloatVector, Map.empty))
  }

  test("knowhere numeric ranges: nlist, nbits, efConstruction, M, rbq_bits") {
    val m = Map("metric_type" -> "L2")
    check("IVF_FLAT", FloatVector, m + ("nlist" -> "65536"))
    rejects("out of range: [1, 65536]")(
      check("IVF_FLAT", FloatVector, m + ("nlist" -> "65537")))
    rejects("out of range: [1, 65536]")(
      check("IVF_FLAT", FloatVector, m + ("nlist" -> "0")))
    check("IVF_PQ", FloatVector, m + ("nbits" -> "16"))
    rejects("out of range: [1, 16]")(
      check("IVF_PQ", FloatVector, m + ("nbits" -> "17")))
    check("HNSW", FloatVector, m + ("M" -> "2048", "efConstruction" -> "360"))
    rejects("out of range: [2, 2048]")(
      check("HNSW", FloatVector, m + ("M" -> "2049")))
    rejects("out of range: [2, 2048]")(
      check("HNSW", FloatVector, m + ("M" -> "1")))
    rejects("out of range")(
      check("HNSW", FloatVector, m + ("efConstruction" -> "0")))
    // graph-family quantizer params (idx_hnsw_{sq,pq,prq}.py)
    check("HNSW_SQ", FloatVector, m + ("sq_type" -> "bf16"))
    rejects("invalid scalar quantizer type")(
      check("HNSW_SQ", FloatVector, m + ("sq_type" -> "FP32")))
    check("HNSW_PQ", FloatVector, m + ("nbits" -> "24"))
    rejects("out of range: [1, 24]")(
      check("HNSW_PQ", FloatVector, m + ("nbits" -> "25")))
    check("HNSW_PRQ", FloatVector, m + ("nrq" -> "16"))
    rejects("out of range: [1, 16]")(
      check("HNSW_PRQ", FloatVector, m + ("nrq" -> "17")))
    rejects("should be in range [1, 9]")(
      check("IVF_RABITQ", FloatVector, m + ("rbq_bits" -> "10")))
    // refine_type enum, case-insensitive (idx_ivf_rabitq.py)
    check("IVF_RABITQ", FloatVector, m + ("refine_type" -> "SQ6"))
    rejects("invalid refine type : PQ")(
      check("IVF_RABITQ", FloatVector, m + ("refine_type" -> "PQ")))
    rejects("must be an integer")(
      check("IVF_FLAT", FloatVector, m + ("nlist" -> "lots")))
  }

  test("sparse extras: inverted_index_algo enum, drop_ratio_build range") {
    val m = Map("metric_type" -> "IP")
    check("SPARSE_INVERTED_INDEX", SparseVector,
      m + ("inverted_index_algo" -> "DAAT_MAXSCORE", "drop_ratio_build" -> "0.3"))
    rejects("sparse inverted index algo")(
      check("SPARSE_INVERTED_INDEX", SparseVector,
        m + ("inverted_index_algo" -> "DAAT_TURBO")))
    rejects("out of range: [0, 1)")(
      check("SPARSE_INVERTED_INDEX", SparseVector, m + ("drop_ratio_build" -> "1.0")))
  }

  test("bitmap rules: pk ban, field families, JSON cast, cardinality cap") {
    check("BITMAP", IntField, Map.empty)
    check("BITMAP", ArrayField(VarCharField), Map.empty)
    rejects("primary key not supported")(
      check("BITMAP", IntField, Map.empty, isPrimaryKey = true))
    rejects("only supported on bool, int, string and array")(
      check("BITMAP", FloatField, Map.empty))
    rejects("only supported on bool, int, string for array field")(
      check("BITMAP", ArrayField(FloatField), Map.empty))
    rejects("must specify cast type")(check("BITMAP", JsonField, Map.empty))
    rejects("not supported for BITMAP")(
      check("BITMAP", JsonField, Map("json_cast_type" -> "DOUBLE")))
    rejects("must specify json path")(
      check("BITMAP", JsonField, Map("json_cast_type" -> "VARCHAR")))
    check("BITMAP", JsonField,
      Map("json_cast_type" -> "VARCHAR", "json_path" -> "$.k"))
    rejects("out of range: [1, 1000]")(
      check("BITMAP", IntField, Map("bitmap_cardinality_limit" -> "1001")))
  }

  test("ngram rules: field types, grams present, positive, ordered") {
    check("NGRAM", VarCharField, Map("min_gram" -> "2", "max_gram" -> "3"))
    rejects("can only be created on VARCHAR or JSON")(
      check("NGRAM", IntField, Map("min_gram" -> "2", "max_gram" -> "3")))
    rejects("must specify both min_gram and max_gram")(
      check("NGRAM", VarCharField, Map("min_gram" -> "2")))
    rejects("invalid min_gram or max_gram")(
      check("NGRAM", VarCharField, Map("min_gram" -> "3", "max_gram" -> "2")))
    rejects("invalid min_gram or max_gram")(
      check("NGRAM", VarCharField, Map("min_gram" -> "0", "max_gram" -> "2")))
    rejects("only supports VARCHAR cast type")(
      check("NGRAM", JsonField, Map("json_cast_type" -> "DOUBLE",
        "min_gram" -> "2", "max_gram" -> "3")))
  }

  test("fmindex rules: sample rate [4,256], block bytes power-of-two [8,128]") {
    check("FMINDEX", VarCharField, Map.empty)
    check("FMINDEX", VarCharField,
      Map("fm_sa_sample_rate" -> "256", "fm_block_bytes" -> "64"))
    rejects("must be in [4, 256]")(
      check("FMINDEX", VarCharField, Map("fm_sa_sample_rate" -> "3")))
    rejects("must be in [4, 256]")(
      check("FMINDEX", VarCharField, Map("fm_sa_sample_rate" -> "257")))
    rejects("must be an integer")(
      check("FMINDEX", VarCharField, Map("fm_sa_sample_rate" -> "abc")))
    rejects("power-of-two")(
      check("FMINDEX", VarCharField, Map("fm_block_bytes" -> "48")))
    rejects("power-of-two")(
      check("FMINDEX", VarCharField, Map("fm_block_bytes" -> "256")))
  }

  test("unknown index type is a named rejection") {
    rejects("invalid index type")(check("BTREE", IntField, Map.empty))
  }
}
