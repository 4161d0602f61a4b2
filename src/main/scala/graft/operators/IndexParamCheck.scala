package graft.operators

/** Index-definition validation (reference internal/util/indexparamcheck:
  * constraints.go:8-83, vector_index_checker.go StaticCheck,
  * bitmap_index_checker.go, ngram_index_checker.go; the numeric ranges
  * that knowhere enforces C++-side are the published constants in
  * constraints.go). Pure driver-side parameter hygiene: every rejection
  * is a named error BEFORE any build job is planned.
  */
object IndexParamCheck {

  // metric compatibility per vector family (constraints.go:57-61)
  val FloatVectorMetrics: Seq[String] = Seq("L2", "IP", "COSINE")
  val SparseFloatVectorMetrics: Seq[String] = Seq("IP", "BM25")
  val BinaryVectorMetrics: Seq[String] =
    Seq("HAMMING", "JACCARD", "SUBSTRUCTURE", "SUPERSTRUCTURE", "MHJACCARD")
  val IntVectorMetrics: Seq[String] = Seq("L2", "IP", "COSINE")

  val SparseInvertedIndexAlgos: Seq[String] = Seq("TAAT_NAIVE", "DAAT_WAND",
    "DAAT_MAXSCORE", "BLOCK_MAX_MAXSCORE", "BLOCK_MAX_WAND", "SINDI")

  // knowhere ranges (constraints.go:9-22)
  val MinNList = 1
  val MaxNList = 65536
  val MinNBits = 1
  val MaxNBits = 16
  val HnswMinEfConstruction = 1
  val HnswMaxEfConstruction = Int.MaxValue
  val HnswMinM = 1
  val HnswMaxM = 2048
  val MaxBitmapCardinalityLimit = 1000

  /** Field families the checkers dispatch on. */
  sealed trait FieldKind
  case object FloatVector extends FieldKind
  case object SparseVector extends FieldKind
  case object BinaryVector extends FieldKind
  case object IntVector extends FieldKind
  case object VarCharField extends FieldKind
  /** DataType.TEXT — LOB-backed long text. Rejects EVERY user-created
    * scalar index (only text/BM25 FUNCTION indexes apply to TEXT —
    * test_milvus_client_text_lob.py:1305, all six VARCHAR index kinds
    * plus AUTOINDEX raise the same named error).
    */
  case object TextField extends FieldKind
  case object JsonField extends FieldKind
  case object BoolField extends FieldKind
  case object IntField extends FieldKind
  case object FloatField extends FieldKind
  final case class ArrayField(element: FieldKind) extends FieldKind

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def intParam(params: Map[String, String], key: String): Option[Int] =
    params.get(key).map { v =>
      try v.trim.toInt
      catch { case _: NumberFormatException =>
        fail(s"$key for index must be an integer, got: $v")
      }
    }

  private def checkRange(params: Map[String, String], key: String,
      lo: Int, hi: Int): Unit =
    intParam(params, key).foreach { v =>
      if (v < lo || v > hi) fail(s"$key $v out of range: [$lo, $hi]")
    }

  /** StaticCheck's metric gate (vector_index_checker.go:53-86). */
  def checkVectorMetric(kind: FieldKind, params: Map[String, String]): Unit = {
    def gate(supported: Seq[String]): Unit = {
      val m = params.getOrElse("metric_type", "")
      if (!supported.contains(m)) fail(
        s"metric type $m not found or not supported, supported: " +
          supported.mkString("[", " ", "]"))
    }
    kind match {
      case FloatVector  => gate(FloatVectorMetrics)
      case SparseVector =>
        gate(SparseFloatVectorMetrics)
        params.get("inverted_index_algo").foreach { algo =>
          if (!SparseInvertedIndexAlgos.contains(algo)) fail(
            s"sparse inverted index algo $algo not found or not supported, " +
              s"supported: ${SparseInvertedIndexAlgos.mkString("[", " ", "]")}")
        }
        params.get("drop_ratio_build").foreach { v =>
          val d = try v.trim.toDouble catch {
            case _: NumberFormatException =>
              fail(s"drop_ratio_build must be a number, got: $v")
          }
          if (d < 0.0 || d >= 1.0) fail(
            s"drop_ratio_build $d out of range: [0, 1)")
        }
      case BinaryVector => gate(BinaryVectorMetrics)
      case IntVector    => gate(IntVectorMetrics)
      case _            => fail("vector index on a non-vector field")
    }
  }

  /** Unified entry: index type + field family + params (+ is-pk for the
    * bitmap rule). Accepts silently, raises the checker's named error.
    */
  def check(indexType: String, kind: FieldKind, params: Map[String, String],
      isPrimaryKey: Boolean = false): Unit = {
    // the TEXT gate dispatches on the FIELD before any index-type rule:
    // the reference rejects every user index kind on TEXT with one error
    // (INVERTED/BITMAP/TRIE/STL_SORT/NGRAM/AUTOINDEX all land here)
    if (kind == TextField)
      fail("TEXT field does not support user-created scalar index")
    checkTyped(indexType, kind, params, isPrimaryKey)
  }

  private def checkTyped(indexType: String, kind: FieldKind,
      params: Map[String, String], isPrimaryKey: Boolean): Unit = indexType match {
    // AUTOINDEX on a SCALAR family (auto_index_checker.go): the engine
    // picks the concrete index itself. Must dispatch BEFORE the vector
    // branch below, which would misroute a scalar AUTOINDEX into the
    // metric checker. JSON keeps the cast params every JSON index kind
    // requires — AUTOINDEX is not an unvalidated bypass.
    case "AUTOINDEX" if !Seq(FloatVector, SparseVector, BinaryVector,
        IntVector).contains(kind) =>
      kind match {
        case JsonField =>
          val cast = params.getOrElse("json_cast_type",
            fail("json index must specify cast type"))
          if (!Seq("BOOL", "VARCHAR", "DOUBLE").contains(cast.trim.toUpperCase))
            fail(s"json_cast_type $cast is not supported for AUTOINDEX index")
          if (!params.contains("json_path"))
            fail("json index must specify json path")
        case BoolField | IntField | FloatField | VarCharField => ()
        case ArrayField(BoolField | IntField | FloatField | VarCharField) => ()
        case other => fail(s"AUTOINDEX are not supported on $other field")
      }
    case "FLAT" | "IVF_FLAT" | "IVF_PQ" | "IVF_SQ8" | "IVF_RABITQ" |
         "SCANN" | "HNSW" | "HNSW_SQ" | "HNSW_PQ" | "HNSW_PRQ" |
         "IVF_HNSW" | "DISKANN" | "AISAQ" | "AUTOINDEX" =>
      checkVectorMetric(kind, params)
      // AISAQ build params (client/index/disk_ann.go:74-158 — the
      // DiskANN variant keeping PQ codes inline with the graph; every
      // key is opt-in and range-checked, an UNSET param stays absent
      // exactly per the "unset must stay absent" client contract at
      // disk_ann.go:100-105, so only present keys are validated)
      if (indexType == "AISAQ") {
        // inline compressed vectors per node, capped by graph degree
        // (doc contract: range [0, 2048])
        checkRange(params, "inline_pq", 0, 2048)
        intParam(params, "pq_cache_size").foreach(v => if (v < 0)
          fail(s"pq_cache_size must be non-negative, got: $v"))
        intParam(params, "pq_read_page_cache_size").foreach(v => if (v < 0)
          fail(s"pq_read_page_cache_size must be non-negative, got: $v"))
        intParam(params, "num_entry_points").foreach(v => if (v < 1)
          fail(s"num_entry_points must be positive, got: $v"))
        intParam(params, "beamwidth").foreach(v => if (v < 1)
          fail(s"beamwidth must be positive, got: $v"))
        intParam(params, "vectors_beamwidth").foreach(v => if (v < 1)
          fail(s"vectors_beamwidth must be positive, got: $v"))
        params.get("rearrange").foreach { v =>
          if (v != "true" && v != "false")
            fail(s"rearrange must be a boolean, got: $v")
        }
        params.get("pq_read_io_engine").foreach { v =>
          if (v != "aio" && v != "uring")
            fail(s"pq_read_io_engine must be aio or uring, got: $v")
        }
      }
      checkRange(params, "nlist", MinNList, MaxNList)
      checkRange(params, "efConstruction", HnswMinEfConstruction, HnswMaxEfConstruction)
      if (indexType.startsWith("HNSW") || indexType == "IVF_HNSW") {
        // the engine enforces M >= 2 for HNSW graphs (idx_hnsw*.py:
        // "param 'M' (-1) should be in range [2, 2048]"); IVF_HNSW
        // builds one graph per cell, so the graph rules apply to it too
        // (build/search wired in IvfHnswIndex)
        checkRange(params, "M", 2, HnswMaxM)
        // graph-PQ nbits takes the wider [1, 24] (idx_hnsw_prq.py:165)
        checkRange(params, "nbits", 1, 24)
        // residual-stage count (idx_hnsw_prq.py:193-212)
        checkRange(params, "nrq", 1, 16)
        // scalar-quantizer enum (idx_hnsw_sq.py:93-106 — FP32 invalid
        // here, unlike RaBitQ's refine list)
        params.get("sq_type").foreach { t =>
          val valid = Seq("SQ6", "SQ8", "BF16", "FP16")
          if (!valid.contains(t.toUpperCase)) fail(
            "invalid scalar quantizer type: invalid parameter")
        }
      } else {
        checkRange(params, "nbits", MinNBits, MaxNBits)
        checkRange(params, "M", HnswMinM, HnswMaxM)
      }
      intParam(params, "rbq_bits").foreach(b => RabitqIndex.validateBits(b))
      // refine_type enum (idx_ivf_rabitq.py: case-insensitive, named error)
      params.get("refine_type").foreach { rt =>
        val valid = Seq("sq6", "sq8", "fp16", "bf16", "fp32", "flat")
        if (!valid.contains(rt.toLowerCase)) fail(
          s"invalid refine type : $rt, optional types are " +
            valid.mkString("[", ", ", "]"))
      }
    case "BIN_FLAT" | "BIN_IVF_FLAT" | "MINHASH_LSH" =>
      checkVectorMetric(BinaryVector, params)
      checkRange(params, "nlist", MinNList, MaxNList)
    case "SPARSE_INVERTED_INDEX" | "SPARSE_WAND" =>
      checkVectorMetric(SparseVector, params)
    case "BITMAP" =>
      // bitmap_index_checker.go: never on pk; bool/int/string/array of
      // those; JSON needs json_cast_type ∈ {BOOL, VARCHAR} + json_path
      if (isPrimaryKey) fail("create bitmap index on primary key not supported")
      kind match {
        case JsonField =>
          val cast = params.getOrElse("json_cast_type",
            fail("json index must specify cast type"))
          if (cast != "BOOL" && cast != "VARCHAR") fail(
            s"json_cast_type $cast is not supported for BITMAP index")
          if (!params.contains("json_path"))
            fail("json index must specify json path")
        case BoolField | IntField | VarCharField => ()
        case ArrayField(BoolField | IntField | VarCharField) => ()
        case ArrayField(_) => fail(
          "bitmap index are only supported on bool, int, string for array field")
        case _ => fail(
          "bitmap index are only supported on bool, int, string and array field")
      }
      checkRange(params, "bitmap_cardinality_limit", 1, MaxBitmapCardinalityLimit)
    case "NGRAM" =>
      // ngram_index_checker.go CheckTrain
      kind match {
        case VarCharField => ()
        case JsonField =>
          val cast = params.getOrElse("json_cast_type",
            fail("JSON field with ngram index must specify json_cast_type"))
          if (cast.trim.toUpperCase != "VARCHAR") fail(
            s"JSON field with ngram index only supports VARCHAR cast type, got: $cast")
        case _ => fail("Ngram index can only be created on VARCHAR or JSON field")
      }
      val mn = intParam(params, "min_gram").getOrElse(
        fail("Ngram index must specify both min_gram and max_gram"))
      val mx = intParam(params, "max_gram").getOrElse(
        fail("Ngram index must specify both min_gram and max_gram"))
      if (mn <= 0 || mx <= 0 || mn > mx) fail(
        s"invalid min_gram or max_gram value for Ngram index, min_gram: $mn, max_gram: $mx")
    case "FMINDEX" =>
      // fm_index_checker.go:13-60: sample rate in [4, 256]; block bytes
      // a power-of-two in [8, 128]
      params.get("fm_sa_sample_rate").foreach { v =>
        val r = try v.trim.toInt catch {
          case _: NumberFormatException =>
            fail(s"fm_sa_sample_rate for FM-index must be an integer, got: $v")
        }
        if (r < 4 || r > 256) fail(
          s"fm_sa_sample_rate for FM-index must be in [4, 256], got: $r")
      }
      params.get("fm_block_bytes").foreach { v =>
        val b = try v.trim.toInt catch {
          case _: NumberFormatException =>
            fail(s"fm_block_bytes for FM-index must be an integer, got: $v")
        }
        if (b < 8 || b > 128 || (b & (b - 1)) != 0) fail(
          s"fm_block_bytes for FM-index must be a power-of-two in [8, 128], got: $b")
      }
    case "Trie" =>
      // trie_checker.go CheckValidDataType: string fields only
      kind match {
        case VarCharField => ()
        case _ => fail("TRIE are only supported on varchar field")
      }
    case "STL_SORT" =>
      // stl_sort_checker.go CheckValidDataType: numeric/varchar (and
      // arrays of those for struct sub-fields); JSON passes with a
      // cast-type check in CheckTrain
      kind match {
        case IntField | FloatField | VarCharField | JsonField => ()
        case ArrayField(IntField | FloatField | VarCharField) => ()
        case other => fail(
          s"STL_SORT are only supported on numeric, varchar or timestamptz field, got $other")
      }
    case "INVERTED" =>
      // inverted_checker.go CheckValidDataType: bool/arith/string/
      // array/JSON — never a vector family
      kind match {
        case BoolField | IntField | FloatField | VarCharField |
             JsonField | ArrayField(_) => ()
        case other => fail(s"INVERTED are not supported on $other field")
      }
    case "RTREE" | "HYBRID" => ()
    case other => fail(s"invalid index type: $other")
  }
}
