package graft

import org.apache.spark.sql.functions._

import graft.operators.IndexParamCheck

/** TEXT-LOB contract (reference DataType.TEXT,
  * test_milvus_client_text_lob.py) — the unit pins the q_text_lob
  * oracle can't express: schema-shape rejections, the user-index gate,
  * the enable_match query error, threshold classification with a tiny
  * threshold, growing-vs-sealed payload equality, the open() store
  * re-read, and orphan GC.
  */
class TextLobSpec extends SparkSpec {
  import spark.implicits._

  private def scratch(prefix: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_${prefix}_").toString

  private val matchSpec = TextFieldSpec(enableAnalyzer = true, enableMatch = true)

  private def rows(n: Int, bigEvery: Int, threshold: Int) =
    (1 to n).map { i =>
      val base = s"doc $i vector database text lob payload"
      val text =
        if (i % bigEvery == 0) base + " " + ("x" * threshold) else base
      (i.toLong, text)
    }.toDF("id", "text")

  // ---- schema-shape rejections (:2204, :2233, :2294) ----

  test("TEXT field rejects default_value at create") {
    val e = intercept[IllegalArgumentException] {
      Collection.create(spark, CollectionSchema(pkField = "id",
        textFields = Map("text" -> matchSpec),
        fieldDefaults = Map("text" -> "a default")))
    }
    assert(e.getMessage.contains("default_value"))
  }

  test("TEXT field rejects is_partition_key at create") {
    val e = intercept[IllegalArgumentException] {
      Collection.create(spark, CollectionSchema(pkField = "id",
        textFields = Map("text" -> matchSpec),
        partitionKeyField = Some("text")))
    }
    assert(e.getMessage.contains("DataType.INT64 or DataType.VARCHAR"))
  }

  test("TEXT field cannot be the primary key") {
    val e = intercept[IllegalArgumentException] {
      Collection.create(spark, CollectionSchema(pkField = "text",
        textFields = Map("text" -> matchSpec)))
    }
    assert(e.getMessage.contains("DataType.INT64 or DataType.VARCHAR"))
  }

  test("invalid analyzer params reject at create, naming the analyzer") {
    val e = intercept[IllegalArgumentException] {
      Collection.create(spark, CollectionSchema(pkField = "id",
        textFields = Map("text" -> TextFieldSpec(enableAnalyzer = true,
          analyzerParams = Map("tokenizer" -> "not_a_tokenizer")))))
    }
    assert(e.getMessage.contains("analyzer"))
    assert(e.getMessage.contains("not_a_tokenizer"))
  }

  test("enable_match without enable_analyzer rejects at create") {
    val e = intercept[IllegalArgumentException] {
      Collection.create(spark, CollectionSchema(pkField = "id",
        textFields = Map("text" -> TextFieldSpec(enableMatch = true))))
    }
    assert(e.getMessage.contains("enable_match"))
  }

  // ---- user scalar indexes reject on TEXT (:1305) ----

  test("every user scalar index kind rejects on a TEXT field") {
    for ((kind, params) <- Seq(
        "AUTOINDEX" -> Map("metric_type" -> "L2"),
        "INVERTED" -> Map.empty[String, String],
        "BITMAP" -> Map.empty[String, String],
        "Trie" -> Map.empty[String, String],
        "STL_SORT" -> Map.empty[String, String],
        "NGRAM" -> Map("min_gram" -> "2", "max_gram" -> "4"))) {
      val e = intercept[IllegalArgumentException] {
        IndexParamCheck.check(kind, IndexParamCheck.TextField, params)
      }
      assert(e.getMessage ==
        "TEXT field does not support user-created scalar index", kind)
    }
    // the same kinds stay accepted on VARCHAR (the gate is TEXT-only)
    IndexParamCheck.check("INVERTED", IndexParamCheck.VarCharField, Map.empty)
  }

  // ---- enable_match query gate (:2260) ----

  test("text_match over a TEXT field without enable_match is a named error") {
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> TextFieldSpec(enableAnalyzer = true,
        enableMatch = false))))
    c.insert(Seq((1L, "vector database")).toDF("id", "text"))
    val e = intercept[graft.expr.ExprCompiler.CompileError] {
      c.query("text_match(text, \"vector\")", Seq("id")).collect()
    }
    assert(e.getMessage.contains("does not enable match"))
    // phrase_match takes the same gate
    val e2 = intercept[graft.expr.ExprCompiler.CompileError] {
      c.query("phrase_match(text, \"vector database\")", Seq("id")).collect()
    }
    assert(e2.getMessage.contains("does not enable match"))
    // non-match reads stay fine
    assert(c.query("id >= 1", Seq("id", "text")).count() == 1)
  }

  // ---- threshold classification (:2434: below ⇒ inline, at/above ⇒ LOB) ----

  test("below-threshold payloads stay inline; at/above externalize") {
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(Seq(
      (1L, "a" * 63),  // below: inline
      (2L, "b" * 64),  // at: LOB
      (3L, "c" * 65),  // above: LOB
      (4L, ""),        // empty: inline
      (5L, null.asInstanceOf[String])).toDF("id", "text"))
    assert(c.lobBlobCount == 2)
    // every payload reads back exactly regardless of placement
    val back = c.query("id >= 1", Seq("id", "text"))
      .orderBy("id").as[(Long, String)].collect()
    assert(back.map(_._2).toSeq ==
      Seq("a" * 63, "b" * 64, "c" * 65, "", null))
  }

  // ---- growing vs sealed visibility (:1340) + open() re-read ----

  test("growing reads resolve LOB payloads; sealed/open reads agree") {
    val path = s"${scratch("textlob_grow")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(rows(10, bigEvery = 3, threshold = 64))
    def snapshot(cc: Collection) = cc
      .query("text_match(text, \"payload\")", Seq("id", "text"))
      .select(col("id"), md5(col("text")).as("h"),
        octet_length(col("text")).as("b"))
      .orderBy("id").collect().toSeq
    val growing = snapshot(c)
    assert(growing.size == 10) // all docs carry 'payload'
    c.flush(path)
    assert(snapshot(c) == growing, "sealed reads must equal growing reads")
    // a fresh open over the layout reassembles the blob store from disk
    val reopened = Collection.open(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64), path)
    assert(snapshot(reopened) == growing, "open() must re-read _lobs")
  }

  // ---- delete/upsert + GC (:1631) ----

  test("upsert + delete orphan their payloads only after compaction; GC collects") {
    val path = s"${scratch("textlob_gc")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(rows(12, bigEvery = 3, threshold = 64)) // big: 3,6,9,12
    c.flush(path)
    assert(c.lobBlobCount == 4)
    c.upsert(Seq((3L, "upserted " + ("y" * 100))).toDF("id", "text"))
    c.deletePks(Seq(6L))
    c.flush(path)
    // pre-compaction: the superseded version still pins its payload
    // (the manifest walk — GC only drops refs no physical row carries)
    assert(c.lobGc(path) == 0L)
    assert(c.lobBlobCount == 5)
    c.compact(path)
    assert(c.lobGc(path) == 2L) // old v of 3 + deleted 6
    assert(c.lobBlobCount == 3)
    // the survivors still resolve byte-exactly after the snapshot rewrite
    val back = c.query("id == 3 or id == 9", Seq("id", "text"))
      .orderBy("id").as[(Long, String)].collect()
    assert(back(0)._2 == "upserted " + ("y" * 100))
    assert(back(1)._2.endsWith("x" * 64))
    // idempotent: a second GC finds nothing
    assert(c.lobGc(path) == 0L)
  }

  // ---- partial upsert carries LOB fields forward ----

  test("partial upsert carries an externalized payload forward unchanged") {
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(Seq((1L, "z" * 200, "tag0")).toDF("id", "text", "tag"))
    c.upsertPartial(Seq((1L, "tag1")).toDF("id", "tag"))
    val row = c.query("id == 1", Seq("id", "text", "tag"))
      .as[(Long, String, String)].head()
    assert(row._2 == "z" * 200, "unspecified TEXT field must carry forward")
    assert(row._3 == "tag1")
  }

  // ---- add_collection_field with DataType.TEXT (:1839) ----

  test("DDL-added TEXT field: old rows null, new payloads LOB-resolve, text_match scoped") {
    val path = s"${scratch("textlob_ddl")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textInlineThreshold = 64))
    c.insert(Seq((0L, "pre")).toDF("id", "note"))
    c.addCollectionTextField("added_text", matchSpec)
    assert(c.describeTextFields("added_text") == matchSpec)
    val marker = "addedfieldmarker "
    val big = marker + ("p" * 70)
    c.insert(Seq((1L, "mid", null.asInstanceOf[String]),
      (2L, "post", big)).toDF("id", "note", "added_text"))
    c.flush(path)
    val back = c.query("id >= 0", Seq("id", "added_text"))
      .orderBy("id").as[(Long, String)].collect()
    assert(back.map(_._2).toSeq == Seq(null, null, big))
    val matched = c.query("text_match(added_text, \"addedfieldmarker\")",
      Seq("id")).as[Long].collect().toSet
    assert(matched == Set(2L))
    // an added non-nullable TEXT field is impossible — old rows have no value
    val e = intercept[IllegalArgumentException] {
      c.addCollectionTextField("strict_text",
        TextFieldSpec(nullable = false, enableAnalyzer = true))
    }
    assert(e.getMessage.contains("nullable"))
  }

  test("dropped TEXT field leaves sibling payloads intact; compaction frees its blobs") {
    val path = s"${scratch("textlob_drop")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec, "alt" -> matchSpec),
      textInlineThreshold = 64))
    c.insert(Seq((1L, "a" * 100, "b" * 100), (2L, "keep me", "small"))
      .toDF("id", "text", "alt"))
    c.flush(path)
    assert(c.lobBlobCount == 2)
    c.dropField("alt")
    // reads stop serving the dropped field; the sibling still resolves
    val cols = c.query("id >= 1", Seq("*")).columns
    assert(!cols.contains("alt") && !cols.exists(_.startsWith("$lob_")))
    assert(c.query("id == 1", Seq("text")).as[String].head() == "a" * 100)
    // the dropped column still physically pins its blob until compaction
    assert(c.lobGc(path) == 0L)
    // deletes + compaction: the rewrite materializes the drop, GC frees it
    c.deletePks(Seq(2L))
    c.compact(path)
    assert(c.lobGc(path) == 1L)
    assert(c.query("id == 1", Seq("text")).as[String].head() == "a" * 100)
  }

  // ---- BM25 function schema negatives (:2088-2171) ----

  test("BM25 function schema rejections: analyzer-disabled input, dense output, missing input") {
    import graft.functions.IngestFunctions.Bm25Function
    val noAnalyzer = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> TextFieldSpec(enableAnalyzer = false))))
    val e1 = intercept[IllegalArgumentException] {
      noAnalyzer.addFunction(Bm25Function("text", "sparse"))
    }
    assert(e1.getMessage.contains("analyzer"))

    val denseOut = Collection.create(spark, CollectionSchema(pkField = "id",
      vectorFields = Map("vec" -> 4),
      textFields = Map("text" -> matchSpec)))
    val e2 = intercept[IllegalArgumentException] {
      denseOut.addFunction(Bm25Function("text", "vec"))
    }
    assert(e2.getMessage.contains("SPARSE_FLOAT_VECTOR"))

    val hasRows = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec)))
    hasRows.insert(Seq((1L, "vector database")).toDF("id", "text"))
    val e3 = intercept[IllegalArgumentException] {
      hasRows.addFunction(Bm25Function("missing", "sparse"))
    }
    assert(e3.getMessage.contains("not found"))
    // the manual-output rejection (a batch carrying the function's
    // output field) is the existing ingest contract
    hasRows.addFunction(Bm25Function("text", "sparse"))
    val e4 = intercept[IllegalArgumentException] {
      hasRows.insert(Seq((2L, "x", "y")).toDF("id", "text", "sparse"))
    }
    assert(e4.getMessage.contains("output"))
  }

  // ---- BM25 ingest function composes with LOB (:1033 via the function path) ----

  test("BM25 ingest function computes from the FULL text before externalization") {
    import graft.functions.IngestFunctions.Bm25Function
    val big = ("vector " * 20) + ("database " * 10) // 190 bytes > threshold
    def sparseOf(c: Collection): Map[String, Double] =
      c.query("id == 1", Seq("sparse")).head().getMap[String, Double](0).toMap
    val lobbed = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    lobbed.addFunction(Bm25Function("text", "sparse"))
    lobbed.insert(Seq((1L, big)).toDF("id", "text"))
    assert(lobbed.lobBlobCount == 1, "the payload itself must externalize")
    val inline = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec))) // 64 KiB default: stays inline
    inline.addFunction(Bm25Function("text", "sparse"))
    inline.insert(Seq((1L, big)).toDF("id", "text"))
    assert(sparseOf(lobbed) == sparseOf(inline),
      "term frequencies must be computed from the full payload")
    assert(sparseOf(lobbed)("vector") == 20.0)
  }

  // ---- multi-batch repeated flush checksum (:1659) + 10 MiB payload (:1680) ----

  test("repeated insert/flush batches keep every payload checksum; 10 MiB round trip") {
    val path = s"${scratch("textlob_batches")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec)))
    val tenMib = "m" * (10 * 1024 * 1024)
    val payloads = (1 to 9).map(i =>
      i.toLong -> (s"batchdoc $i " + ("q" * (64 * 1024 + i)))).toMap +
      (10L -> tenMib)
    payloads.toSeq.sortBy(_._1).grouped(3).foreach { batch =>
      c.insert(batch.toDF("id", "text"))
      c.flush(path)
    }
    val back = c.query("id >= 1", Seq("id", "text"))
      .select($"id", md5($"text").as("h"), octet_length($"text").as("b"))
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    assert(back.size == 10)
    back.foreach { case (id, h, b) =>
      val expect = payloads(id)
      assert(b == expect.length, s"byte length for $id")
      assert(h == java.security.MessageDigest.getInstance("MD5")
        .digest(expect.getBytes("UTF-8")).map("%02x".format(_)).mkString,
        s"checksum for $id")
    }
  }

  // ---- partition drop orphans its payloads for GC (:1707) ----

  test("dropping a partition orphans its LOB payloads; the survivor still resolves") {
    val path = s"${scratch("textlob_part")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.createPartition("keep")
    c.createPartition("drop_me")
    c.insertInto("keep", Seq((1L, "k" * 100)).toDF("id", "text"))
    c.insertInto("drop_me", Seq((2L, "d" * 100)).toDF("id", "text"))
    c.flush(path)
    assert(c.lobBlobCount == 2)
    c.dropPartition("drop_me")
    // the tombstoned rows still physically pin their payloads (the
    // manifest walk); compaction materializes the drop, then GC frees
    assert(c.lobGc(path) == 0L)
    c.compact(path)
    assert(c.lobGc(path) == 1L)
    assert(c.lobBlobCount == 1)
    assert(c.query("id >= 1", Seq("id", "text")).as[(Long, String)]
      .collect().toSeq == Seq((1L, "k" * 100)))
  }

  // ---- compaction folds per SCOPE key, never across partitions ----

  test("compaction keeps a pk's per-partition versions (scope-keyed LWW fold)") {
    val path = s"${scratch("compact_scope")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id"))
    c.createPartition("p1")
    c.createPartition("p2")
    c.insertInto("p1", Seq((1L, "in_p1")).toDF("id", "v"))
    c.insertInto("p2", Seq((1L, "in_p2")).toDF("id", "v")) // newer ts, same pk
    c.insertInto("p1", Seq((2L, "victim")).toDF("id", "v"))
    c.deletePks(Seq(2L)) // arm tombstones so compact runs the rewrite
    c.flush(path)
    def p1Rows = c.query("id == 1", Seq("id", "v"), partitionNames = Seq("p1"))
      .as[(Long, String)].collect().toSeq
    assert(p1Rows == Seq((1L, "in_p1")))
    c.compact(path)
    // the p1 version lost the GLOBAL LWW (p2's ts is newer) but must
    // survive the rewrite — partition-scoped reads still serve it
    assert(p1Rows == Seq((1L, "in_p1")),
      "compaction must not collapse a pk across partition scopes")
    // the unscoped read still answers with the global LWW winner
    assert(c.query("id == 1", Seq("v")).as[String].collect().toSet == Set("in_p2"))
  }

  // ---- drop → re-add reclaims the pre-drop payloads ----

  test("re-added TEXT field: old payloads stay hidden and GC-reclaimable") {
    val path = s"${scratch("textlob_readd")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(Seq((1L, "old " + ("o" * 100))).toDF("id", "text"))
    c.flush(path)
    assert(c.lobBlobCount == 1)
    c.dropField("text")
    c.addCollectionTextField("text", matchSpec)
    c.insert(Seq((2L, "new " + ("n" * 100))).toDF("id", "text"))
    c.flush(path)
    // pre-drop value never resurrects through the re-added field
    val back = c.query("id >= 1", Seq("id", "text"))
      .orderBy("id").as[(Long, String)].collect()
    assert(back.map(_._2).toSeq == Seq(null, "new " + ("n" * 100)))
    // compaction materializes the ts-mask → the orphaned old payload GCs
    c.deletePks(Seq(99L)) // no-op delete, arms the tombstone rewrite
    c.compact(path)
    assert(c.lobGc(path) == 1L, "the pre-drop payload must be reclaimable")
    assert(c.query("id == 2", Seq("text")).as[String].head() ==
      "new " + ("n" * 100))
  }

  test("a declared TEXT field is droppable before any insert") {
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec)))
    c.dropField("text") // must not raise "field not found"
    assert(!c.describeTextFields.contains("text"))
  }

  // ---- the declared analyzer drives match tokenization ----

  test("text_match tokenizes with the field's DECLARED analyzer") {
    // ngram(3,3): 'vec' is a gram of 'vector' — a default-tokenized
    // match would find nothing (no whole token 'vec'); keyword: the
    // whole string is ONE token, so a word-level probe must miss
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map(
        "gram" -> TextFieldSpec(enableAnalyzer = true, enableMatch = true,
          analyzerParams = Map("tokenizer" -> "ngram",
            "min_gram" -> "3", "max_gram" -> "3")),
        "kw" -> TextFieldSpec(enableAnalyzer = true, enableMatch = true,
          analyzerParams = Map("tokenizer" -> "keyword")),
        "plain" -> matchSpec)))
    c.insert(Seq((1L, "vector database", "vector database", "vector database"))
      .toDF("id", "gram", "kw", "plain"))
    def ids(expr: String): Set[Long] =
      c.query(expr, Seq("id")).as[Long].collect().toSet
    assert(ids("text_match(gram, \"vec\")") == Set(1L),
      "ngram analyzer must match on a 3-gram")
    assert(ids("text_match(plain, \"vec\")") == Set.empty,
      "the default pipeline has no token 'vec'")
    assert(ids("text_match(kw, \"vector\")") == Set.empty,
      "keyword analyzer's single token is the whole string")
    assert(ids("text_match(kw, \"vector database\")") == Set(1L))
    // the BM25 ingest function auto-wires the declared analyzer
    import graft.functions.IngestFunctions.Bm25Function
    c.addFunction(Bm25Function("kw", "sparse"))
    val wired = c.listFunctions.collectFirst {
      case b: Bm25Function if b.outputField == "sparse" => b }.get
    assert(wired.analyzerParams == Map("tokenizer" -> "keyword"))
    c.insert(Seq((2L, "abc def ghi", "abc def ghi", "abc def ghi"))
      .toDF("id", "gram", "kw", "plain"))
    val tf = c.query("id == 2", Seq("sparse")).head()
      .getMap[String, Double](0).toMap
    assert(tf == Map("abc def ghi" -> 1.0),
      "keyword-analyzed BM25 emits ONE whole-string term")
  }

  // ---- hybrid dense+BM25 over LOB equals the same data inline (:1152) ----

  test("hybrid dense+BM25 fusion over LOB payloads equals the inline answer") {
    import graft.functions.Metric
    import graft.operators.{Bm25, Fusion, VectorSearch}
    val docs = (1 to 30).map { i =>
      val filler = if (i % 5 == 0) " " + ("pad " * 30) else "" // 120B > threshold
      (i.toLong, s"doc $i vector database ranking retrieval" + filler,
        Seq((i % 7).toFloat, (i % 3).toFloat))
    }.toDF("id", "text", "vec")
    def hybridOf(threshold: Int): Seq[(Long, Long)] = {
      val c = Collection.create(spark, CollectionSchema(pkField = "id",
        vectorFields = Map("vec" -> 2),
        textFields = Map("text" -> matchSpec),
        textInlineThreshold = threshold))
      c.insert(docs)
      if (threshold <= 64)
        assert(c.lobBlobCount == 6, "the padded docs must externalize")
      val view = c.readView()
      val model = Bm25.build(view.select($"id", $"text"), "id", "text")
      val textHits = Bm25.search(model, "vector ranking pad", k = 10, roundTo = Some(4))
        .select(lit(0L).as("qid"), $"rank", $"id")
      val qs = Seq((0L, Seq(1.0f, 0.5f))).toDF("qid", "qvec")
      val denseHits = VectorSearch.topK(view, "id", "vec", qs, "qid", "qvec",
          Metric.COSINE, k = 10, roundTo = Some(4))
        .select($"qid", $"rank", $"id")
      Fusion.rrf(Seq(textHits, denseHits), "qid", "id", topK = 5)
        .select($"rank".cast("long"), $"id").as[(Long, Long)]
        .collect().toSeq.sortBy(_._1)
    }
    val lobbed = hybridOf(threshold = 64)
    val inline = hybridOf(threshold = 1 << 20)
    assert(lobbed == inline,
      "fusion ranks must be identical whether payloads are inline or LOB")
  }

  // ---- plan pins: the resolve join stays scale-safe ----

  test("resolve plan: payload bytes are pruned when the TEXT column is not read") {
    val path = s"${scratch("textlob_plan")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(rows(20, bigEvery = 2, threshold = 64))
    c.flush(path)
    // reopen so the blob store is parquet-backed (scan schemas visible)
    val ro = Collection.open(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64), path)
    val noText = ro.query("id >= 1", Seq("id")).queryExecution
    val lobScans = noText.executedPlan.toString.linesIterator
      .filter(l => l.contains("_lobs") && l.contains("ReadSchema")).toSeq
    // column pruning must reach the blob-store scan: a projection that
    // never reads `text` must not move payload BYTES (the refs-only
    // join is the residual cost; payloads stay on disk)
    assert(lobScans.forall(!_.contains("_lob_payload")),
      s"payload column not pruned:\n${lobScans.mkString("\n")}")
    // and when the text IS read, the store side broadcasts (AQE or
    // static — the store is small here)
    val withText = ro.query("id >= 1", Seq("id", "text"))
    withText.collect() // let AQE finalize
    val finalPlan = withText.queryExecution.executedPlan.toString
    assert(finalPlan.contains("BroadcastHashJoin") ||
      finalPlan.contains("BroadcastExchange"),
      s"small blob store should broadcast:\n${finalPlan.take(2000)}")
  }

  // ---- partition-key collection × TEXT payloads (:1561) ----

  test("TEXT payloads stay exact and key-scoped in a partition-key collection") {
    import graft.functions.Metric
    val path = s"${scratch("textlob_pk")}/data"
    val big = "partition key alpha large " + ("a" * 100)
    val rows = Seq(
      (2300L, "pk_a", "partition key alpha vector database", Seq(1.0f, 0.0f)),
      (2301L, "pk_b", "partition key beta unrelated", Seq(0.9f, 0.1f)),
      (2302L, "pk_a", big, Seq(0.8f, 0.2f)))
      .toDF("id", "category", "text", "vec")
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      vectorFields = Map("vec" -> 2),
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64,
      partitionKeyField = Some("category"), numPartitions = 4))
    c.insert(rows)
    c.flush(path) // key buckets become hive dirs; payloads seal to _lobs
    assert(c.lobBlobCount == 1)
    // key-scoped query: only pk_a rows, payloads byte-exact (incl. LOB)
    val scoped = c.query("category == \"pk_a\"", Seq("id", "text"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(scoped == Seq(
      2300L -> "partition key alpha vector database", 2302L -> big))
    // key-filtered search returns only pk_a hits with resolved payloads
    val q = Seq((0L, Seq(1.0f, 0.0f))).toDF("qid", "qvec")
    val hits = c.search("vec", q, k = 5, metric = Metric.COSINE,
      filterExpr = "category == \"pk_a\"",
      outputFields = Seq("id", "text", "category"))
      .select($"category", $"text").collect()
    assert(hits.length == 2)
    assert(hits.forall(_.getString(0) == "pk_a"))
    assert(hits.map(_.getString(1)).toSet ==
      Set("partition key alpha vector database", big))
  }

  // ---- compaction reuses payloads, never rewrites them (:1974 REUSE_ALL) ----

  test("compaction merges LOB references without touching the blob store") {
    val path = s"${scratch("textlob_reuse")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(rows(10, bigEvery = 2, threshold = 64))
    c.flush(path)
    val storeDirs = Collection.lobLiveDirs(spark, path)
    c.deletePks(Seq(1L)) // low delete ratio: inline row — no blob involved
    c.compact(path)
    // the rewrite folded the delete but wrote NO new blob dir and lost
    // no payload (the reference's AddLobFilesToTransaction REUSE_ALL)
    assert(Collection.lobLiveDirs(spark, path) == storeDirs,
      "compaction must not rewrite or snapshot the blob store")
    assert(c.lobBlobCount == 5)
    val back = c.query("id == 2", Seq("text")).as[String].head()
    assert(back.endsWith("x" * 64))
  }

  // ---- concurrent insert + flush keep payload integrity (:1785) ----

  test("concurrent inserts and flushes lose no payloads") {
    val path = s"${scratch("textlob_conc")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map { t =>
      new Thread(() => {
        try {
          (0 until 3).foreach { b =>
            val base = t * 100 + b * 10
            val batch = (base until base + 10).map(i =>
              (i.toLong, s"doc $i payload " + ("z" * (if (i % 3 == 0) 80 else 5))))
            c.insert(batch.toDF("id", "text"))
            if (b == 1) c.flush(path) // interleave flushes with inserts
          }
        } catch { case e: Throwable => errors.add(e) }
      }, s"textlob-conc-$t")
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errors.isEmpty, s"concurrent writes raised: ${errors.peek()}")
    c.flush(path)
    val back = c.query("id >= 0", Seq("id", "text"))
      .as[(Long, String)].collect().toMap
    assert(back.size == 120)
    back.foreach { case (id, text) =>
      val expect = s"doc $id payload " + ("z" * (if (id % 3 == 0) 80 else 5))
      assert(text == expect, s"payload mismatch for $id")
    }
  }

  // ---- CDC feed ships payloads inline; the replica re-externalizes ----

  test("CDC replica converges byte-exact on LOB payloads and keeps the storage contract") {
    def mk() = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    val primary = mk()
    primary.insert(rows(6, bigEvery = 2, threshold = 64)) // big: 2, 4, 6
    primary.deletePks(Seq(4L))
    val replica = mk()
    val feed = primary.changesSince(0L)
    // the feed carries payloads INLINE — no hidden refs ride it
    assert(!feed.columns.exists(_.startsWith("$lob_")))
    replica.applyChanges(feed)
    def state(c: Collection) = c.query("id >= 1", Seq("id", "text"))
      .select($"id", md5($"text").as("h")).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(state(replica) == state(primary), "replica must converge byte-exact")
    // and the replica re-externalized the oversized payloads into ITS store
    assert(replica.lobBlobCount == 3,
      "the replica keeps the LOB storage contract (2, 4, 6 externalized)")
  }

  // ---- facade-derived index gate (the checker must not depend on the
  // caller classifying the field — the schema decides) ----

  test("createScalarIndex derives TEXT from the schema and rejects; VARCHAR builds") {
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(Seq((1L, "vector database", "en"), (2L, "spark engine", "de"))
      .toDF("id", "text", "lang"))
    for (kind <- Seq("INVERTED", "BITMAP", "Trie", "STL_SORT", "AUTOINDEX")) {
      val e = intercept[IllegalArgumentException] {
        c.createScalarIndex("text", kind)
      }
      assert(e.getMessage ==
        "TEXT field does not support user-created scalar index", kind)
    }
    // the same request on a plain VARCHAR field passes the check and
    // builds the (value -> ids) dictionary
    val idx = c.createScalarIndex("lang", "INVERTED")
    assert(idx.count() == 2)
    // and a kind/field mismatch still surfaces the typed checker errors
    intercept[IllegalArgumentException] { c.createScalarIndex("id", "Trie") }
  }

  // ---- post-GC feed contract: dangling refs raise, never null ----

  test("changesSince raises on GC'd historical payloads instead of nulling them") {
    val path = s"${scratch("textlob_feed")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(Seq((1L, "v1 " + ("a" * 100)), (2L, "small"), (3L, "bye"))
      .toDF("id", "text"))
    c.flush(path)
    // pre-GC: the full feed resolves (the v1 payload is still stored)
    assert(c.changesSince(0L).filter($"text".contains("v1")).count() == 1)
    c.upsert(Seq((1L, "v2 " + ("b" * 100))).toDF("id", "text"))
    c.deletePks(Seq(3L)) // compaction folds on the tombstone sweep
    c.flush(path)
    c.compact(path)
    assert(c.lobGc(path) == 1L) // v1's payload is orphaned and collected
    // a re-seed feed (sinceTs=0) now spans an insert whose payload is
    // gone — materializing it must fail loudly with the re-seed hint
    val e = intercept[Exception] { c.changesSince(0L).collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("re-seed from a snapshot")),
      s"expected the dangling-ref error, got: $e")
    // an incremental cursor PAST the dangling entry still serves
    val tail = c.changesSince(1L).filter($"_op" === "insert")
    assert(tail.filter($"text".contains("v2")).count() == 1)
  }

  // ---- query-side tokenization is driver-local and cached ----

  test("analyzeLocal folds to a LocalRelation (no Spark job) and matches the plan side") {
    import graft.functions.Analyzers
    val params = Map("tokenizer" -> "char_group", "delims" -> " -",
      "filters" -> "lowercase")
    val q = "Vector-Database PAYLOAD"
    val local = Analyzers.analyzeLocal(params, q)
    // the plan-side evaluation of the same pipeline must agree exactly
    val planned = Seq(Tuple1(q)).toDF("t")
      .select(Analyzers.analyzeWith(col("t"), params).as("toks"))
      .head().getSeq[String](0).toSeq
    assert(local == planned)
    assert(local == Seq("vector", "database", "payload"))
    // the no-job property: Project-over-LocalRelation constant-folds at
    // optimization time (ConvertToLocalRelation), so head() never
    // schedules a job — pinned on the plan, not on listener timing
    val df = Seq(Tuple1(q)).toDF("t")
      .select(Analyzers.analyzeWith(col("t"), params).as("toks"))
    assert(df.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      df.queryExecution.optimizedPlan.getClass.toString)
    // cached: the second call returns the identical memoized sequence
    assert(Analyzers.analyzeLocal(params, q) eq local)
  }

  // ---- BM25 depth over LOB: nullable input, SPARSE_WAND, multi-analyzer ----

  test("BM25 function over nullable TEXT: null/empty never match, payloads exact (:1514)") {
    import graft.functions.IngestFunctions.Bm25Function
    import graft.operators.Bm25
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> TextFieldSpec(enableAnalyzer = true,
        enableMatch = true, nullable = true)),
      textInlineThreshold = 64))
    c.addFunction(Bm25Function("text", "sparse"))
    c.insert(Seq(
      (2250L, null.asInstanceOf[String]),
      (2251L, ""),
      (2252L, "nullable bm25 vector database ranking ranking " + ("pad " * 30)),
      (2253L, "unrelated tokens only")).toDF("id", "text"))
    // the LOB-backed hit row resolves byte-exact through the view
    val view = c.query("id >= 0", Seq("id", "text", "sparse"))
    val back = view.select($"id", $"text").orderBy("id")
      .as[(Long, String)].collect()
    assert(back(0)._2 == null && back(1)._2 == "")
    assert(back(2)._2.startsWith("nullable bm25") && back(2)._2.length > 64)
    // BM25 over the function-backed corpus: the null and empty rows
    // never match; the LOB row with doubled 'ranking' wins
    val model = Bm25.build(view.filter($"text".isNotNull)
      .select($"id", $"text"), "id", "text")
    val hits = Bm25.search(model, "nullable bm25 ranking", k = 4)
      .select($"id").as[Long].collect().toSet
    assert(hits.contains(2252L))
    assert(!hits.contains(2250L) && !hits.contains(2251L))
    // and the function OUTPUT itself is null-safe: null text -> empty map
    val sparse2250 = view.filter($"id" === 2250L).select($"sparse").head()
    assert(sparse2250.isNullAt(0) || sparse2250.getMap[String, Double](0).isEmpty)
  }

  test("BM25 sparse vectors over LOB payloads serve through SPARSE_WAND (:1482)") {
    import graft.functions.IngestFunctions.Bm25Function
    import graft.operators.SparseWand
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.addFunction(Bm25Function("text", "sparse"))
    val docs = (1 to 12).map { i =>
      val filler = if (i % 3 == 0) " " + ("pad " * 30) else "" // LOB rows
      val body = if (i == 10) "vector ranking ranking ranking" else s"vector doc $i"
      (i.toLong, body + filler)
    }.toDF("id", "text")
    c.insert(docs)
    assert(c.lobBlobCount == 4)
    val view = c.query("id >= 0", Seq("id", "text", "sparse"))
    val idx = SparseWand.materialize(SparseWand.build(view, "id", col("sparse")))
    val q = Map("ranking" -> 2.0, "vector" -> 1.0)
    val wand = SparseWand.search(idx, q, k = 3)
      .orderBy($"score".desc, $"id").select($"id").as[Long].collect().toSeq
    // the ranking-heavy row (tf=3, LOB-backed? 10 % 3 != 0 — inline) wins;
    // exactness: WAND equals the exhaustive path over the same outputs
    assert(wand.head == 10L)
    val brute = SparseWand.search(idx, q, k = 3, exhaustive = true)
      .orderBy($"score".desc, $"id").select($"id").as[Long].collect().toSeq
    assert(wand == brute, "WAND pruning must be exact over BM25 outputs")
    // the winning row's payload reads back exactly even when LOB-backed:
    // re-run with the heavy row oversized
    val c2 = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c2.addFunction(Bm25Function("text", "sparse"))
    val heavy = "vector ranking ranking ranking " + ("pad " * 30)
    c2.insert(Seq((10L, heavy), (11L, "vector doc")).toDF("id", "text"))
    val view2 = c2.query("id >= 0", Seq("id", "text", "sparse"))
    val idx2 = SparseWand.build(view2, "id", col("sparse"))
    val top = SparseWand.search(idx2, q, k = 1)
      .join(view2, "id").select($"id", $"text").as[(Long, String)].head()
    assert(top._1 == 10L && top._2 == heavy,
      "the LOB-backed winner must read back byte-exact through the hit")
  }

  test("multi-analyzer-by-field BM25 over LOB payloads (:2515)") {
    import graft.functions.Analyzers
    import graft.operators.Bm25
    // the reference declares multi_analyzer_params {by_field: language,
    // analyzers: {en, zh, default}, alias: {eng->en, chinese->zh}}; the
    // Spark shape is one shared statistics build over a per-row token
    // expression dispatched on the (alias-normalized) name column
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> TextFieldSpec(enableAnalyzer = true)),
      textInlineThreshold = 64))
    val zhBody = "向量数据库 支持 中文检索 和 稀疏向量 排序"
    val enBody = "wolves running swiftly across vector database archives" +
      " " + ("pad " * 30) // the English doc is LOB-backed
    c.insert(Seq(
      (3100L, "eng", enBody),
      (3101L, "chinese", zhBody),
      (3102L, "fallback", "plain default analyzer row vector")).toDF("id", "language", "text"))
    assert(c.lobBlobCount == 1)
    val view = c.query("id >= 0", Seq("id", "language", "text"))
    // alias normalization (eng -> en, chinese -> zh), then the per-name
    // analyzer: en stems, zh segments CJK, default is standard
    val lang = when($"language" === "eng", "en")
      .when($"language" === "chinese", "zh").otherwise($"language")
    val toks = when(lang === "en",
        Analyzers.analyzeWith($"text", Map("filters" -> "lowercase,stemmer")))
      .when(lang === "zh",
        Analyzers.analyzeWith($"text", Map("tokenizer" -> "lang_ident")))
      .otherwise(Analyzers.analyzeWith($"text", Map.empty))
    val model = Bm25.buildFromTokens(view, "id", toks)
    // each analyzer's search hits ONLY its row: the stemmed English
    // query matches the stemmed corpus tokens ("running" -> "run")
    def top(terms: Seq[String]): Long =
      Bm25.scoreTerms(model, terms).orderBy($"_score".desc)
        .select($"id").as[Long].head()
    assert(top(Analyzers.analyzeLocal(
      Map("filters" -> "lowercase,stemmer"), "wolves running")) == 3100L)
    assert(top(Analyzers.analyzeLocal(
      Map("tokenizer" -> "lang_ident"), "中文检索")) == 3101L)
    assert(top(Seq("plain")) == 3102L)
    // and the LOB-backed English payload reads back byte-exact
    assert(view.filter($"id" === 3100L).select($"text").as[String].head() == enBody)
  }

  // ---- highlight_query mode: terms from the filter itself ----

  test("queryHighlighted draws terms from the filter's match constructs per field") {
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map(
        "text" -> TextFieldSpec(enableAnalyzer = true, enableMatch = true,
          analyzerParams = Map("tokenizer" -> "char_group", "delims" -> " ",
            "filters" -> "lowercase")),
        "title" -> matchSpec),
      textInlineThreshold = 64))
    c.insert(Seq(
      (1L, "Vector search over a vector index " + ("x" * 100), "fast engines"),
      (2L, "plain document", "slow engines")).toDF("id", "text", "title"))
    val out = c.queryHighlighted(
      "text_match(text, {q}) and phrase_match(title, 'fast engines')",
      Seq("id", "text", "title"),
      preTags = Seq("["), postTags = Seq("]"),
      fragmentSize = 13, numFragments = 2,
      params = Map("q" -> "Vector"))
    val row = out.orderBy("id").select($"id", $"text_highlight", $"title_highlight")
      .as[(Long, Seq[String], Seq[String])].head()
    assert(row._1 == 1L && out.count() == 1)
    // the text field's declared char_group+lowercase analyzer drives the
    // match: 'Vector' (template-resolved) wraps both occurrences
    assert(row._2 == Seq("[Vector] search", "[vector] index "), row._2.toString)
    // the title field highlights ITS filter's phrase terms only
    assert(row._3 == Seq("[fast] [engines]"), row._3.toString)
    // fields without a match construct get no highlight column
    val noMatch = c.queryHighlighted("id >= 1", Seq("id", "text"))
    assert(!noMatch.columns.exists(_.endsWith("_highlight")))
  }

  // ---- snapshots pin LOB payloads; exports are self-contained ----

  test("snapshot read survives delete+compact+lobGc; dropSnapshot unpins") {
    val path = s"${scratch("textlob_snap")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(rows(8, bigEvery = 2, threshold = 64)) // LOB: 2, 4, 6, 8
    val ts = c.createSnapshot(path, "s1")
    assert(ts > 0L)
    assert(c.listSnapshots == Map("s1" -> ts))
    val want = c.readSnapshot("s1")
      .select($"id", md5($"text").as("h")).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(want.size == 8)
    // churn the live side: the snapshot must not move
    c.deletePks(Seq(2L, 4L))
    c.flush(path)
    c.compact(path)
    // pinned: the deleted payloads stay — GC reclaims nothing
    assert(c.lobGc(path) == 0L)
    assert(c.lobBlobCount == 4)
    assert(c.readSnapshot("s1")
      .select($"id", md5($"text").as("h")).orderBy("id")
      .as[(Long, String)].collect().toSeq == want,
      "snapshot read must be byte-identical after live-side GC")
    // the live read DID apply the deletes
    assert(c.query("id >= 1", Seq("id")).count() == 6)
    // unpin: now the two orphaned payloads collect
    c.dropSnapshot("s1")
    assert(c.lobGc(path) == 2L)
    assert(c.lobBlobCount == 2)
    intercept[NoSuchElementException] { c.readSnapshot("s1") }
  }

  test("snapshot folds pending patches; registry and pins survive reopen") {
    val path = s"${scratch("textlob_snapdur")}/data"
    def schema = CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64)
    val c = Collection.create(spark, schema)
    c.insert(Seq(
      (1L, "v " + ("a" * 100), 10L),
      (2L, "small", 20L)).toDF("id", "text", "tag"))
    c.flush(path)
    // an acknowledged mutable-column write lives in the patch log, not
    // in files — the snapshot must carry it anyway
    c.setField("tag", Seq((1L, 99L)).toDF("id", "tag"))
    val ts = c.createSnapshot(path, "s1")
    assert(c.readSnapshot("s1").filter($"id" === 1L)
      .select($"tag").as[Long].head() == 99L,
      "snapshot must serve the patched value, not the pre-patch file bytes")
    // reopen the layout: the registry rebuilds from _snapshots/<id>
    val re = Collection.open(spark, schema, path)
    assert(re.listSnapshots == Map("s1" -> ts))
    val snapBack = re.readSnapshot("s1")
      .select($"id", md5($"text").as("h"), $"tag").orderBy("id")
      .as[(Long, String, Long)].collect().toSeq
    assert(snapBack.map(_._1) == Seq(1L, 2L) && snapBack.head._3 == 99L)
    // and the reopened collection's GC still honors the pin
    re.deletePks(Seq(1L))
    re.flush(path)
    re.compact(path)
    assert(re.lobGc(path) == 0L, "a reopened registry must keep pinning")
    re.dropSnapshot("s1")
    assert(re.lobGc(path) == 1L)
  }

  test("reopen after compaction: the TSO reseeds past dir ticks, post-restart flushes survive") {
    val path = s"${scratch("textlob_reseed")}/data"
    def schema = CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64)
    val c = Collection.create(spark, schema)
    c.insert(Seq((1L, "one"), (2L, "two")).toDF("id", "text"))
    c.deletePks(Seq(2L))
    c.flush(path)
    c.compact(path) // writes run-<tick> with a tick above every row ts
    // restart: the TSO must reseed past the run dir's tick, or the next
    // flush lands a seg dir the supersession rule silently drops
    val re1 = Collection.open(spark, schema, path)
    re1.insert(Seq((3L, "three " + ("x" * 100))).toDF("id", "text"))
    re1.flush(path)
    val re2 = Collection.open(spark, schema, path)
    assert(re2.query("id >= 0", Seq("id")).as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L), "a post-restart flush must survive the next reopen")
  }

  test("a snapshot of an open()ed root stays point-in-time through live compaction") {
    val path = s"${scratch("textlob_rootsnap")}/data"
    def schema = CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64)
    val c0 = Collection.create(spark, schema)
    c0.insert(Seq((1L, "one " + ("a" * 100)), (2L, "two")).toDF("id", "text"))
    c0.flush(path)
    // reopen: sealedSegments is now the layout ROOT
    val c = Collection.open(spark, schema, path)
    c.createSnapshot(path, "s1")
    c.deletePks(Seq(1L))
    c.flush(path)
    c.compact(path) // physically drops row 1 from the live layout
    assert(c.query("id >= 0", Seq("id")).count() == 1)
    assert(c.readSnapshot("s1").select($"id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L),
      "the snapshot manifested CONCRETE dirs — later compaction is invisible")
  }

  test("snapshot carries DDL default masks and rejects unmaterialized patches") {
    val path = s"${scratch("textlob_snapmask")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(Seq((1L, "doc", 5L)).toDF("id", "text", "x"))
    c.flush(path)
    c.dropField("x")
    c.addCollectionField("x", 0L) // re-add with a default: old values masked
    c.createSnapshot(path, "s1")
    // the live read at this ts serves the default, never the pre-drop 5
    assert(c.readSnapshot("s1").select($"x").as[Long].head() == 0L,
      "the snapshot must apply the DDL default mask, not resurrect files")
    // a dropped-then-re-added TEXT field must not reappear as nulls
    // in a snapshot taken after the drop
    c.addCollectionTextField("note", TextFieldSpec(enableAnalyzer = true))
    c.upsert(Seq((1L, "doc", "a note")).toDF("id", "text", "note"))
    c.flush(path)
    c.dropField("note")
    c.createSnapshot(path, "s2")
    assert(!c.readSnapshot("s2").columns.contains("note"),
      "a TEXT field dropped before the snapshot must not resurrect as nulls")
    // acknowledged patches on a column no batch materialized cannot
    // ride a file manifest — loud refusal, not silent divergence
    c.addCollectionField("y", 1L)
    c.setField("y", Seq((1L, 7L)).toDF("id", "y"))
    val e = intercept[IllegalArgumentException] { c.createSnapshot(path, "s3") }
    assert(e.getMessage.contains("not-yet-materialized"))
  }

  test("snapshot keeps point-in-time DDL state; RLS scopes the snapshot read") {
    val path = s"${scratch("textlob_snapddl")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(Seq(
      (1L, "doc one " + ("a" * 100), "en"),
      (2L, "doc two", "de")).toDF("id", "text", "lang"))
    c.createSnapshot(path, "before_drop")
    c.dropField("lang")
    c.createSnapshot(path, "after_drop")
    // the pre-drop snapshot still serves the column; the post-drop one
    // must not resurrect it (the live read at that ts hides it too)
    assert(c.readSnapshot("before_drop").columns.contains("lang"))
    assert(!c.readSnapshot("after_drop").columns.contains("lang"))
    // row-level security re-applies per caller on the snapshot read,
    // exactly like query()
    c.enableRls(Seq("id == $current_user_tags['only']"))
    c.setUser(graft.Rls.UserContext("alice", Map("only" -> "1")))
    val scoped = c.readSnapshot("before_drop").select($"id").as[Long].collect()
    assert(scoped.toSeq == Seq(1L),
      s"RLS must scope the snapshot read, got ${scoped.toSeq}")
  }

  test("restoreSnapshot materializes a writable collection with its own blob store") {
    val path = s"${scratch("textlob_restore")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(rows(6, bigEvery = 2, threshold = 64)) // LOB: 2, 4, 6
    c.createSnapshot(path, "s1")
    val d = c.describeSnapshot("s1")
    assert(d("pinned_refs") == "3" && d("has_tombstones") == "false" &&
      d("data_dirs").toInt >= 1, d.toString)
    def state(cc: Collection) = cc.query("id >= 1", Seq("id", "text"))
      .select($"id", md5($"text").as("h")).orderBy("id")
      .as[(Long, String)].collect().toSeq
    val want = state(c)
    val r = c.restoreSnapshot("s1")
    assert(state(r) == want, "the restored collection re-serves every row byte-exact")
    // ...from its OWN content-addressed store (payloads re-externalized)
    assert(r.lobBlobCount == 3)
    // the restored collection is live: a write lands on it, never on
    // the snapshot or the source
    r.upsert(Seq((1L, "patched")).toDF("id", "text"))
    assert(r.query("id == 1", Seq("text")).as[String].head() == "patched")
    assert(state(c) == want)
    // and it survives the source's full churn + GC + snapshot drop
    c.deletePks((1L to 6L))
    c.flush(path)
    c.compact(path)
    c.dropSnapshot("s1")
    c.lobGc(path)
    assert(r.query("id >= 2", Seq("id")).count() == 5,
      "the restore owns its layout — source GC cannot reach it")
  }

  test("restoreSnapshot preserves autoId pks and pre-stamped namespaces") {
    // autoId: restored rows keep their ORIGINAL ids (the reference's
    // preserve-field-ids restore), never re-allocate
    val pathA = s"${scratch("textlob_restauto")}/data"
    val a = Collection.create(spark, CollectionSchema(pkField = "id",
      autoId = true, textFields = Map("text" -> matchSpec),
      textInlineThreshold = 64))
    a.insert(Seq(Tuple1("first " + ("a" * 100)), Tuple1("second")).toDF("text"))
    a.createSnapshot(pathA, "s1")
    val wantA = a.query("id >= 0", Seq("id", "text"))
      .select($"id", md5($"text").as("h")).orderBy("id")
      .as[(Long, String)].collect().toSeq
    val ra = a.restoreSnapshot("s1")
    assert(ra.query("id >= 0", Seq("id", "text"))
      .select($"id", md5($"text").as("h")).orderBy("id")
      .as[(Long, String)].collect().toSeq == wantA,
      "autoId restore must keep the original pks byte-for-byte")
    // namespace-enabled: the snapshot spans every namespace; restore
    // re-serves each tenant's rows under its own scope
    val pathN = s"${scratch("textlob_restns")}/data"
    val n = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64,
      enableNamespace = true))
    n.insert(Seq((1L, "tenant one " + ("b" * 100))).toDF("id", "text"),
      namespace = Some("t1"))
    n.insert(Seq((2L, "tenant two")).toDF("id", "text"),
      namespace = Some("t2"))
    n.createSnapshot(pathN, "s1")
    val rn = n.restoreSnapshot("s1")
    assert(rn.query("id >= 0", Seq("id"), namespace = Some("t1"))
      .as[Long].collect().toSeq == Seq(1L))
    assert(rn.query("id >= 0", Seq("id"), namespace = Some("t2"))
      .as[Long].collect().toSeq == Seq(2L))
    // DDL-added TEXT declarations replay onto the target: the restored
    // payload re-externalizes instead of landing inline
    val pathD = s"${scratch("textlob_restddl")}/data"
    val d = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    d.insert(Seq((1L, "base")).toDF("id", "text"))
    d.addCollectionTextField("note",
      TextFieldSpec(enableAnalyzer = true, enableMatch = true))
    d.upsert(Seq((1L, "base", "note " + ("c" * 100))).toDF("id", "text", "note"))
    d.createSnapshot(pathD, "s1")
    val rd = d.restoreSnapshot("s1")
    assert(rd.lobBlobCount == 1, "the DDL-added TEXT payload must re-externalize")
    assert(rd.query("text_match(note, 'note')", Seq("id")).as[Long].head() == 1L,
      "the replayed declaration keeps the field matchable")
  }

  test("snapshot of an open()ed root manifests each post-open segment once") {
    val path = s"${scratch("textlob_dedup")}/data"
    def schema = CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64)
    val c0 = Collection.create(spark, schema)
    c0.insert(Seq((1L, "one")).toDF("id", "text"))
    c0.flush(path)
    val c = Collection.open(spark, schema, path) // sealedSegments = [root]
    c.insert(Seq((2L, "two " + ("d" * 100))).toDF("id", "text"))
    c.flush(path) // sealedSegments = [root, seg-N]: seg-N resolves from BOTH
    c.createSnapshot(path, "s1")
    // raw-vs-qualified path mixing must dedupe: each segment once
    assert(c.describeSnapshot("s1")("data_dirs").toInt == 2,
      c.describeSnapshot("s1").toString)
    assert(c.readSnapshot("s1").count() == 2)
  }

  test("exported snapshot serves byte-exact after the source _lobs is deleted") {
    val base = scratch("textlob_export")
    val path = s"$base/data"
    val schema = CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64)
    val c = Collection.create(spark, schema)
    c.insert(rows(6, bigEvery = 2, threshold = 64))
    c.createSnapshot(path, "s1")
    // a post-snapshot delete must be invisible to the export
    c.deletePks(Seq(2L))
    val want = c.readSnapshot("s1")
      .select($"id", md5($"text").as("h"), octet_length($"text").as("b"))
      .orderBy("id").collect().toSeq
    val n = c.exportSnapshot("s1", s"$base/exported")
    assert(n >= 2) // at least one data dir + one blob dir
    intercept[IllegalArgumentException] { // immutable target
      c.exportSnapshot("s1", s"$base/exported")
    }
    // wipe the SOURCE blob store entirely — the export must not need it
    val lobs = new java.io.File(s"$path/_lobs")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(lobs)
    assert(!lobs.exists)
    val restored = Collection.openSnapshotExport(spark, schema, s"$base/exported")
      .select($"id", md5($"text").as("h"), octet_length($"text").as("b"))
      .orderBy("id").collect().toSeq
    assert(restored == want, "export must be self-contained (payloads included)")
    assert(restored.size == 6, "the post-snapshot delete must not leak into the export")
  }

  // ---- query iterator pages payloads (:892) ----

  test("query iterator pages LOB payloads byte-exact") {
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(rows(10, bigEvery = 2, threshold = 64))
    // page through with the pk cursor — every page resolves payloads
    val it = Iterator.iterate(Option.empty[Long] -> Seq.empty[(Long, Long)]) {
      case (cursor, _) =>
        val page = c.queryIterator("", Seq("id", "text"), batch = 3,
            lastPk = cursor.map(x => x: Any))
          .select($"id", octet_length($"text").cast("long").as("b"))
          .as[(Long, Long)].collect().toSeq.sortBy(_._1)
        (page.lastOption.map(_._1), page)
    }.drop(1).takeWhile(_._2.nonEmpty).flatMap(_._2).toSeq.toMap
    assert(it.size == 10)
    (1 to 10).foreach { i =>
      val base = s"doc $i vector database text lob payload"
      val expect = if (i % 2 == 0) base.length + 1 + 64 else base.length
      assert(it(i.toLong) == expect, s"byte length for row $i")
    }
  }

  // ---- snapshot name rules (PR #47096; test_milvus_client_snapshot.py
  // :164-196, :1487, :1517) ----

  test("snapshot names validate under the reference naming rules") {
    val path = s"${scratch("textlob_snapname")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(rows(3, bigEvery = 2, threshold = 64))
    def rejects(name: String, msg: String): Unit = {
      val e = intercept[IllegalArgumentException] { c.createSnapshot(path, name) }
      assert(e.getMessage.contains(msg), s"'$name' -> ${e.getMessage}")
    }
    rejects("", "snapshot name should be not empty")
    rejects("  ", "snapshot name should be not empty")
    rejects("snap-with-dash", "snapshot name can only contain")
    rejects("snap.with.dot", "snapshot name can only contain")
    rejects("snap with space", "snapshot name can only contain")
    rejects("snap/with/slash", "snapshot name can only contain")
    rejects("快照中文名称",
      "the first character of snapshot name must be an underscore or letter")
    rejects("1snap",
      "the first character of snapshot name must be an underscore or letter")
    rejects("s" * 256,
      "the length of snapshot name must be not greater than limit")
    // valid boundary names create; drop does NOT re-validate names (a
    // registry persisted under older, looser rules must stay droppable)
    // — an invalid name simply isn't in the registry
    c.createSnapshot(path, "_snapshot_with_underscore")
    c.createSnapshot(path, "s" * 255)
    c.dropSnapshot("s" * 255)
    val e = intercept[IllegalArgumentException] { c.dropSnapshot(" ") }
    assert(e.getMessage.contains("not found"))
  }

  // ---- restore-job registry (snapshot_manager.go RestoreSnapshotJob;
  // test_milvus_client_snapshot.py:343,543,628,664,677,1545) ----

  test("restoreSnapshotAs: job registry, duplicate target, unknown job id") {
    val path = s"${scratch("textlob_restjob")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(rows(6, bigEvery = 2, threshold = 64))
    c.createSnapshot(path, "s1")
    val target = s"restjob_target_${System.nanoTime()}"
    Collection.createDatabase(s"restjob_db_$target")
    val db = s"restjob_db_$target"
    val jobId = c.restoreSnapshotAs("s1", target, db)
    // the synchronous job is already terminal, with the full poll record
    val j = Collection.getRestoreSnapshotState(jobId)
    assert(j.state == "RestoreSnapshotCompleted" && j.progress == 100)
    assert(j.startTime > 0L && j.timeCost > 0L, "start_time/time_cost set (:1545)")
    assert(j.snapshot == "s1" && j.targetName == target && j.db == db)
    // the restored collection registered under the target name
    assert(Collection.getCollection(target, db)
      .query("id >= 1", Seq("id")).count() == 6)
    // db-scoped listing sees the job; another db's listing does not (:543)
    assert(Collection.listRestoreSnapshotJobs(Some(db)).exists(_.jobId == jobId))
    assert(!Collection.listRestoreSnapshotJobs(Some("default"))
      .exists(_.jobId == jobId))
    assert(Collection.listRestoreSnapshotJobs().exists(_.jobId == jobId))
    // duplicate target rejects up front, registering no job (:628)
    val before = Collection.listRestoreSnapshotJobs().size
    val e = intercept[IllegalArgumentException] {
      c.restoreSnapshotAs("s1", target, db)
    }
    assert(e.getMessage.contains("duplicate collection"))
    assert(Collection.listRestoreSnapshotJobs().size == before)
    // unknown snapshot and unknown job id error by name (:605, :664)
    intercept[NoSuchElementException] {
      c.restoreSnapshotAs("nope", target + "_x", db)
    }
    val unknown = intercept[NoSuchElementException] {
      Collection.getRestoreSnapshotState(999999999L)
    }
    assert(unknown.getMessage.contains("not found"))
  }

  test("an in-flight restore pins its snapshot against drop (:343)") {
    val path = s"${scratch("textlob_restpin")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(rows(5, bigEvery = 2, threshold = 64))
    c.createSnapshot(path, "s1")
    val target = s"restpin_target_${System.nanoTime()}"
    var droppedMidRestore: Option[Throwable] = None
    // the onPinned seam runs after the pin lands, before the restore
    // write — the deterministic stand-in for the reference test's
    // poll-until-InProgress loop
    c.restoreSnapshotAs("s1", target, onPinned = () => {
      droppedMidRestore = Some(intercept[IllegalArgumentException] {
        c.dropSnapshot("s1")
      })
      assert(Collection.listRestoreSnapshotJobs()
        .exists(j => j.snapshot == "s1" &&
          j.state == "RestoreSnapshotInProgress"))
    })
    assert(droppedMidRestore.exists(_.getMessage.contains("active pins exist")))
    // after the job completes the pin releases and drop succeeds
    c.dropSnapshot("s1")
    assert(c.listSnapshots.isEmpty)
  }

  test("a pin taken through one handle blocks dropSnapshot through ANOTHER handle of the same root") {
    // the PR #48143 race ADVICE r16 flagged: drop markers and the
    // retention sweep are root-global, so an instance-local pin let a
    // second handle drop (and then sweep) the dirs out from under an
    // in-flight restore. The pin registry is root-global now.
    val path = s"${scratch("textlob_xhandlepin")}/data"
    def schema = CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64)
    val c = Collection.create(spark, schema)
    c.insert(rows(5, bigEvery = 2, threshold = 64))
    c.createSnapshot(path, "s1")
    val other = Collection.open(spark, schema, path) // second handle
    val target = s"xhandle_target_${System.nanoTime()}"
    var otherDrop: Option[Throwable] = None
    c.restoreSnapshotAs("s1", target, onPinned = () => {
      otherDrop = Some(intercept[IllegalArgumentException] {
        other.dropSnapshot("s1")
      })
    })
    assert(otherDrop.exists(_.getMessage.contains("active pins exist")),
      s"cross-handle drop must see the pin, got: $otherDrop")
    // after the job completes the pin releases root-globally
    other.dropSnapshot("s1")
    assert(other.listSnapshots.isEmpty)
  }

  test("a concurrent restore to the same target fails fast on the reservation, not after the write") {
    val path = s"${scratch("textlob_restres")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(rows(4, bigEvery = 2, threshold = 64))
    c.createSnapshot(path, "s1")
    val target = s"restres_target_${System.nanoTime()}"
    var second: Option[Throwable] = None
    val jobsBefore = Collection.listRestoreSnapshotJobs().size
    c.restoreSnapshotAs("s1", target, onPinned = () => {
      // the first restore holds the reservation but has not registered
      // the target yet — a second restore to the same name must fail
      // HERE (fast), not in registerCollection after materializing
      second = Some(intercept[IllegalArgumentException] {
        c.restoreSnapshotAs("s1", target)
      })
    })
    assert(second.exists(_.getMessage.contains("duplicate collection")))
    // the loser registered no job; the winner registered the target
    assert(Collection.listRestoreSnapshotJobs().size == jobsBefore + 1)
    assert(Collection.getCollection(target).count() == 4)
    // the reservation released on completion: a fresh target works
    c.restoreSnapshotAs("s1", target + "_2")
    assert(Collection.getCollection(target + "_2").count() == 4)
    Collection.dropCollection(target)
    Collection.dropCollection(target + "_2")
    c.dropSnapshot("s1")
  }

  test("a restored collection survives dropping AND sweeping the source") {
    val path = s"${scratch("textlob_restsweep")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(rows(6, bigEvery = 2, threshold = 64))
    c.createSnapshot(path, "s1")
    val target = s"restsweep_target_${System.nanoTime()}"
    c.restoreSnapshotAs("s1", target)
    val r = Collection.getCollection(target)
    val want = r.query("id >= 1", Seq("id", "text"))
      .select($"id", md5($"text").as("h")).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(want.size == 6)
    // the hard case: churn the source, drop the snapshot, and PHYSICALLY
    // delete the superseded + formerly-pinned dirs — the restored
    // collection must hold no plan over any of them
    c.deletePks(Seq(2L))
    c.flush(path)
    c.compact(path)
    c.lobGc(path)
    c.dropSnapshot("s1")
    c.retentionSweep(path)
    assert(r.query("id >= 1", Seq("id", "text"))
      .select($"id", md5($"text").as("h")).orderBy("id")
      .as[(Long, String)].collect().toSeq == want,
      "restored read must be byte-identical after the source sweep")
  }

  test("restoreSnapshotAs rejects a missing target database up front") {
    val path = s"${scratch("textlob_restdb")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(rows(3, bigEvery = 2, threshold = 64))
    c.createSnapshot(path, "s1")
    val before = Collection.listRestoreSnapshotJobs().size
    val e = intercept[NoSuchElementException] {
      c.restoreSnapshotAs("s1", "t", db = "no_such_db_r16")
    }
    assert(e.getMessage.contains("does not exist"))
    // detected before any write: no job registered, pin released
    assert(Collection.listRestoreSnapshotJobs().size == before)
    c.dropSnapshot("s1")
  }

  test("snapshot description round-trips through describe and reopen (:491)") {
    val path = s"${scratch("textlob_snapdesc")}/data"
    def schema = CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64)
    val c = Collection.create(spark, schema)
    c.insert(rows(3, bigEvery = 2, threshold = 64))
    val desc = "Test description for snapshot"
    c.createSnapshot(path, "s1", description = desc)
    c.createSnapshot(path, "s2") // no description -> empty echo
    assert(c.describeSnapshot("s1")("description") == desc)
    assert(c.describeSnapshot("s2")("description") == "")
    // the description is part of the durable meta — a reopen serves it
    val re = Collection.open(spark, schema, path)
    assert(re.describeSnapshot("s1")("description") == desc)
    val e = intercept[NoSuchElementException] { re.describeSnapshot("nope") }
    assert(e.getMessage.contains("not found"))
  }

  test("restore recreates named partitions, including one dropped after the snapshot (:936,:991)") {
    val path = s"${scratch("textlob_partrest")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.createPartition("p1")
    c.createPartition("p2")
    c.insertInto("p1", rows(4, bigEvery = 2, threshold = 64))
    c.insertInto("p2", (5 to 8).map(i =>
      (i.toLong, s"doc $i payload " + ("y" * 70))).toDF("id", "text"))
    c.createPartition("p_empty") // DDL'd but never written — must restore
    c.alterCollection(Map("note.owner" -> "team-a"))
    c.createSnapshot(path, "s1")
    // :991 — the source drops p2 AFTER the snapshot; the restore must
    // still recreate it with its rows (the drop's tombstones postdate
    // the snapshot cut)
    c.dropPartition("p2")
    val target = s"partrest_target_${System.nanoTime()}"
    c.restoreSnapshotAs("s1", target)
    val r = Collection.getCollection(target)
    assert(r.listPartitions.contains("p1") && r.listPartitions.contains("p2"),
      r.listPartitions.toString)
    // the never-written partition restores from the captured DDL list
    // (data-derived discovery alone cannot know it), and properties ride
    assert(r.listPartitions.contains("p_empty"), r.listPartitions.toString)
    assert(r.count(partitionNames = Seq("p_empty")) == 0)
    assert(r.describeCollectionProperties.get("note.owner").contains("team-a"))
    assert(r.count(partitionNames = Seq("p1")) == 4)
    assert(r.count(partitionNames = Seq("p2")) == 4)
    assert(r.count() == 8)
    // partition-scoped payload resolve stays byte-exact on the target
    assert(r.query("id >= 1", Seq("id", "text"), partitionNames = Seq("p2"))
      .filter(octet_length($"text") > 64).count() ==
      c.readSnapshot("s1").filter($"id" >= 5 && octet_length($"text") > 64).count())
  }

  test("snapshot+restore of a partition-key collection never replays buckets as DDL") {
    val path = s"${scratch("textlob_pkrest")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      partitionKeyField = Some("tenant")))
    c.insert(Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "tenant"))
    c.createSnapshot(path, "s1")
    // the capture must exclude the pre-seeded _pk_* buckets — with them
    // in the DDL list the replay would collide with the target's own
    // pre-seeded buckets and every partition-key restore would fail
    val target = s"pkrest_target_${System.nanoTime()}"
    c.restoreSnapshotAs("s1", target)
    val r = Collection.getCollection(target)
    assert(r.count() == 3)
    // bucket routing survives: a key-scoped read prunes to the tenant
    assert(r.query("tenant == 'a'", Seq("id")).count() == 2)
    // the reserved prefix rejects every caller-named registration —
    // USER DDL and a namespace-partition tenant id alike (a silent
    // reserved-prefix tenant would be misclassified as a bucket and
    // stranded by snapshot capture/restore); engine plumbing (bucket
    // pre-seed, restore replay) is unaffected
    val e = intercept[IllegalArgumentException] { c.createPartition("_pk_custom") }
    assert(e.getMessage.contains("reserved"))
    val ns = Collection.create(spark, CollectionSchema(pkField = "id",
      enableNamespace = true))
    ns.alterCollection(Map(
      Collection.NamespaceModeKey -> Collection.NamespaceModePartition))
    val e2 = intercept[IllegalArgumentException] {
      ns.insert(Seq((1L, "x")).toDF("id", "v"), namespace = Some("_pk_acme"))
    }
    assert(e2.getMessage.contains("reserved"))
  }

  test("a failed restore unpins and records the failure") {
    val path = s"${scratch("textlob_restfail")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(rows(4, bigEvery = 2, threshold = 64))
    c.createSnapshot(path, "s1")
    val target = s"restfail_target_${System.nanoTime()}"
    val boom = intercept[RuntimeException] {
      c.restoreSnapshotAs("s1", target,
        onPinned = () => throw new RuntimeException("injected restore failure"))
    }
    assert(boom.getMessage == "injected restore failure")
    val j = Collection.listRestoreSnapshotJobs()
      .find(x => x.snapshot == "s1" && x.targetName == target).get
    assert(j.state == "RestoreSnapshotFailed" &&
      j.reason.contains("injected restore failure") && j.timeCost > 0L)
    // the pin released: drop succeeds
    c.dropSnapshot("s1")
  }

  // ---- physical retention sweep (garbage_collector.go
  // recycleDroppedSegments + the garbage_collector_lob.go:214-258
  // snapshot carve-out) ----

  test("retentionSweep deletes superseded dirs, honors pins, keeps reads byte-identical") {
    val path = s"${scratch("textlob_sweep")}/data"
    def schema = CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64)
    val c = Collection.create(spark, schema)
    c.insert(rows(8, bigEvery = 2, threshold = 64))
    c.createSnapshot(path, "keep") // flushes: seg + gen manifested
    def engineDirs(p: String): Set[String] = {
      val d = new java.io.File(p)
      Option(d.listFiles()).toSeq.flatten.filter(_.isDirectory).map(_.getName)
        .filter(n => Seq("seg-", "fold-", "run-", "merge-").exists(n.startsWith))
        .toSet
    }
    // a no-op sweep right after a snapshot deletes nothing
    val noop = c.retentionSweep(path)
    assert(noop("data_deleted") == 0L && noop("lob_deleted") == 0L &&
      noop("snapshots_deleted") == 0L, noop.toString)
    // churn: an unpinned orphan + deletes + flush + compact + gc
    c.insert(Seq((99L, "orphan " + ("z" * 80))).toDF("id", "text"))
    c.deletePks(Seq(99L, 2L))
    c.flush(path)
    val preCompact = engineDirs(path)
    c.compact(path)
    assert(c.lobGc(path) == 1L) // only the orphan; id=2's blob is pinned
    val want = c.readSnapshot("keep")
      .select($"id", md5($"text").as("h")).orderBy("id")
      .as[(Long, String)].collect().toSeq
    val liveWant = c.query("id >= 1", Seq("id", "text"))
      .select($"id", md5($"text").as("h")).orderBy("id")
      .as[(Long, String)].collect().toSeq
    val r1 = c.retentionSweep(path)
    // exactly the superseded post-snapshot segment dir went; the
    // pinned pre-churn dirs and the live run dir stayed
    assert(r1("data_deleted") == 1L && r1("data_kept") == 2L, r1.toString)
    assert(r1("lob_deleted") == 1L && r1("lob_kept") == 2L, r1.toString)
    assert(engineDirs(path).size == preCompact.size, // -1 seg +1 run
      "run dir kept, one seg dir swept")
    // both reads byte-identical AFTER the sweep
    assert(c.readSnapshot("keep")
      .select($"id", md5($"text").as("h")).orderBy("id")
      .as[(Long, String)].collect().toSeq == want)
    assert(c.query("id >= 1", Seq("id", "text"))
      .select($"id", md5($"text").as("h")).orderBy("id")
      .as[(Long, String)].collect().toSeq == liveWant)
    // drop the snapshot: the formerly pinned dirs and artifacts reclaim
    c.dropSnapshot("keep")
    val r2 = c.retentionSweep(path)
    assert(r2("data_deleted") == 1L && r2("data_kept") == 1L, r2.toString)
    assert(r2("lob_deleted") == 1L && r2("lob_kept") == 1L, r2.toString)
    assert(r2("snapshots_deleted") == 1L, r2.toString)
    assert(!new java.io.File(s"$path/_snapshots/keep").exists())
    // a reopen of the swept root serves the same live answer
    val re = Collection.open(spark, schema, path)
    assert(re.query("id >= 1", Seq("id", "text"))
      .select($"id", md5($"text").as("h")).orderBy("id")
      .as[(Long, String)].collect().toSeq == liveWant)
  }

  test("a dropped snapshot stays dropped after reopen (durable _dropped marker)") {
    val path = s"${scratch("textlob_dropdur")}/data"
    def schema = CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64)
    val c = Collection.create(spark, schema)
    c.insert(rows(4, bigEvery = 2, threshold = 64))
    c.createSnapshot(path, "s1")
    c.createSnapshot(path, "s2")
    c.dropSnapshot("s1")
    // the artifacts stay on disk (the sweep's job), but a reopen's
    // registry rebuild must NOT resurrect the dropped snapshot
    assert(new java.io.File(s"$path/_snapshots/s1").exists())
    val re = Collection.open(spark, schema, path)
    assert(re.listSnapshots.keySet == Set("s2"))
    intercept[NoSuchElementException] { re.readSnapshot("s1") }
  }

  test("retentionSweep pins snapshots created through ANOTHER handle on the root") {
    val path = s"${scratch("textlob_xhandle")}/data"
    def schema = CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64)
    val a = Collection.create(spark, schema)
    a.insert(rows(6, bigEvery = 2, threshold = 64))
    a.flush(path)
    // handle B opens the same root and snapshots it — A's in-memory
    // registry never learns about it
    val b = Collection.open(spark, schema, path)
    b.createSnapshot(path, "theirs")
    val want = b.readSnapshot("theirs")
      .select($"id", md5($"text").as("h")).orderBy("id")
      .as[(Long, String)].collect().toSeq
    // A churns and sweeps: B's snapshot must pin its dirs and artifacts
    a.deletePks(Seq(2L))
    a.flush(path)
    a.compact(path)
    a.lobGc(path)
    val r = a.retentionSweep(path)
    assert(r("snapshots_deleted") == 0L, r.toString)
    assert(new java.io.File(s"$path/_snapshots/theirs").exists())
    assert(b.readSnapshot("theirs")
      .select($"id", md5($"text").as("h")).orderBy("id")
      .as[(Long, String)].collect().toSeq == want,
      "another handle's snapshot must survive the sweep byte-identical")
  }

  test("retentionSweep: half-written junk expires; a foreign drop spares local artifacts") {
    val path = s"${scratch("textlob_sweepedge")}/data"
    def schema = CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64)
    val a = Collection.create(spark, schema)
    a.insert(rows(4, bigEvery = 2, threshold = 64))
    a.createSnapshot(path, "s1")
    // half-written create junk: a manifest-bearing dir with no meta
    // (crash between the two writes)
    val junk = new java.io.File(s"$path/_snapshots/crashed")
    assert(junk.mkdirs())
    java.nio.file.Files.writeString(junk.toPath.resolve("partial"), "x")
    // a FRESH metaless dir may be a create in progress — kept
    assert(a.retentionSweep(path)("snapshots_deleted") == 0L)
    assert(junk.exists())
    // past the grace window it expires
    assert(a.retentionSweep(path, halfWrittenGraceMs = 0L)("snapshots_deleted") == 1L)
    assert(!junk.exists())
    // foreign drop: handle B drops s1 (writes the durable marker); A's
    // sweep must NOT delete the artifacts A's own registry still reads
    val b = Collection.open(spark, schema, path)
    b.dropSnapshot("s1")
    assert(a.retentionSweep(path)("snapshots_deleted") == 0L)
    assert(a.readSnapshot("s1").count() == 4,
      "A's registered snapshot must stay readable after a foreign drop + sweep")
    // once A drops too (registry no longer references it), it reclaims
    a.dropSnapshot("s1")
    assert(a.retentionSweep(path)("snapshots_deleted") == 1L)
    assert(!new java.io.File(s"$path/_snapshots/s1").exists())
  }

  test("gcPause blocks sweep and lobGc across handles; tickets stack and resume by name") {
    val path = s"${scratch("textlob_gcpause")}/data"
    def schema = CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64)
    val c = Collection.create(spark, schema)
    c.insert(rows(4, bigEvery = 2, threshold = 64))
    c.flush(path)
    assert(c.gcStatus(path)("is_paused") == "false")
    // two tickets, same name is legal (the reference's REST route sends
    // empty tickets); a third under another name outlasts both; a huge
    // duration saturates instead of wrapping negative
    c.gcPause(path, "backup", 60000L)
    c.gcPause(path, "backup", 120000L)
    c.gcPause(path, "migration", Long.MaxValue)
    assert(c.gcStatus(path)("is_paused") == "true")
    assert(c.gcStatus(path)("time_remaining_ms").toLong > 120000L)
    val e = intercept[IllegalStateException] { c.retentionSweep(path) }
    assert(e.getMessage.contains("paused") && e.getMessage.contains("migration"))
    intercept[IllegalStateException] { c.lobGc(path) }
    // the pause is ROOT-scoped, not handle-scoped: a second open() of
    // the same root must refuse too (the reference's pause lives in the
    // one GC coordinator)
    val other = Collection.open(spark, schema, path)
    assert(other.gcStatus(path)("is_paused") == "true")
    intercept[IllegalStateException] { other.retentionSweep(path) }
    // ticket-scoped resume: 'backup' drops both its records, 'migration'
    // still holds the pause
    c.gcResume(path, "backup")
    assert(c.gcStatus(path)("is_paused") == "true")
    intercept[IllegalStateException] { c.retentionSweep(path) }
    c.gcResume(path, "migration")
    assert(c.gcStatus(path)("is_paused") == "false")
    // GC runs again (nothing to reclaim here — the point is no refusal)
    assert(c.retentionSweep(path)("data_deleted") == 0L)
    assert(c.lobGc(path) == 0L)
    // an expired pause never blocks: one-millisecond window, spun past
    c.gcPause(path, "blip", 1L)
    Thread.sleep(5L)
    assert(c.gcStatus(path)("is_paused") == "false")
    assert(c.retentionSweep(path)("data_deleted") == 0L)
  }

  test("retentionSweep after forceMerge keeps BOTH layout views (reopen safety)") {
    val path = s"${scratch("textlob_sweepmerge")}/data"
    def schema = CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64)
    val c = Collection.create(spark, schema)
    c.insert(rows(3, bigEvery = 2, threshold = 64)); c.flush(path)
    c.insert(Seq((50L, "more")).toDF("id", "text")); c.flush(path)
    c.forceMerge(path, targetSizeMb = 1024L)
    // the instance serves merge-* dirs; a reopen would resolve the
    // original seg-* dirs (merge dirs are not part of root resolution) —
    // the sweep must keep BOTH views, so nothing is deletable here
    val r = c.retentionSweep(path)
    assert(r("data_deleted") == 0L,
      s"forceMerge inputs must survive the sweep (reopen reads them): $r")
    val want = c.query("id >= 1", Seq("id")).count()
    assert(Collection.open(spark, schema, path)
      .query("id >= 1", Seq("id")).count() == want)
  }

  test("query after compact + retentionSweep never serves a stale cached plan") {
    // compact/fold/lobGc rewrite the physical layout WITHOUT bumping
    // lastWriteTs — the read-view memo key is unchanged, so without
    // invalidation the memoized plan still reads the superseded dirs
    // and the post-sweep re-run throws FileNotFoundException
    val path = s"${scratch("textlob_stalecache")}/data"
    val c = Collection.create(spark, CollectionSchema(pkField = "id",
      textFields = Map("text" -> matchSpec), textInlineThreshold = 64))
    c.insert(rows(8, bigEvery = 2, threshold = 64))
    c.deletePks(Seq(2L)) // an externalized (big) payload -> orphan after compact
    c.flush(path)
    // ONE read memoizes the lazy plan over the pre-compact seg dirs
    // (a single read is never pinned, so a re-run re-scans disk)
    val want = c.query("id >= 1", Seq("id", "text"))
      .select($"id", md5($"text").as("h")).orderBy("id")
      .as[(Long, String)].collect().toSeq
    c.compact(path)        // rewrites into run-*; lastWriteTs unchanged
    assert(c.lobGc(path) == 1L)  // id=2's payload orphaned by the compact
    c.retentionSweep(path) // deletes the superseded seg/gen dirs
    // the SAME query (same memo key) must re-plan over the live layout
    assert(c.query("id >= 1", Seq("id", "text"))
      .select($"id", md5($"text").as("h")).orderBy("id")
      .as[(Long, String)].collect().toSeq == want)
  }
}
