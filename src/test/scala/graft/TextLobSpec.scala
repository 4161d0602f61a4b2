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
}
