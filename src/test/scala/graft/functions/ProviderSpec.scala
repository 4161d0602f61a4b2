package graft.functions

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Providers._

/** The embedding-provider interface against an in-process HTTP stub:
  * named-provider config resolution (key precedence, default URLs, dim
  * validation), request batching, count/dim response validation, and
  * the 429/5xx-retry vs 4xx-fail-fast contract — VERDICT r6 Next #5.
  */
class ProviderSpec extends SparkSpec {

  /** Deterministic stub: embeds each input text as
    * [len, len+1, ..., len+dim-1]; scriptable failure prefix.
    */
  private class Stub(dim: Int) {
    val requests = new AtomicInteger(0)
    @volatile var failFirst: Int = 0    // fail this many requests...
    @volatile var failStatus: Int = 429 // ...with this status
    @volatile var batchSizes: List[Int] = Nil
    @volatile var lastBody: String = ""
    @volatile var lastAuth: Map[String, String] = Map.empty
    @volatile var dropLast: Boolean = false // return one embedding too few

    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/embed", (ex: HttpExchange) => {
      val n = requests.incrementAndGet()
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      lastBody = body
      lastAuth = Seq("Authorization", "x-goog-api-key", "x-amz-date")
        .flatMap(h =>
          Option(ex.getRequestHeaders.getFirst(h)).map(h -> _)).toMap
      // the request dialect identifies the provider: openai/voyageai/
      // siliconflow send "input", cohere/ali/yc "texts" (ali nested
      // under "input", yc tagged by "modelUri"), tei/huggingface
      // "inputs", gemini a "requests" list, vertexai an "instances" list
      val dialect =
        if (body.contains("\"inputText\"")) "bedrock"
        else if (body.contains("\"modelUri\"")) "yc"
        else if (body.contains("\"input\":{\"texts\":[")) "ali"
        else if (body.contains("\"texts\":[")) "cohere"
        else if (body.contains("\"inputs\":[")) "tei"
        else if (body.contains("\"requests\":[")) "gemini"
        else if (body.contains("\"instances\":[")) "vertexai"
        else "openai"
      def arrayAt(key: String): List[String] = {
        val s = body.indexOf(key) + key.length
        val e = body.indexOf("]", s)
        val seg = body.substring(s, e)
        if (seg.trim.isEmpty) Nil
        else seg.split("\",\"").toList
          .map(_.stripPrefix("\"").stripSuffix("\""))
      }
      def byKey(k: String): List[String] =
        ("\"" + k + "\":\"((?:[^\"\\\\]|\\\\.)*)\"").r
          .findAllMatchIn(body).map(_.group(1)).toList
      val inputs = dialect match {
        case "bedrock"        => byKey("inputText")
        case "gemini"         => byKey("text")
        case "vertexai"       => byKey("content")
        case "yc" =>
          if (body.contains("\"texts\":[")) arrayAt("\"texts\":[")
          else byKey("text")
        case "ali" | "cohere" => arrayAt("\"texts\":[")
        case "tei"            => arrayAt("\"inputs\":[")
        case _                => arrayAt("\"input\":[")
      }
      synchronized { batchSizes = batchSizes :+ inputs.length }
      if (n <= failFirst) {
        ex.sendResponseHeaders(failStatus, -1); ex.close()
      } else {
        val count = if (dropLast) inputs.length - 1 else inputs.length
        def vecOf(i: Int): String = {
          val len = inputs(i).replace("\\\"", "\"").length
          (0 until dim).map(j => (len + j).toFloat).mkString("[", ",", "]")
        }
        // respond in the SAME provider's documented response shape
        val data = dialect match {
          case "cohere" => (0 until count).map(vecOf)
            .mkString("{\"embeddings\":{\"float\":[", ",", "]}}")
          case "tei" => (0 until count).map(vecOf).mkString("[", ",", "]")
          case "gemini" => (0 until count)
            .map(i => s"""{"values":${vecOf(i)}}""")
            .mkString("{\"embeddings\":[", ",", "]}")
          case "vertexai" => (0 until count)
            .map(i => "{\"embeddings\":{\"statistics\":{\"truncated\":false," +
              s""""token_count":2},"values":${vecOf(i)}}}""")
            .mkString("{\"predictions\":[", ",", "]}")
          case "ali" => (0 until count)
            .map(i => s"""{"text_index":$i,"embedding":${vecOf(i)}}""")
            .mkString("{\"output\":{\"embeddings\":[", ",",
              "]},\"usage\":{\"total_tokens\":3}}")
          case "yc" =>
            if (count == 1) s"""{"embedding":${vecOf(0)}}"""
            else (0 until count).map(vecOf)
              .mkString("{\"embeddings\":[", ",", "]}")
          case "bedrock" =>
            s"""{"embedding":${vecOf(0)},"inputTextTokenCount":7}"""
          case _ => (0 until count).map(i => s"""{"embedding":${vecOf(i)}}""")
            .mkString("{\"data\":[", ",", "]}")
        }
        val bytes = data.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    def url: String = s"http://127.0.0.1:${server.getAddress.getPort}/embed"
    def stop(): Unit = server.stop(0)
  }

  private def cfgFor(stub: Stub, dim: Int, provider: String = "openai",
      extra: Map[String, String] = Map.empty): ProviderConfig =
    Providers.resolve(provider,
      Map("url" -> stub.url, "api_key" -> "sk-test", "model_name" -> "m1") ++ extra,
      Map.empty, dim, env = _ => None)

  test("config resolution: defaults, key precedence, dim check, unknown provider") {
    // named defaults survive when no url override is given
    val o = Providers.resolve("openai", Map("api_key" -> "k"), Map.empty, 8, _ => None)
    assert(o.url == "https://api.openai.com/v1/embeddings" && o.maxBatch == 128)
    val c = Providers.resolve("cohere", Map("api_key" -> "k"), Map.empty, 8, _ => None)
    assert(c.url == "https://api.cohere.com/v2/embed" && c.maxBatch == 96)
    // key precedence: params > conf > env
    val viaConf = Providers.resolve("voyageai", Map.empty,
      Map("voyageai.api_key" -> "conf-key"), 8, _ => Some("env-key"))
    assert(viaConf.apiKey == "conf-key")
    val viaEnv = Providers.resolve("voyageai", Map.empty, Map.empty, 8,
      k => if (k == "VOYAGE_API_KEY") Some("env-key") else None)
    assert(viaEnv.apiKey == "env-key")
    // missing key anywhere → explicit error
    val e = intercept[IllegalArgumentException](
      Providers.resolve("openai", Map.empty, Map.empty, 8, _ => None))
    assert(e.getMessage.contains("missing credentials"))
    // tei has no default URL: url is required
    intercept[IllegalArgumentException](
      Providers.resolve("tei", Map("api_key" -> "k"), Map.empty, 8, _ => None))
    // dim param must match the field dim
    intercept[IllegalArgumentException](Providers.resolve("openai",
      Map("api_key" -> "k", "dim" -> "16"), Map.empty, 8, _ => None))
    // unknown provider rejects with the known list
    intercept[IllegalArgumentException](
      Providers.resolve("hal9000", Map("api_key" -> "k"), Map.empty, 8, _ => None))
    // the config's toString never leaks the credential (log-line safety)
    assert(!viaEnv.toString.contains("env-key") &&
      viaEnv.toString.contains("apiKey=***"))
  }

  test("voyageai dialect: 'truncation' request key, OpenAI-shaped response") {
    val stub = new Stub(4)
    try {
      val cfg = cfgFor(stub, 4, provider = "voyageai",
        extra = Map("truncate" -> "true"))
      val embs = new EmbeddingClient(cfg).embed(Seq("hello"))
      assert(stub.lastBody.contains("\"truncation\":true"))
      assert(stub.lastBody.contains("\"input\":["))
      assert(embs.head.toSeq == Seq(5f, 6f, 7f, 8f))
    } finally stub.stop()
  }

  test("cohere v2 dialect: texts/input_type request, embeddings.float response") {
    val stub = new Stub(4)
    try {
      val cfg = cfgFor(stub, 4, provider = "cohere",
        extra = Map("truncate" -> "true"))
      val embs = new EmbeddingClient(cfg).embed(Seq("ab", "cdef"))
      assert(stub.lastBody.contains("\"texts\":[\"ab\",\"cdef\"]"))
      assert(stub.lastBody.contains("\"input_type\":\"search_document\""))
      assert(stub.lastBody.contains("\"embedding_types\":[\"float\"]"))
      assert(stub.lastBody.contains("\"truncate\":\"END\""))
      // the nested embeddings.float matrix parses in order
      assert(embs.map(_.head) == Seq(2f, 4f))
      // truncate=false renders the documented "NONE"
      val cfg2 = cfgFor(stub, 4, provider = "cohere")
      new EmbeddingClient(cfg2).embed(Seq("x"))
      assert(stub.lastBody.contains("\"truncate\":\"NONE\""))
      // query mode switches input_type (cohere getInputType): the same
      // provider embeds search text as search_query, never coerced to
      // the ingest-side document type
      new EmbeddingClient(cfg2.copy(mode = "query")).embed(Seq("x"))
      assert(stub.lastBody.contains("\"input_type\":\"search_query\""))
      intercept[IllegalArgumentException](
        Providers.resolve("cohere", Map("api_key" -> "k"), Map.empty, 4,
          _ => None, mode = "banana"))
    } finally stub.stop()
  }

  test("tei dialect: bare inputs request, bare nested-array response") {
    val stub = new Stub(4)
    try {
      val cfg = cfgFor(stub, 4, provider = "tei")
      val embs = new EmbeddingClient(cfg).embed(Seq("abc", "z"))
      assert(stub.lastBody.contains("\"inputs\":[\"abc\",\"z\"]"))
      assert(!stub.lastBody.contains("\"model\"")) // tei is model-less
      assert(embs.map(_.head) == Seq(3f, 1f))
    } finally stub.stop()
  }

  test("gemini dialect: batchEmbedContents request, values response, goog header") {
    val stub = new Stub(4)
    try {
      val cfg = cfgFor(stub, 4, provider = "gemini",
        extra = Map("dim" -> "4"))
      val embs = new EmbeddingClient(cfg).embed(Seq("ab", "cdef"))
      // one per-text request object, model name models/-prefixed,
      // document-mode task, dim forwarded as outputDimensionality
      assert(stub.lastBody.contains("\"requests\":["))
      assert(stub.lastBody.contains("\"model\":\"models/m1\""))
      assert(stub.lastBody.contains("\"parts\":[{\"text\":\"ab\"}]"))
      assert(stub.lastBody.contains("\"taskType\":\"RETRIEVAL_DOCUMENT\""))
      assert(stub.lastBody.contains("\"outputDimensionality\":4"))
      assert(stub.lastAuth == Map("x-goog-api-key" -> "sk-test"))
      assert(embs.map(_.head) == Seq(2f, 4f))
      // query mode flips the task (gemini getTaskType)
      new EmbeddingClient(cfg.copy(mode = "query")).embed(Seq("q"))
      assert(stub.lastBody.contains("\"taskType\":\"RETRIEVAL_QUERY\""))
      // a user task_type param overrides both modes
      new EmbeddingClient(cfg.copy(taskType = "CLASSIFICATION")).embed(Seq("q"))
      assert(stub.lastBody.contains("\"taskType\":\"CLASSIFICATION\""))
    } finally stub.stop()
  }

  test("vertexai dialect: instances/predict request, predictions response") {
    val stub = new Stub(4)
    try {
      val cfg = cfgFor(stub, 4, provider = "vertexai",
        extra = Map("project_id" -> "p1"))
      val embs = new EmbeddingClient(cfg).embed(Seq("abc", "z"))
      assert(stub.lastBody.contains("\"instances\":["))
      assert(stub.lastBody.contains("\"content\":\"abc\""))
      // default task DOC_RETRIEVAL maps to RETRIEVAL_DOCUMENT on ingest
      assert(stub.lastBody.contains("\"task_type\":\"RETRIEVAL_DOCUMENT\""))
      assert(embs.map(_.head) == Seq(3f, 1f))
      // ...and to RETRIEVAL_QUERY in query mode; CODE_RETRIEVAL inserts
      // as RETRIEVAL_DOCUMENT but queries as CODE_RETRIEVAL_QUERY
      new EmbeddingClient(cfg.copy(mode = "query")).embed(Seq("q"))
      assert(stub.lastBody.contains("\"task_type\":\"RETRIEVAL_QUERY\""))
      new EmbeddingClient(cfg.copy(taskType = "CODE_RETRIEVAL")).embed(Seq("c"))
      assert(stub.lastBody.contains("\"task_type\":\"RETRIEVAL_DOCUMENT\""))
      new EmbeddingClient(cfg.copy(taskType = "CODE_RETRIEVAL", mode = "query"))
        .embed(Seq("c"))
      assert(stub.lastBody.contains("\"task_type\":\"CODE_RETRIEVAL_QUERY\""))
    } finally stub.stop()
  }

  test("ali dashscope dialect: nested input.texts, text_type, output.embeddings") {
    val stub = new Stub(4)
    try {
      val cfg = cfgFor(stub, 4, provider = "ali", extra = Map("dim" -> "4"))
      val embs = new EmbeddingClient(cfg).embed(Seq("ab", "cdef"))
      assert(stub.lastBody.contains("\"input\":{\"texts\":[\"ab\",\"cdef\"]}"))
      assert(stub.lastBody.contains("\"text_type\":\"document\""))
      assert(stub.lastBody.contains("\"dimension\":4"))
      assert(embs.map(_.head) == Seq(2f, 4f))
      new EmbeddingClient(cfg.copy(mode = "query")).embed(Seq("q"))
      assert(stub.lastBody.contains("\"text_type\":\"query\""))
    } finally stub.stop()
  }

  test("siliconflow dialect: OpenAI-shaped with encoding_format/dimensions") {
    val stub = new Stub(4)
    try {
      val cfg = cfgFor(stub, 4, provider = "siliconflow",
        extra = Map("dim" -> "4"))
      val embs = new EmbeddingClient(cfg).embed(Seq("abc"))
      assert(stub.lastBody.contains("\"input\":[\"abc\"]"))
      assert(stub.lastBody.contains("\"encoding_format\":\"float\""))
      assert(stub.lastBody.contains("\"dimensions\":4"))
      assert(embs.head.head == 3f)
      assert(Providers.resolve("siliconflow",
        Map("api_key" -> "k"), Map.empty, 4).maxBatch == 32)
    } finally stub.stop()
  }

  test("huggingface dialect: pipeline url, bare inputs, nested-array response") {
    val stub = new Stub(4)
    try {
      val cfg = cfgFor(stub, 4, provider = "huggingface")
      val embs = new EmbeddingClient(cfg).embed(Seq("ab", "z"))
      assert(stub.lastBody == """{"inputs":["ab","z"]}""")
      assert(embs.map(_.head) == Seq(2f, 1f))
      // default url is the router's feature-extraction pipeline path
      val r = Providers.resolve("huggingface",
        Map("model_name" -> "org/model-x", "api_key" -> "k"), Map.empty, 4)
      assert(r.url == "https://router.huggingface.co/hf-inference/models/" +
        "org/model-x/pipeline/feature-extraction")
      // only the hf-inference provider is supported (buildPipelineURL)
      intercept[IllegalArgumentException](Providers.resolve("huggingface",
        Map("model_name" -> "m", "api_key" -> "k", "hf_provider" -> "other"),
        Map.empty, 4))
    } finally stub.stop()
  }

  test("yc dialect: modelUri, singleton text vs batch texts, Api-Key auth") {
    val stub = new Stub(4)
    try {
      val cfg = cfgFor(stub, 4, provider = "yc")
      // batch request carries "texts" and gets the plural response
      val embs = new EmbeddingClient(cfg).embed(Seq("ab", "cdef"))
      assert(stub.lastBody.contains("\"modelUri\":\"m1\""))
      assert(stub.lastBody.contains("\"texts\":[\"ab\",\"cdef\"]"))
      assert(stub.lastAuth == Map("Authorization" -> "Api-Key sk-test"))
      assert(embs.map(_.head) == Seq(2f, 4f))
      // a singleton chunk sends "text" and parses the singular response
      val one = new EmbeddingClient(cfg).embed(Seq("abc"))
      assert(stub.lastBody.contains("\"text\":\"abc\""))
      assert(!stub.lastBody.contains("\"texts\""))
      assert(one.head.head == 3f)
      // model name is required (it IS the modelUri)
      intercept[IllegalArgumentException](Providers.resolve("yc",
        Map("api_key" -> "k"), Map.empty, 4))
    } finally stub.stop()
  }

  test("bedrock dialect: titan request, SigV4-signed headers, one text per call") {
    val stub = new Stub(4)
    try {
      val cfg = Providers.resolve("bedrock",
        Map("url" -> stub.url, "model_name" -> "amazon.titan-embed-text-v2:0",
          "region" -> "us-east-1", "aws_access_key_id" -> "AKIDEXAMPLE",
          "aws_secret_access_key" -> "sk-secret", "dim" -> "4"),
        Map.empty, 4, env = _ => None)
      assert(cfg.maxBatch == 1) // titan embeds one text per InvokeModel
      val embs = new EmbeddingClient(cfg).embed(Seq("hello", "worlds!"))
      // BedRockRequest: inputText + dimensions (dim param given) +
      // normalize (default true); omitempty drops nothing here
      assert(stub.lastBody ==
        """{"inputText":"worlds!","dimensions":4,"normalize":true}""")
      assert(stub.batchSizes == List(1, 1)) // a text per request
      assert(embs.map(_.head) == Seq(5f, 7f))
      // the Authorization header is a full SigV4 signature over THIS
      // request: recompute server-side from the captured x-amz-date and
      // the known secret — byte-equality is the same check AWS performs
      val amzDate = stub.lastAuth("x-amz-date")
      assert(amzDate.matches("""\d{8}T\d{6}Z"""), amzDate)
      val expected = SigV4.sign("POST", stub.url, "bedrock", "us-east-1",
        "AKIDEXAMPLE", "sk-secret", stub.lastBody.getBytes("UTF-8"), amzDate,
        extraHeaders = Seq("content-type" -> "application/json"))
        .toMap.apply("Authorization")
      assert(stub.lastAuth("Authorization") == expected)
      assert(stub.lastAuth("Authorization").matches(
        "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/\\d{8}/us-east-1/bedrock/" +
          "aws4_request, SignedHeaders=content-type;host;x-amz-date, " +
          "Signature=[0-9a-f]{64}"))

      // normalize=false drops from the wire (Go omitempty); no dim param
      // drops dimensions
      val cfg2 = Providers.resolve("bedrock",
        Map("url" -> stub.url, "model_name" -> "m", "region" -> "us-east-1",
          "aws_access_key_id" -> "ak", "aws_secret_access_key" -> "sk",
          "normalize" -> "false"),
        Map.empty, 4, env = _ => None)
      new EmbeddingClient(cfg2).embed(Seq("abc"))
      assert(stub.lastBody == """{"inputText":"abc"}""")
    } finally stub.stop()
  }

  test("bedrock config: region/credentials required, env fallback, default url") {
    def res(params: Map[String, String],
        env: String => Option[String] = _ => None) =
      Providers.resolve("bedrock",
        Map("model_name" -> "amazon.titan-embed-text-v2:0") ++ params,
        Map.empty, 4, env = env)
    // default endpoint derives from region, model id ':' percent-encodes
    val c = res(Map("region" -> "eu-west-2", "aws_access_key_id" -> "ak",
      "aws_secret_access_key" -> "sk"))
    assert(c.url == "https://bedrock-runtime.eu-west-2.amazonaws.com/" +
      "model/amazon.titan-embed-text-v2%3A0/invoke")
    assert(c.normalize) // default true
    // parseAKSKInfo env fallback (common.go:95-96 names)
    val viaEnv = res(Map("region" -> "us-east-1"), env = {
      case "MILVUS_BEDROCK_ACCESS_KEY_ID"     => Some("eak")
      case "MILVUS_BEDROCK_SECRET_ACCESS_KEY" => Some("esk")
      case _                                  => None
    })
    assert(viaEnv.apiKey == "eak" && viaEnv.secretKey == "esk")
    // named errors: missing access key, missing secret, missing region,
    // bad normalize value (bedrock_embedding_provider.go:59-67,143)
    val noAk = intercept[IllegalArgumentException](res(Map("region" -> "r")))
    assert(noAk.getMessage.contains("MILVUS_BEDROCK_ACCESS_KEY_ID"))
    val noSk = intercept[IllegalArgumentException](
      res(Map("region" -> "r", "aws_access_key_id" -> "ak")))
    assert(noSk.getMessage.contains("MILVUS_BEDROCK_SECRET_ACCESS_KEY"))
    val noRegion = intercept[IllegalArgumentException](
      res(Map("aws_access_key_id" -> "ak", "aws_secret_access_key" -> "sk")))
    assert(noRegion.getMessage.contains("missing AWS Service region"))
    val badNorm = intercept[IllegalArgumentException](
      res(Map("region" -> "r", "aws_access_key_id" -> "ak",
        "aws_secret_access_key" -> "sk", "normalize" -> "banana")))
    assert(badNorm.getMessage.contains("illegal [normalize:banana] param"))
    // credentials never leak through the config's toString
    assert(!c.toString.contains("sk"))
  }

  test("gemini/vertexai config resolution: default urls, required params") {
    // gemini default url is the model's batchEmbedContents endpoint
    val g = Providers.resolve("gemini",
      Map("model_name" -> "text-embedding-004", "api_key" -> "k"),
      Map.empty, 4)
    assert(g.url == "https://generativelanguage.googleapis.com/v1beta/" +
      "models/text-embedding-004:batchEmbedContents")
    assert(g.maxBatch == 32)
    // vertexai derives its predict url from location + project + model
    val v = Providers.resolve("vertexai",
      Map("model_name" -> "text-embedding-005", "api_key" -> "k",
        "project_id" -> "proj", "location" -> "eu-west1"),
      Map.empty, 4)
    assert(v.url == "https://eu-west1-aiplatform.googleapis.com/v1/projects/" +
      "proj/locations/eu-west1/publishers/google/models/" +
      "text-embedding-005:predict")
    assert(v.taskType == "DOC_RETRIEVAL")
    // without an explicit url, project_id is required
    intercept[IllegalArgumentException](Providers.resolve("vertexai",
      Map("model_name" -> "m", "api_key" -> "k"), Map.empty, 4))
  }

  test("batching: maxBatch-sized chunks, all rows embedded in order") {
    val stub = new Stub(4)
    try {
      val cfg = cfgFor(stub, 4).copy(maxBatch = 4)
      val texts = (1 to 10).map(i => "x" * i)
      val embs = new EmbeddingClient(cfg).embed(texts)
      assert(stub.batchSizes == List(4, 4, 2))
      // stub embeds [len, len+1, ...]: order is preserved through chunks
      assert(embs.map(_.head.toInt) == (1 to 10))
    } finally stub.stop()
  }

  test("response with wrong embedding count fails the call") {
    val stub = new Stub(4)
    try {
      stub.dropLast = true
      val cfg = cfgFor(stub, 4)
      val e = intercept[IllegalArgumentException](
        new EmbeddingClient(cfg).embed(Seq("a", "bb")))
      assert(e.getMessage.contains("embeddings for"))
    } finally stub.stop()
  }

  test("response with wrong dim fails the call") {
    val stub = new Stub(6) // serves 6 floats against a dim-4 field
    try {
      val cfg = cfgFor(stub, 4)
      val e = intercept[IllegalArgumentException](
        new EmbeddingClient(cfg).embed(Seq("a")))
      assert(e.getMessage.contains("required embedding dim"))
    } finally stub.stop()
  }

  test("429/5xx retry then succeed; other 4xx fail fast without retry") {
    val stub = new Stub(4)
    try {
      stub.failFirst = 2; stub.failStatus = 429
      val cfg = cfgFor(stub, 4)
      assert(new EmbeddingClient(cfg).embed(Seq("abc")).head.head == 3.0f)
      assert(stub.requests.get() == 3) // 2 transient failures + 1 success

      stub.requests.set(0); stub.failFirst = 2; stub.failStatus = 503
      assert(new EmbeddingClient(cfg).embed(Seq("abcd")).head.head == 4.0f)
      assert(stub.requests.get() == 3)

      // exhausting retries surfaces the transient failure
      stub.requests.set(0); stub.failFirst = 99; stub.failStatus = 500
      intercept[RuntimeException](new EmbeddingClient(cfg).embed(Seq("x")))
      assert(stub.requests.get() == cfg.maxRetries)

      // a 400 is the caller's bug: one attempt, immediate failure
      stub.requests.set(0); stub.failFirst = 99; stub.failStatus = 400
      val e = intercept[ProviderRequestException](
        new EmbeddingClient(cfg).embed(Seq("x")))
      assert(e.status == 400 && stub.requests.get() == 1)
    } finally stub.stop()
  }

  /** Rerank stub: scores each doc by its length, reports results in
    * REVERSED index order (clients must map by index, not position).
    */
  private class RerankStub {
    val requests = new AtomicInteger(0)
    @volatile var batchSizes: List[Int] = Nil
    @volatile var dropOne: Boolean = false
    @volatile var scoreFirst: Boolean = false // relevance_score before index
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/rerank", (ex: HttpExchange) => {
      requests.incrementAndGet()
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val s = body.indexOf("\"documents\":[") + 13
      val e = body.indexOf("]", s)
      val seg = body.substring(s, e)
      val docs = if (seg.trim.isEmpty) Nil
        else seg.split("\",\"").toList.map(_.stripPrefix("\"").stripSuffix("\""))
      synchronized { batchSizes = batchSizes :+ docs.length }
      val n = if (dropOne) docs.length - 1 else docs.length
      val results = (0 until n).reverse.map { i =>
        if (scoreFirst) s"""{"relevance_score":${docs(i).length}.5,"index":$i}"""
        else s"""{"index":$i,"relevance_score":${docs(i).length}.5}"""
      }.mkString("{\"results\":[", ",", "]}")
      val bytes = results.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes); ex.close()
    })
    server.start()
    def url: String = s"http://127.0.0.1:${server.getAddress.getPort}/rerank"
    def stop(): Unit = server.stop(0)
  }

  test("rerank config: model name required, named defaults, unknown provider") {
    val c = Providers.resolveRerank("cohere",
      Map("api_key" -> "k", "model_name" -> "rerank-v3"), Map.empty, _ => None)
    assert(c.url == "https://api.cohere.com/v2/rerank" && c.maxBatch == 128)
    val mb = Providers.resolveRerank("voyageai",
      Map("api_key" -> "k", "model_name" -> "m", "max_client_batch_size" -> "16"),
      Map.empty, _ => None)
    assert(mb.maxBatch == 16)
    intercept[IllegalArgumentException](Providers.resolveRerank("cohere",
      Map("api_key" -> "k"), Map.empty, _ => None)) // no model name
    intercept[IllegalArgumentException](Providers.resolveRerank("openai",
      Map("api_key" -> "k", "model_name" -> "m"), Map.empty, _ => None))
  }

  test("rerank: batched, scores mapped by index, count validated") {
    val stub = new RerankStub
    try {
      val cfg = Providers.resolveRerank("cohere",
        Map("api_key" -> "k", "model_name" -> "m", "url" -> stub.url,
          "max_client_batch_size" -> "3"), Map.empty, _ => None)
      val docs = Seq("a", "bb", "ccc", "dddd", "eeeee", "ffffff", "g")
      val scores = new RerankClient(cfg).rerank("q", docs)
      assert(stub.batchSizes == List(3, 3, 1))
      // stub scores len + 0.5, reported in reversed order — mapping by
      // index must still line scores up with their documents
      assert(scores == docs.map(_.length + 0.5f))
      // JSON object member order is unspecified: relevance_score BEFORE
      // index in each entry must parse identically
      stub.scoreFirst = true
      assert(new RerankClient(cfg).rerank("q", docs) == docs.map(_.length + 0.5f))
      stub.scoreFirst = false
      // a missing score is a protocol violation, not a silent zero
      stub.dropOne = true
      val e = intercept[IllegalArgumentException](
        new RerankClient(cfg).rerank("q", Seq("aa", "bbb")))
      assert(e.getMessage.contains("scores for"))
    } finally stub.stop()
  }

  test("embedDataFrame: null texts embed to null without provider calls") {
    import spark.implicits._
    val stub = new Stub(4)
    try {
      val cfg = cfgFor(stub, 4).copy(maxBatch = 8)
      val df = Seq((1L, "abc"), (2L, null: String), (3L, "defgh"))
        .toDF("id", "txt").repartition(1)
      val got = Providers.embedDataFrame(df, "txt", "emb", cfg)
        .orderBy($"id").select($"emb").collect()
      assert(got(0).getSeq[Float](0).head == 3.0f)
      assert(got(1).isNullAt(0)) // null in, null out, no NPE
      assert(got(2).getSeq[Float](0).head == 5.0f)
      assert(stub.batchSizes.forall(_ <= 2)) // nulls never reached the wire
    } finally stub.stop()
  }

  test("embedDataFrame runs executor-side and appends the vector column") {
    import spark.implicits._
    val stub = new Stub(4)
    try {
      val cfg = cfgFor(stub, 4).copy(maxBatch = 8)
      val df = (1 to 20).map(i => (i.toLong, "t" * i)).toDF("id", "txt")
        .repartition(3)
      val out = Providers.embedDataFrame(df, "txt", "emb", cfg)
      val got = out.select($"id", $"emb").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      assert(got.size == 20)
      (1 to 20).foreach { i =>
        assert(got(i.toLong) == Seq.tabulate(4)(j => (i + j).toFloat), s"row $i")
      }
    } finally stub.stop()
  }
}
