package graft.functions

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}

/** External embedding-provider dispatch made REAL against any HTTP
  * endpoint (reference: provider construction in
  * internal/util/function/embedding/{openai,voyageai,cohere,tei}_embedding_provider.go,
  * dispatched from function.go:38-42; shared HTTP/retry contract
  * models/common.go:342-420).
  *
  * What is re-expressed faithfully:
  *  - named provider configs: `model_name`, `dim` (validated against the
  *    field dim, ParseAndCheckFieldDim), `user`, `truncate`
  *    (voyageai), api key from function params → collection conf → env
  *    (the ParseAKAndURL precedence), per-provider default URL and
  *    max batch size (openai/voyageai 128, cohere 96; tei requires an
  *    explicit endpoint URL).
  *  - request batching: texts are sent in maxBatch-sized chunks; each
  *    response must return exactly one embedding per input and each
  *    embedding must match the field dim, else the call fails (the
  *    CallEmbedding count/dim validations).
  *  - retry contract: up to `maxRetries` sends per chunk; 429 and 5xx
  *    are transient and retried with linear backoff, any other non-200
  *    fails immediately (common.go:368-377).
  *
  * Requests and responses speak each provider's documented public wire
  * dialect (see [[EmbeddingClient]]), so the layer is drop-in against
  * real endpoints; the default provider for oracle queries remains the
  * deterministic local [[IngestFunctions.CharFreqEmbedding]] (no egress
  * in any target environment).
  *
  * Scale shape: [[embedDataFrame]] runs the HTTP calls executor-side in
  * `mapPartitions`, one client per partition, batching inside the
  * partition — the corpus never collects to the driver, and concurrency
  * = partition count, the same fan-out the reference gets from its
  * segment-parallel ingest.
  */
object Providers {

  final case class ProviderConfig(
      provider: String,
      url: String,
      apiKey: String,
      modelName: String,
      dim: Int,
      user: String = "",
      truncate: Boolean = false,
      maxBatch: Int = 128,
      timeoutMs: Long = 30000L,
      maxRetries: Int = 3,
      /** "document" on the ingest path, "query" when embedding search
        * text — cohere's input_type switches on it (the reference's
        * cohere_embedding_provider.go getInputType), gemini/vertexai
        * derive RETRIEVAL_DOCUMENT vs RETRIEVAL_QUERY from it.
        */
      mode: String = "document",
      /** User task override: gemini `task_type` param; vertexai `task`
        * (DOC_RETRIEVAL / CODE_RETRIEVAL / STS) — mapped per mode by
        * the dialect (vertexai_embedding_provider.go getTaskType).
        */
      taskType: String = "",
      /** The user's explicit dim PARAM (0 when absent): gemini/vertexai
        * forward it as outputDimensionality only when given, like the
        * reference's embedDimParam; bedrock forwards it as `dimensions`.
        */
      dimParam: Int = 0,
      /** bedrock only: the SigV4 secret half (apiKey carries the access
        * key id), the AWS region the endpoint and signature scope use,
        * and the titan `normalize` flag (default true,
        * bedrock_embedding_provider.go:123).
        */
      secretKey: String = "",
      region: String = "",
      normalize: Boolean = true) {
    // the case-class toString would print the credentials; any log line,
    // exception message, or debug dump of a config must not leak them
    override def toString: String =
      s"ProviderConfig($provider,$url,apiKey=***,$modelName,$dim,$user," +
        s"$truncate,$maxBatch,$timeoutMs,$maxRetries,$mode)"
  }

  /** Resolve a FunctionSchema-style param map to a provider config —
    * the newXxxEmbeddingProvider constructors' shared logic.
    *
    * @param params        function params (model_name, dim, user, url,
    *                      api_key, truncate, timeout_ms)
    * @param conf          collection/service-level conf (api key
    *                      fallback, e.g. "openai.api_key")
    * @param fieldDim      the output vector field's declared dim
    * @param env           environment lookup (injectable for tests)
    */
  def resolve(provider: String, params: Map[String, String],
      conf: Map[String, String], fieldDim: Int,
      env: String => Option[String] = sys.env.get,
      mode: String = "document"): ProviderConfig = {
    require(mode == "document" || mode == "query",
      s"embedding mode must be 'document' or 'query' (got '$mode')")
    val p = provider.toLowerCase
    if (p == "bedrock")
      return resolveBedrock(params, conf, fieldDim, env, mode)
    val modelName = params.getOrElse("model_name", "")
    val (defaultUrl, maxBatch, akEnv) = p match {
      case "openai"   => ("https://api.openai.com/v1/embeddings", 128, "OPENAI_API_KEY")
      case "voyageai" => ("https://api.voyageai.com/v1/embeddings", 128, "VOYAGE_API_KEY")
      case "cohere"   => ("https://api.cohere.com/v2/embed", 96, "COHERE_API_KEY")
      case "tei"      => ("", 32, "TEI_API_KEY") // self-hosted: url is required
      case "gemini" =>
        // gemini_embedding_provider.go:82,92 — model name required (it
        // names the batch endpoint's path)
        require(modelName.nonEmpty, "gemini embedding model name is required")
        (s"https://generativelanguage.googleapis.com/v1beta/models/" +
          s"$modelName:batchEmbedContents", 32, "GEMINI_API_KEY")
      case "vertexai" =>
        // vertexai_embedding_provider.go:165-182: url derives from
        // location (default us-central1) + project_id + model; an
        // explicit url param overrides, otherwise project_id is required
        val location = params.getOrElse("location", "us-central1")
        val url = params.get("url").getOrElse {
          val project = params.getOrElse("project_id",
            throw new IllegalArgumentException(
              "vertexai requires project_id (or an explicit url)"))
          s"https://$location-aiplatform.googleapis.com/v1/projects/" +
            s"$project/locations/$location/publishers/google/models/" +
            s"$modelName:predict"
        }
        (url, 128, "VERTEXAI_API_KEY")
      case "ali" =>
        // ali_embedding_provider.go:52 dashscope text-embedding endpoint
        ("https://dashscope.aliyuncs.com/api/v1/services/embeddings/" +
          "text-embedding/text-embedding", 25, "DASHSCOPE_API_KEY")
      case "siliconflow" =>
        ("https://api.siliconflow.cn/v1/embeddings", 32, "SILICONFLOW_API_KEY")
      case "huggingface" =>
        // huggingface_client.go buildPipelineURL: router + hf_provider
        // (only hf-inference is supported) + model + pipeline task
        require(modelName.nonEmpty,
          "huggingface embedding model name is required") // :101
        val hfp = params.getOrElse("hf_provider", "hf-inference")
        require(hfp == "hf-inference",
          "Hugging Face hf_provider only supports hf-inference")
        (s"https://router.huggingface.co/$hfp/models/$modelName/" +
          "pipeline/feature-extraction", 128, "HUGGINGFACE_API_KEY")
      case "yc" =>
        // yc_embedding_provider.go:34; model name is REQUIRED (it is the
        // modelUri the request carries)
        require(modelName.nonEmpty, "yc embedding model name is required")
        ("https://llm.api.cloud.yandex.net/foundationModels/v1/textEmbedding",
          128, "YC_API_KEY")
      case other => throw new IllegalArgumentException(
        s"unknown embedding provider '$other' (openai, voyageai, cohere, " +
          "tei, gemini, vertexai, ali, siliconflow, huggingface, yc, bedrock)")
    }
    // ParseAndCheckFieldDim: a dim param must match the field's dim
    params.get("dim").foreach { d =>
      require(d.toInt == fieldDim,
        s"function dim param $d does not match field dim $fieldDim")
    }
    // ParseAKAndURL precedence: function params > collection conf > env
    val apiKey = params.get("api_key")
      .orElse(conf.get(s"$p.api_key"))
      .orElse(env(akEnv))
      .getOrElse(throw new IllegalArgumentException(
        s"missing credentials for provider '$p': set api_key in the function " +
          s"params, '$p.api_key' in the collection conf, or $$${akEnv}"))
    val url = params.getOrElse("url", defaultUrl)
    require(url.nonEmpty, s"provider '$p' requires an explicit endpoint url")
    ProviderConfig(
      provider = p,
      url = url,
      apiKey = apiKey,
      modelName = modelName,
      dim = fieldDim,
      user = params.getOrElse("user", ""),
      truncate = params.get("truncate").exists(_.toBoolean),
      maxBatch = maxBatch,
      timeoutMs = params.get("timeout_ms").map(_.toLong).getOrElse(30000L),
      maxRetries = {
        val r = params.get("max_retries").map(_.toInt).getOrElse(3)
        require(r >= 1, s"max_retries must be >= 1 (got $r)")
        r
      },
      mode = mode,
      taskType = params.getOrElse("task_type",
        params.getOrElse("task", if (p == "vertexai") "DOC_RETRIEVAL" else "")),
      dimParam = params.get("dim").map(_.toInt).getOrElse(0))
  }

  /** Bedrock config (embedding/bedrock_embedding_provider.go:116-176):
    * TWO static credentials (access key id + secret) with the
    * params > conf > env precedence of parseAKSKInfo (:80-114, env names
    * common.go:95-96), a REQUIRED region (the endpoint host and the
    * SigV4 scope both derive from it, :65-67), a validated `normalize`
    * flag (:136-144), and maxBatch 1 — the titan API embeds one text per
    * InvokeModel call (:172,179 "does not support batches").
    */
  private def resolveBedrock(params: Map[String, String],
      conf: Map[String, String], fieldDim: Int,
      env: String => Option[String], mode: String): ProviderConfig = {
    val modelName = params.getOrElse("model_name", "")
    require(modelName.nonEmpty, "bedrock embedding model name is required")
    def cred(paramKey: String, envKey: String): String =
      params.get(paramKey)
        .orElse(conf.get(s"bedrock.$paramKey"))
        .orElse(env(envKey))
        .getOrElse(throw new IllegalArgumentException(
          "missing credentials config or configure the " +
            s"$envKey environment variable in the service"))
    val accessKey = cred("aws_access_key_id", "MILVUS_BEDROCK_ACCESS_KEY_ID")
    val secretKey = cred("aws_secret_access_key", "MILVUS_BEDROCK_SECRET_ACCESS_KEY")
    val region = params.getOrElse("region",
      throw new IllegalArgumentException(
        "missing AWS Service region. Please pass `region` param"))
    val normalize = params.get("normalize").map(_.toLowerCase) match {
      case None | Some("true") => true
      case Some("false")       => false
      case Some(v) => throw new IllegalArgumentException(
        s"illegal [normalize:$v] param")
    }
    params.get("dim").foreach { d =>
      require(d.toInt == fieldDim,
        s"function dim param $d does not match field dim $fieldDim")
    }
    // public InvokeModel REST shape: POST
    // https://bedrock-runtime.{region}.amazonaws.com/model/{modelId}/invoke
    // — the model id percent-encodes into the path (titan ids carry ':')
    val url = params.getOrElse("url",
      s"https://bedrock-runtime.$region.amazonaws.com/model/" +
        s"${SigV4.encodeSegment(modelName)}/invoke")
    ProviderConfig(
      provider = "bedrock", url = url, apiKey = accessKey,
      modelName = modelName, dim = fieldDim,
      maxBatch = 1,
      timeoutMs = params.get("timeout_ms").map(_.toLong).getOrElse(30000L),
      maxRetries = {
        val r = params.get("max_retries").map(_.toInt).getOrElse(3)
        require(r >= 1, s"max_retries must be >= 1 (got $r)")
        r
      },
      mode = mode,
      dimParam = params.get("dim").map(_.toInt).getOrElse(0),
      secretKey = secretKey, region = region, normalize = normalize)
  }

  /** Thrown when a non-retryable (non-429, non-5xx) status comes back. */
  final class ProviderRequestException(val status: Int, msg: String)
      extends RuntimeException(msg)

  /** Minimal JSON string escape for the request body. */
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Batched embedding client speaking each provider's documented wire
    * dialect (the public API shapes):
    *  - openai:   req `{"model", "input": [...], "user"}` →
    *              resp `{"data": [{"embedding": [...]}, ...]}`
    *  - voyageai: req `{"model", "input": [...], "truncation": bool}` →
    *              resp `{"data": [{"embedding": [...]}, ...]}`
    *  - cohere:   req `{"model", "texts": [...], "input_type":
    *              "search_document", "embedding_types": ["float"],
    *              "truncate": "END"|"NONE"}` (v2 embed) →
    *              resp `{"embeddings": {"float": [[...], ...]}}`
    *  - tei:      req `{"inputs": [...], "truncate": bool}` →
    *              resp `[[...], ...]` (bare nested array)
    * Serializable so `mapPartitions` closures can carry the CONFIG;
    * the HTTP client itself is rebuilt lazily per JVM/executor.
    */
  final class EmbeddingClient(cfg: ProviderConfig) extends Serializable {

    @transient private lazy val http: HttpClient = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(cfg.timeoutMs)).build()

    private[functions] def requestBody(chunk: Seq[String]): String = {
      val arr = chunk.map(jstr).mkString("[", ",", "]")
      cfg.provider match {
        case "voyageai" =>
          s"""{"model":${jstr(cfg.modelName)},"input":$arr,""" +
            s""""truncation":${cfg.truncate}}"""
        case "cohere" =>
          val trunc = if (cfg.truncate) "END" else "NONE"
          val inputType =
            if (cfg.mode == "query") "search_query" else "search_document"
          s"""{"model":${jstr(cfg.modelName)},"texts":$arr,""" +
            s""""input_type":"$inputType","embedding_types":["float"],""" +
            s""""truncate":"$trunc"}"""
        case "tei" =>
          s"""{"inputs":$arr,"truncate":${cfg.truncate}}"""
        case "gemini" =>
          // gemini_client.go:46-70 batchEmbedContents: one request per
          // text; taskType and outputDimensionality only when set
          val task = effectiveTaskType
          val taskField = if (task.isEmpty) "" else s""","taskType":${jstr(task)}"""
          val dimField =
            if (cfg.dimParam > 0) s""","outputDimensionality":${cfg.dimParam}"""
            else ""
          val model = "models/" + cfg.modelName.stripPrefix("models/")
          val reqs = chunk.map(t =>
            s"""{"model":${jstr(model)},"content":{"parts":[{"text":${jstr(t)}}]}""" +
              taskField + dimField + "}").mkString("[", ",", "]")
          s"""{"requests":$reqs}"""
        case "vertexai" =>
          // vertexai_client.go:29-41 predict: instances carry task_type
          // + content, parameters carry outputDimensionality
          val task = effectiveTaskType
          val taskField =
            if (task.isEmpty) "" else s""""task_type":${jstr(task)},"""
          val insts = chunk.map(t =>
            s"""{$taskField"content":${jstr(t)}}""").mkString("[", ",", "]")
          val paramsField =
            if (cfg.dimParam > 0)
              s""","parameters":{"outputDimensionality":${cfg.dimParam}}"""
            else ""
          s"""{"instances":$insts$paramsField}"""
        case "ali" =>
          // ali_dashscope_client.go:27-44: nested input.texts, text_type
          // document|query, dimension only when the user gave a dim param
          val textType = if (cfg.mode == "query") "query" else "document"
          val dimField =
            if (cfg.dimParam > 0) s""","dimension":${cfg.dimParam}""" else ""
          s"""{"model":${jstr(cfg.modelName)},"input":{"texts":$arr},""" +
            s""""parameters":{"text_type":"$textType"$dimField}}"""
        case "siliconflow" =>
          // siliconflow_client.go:58-70: OpenAI-shaped with
          // encoding_format + optional dimensions
          val dimField =
            if (cfg.dimParam > 0) s""","dimensions":${cfg.dimParam}""" else ""
          s"""{"model":${jstr(cfg.modelName)},"input":$arr,""" +
            s""""encoding_format":"float"$dimField}"""
        case "huggingface" =>
          // feature-extraction pipeline: bare inputs (the model lives in
          // the URL), huggingface_client.go:81-91
          s"""{"inputs":$arr}"""
        case "yc" =>
          // yc_embedding_provider.go:37-41 + CallEmbedding: a singleton
          // chunk sends "text", a batch sends "texts"
          if (chunk.size == 1)
            s"""{"modelUri":${jstr(cfg.modelName)},"text":${jstr(chunk.head)}}"""
          else s"""{"modelUri":${jstr(cfg.modelName)},"texts":$arr}"""
        case "bedrock" =>
          // BedRockRequest (bedrock_embedding_provider.go:229-233): one
          // inputText per call; Go's omitempty drops dimensions=0 and
          // normalize=false from the wire
          require(chunk.size == 1, "bedrock embeds one text per request")
          val dimField =
            if (cfg.dimParam > 0) s""","dimensions":${cfg.dimParam}""" else ""
          val normField = if (cfg.normalize) ""","normalize":true""" else ""
          s"""{"inputText":${jstr(chunk.head)}$dimField$normField}"""
        case _ => // openai (and the default dialect)
          s"""{"model":${jstr(cfg.modelName)},"input":$arr,""" +
            s""""user":${jstr(cfg.user)}}"""
      }
    }

    /** Mode × task mapping (gemini_embedding_provider.go getTaskType /
      * vertexai_embedding_provider.go getTaskType): queries retrieve,
      * documents index; a user task narrows or overrides.
      */
    private[functions] def effectiveTaskType: String = cfg.provider match {
      case "gemini" =>
        if (cfg.taskType.nonEmpty) cfg.taskType
        else if (cfg.mode == "query") "RETRIEVAL_QUERY"
        else "RETRIEVAL_DOCUMENT"
      case "vertexai" => (cfg.taskType, cfg.mode) match {
        case ("DOC_RETRIEVAL", "query")   => "RETRIEVAL_QUERY"
        case ("DOC_RETRIEVAL", _)         => "RETRIEVAL_DOCUMENT"
        case ("CODE_RETRIEVAL", "query")  => "CODE_RETRIEVAL_QUERY"
        // inserting does not distinguish doc vs code (reference comment)
        case ("CODE_RETRIEVAL", _)        => "RETRIEVAL_DOCUMENT"
        case ("STS", _)                   => "SEMANTIC_SIMILARITY"
        case _                            => ""
      }
      case _ => ""
    }

    /** Embed all texts: maxBatch-sized chunks, retry-per-chunk,
      * count+dim validation per response (CallEmbedding's loop).
      */
    def embed(texts: Seq[String]): Seq[Array[Float]] =
      texts.grouped(cfg.maxBatch).flatMap { chunk =>
        val resp = sendWithRetry(requestBody(chunk))
        val embs = parseResponse(resp)
        require(embs.length == chunk.length,
          s"provider returned ${embs.length} embeddings for ${chunk.length} texts")
        embs.foreach(e => require(e.length == cfg.dim,
          s"the required embedding dim is [${cfg.dim}], but the embedding " +
            s"obtained from the model is [${e.length}]"))
        embs
      }.toSeq

    /** Transport for sibling clients sharing the retry contract. */
    private[functions] def sendRaw(body: String): String = sendWithRetry(body)

    /** 429/5xx retried up to maxRetries with linear backoff; other
      * non-200 fail immediately (models/common.go:368-377).
      */
    private def sendWithRetry(body: String): String = {
      var attempt = 0
      var lastErr: Throwable = null
      while (attempt < cfg.maxRetries) {
        try {
          // gemini authenticates via x-goog-api-key (gemini_client.go:39-44),
          // yc via Api-Key (yc_embedding_provider.go:118), bedrock signs
          // the whole request SigV4 (the AWS SDK's signing the reference
          // client performs implicitly — service name "bedrock", scope
          // from the config region, content-type in the signed set);
          // everyone else speaks Authorization: Bearer
          val authHeaders: Seq[(String, String)] = cfg.provider match {
            case "gemini" => Seq("x-goog-api-key" -> cfg.apiKey)
            case "yc"     => Seq("Authorization" -> s"Api-Key ${cfg.apiKey}")
            case "bedrock" =>
              SigV4.sign("POST", cfg.url, service = "bedrock",
                region = cfg.region, accessKey = cfg.apiKey,
                secretKey = cfg.secretKey,
                payload = body.getBytes(java.nio.charset.StandardCharsets.UTF_8),
                amzDate = SigV4.nowAmzDate(),
                extraHeaders = Seq("content-type" -> "application/json"))
            case _        => Seq("Authorization" -> s"Bearer ${cfg.apiKey}")
          }
          val builder = HttpRequest.newBuilder(URI.create(cfg.url))
            .timeout(Duration.ofMillis(cfg.timeoutMs))
            .header("Content-Type", "application/json")
          authHeaders.foreach { case (k, v) => builder.header(k, v) }
          val req = builder
            .POST(HttpRequest.BodyPublishers.ofString(body))
            .build()
          val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
          resp.statusCode() match {
            case 200 => return resp.body()
            case s if s == 429 || s >= 500 =>
              lastErr = new RuntimeException(s"transient provider status $s")
            case s =>
              throw new ProviderRequestException(s,
                s"provider request failed with status $s: ${resp.body().take(200)}")
          }
        } catch {
          case e: ProviderRequestException => throw e
          case e: java.io.IOException => lastErr = e
        }
        attempt += 1
        if (attempt < cfg.maxRetries) Thread.sleep(50L * attempt)
      }
      throw new RuntimeException(
        s"provider request failed after ${cfg.maxRetries} attempts", lastErr)
    }

    /** Dispatch to the provider's documented response shape. Narrow by
      * design: the dialects above, not a general JSON parser.
      */
    private[functions] def parseResponse(json: String): Seq[Array[Float]] =
      cfg.provider match {
        case "cohere" =>
          val k = json.indexOf("\"float\"")
          require(k >= 0, "cohere response missing embeddings.float")
          parseFloatArrays(json, json.indexOf('[', k))
        // huggingface feature-extraction returns the tei-shaped bare
        // nested array
        case "tei" | "huggingface" => parseFloatArrays(json, json.indexOf('['))
        // gemini `{"embeddings":[{"values":[...]},...]}` and vertexai
        // `{"predictions":[{"embeddings":{"values":[...]}},...]}` both
        // carry one "values" array per input, in order
        case "gemini" | "vertexai" => parseKeyedArrays(json, "\"values\"")
        case "yc" =>
          // batch responses carry "embeddings": [[...],...]; singletons
          // carry one "embedding": [...] (extractYCEmbeddings)
          val k = json.indexOf("\"embeddings\"")
          if (k >= 0) parseFloatArrays(json, json.indexOf('[', k))
          else parseEmbeddings(json)
        // ali nests OpenAI-style {"embedding": [...]} objects under
        // output.embeddings; siliconflow is OpenAI-shaped data[]
        case _     => parseEmbeddings(json)
      }

    /** Extract every `<key>:[...]` float array in request order. */
    private[functions] def parseKeyedArrays(json: String, key: String)
        : Seq[Array[Float]] = {
      val out = Seq.newBuilder[Array[Float]]
      var i = json.indexOf(key)
      while (i >= 0) {
        val start = json.indexOf('[', i)
        val end = json.indexOf(']', start)
        require(start > 0 && end > start, s"malformed $key array in response")
        out += json.substring(start + 1, end).split(",")
          .iterator.map(_.trim).filter(_.nonEmpty).map(_.toFloat).toArray
        i = json.indexOf(key, end)
      }
      out.result()
    }

    /** Extract every "embedding":[...] array in order (the OpenAI-shaped
      * `data` list voyageai shares).
      */
    private[functions] def parseEmbeddings(json: String): Seq[Array[Float]] = {
      val key = "\"embedding\""
      val out = Seq.newBuilder[Array[Float]]
      var i = json.indexOf(key)
      while (i >= 0) {
        val start = json.indexOf('[', i)
        val end = json.indexOf(']', start)
        require(start > 0 && end > start, "malformed embedding array in response")
        val nums = json.substring(start + 1, end).split(",")
          .iterator.map(_.trim).filter(_.nonEmpty).map(_.toFloat).toArray
        out += nums
        i = json.indexOf(key, end)
      }
      out.result()
    }

    /** Parse a nested `[[...], [...], ...]` float matrix starting at the
      * OUTER '[' at `start` (cohere's embeddings.float, tei's bare body).
      */
    private[functions] def parseFloatArrays(json: String, start: Int): Seq[Array[Float]] = {
      require(start >= 0, "malformed nested embedding array in response")
      val out = Seq.newBuilder[Array[Float]]
      var j = json.indexOf('[', start + 1)
      while (j > 0) {
        val end = json.indexOf(']', j)
        require(end > j, "malformed inner embedding array in response")
        out += json.substring(j + 1, end).split(",")
          .iterator.map(_.trim).filter(_.nonEmpty).map(_.toFloat).toArray
        val nextOpen = json.indexOf('[', end)
        val outerClose = json.indexOf(']', end + 1)
        j = if (nextOpen >= 0 && (outerClose < 0 || nextOpen < outerClose)) nextOpen
            else -1
      }
      out.result()
    }
  }

  /** Resolve a model-rerank provider config (reference: rerank provider
    * constructors internal/util/function/rerank/{cohere,voyageai,tei}
    * _rerank_provider.go — same key/url resolution as embedding, plus
    * `max_client_batch_size` and a REQUIRED model name).
    */
  def resolveRerank(provider: String, params: Map[String, String],
      conf: Map[String, String],
      env: String => Option[String] = sys.env.get): ProviderConfig = {
    val p = provider.toLowerCase
    val (defaultUrl, akEnv) = p match {
      case "cohere"   => ("https://api.cohere.com/v2/rerank", "COHERE_API_KEY")
      case "voyageai" => ("https://api.voyageai.com/v1/rerank", "VOYAGE_API_KEY")
      case "tei"      => ("", "TEI_API_KEY")
      case other => throw new IllegalArgumentException(
        s"unknown rerank provider '$other' (cohere, voyageai, tei)")
    }
    val apiKey = params.get("api_key")
      .orElse(conf.get(s"$p.api_key"))
      .orElse(env(akEnv))
      .getOrElse(throw new IllegalArgumentException(
        s"missing credentials for rerank provider '$p'"))
    val url = params.getOrElse("url", defaultUrl)
    require(url.nonEmpty, s"rerank provider '$p' requires an explicit endpoint url")
    val modelName = params.getOrElse("model_name",
      throw new IllegalArgumentException(s"$p rerank model name is required"))
    ProviderConfig(
      provider = p, url = url, apiKey = apiKey, modelName = modelName,
      dim = 0, // no vector field on the rerank path
      maxBatch = {
        val b = params.get("max_client_batch_size").map(_.toInt).getOrElse(128)
        require(b >= 1, s"max_client_batch_size must be >= 1 (got $b)")
        b
      },
      timeoutMs = params.get("timeout_ms").map(_.toLong).getOrElse(30000L),
      maxRetries = {
        val r = params.get("max_retries").map(_.toInt).getOrElse(3)
        require(r >= 1, s"max_retries must be >= 1 (got $r)")
        r
      })
  }

  /** Batched rerank client: request `{"model", "query", "documents"}`,
    * response `{"results": [{"index": i, "relevance_score": s}, ...]}` —
    * indexes map scores back within the chunk; every document must
    * receive exactly one score. Same retry contract as embeddings.
    */
  final class RerankClient(cfg: ProviderConfig) extends Serializable {
    private val inner = new EmbeddingClient(cfg) // reuse retry transport

    def rerank(query: String, docs: Seq[String]): Seq[Float] =
      docs.grouped(cfg.maxBatch).flatMap { chunk =>
        val body = chunk.map(jstr).mkString(
          s"""{"model":${jstr(cfg.modelName)},"query":${jstr(query)},"documents":[""",
          ",", "]}")
        val resp = inner.sendRaw(body)
        val scores = parseScores(resp, chunk.length)
        scores
      }.toSeq

    /** Parse results[{index, relevance_score}] into chunk order. Walks
      * result OBJECTS ({...} spans — the entries carry no nested
      * objects) and reads both keys within each span, so member order
      * inside an entry is irrelevant (JSON object order is unspecified).
      */
    private[functions] def parseScores(json: String, n: Int): Seq[Float] = {
      def numAfter(span: String, key: String): Option[String] = {
        val k = span.indexOf(key)
        if (k < 0) None
        else {
          val colon = span.indexOf(':', k)
          val end0 = span.indexWhere(c => c == ',' || c == '}', colon)
          val end = if (end0 < 0) span.length else end0
          Some(span.substring(colon + 1, end).trim)
        }
      }
      val out = new Array[Float](n)
      val seen = new Array[Boolean](n)
      var count = 0
      val start = json.indexOf('[')
      var i = if (start < 0) json.length else start
      while (i < json.length) {
        val open = json.indexOf('{', i)
        if (open < 0) i = json.length
        else {
          val close = json.indexOf('}', open)
          require(close > open, "malformed result object in rerank response")
          val span = json.substring(open, close + 1)
          val idx = numAfter(span, "\"index\"")
            .getOrElse(throw new IllegalArgumentException(
              "result entry missing index")).toInt
          val s = numAfter(span, "\"relevance_score\"")
            .getOrElse(throw new IllegalArgumentException(
              "result entry missing relevance_score")).toFloat
          require(idx >= 0 && idx < n, s"rerank index $idx out of range [0,$n)")
          require(!seen(idx), s"duplicate rerank index $idx")
          out(idx) = s; seen(idx) = true; count += 1
          i = close + 1
        }
      }
      require(count == n,
        s"provider returned $count scores for $n documents")
      out.toSeq
    }
  }

  /** Embed a DataFrame column through a provider, executor-side: one
    * client per partition, [[EmbeddingClient.embed]]'s batching inside.
    * Appends `outCol` as array<float>. Rows keep their order within a
    * partition; nothing collects to the driver.
    */
  def embedDataFrame(df: DataFrame, textCol: String, outCol: String,
      cfg: ProviderConfig): DataFrame = {
    val spark = df.sparkSession
    val inIdx = df.columns.indexOf(textCol)
    require(inIdx >= 0, s"column '$textCol' missing")
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType, containsNull = false)))
    val outEnc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      val client = new EmbeddingClient(cfg)
      rows.grouped(cfg.maxBatch).flatMap { chunk =>
        // null texts embed to null (the CharFreqEmbed nullSafeEval
        // contract) — they neither reach the provider nor fail the task
        val texts = chunk.map(r => if (r.isNullAt(inIdx)) null else r.getString(inIdx))
        val embs = client.embed(texts.filter(_ != null))
        val it = embs.iterator
        chunk.iterator.zip(texts.iterator).map { case (r, t) =>
          Row.fromSeq(r.toSeq :+ (if (t == null) null else it.next().toSeq))
        }
      }
    }(outEnc)
  }
}
