package graft.functions

import java.net.URI
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing, from the public spec
  * (docs.aws.amazon.com "Signature Version 4 signing process"):
  * canonical request → string-to-sign → HMAC key derivation chain →
  * Authorization header. This is the signing the reference delegates to
  * the AWS SDK for its bedrock embedding provider
  * (embedding/bedrock_embedding_provider.go:58-78 builds a
  * bedrockruntime client from static credentials + region; every
  * InvokeModel call goes out SigV4-signed).
  *
  * Pure function of its inputs (the timestamp is a parameter, not a
  * clock read), so the spec pins it against the AWS-published test
  * vector byte-for-byte.
  */
object SigV4 {

  private def sha256Hex(data: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(data)
      .map(b => f"$b%02x").mkString

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  /** RFC 3986 segment encoding for the canonical URI: unreserved chars
    * pass through, everything else (incl. ':' in bedrock model ids like
    * "amazon.titan-embed-text-v2:0") percent-encodes uppercase.
    */
  def encodeSegment(s: String): String =
    s.getBytes(StandardCharsets.UTF_8).map { b =>
      val c = b.toChar
      val unreserved = b >= 0 && (c.isLetter || c.isDigit ||
        c == '-' || c == '_' || c == '.' || c == '~')
      if (unreserved) c.toString else f"%%${b & 0xff}%02X"
    }.mkString

  /** Decode %XX escapes only ('+' stays literal — SigV4 canonicalizes
    * spaces as %20, never '+').
    */
  private def percentDecode(s: String): String = {
    def hex(c: Char): Int = Character.digit(c, 16)
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          hex(s.charAt(i + 1)) >= 0 && hex(s.charAt(i + 2)) >= 0) {
        out.write(hex(s.charAt(i + 1)) * 16 + hex(s.charAt(i + 2))); i += 3
      } else {
        val bytes = c.toString.getBytes(StandardCharsets.UTF_8)
        out.write(bytes, 0, bytes.length); i += 1
      }
    }
    new String(out.toByteArray, StandardCharsets.UTF_8)
  }

  /** Canonical request per the spec: method, canonical URI (each
    * already-encoded path segment URI-encoded ONCE MORE — AWS requires
    * double-encoding for every service except S3, so bedrock's
    * "/model/...%3A0/invoke" canonicalizes as "%253A"), canonical query
    * (pairs normalized to key=value, decoded then re-encoded per SigV4,
    * sorted by key then value), canonical headers (lowercased names,
    * trimmed values, name-sorted, trailing \n each), signed-header list,
    * hex(sha256(payload)).
    */
  def canonicalRequest(method: String, uri: URI,
      headers: Seq[(String, String)], payload: Array[Byte]): String = {
    val rawPath = Option(uri.getRawPath).filter(_.nonEmpty).getOrElse("/")
    // double-encode: re-encode the as-sent (single-encoded) segments,
    // keeping '/' separators; '%' itself becomes %25
    val path = rawPath.split("/", -1).map(encodeSegment).mkString("/")
    val query = Option(uri.getRawQuery).getOrElse("") match {
      case "" => ""
      case q =>
        q.split("&").filter(_.nonEmpty).map { pair =>
          val i = pair.indexOf('=')
          val (k, v) =
            if (i < 0) (pair, "") // bare key normalizes to "key="
            else (pair.substring(0, i), pair.substring(i + 1))
          (encodeSegment(percentDecode(k)), encodeSegment(percentDecode(v)))
        }.sorted.map { case (k, v) => s"$k=$v" }.mkString("&")
    }
    val canon = headers
      .map { case (k, v) => (k.toLowerCase, v.trim.replaceAll("\\s+", " ")) }
      .sortBy(_._1)
    val headerBlock = canon.map { case (k, v) => s"$k:$v\n" }.mkString
    val signedHeaders = canon.map(_._1).mkString(";")
    s"$method\n$path\n$query\n$headerBlock\n$signedHeaders\n" +
      sha256Hex(payload)
  }

  /** The derived-key chain: AWS4+secret → date → region → service →
    * "aws4_request", then the final HMAC over the string-to-sign.
    */
  def stringToSign(canonicalReq: String, amzDate: String,
      scope: String): String =
    s"AWS4-HMAC-SHA256\n$amzDate\n$scope\n" +
      sha256Hex(canonicalReq.getBytes(StandardCharsets.UTF_8))

  def signature(secretKey: String, dateStamp: String, region: String,
      service: String, toSign: String): String = {
    val kDate = hmac(("AWS4" + secretKey).getBytes(StandardCharsets.UTF_8), dateStamp)
    val kRegion = hmac(kDate, region)
    val kService = hmac(kRegion, service)
    val kSigning = hmac(kService, "aws4_request")
    hmac(kSigning, toSign).map(b => f"$b%02x").mkString
  }

  /** Sign a request: returns the headers to attach — x-amz-date plus
    * Authorization (host is computed into the signature but the HTTP
    * client sends it itself; it must stay in SignedHeaders).
    *
    * @param amzDate ISO-basic UTC instant, e.g. "20150830T123600Z"
    */
  def sign(method: String, url: String, service: String, region: String,
      accessKey: String, secretKey: String, payload: Array[Byte],
      amzDate: String,
      extraHeaders: Seq[(String, String)] = Nil): Seq[(String, String)] = {
    val uri = URI.create(url)
    val dateStamp = amzDate.take(8)
    val headers = extraHeaders ++ Seq(
      "host" -> uri.getAuthority,
      "x-amz-date" -> amzDate)
    val canonical = canonicalRequest(method, uri, headers, payload)
    val scope = s"$dateStamp/$region/$service/aws4_request"
    val sig = signature(secretKey, dateStamp, region, service,
      stringToSign(canonical, amzDate, scope))
    val signedHeaders =
      headers.map(_._1.toLowerCase).sorted.mkString(";")
    Seq(
      "x-amz-date" -> amzDate,
      "Authorization" -> (s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
        s"SignedHeaders=$signedHeaders, Signature=$sig"))
  }

  /** Current UTC instant in the ISO-basic shape the spec wants. */
  def nowAmzDate(): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
}
