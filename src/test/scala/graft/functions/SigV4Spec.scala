package graft.functions

import java.net.URI

import org.scalatest.funsuite.AnyFunSuite

/** SigV4 pinned byte-for-byte against the AWS-PUBLISHED worked example
  * ("Signature Version 4 signing process" developer guide: the
  * GET iam.amazonaws.com ListUsers request with the documented example
  * credentials) — an oracle AWS itself publishes, independent of this
  * implementation.
  */
class SigV4Spec extends AnyFunSuite {

  private val AccessKey = "AKIDEXAMPLE"
  private val SecretKey = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"
  private val AmzDate = "20150830T123600Z"

  test("AWS documented example: canonical request hash, string-to-sign, signature") {
    val uri = URI.create(
      "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08")
    val headers = Seq(
      "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
      "host" -> "iam.amazonaws.com",
      "x-amz-date" -> AmzDate)
    val canonical = SigV4.canonicalRequest("GET", uri, headers, Array.empty)
    // the guide prints the canonical request verbatim
    assert(canonical ==
      "GET\n/\nAction=ListUsers&Version=2010-05-08\n" +
        "content-type:application/x-www-form-urlencoded; charset=utf-8\n" +
        "host:iam.amazonaws.com\nx-amz-date:20150830T123600Z\n\n" +
        "content-type;host;x-amz-date\n" +
        "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
    val toSign = SigV4.stringToSign(canonical, AmzDate,
      "20150830/us-east-1/iam/aws4_request")
    assert(toSign ==
      "AWS4-HMAC-SHA256\n20150830T123600Z\n" +
        "20150830/us-east-1/iam/aws4_request\n" +
        "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59")
    val sig = SigV4.signature(SecretKey, "20150830", "us-east-1", "iam", toSign)
    assert(sig ==
      "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
    // and the assembled header, exactly as the guide prints it
    val auth = SigV4.sign("GET", uri.toString, "iam", "us-east-1",
      AccessKey, SecretKey, Array.empty, AmzDate,
      extraHeaders = Seq(
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8"))
      .toMap.apply("Authorization")
    assert(auth == "AWS4-HMAC-SHA256 " +
      "Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
      "SignedHeaders=content-type;host;x-amz-date, " +
      "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("canonicalization details: query sort, header case/space folding, path") {
    // query params sort bytewise
    val u1 = URI.create("https://h.example.com/p?b=2&a=1&B=3")
    val c1 = SigV4.canonicalRequest("GET", u1,
      Seq("host" -> "h.example.com"), Array.empty)
    assert(c1.linesIterator.toSeq(2) == "B=3&a=1&b=2")
    // header names lowercase + sort; values trim and fold inner spaces
    val c2 = SigV4.canonicalRequest("POST", URI.create("https://h/x"),
      Seq("X-Amz-Date" -> AmzDate, "Host" -> "h",
        "My-Header" -> "  a   b  "), "{}".getBytes("UTF-8"))
    assert(c2.contains("host:h\nmy-header:a b\nx-amz-date:"))
    assert(c2.contains("host;my-header;x-amz-date"))
    // an empty path canonicalizes to "/"
    val c3 = SigV4.canonicalRequest("GET",
      URI.create("https://h.example.com"), Seq("host" -> "h.example.com"),
      Array.empty)
    assert(c3.linesIterator.toSeq(1) == "/")
  }

  test("canonical URI double-encodes the as-sent path (non-S3 rule)") {
    // the bedrock invoke path as resolveBedrock builds it: the model id's
    // ':' is sent single-encoded (%3A); the canonical form re-encodes the
    // sent bytes once more -> %253A (AWS double-encoding for non-S3)
    val u = URI.create("https://bedrock-runtime.us-east-1.amazonaws.com" +
      "/model/amazon.titan-embed-text-v2%3A0/invoke")
    val c = SigV4.canonicalRequest("POST", u,
      Seq("host" -> u.getAuthority), "{}".getBytes("UTF-8"))
    assert(c.linesIterator.toSeq(1) ==
      "/model/amazon.titan-embed-text-v2%253A0/invoke")
    // unencoded specials in a sent path also encode (space -> %20)
    val u2 = URI.create("https://h.example.com/a%20b/c")
    val c2 = SigV4.canonicalRequest("GET", u2,
      Seq("host" -> "h.example.com"), Array.empty)
    assert(c2.linesIterator.toSeq(1) == "/a%2520b/c")
  }

  test("canonical query: bare keys normalize to key=, values re-encode") {
    val u = URI.create("https://h.example.com/p?flag&z=a%2Fb&y=c+d")
    val c = SigV4.canonicalRequest("GET", u,
      Seq("host" -> "h.example.com"), Array.empty)
    // bare 'flag' -> 'flag='; %2F decodes then re-encodes to %2F (stable);
    // '+' is literal in SigV4 query canonicalization -> %2B
    assert(c.linesIterator.toSeq(2) == "flag=&y=c%2Bd&z=a%2Fb")
  }

  test("segment encoding: unreserved pass, ':' and unicode percent-encode") {
    assert(SigV4.encodeSegment("amazon.titan-embed-text-v2:0") ==
      "amazon.titan-embed-text-v2%3A0")
    assert(SigV4.encodeSegment("a-b_c.d~e") == "a-b_c.d~e")
    assert(SigV4.encodeSegment("a b/c") == "a%20b%2Fc")
    assert(SigV4.encodeSegment("é") == "%C3%A9") // UTF-8 bytes, uppercase hex
  }
}
