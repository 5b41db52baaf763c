package graft.sources

import java.net.URI
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing, implemented from the published
  * algorithm (docs.aws.amazon.com "Signature Version 4 signing process"):
  * canonical request -> string-to-sign -> HMAC-SHA256 key-derivation chain
  * -> Authorization header. This is the signing scheme the reference's SQS
  * binding gets from the AWS SDK (reference AsyncSqsClientImpl.scala:38
  * imports `SqsAsyncClient`, which signs every call with SigV4); here it is
  * re-implemented SDK-free so the wire client stays zero-dependency and the
  * in-process protocol stub can verify signatures independently.
  *
  * Everything is deterministic given (request, credentials, timestamp), so
  * the stub recomputes the signature from the raw wire bytes it received
  * and rejects mismatches exactly like the real service does.
  */
object SigV4 {

  private val AmzDateFormat =
    DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(ZoneOffset.UTC)

  final case class SignedHeaders(headers: Seq[(String, String)])

  def sha256Hex(bytes: Array[Byte]): String =
    hex(MessageDigest.getInstance("SHA-256").digest(bytes))

  def hmacSha256(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  private def hex(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** RFC-3986 encode a URI path segment-wise (slashes preserved). */
  def uriEncodePath(path: String): String =
    if (path.isEmpty) "/"
    else path.split("/", -1).map(uriEncode).mkString("/")

  /** Strict RFC-3986 encoding as SigV4 requires (unreserved chars only). */
  def uriEncode(s: String): String = {
    val sb = new StringBuilder
    s.getBytes(StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || c == '-' || c == '_' || c == '.' || c == '~') sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  def amzDate(epochMs: Long): String = AmzDateFormat.format(Instant.ofEpochMilli(epochMs))

  /** Build the canonical request string (step 1 of the published process).
    * `headers` must already include every header to be signed (lowercase
    * names not required; canonicalization handles case and ordering). */
  def canonicalRequest(
      method: String,
      uri: URI,
      queryParams: Seq[(String, String)],
      headers: Seq[(String, String)],
      payloadHashHex: String): String = {
    val canonicalQuery = queryParams
      .map { case (k, v) => (uriEncode(k), uriEncode(v)) }
      .sorted
      .map { case (k, v) => s"$k=$v" }
      .mkString("&")
    val lower = headers.map { case (k, v) => (k.toLowerCase.trim, v.trim) }.sortBy(_._1)
    val canonicalHeaders = lower.map { case (k, v) => s"$k:$v\n" }.mkString
    val signedHeaderNames = lower.map(_._1).mkString(";")
    Seq(
      method.toUpperCase,
      uriEncodePath(Option(uri.getPath).filter(_.nonEmpty).getOrElse("/")),
      canonicalQuery,
      canonicalHeaders,
      signedHeaderNames,
      payloadHashHex).mkString("\n")
  }

  def credentialScope(amzDateStr: String, region: String, service: String): String =
    s"${amzDateStr.take(8)}/$region/$service/aws4_request"

  def stringToSign(amzDateStr: String, scope: String, canonicalReqSha256Hex: String): String =
    Seq("AWS4-HMAC-SHA256", amzDateStr, scope, canonicalReqSha256Hex).mkString("\n")

  def signingKey(secret: String, amzDateStr: String, region: String, service: String): Array[Byte] = {
    val kDate = hmacSha256(("AWS4" + secret).getBytes(StandardCharsets.UTF_8), amzDateStr.take(8))
    val kRegion = hmacSha256(kDate, region)
    val kService = hmacSha256(kRegion, service)
    hmacSha256(kService, "aws4_request")
  }

  /** Compute the full signature for a request; returns (signedHeaderNames,
    * signatureHex) so callers can build or verify an Authorization header. */
  def signature(
      method: String,
      uri: URI,
      queryParams: Seq[(String, String)],
      headers: Seq[(String, String)],
      payload: Array[Byte],
      amzDateStr: String,
      region: String,
      service: String,
      secretKey: String): (String, String) = {
    val payloadHash = sha256Hex(payload)
    val canonical = canonicalRequest(method, uri, queryParams, headers, payloadHash)
    val scope = credentialScope(amzDateStr, region, service)
    val sts = stringToSign(amzDateStr, scope, sha256Hex(canonical.getBytes(StandardCharsets.UTF_8)))
    val sig = hex(hmacSha256(signingKey(secretKey, amzDateStr, region, service), sts))
    val signedNames = headers.map(_._1.toLowerCase.trim).sorted.mkString(";")
    (signedNames, sig)
  }

  /** Sign a request: returns all headers to attach, including
    * `x-amz-date`, optional `x-amz-security-token`, and `Authorization`. */
  def signRequest(
      method: String,
      uri: URI,
      queryParams: Seq[(String, String)],
      baseHeaders: Seq[(String, String)],
      payload: Array[Byte],
      epochMs: Long,
      region: String,
      service: String,
      creds: QueueCredentials): SignedHeaders = {
    val dateStr = amzDate(epochMs)
    val host = {
      val p = uri.getPort
      if (p == -1) uri.getHost else s"${uri.getHost}:$p"
    }
    val toSign = baseHeaders ++
      Seq("host" -> host, "x-amz-date" -> dateStr) ++
      creds.sessionToken.map("x-amz-security-token" -> _).toSeq
    val (signedNames, sig) =
      signature(method, uri, queryParams, toSign, payload, dateStr, region, service,
        creds.secretAccessKey)
    val scope = credentialScope(dateStr, region, service)
    val auth = s"AWS4-HMAC-SHA256 Credential=${creds.accessKeyId}/$scope, " +
      s"SignedHeaders=$signedNames, Signature=$sig"
    // host is set by the HTTP client itself; everything else is attached
    SignedHeaders((toSign.filterNot(_._1 == "host")) :+ ("Authorization" -> auth))
  }
}
