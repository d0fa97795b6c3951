package graft.format

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Path
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** [[AtomicPublisher]] for S3-compatible object stores, with NO vendor
  * SDK: a conditional `PUT` with `If-None-Match: *` (the store answers
  * `412 Precondition Failed` when the key already exists — one winner
  * per snapshot id, the same create-exclusive contract the local
  * hard-link publisher provides) signed with AWS Signature V4, both of
  * which are public protocol specifications implementable on the bare
  * JDK (`java.net.http` + `javax.crypto`). Works against AWS S3
  * (conditional writes), GCS's XML API, MinIO, and any other
  * S3-compatible endpoint.
  *
  * Scope: this is the snapshot PUBLICATION primitive — the pointer
  * swap that makes a commit visible. Shipping whole tables on an
  * object store additionally needs the data/manifest reads and writes
  * to go through an object-store filesystem, which stays out of scope
  * here (documented in COVERAGE.md).
  */
final class S3Publisher(
    endpoint: URI,
    region: String,
    bucket: String,
    accessKey: String,
    secretKey: String,
    keyFor: Path => String = p => p.toString.stripPrefix("/"),
    clock: () => java.time.Instant = () => java.time.Instant.now())
  extends AtomicPublisher {

  private val http = HttpClient.newHttpClient()
  private val tsFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(ZoneOffset.UTC)
  private val dayFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd").withZone(ZoneOffset.UTC)

  override def putIfAbsent(target: Path, content: String): Boolean = {
    val key = keyFor(target)
    val body = content.getBytes(UTF_8)
    val now = clock()
    val ts = tsFmt.format(now)
    val day = dayFmt.format(now)
    val payloadHash = hex(sha256(body))
    val host = Option(endpoint.getAuthority).getOrElse(endpoint.getHost)
    val canonicalUri = s"/$bucket/" + encodeKey(key)

    val canonicalHeaders =
      s"host:$host\nx-amz-content-sha256:$payloadHash\nx-amz-date:$ts\n"
    val signedHeaders = "host;x-amz-content-sha256;x-amz-date"
    val canonicalRequest =
      s"PUT\n$canonicalUri\n\n$canonicalHeaders\n$signedHeaders\n$payloadHash"
    val scope = s"$day/$region/s3/aws4_request"
    val stringToSign = "AWS4-HMAC-SHA256\n" + ts + "\n" + scope + "\n" +
      hex(sha256(canonicalRequest.getBytes(UTF_8)))
    val signingKey = hmac(hmac(hmac(hmac(
      ("AWS4" + secretKey).getBytes(UTF_8), day), region), "s3"), "aws4_request")
    val signature = hex(hmacRaw(signingKey, stringToSign.getBytes(UTF_8)))
    val auth = s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"

    val req = HttpRequest.newBuilder(endpoint.resolve(canonicalUri))
      .PUT(HttpRequest.BodyPublishers.ofByteArray(body))
      .header("Authorization", auth)
      .header("x-amz-date", ts)
      .header("x-amz-content-sha256", payloadHash)
      .header("If-None-Match", "*")
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 200 | 201 => true
      // 412 = conditional-write loser (S3/GCS); 409 = some stores'
      // "already exists" answer under concurrent creates
      case 412 | 409 => false
      case code => throw new IOException(
        s"conditional PUT $canonicalUri failed: HTTP $code ${resp.body()}")
    }
  }

  /** RFC 3986 encode each path segment, keeping the '/' separators —
    * SigV4's canonical-URI rule for S3 keys. Operates on the segment's
    * UTF-8 BYTES, not UTF-16 chars: per-char encoding would split a
    * surrogate pair into two lone surrogates that each encode as '?'
    * (0x3F), corrupting any key containing a supplementary-plane
    * character (e.g. emoji) and breaking the signature.
    */
  private def encodeKey(key: String): String =
    key.split("/", -1).map(seg => seg.getBytes(UTF_8).map { b =>
      val c = b & 0xff
      val unreserved = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'
      if (unreserved) c.toChar.toString else f"%%$c%02X"
    }.mkString).mkString("/")

  private def sha256(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  private def hmacRaw(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }

  private def hmac(key: Array[Byte], data: String): Array[Byte] =
    hmacRaw(key, data.getBytes(UTF_8))

  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
}
