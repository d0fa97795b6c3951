package graft.format

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Path

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
  * swap that makes a commit visible. The rest of the table (data files,
  * manifests, schemas) rides the [[FileIO]] seam; [[S3FileIO]] is the
  * object-store implementation of that end.
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

  override def putIfAbsent(target: Path, content: String): Boolean = {
    val key = keyFor(target)
    val body = content.getBytes(UTF_8)
    val payloadHash = SigV4.hex(SigV4.sha256(body))
    val host = Option(endpoint.getAuthority).getOrElse(endpoint.getHost)
    val canonicalUri = s"/$bucket/" + SigV4.uriEncode(key, keepSlash = true)
    val headers = SigV4.headers("PUT", canonicalUri, Seq.empty, host,
      payloadHash, clock(), region, accessKey, secretKey)

    val b = HttpRequest.newBuilder(endpoint.resolve(canonicalUri))
      .PUT(HttpRequest.BodyPublishers.ofByteArray(body))
      .header("If-None-Match", "*")
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = http.send(b.build(), HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 200 | 201 => true
      // 412 = conditional-write loser (S3/GCS); 409 = some stores'
      // "already exists" answer under concurrent creates
      case 412 | 409 => false
      case code => throw new IOException(
        s"conditional PUT $canonicalUri failed: HTTP $code ${resp.body()}")
    }
  }
}
