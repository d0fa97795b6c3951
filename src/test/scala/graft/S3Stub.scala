package graft

import com.sun.net.httpserver.HttpServer

/** In-memory HTTP server speaking the slice of the S3 REST API that
  * [[graft.format.S3FileIO]] uses (GET/PUT/HEAD/DELETE, conditional
  * PUT via If-None-Match, paged ListObjectsV2 with and without
  * delimiter). Shared by [[S3FileIOSpec]] (contract tests, fault
  * injection) and [[S3StubMain]] (a standalone endpoint for driving
  * [[RealS3SmokeSpec]] without real cloud credentials).
  *
  * Signatures are accepted unverified — the stub tests the client's
  * protocol behavior, not auth.
  */
final class S3Stub(bucket: String = "lake", pageSize: Int = 3) {

  val store =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  val putTimes =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  /** Paths containing "flaky" fail with 503 SlowDown this many times. */
  val flakyFailures = new java.util.concurrent.atomic.AtomicInteger(0)
  /** Paths containing "reset" abort the exchange (connection closed
    * with no response — the transport-level failure mode) this many
    * times. */
  val resetFailures = new java.util.concurrent.atomic.AtomicInteger(0)
  /** Every handled exchange counts — tests assert request budgets. */
  val requestCount = new java.util.concurrent.atomic.AtomicInteger(0)

  private val root = s"/$bucket/"
  private var server: HttpServer = _

  def port: Int = server.getAddress.getPort

  def start(fixedPort: Int = 0): S3Stub = {
    server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", fixedPort), 0)
    server.createContext("/", { ex =>
      val path = ex.getRequestURI.getPath // "/<bucket>/<key>"
      val query = Option(ex.getRequestURI.getQuery).getOrElse("")
      val params = query.split("&").filter(_.contains("="))
        .map { p =>
          val Array(k, v) = p.split("=", 2)
          k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
      def respond(code: Int, body: Array[Byte]): Unit = {
        if (body.length == 0) ex.sendResponseHeaders(code, -1)
        else {
          ex.sendResponseHeaders(code, body.length)
          ex.getResponseBody.write(body)
        }
        ex.close()
      }
      requestCount.incrementAndGet()
      ex.getRequestMethod match {
        case _ if path.contains("reset") && resetFailures.getAndDecrement() > 0 =>
          ex.close() // no response at all: client sees an IOException
        case _ if path.contains("flaky") && flakyFailures.getAndDecrement() > 0 =>
          respond(503, "<Error><Code>SlowDown</Code></Error>".getBytes("UTF-8"))
        case "GET" if params.get("list-type").contains("2") =>
          // real stores escape XML-special AND control characters
          // (the latter as numeric character references)
          def esc(s: String): String = s.flatMap {
            case '&' => "&amp;"
            case '<' => "&lt;"
            case '>' => "&gt;"
            case c if c < 0x20 => f"&#x${c.toInt}%02X;"
            case c => c.toString
          }
          def contents(k: String): String = {
            val lm = java.time.Instant
              .ofEpochMilli(putTimes.getOrDefault(k, 0L)).toString
            s"<Contents><Key>${esc(k.stripPrefix(root))}</Key>" +
              s"<LastModified>$lm</LastModified>" +
              s"<Size>${store.get(k).length}</Size></Contents>"
          }
          val prefix = root + params.getOrElse("prefix", "")
          val all = store.keySet().stream().sorted().toArray
            .map(_.toString).filter(_.startsWith(prefix)).toSeq
          val xml = params.get("delimiter") match {
            case Some(d) =>
              // delimiter form: direct-child keys as <Contents>, deeper
              // keys rolled up into <CommonPrefixes> — PAGED like the
              // plain form, honoring max-keys (hasChildren's bounded
              // probe sends max-keys=1 and must get one entry back).
              // Deliberately one group occurrence PER deeper key (no
              // pre-dedupe), so a CommonPrefix repeats across pages and
              // the client's cross-page dedupe is exercised.
              val entries: Seq[Either[String, String]] = all.map { k =>
                val rest = k.stripPrefix(prefix)
                if (!rest.contains(d)) Left(k)
                else Right(prefix + rest.takeWhile(_ != d.head) + d)
              }
              val pg = math.min(pageSize,
                params.get("max-keys").map(_.toInt).getOrElse(Int.MaxValue))
              val from =
                params.get("continuation-token").map(_.toInt).getOrElse(0)
              val page = entries.slice(from, from + pg)
              val truncated = from + pg < entries.size
              "<?xml version=\"1.0\"?><ListBucketResult>" +
                s"<IsTruncated>$truncated</IsTruncated>" +
                (if (truncated)
                  s"<NextContinuationToken>${from + pg}</NextContinuationToken>"
                else "") +
                s"<Prefix>${esc(prefix.stripPrefix(root))}</Prefix>" +
                page.map {
                  case Left(k) => contents(k)
                  case Right(g) => "<CommonPrefixes><Prefix>" +
                    esc(g.stripPrefix(root)) + "</Prefix></CommonPrefixes>"
                }.mkString +
                "</ListBucketResult>"
            case None =>
              val from = params.get("continuation-token").map(_.toInt).getOrElse(0)
              val page = all.slice(from, from + pageSize)
              val truncated = from + pageSize < all.size
              "<?xml version=\"1.0\"?><ListBucketResult>" +
                s"<IsTruncated>$truncated</IsTruncated>" +
                (if (truncated)
                  s"<NextContinuationToken>${from + pageSize}</NextContinuationToken>"
                else "") +
                page.map(contents).mkString +
                "</ListBucketResult>"
          }
          respond(200, xml.getBytes("UTF-8"))
        case "GET" =>
          Option(store.get(path)) match {
            case Some(b) =>
              Option(ex.getRequestHeaders.getFirst("Range")) match {
                case Some(r) if r.startsWith("bytes=") =>
                  val Array(s, e) = r.stripPrefix("bytes=").split("-", 2)
                  val from = s.toLong
                  if (from >= b.length) respond(416, Array.emptyByteArray)
                  else {
                    val to = math.min(e.toLong, b.length - 1L).toInt
                    respond(206,
                      java.util.Arrays.copyOfRange(b, from.toInt, to + 1))
                  }
                case _ => respond(200, b)
              }
            case None => respond(404, Array.emptyByteArray)
          }
        case "HEAD" =>
          Option(store.get(path)) match {
            case Some(b) =>
              // HEAD: advertise length, send no body
              ex.getResponseHeaders.add("Content-Length-Hint", b.length.toString)
              ex.sendResponseHeaders(200, -1)
              ex.close()
            case None => respond(404, Array.emptyByteArray)
          }
        case "PUT" =>
          val body = ex.getRequestBody.readAllBytes()
          val conditional =
            "*" == ex.getRequestHeaders.getFirst("If-None-Match")
          if (conditional && store.putIfAbsent(path, body) != null)
            respond(412, Array.emptyByteArray)
          else {
            if (!conditional) store.put(path, body)
            putTimes.put(path, System.currentTimeMillis())
            respond(200, Array.emptyByteArray)
          }
        case "DELETE" =>
          if (store.remove(path) != null) respond(204, Array.emptyByteArray)
          else respond(404, Array.emptyByteArray)
        case _ => respond(405, Array.emptyByteArray)
      }
    })
    server.start()
    this
  }

  def stop(): Unit = server.stop(0)
}

/** Standalone stub endpoint, for driving [[RealS3SmokeSpec]] in a
  * container with no real object store:
  *
  * {{{
  * sbt "Test/runMain graft.S3StubMain 9000 graft-smoke" &
  * GRAFT_S3_SMOKE_SPEC="s3:http://127.0.0.1:9000:us-east-1:graft-smoke" \
  * GRAFT_S3_ACCESS_KEY=x GRAFT_S3_SECRET_KEY=y \
  *   sbt "testOnly graft.RealS3SmokeSpec"
  * }}}
  */
object S3StubMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(9000)
    val bucket = args.lift(1).getOrElse("graft-smoke")
    // realistic page size so listings of real table layouts paginate
    new S3Stub(bucket, pageSize = 1000).start(port)
    println(s"S3 stub listening on http://127.0.0.1:$port bucket=$bucket")
    Thread.currentThread().join()
  }
}
