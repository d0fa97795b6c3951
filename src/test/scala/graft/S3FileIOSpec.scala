package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Paths

/** Contract test for [[graft.format.S3FileIO]] against a local
  * in-memory HTTP stub speaking the used slice of the S3 REST API
  * (GET/PUT/HEAD/DELETE, conditional PUT, paged ListObjectsV2) — no
  * real store or SDK exists in this container. The headline case runs
  * a whole graft table (data file + manifest + snapshot commit + read
  * back) with every byte living in the "store".
  */
class S3FileIOSpec extends AnyFunSuite with BeforeAndAfterAll {

  // small page size forces ListObjectsV2 pagination through the client;
  // server behavior lives in the shared S3Stub (also runnable
  // standalone via S3StubMain for RealS3SmokeSpec)
  private val stub = new S3Stub(bucket = "lake", pageSize = 3)
  private def store = stub.store
  private def flakyFailures = stub.flakyFailures
  private def resetFailures = stub.resetFailures
  private def requestCount = stub.requestCount
  private var io: graft.format.S3FileIO = _

  override def beforeAll(): Unit = {
    stub.start()
    io = new graft.format.S3FileIO(
      endpoint = java.net.URI.create(s"http://127.0.0.1:${stub.port}"),
      region = "us-east-1", bucket = "lake",
      accessKey = "test-access", secretKey = "test-secret")
  }

  override def afterAll(): Unit = stub.stop()

  test("io spec parsing keeps colons in the endpoint URI") {
    import graft.format.FileIO
    // endpoint with scheme+port: parse must succeed and fail only on
    // the missing credentials (env), not on the spec format
    val e = intercept[IllegalArgumentException](
      FileIO.resolve("s3:http://127.0.0.1:9000:us-east-1:lake"))
    assert(e.getMessage.contains("GRAFT_S3_ACCESS_KEY"), e.getMessage)
    // too few segments IS a format error
    val bad = intercept[IllegalArgumentException](
      FileIO.resolve("s3:onlyhost:lake"))
    assert(bad.getMessage.contains("Bad io spec"), bad.getMessage)
    // unknown scheme rejected; local and memory resolve
    intercept[IllegalArgumentException](FileIO.resolve("ftp:x"))
    assert(FileIO.resolve("local") eq FileIO.local)
    assert(FileIO.resolve("memory:a") eq FileIO.resolve("memory:a"))
    assert(FileIO.resolve("memory:a") ne FileIO.resolve("memory:b"))
  }

  test("byte ops: put/get/head/delete and the conditional-put winner") {
    val p = Paths.get("/wh/t/snapshot/snapshot-1")
    assert(!io.exists(p))
    intercept[java.nio.file.NoSuchFileException](io.readBytes(p))
    assert(io.putIfAbsent(p, "{\"id\":1}"))
    assert(!io.putIfAbsent(p, "{\"id\":1,\"loser\":true}"),
      "second conditional PUT must lose with 412")
    assert(io.readString(p) == "{\"id\":1}")
    assert(io.exists(p))
    io.writeAtomic(Paths.get("/wh/t/snapshot/LATEST"), "1".getBytes("UTF-8"))
    assert(io.readString(Paths.get("/wh/t/snapshot/LATEST")) == "1")
    assert(io.delete(p))
    assert(!io.delete(p))
    assert(!io.exists(p))
  }

  test("ranged GET slices without downloading the whole object") {
    val p = Paths.get("/wh/rng/blob")
    val body = (0 until 100).map(i => ('a' + i % 26).toChar).mkString
    io.writeAtomic(p, body.getBytes("UTF-8"))
    assert(new String(io.readRange(p, 0, 10), "UTF-8") == body.take(10))
    assert(new String(io.readRange(p, 95, 10), "UTF-8") == body.drop(95),
      "range past EOF must come back short, not fail")
    assert(io.readRange(p, 100, 10).isEmpty, "range at EOF is empty (416)")
    assert(io.readRange(p, 5, 0).isEmpty)
    assert(new String(io.readRange(p, 42, 1), "UTF-8") == body(42).toString)
  }

  test("FileIOInputStream serves seek/positioned reads over FileIO") {
    val fio = graft.format.FileIO.resolve("memory:s3spec-ranged")
    val p = Paths.get("/wh/rng/stream")
    val body = Array.tabulate[Byte](5000)(i => (i % 251).toByte)
    fio.writeAtomic(p, body)
    val in = new graft.format.FileIOInputStream(fio, p, body.length.toLong)
    // sequential read through the read-ahead buffer
    val head = new Array[Byte](100)
    assert(in.read(head, 0, 100) == 100)
    assert(head.toSeq == body.take(100).toSeq)
    assert(in.getPos == 100L)
    // seek + read
    in.seek(4990L)
    val tail = new Array[Byte](100)
    assert(in.read(tail, 0, 100) == 10, "read at EOF must be short")
    assert(tail.take(10).toSeq == body.drop(4990).toSeq)
    assert(in.read() == -1)
    // positioned read must not move pos
    val mid = new Array[Byte](7)
    in.readFully(1234L, mid)
    assert(mid.toSeq == body.slice(1234, 1241).toSeq)
    assert(in.getPos == 5000L)
    intercept[java.io.EOFException](in.readFully(4995L, new Array[Byte](10)))
  }

  test("list pages through ListObjectsV2 and keeps only direct children") {
    (1 to 8).foreach(i => io.writeAtomic(
      Paths.get(s"/wh/lst/snapshot/snapshot-$i"), s"s$i".getBytes("UTF-8")))
    // a deeper key must not appear as a child of snapshot/
    io.writeAtomic(Paths.get("/wh/lst/snapshot/sub/deep"), "x".getBytes("UTF-8"))
    val names = io.list(Paths.get("/wh/lst/snapshot")).sorted
    assert(names == (1 to 8).map(i => s"snapshot-$i").sorted.toList, s"got $names")
    assert(io.list(Paths.get("/wh/lst/absent")).isEmpty)
  }

  test("transient 503 SlowDown is retried with backoff; commits are not") {
    val p = Paths.get("/wh/flaky/blob")
    io.writeAtomic(p, "v1".getBytes("UTF-8"))
    flakyFailures.set(2)
    assert(io.readString(p) == "v1", "GET must survive two 503s")
    flakyFailures.set(2)
    io.writeAtomic(p, "v2".getBytes("UTF-8")) // idempotent PUT retried
    assert(io.readString(p) == "v2")
    // the conditional PUT must NOT retry (a lost response would
    // misreport the winner as loser): a 503 surfaces as an error
    flakyFailures.set(1)
    intercept[java.io.IOException](
      io.putIfAbsent(Paths.get("/wh/flaky/commit"), "{}"))
    flakyFailures.set(0)
    assert(io.putIfAbsent(Paths.get("/wh/flaky/commit"), "{}"))
  }

  test("children lists sizes, mtimes and dirs in one LIST per page") {
    (1 to 5).foreach(i => io.writeAtomic(
      Paths.get(s"/wh/ch/f$i"), ("x" * i).getBytes("UTF-8")))
    io.writeAtomic(Paths.get("/wh/ch/sub/deep"), "d".getBytes("UTF-8"))
    io.writeAtomic(Paths.get("/wh/ch/sub2/a/b"), "e".getBytes("UTF-8"))
    // a second deeper key under sub/: entries are f1..f5, sub/, sub/,
    // sub2/ — with PageSize 3 the two sub/ occurrences land on pages 2
    // and 3, exercising the client's cross-page CommonPrefixes dedupe
    io.writeAtomic(Paths.get("/wh/ch/sub/deep2"), "f".getBytes("UTF-8"))
    val before = requestCount.get()
    val got = io.children(Paths.get("/wh/ch"))
    // 8 listing entries / PageSize 3 = 3 pages — one LIST each, never a
    // HEAD per key (N+1)
    assert(requestCount.get() - before == 3,
      s"children must cost one LIST per page, got ${requestCount.get() - before}")
    val files = got.filterNot(_.isDir).map(e => e.relPath -> e.sizeBytes).toMap
    assert(files == Map("f1" -> 1L, "f2" -> 2L, "f3" -> 3L,
      "f4" -> 4L, "f5" -> 5L), got)
    assert(got.filter(_.isDir).map(_.relPath).sorted == List("sub", "sub2"), got)
    assert(got.filterNot(_.isDir).forall(_.lastModifiedMillis > 0L), got)
    assert(io.children(Paths.get("/wh/ch-absent")).isEmpty)
  }

  test("hasChildren is a single bounded LIST regardless of dir size") {
    (1 to 9).foreach(i => io.writeAtomic(
      Paths.get(s"/wh/hc/f$i"), "x".getBytes("UTF-8")))
    val before = requestCount.get()
    assert(io.hasChildren(Paths.get("/wh/hc")))
    assert(requestCount.get() - before == 1,
      s"hasChildren must probe with ONE max-keys=1 LIST, " +
        s"got ${requestCount.get() - before} requests for 9 children")
    // deeper-only prefix still answers true (CommonPrefixes count)
    io.writeAtomic(Paths.get("/wh/hc2/sub/deep"), "x".getBytes("UTF-8"))
    val b2 = requestCount.get()
    assert(io.hasChildren(Paths.get("/wh/hc2")))
    assert(requestCount.get() - b2 == 1)
    assert(!io.hasChildren(Paths.get("/wh/hc-absent")))
  }

  test("transport failures (connection reset) retry like 503s; commits do not") {
    val p = Paths.get("/wh/reset/blob")
    io.writeAtomic(p, "v1".getBytes("UTF-8"))
    resetFailures.set(2)
    assert(io.readString(p) == "v1", "GET must survive two connection resets")
    resetFailures.set(2)
    io.writeAtomic(p, "v2".getBytes("UTF-8")) // idempotent PUT retried too
    assert(io.readString(p) == "v2")
    // the conditional PUT must surface the transport failure unretried:
    // its first attempt may have won server-side, and a blind retry
    // would see 412 and misreport this committer as the loser
    resetFailures.set(1)
    intercept[java.io.IOException](
      io.putIfAbsent(Paths.get("/wh/reset/commit"), "{}"))
    resetFailures.set(0)
    assert(io.putIfAbsent(Paths.get("/wh/reset/commit"), "{}"))
  }

  test("list round-trips keys with XML-special and control characters") {
    // stores emit numeric character references (&#x0C;) for control
    // chars and named entities for &/<, so listing must decode both
    val names = Seq("a&b", "c<d>e", "ctl\u000Cff", "q'r\"s")
    names.foreach(n => io.writeAtomic(
      Paths.get(s"/wh/ent/$n"), "x".getBytes("UTF-8")))
    assert(io.list(Paths.get("/wh/ent")).sorted == names.sorted)
    assert(io.walk(Paths.get("/wh/ent")).map(_.relPath).sorted == names.sorted)
  }

  test("walk lists the whole subtree with LastModified times") {
    val t0 = System.currentTimeMillis()
    io.writeAtomic(Paths.get("/wh/wlk/bucket-0/f1.parquet"), "a".getBytes)
    io.writeAtomic(Paths.get("/wh/wlk/pt=x/bucket-1/f2.parquet"), "b".getBytes)
    io.writeAtomic(Paths.get("/wh/wlk/snapshot/snapshot-1"), "s".getBytes)
    val got = io.walk(Paths.get("/wh/wlk"))
    assert(got.map(_.relPath).sorted == List("bucket-0/f1.parquet",
      "pt=x/bucket-1/f2.parquet", "snapshot/snapshot-1"), got.toString)
    assert(got.forall(e => e.lastModifiedMillis >= t0 &&
      e.lastModifiedMillis <= System.currentTimeMillis()),
      s"LastModified must reflect put time: $got")
    assert(io.walk(Paths.get("/wh/wlk-absent")).isEmpty)
  }

  test("a graft table lives entirely in the object store") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    import graft.format._
    val dir = Paths.get("/wh/s3tbl")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val dataName = "bucket-0/f1.parquet"
    val w = FormatIO.writer("parquet", dir.resolve(dataName), schema, io = io)
    (1L to 3L).foreach(i => w.write(
      new GenericInternalRow(Array[Any](i, UTF8String.fromString(s"s$i")))))
    assert(w.close() == 3L)

    val sm = new SnapshotManager(dir, io = io)
    val meta = DataFileMeta(dataName, io.size(dir.resolve(dataName)), 3L,
      Seq.empty, 0, 0L, 2L, Map.empty)
    val mf = sm.writeManifest(Seq(ManifestEntry("ADD", meta)))
    assert(sm.tryCommitSnapshot(Snapshot(1L, 0L, "APPEND", 1L, Seq(mf), 2L, 3L)))
    assert(!sm.tryCommitSnapshot(Snapshot(1L, 0L, "APPEND", 9L, Seq(mf), 2L, 3L)),
      "id collision must lose at the store's conditional PUT")
    assert(sm.latestSnapshotId.contains(1L))
    assert(sm.liveFilesLatest.map(_.fileName) == Seq(dataName))

    val r = FormatIO.reader("parquet", dir.resolve(dataName),
      schema, schema, io = io)
    val rows = r.map(row => (row.getLong(0), row.getUTF8String(1).toString)).toList
    r.close()
    assert(rows == List((1L, "s1"), (2L, "s2"), (3L, "s3")))

    // every object is in the stub store; nothing local
    assert(store.keySet().stream().anyMatch(_.startsWith("/lake/wh/s3tbl/")))
    assert(!java.nio.file.Files.exists(Paths.get("/wh")))

    // orphan vacuum against the STORE: an aborted-write leftover in a
    // bucket dir is reclaimed through the walk's LastModified, while
    // the manifest-referenced data file survives
    val orphan = dir.resolve("bucket-0/data-orphan.parquet")
    io.writeAtomic(orphan, Array[Byte](9, 9, 9))
    assert(Maintenance.vacuumOrphans(dir, olderThanMillis = -1000L, io) == 1)
    assert(!io.exists(orphan))
    assert(io.exists(dir.resolve(dataName)), "live data must survive vacuum")
  }
}
