package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import java.nio.file.Paths

/** Unit contract for the read-only `graftio://` Hadoop adapter
  * ([[graft.format.GraftFileSystem]]) over the in-memory FileIO:
  * status/listing semantics (object stores 404 prefix HEADs; listings
  * must not be N+1) and the thread-safety Hadoop's PositionedReadable
  * contract demands from positioned reads (parquet's vectored IO
  * issues them concurrently against live sequential reads).
  */
class GraftFileSystemSpec extends AnyFunSuite {

  private val ioSpec = "memory:gfs-spec"
  private val fio = graft.format.FileIO.resolve(ioSpec)

  private def fs(): org.apache.hadoop.fs.FileSystem = {
    val auth = graft.format.GraftFileSystem.encodeAuthority(ioSpec)
    new HPath(s"graftio://$auth/").getFileSystem(new Configuration())
  }

  test("getFileStatus: file, directory-as-prefix, and absent") {
    fio.writeAtomic(Paths.get("/wh/t/bucket-0/f1.bin"), Array[Byte](1, 2, 3))
    val f = fs()
    val auth = graft.format.GraftFileSystem.encodeAuthority(ioSpec)
    val file = f.getFileStatus(new HPath(s"graftio://$auth/wh/t/bucket-0/f1.bin"))
    assert(!file.isDirectory && file.getLen == 3L)
    // an object store 404s a HEAD on "wh/t" — but it has children, so
    // the Hadoop contract wants a directory status, not FNF
    val dir = f.getFileStatus(new HPath(s"graftio://$auth/wh/t"))
    assert(dir.isDirectory, "prefix with children must stat as a directory")
    intercept[java.io.FileNotFoundException](
      f.getFileStatus(new HPath(s"graftio://$auth/wh/absent")))
  }

  test("listStatus carries sizes and child dirs from the listing") {
    fio.writeAtomic(Paths.get("/wh/ls/a.bin"), Array.fill[Byte](5)(7))
    fio.writeAtomic(Paths.get("/wh/ls/b.bin"), Array.fill[Byte](9)(7))
    fio.writeAtomic(Paths.get("/wh/ls/sub/deep.bin"), Array[Byte](1))
    val f = fs()
    val auth = graft.format.GraftFileSystem.encodeAuthority(ioSpec)
    val got = f.listStatus(new HPath(s"graftio://$auth/wh/ls"))
    val files = got.filterNot(_.isDirectory)
      .map(s => s.getPath.getName -> s.getLen).toMap
    assert(files == Map("a.bin" -> 5L, "b.bin" -> 9L), got.mkString(","))
    assert(got.filter(_.isDirectory).map(_.getPath.getName).toList == List("sub"))
    intercept[java.io.FileNotFoundException](
      f.listStatus(new HPath(s"graftio://$auth/wh/ls-absent")))
  }

  test("uriFor pins the local filesystem explicitly") {
    val u = graft.format.GraftFileSystem.uriFor("local", "/tmp/x/f.parquet")
    assert(u == "file:/tmp/x/f.parquet", u)
    // Path(String) must resolve it to the local FS regardless of
    // fs.defaultFS (on a cluster that could be HDFS)
    val conf = new Configuration()
    conf.set("fs.defaultFS", "graftio://" +
      graft.format.GraftFileSystem.encodeAuthority(ioSpec) + "/")
    assert(new HPath(u).getFileSystem(conf)
      .isInstanceOf[org.apache.hadoop.fs.LocalFileSystem])
    // non-local stays a graftio URI
    assert(graft.format.GraftFileSystem.uriFor(ioSpec, "/wh/f")
      .startsWith("graftio://"))
  }

  test("positioned reads stay correct against concurrent sequential reads") {
    // the race this pins: pread served from the shared read-ahead
    // buffer while a sequential fill() swaps it — without the lock a
    // pread could copy bytes from the wrong offset and return them
    // silently. 8 pread threads hammer random offsets while the main
    // thread drains the stream sequentially (constantly refilling).
    val body = Array.tabulate[Byte](1 << 20)(i => (i * 31 % 251).toByte)
    fio.writeAtomic(Paths.get("/wh/race/blob"), body)
    val in = new graft.format.FileIOInputStream(
      fio, Paths.get("/wh/race/blob"), body.length.toLong)
    val errors = new java.util.concurrent.atomic.AtomicReference[String](null)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val threads = (0 until 8).map { t =>
      new Thread(() => {
        val rnd = new java.util.Random(t)
        val buf = new Array[Byte](4096)
        while (!stop.get() && errors.get() == null) {
          val at = rnd.nextInt(body.length - buf.length)
          in.readFully(at.toLong, buf)
          var i = 0
          while (i < buf.length) {
            if (buf(i) != body(at + i)) {
              errors.compareAndSet(null,
                s"pread at $at+$i: got ${buf(i)}, want ${body(at + i)}")
              i = buf.length
            } else i += 1
          }
        }
      }, s"pread-$t")
    }
    threads.foreach(_.start())
    // sequential drain refills the shared buffer continuously
    val seq = new Array[Byte](8192)
    var total = 0L
    (0 until 3).foreach { _ =>
      in.seek(0L)
      var n = in.read(seq, 0, seq.length)
      while (n >= 0) {
        total += n
        n = in.read(seq, 0, seq.length)
      }
    }
    stop.set(true)
    threads.foreach(_.join(30000))
    assert(errors.get() == null, String.valueOf(errors.get()))
    assert(total == 3L * body.length)
  }

  test("preads proceed while a sequential read is mid-fetch") {
    // the stall this pins: the sequential path must not hold the stream
    // lock across its store fetch — a concurrent pread's buffer probe
    // would otherwise block for the whole fetch. The offset-0 fetch
    // (the sequential read's) parks until a pread lands; if the lock
    // were held, the pread could never probe and the await times out.
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val body = Array.tabulate[Byte](1 << 16)(i => (i * 7 % 251).toByte)
    val mem = graft.format.FileIO.resolve("memory:gfs-lockfree")
    val p = Paths.get("/wh/lockfree/blob")
    mem.writeAtomic(p, body)
    val seqFetchEntered = new CountDownLatch(1)
    val preadDone = new CountDownLatch(1)
    @volatile var preadArrivedInTime = true
    val slow: graft.format.FileIO = new graft.format.FileIO {
      override def readString(path: java.nio.file.Path) = mem.readString(path)
      override def readBytes(path: java.nio.file.Path) = mem.readBytes(path)
      override def writeAtomic(path: java.nio.file.Path, b: Array[Byte]) =
        mem.writeAtomic(path, b)
      override def putIfAbsent(path: java.nio.file.Path, c: String) =
        mem.putIfAbsent(path, c)
      override def list(dir: java.nio.file.Path) = mem.list(dir)
      override def walk(dir: java.nio.file.Path) = mem.walk(dir)
      override def exists(path: java.nio.file.Path) = mem.exists(path)
      override def delete(path: java.nio.file.Path) = mem.delete(path)
      override def size(path: java.nio.file.Path) = mem.size(path)
      override def createDirectories(dir: java.nio.file.Path) =
        mem.createDirectories(dir)
      override def stageForRead(path: java.nio.file.Path) =
        mem.stageForRead(path)
      override def unstage(o: java.nio.file.Path, s: java.nio.file.Path) =
        mem.unstage(o, s)
      override def publishFile(t: java.nio.file.Path, tg: java.nio.file.Path) =
        mem.publishFile(t, tg)
      override def readRange(path: java.nio.file.Path, offset: Long,
          length: Int): Array[Byte] = {
        if (offset == 0L) {
          seqFetchEntered.countDown()
          preadArrivedInTime = preadDone.await(10, TimeUnit.SECONDS)
        }
        mem.readRange(path, offset, length)
      }
    }
    val in = new graft.format.FileIOInputStream(slow, p, body.length.toLong)
    val seqErr = new java.util.concurrent.atomic.AtomicReference[String](null)
    val seqThread = new Thread(() => {
      try {
        val b = new Array[Byte](100)
        val n = in.read(b, 0, 100)
        if (n != 100 || b.toSeq != body.take(100).toSeq)
          seqErr.set(s"sequential read wrong: n=$n")
      } catch { case t: Throwable => seqErr.set(t.toString) }
    }, "seq-read")
    seqThread.start()
    assert(seqFetchEntered.await(10, TimeUnit.SECONDS))
    val pb = new Array[Byte](64)
    in.readFully(32768L, pb) // buffer miss at another offset
    preadDone.countDown()
    seqThread.join(30000)
    assert(preadArrivedInTime,
      "pread blocked behind a sequential store fetch — lock held across it")
    assert(pb.toSeq == body.slice(32768, 32768 + 64).toSeq)
    assert(seqErr.get() == null, String.valueOf(seqErr.get()))
  }
}
