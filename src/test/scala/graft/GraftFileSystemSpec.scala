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
}
