package graft.format

import java.io.{EOFException, FileNotFoundException, InputStream}
import java.net.URI
import java.nio.file.Paths

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus,
  FileSystem, Path => HPath, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Read-only Hadoop `FileSystem` over the [[FileIO]] seam, so format
  * libraries that only speak Hadoop paths — above all Spark's
  * vectorized parquet reader — can read tables whose data plane lives
  * on a non-local store WITHOUT losing the `ColumnarBatch` path to a
  * staged row fallback. The reference keeps columnar batches end to
  * end (`pypaimon/pynative/reader/pyarrow_dataset_reader.py:31-70`,
  * `columnar_row_iterator.py:28-60`); this is the Spark-native
  * equivalent for the object-store deployment shape.
  *
  * URI form: `graftio://<hex(utf8(ioSpec))>/<abstract-key-path>`. The
  * io spec rides in the authority (hex keeps `s3:host:port:...` specs
  * legal in a URI and survives Hadoop's lowercase authority caching);
  * each task resolves it locally via [[FileIO.resolve]], exactly like
  * the serialized reader factories do. Registered through the JDK
  * ServiceLoader (`META-INF/services/org.apache.hadoop.fs.FileSystem`),
  * so the fresh `Configuration()` instances Spark's parquet reader
  * builds discover it without any session config.
  *
  * Reads are ranged ([[FileIO.readRange]]): parquet's footer parse and
  * column-chunk fetches become positioned reads — on S3, `Range` GETs —
  * so a 2-column projection of a wide table never downloads whole
  * objects. Writes stay on [[FileIO.publishFile]] (immutable data
  * files, written locally then published); the mutation surface here
  * throws.
  */
final class GraftFileSystem extends FileSystem {

  private var fsUri: URI = _
  @volatile private var fio: FileIO = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    fsUri = URI.create(s"${GraftFileSystem.Scheme}://${name.getAuthority}")
    fio = FileIO.resolve(GraftFileSystem.decodeAuthority(name.getAuthority))
    setConf(conf)
  }

  override def getScheme: String = GraftFileSystem.Scheme
  override def getUri: URI = fsUri

  private def nioPath(f: HPath): java.nio.file.Path =
    Paths.get(f.toUri.getPath)

  override def open(f: HPath, bufferSize: Int): FSDataInputStream = {
    val p = nioPath(f)
    val len =
      try fio.size(p)
      catch { case _: java.nio.file.NoSuchFileException =>
        throw new FileNotFoundException(f.toString) }
    new FSDataInputStream(new FileIOInputStream(fio, p, len))
  }

  private val BlockSize = 128L * 1024 * 1024

  override def getFileStatus(f: HPath): FileStatus = {
    val p = nioPath(f)
    try
      // mtime 0: object stores don't expose one pre-listing, and the
      // parquet read path never consults it
      new FileStatus(fio.size(p), false, 1, BlockSize, 0L, f)
    catch { case _: java.nio.file.NoSuchFileException =>
      // object stores 404 a HEAD on a prefix: a key that does not exist
      // as an object but has children IS a directory (Hadoop contract —
      // consumers that stat parent paths expect a dir status, not FNF).
      // hasChildren, not children: existence costs one bounded probe
      // (max-keys=1 LIST), never a fully paginated listing
      if (fio.hasChildren(p))
        new FileStatus(0L, true, 1, BlockSize, 0L, f)
      else throw new FileNotFoundException(f.toString) }
  }

  override def listStatus(f: HPath): Array[FileStatus] = {
    val p = nioPath(f)
    // one delimited LIST carries name+size+mtime+kind for every child —
    // never a per-child HEAD (N+1 on a large directory)
    val entries = fio.children(p)
    if (entries.nonEmpty)
      entries.map { e =>
        new FileStatus(math.max(e.sizeBytes, 0L), e.isDir, 1, BlockSize,
          e.lastModifiedMillis, new HPath(f, e.relPath))
      }.toArray
    else if (fio.exists(p)) Array(getFileStatus(f)) // a plain file
    else throw new FileNotFoundException(f.toString)
  }

  // the scan path is read-only; data-file writes go through
  // FileIO.publishFile (local temp + single PUT), never through Hadoop
  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"graftio is a read-only adapter ($op); write through FileIO")
  override def create(f: HPath, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = readOnly("create")
  override def append(f: HPath, bufferSize: Int,
      progress: Progressable): FSDataOutputStream = readOnly("append")
  override def rename(src: HPath, dst: HPath): Boolean = readOnly("rename")
  override def delete(f: HPath, recursive: Boolean): Boolean = readOnly("delete")
  override def mkdirs(f: HPath, permission: FsPermission): Boolean =
    readOnly("mkdirs")

  private var wd = new HPath("/")
  override def setWorkingDirectory(dir: HPath): Unit = wd = dir
  override def getWorkingDirectory: HPath = wd
}

object GraftFileSystem {
  val Scheme = "graftio"

  private val Hex = "0123456789abcdef"

  def encodeAuthority(ioSpec: String): String = {
    val bytes = ioSpec.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach { b =>
      sb.append(Hex((b >> 4) & 0xf)); sb.append(Hex(b & 0xf))
    }
    sb.toString
  }

  def decodeAuthority(auth: String): String = {
    require(auth != null && auth.length % 2 == 0, s"bad graftio authority: $auth")
    val bytes = new Array[Byte](auth.length / 2)
    var i = 0
    while (i < bytes.length) {
      bytes(i) = Integer.parseInt(auth.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Hadoop-path string for abstract key `file` under `ioSpec` — the
    * plain local path for local io (zero behavior change on the
    * default deployment), a RAW `graftio://<auth>/<key>` string
    * otherwise. Raw on purpose: every consumer parses this through
    * `new org.apache.hadoop.fs.Path(String)`, which treats its input
    * as UNescaped and percent-encodes internally — handing it a
    * pre-escaped URI would double-escape keys containing ' ', '#' or
    * '%' (partition values). The FS decodes with `toUri.getPath`,
    * recovering the exact store key. */
  def uriFor(ioSpec: String, file: String): String =
    if (ioSpec == null || ioSpec.isEmpty || ioSpec == "local") {
      // pin the local filesystem explicitly: every consumer parses this
      // with `new Path(String)`, which resolves a bare schemeless path
      // against fs.defaultFS — on a deployment where that is HDFS, a
      // bare path would silently target the wrong filesystem. `local`
      // io means java.nio local files, so say `file:` out loud. Raw
      // (unescaped) on purpose, same Path(String) contract as below.
      val abs = java.nio.file.Paths.get(file).toAbsolutePath.normalize.toString
      "file:" + abs
    } else {
      val abs = if (file.startsWith("/")) file else "/" + file
      s"$Scheme://${encodeAuthority(ioSpec)}$abs"
    }
}

/** Seekable, positioned-readable stream over [[FileIO.readRange]] with
  * a bounded read-ahead buffer: parquet footer parsing issues many
  * small reads (absorbed by the buffer), column-chunk fetches issue
  * large ones (served directly, no double copy). Memory is O(buffer)
  * per open stream regardless of object size.
  */
final class FileIOInputStream(fio: FileIO, path: java.nio.file.Path, len: Long)
    extends InputStream with Seekable with PositionedReadable {

  // read-ahead grows while access stays sequential (footer probes stay
  // small; a merge scan draining a whole file doubles toward MaxAhead,
  // amortizing per-request latency on real object stores), and resets
  // after a seek away from the buffered window
  private val MinAhead = 1 << 20 // 1 MiB
  private val MaxAhead = 8 << 20 // 8 MiB
  private var readAhead = MinAhead
  private var pos = 0L
  private var buf: Array[Byte] = Array.emptyByteArray
  private var bufStart = 0L
  // Guards pos/buf/bufStart/readAhead. Hadoop's PositionedReadable
  // contract makes positioned reads safe for CONCURRENT use (parquet's
  // vectored/async IO does issue concurrent preads), while sequential
  // read()/seek() stay single-caller — so NO path ever holds the lock
  // across a store fetch: the sequential path decides under the lock,
  // fetches outside it, then re-takes the lock to install buf/advance
  // pos, mirroring the pread miss path (concurrent preads must still
  // probe the buffer and fetch in parallel; readRange is stateless).
  private val lock = new Object

  private def buffered(at: Long): Boolean =
    at >= bufStart && at < bufStart + buf.length

  override def read(): Int = {
    val one = new Array[Byte](1)
    val n = read(one, 0, 1)
    if (n <= 0) -1 else one(0) & 0xff
  }

  override def read(b: Array[Byte], off: Int, l: Int): Int = {
    if (l == 0) return 0
    // Decide under the lock; never fetch under it. The single-caller
    // contract for sequential ops means pos/buf cannot change between
    // releasing the lock here and re-taking it after the fetch (preads
    // never mutate them).
    val decision: Either[(Long, Int), (Long, Int)] = lock.synchronized {
      if (pos >= len) return -1
      val want = math.min(l.toLong, len - pos).toInt
      if (buffered(pos)) {
        val n = math.min(want.toLong, bufStart + buf.length - pos).toInt
        System.arraycopy(buf, (pos - bufStart).toInt, b, off, n)
        pos += n
        return n
      }
      if (want >= readAhead) Left((pos, want)) // column chunk: direct
      else {
        val sequential = buf.nonEmpty && pos == bufStart + buf.length
        readAhead =
          if (sequential) math.min(readAhead << 1, MaxAhead) else MinAhead
        Right((pos, math.min(readAhead.toLong, len - pos).toInt))
      }
    }
    decision match {
      case Left((at, want)) =>
        // large sequential read (column chunk): fetch directly, no copy
        // through the read-ahead buffer
        val got = fio.readRange(path, at, want)
        if (got.isEmpty) // inside [0, len): the object shrank under us
          throw new EOFException(
            s"$path: empty range read at $at (expected len $len)")
        System.arraycopy(got, 0, b, off, got.length)
        lock.synchronized { pos += got.length }
        got.length
      case Right((at, want)) =>
        val got = fio.readRange(path, at, want)
        if (got.isEmpty && want > 0)
          throw new EOFException(s"$path: empty range read at $at (len $len)")
        lock.synchronized {
          buf = got
          bufStart = at
          val n = math.min(math.min(l.toLong, len - pos),
            bufStart + buf.length - pos).toInt
          System.arraycopy(buf, (pos - bufStart).toInt, b, off, n)
          pos += n
          n
        }
    }
  }

  override def seek(p: Long): Unit = lock.synchronized {
    if (p < 0 || p > len)
      throw new EOFException(s"seek $p outside [0, $len] for $path")
    pos = p
  }
  override def getPos: Long = lock.synchronized { pos }
  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(position: Long, buffer: Array[Byte], offset: Int,
      length: Int): Int = {
    if (position >= len) return -1
    if (length == 0) return 0
    // positioned reads leave `pos` untouched (Hadoop contract); serve
    // from the read-ahead buffer when it already covers the range —
    // probe and copy UNDER the lock (a racing fill() may otherwise swap
    // buf mid-copy and hand back bytes from the wrong offset), fetch
    // misses OUTSIDE it so concurrent preads still hit the store in
    // parallel
    val fromBuffer = lock.synchronized {
      if (buffered(position)) {
        val n = math.min(length.toLong,
          math.min(bufStart + buf.length - position, len - position)).toInt
        System.arraycopy(buf, (position - bufStart).toInt, buffer, offset, n)
        n
      } else -1
    }
    if (fromBuffer >= 0) fromBuffer
    else {
      val got = fio.readRange(path, position,
        math.min(length.toLong, len - position).toInt)
      // a zero-byte answer INSIDE [0, len) means the object shrank
      // under us (len is captured at open): fail loudly — returning 0
      // would spin readFully/IOUtils forever
      if (got.isEmpty)
        throw new EOFException(
          s"$path: empty range read at $position (expected len $len)")
      System.arraycopy(got, 0, buffer, offset, got.length)
      got.length
    }
  }

  override def readFully(position: Long, buffer: Array[Byte], offset: Int,
      length: Int): Unit = {
    if (position + length > len)
      throw new EOFException(s"readFully past EOF: $position+$length > $len")
    var done = 0
    while (done < length) {
      val n = read(position + done, buffer, offset + done, length - done)
      if (n < 0) throw new EOFException(s"$path truncated at ${position + done}")
      done += n
    }
  }

  override def readFully(position: Long, buffer: Array[Byte]): Unit =
    readFully(position, buffer, 0, buffer.length)

  override def available(): Int = lock.synchronized {
    math.min(len - pos, Int.MaxValue.toLong).toInt
  }

  override def skip(n: Long): Long = lock.synchronized {
    val d = math.max(0L, math.min(n, len - pos))
    pos += d
    d
  }
}
