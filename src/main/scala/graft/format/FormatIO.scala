package graft.format

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Row-granular data-file IO behind the reference's `file.format` table
  * option (`parquet` default, `orc`, `avro` —
  * `pypaimon/py4j/tests/test_preicates.py:36-37,50-55`). One writer /
  * reader contract, three codecs: [[ParquetIO]], [[OrcIO]], [[AvroIO]].
  */
object FormatIO {

  trait RowFileWriter {
    def write(row: InternalRow): Unit
    def close(): Long
  }

  trait RowFileReader extends Iterator[InternalRow] with AutoCloseable

  def extension(format: String): String = format match {
    case "parquet" | "orc" | "avro" => format
    case other =>
      throw new IllegalArgumentException(s"Unsupported file.format: $other")
  }

  def writer(format: String, path: java.nio.file.Path,
      schema: StructType,
      ids: Map[String, Int] = Map.empty,
      blockSize: Int = org.apache.parquet.hadoop.ParquetWriter.DEFAULT_BLOCK_SIZE,
      io: FileIO = FileIO.local)
      : RowFileWriter = {
    def direct(p: java.nio.file.Path): RowFileWriter = format match {
      case "parquet" => new ParquetWriterAdapter(p, schema, ids, blockSize)
      case "orc" => new OrcIO.Writer(p, schema, ids)
      case "avro" => new AvroIO.Writer(p, schema, ids)
      case other =>
        throw new IllegalArgumentException(s"Unsupported file.format: $other")
    }
    if (io eq FileIO.local) direct(path)
    else {
      // non-local storage: format libraries need a real file, so write
      // a local temp and publish its bytes through the seam on close —
      // the single upload a remote data-file write costs anyway
      // shared staging root: if the writer is abandoned without
      // close() (task abort mid-write), the one JVM-exit sweep removes
      // the temp — without growing the static DeleteOnExitHook set by
      // one entry per remote file written (see FileIO.stagingTemp)
      val tmp = FileIO.stagingTemp("graft-w", "." + format)
      // format writers create-exclusive; reserve the unique name only
      java.nio.file.Files.deleteIfExists(tmp)
      val inner = direct(tmp)
      new RowFileWriter {
        override def write(row: InternalRow): Unit = inner.write(row)
        override def close(): Long = {
          val n = inner.close()
          io.publishFile(tmp, path)
          // Hadoop's local ChecksumFileSystem leaves a `.<name>.crc`
          // sidecar next to the temp; publishFile moves only the data
          // file, so sweep the sidecar or it leaks one per write
          java.nio.file.Files.deleteIfExists(
            tmp.getParent.resolve("." + tmp.getFileName + ".crc"))
          n
        }
      }
    }
  }

  /** `ids`: logical column name -> stable field id; all three formats
    * persist it (parquet field ids, ORC column attributes, Avro field
    * props) and resolve reads by id first, name fallback for legacy
    * id-less files and KV meta columns.
    */
  /** `filters`: pushed conjuncts for row-group + record skipping —
    * parquet only, and only conjuncts over projected columns are used
    * (predicates on unrequested columns would see nulls and could drop
    * matching records). Maintenance rewrites pass none.
    */
  def reader(format: String, path: java.nio.file.Path, fileSchema: StructType,
      projection: StructType,
      ids: Map[String, Int] = Map.empty,
      filters: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty,
      io: FileIO = FileIO.local,
      ioSpec: String = "local")
      : RowFileReader = {
    // parquet on a non-local store reads through graftio:// with ranged
    // FileIO reads — footer + only the needed row groups/columns, so a
    // point lookup costs O(one row group) of bytes instead of a
    // whole-file download. ORC/Avro merge reads stay staged: they scan
    // files fully and sequentially, where one whole-object GET is the
    // right store access pattern.
    if (format == "parquet" && ioSpec != "local" && !(io eq FileIO.local))
      return new ParquetReaderAdapter(path, fileSchema, projection, ids,
        filters, Some(GraftFileSystem.uriFor(ioSpec, path.toString)))
    val staged = io.stageForRead(path) // zero-copy for FileIO.local
    def direct: RowFileReader = format match {
      case "parquet" =>
        new ParquetReaderAdapter(staged, fileSchema, projection, ids, filters)
      case "orc" => new OrcIO.Reader(staged, fileSchema, projection, ids)
      case "avro" => new AvroIO.Reader(staged, fileSchema, projection, ids)
      case other =>
        throw new IllegalArgumentException(s"Unsupported file.format: $other")
    }
    if (staged eq path) format match {
      // ParquetIO.RowReader self-closes at EOF; ORC/Avro readers hold
      // an open RecordReader/DataFileReader until close() — and the
      // drain-style callers (Compactor, Resequencer, merge reads) drop
      // the iterator without calling it, which leaked one descriptor
      // per compacted orc/avro file until GC finalization
      case "parquet" => direct
      case _ => releaseOnExhaustion(direct)(() => ())
    }
    else releaseOnExhaustion(direct)(() => io.unstage(path, staged))
  }

  /** Wrap a reader so its resources release the moment the iterator is
    * exhausted (production read paths drain and drop without calling
    * close()); close() covers early termination (e.g. limit) and a
    * double release is a no-op.
    */
  private def releaseOnExhaustion(inner: RowFileReader)(
      onRelease: () => Unit): RowFileReader = new RowFileReader {
    private var released = false
    private def release(): Unit = if (!released) {
      released = true
      inner.close()
      onRelease()
    }
    override def hasNext: Boolean = {
      val h = !released && inner.hasNext
      if (!h) release()
      h
    }
    override def next(): InternalRow = inner.next()
    override def close(): Unit = release()
  }

  /** Infer format from a data file name. */
  def ofFile(fileName: String): String =
    fileName.substring(fileName.lastIndexOf('.') + 1)

  private final class ParquetWriterAdapter(path: java.nio.file.Path,
      schema: StructType, ids: Map[String, Int],
      blockSize: Int = org.apache.parquet.hadoop.ParquetWriter.DEFAULT_BLOCK_SIZE)
    extends RowFileWriter {
    private val w = new ParquetIO.RowWriter(path, schema, ids, blockSize)
    override def write(row: InternalRow): Unit = w.write(row)
    override def close(): Long = w.close()
  }

  private final class ParquetReaderAdapter(path: java.nio.file.Path,
      fileSchema: StructType, projection: StructType,
      ids: Map[String, Int],
      filters: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty,
      hadoopPath: Option[String] = None)
    extends RowFileReader {
    private val r =
      new ParquetIO.RowReader(path, fileSchema, projection, ids, filters,
        hadoopPath)
    override def hasNext: Boolean = r.hasNext
    override def next(): InternalRow = r.next()
    override def close(): Unit = r.close()
  }
}
