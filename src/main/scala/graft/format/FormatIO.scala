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
      blockSize: Int = org.apache.parquet.hadoop.ParquetWriter.DEFAULT_BLOCK_SIZE)
      : RowFileWriter = format match {
    case "parquet" => new ParquetWriterAdapter(path, schema, ids, blockSize)
    case "orc" => new OrcIO.Writer(path, schema, ids)
    case "avro" => new AvroIO.Writer(path, schema, ids)
    case other =>
      throw new IllegalArgumentException(s"Unsupported file.format: $other")
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
      filters: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty)
      : RowFileReader = format match {
    case "parquet" =>
      new ParquetReaderAdapter(path, fileSchema, projection, ids, filters)
    case "orc" => new OrcIO.Reader(path, fileSchema, projection, ids)
    case "avro" => new AvroIO.Reader(path, fileSchema, projection, ids)
    case other =>
      throw new IllegalArgumentException(s"Unsupported file.format: $other")
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
      filters: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty)
    extends RowFileReader {
    private val r =
      new ParquetIO.RowReader(path, fileSchema, projection, ids, filters)
    override def hasNext: Boolean = r.hasNext
    override def next(): InternalRow = r.next()
    override def close(): Unit = r.close()
  }
}
