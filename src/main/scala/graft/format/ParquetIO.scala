package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.{ParquetReader, ParquetWriter}
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema._
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.parquet.schema.LogicalTypeAnnotation._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** Row-granular parquet IO for the table-format layer's data files
  * (`bucket-<b>/<uuid>.parquet`), over the primitive type matrix of
  * SURVEY §1.3. Used only inside the DSv2 connector's per-task
  * readers/writers; the relational query surface reads parquet through
  * Spark's vectorized scan.
  */
object ParquetIO {

  def toParquetSchema(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val rep = if (f.nullable) Type.Repetition.OPTIONAL else Type.Repetition.REQUIRED
      val t = f.dataType match {
        case ByteType => Types.primitive(INT32, rep).as(intType(8, true))
        case ShortType => Types.primitive(INT32, rep).as(intType(16, true))
        case IntegerType => Types.primitive(INT32, rep)
        case DateType => Types.primitive(INT32, rep).as(dateType())
        case LongType => Types.primitive(INT64, rep)
        case TimestampType =>
          Types.primitive(INT64, rep).as(timestampType(true, TimeUnit.MICROS))
        case FloatType => Types.primitive(FLOAT, rep)
        case DoubleType => Types.primitive(DOUBLE, rep)
        case BooleanType => Types.primitive(BOOLEAN, rep)
        case StringType => Types.primitive(BINARY, rep).as(stringType())
        case BinaryType => Types.primitive(BINARY, rep)
        case other =>
          throw new IllegalArgumentException(s"Found unsupported data type $other")
      }
      b.addField(t.named(f.name))
    }
    b.named("graft_row")
  }

  /** Streaming writer of InternalRow (ordinals match `schema`). */
  final class RowWriter(path: java.nio.file.Path, schema: StructType) {
    private val msgType = toParquetSchema(schema)
    private val conf = new Configuration()
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(msgType, conf)
    private val writer: ParquetWriter[Group] =
      ExampleParquetWriter.builder(new HPath(path.toUri))
        .withConf(conf)
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .build()
    private val factory = new SimpleGroupFactory(msgType)
    private var rows = 0L

    def write(row: InternalRow): Unit = {
      val g = factory.newGroup()
      var i = 0
      while (i < schema.length) {
        if (!row.isNullAt(i)) {
          schema(i).dataType match {
            case ByteType => g.add(i, row.getByte(i).toInt)
            case ShortType => g.add(i, row.getShort(i).toInt)
            case IntegerType | DateType => g.add(i, row.getInt(i))
            case LongType | TimestampType => g.add(i, row.getLong(i))
            case FloatType => g.add(i, row.getFloat(i))
            case DoubleType => g.add(i, row.getDouble(i))
            case BooleanType => g.add(i, row.getBoolean(i))
            case StringType =>
              g.add(i, Binary.fromConstantByteArray(row.getUTF8String(i).getBytes))
            case BinaryType =>
              g.add(i, Binary.fromConstantByteArray(row.getBinary(i)))
            case other => throw new IllegalArgumentException(s"$other")
          }
        }
        i += 1
      }
      writer.write(g)
      rows += 1
    }

    def rowCount: Long = rows
    def close(): Long = { writer.close(); rows }
  }

  /** Iterator of InternalRow over one file, projected to `projection`
    * (a subset of the file's columns, by name).
    *
    * Schema evolution (≙ the reference's `index_mapping` consumption,
    * `pypaimon/pynative/reader/data_file_record_reader.py:104-133`):
    * columns in `projection` that the file predates are null-filled —
    * the physical footer schema, not the logical table schema, decides
    * what is requested from parquet.
    */
  final class RowReader(path: java.nio.file.Path, fileSchema: StructType,
      projection: StructType) extends Iterator[InternalRow] with AutoCloseable {
    // columns physically present in this file (footer is authoritative
    // for files written under an older schema version)
    private val physical: Set[String] = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new HPath(path.toUri), new Configuration())
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getFileMetaData.getSchema.getFields.asScala
        .map(_.getName).toSet
      finally r.close()
    }
    // parquet-mr materializes the requested schema in ITS field order;
    // request columns in file order, then permute into projection order.
    private val requested = StructType(
      fileSchema.fields.filter(f =>
        projection.fieldNames.contains(f.name) && physical.contains(f.name)))
    private val outPos: Array[Int] =
      requested.fields.map(f => projection.fieldIndex(f.name))
    private val conf = new Configuration()
    conf.set(ReadSupport.PARQUET_READ_SCHEMA, toParquetSchema(requested).toString)
    private val reader: ParquetReader[Group] =
      ParquetReader.builder(new GroupReadSupport(), new HPath(path.toUri))
        .withConf(conf).build()
    private var nextGroup: Group = reader.read()

    override def hasNext: Boolean = nextGroup != null

    override def next(): InternalRow = {
      val g = nextGroup
      nextGroup = reader.read()
      if (nextGroup == null) reader.close()
      val out = new GenericInternalRow(projection.length)
      var i = 0
      while (i < requested.length) {
        val o = outPos(i)
        if (g.getFieldRepetitionCount(i) == 0) out.setNullAt(o)
        else requested(i).dataType match {
          case ByteType => out.update(o, g.getInteger(i, 0).toByte)
          case ShortType => out.update(o, g.getInteger(i, 0).toShort)
          case IntegerType | DateType => out.update(o, g.getInteger(i, 0))
          case LongType | TimestampType => out.update(o, g.getLong(i, 0))
          case FloatType => out.update(o, g.getFloat(i, 0))
          case DoubleType => out.update(o, g.getDouble(i, 0))
          case BooleanType => out.update(o, g.getBoolean(i, 0))
          case StringType =>
            out.update(o, UTF8String.fromBytes(g.getBinary(i, 0).getBytes))
          case BinaryType => out.update(o, g.getBinary(i, 0).getBytes)
          case other => throw new IllegalArgumentException(s"$other")
        }
        i += 1
      }
      out
    }

    override def close(): Unit = reader.close()
  }
}
