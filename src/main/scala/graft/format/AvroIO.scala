package graft.format

import org.apache.avro.{LogicalTypes, Schema => ASchema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** Avro row IO mirroring [[ParquetIO]]'s contract — the reference's
  * third `file.format` (row-based, read via fastavro there:
  * `pypaimon/pynative/reader/avro_format_reader.py:30-82`).
  * Timestamps use logicalType timestamp-micros, dates logicalType date.
  */
object AvroIO {

  /** Iceberg-convention field property carrying the stable field id. */
  val FieldIdProp = "field-id"

  def toAvroSchema(schema: StructType,
      ids: Map[String, Int] = Map.empty): ASchema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case ByteType | ShortType | IntegerType => ASchema.create(ASchema.Type.INT)
        case LongType => ASchema.create(ASchema.Type.LONG)
        case FloatType => ASchema.create(ASchema.Type.FLOAT)
        case DoubleType => ASchema.create(ASchema.Type.DOUBLE)
        case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
        case StringType => ASchema.create(ASchema.Type.STRING)
        case BinaryType => ASchema.create(ASchema.Type.BYTES)
        case DateType =>
          LogicalTypes.date().addToSchema(ASchema.create(ASchema.Type.INT))
        case TimestampType =>
          LogicalTypes.timestampMicros().addToSchema(ASchema.create(ASchema.Type.LONG))
        case other =>
          throw new IllegalArgumentException(s"Found unsupported data type $other")
      }
      val t = if (f.nullable)
        ASchema.createUnion(ASchema.create(ASchema.Type.NULL), base)
      else base
      val fld = new ASchema.Field(f.name, t, null,
        if (f.nullable) ASchema.Field.NULL_DEFAULT_VALUE else null)
      ids.get(f.name).foreach(id => fld.addProp(FieldIdProp, id: Integer))
      fld
    }
    ASchema.createRecord("graft_row", null, "graft", false, fields.toList.asJava)
  }

  final class Writer(path: java.nio.file.Path, schema: StructType,
      ids: Map[String, Int] = Map.empty)
    extends FormatIO.RowFileWriter {
    private val avroSchema = toAvroSchema(schema, ids)
    private val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    writer.create(avroSchema, path.toFile)
    private var rows = 0L

    override def write(row: InternalRow): Unit = {
      val rec = new GenericData.Record(avroSchema)
      var i = 0
      while (i < schema.length) {
        val v: AnyRef =
          if (row.isNullAt(i)) null
          else schema(i).dataType match {
            case ByteType => Int.box(row.getByte(i).toInt)
            case ShortType => Int.box(row.getShort(i).toInt)
            case IntegerType | DateType => Int.box(row.getInt(i))
            case LongType | TimestampType => Long.box(row.getLong(i))
            case FloatType => Float.box(row.getFloat(i))
            case DoubleType => Double.box(row.getDouble(i))
            case BooleanType => Boolean.box(row.getBoolean(i))
            case StringType => row.getUTF8String(i).toString
            case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i).clone())
            case other => throw new IllegalArgumentException(s"$other")
          }
        rec.put(i, v)
        i += 1
      }
      writer.append(rec)
      rows += 1
    }

    override def close(): Long = { writer.close(); rows }
  }

  final class Reader(path: java.nio.file.Path, fileSchema: StructType,
      projection: StructType,
      ids: Map[String, Int] = Map.empty) extends FormatIO.RowFileReader {
    private val reader = new DataFileReader[GenericRecord](
      path.toFile, new GenericDatumReader[GenericRecord]())
    private val physical = reader.getSchema.getFields.asScala
      .map(_.name).toIndexedSeq
    // field id → source ordinal from the file schema's field props
    // (absent on files written before ids existed → name fallback)
    private val idToSrc: Map[Int, Int] = reader.getSchema.getFields.asScala
      .zipWithIndex.flatMap { case (f, i) =>
        Option(f.getObjectProp(FieldIdProp))
          .collect { case n: Number => n.intValue() -> i }
      }.toMap
    private val mapping: Array[(Int, Int, DataType)] =
      projection.fields.zipWithIndex.flatMap { case (f, out) =>
        val src = ids.get(f.name) match {
          case Some(id) if idToSrc.nonEmpty => idToSrc.getOrElse(id, -1)
          case _ => physical.indexOf(f.name)
        }
        if (src >= 0) Some((src, out, f.dataType)) else None
      }.toArray

    override def hasNext: Boolean = reader.hasNext

    override def next(): InternalRow = {
      val rec = reader.next()
      val out = new GenericInternalRow(projection.length)
      // values arrive typed per the FILE's schema; numeric targets
      // promote (Avro's own int→long / float→double resolution rules)
      // so files predating an ALTER COLUMN TYPE widening read cleanly
      mapping.foreach { case (src, dst, dt) =>
        val v = rec.get(src)
        if (v == null) out.setNullAt(dst)
        else dt match {
          case ByteType => out.update(dst, v.asInstanceOf[Int].toByte)
          case ShortType => out.update(dst, v.asInstanceOf[Int].toShort)
          case IntegerType | DateType => out.update(dst, v.asInstanceOf[Int])
          case LongType | TimestampType =>
            out.update(dst, v.asInstanceOf[Number].longValue())
          case FloatType => out.update(dst, v.asInstanceOf[Number].floatValue())
          case DoubleType =>
            out.update(dst, v.asInstanceOf[Number].doubleValue())
          case BooleanType => out.update(dst, v.asInstanceOf[Boolean])
          case StringType => out.update(dst, UTF8String.fromString(v.toString))
          case BinaryType =>
            val bb = v.asInstanceOf[java.nio.ByteBuffer]
            val arr = new Array[Byte](bb.remaining())
            bb.duplicate().get(arr)
            out.update(dst, arr)
          case other => throw new IllegalArgumentException(s"$other")
        }
      }
      out
    }

    override def close(): Unit = reader.close()
  }
}
