package graft.connector

import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarArray, ColumnarMap}
import org.apache.spark.unsafe.types.UTF8String

/** Upcasting view over a narrower stored vector — the columnar leg of
  * ALTER COLUMN TYPE widening (byte→short→int→long, float→double).
  * Files written before the ALTER decode at their stored type; this
  * wrapper answers the batch consumer's wider getters by converting at
  * access time, so old files need no rewrite (≙ the reference's
  * read-time index/type mapping, `data_file_record_reader.py:104-133`,
  * done Spark-columnar instead of per-row).
  */
final class WideningColumnVector(inner: ColumnVector, to: DataType)
  extends ColumnVector(to) {

  private val from = inner.dataType()

  override def close(): Unit = inner.close()
  override def hasNull: Boolean = inner.hasNull
  override def numNulls: Int = inner.numNulls
  override def isNullAt(i: Int): Boolean = inner.isNullAt(i)

  override def getBoolean(i: Int): Boolean = inner.getBoolean(i)
  override def getByte(i: Int): Byte = inner.getByte(i)

  override def getShort(i: Int): Short = from match {
    case ByteType => inner.getByte(i).toShort
    case _ => inner.getShort(i)
  }

  override def getInt(i: Int): Int = from match {
    case ByteType => inner.getByte(i).toInt
    case ShortType => inner.getShort(i).toInt
    case _ => inner.getInt(i)
  }

  override def getLong(i: Int): Long = from match {
    case ByteType => inner.getByte(i).toLong
    case ShortType => inner.getShort(i).toLong
    case IntegerType => inner.getInt(i).toLong
    case _ => inner.getLong(i)
  }

  override def getFloat(i: Int): Float = from match {
    case ByteType => inner.getByte(i).toFloat
    case ShortType => inner.getShort(i).toFloat
    case _ => inner.getFloat(i)
  }

  override def getDouble(i: Int): Double = from match {
    case ByteType => inner.getByte(i).toDouble
    case ShortType => inner.getShort(i).toDouble
    case IntegerType => inner.getInt(i).toDouble
    case FloatType => inner.getFloat(i).toDouble
    case _ => inner.getDouble(i)
  }

  override def getArray(i: Int): ColumnarArray = inner.getArray(i)
  override def getMap(i: Int): ColumnarMap = inner.getMap(i)
  override def getDecimal(i: Int, p: Int, s: Int): org.apache.spark.sql.types.Decimal =
    inner.getDecimal(i, p, s)
  override def getUTF8String(i: Int): UTF8String = inner.getUTF8String(i)
  override def getBinary(i: Int): Array[Byte] = inner.getBinary(i)
  override def getChild(i: Int): ColumnVector = inner.getChild(i)
}
