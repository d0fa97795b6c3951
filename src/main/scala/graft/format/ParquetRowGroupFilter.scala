package graft.format

import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Spark pushed filters → parquet row-group (block) predicates, so the
  * connector's columnar scan skips whole row groups whose statistics
  * contradict the query — the sub-file analogue of the manifest
  * zone-map pruning (which is file-granular). Matters once compaction
  * or foreign writers produce multi-row-group files.
  *
  * Soundness: a conjunct that cannot be expressed exactly is DROPPED
  * (over-approximation — more row groups survive). That is safe under
  * AND and under OR only when BOTH branches convert, and never under a
  * general NOT, hence: And keeps whichever side converts, Or requires
  * both, Not is only recognized in its `Not(EqualTo)` (≙ `!=`) shape.
  * Spark re-applies every filter above the scan, so pruning can only
  * skip data that provably cannot match.
  */
object ParquetRowGroupFilter {

  /** `phys`: logical → physical column name for THIS file (rename
    * eras); `stored`: physical name → the file's stored Spark type
    * (type-widening eras). Returns None when nothing is expressible.
    */
  def build(filters: Seq[Filter], phys: Map[String, String],
      stored: Map[String, DataType]): Option[FilterPredicate] = {
    val preds = filters.flatMap(f => convert(f, phys, stored))
    preds.reduceOption(FilterApi.and)
  }

  private def convert(f: Filter, phys: Map[String, String],
      stored: Map[String, DataType]): Option[FilterPredicate] = f match {
    case And(l, r) =>
      (convert(l, phys, stored), convert(r, phys, stored)) match {
        case (Some(a), Some(b)) => Some(FilterApi.and(a, b))
        case (a, b) => a.orElse(b)
      }
    case Or(l, r) =>
      for {
        a <- convert(l, phys, stored)
        b <- convert(r, phys, stored)
      } yield FilterApi.or(a, b)
    case Not(EqualTo(c, v)) => leaf(c, phys, stored)(neq(_, _, v))
    case EqualTo(c, v) => leaf(c, phys, stored)(eq(_, _, v))
    case EqualNullSafe(c, v) => leaf(c, phys, stored)(eq(_, _, v))
    case LessThan(c, v) => leaf(c, phys, stored)(lt(_, _, v))
    case LessThanOrEqual(c, v) => leaf(c, phys, stored)(ltEq(_, _, v))
    case GreaterThan(c, v) => leaf(c, phys, stored)(gt(_, _, v))
    case GreaterThanOrEqual(c, v) => leaf(c, phys, stored)(gtEq(_, _, v))
    case IsNull(c) => leaf(c, phys, stored)((pn, dt) => eq(pn, dt, null))
    case IsNotNull(c) => leaf(c, phys, stored)((pn, dt) => notNull(pn, dt))
    case In(c, vs) if vs.nonEmpty && vs.length <= 16 =>
      // null never matches IN; an all-null list is dropped (not false —
      // staying conservative keeps the over-approximation invariant)
      val nonNull = vs.filter(_ != null)
      if (nonNull.isEmpty) None
      else leaf(c, phys, stored) { (pn, dt) =>
        val eqs = nonNull.map(v => eq(pn, dt, v))
        if (eqs.exists(_.isEmpty)) None
        else eqs.flatten.reduceOption(FilterApi.or)
      }
    case _ => None // string matches, general Not: not expressed
  }

  private def leaf(logical: String, phys: Map[String, String],
      stored: Map[String, DataType])(
      mk: (String, DataType) => Option[FilterPredicate]): Option[FilterPredicate] =
    phys.get(logical).flatMap(pn => stored.get(pn).flatMap(dt => mk(pn, dt)))

  // ---- typed leaves; None when the value can't be represented at the
  // file's stored type (pre-widening files vs post-widening literals)

  private def eq(pn: String, dt: DataType, v: Any): Option[FilterPredicate] =
    dt match {
      case ByteType | ShortType | IntegerType | DateType =>
        asInt(dt, v).map(i => FilterApi.eq(FilterApi.intColumn(pn), i))
      case LongType | TimestampType =>
        asLong(dt, v).map(l => FilterApi.eq(FilterApi.longColumn(pn), l))
      case FloatType =>
        asFloat(v).map(x => FilterApi.eq(FilterApi.floatColumn(pn), x))
      case DoubleType =>
        asDouble(v).map(x => FilterApi.eq(FilterApi.doubleColumn(pn), x))
      case BooleanType => v match {
        case null => Some(FilterApi.eq(FilterApi.booleanColumn(pn),
          null.asInstanceOf[java.lang.Boolean]))
        case b: Boolean => Some(FilterApi.eq(FilterApi.booleanColumn(pn),
          java.lang.Boolean.valueOf(b)))
        case _ => None
      }
      case StringType | BinaryType =>
        asBinary(v).map(b => FilterApi.eq(FilterApi.binaryColumn(pn), b))
      case _ => None
    }

  private def neq(pn: String, dt: DataType, v: Any): Option[FilterPredicate] =
    if (v == null) None // `!= NULL` is never true; leave to Spark
    else dt match {
      case ByteType | ShortType | IntegerType | DateType =>
        asInt(dt, v).map(i => FilterApi.notEq(FilterApi.intColumn(pn), i))
      case LongType | TimestampType =>
        asLong(dt, v).map(l => FilterApi.notEq(FilterApi.longColumn(pn), l))
      case FloatType =>
        asFloat(v).map(x => FilterApi.notEq(FilterApi.floatColumn(pn), x))
      case DoubleType =>
        asDouble(v).map(x => FilterApi.notEq(FilterApi.doubleColumn(pn), x))
      case BooleanType => v match {
        case b: Boolean => Some(FilterApi.notEq(FilterApi.booleanColumn(pn),
          java.lang.Boolean.valueOf(b)))
        case _ => None
      }
      case StringType | BinaryType =>
        asBinary(v).map(b => FilterApi.notEq(FilterApi.binaryColumn(pn), b))
      case _ => None
    }

  private def notNull(pn: String, dt: DataType): Option[FilterPredicate] =
    dt match {
      case ByteType | ShortType | IntegerType | DateType =>
        Some(FilterApi.notEq(FilterApi.intColumn(pn),
          null.asInstanceOf[java.lang.Integer]))
      case LongType | TimestampType =>
        Some(FilterApi.notEq(FilterApi.longColumn(pn),
          null.asInstanceOf[java.lang.Long]))
      case FloatType => Some(FilterApi.notEq(FilterApi.floatColumn(pn),
        null.asInstanceOf[java.lang.Float]))
      case DoubleType => Some(FilterApi.notEq(FilterApi.doubleColumn(pn),
        null.asInstanceOf[java.lang.Double]))
      case BooleanType => Some(FilterApi.notEq(FilterApi.booleanColumn(pn),
        null.asInstanceOf[java.lang.Boolean]))
      case StringType | BinaryType =>
        Some(FilterApi.notEq(FilterApi.binaryColumn(pn),
          null.asInstanceOf[Binary]))
      case _ => None
    }

  private def lt(pn: String, dt: DataType, v: Any): Option[FilterPredicate] =
    ordered(pn, dt, v,
      FilterApi.lt(FilterApi.intColumn(pn), _: java.lang.Integer),
      FilterApi.lt(FilterApi.longColumn(pn), _: java.lang.Long),
      FilterApi.lt(FilterApi.floatColumn(pn), _: java.lang.Float),
      FilterApi.lt(FilterApi.doubleColumn(pn), _: java.lang.Double),
      FilterApi.lt(FilterApi.binaryColumn(pn), _: Binary))

  private def ltEq(pn: String, dt: DataType, v: Any): Option[FilterPredicate] =
    ordered(pn, dt, v,
      FilterApi.ltEq(FilterApi.intColumn(pn), _: java.lang.Integer),
      FilterApi.ltEq(FilterApi.longColumn(pn), _: java.lang.Long),
      FilterApi.ltEq(FilterApi.floatColumn(pn), _: java.lang.Float),
      FilterApi.ltEq(FilterApi.doubleColumn(pn), _: java.lang.Double),
      FilterApi.ltEq(FilterApi.binaryColumn(pn), _: Binary))

  private def gt(pn: String, dt: DataType, v: Any): Option[FilterPredicate] =
    ordered(pn, dt, v,
      FilterApi.gt(FilterApi.intColumn(pn), _: java.lang.Integer),
      FilterApi.gt(FilterApi.longColumn(pn), _: java.lang.Long),
      FilterApi.gt(FilterApi.floatColumn(pn), _: java.lang.Float),
      FilterApi.gt(FilterApi.doubleColumn(pn), _: java.lang.Double),
      FilterApi.gt(FilterApi.binaryColumn(pn), _: Binary))

  private def gtEq(pn: String, dt: DataType, v: Any): Option[FilterPredicate] =
    ordered(pn, dt, v,
      FilterApi.gtEq(FilterApi.intColumn(pn), _: java.lang.Integer),
      FilterApi.gtEq(FilterApi.longColumn(pn), _: java.lang.Long),
      FilterApi.gtEq(FilterApi.floatColumn(pn), _: java.lang.Float),
      FilterApi.gtEq(FilterApi.doubleColumn(pn), _: java.lang.Double),
      FilterApi.gtEq(FilterApi.binaryColumn(pn), _: Binary))

  private def ordered(pn: String, dt: DataType, v: Any,
      fi: java.lang.Integer => FilterPredicate,
      fl: java.lang.Long => FilterPredicate,
      ff: java.lang.Float => FilterPredicate,
      fd: java.lang.Double => FilterPredicate,
      fb: Binary => FilterPredicate): Option[FilterPredicate] =
    if (v == null) None
    else dt match {
      case ByteType | ShortType | IntegerType | DateType => asInt(dt, v).map(fi)
      case LongType | TimestampType => asLong(dt, v).map(fl)
      case FloatType => asFloat(v).map(ff)
      case DoubleType => asDouble(v).map(fd)
      case StringType | BinaryType => asBinary(v).map(fb)
      case _ => None
    }

  // ---- external-value coercion to the file's stored representation

  private def asInt(dt: DataType, v: Any): Option[java.lang.Integer] = v match {
    case null => Some(null)
    case b: Byte => Some(b.toInt)
    case s: Short => Some(s.toInt)
    case i: Int => Some(i)
    case l: Long if l >= Int.MinValue && l <= Int.MaxValue => Some(l.toInt)
    case d: java.sql.Date if dt == DateType =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d))
    case d: java.time.LocalDate if dt == DateType =>
      Some(Math.toIntExact(d.toEpochDay))
    case _ => None
  }

  private def asLong(dt: DataType, v: Any): Option[java.lang.Long] = v match {
    case null => Some(null)
    case b: Byte => Some(b.toLong)
    case s: Short => Some(s.toLong)
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case t: java.sql.Timestamp if dt == TimestampType =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t))
    case t: java.time.Instant if dt == TimestampType =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(t))
    case _ => None
  }

  private def asFloat(v: Any): Option[java.lang.Float] = v match {
    case null => Some(null)
    case f: Float => Some(f)
    case d: Double if d.isNaN || d.toFloat.toDouble == d => Some(d.toFloat)
    case _ => None
  }

  private def asDouble(v: Any): Option[java.lang.Double] = v match {
    case null => Some(null)
    case f: Float => Some(f.toDouble)
    case d: Double => Some(d)
    case _ => None
  }

  private def asBinary(v: Any): Option[Binary] = v match {
    case null => Some(null)
    case s: String => Some(Binary.fromString(s))
    case b: Array[Byte] => Some(Binary.fromConstantByteArray(b))
    case u: org.apache.spark.unsafe.types.UTF8String =>
      Some(Binary.fromConstantByteArray(u.getBytes))
    case _ => None
  }
}
