package graft.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 FunctionCatalog payloads: the engine's custom functions exposed
  * to plain SQL under the `sys` namespace —
  * `SELECT graft.sys.vec_dot(a, b)`, `graft.sys.word_shingles(toks, 3)`.
  * (The Column-API equivalents in graft.functions are codegen
  * expressions; these are the catalog-resolved scalar forms.)
  */
object GraftFunctions {

  val names: Seq[String] = Seq("vec_dot", "vec_cosine", "word_shingles")

  def load(name: String): UnboundFunction = name match {
    case "vec_dot" => VecDotUnbound(cosine = false)
    case "bucket" => GraftBucketUnbound
    case "vec_cosine" => VecDotUnbound(cosine = true)
    case "word_shingles" => WordShinglesUnbound
    case other =>
      throw new NoSuchElementException(s"Function $other not found")
  }

  final case class VecDotUnbound(cosine: Boolean) extends UnboundFunction {
    override def name(): String = if (cosine) "vec_cosine" else "vec_dot"
    override def description(): String =
      if (cosine) "cosine similarity of two float vectors"
      else "dot product of two float vectors"
    override def bind(inputType: StructType): BoundFunction = {
      def isFloatArr(dt: DataType): Boolean = dt match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
      require(inputType.length == 2 && inputType.forall(f => isFloatArr(f.dataType)),
        s"${name()} expects (array<float>, array<float>), got $inputType")
      new ScalarFunction[java.lang.Double] {
        override def inputTypes(): Array[DataType] =
          Array(ArrayType(FloatType), ArrayType(FloatType))
        override def resultType(): DataType = DoubleType
        override def name(): String = VecDotUnbound.this.name()
        override def canonicalName(): String = s"graft.sys.${name()}"
        override def produceResult(input: InternalRow): java.lang.Double = {
          if (input.isNullAt(0) || input.isNullAt(1)) return null
          val a = input.getArray(0)
          val b = input.getArray(1)
          def dot(x: ArrayData, y: ArrayData): Double = {
            val n = math.min(x.numElements(), y.numElements())
            var acc = 0.0
            var i = 0
            while (i < n) {
              acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
              i += 1
            }
            acc
          }
          if (!cosine) dot(a, b)
          else dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
        }
      }
    }
  }

  object WordShinglesUnbound extends UnboundFunction {
    override def name(): String = "word_shingles"
    override def description(): String =
      "n-token shingles of a token array"
    override def bind(inputType: StructType): BoundFunction = {
      val okFirst = inputType(0).dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      }
      require(inputType.length == 2 && okFirst &&
        inputType(1).dataType == IntegerType,
        s"word_shingles expects (array<string>, int), got $inputType")
      new ScalarFunction[ArrayData] {
        override def inputTypes(): Array[DataType] =
          Array(ArrayType(StringType), IntegerType)
        override def resultType(): DataType = ArrayType(StringType)
        override def name(): String = "word_shingles"
        override def canonicalName(): String = "graft.sys.word_shingles"
        override def produceResult(input: InternalRow): ArrayData = {
          if (input.isNullAt(0) || input.isNullAt(1)) return null
          val arr = input.getArray(0)
          val n = input.getInt(1)
          // n < 1 would throw NegativeArraySizeException from inside an
          // executor (n < 0) or emit total+1 EMPTY shingles (n == 0) —
          // reject with the actual argument instead
          require(n >= 1, s"word_shingles needs n >= 1, got $n")
          val total = arr.numElements()
          val m = math.max(total - n + 1, 0)
          val sep = UTF8String.fromString(" ")
          val out = new Array[Any](m)
          var i = 0
          while (i < m) {
            val parts = new Array[UTF8String](n)
            var j = 0
            while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
            out(i) = UTF8String.concatWs(sep, parts: _*)
            i += 1
          }
          new GenericArrayData(out)
        }
      }
    }
  }
}

/** The table format's bucket function as a catalog V2 function — what
  * storage-partitioned joins compare (`canonicalName`) to prove two
  * scans are co-partitioned, and evaluate when re-bucketing one side.
  * Must agree exactly with the write path's `Values.bucketOf`.
  */
object GraftBucketUnbound
  extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.types._

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, key...) — graft primary-key bucketing"

  override def bind(inputType: StructType)
      : org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
    require(inputType.length >= 2 &&
      (inputType(0).dataType == IntegerType || inputType(0).dataType == LongType),
      "bucket(numBuckets: int, key columns...)")
    val keyTypes = inputType.fields.drop(1).map(_.dataType).toSeq
    new org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Int] {
      override def inputTypes(): Array[DataType] = inputType.fields.map(_.dataType)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.bucket"
      override def isResultNullable: Boolean = false
      override def produceResult(row: org.apache.spark.sql.catalyst.InternalRow): Int = {
        val n = row.get(0, inputType(0).dataType) match {
          case i: java.lang.Integer => i.intValue()
          case l: java.lang.Long => l.toInt
        }
        val keyStrs = keyTypes.zipWithIndex.map { case (dt, i) =>
          Values.encode(dt,
            if (row.isNullAt(i + 1)) null else row.get(i + 1, dt))
        }
        Values.bucketOf(keyStrs, n)
      }
    }
  }
}
