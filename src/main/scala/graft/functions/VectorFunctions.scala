package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.sqrt

/** Native Catalyst expression for the float-vector dot product with
  * `doGenCode` — a tight primitive loop inside whole-stage codegen.
  * Spark's higher-order functions (`zip_with`+`aggregate`) evaluate
  * lambdas interpretively per element, which is ~10-50x slower on the
  * 64-dim embeddings; this is the (b)-tier custom-Expression path of
  * the build guidance (compose > Expression > plan rule > RDD).
  *
  * Accumulates in double, left-to-right — the same fold order as the
  * HOF formulation it replaces. Two documented divergences from that
  * formulation, both dead at every call site: a length mismatch folds
  * the common prefix (HOF: NULL) and a NULL ELEMENT reads as 0.0
  * (HOF: NULL) — embeddings and centroid literals are fixed-width and
  * null-free by construction (the embeddings table's vectors are
  * non-null arrays; IVF/PQ literals are generated).
  */
case class FloatVectorDot(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance between two int-array vectors, accumulated in
  * long — the IVF coarse-quantizer distance kernel over int8 codes.
  * Same motivation as [[FloatVectorDot]]: the `aggregate(zip_with(...))`
  * higher-order formulation evaluates its lambdas interpretively per
  * element, which dominated the IVF assignment scans (k centroids × 64
  * dims per row); this is a primitive loop inside whole-stage codegen.
  *
  * Arithmetic matches the HOF/DuckDB form on the fixed-width inputs
  * the IVF/PQ pipelines feed it: per-dim difference and square in int
  * (codes are 0..255, so |d| <= 255 and d*d <= 65025 — no 32-bit
  * overflow), summed into long left-to-right. Like [[FloatVectorDot]],
  * a length mismatch folds over the common prefix (the HOF form would
  * return NULL there) — all call sites pair a 64- or 8-wide code
  * column with a literal of the same width.
  */
case class IntVectorSqL2(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getInt(i) - y.getInt(i)
      acc += (d * d).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  int $d = $a.getInt($i) - $b.getInt($i);
         |  $acc += (long) ($d * $d);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Arg-min squared-L2 of an int-code vector against a LITERAL centroid
  * matrix, in ONE compact codegen loop: returns
  * `struct<dist: bigint, cid: bigint>` of the nearest centroid, ties
  * to the LOWEST cid — bit-identical to
  * `array_min(array(struct(sql2(v, c_k), cid_k), ...))`, the
  * lexicographic (dist, cid) struct-min both engines agree on.
  *
  * Exists because the composed form is a ~K×(sql2 + struct) + array +
  * array_min expression TREE: at K=16 centroids x 8 subspaces the
  * assignment projection carried 128 inlined distance kernels, and
  * whole-stage codegen over that tree ran ~60 µs/row at 1M vectors
  * (measured: 63 s for the one-subspace-set scan that this kernel does
  * in ~2 s). The centroid matrix and cid list are literals (constant
  * folded once); `cids` MUST be ascending for the tie-break to match
  * struct-min — every call site builds them sorted by cid.
  */
case class IntVectorArgminSqL2(vec: Expression, cents: Expression,
    cids: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
  with ExpectsInputTypes {

  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = cids

  override def inputTypes: Seq[DataType] = Seq(
    ArrayType(IntegerType),
    ArrayType(ArrayType(IntegerType)),
    ArrayType(LongType))

  override def dataType: DataType = StructType(Seq(
    StructField("dist", LongType, nullable = false),
    StructField("cid", LongType, nullable = false)))

  override def nullSafeEval(v: Any, cs: Any, ids: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val m = cs.asInstanceOf[ArrayData]
    val id = ids.asInstanceOf[ArrayData]
    var bestD = Long.MaxValue
    var bestC = 0L
    var c = 0
    while (c < m.numElements()) {
      val cv = m.getArray(c)
      val n = math.min(x.numElements(), cv.numElements())
      var acc = 0L
      var i = 0
      while (i < n) {
        val d = x.getInt(i) - cv.getInt(i)
        acc += (d * d).toLong
        i += 1
      }
      if (acc < bestD) { bestD = acc; bestC = id.getLong(c) }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, bestC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs, ids) => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val cv = ctx.freshName("cv")
      s"""
         |long $bestD = Long.MAX_VALUE;
         |long $bestC = 0L;
         |for (int $c = 0; $c < $cs.numElements(); $c++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $cs.getArray($c);
         |  int $n = java.lang.Math.min($v.numElements(), $cv.numElements());
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    int $d = $v.getInt($i) - $cv.getInt($i);
         |    $acc += (long) ($d * $d);
         |  }
         |  if ($acc < $bestD) { $bestD = $acc; $bestC = $ids.getLong($c); }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |  .GenericInternalRow(new Object[] {
         |    java.lang.Long.valueOf($bestD), java.lang.Long.valueOf($bestC) });
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression =
    copy(vec = f, cents = s, cids = t)
}

object VectorFunctions {
  def vec_dot(a: Column, b: Column): Column =
    GraftShims.column(FloatVectorDot(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** Squared L2 over int-code vectors (see [[IntVectorSqL2]]). */
  def vec_sql2_int(a: Column, b: Column): Column =
    GraftShims.column(IntVectorSqL2(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** Nearest-centroid arg-min (see [[IntVectorArgminSqL2]]): `cents`
    * sorted by cid ascending; returns struct(dist, cid).
    */
  def vec_argmin_sql2(v: Column, cents: Seq[(Long, Seq[Int])]): Column = {
    require(cents.map(_._1) == cents.map(_._1).sorted,
      "centroid ids must be ascending (tie-break contract)")
    import org.apache.spark.sql.functions.typedLit
    GraftShims.column(IntVectorArgminSqL2(
      GraftShims.expression(v),
      GraftShims.expression(typedLit(cents.map(_._2))),
      GraftShims.expression(typedLit(cents.map(_._1)))))
  }

  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))

  /** cosine(a,b) with norms computed inline. Prefer precomputing norms
    * once per side before a pairwise join (see Similarity queries).
    */
  def vec_cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))
}
