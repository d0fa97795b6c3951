package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** md5-derived hash kernels, Java-callable from generated code.
  *
  * The engine-portable hashes (Tables.h60s, the minhash double hash)
  * are DEFINED as hex-prefix slices of md5 — that definition is what
  * lets DuckDB replay them bit-for-bit — but evaluating them as
  * `conv(substring(md5(x), ...), 16, 10)` materializes a 32-char hex
  * UTF8String per row and then re-parses it (twice, for the minhash
  * split). These kernels fold the same nibbles straight out of the
  * digest bytes: one MessageDigest call (thread-local instance, no
  * per-row `getInstance`), zero intermediate strings. The hex
  * formulation remains the oracle-side definition.
  */
object HashKernels {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex nibbles of md5(s) as a positive 60-bit long —
    * bit-identical to `conv(substring(md5(s), 1, 15), 16, 10)`.
    */
  def md5Prefix60(s: UTF8String): Long = {
    val d = tl.get().digest(s.getBytes)
    prefix60(d)
  }

  /** Same 60-bit hash over a byte-array slice — the binary-payload
    * callers' entry (frame hashing in [[graft.functions.Multimodal]]);
    * one definition of the nibble fold for everyone.
    */
  def md5Prefix60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = tl.get()
    md.update(bytes, off, len)
    prefix60(md.digest())
  }

  private def prefix60(d: Array[Byte]): Long = {
    // nibbles 0..13 = bytes 0..6 whole; nibble 14 = high half of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xff) >>> 4)
  }

  /** The minhash double-hash split: hex nibbles [0,14) and [14,28) of
    * md5(s) as two 56-bit longs — bit-identical to
    * `conv(substring(md5(s), 1, 14), 16, 10)` and
    * `conv(substring(md5(s), 15, 14), 16, 10)`. ONE digest per input.
    */
  def md5Split56(s: UTF8String): GenericArrayData = {
    val d = tl.get().digest(s.getBytes)
    var h1 = 0L
    var i = 0
    while (i < 7) { h1 = (h1 << 8) | (d(i) & 0xffL); i += 1 }
    var h2 = 0L
    while (i < 14) { h2 = (h2 << 8) | (d(i) & 0xffL); i += 1 }
    new GenericArrayData(Array[Any](h1, h2))
  }

  /** The whole 60-bit SimHash signature of a token ARRAY in one
    * map-side pass: per token, vote +1/−1 on each bit of its
    * [[md5Prefix60]] hash; bit b of the signature is set iff its vote
    * total is >= 0. Identical values to exploding the array, hashing
    * each token, and folding 60 conditional SUMs per doc — minus the
    * explode, the 60-column aggregation stage, and its hash-agg probe
    * loop: the signature never leaves the task that tokenized the
    * document (the [[minHashSigs]] economics, for SimHash). Token
    * MULTIPLICITY counts (votes weigh repeats), matching the exploded
    * formulation. Returns null for an empty (or all-null) array — the
    * exploded form emits no row for such a doc, so callers filter
    * nulls to keep the two shapes row-identical.
    */
  def simHash60(arr: org.apache.spark.sql.catalyst.util.ArrayData): Any = {
    val n = arr.numElements()
    val votes = new Array[Int](60)
    val md = tl.get()
    var hashed = 0
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = {
          val d = md.digest(arr.getUTF8String(j).getBytes)
          var v = 0L
          var i = 0
          while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
          (v << 4) | ((d(7) & 0xff) >>> 4)
        }
        var b = 0
        while (b < 60) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        hashed += 1
      }
      j += 1
    }
    if (hashed == 0) null
    else {
      var sig = 0L
      var b = 0
      while (b < 60) {
        if (votes(b) >= 0) sig |= (1L << b)
        b += 1
      }
      sig
    }
  }

  /** The whole K-seed MinHash signature of a shingle SET in one
    * map-side pass: sig[i] = min over shingles g of h1(g) + i*h2(g)
    * (Kirsch-Mitzenmacher over [[md5Split56]]'s halves; h1 + 15*h2 <
    * 2^60, no overflow). Identical values to exploding the array,
    * hashing each element, and folding K per-doc `min` aggregates —
    * minus the explode, the K-column aggregation stage, and its
    * shuffle: the signature of a document never needs to leave the
    * task that tokenized it. Empty input yields an empty signature
    * (callers filter empty shingle sets before signing).
    */
  def minHashSigs(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      k: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mins = Array.fill(k)(Long.MaxValue)
    val md = tl.get()
    var hashed = 0
    var j = 0
    while (j < n) {
      // defensive: the declared input type admits nullable elements
      // even though every call site builds null-free shingle arrays
      if (arr.isNullAt(j)) { j += 1 }
      else {
      val d = md.digest(arr.getUTF8String(j).getBytes)
      var h1 = 0L
      var i = 0
      while (i < 7) { h1 = (h1 << 8) | (d(i) & 0xffL); i += 1 }
      var h2 = 0L
      while (i < 14) { h2 = (h2 << 8) | (d(i) & 0xffL); i += 1 }
      var s = 0
      var v = h1
      while (s < k) {
        if (v < mins(s)) mins(s) = v
        v += h2
        s += 1
      }
      hashed += 1
      j += 1
      }
    }
    // an all-null array hashed nothing: emitting [Long.MaxValue x k]
    // would make every such document signature-identical (guaranteed
    // false-positive duplicates in every LSH band) — treat it like the
    // empty set instead
    if (hashed == 0) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(mins.map(x => x: Any))
  }
}

/** `md5_prefix60(s)`: see [[HashKernels.md5Prefix60]]. */
case class Md5Prefix60(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    HashKernels.md5Prefix60(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.md5Prefix60($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `md5_split56(s)`: the two minhash base hashes `[h1, h2]` — see
  * [[HashKernels.md5Split56]].
  */
case class Md5Split56(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    HashKernels.md5Split56(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.md5Split56($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_sigs(shingles, k)`: the K-seed MinHash signature of a
  * shingle array, computed map-side — see [[HashKernels.minHashSigs]].
  */
case class MinHashSigs(child: Expression, k: Int)
  extends UnaryExpression with ExpectsInputTypes {

  // upper bound 16: the Kirsch-Mitzenmacher fold relies on
  // h1 + (k-1)*h2 staying below 2^60 (h1, h2 < 2^56) — k = 16 is the
  // last value where the sum cannot wrap Long and break bit-equality
  // with the oracle's non-wrapping explode + per-seed MIN formulation
  require(k >= 1 && k <= 16, s"minhash_sigs needs 1 <= k <= 16, got $k")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    HashKernels.minHashSigs(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.minHashSigs($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash60(tokens)`: the 60-bit SimHash of a token array, computed
  * map-side — see [[HashKernels.simHash60]]. Nullable: null for an
  * empty/all-null array (the exploded formulation emits no row there).
  */
case class SimHash60(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    HashKernels.simHash60(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      Object r = graft.functions.HashKernels.simHash60($c);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Long) r).longValue(); }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  /** 60-bit md5-prefix hash of a string column (codegen). */
  def md5_prefix60(c: Column): Column =
    GraftShims.column(Md5Prefix60(GraftShims.expression(c)))

  /** `[h1, h2]` 56-bit minhash base hashes of a string column. */
  def md5_split56(c: Column): Column =
    GraftShims.column(Md5Split56(GraftShims.expression(c)))

  /** K-seed map-side MinHash signature of an array<string> column. */
  def minhash_sigs(c: Column, k: Int): Column =
    GraftShims.column(MinHashSigs(GraftShims.expression(c), k))

  /** Map-side 60-bit SimHash of an array<string> token column. */
  def simhash60(c: Column): Column =
    GraftShims.column(SimHash60(GraftShims.expression(c)))
}
