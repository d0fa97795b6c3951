package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(tokens, n)`: the n-token shingle array of a token
  * array, as a native codegen expression — a tight loop with
  * `UTF8String.concatWs`, replacing the interpreted
  * `transform(sequence(...), i -> concat_ws(' ', slice(...)))`
  * higher-order formulation (measured ~7x faster on the sf0.1 corpus:
  * HOF lambdas interpret per element and re-materialize slices).
  */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  // analysis-time validation, like the sibling hash expressions — a
  // wrong-typed column would otherwise ClassCastException mid-job
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private lazy val sep = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val total = arr.numElements()
    val m = math.max(total - n + 1, 0)
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
      val total = ctx.freshName("total")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val parts = ctx.freshName("parts")
      val j = ctx.freshName("j")
      s"""
         |int $total = $arr.numElements();
         |int $m = java.lang.Math.max($total - ${n - 1}, 0);
         |Object[] $out = new Object[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  UTF8String[] $parts = new UTF8String[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    $parts[$j] = $arr.getUTF8String($i + $j);
         |  }
         |  $out[$i] = UTF8String.concatWs($sepRef, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared byte-level tokenizer core, Java-callable from generated code
  * (Scala object methods get static forwarders).
  */
object AsciiWordsUtil {
  /** Maximal runs of ASCII letters, lowercased — byte-for-byte the
    * result of `regexp_extract_all(lower(s), '[a-z]+')`.
    *
    * Pure-ASCII input (the overwhelmingly common case) runs the single
    * fused byte scan. Input with any high bit set first goes through
    * `UTF8String.toLowerCase` — the SAME lowering Spark's `lower()`
    * applies — because a handful of non-ASCII code points lower INTO
    * ASCII (U+212A KELVIN SIGN → 'k', U+0130 İ → 'i' + U+0307) and a
    * byte-only scan would wrongly treat them as separators. After
    * Unicode lowering no A-Z remains, and multi-byte UTF-8 sequences
    * have the high bit set on every byte, so extracting maximal a-z
    * byte runs from the lowered bytes is exactly the regex semantics.
    */
  def extract(s: UTF8String): GenericArrayData = {
    var bytes = s.getBytes
    var n = bytes.length
    var hasHighBit = false
    var i = 0
    while (i < n && !hasHighBit) { hasHighBit = bytes(i) < 0; i += 1 }
    if (hasHighBit) {
      bytes = s.toLowerCase.getBytes
      n = bytes.length
    }
    val out = new java.util.ArrayList[UTF8String]()
    i = 0
    while (i < n) {
      var b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) {
        var j = i
        var letter = true
        while (j < n && letter) {
          b = bytes(j)
          letter = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
          if (letter) j += 1
        }
        val w = new Array[Byte](j - i)
        var k = 0
        while (k < j - i) { w(k) = (bytes(i + k) | 0x20).toByte; k += 1 }
        out.add(UTF8String.fromBytes(w))
        i = j
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `ascii_words(text)`: lowercase ASCII-letter tokens of a string as a
  * native codegen expression — one pass over the UTF-8 bytes, no regex
  * engine, replacing `regexp_extract_all(lower(text), '[a-z]+', 0)`
  * (identical output — see [[AsciiWordsUtil.extract]]; FunctionsSpec
  * pins the equivalence on randomized Unicode input). The tokenizer
  * sits under every dedup/text query, so it is the single hottest
  * scalar in the corpus pipeline.
  */
case class AsciiWords(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    AsciiWordsUtil.extract(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AsciiWordsUtil.extract($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  /** n-token shingles of a token array column. */
  def word_shingles(tokens: Column, n: Int): Column =
    GraftShims.column(WordShingles(GraftShims.expression(tokens), n))

  /** Lowercased ASCII-letter tokens of a string column. */
  def ascii_words(text: Column): Column =
    GraftShims.column(AsciiWords(GraftShims.expression(text)))
}
