package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
  extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

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

object TextFunctions {
  /** n-token shingles of a token array column. */
  def word_shingles(tokens: Column, n: Int): Column =
    GraftShims.column(WordShingles(GraftShims.expression(tokens), n))
}
