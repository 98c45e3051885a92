package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace tokenizer — the engine's shared
  * [[TextFunctions.tokens]] (`filter(split(text, " "), t -> t <> "")`)
  * as one codegen byte scan.
  *
  * Semantics, bit-identical to the composed form and to the oracle's
  * `list_filter(string_split(text, ' '), x -> x <> '')`: split on the
  * SINGLE SPACE character only (0x20 — never part of a UTF-8
  * multi-byte sequence, so a byte scan is exact; tabs/newlines stay
  * inside tokens), drop empty segments. Each token owns a copied byte
  * array (like Spark's own split/substring — views into the input's
  * backing buffer would alias reused row buffers).
  *
  * Why native: `split` is codegen but the empties-dropping `filter`
  * lambda is a CodegenFallback HOF — one interpreted lambda dispatch
  * plus a boxed Boolean per token, paid by EVERY text query through
  * `withToks`. The allocation churn showed up as rep-to-rep GC jitter
  * on the bigram-explode queries (x36's r9/r10 bench spread). */
case class Tokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tokens expects a string input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override def nullSafeEval(s: Any): Any =
    Tokens.compute(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Tokens.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Tokens {
  /** Shared by eval and generated code. */
  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String](8)
    var start = 0
    var i = 0
    while (i < n) {
      if (bytes(i) == 0x20) {
        if (i > start)
          out.add(UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(bytes, start, i)))
        start = i + 1
      }
      i += 1
    }
    if (n > start)
      out.add(UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, start, n)))
    new GenericArrayData(out.toArray)
  }
}
