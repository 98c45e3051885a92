package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 60-bit SimHash of a token array — the whole fingerprint as
  * ONE row-local call inside whole-stage codegen.
  *
  * Semantics (bit-identical to both SQL formulations in the repo):
  * for every token occurrence, hash to [[Hash60.h60]]; bit b of the
  * result is set iff at least half the tokens have bit b set
  * (2·S_b ≥ n — the sum-of-±1 ≥ 0 majority rule). Zero tokens → every
  * vote ties at 0 → all-ones (2^60−1).
  *
  * Why native: the composed alternatives either shuffle (explode →
  * 60-column HashAggregate — one exchange of every token hash per
  * fingerprint build) or interpret (the higher-order `aggregate()`
  * lambda evaluates per token × bit; measured 12.8 s for a bare sf1
  * projection vs 0.3 s tokenize-only). This expression is a plain
  * per-row projection: no exchange, no lambda, one md5 per token.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(a: Any): Any =
    SimHash60.compute(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  /** Majority-vote fold over the token hashes. Null array elements
    * cannot occur (tokens come from split) and are skipped if they do. */
  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    val votes = new Array[Int](60)
    var m = 0 // non-null token count
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val h = Hash60.h60(a.getUTF8String(i))
        var b = 0
        while (b < 60) {
          votes(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
        m += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 60) {
      if (2 * votes(b) >= m) sim |= (1L << b)
      b += 1
    }
    sim
  }
}
