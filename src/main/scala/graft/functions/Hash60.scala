package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the engine's shared hash primitive
  * ([[TextFunctions.hash60]]): the top 60 bits of md5, taken directly
  * from the digest bytes. Bit-identical to the SQL-composable
  * `conv(substring(md5(c), 1, 15), 16, 10)` formulation — the first 15
  * hex characters are bytes 0–6 plus the high nibble of byte 7 — but
  * skips the hex-string render and the string→decimal re-parse that
  * the composed form pays PER TOKEN in the MinHash/SimHash/KMV hot
  * paths. Stays inside whole-stage codegen via a static call.
  *
  * Measured honestly: at sf0.1 wall time is PARITY with the composed
  * form (the md5 digest itself dominates; x06/x12/x13 medians
  * unchanged) — the value here is the two avoided per-token string
  * allocations (GC pressure on real executors) and one fused primitive
  * for every hash consumer, not a local speedup.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_h60 expects a string input, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h60"

  override def nullSafeEval(s: Any): Any =
    Hash60.h60(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60$$.MODULE$$.h60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hash60 {
  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5(s): bytes 0–6 (14 hex chars) then the high
    * nibble of byte 7 (the 15th) — exactly `conv(substring(md5, 1,
    * 15), 16, 10)`. */
  def h60(s: UTF8String): Long = {
    val d = digests.get()
    d.reset()
    val b = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    (v << 4) | ((b(7) & 0xf0L) >>> 4)
  }
}
