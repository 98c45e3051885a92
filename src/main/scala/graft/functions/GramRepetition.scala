package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row word-n-gram repetition stats (the x16 Gopher signals):
  * `struct(top_frac, dup_frac)` over the hashed n-gram instances of a
  * token array — the share of gram instances claimed by the single
  * most frequent gram, and the share that are repeats. NULL when the
  * doc has fewer than `n` tokens (no grams).
  *
  * This is the shuffle-free form of the explode + two-level groupBy
  * formulation: n-grams never leave their document, so the whole
  * computation is row-local — one open-addressed count map per row,
  * zero exchanges at ANY corpus size (the exploded form shuffles
  * ~2x the corpus token volume). Bit-identical to the shuffled form:
  * grams are hashed with the engine's shared [[Hash60]] primitive
  * (same md5 fold as the DuckDB oracle, collisions merge identically)
  * and the fractions use the same long→double casts and division.
  */
case class GramRepetition(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_stats expects (array<string>, n >= 1), got ${other.sql}, n=$n")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("top_frac", DoubleType, nullable = false),
    StructField("dup_frac", DoubleType, nullable = false)))

  // null for gram-less docs even when the token array itself is non-null
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gram_stats"

  override def nullSafeEval(a: Any): Any =
    GramRepetition.compute(a.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.GramRepetition$$.MODULE$$.compute($c, $n);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramRepetition {
  private val Space = UTF8String.fromString(" ")

  /** Count map + stats for one document; null when no grams. */
  def compute(toks: ArrayData, n: Int): InternalRow = {
    val m = toks.numElements()
    val nGrams = m - n + 1
    if (nGrams <= 0) return null
    // open-addressed long→int count map, load factor <= 0.5; keys are
    // 60-bit hashes (never negative), so -1 marks an empty slot
    var cap = 4
    while (cap < nGrams * 2) cap <<= 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    java.util.Arrays.fill(keys, -1L)
    val cnts = new Array[Int](cap)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < nGrams) {
      var o = 0
      while (o < n) { parts(o) = toks.getUTF8String(i + o); o += 1 }
      // concatWs skips null inputs — same as the concat_ws the
      // exploded wordShingles formulation uses
      val h = Hash60.h60(UTF8String.concatWs(Space, parts: _*))
      var idx = (h ^ (h >>> 29)).toInt & mask
      while (keys(idx) != h && keys(idx) != -1L) idx = (idx + 1) & mask
      keys(idx) = h
      cnts(idx) += 1
      i += 1
    }
    var maxC = 0L
    var dup = 0L
    var j = 0
    while (j < cap) {
      val c = cnts(j)
      if (c > maxC) maxC = c
      if (c > 1) dup += c
      j += 1
    }
    // identical arithmetic to the grouped form: long counts cast to
    // double, then one division
    val total = nGrams.toLong.toDouble
    new GenericInternalRow(Array[Any](maxC.toDouble / total, dup.toDouble / total))
  }
}
