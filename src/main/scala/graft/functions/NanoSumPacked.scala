package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Σ_i table(i)(nibble_i(packed)) — [[NanoSum]] with the PQ codes
  * packed 4 bits each into ONE int instead of an `array<int>` column:
  * nibble i (bits [4i, 4i+4)) is subspace i's code.
  *
  * Why packing (round-11 ANN soak, measured at 10M vectors): the win
  * is the SCAN, not the disk — parquet already bit-packs a
  * low-cardinality int array, so the on-disk codes column was ~40 MB
  * either way; but the in-memory scan row drops from an
  * UnsafeArrayData (16 B header + 8 elements) to one 4 B int and the
  * fold reads each code by shift+mask instead of an array access.
  * Measured: x61/x62 sf0.1 walls 0.73×/0.67×, the 10M encode pass
  * 224→174 s. With PqKsub = 16 the 8 codes fit one INT exactly.
  * Semantics are identical to NanoSum over the unpacked array — terms
  * are pre-rounded nano-unit longs, the sum is exact and
  * order-independent.
  *
  * Same loud-failure contract as NanoSum (ADVICE r10): at most 8
  * subspaces can live in 32 bits, and every nibble must index inside
  * its subtable — on UnsafeArrayData an unchecked read returns
  * adjacent-row garbage instead of failing. */
case class NanoSumPacked(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(LongType, _), _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_nano_sum_packed expects (array<array<long>>, int), got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_nano_sum_packed"

  override def nullSafeEval(t: Any, p: Any): Any =
    NanoSumPacked.compute(t.asInstanceOf[ArrayData], p.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p) =>
      s"${ev.value} = graft.functions.NanoSumPacked.compute($t, $p);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NanoSumPacked {
  /** Shared by eval and generated code. `packed` nibble i = code i;
    * logical shift so the top nibble (bits 28–31, the sign bit) reads
    * back correctly. */
  def compute(table: ArrayData, packed: Int): Long = {
    val n = table.numElements()
    if (n > 8)
      throw new IllegalArgumentException(
        s"graft_nano_sum_packed: $n subspaces cannot pack into 32 bits (max 8)")
    // loud-failure contract (ADVICE r11): with fewer than 8 subtables a
    // non-zero nibble ABOVE the table length is a table/codes length
    // mismatch, the exact condition NanoSum rejects on the array form —
    // silence here would quietly drop subspace terms for foreign SQL
    // input (unreachable in-repo: PqM = 8 fills the int exactly)
    if (n < 8 && (packed >>> (4 * n)) != 0)
      throw new IllegalArgumentException(
        s"graft_nano_sum_packed: packed codes carry ${8 - n} nibble(s) above " +
          s"the $n-subtable lookup table (high bits 0x${(packed >>> (4 * n)).toHexString})")
    var s = 0L
    var i = 0
    while (i < n) {
      val sub = table.getArray(i)
      val c = (packed >>> (i * 4)) & 0xF
      if (c >= sub.numElements())
        throw new ArrayIndexOutOfBoundsException(
          s"graft_nano_sum_packed: code $c out of range [0, ${sub.numElements()}) " +
            s"at subspace $i")
      s += sub.getLong(c)
      i += 1
    }
    s
  }
}
