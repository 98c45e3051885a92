package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Deterministic pseudo-gaussian hyperplanes shared by the LSH sign
  * sketches: g(i, j) = (h60(md5("i_j")) mod 1000) / 500 − 1 ∈ [−1, 1) —
  * the md5-derived constant family every oracle-gated sketch reproduces
  * in DuckDB SQL ([[graft.operators.Similarity]] emits the same formula
  * as `projSql`). Computed once on the driver. */
object Hyperplanes {
  /** Max embedding dimension covered. */
  val MaxDim = 256

  def g(i: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${i}_$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) % 1000L).toDouble / 500.0 - 1.0
  }

  /** Row j = hyperplane for sign bit j (cached up to 128 bits: the
    * g(i, j) family is unbounded in j, so wider sketches only need
    * this cache raised — 128 covers 4×32-bit banding, the width that
    * keeps per-band buckets sparse past 10⁸ vectors). */
  lazy val rows: IndexedSeq[Array[Double]] =
    (0 until 128).map(j => Array.tabulate(MaxDim)(i => g(i, j)))
}

/** All LSH band keys of an embedding in ONE codegen'd pass: band b's
  * key has bit i set iff embedding · hyperplane(b·bandBits + i) ≥ 0,
  * with the dot in sequential double accumulation — bit-identical to
  * composing `graft_dot` per bit, but one generated loop nest instead
  * of numBands×bandBits separate expressions (the composed form
  * dominated x09's runtime with codegen size, not arithmetic).
  */
case class BandKeys(child: Expression, numBands: Int, bandBits: Int)
    extends UnaryExpression {

  require(numBands * bandBits <= 128, "at most 128 sign bits supported")
  require(bandBits <= 63, "a band key must fit a signed long")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_band_keys expects array<float|double>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_band_keys"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** planes(j) = hyperplane row j, flattened driver-side constants. */
  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(numBands * bandBits)(Hyperplanes.rows(_))

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), Hyperplanes.MaxDim)
    val fx = isFloat
    val keys = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var key = 0L
      var i = 0
      while (i < bandBits) {
        val plane = planes(b * bandBits + i)
        var s = 0.0
        var k = 0
        while (k < n) {
          val xv = if (fx) x.getFloat(k).toDouble else x.getDouble(k)
          s += xv * plane(k)
          k += 1
        }
        if (s >= 0) key |= 1L << i
        i += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("planes", planes, "double[][]")
      val n = ctx.freshName("n")
      val keys = ctx.freshName("keys")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val key = ctx.freshName("key")
      val plane = ctx.freshName("plane")
      val getX = if (isFloat) s"(double) $a.getFloat($k)" else s"$a.getDouble($k)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), ${Hyperplanes.MaxDim});
         |long[] $keys = new long[$numBands];
         |for (int $b = 0; $b < $numBands; $b++) {
         |  long $key = 0L;
         |  for (int $i = 0; $i < $bandBits; $i++) {
         |    double[] $plane = $mat[$b * $bandBits + $i];
         |    double $s = 0.0;
         |    for (int $k = 0; $k < $n; $k++) { $s += $getX * $plane[$k]; }
         |    if ($s >= 0) $key |= 1L << $i;
         |  }
         |  $keys[$b] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
