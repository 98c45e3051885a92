package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct hashed word-shingles of a token array — the whole
  * shingle → md5-fold → distinct pipeline as ONE row-local call inside
  * whole-stage codegen.
  *
  * Two modes, matching the repo's two composed formulations exactly:
  *  - `mod > 0` (the MinHash feed, [[TextFunctions.hashedShingles]]):
  *    distinct on the shingle STRINGS in first-occurrence order, then
  *    each distinct shingle hashed `h60(s) % mod` — post-hash collision
  *    duplicates STAY in the array, bit-identical to
  *    `transform(array_distinct(wordShingles(toks, n)), s -> hash60(s) % mod)`.
  *  - `mod == 0` (the decontamination feed): every shingle occurrence
  *    hashed `h60(s)`, then distinct on the 60-bit VALUES in
  *    first-occurrence order, bit-identical to
  *    `array_distinct(transform(wordShingles(toks, n), s -> hash60(s)))`.
  *  - `distinct = false` (the x36 DSIR bag-of-ngrams feed): EVERY
  *    shingle occurrence hashed (folded by `mod` when > 0), nothing
  *    deduplicated, bit-identical to
  *    `transform(wordShingles(toks, n), s -> hash60(s) [% mod])` —
  *    downstream counts carry the multiplicity.
  *
  * Why native (round-10 fix): the composed form's nested HOF lambdas
  * (`transform`/`array_distinct` over `wordShingles`'s `sequence` +
  * `concat_ws`) are CodegenFallback, and Catalyst's pushed filters +
  * collapsed projections re-evaluated the whole interpreted shingle+md5
  * pipeline 2-3x per row — x06 regressed 0.61 s → 6.1 s at sf0.1
  * (BENCH_r09). This expression is one flat loop — shingle bytes →
  * [[Hash60.h60]] → distinct — and identical trees are de-duplicated by
  * codegen subexpression elimination, so repeated consumers cost one
  * evaluation. Same move as [[SimHash60]]/[[MinHashSig]].
  *
  * Fewer than n tokens → empty array (callers filter such docs out
  * before banding, matching the exploded form where they had no rows).
  */
case class HashedShingles(child: Expression, n: Int, mod: Long,
                           distinct: Boolean = true)
    extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  require(mod >= 0L, s"mod must be >= 0 (0 = no fold), got $mod")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hashed_shingles expects array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_shingles"

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(
      HashedShingles.compute(a.asInstanceOf[ArrayData], n, mod, distinct))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.HashedShingles.compute($c, $n, ${mod}L, $distinct));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedShingles {
  private val Space = UTF8String.fromString(" ")

  /** Shared by eval and generated code so the two paths are
    * bit-identical by construction. Null token elements are skipped
    * inside the shingle join, exactly like SQL `concat_ws`. */
  def compute(toks: ArrayData, n: Int, mod: Long,
              distinct: Boolean): Array[Long] = {
    val m = toks.numElements()
    if (m < n) return Array.emptyLongArray
    val nsh = m - n + 1
    val parts = new Array[UTF8String](n)
    if (!distinct) {
      // every occurrence, in shingle order — multiplicity preserved
      val out = new Array[Long](nsh)
      var i = 0
      while (i < nsh) {
        var j = 0
        while (j < n) {
          parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
          j += 1
        }
        val h = Hash60.h60(UTF8String.concatWs(Space, parts: _*))
        out(i) = if (mod > 0L) h % mod else h
        i += 1
      }
      out
    } else if (mod > 0L) {
      // distinct on shingle strings FIRST (first-occurrence order, like
      // array_distinct), then fold — post-hash dups retained
      val seen = new java.util.LinkedHashSet[UTF8String](nsh * 2)
      var i = 0
      while (i < nsh) {
        var j = 0
        while (j < n) {
          parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
          j += 1
        }
        seen.add(UTF8String.concatWs(Space, parts: _*))
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator
      var k = 0
      while (it.hasNext) { out(k) = Hash60.h60(it.next()) % mod; k += 1 }
      out
    } else {
      // hash every occurrence, distinct on the 60-bit values
      val seen = new java.util.LinkedHashSet[java.lang.Long](nsh * 2)
      var i = 0
      while (i < nsh) {
        var j = 0
        while (j < n) {
          parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
          j += 1
        }
        seen.add(java.lang.Long.valueOf(
          Hash60.h60(UTF8String.concatWs(Space, parts: _*))))
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator
      var k = 0
      while (it.hasNext) { out(k) = it.next().longValue; k += 1 }
      out
    }
  }
}
