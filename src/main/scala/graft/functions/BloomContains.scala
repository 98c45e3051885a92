package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(key, filterBytes)` — membership probe of a
  * long key against a serialized [[org.apache.spark.util.sketch
  * .BloomFilter]] (the public sketch built distributedly by
  * `DataFrameStatFunctions.bloomFilter`'s treeAggregate).
  *
  * This is the engine's scale path for membership prefilters whose
  * reference set outgrows a broadcast hash relation (see
  * `TextQueries.bloomDecontaminate`): the filter costs ~1.2 bytes/key
  * at 1% FPP versus the ~32+ bytes/key of a hashed relation, and the
  * probe is two xxhash64 rounds + `numHashFunctions` bit tests —
  * codegen'd inline, no join machinery on the prefilter side. Spark
  * wires the same sketch into its own runtime row-group filtering
  * (`BloomFilterMightContain`); this expression is the user-level
  * twin that accepts any BinaryType literal produced by
  * `BloomFilter.writeTo`.
  *
  * The right child must be foldable (the serialized filter travels as
  * a literal with the plan — one copy per task binary, deserialized
  * once per JVM-instance of the expression, NOT per row). Probes are
  * only ever a prefilter: callers must re-verify survivors exactly
  * (false positives are by construction) — the expression never
  * returns a false negative.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects a bigint key, got ${left.dataType.sql}")
    else if (right.dataType != BinaryType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains expects a foldable binary serialized filter")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  /** Deserialized once per (deserialized) expression instance; the
    * expression itself ships to executors with the literal bytes, and
    * this lazy re-inflates there on first eval. */
  @transient private lazy val filter: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(key: Any, bytes: Any): Any =
    filter.mightContainLong(key.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the inflated filter rides the codegen references array — the
    // generated code probes it directly rather than re-reading the
    // byte literal per row
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (key, _) =>
      s"${ev.value} = $ref.mightContainLong($key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
