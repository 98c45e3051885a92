package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_nano_sum's contract: Σ_i table(i)(codes(i)) — identical to
  * the composed element_at fold on well-formed PQ input, and a LOUD
  * error (not an out-of-bounds read returning garbage — ADVICE r10)
  * on malformed input, matching how the composed fallback fails. */
class NanoSumSpec extends SparkSpec {
  import spark.implicits._

  private val table = Seq(Seq(10L, 20L, 30L), Seq(1L, 2L, 3L))

  test("sums table(i)(codes(i)) and matches the composed element_at fold") {
    val df = Seq((table, Seq(2, 0))).toDF("t", "c")
    val r = df.select(
      call_function("graft_nano_sum", col("t"), col("c")).as("n"),
      (element_at(element_at(col("t"), 1), element_at(col("c"), 1) + 1) +
        element_at(element_at(col("t"), 2), element_at(col("c"), 2) + 1)).as("f"))
      .collect()(0)
    assert(r.getLong(0) == 31L && r.getLong(1) == 31L)
  }

  test("interpreted eval matches planned path; null passes through") {
    val e = NanoSum(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        table, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType))),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2, 0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType)))
    assert(e.eval(null) == 31L)
    val nulls = Seq((Option.empty[Seq[Seq[Long]]], Seq(0, 0))).toDF("t", "c")
      .select(call_function("graft_nano_sum", col("t"), col("c")))
      .collect()(0)
    assert(nulls.isNullAt(0))
  }

  test("length mismatch and out-of-range codes fail loudly") {
    def run(codes: Seq[Int]): Unit =
      Seq((table, codes)).toDF("t", "c")
        .select(call_function("graft_nano_sum", col("t"), col("c")))
        .collect()
    val short = intercept[Exception](run(Seq(0)))
    assert(short.getMessage != null || short.getCause != null)
    val oob = intercept[Exception](run(Seq(0, 3)))
    assert(oob.getMessage != null || oob.getCause != null)
    val neg = intercept[Exception](run(Seq(-1, 0)))
    assert(neg.getMessage != null || neg.getCause != null)
  }
}
