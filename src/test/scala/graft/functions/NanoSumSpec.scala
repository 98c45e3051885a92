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

  // ---- graft_nano_sum_packed: the same fold over nibble-packed codes ----

  test("packed fold equals the array fold for every nibble combination") {
    val tab8 = Seq.tabulate(8)(i => Seq.tabulate(16)(c => (i * 100 + c).toLong))
    val rng = new scala.util.Random(7)
    val cases = Seq.fill(50)(Seq.fill(8)(rng.nextInt(16)))
    val rows = cases.map { cs =>
      val packed = cs.zipWithIndex.map { case (c, i) => c << (i * 4) }
        .reduce(_ | _)
      (tab8, cs, packed)
    }
    val out = rows.toDF("t", "c", "p")
      .select(
        call_function("graft_nano_sum", col("t"), col("c")).as("a"),
        call_function("graft_nano_sum_packed", col("t"), col("p")).as("b"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("packed: interpreted eval matches planned path; top nibble (sign bit) reads back; null passes through") {
    val tab8 = Seq.tabulate(8)(i => Seq.tabulate(16)(c => (i * 100 + c).toLong))
    // code 15 in subspace 7 sets bits 28-31 -> negative int
    val packed = (0 until 7).map(i => 1 << (i * 4)).reduce(_ | _) | (15 << 28)
    assert(packed < 0)
    val expected = (0 until 7).map(i => (i * 100 + 1).toLong).sum + 715L
    val e = NanoSumPacked(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        tab8, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType))),
      org.apache.spark.sql.catalyst.expressions.Literal(packed))
    assert(e.eval(null) == expected)
    val planned = Seq((tab8, packed)).toDF("t", "p")
      .select(call_function("graft_nano_sum_packed", col("t"), col("p")))
      .collect()(0).getLong(0)
    assert(planned == expected)
    val nulls = Seq((Option.empty[Seq[Seq[Long]]], 0)).toDF("t", "p")
      .select(call_function("graft_nano_sum_packed", col("t"), col("p")))
      .collect()(0)
    assert(nulls.isNullAt(0))
  }

  test("packed: >8 subspaces and out-of-range nibbles fail loudly") {
    val tab9 = Seq.tabulate(9)(i => Seq.tabulate(16)(c => (i + c).toLong))
    val nine = intercept[Exception] {
      Seq((tab9, 0)).toDF("t", "p")
        .select(call_function("graft_nano_sum_packed", col("t"), col("p")))
        .collect()
    }
    assert(nine.getMessage != null || nine.getCause != null)
    // subtable shorter than the nibble's value
    val short = Seq(Seq(1L, 2L))
    val oob = intercept[Exception] {
      Seq((short, 3)).toDF("t", "p")
        .select(call_function("graft_nano_sum_packed", col("t"), col("p")))
        .collect()
    }
    assert(oob.getMessage != null || oob.getCause != null)
    // ADVICE r11: a SHORT table (n < 8) with non-zero nibbles above it
    // is a table/codes length mismatch — rejected, not silently dropped
    val tab2 = Seq.tabulate(2)(i => Seq.tabulate(16)(c => (i + c).toLong))
    val high = intercept[Exception] {
      Seq((tab2, 1 << 8)).toDF("t", "p") // nibble 2 set, only 2 subtables
        .select(call_function("graft_nano_sum_packed", col("t"), col("p")))
        .collect()
    }
    assert(high.getMessage != null || high.getCause != null)
    // and the all-zero high-nibble case still computes
    val ok = Seq((tab2, (1 << 4) | 2)).toDF("t", "p")
      .select(call_function("graft_nano_sum_packed", col("t"), col("p")))
      .collect()(0).getLong(0)
    assert(ok == 2L + (1L + 1L)) // tab(0)(2)=2, tab(1)(1)=2
  }
}
