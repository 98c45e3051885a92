package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BandKeysSpec extends SparkSpec {
  import spark.implicits._

  private def fused(nb: Int, bb: Int) =
    call_function("graft_band_keys", col("e"), lit(nb), lit(bb))

  /** The composed reference form: bit i of band b set iff
    * e · hyperplane(b·bb + i) ≥ 0, each dot its own graft_dot. */
  private def composed(nb: Int, bb: Int) = array((0 until nb).map { b =>
    (0 until bb).map { i =>
      when(call_function("graft_dot", col("e"),
        lit(Hyperplanes.rows(b * bb + i))) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }: _*)

  test("fused band keys are identical to composing one graft_dot per bit") {
    val vecs = (0 until 200).map { v =>
      (v.toLong, Array.tabulate(64)(d => (math.sin(v * 131 + d * 7) * 3).toFloat))
    }.toDF("id", "e")
    val rows = vecs.select(fused(4, 16).as("f"), composed(4, 16).as("c")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r)
    }
  }

  test("short and double-typed vectors agree across code paths too") {
    val vecs = Seq(
      (1L, Array(0.5, -1.5, 2.25)), // dim << MaxDim
      (2L, Array.tabulate(100)(d => math.cos(d) * 2)),
    ).toDF("id", "e")
    val rows = vecs.select(fused(2, 8).as("f"), composed(2, 8).as("c")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r))
  }

  test("wide 4x24-bit banding (96 sign bits) matches the composed form") {
    // the corpus-scale sketch width (2^24 buckets/band, the knob that
    // keeps candidate volume linear past 10^6 vectors — SOAK_ann.md)
    val vecs = (0 until 100).map { v =>
      (v.toLong, Array.tabulate(64)(d => (math.sin(v * 37 + d * 11) * 2).toFloat))
    }.toDF("id", "e")
    val rows = vecs.select(fused(4, 24).as("f"), composed(4, 24).as("c")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r))
    // keys genuinely use the high bits (a 16-bit-keyed run would not)
    val anyHigh = rows.exists(_.getSeq[Long](0).exists(k => (k >> 16) != 0))
    assert(anyHigh, "no 4x24 key exceeded 16 bits — wide banding inert")
  }

  test("planted duplicate vectors share all band keys at every width") {
    val base = Array.tabulate(64)(d => (math.cos(d * 13) * 2).toFloat)
    val vecs = Seq((1L, base), (2L, base.clone())).toDF("id", "e")
    for ((nb, bb) <- Seq((4, 16), (4, 24), (4, 32))) {
      val ks = vecs.select(fused(nb, bb)).collect().map(_.getSeq[Long](0))
      assert(ks(0) == ks(1), s"dup vectors diverged at ${nb}x$bb")
    }
  }

  test("interpreted eval matches codegen") {
    val e = BandKeys(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array.tabulate(64)(d => (math.sin(d) * 2).toFloat),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      numBands = 4, bandBits = 16)
    val interpreted = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
    val viaPlan = spark.range(1)
      .select(call_function("graft_band_keys",
        typedLit(Array.tabulate(64)(d => (math.sin(d) * 2).toFloat)),
        lit(4), lit(16)))
      .collect()(0).getSeq[Long](0)
    assert(interpreted == viaPlan)
  }
}
