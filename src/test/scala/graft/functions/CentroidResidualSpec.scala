package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CentroidResidualSpec extends SparkSpec {
  import spark.implicits._

  private val cents = Array(Array(1.0, 2.0, 3.0), Array(-0.5, 0.25, 10.0))
  private val rows = Seq(
    (0L, Array(1.5f, 2.5f, 3.5f), 0),
    (1L, Array(0.0f, 0.0f, 0.0f), 1),
    (2L, Array(-1.25f, 7.5f, 0.125f), 1))

  test("native residual == broadcast-join zip_with fallback, bit-for-bit") {
    val df = rows.toDF("vec_id", "embedding", "cell")
    val native = df.select(col("vec_id"),
      call_function("graft_centroid_residual", col("embedding"),
        typedLit(cents.map(_.toSeq).toSeq), col("cell")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val centsDf = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("cell", "cent")
    val fallback = df.join(broadcast(centsDf), "cell")
      .select(col("vec_id"), zip_with(col("embedding"), col("cent"),
        (x, c) => (x.cast("double") - c).cast("float")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(native == fallback)
    // spot value: (1.5 - 1.0, 2.5 - 2.0, 3.5 - 3.0)
    assert(native(0L) == Seq(0.5f, 0.5f, 0.5f))
  }

  test("interpreted eval matches the planned path; nulls pass through; bad cell fails loudly") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    val e = CentroidResidual(
      Literal.create(Seq(1.5f, 2.5f, 3.5f),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      cents, Literal(0))
    assert(e.eval(null).asInstanceOf[ArrayData].toFloatArray().toSeq ==
      Seq(0.5f, 0.5f, 0.5f))
    val planned = Seq((Array(1.5f, 2.5f, 3.5f), 0)).toDF("e", "c")
      .select(call_function("graft_centroid_residual", col("e"),
        typedLit(cents.map(_.toSeq).toSeq), col("c")))
      .collect()(0).getSeq[Float](0)
    assert(planned == Seq(0.5f, 0.5f, 0.5f))
    val nulls = Seq((Option.empty[Array[Float]], 0)).toDF("e", "c")
      .select(call_function("graft_centroid_residual", col("e"),
        typedLit(cents.map(_.toSeq).toSeq), col("c")))
      .collect()(0)
    assert(nulls.isNullAt(0))
    // a cell outside the matrix is a wrong-centroid corruption if read
    // unchecked — it must throw, not wrap or return garbage
    val bad = intercept[Exception] {
      Seq((Array(1.0f), 5)).toDF("e", "c")
        .select(call_function("graft_centroid_residual", col("e"),
          typedLit(cents.map(_.toSeq).toSeq), col("c")))
        .collect()
    }
    assert(bad.getMessage != null || bad.getCause != null)
  }
}
