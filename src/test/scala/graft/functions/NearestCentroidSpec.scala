package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  private val centroids: Array[Array[Double]] =
    Array.tabulate(24)(j => Array.tabulate(16)(i => math.sin(j * 31 + i * 7) * 2))

  /** The composed reference form trainAndAssign used before the native
    * expression: per-centroid literal dots, argmax via
    * array_position(array_max). */
  private def composed = {
    val scoreArr = array(centroids.map { c =>
      graft.operators.Similarity.dotCols(col("e"), lit(c)) * 2.0 -
        lit(c.map(x => x * x).sum)
    }: _*)
    (array_position(scoreArr, array_max(scoreArr)) - 1).cast("int")
  }

  private def native =
    call_function("graft_nearest_centroid", col("e"),
      typedLit(centroids.map(_.toSeq).toSeq))

  test("native assignment equals the composed argmax form on float vectors") {
    val vecs = (0 until 500).map { v =>
      (v.toLong, Array.tabulate(16)(i => (math.cos(v * 13 + i * 5) * 3).toFloat))
    }.toDF("id", "e")
    val rows = vecs.select(native.as("n"), composed.as("c")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r))
    // the fixture genuinely spreads across cells
    assert(rows.map(_.getInt(0)).distinct.length > 5)
  }

  test("exact-tie keeps the first centroid, like array_position's first match") {
    val twin = Array(1.0, 2.0, 3.0)
    val cs = Array(twin, Array(9.0, 9.0, 9.0), twin.clone())
    val out = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "e")
      .select(call_function("graft_nearest_centroid", col("e"),
        typedLit(cs.map(_.toSeq).toSeq)))
      .collect()(0).getInt(0)
    assert(out == 0, s"tie should keep first centroid, got $out")
  }

  test("interpreted eval matches codegen") {
    val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Array.tabulate(16)(i => (math.sin(i) * 2).toFloat),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val e = NearestCentroid(lit, centroids)
    val interpreted = e.eval(null).asInstanceOf[Int]
    val viaPlan = spark.range(1)
      .select(call_function("graft_nearest_centroid",
        typedLit(Array.tabulate(16)(i => (math.sin(i) * 2).toFloat)),
        typedLit(centroids.map(_.toSeq).toSeq)))
      .collect()(0).getInt(0)
    assert(interpreted == viaPlan)
  }

  test("double-element vectors and short vectors assign consistently") {
    val vecs = Seq(
      (1L, Array(0.5, -1.5)), // shorter than centroid dim: common-prefix dot
      (2L, Array.tabulate(16)(i => math.cos(i) * 2)),
    ).toDF("id", "e")
    val rows = vecs.select(native.as("n"), composed.as("c")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r))
  }
}
