package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(2.0f, 0.0f, 0.0f)),
    (3L, Array(1.0f, 1.0f, 0.0f)),
  ).toDF("vec_id", "a").withColumn("b", col("a"))

  test("cosine of a vector with itself is 1") {
    val r = vecs.select(Similarity.cosine("a", "b").as("c"))
      .collect().map(_.getDouble(0))
    r.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
  }

  test("cosine of orthogonal vectors is 0, scaled copies 1") {
    val two = vecs.as("x").join(vecs.as("y"),
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("i"), col("y.vec_id").as("j"),
        Similarity.cosine("x.a", "y.a").as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(two((0L, 1L))) < 1e-12)        // orthogonal
    assert(math.abs(two((0L, 2L)) - 1.0) < 1e-12)  // same direction
    assert(math.abs(two((0L, 3L)) - math.sqrt(0.5)) < 1e-12)
  }

  test("bruteForceTopK over sf0.001: 10 queries x k ranked results") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val rows = Similarity.bruteForceTopK(t, nQueries = 3, k = 5).collect()
    assert(rows.length == 15)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rk")).sorted.sameElements(1L to 5L))
      val cs = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, "cos non-increasing in rank")
    }
  }
}
