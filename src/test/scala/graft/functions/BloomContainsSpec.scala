package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** graft_bloom_contains: no false negatives ever (the prefilter
  * contract x31 relies on), bounded false positives, and
  * interpreted-vs-codegen agreement like the other native
  * expressions. */
class BloomContainsSpec extends SparkSpec {
  import spark.implicits._

  private def serialized(keys: Seq[Long], fpp: Double = 0.01): Array[Byte] = {
    val bf = BloomFilter.create(keys.length.toLong, fpp)
    keys.foreach(bf.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  test("zero false negatives over the full inserted set") {
    val keys = (0L until 5000L).map(_ * 7919L + 13L)
    val bytes = serialized(keys)
    val missed = keys.toDF("k")
      .filter(!call_function("graft_bloom_contains", col("k"), lit(bytes)))
      .count()
    assert(missed == 0, s"$missed inserted keys reported absent")
  }

  test("false-positive rate is near the configured fpp") {
    val keys = (0L until 20000L).map(_ * 7919L + 13L)
    val bytes = serialized(keys, fpp = 0.01)
    // probe a disjoint key range
    val fp = (0L until 20000L).map(_ * 7919L + 14L).toDF("k")
      .filter(call_function("graft_bloom_contains", col("k"), lit(bytes)))
      .count()
    assert(fp < 20000 * 0.03, s"fp count $fp way above 1% target")
    assert(fp > 0, "a 1% filter with 20k disjoint probes should see some fps")
  }

  test("interpreted eval matches the codegen'd plan") {
    val keys = Seq(42L, 77L, -5L)
    val bytes = serialized(keys)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val probes = Seq(42L, 43L, 77L, -5L, 0L)
    val interpreted = probes.map { k =>
      BloomContains(Literal(k), Literal(bytes)).eval(null)
    }
    val viaPlan = probes.toDF("k")
      .select(call_function("graft_bloom_contains", col("k"), lit(bytes)))
      .collect().map(_.getBoolean(0)).toSeq
    assert(interpreted == viaPlan)
    // inserted keys must all be true on both paths
    assert(viaPlan(0) && viaPlan(2) && viaPlan(3))
  }

  test("null key stays null, rejects non-long keys") {
    val bytes = serialized(Seq(1L))
    val r = Seq[(java.lang.Long, Int)]((1L, 0), (null, 1)).toDF("k", "i")
      .select(call_function("graft_bloom_contains", col("k"), lit(bytes)).as("m"))
      .collect()
    assert(r(0).getBoolean(0))
    assert(r(1).isNullAt(0))
    intercept[Exception] {
      Seq("s").toDF("k")
        .select(call_function("graft_bloom_contains", col("k"), lit(bytes)))
        .collect()
    }
  }
}
