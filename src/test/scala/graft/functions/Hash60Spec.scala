package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native graft_h60 must be BIT-IDENTICAL to the SQL-composable
  * `conv(substring(md5(c), 1, 15), 16, 10)` form — the whole oracle
  * parity story (MinHash, SimHash, KMV, hyperplanes) hangs off this
  * one primitive. */
class Hash60Spec extends SparkSpec {
  import spark.implicits._

  private val fixtures = Seq(
    "", "a", "hello world", "répété", "токен", "emoji 😀",
    "trailing space ", "1234567890", "a'b\"c", "\n\t")

  test("native h60 equals the conv(md5) composition on varied inputs") {
    val df = (fixtures ++ (0 until 500).map(i => s"tok_$i")).toDF("s")
    val mismatches = df.select(
      call_function("graft_h60", col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(mismatches == 0)
  }

  test("interpreted eval matches codegen") {
    val native = Hash60(org.apache.spark.sql.catalyst.expressions.Literal("graft"))
    val interpreted = native.eval(null).asInstanceOf[Long]
    val viaPlan = Seq("graft").toDF("s")
      .select(call_function("graft_h60", col("s"))).collect()(0).getLong(0)
    assert(interpreted == viaPlan)
    assert(interpreted == Hash60.h60(org.apache.spark.unsafe.types.UTF8String.fromString("graft")))
  }

  test("values stay in [0, 2^60) — the range every downstream modulus assumes") {
    val bad = (0 until 1000).map(i => s"v$i").toDF("s")
      .select(call_function("graft_h60", col("s")).as("h"))
      .filter(col("h") < 0 || col("h") >= (1L << 60)).count()
    assert(bad == 0)
  }
}
