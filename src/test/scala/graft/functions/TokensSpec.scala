package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native tokenizer's whole contract is bit-identity with
  * `filter(split(text, " "), t -> t <> "")` — every text query and
  * every oracle's `list_filter(string_split(...))` assume it. */
class TokensSpec extends SparkSpec {
  import spark.implicits._

  test("native tokens equals the split+filter HOF on edge cases") {
    val cases = Seq(
      "plain three tokens",
      "  leading and   multiple    gaps ",
      "trailing space ",
      " ",
      "",
      "single",
      "tab\tand\nnewline stay inside tokens",
      "unicode héllo wörld € 話 spaced",
      "a  b", // double space -> empty segment dropped
    )
    val df = cases.toDF("text")
    val rows = df.select(
      call_function("graft_tokens", col("text")).as("n"),
      filter(split(col("text"), " "), t => t =!= "").as("c")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r))
  }

  test("interpreted eval matches planned path; null passes through") {
    val viaPlan = spark.range(1)
      .select(call_function("graft_tokens", lit("x  y z")))
      .collect()(0).getSeq[String](0)
    assert(viaPlan == Seq("x", "y", "z"))
    val nulls = spark.range(1)
      .select(call_function("graft_tokens", lit(null).cast("string")))
      .collect()(0)
    assert(nulls.isNullAt(0))
  }
}
