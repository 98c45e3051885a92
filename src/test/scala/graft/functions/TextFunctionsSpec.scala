package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq("x").toDF("dummy").select(c.as("r")).collect()(0).getAs[T]("r")

  test("tokens splits on single space and drops empties") {
    val r = Seq("a  b c ").toDF("t")
      .select(tokens(col("t")).as("r")).collect()(0).getSeq[String](0)
    assert(r == Seq("a", "b", "c"))
  }

  test("wordShingles yields n-k+1 shingles, empty below n") {
    val df = Seq("a b c d e", "a b").toDF("t")
      .select(wordShingles(tokens(col("t")), 3).as("s"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b c", "b c d", "c d e"))
    assert(rows(1).isEmpty)
  }

  test("hash60 is deterministic, positive, and < 2^60") {
    val h1 = one[Long](hash60(lit("hello")))
    val h2 = one[Long](hash60(lit("hello")))
    assert(h1 == h2 && h1 >= 0 && h1 < (1L << 60))
  }

  test("minHashJ stays within [0, P)") {
    val hm = one[Long](hashP(lit("token")))
    MinHashCoeffs.indices.foreach { j =>
      val v = one[Long](minHashJ(lit(hm), j))
      assert(v >= 0 && v < MinHashP, s"bit $j out of range: $v")
    }
  }

  test("fingerprint folds case and whitespace") {
    val df = Seq(("A  quick   Fox", "a quick fox")).toDF("a", "b")
      .select(fingerprint(col("a")).as("fa"), fingerprint(col("b")).as("fb"))
    val r = df.collect()(0)
    assert(r.getString(0) == r.getString(1))
  }

  test("simhash60 equal for equal text, all-ones for empty") {
    val r = Seq("w1 w2 w3", "w1 w2 w3", "").toDF("t")
      .select(simhash60("t").as("s")).collect().map(_.getLong(0))
    assert(r(0) == r(1))
    assert(r(2) == (1L << 60) - 1) // empty doc: every vote ties at 0 => bit set
  }

  test("simhash of similar texts is closer than dissimilar (Hamming)") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "completely unrelated words appear here instead tonight")
    val s = texts.toDF("t").select(simhash60("t").as("s"))
      .collect().map(_.getLong(0))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(s(0), s(1)) < ham(s(0), s(2)))
  }
}
