package graft.operators

import graft.SparkSpec
import graft.core.Tables
import java.nio.file.Files

/** Round-8 specs for the x34/x35/x36 additions: hand-computed
  * expectations on planted documents (the oracle gate checks
  * engine-vs-DuckDB equivalence; these check both against a human). */
class TextPipelineR8Spec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("r8text").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("x34 piiRedact: planted natural PII is counted on top of the injection and fully redacted") {
    val t = Tables(spark, docsDir(Seq(
      (0L, "write to bob.smith@corp.io or 123-456-7890 now", "s0"),
      (7L, "hello world", "s0"))))
    val got = TextQueries.piiRedact(t).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    // doc 0: one natural email + phone, plus the injected email/phone/ip
    assert(got(0L)._1 == 2 && got(0L)._2 == 2 && got(0L)._3 == 1)
    assert(got(0L)._4 == md5hex(
      "write to <EMAIL> or <PHONE> now contact <EMAIL> call <PHONE> from <IP> end"))
    // doc 7: injection only, fully redacted
    assert(got(7L) == ((1L, 1L, 1L,
      md5hex("hello world contact <EMAIL> call <PHONE> from <IP> end"))))
  }

  test("x35 chunkDedup: a chunk shared across docs survives only in its first (doc_id, idx) occurrence") {
    val shared = (1 to 20).map(i => s"w$i").mkString(" ")
    val tailA = (1 to 5).map(i => s"a$i").mkString(" ")
    val tailB = (1 to 5).map(i => s"b$i").mkString(" ")
    val t = Tables(spark, docsDir(Seq(
      (0L, s"$shared $tailA", "s0"),
      (1L, s"$shared $tailB", "s0"))))
    val got = TextQueries.chunkDedup(t).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(0L) == ((2L, 2L, md5hex(s"$shared $tailA"))))
    // doc 1 loses the shared first chunk, keeps only its tail
    assert(got(1L) == ((2L, 1L, md5hex(tailB))))
  }

  test("x36 dsirWeights: a raw doc written in the target vocabulary outranks same-length off-target docs") {
    val vocabA = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val vocabB = Seq("zero", "one", "two", "three", "four")
    def text(v: Seq[String], shift: Int) =
      (0 until 30).map(i => v((i + shift) % v.length)).mkString(" ")
    val target = (0 until 10).map(i => (i.toLong, text(vocabA, i), "src0"))
    val raw = (10 until 20).map(i => (i.toLong, text(vocabB, i), "srcX"))
    val planted = Seq((20L, text(vocabA, 3), "srcX"))
    val t = Tables(spark, docsDir(target ++ raw ++ planted))
    val got = TextQueries.dsirWeights(t).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.size == 11 && !got.contains(0L), "only non-target docs are scored")
    val best = got.maxBy(_._2)._1
    assert(best == 20L,
      s"the target-vocabulary raw doc should carry the max importance weight, got doc $best")
    // and it should dominate by a wide margin, not a tie-break
    val restMax = (got - 20L).values.max
    assert(got(20L) > restMax + 1.0)
  }
}
