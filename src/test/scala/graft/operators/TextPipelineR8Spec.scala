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

  test("x43 mixtureWeights: alpha<1 boosts the small source above its raw share, and both distributions sum to 1") {
    // srcSmall: 1 doc x 10 tokens; srcBig: 9 docs x 10 tokens = 90
    val ten = (1 to 10).map(i => s"t$i").mkString(" ")
    val t = Tables(spark, docsDir(
      Seq((0L, ten, "srcSmall")) ++ (1 to 9).map(i => (i.toLong, ten, "srcBig"))))
    val got = TextQueries.mixtureWeights(t).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got("srcSmall")._1 == 10L && got("srcBig")._1 == 90L)
    // hand numbers: p_alpha(small) = 10^0.7 / (10^0.7 + 90^0.7)
    val ta = math.pow(10, 0.7) + math.pow(90, 0.7)
    assert(got("srcSmall")._2 == 0.1 && got("srcBig")._2 == 0.9)
    assert(math.abs(got("srcSmall")._3 - math.pow(10, 0.7) / ta) < 1e-6)
    // the small source is boosted (>1), the big one damped (<1)
    assert(got("srcSmall")._4 > 1.0 && got("srcBig")._4 < 1.0)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-5)
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-5)
  }

  test("x44 dupSpans: cross-doc and within-doc repeated 8-token windows are both counted; short docs report zero windows") {
    val span = (1 to 8).map(i => s"w$i").mkString(" ")   // shared 8-window
    val rep = (1 to 8).map(i => s"s$i").mkString(" ")    // self-repeat
    val t = Tables(spark, docsDir(Seq(
      (0L, s"$span a1 a2", "s0"),   // 10 toks -> 3 windows, window 1 shared with doc 1
      (1L, s"$span b1 b2", "s0"),
      (2L, s"$rep $rep", "s0"),     // 16 toks -> 9 windows, i=1 and i=9 identical
      (3L, "x1 x2", "s0"))))        // < 8 tokens -> no windows
    val got = TextQueries.dupSpans(t).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got(0L) == ((3L, 1L, Some(0.333333))))
    assert(got(1L) == ((3L, 1L, Some(0.333333))))
    assert(got(2L) == ((9L, 2L, Some(0.222222))))
    assert(got(3L) == ((0L, 0L, None)))
  }
}
