package graft.operators

import graft.SparkSpec
import graft.core.Tables
import java.nio.file.Files

/** Round-8 specs for x46 (TF-IDF keywords), x47 (token entropy) and
  * x48 (shard assignment): hand-computed expectations on planted
  * documents, plus the plan/partitioning properties the oracle cannot
  * see (shard balance/determinism, per-doc window partitioning). */
class TextStatsR8Spec extends SparkSpec {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("r8stats").toString
    rows.map { case (id, text) => (id, text, "en", "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("x46 tfidfKeywords: corpus-wide tokens score zero, rare tokens rank first") {
    // 'the' in all 3 docs -> ln(3/3)=0; 'rare' only in doc 0 -> ln 3
    val t = Tables(spark, docsDir(Seq(
      (0L, "the the rare"),
      (1L, "the shared word"),
      (2L, "the shared word word"))))
    val got = TextQueries.tfidfKeywords(t, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getDouble(4)))).toMap
    // doc 0 rank 1: rare, tf=1, tfidf = ln(3)
    assert(got((0L, 1L))._1 == "rare")
    assert(math.abs(got((0L, 1L))._3 - math.log(3.0)) < 1e-6)
    // doc 0 rank 2: 'the' at tfidf 0 (tf=2 * ln(1))
    assert(got((0L, 2L)) == (("the", 2L, 0.0)))
    // doc 2 rank 1: word twice, df=2 -> 2*ln(1.5)
    assert(got((2L, 1L))._1 == "word")
    assert(math.abs(got((2L, 1L))._3 - 2 * math.log(1.5)) < 1e-6)
  }

  test("x47 tokenEntropy: uniform > skewed > constant; empty doc nulls") {
    val t = Tables(spark, docsDir(Seq(
      (0L, "a b c d"),      // uniform over 4: H = ln 4, norm = 1
      (1L, "a a a b"),      // skewed
      (2L, "a a a a"),      // constant: H = 0
      (3L, ""))))           // token-less
    val got = TextQueries.tokenEntropy(t).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getLong(1) == 4 && got(0L).getLong(2) == 4)
    assert(math.abs(got(0L).getDouble(3) - math.log(4.0)) < 1e-6)
    assert(math.abs(got(0L).getDouble(4) - 1.0) < 1e-6)
    // skewed: H = ln4 - (3 ln 3)/4
    assert(math.abs(got(1L).getDouble(3) -
      (math.log(4.0) - 3 * math.log(3.0) / 4)) < 1e-6)
    assert(got(2L).getDouble(3) == 0.0 && got(2L).getDouble(4) == 0.0)
    assert(got(3L).getLong(1) == 0 && got(3L).isNullAt(3) && got(3L).isNullAt(4))
  }

  test("x48 shardAssign: a permutation — every doc exactly once, contiguous pos per shard, deterministic") {
    val t = Tables(spark, docsDir((0L until 200L).map(i => (i, s"doc $i"))))
    val a = TextQueries.shardAssign(t).collect()
    assert(a.map(_.getLong(0)).toSet == (0L until 200L).toSet)
    a.groupBy(_.getLong(1)).foreach { case (shard, rows) =>
      val pos = rows.map(_.getLong(2)).sorted.toSeq
      assert(pos == (1L to rows.length).toSeq,
        s"shard $shard positions not contiguous: $pos")
    }
    // balanced-ish under the hash (no shard empty, none > 3x mean)
    val sizes = a.groupBy(_.getLong(1)).values.map(_.length)
    assert(sizes.size == 8 && sizes.max < 3 * (200 / 8))
    val b = TextQueries.shardAssign(t).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("x49 spanRemoval: later copies of a span are removed, first kept; overlaps union") {
    val span = (1 to 8).map(i => s"s$i").mkString(" ")      // the shared 8-token span
    val t = Tables(spark, docsDir(Seq(
      (0L, s"$span a1 a2"),                  // first occurrence — intact
      (1L, s"b1 $span b2"),                  // later copy — span removed
      (2L, s"c1 c2 c3"),                     // untouched (no 8-token window)
      (3L, s"$span $span"))))                // within-doc repeat + overlap windows
    val got = TextQueries.spanRemoval(t).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0L) == ((10L, 10L, m(s"$span a1 a2"))), got(0L))
    assert(got(1L) == ((10L, 2L, m("b1 b2"))), got(1L))
    assert(got(2L) == ((3L, 3L, m("c1 c2 c3"))), got(2L))
    // doc 3: its first window (pos 1) is a LATER copy of doc 0's span, and
    // every other window (the wrap-around + the repeat) is also a dup of an
    // earlier occurrence -> all 16 tokens covered
    assert(got(3L) == ((16L, 0L, m(""))), got(3L))
  }

  test("x49 spanRemoval: tokens outside the duplicated window survive at both ends") {
    val span = (1 to 8).map(i => s"t$i").mkString(" ")
    val t = Tables(spark, docsDir(Seq(
      (0L, s"$span x1"), (1L, s"y1 $span"))))
    val once = TextQueries.spanRemoval(t).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(once == Map(0L -> 9L, 1L -> 1L))
  }

  private def docsDirSrc(rows: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("r8cal").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("x50 calibratedQuality: the cut is per source — a weak source still keeps its best docs") {
    // source A: rich-vocab docs; source B: repetitive docs that would all
    // fall below a GLOBAL cut. The per-source quantile keeps B's best.
    val a = (0 until 10).map(i => (i.toLong,
      (0 until 20).map(j => s"a${i}w$j").mkString(" ") + " one two.", "A"))
    val b = (10 until 20).map(i => (i.toLong,
      ("dup " * (25 - i)).trim, "B"))
    val t = Tables(spark, docsDirSrc(a ++ b :+ ((99L, "", "B"))))
    val got = TextQueries.calibratedQuality(t).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.isNullAt(3), r.getBoolean(4)))).toMap
    val keptB = got.filter { case (id, (s, _, k)) => s == "B" && k }
    assert(keptB.nonEmpty, s"per-source cut must keep some of source B: $got")
    val keptA = got.filter { case (_, (s, _, k)) => s == "A" && k }
    assert(keptA.nonEmpty)
    // token-less doc: null rank, never kept
    assert(got(99L)._2 && !got(99L)._3)
    // keep rate per source ≈ 1 - q: pr = (rank-1)/9 >= 0.7 -> top 3 of 10
    assert(keptA.size == 3 && keptB.size <= 3, s"A=${keptA.size} B=${keptB.size}")
  }

  test("x50 approx (mega-source path): window-free plan, agrees with exact up to cut-boundary ties") {
    // distinct token counts -> distinct qualities (the tolerance model
    // below assumes no corpus-wide ties; full-tie behavior is the
    // exact-vs-value-cut divergence the scaladoc documents)
    val a = (0 until 10).map(i => (i.toLong,
      (0 until 10 + 2 * i).map(j => s"a${i}w$j").mkString(" ") + " one two.", "A"))
    val b = (10 until 20).map(i => (i.toLong,
      ("dup " * (25 - i)).trim, "B"))
    val t = Tables(spark, docsDirSrc(a ++ b :+ ((99L, "", "B"))))
    val exact = TextQueries.calibratedQuality(t).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val approx = TextQueries.calibratedQualityApprox(t).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(approx.keySet == exact.keySet)
    // agreement up to docs tied at the per-source cut: the fixture has
    // distinct qualities, so allow at most one boundary doc per source
    val disagree = exact.keys.filter(k => exact(k) != approx(k))
    assert(disagree.size <= 2, s"too many keep-flag disagreements: $disagree")
    // the approx form must never keep a token-less doc
    assert(!approx(99L))
    // and its plan must be window-free (that is the point)
    val p = TextQueries.calibratedQualityApprox(t)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window") && p.contains("BroadcastHashJoin"),
      s"approx path must be window-free + broadcast cut join:\n${p.take(1500)}")
  }

  test("x46/x48 plans: only doc-partitioned / shard-partitioned windows, no global window") {
    val t = Tables(spark, docsDir((0L until 50L).map(i => (i, s"tok$i shared"))))
    Seq(TextQueries.tfidfKeywords(t), TextQueries.shardAssign(t)).foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      // a global window would plan a single-partition Exchange before WindowExec
      assert(!p.contains("Exchange SinglePartition, [plan_id"),
        s"unexpected single-partition exchange:\n${p.take(2000)}")
    }
    // x46's top-k must keep Spark's rank-limit pushdown: a Partial
    // WindowGroupLimit prunes each map task to k rows per doc BEFORE
    // the doc_id shuffle (losing it would shuffle every (doc, token))
    val p46 = TextQueries.tfidfKeywords(t).queryExecution.executedPlan.toString
    assert(p46.contains("WindowGroupLimit") && p46.contains("Partial"),
      s"x46 lost the partial rank-limit pushdown:\n${p46.take(2000)}")
    // x49's first-occurrence agg must combine map-side (partial_min of
    // the (doc_id,pos) struct), never a rank window over the hash
    val p49 = TextQueries.spanRemoval(t).queryExecution.executedPlan.toString
    assert(p49.contains("partial_min(struct(doc_id") &&
      !p49.contains("windowspecdefinition(hs"),
      s"x49 first-occurrence shape changed:\n${p49.take(2000)}")
  }
}
