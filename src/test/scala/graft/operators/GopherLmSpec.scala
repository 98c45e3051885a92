package graft.operators

import graft.SparkSpec
import graft.core.Tables
import java.nio.file.Files

/** Round-8 additions: x37 Gopher-rule filter, x38 per-domain caps,
  * x39 hashed-bigram LM cross-entropy, x40 CCNet head/middle/tail
  * partition. Planted-input golden checks + plan pins; the oracle
  * gate covers hash-exactness. */
class GopherLmSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("glm").toString
    rows.map { case (id, text, src) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- x37 ---------------------------------------------------------------

  test("x37: each Gopher rule fires on its planted violator") {
    val good = ((1 to 25).map(i => s"word$i") ++ Seq("the", "a", "of"))
      .mkString(" ") // 28 tokens, diverse, stopwords present
    val rows = Seq(
      (0L, good, "s1"),                                  // passes all
      (1L, (1 to 9).map(i => s"tok$i").mkString(" ") + " the a", "s1"), // 11 tokens -> r_wc fails
      (2L, Seq.fill(30)("spark").mkString(" ") + " the a", "s1"),       // top_frac ~0.94 -> r_rep
      (3L, (1 to 24).map(i => s"word$i").mkString(" ") +
        " a a a a a a", "s1"),                           // 6/30 single-char -> r_short (and r_rep ok: 6/30=0.2>0.125 so also fails r_rep)
      (4L, (1 to 30).map(i => s"word$i").mkString(" "), "s1")) // no stopwords -> r_stop
    val t = Tables(spark, docsDir(rows))
    val m = TextQueries.gopherRules(t).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(0L).getAs[Boolean]("pass"), m(0L).toString)
    assert(!m(1L).getAs[Boolean]("r_wc"))
    assert(!m(2L).getAs[Boolean]("r_rep"))
    assert(!m(3L).getAs[Boolean]("r_short"))
    assert(!m(4L).getAs[Boolean]("r_stop"))
    assert(m(4L).getAs[Long]("n_fail") >= 1L)
  }

  test("x37: rule suite is a shuffle-free narrow pass") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val p = TextQueries.gopherRules(t).queryExecution.executedPlan.toString
    // only the final ORDER BY exchanges (range partitioning); the
    // row-local HOF metrics must not introduce a hash shuffle
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
    assert(!p.contains("BatchEvalPython"))
  }

  // ---- x38 ---------------------------------------------------------------

  test("x38: canonicalization collapses scheme/www/query variants; caps hold per domain") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val out = TextQueries.domainCaps(t).collect()
    // canonical URLs carry no scheme, no www., no query string
    assert(out.forall { r =>
      val u = r.getAs[String]("canon_url")
      !u.contains("://") && !u.startsWith("www.") && !u.contains("?")
    })
    // doc_ids 6 (http, WWW., no query) and 46 (https, no www, no query)
    // differ in every injected wart but share doc_id%40=6 -> same domain
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(6L).getAs[String]("domain") ==
      byId(46L).getAs[String]("domain"))
    // the cap is a hard bound per domain
    val keptPerDomain = out.filter(_.getAs[Boolean]("kept"))
      .groupBy(_.getAs[String]("domain")).map(_._2.length)
    assert(keptPerDomain.nonEmpty && keptPerDomain.max <= 10)
    // ranks are contiguous from 1 within each domain
    out.groupBy(_.getAs[String]("domain")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Long]("rnk")).sorted
      assert(ranks.zipWithIndex.forall { case (r, i) => r == i + 1 })
    }
  }

  test("x38: the cap window partitions by domain — no global order") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val p = TextQueries.domainCaps(t).queryExecution.executedPlan.toString
    assert(p.contains("Exchange hashpartitioning(domain"), p.take(3000))
  }

  // ---- x39 / x40 ---------------------------------------------------------

  test("x39: in-domain text scores lower cross-entropy than unseen text") {
    val target = (0 until 6).map(i =>
      (i.toLong, "alpha beta gamma delta alpha beta gamma delta alpha beta", "src0"))
    val scored = Seq(
      (100L, "alpha beta gamma delta alpha beta", "s1"),  // seen bigrams
      (101L, "zz qq rr ss tt uu vv ww", "s1"))            // unseen bigrams
    val t = Tables(spark, docsDir(target ++ scored))
    val m = TextQueries.bigramPerplexity(t).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ce")).toMap
    assert(m.keySet == Set(100L, 101L), m.toString) // target docs not scored
    assert(m(100L) < m(101L), s"seen ${m(100L)} !< unseen ${m(101L)}")
  }

  test("x39: derived ctx equals the direct context groupBy (r13 one-pass fit)") {
    // buildLmModel now derives ctx from the persisted mdl
    // (c1 = Σ_bb c12) instead of a second corpus pass; pin it against
    // the original direct formulation, recomputed here from the public
    // primitives with the same bucket count (LmBuckets = 1024).
    import graft.functions.TextFunctions.{hash60, tokens, wordShingles}
    import org.apache.spark.sql.functions._
    val rows = (0 until 40).map(i =>
      (i.toLong, s"alpha beta w$i gamma alpha w${i % 7} beta", "src0"))
    val t = Tables(spark, docsDir(rows))
    val m = TextQueries.buildLmModel(t.documents)
    val direct = t.documents
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(explode(wordShingles(col("toks"), 2)).as("s"))
      .select((hash60(substring_index(col("s"), " ", 1)) % 1024L).as("cb"))
      .groupBy("cb").agg(count(lit(1)).as("c1"))
    val got = m.ctx.orderBy("cb").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = direct.orderBy("cb").collect().map(r => (r.getLong(0), r.getLong(1)))
    m.release()
    assert(got.sameElements(want),
      s"ctx mismatch: got ${got.take(5).toSeq} want ${want.take(5).toSeq}")
  }

  test("x39: model tables broadcast onto the scoring join") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val p = TextQueries.bigramPerplexity(t)
      .queryExecution.executedPlan.toString
    val b = "BroadcastHashJoin".r.findAllIn(p).length +
      "BroadcastQueryStage".r.findAllIn(p).length
    assert(b >= 2, s"expected ctx+mdl broadcasts, got $b\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  // ---- x07 band-width knob -----------------------------------------------

  test("x07: wider bands produce a candidate subset; exact twins survive any width") {
    // twins (identical text -> identical signature -> match at every
    // width) + unrelated docs (shingle-disjoint -> no candidates)
    val twin = (1 to 12).map(i => s"alpha$i beta$i gamma$i").mkString(" ")
    val rows = (0 until 4).map(i => (i.toLong, twin, "s1")) ++
      (10 until 30).map(i =>
        (i.toLong, (0 until 15).map(j => s"w${i}_$j").mkString(" "), "s1"))
    val t = Tables(spark, docsDir(rows))
    def pairs(rowsPerBand: Int, bands: Int) =
      TextQueries.lshPairs(t, rowsPerBand, bands)
        .select("d1", "d2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val narrow = pairs(4, 4)
    val wide = pairs(8, 2)
    assert(wide.subsetOf(narrow), s"wide \\ narrow: ${wide.diff(narrow)}")
    val twinPairs = (for { a <- 0L until 4L; b <- (a + 1) until 4L }
      yield (a, b)).toSet
    assert(twinPairs.subsetOf(wide), s"missing twins: ${twinPairs.diff(wide)}")
  }

  // ---- x41 / x42 ---------------------------------------------------------

  test("x41: ranks are contiguous per ranker and rrf recomputes from them") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val rows = TextQueries.rrfFusion(t).collect()
    assert(rows.nonEmpty)
    def ranks(i: Int) = rows.flatMap(r =>
      if (r.isNullAt(i)) None else Some(r.getLong(i)))
    // each ranker's ranks are distinct, 1-based, within the top-30 list
    for (i <- Seq(1, 2); rs = ranks(i)) {
      assert(rs.distinct.length == rs.length)
      assert(rs.forall(r => r >= 1 && r <= 30), rs.mkString(","))
    }
    // rrf is exactly the sum of the per-ranker reciprocal terms
    rows.foreach { r =>
      val expect = Seq(1, 2).map(i =>
        if (r.isNullAt(i)) 0.0 else 1.0 / (60L + r.getLong(i))).sum
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-6, r.toString)
    }
    // descending fused order
    val rrfs = rows.map(_.getAs[Double]("rrf"))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
  }

  test("x42: each delta status fires on its planted case, with the right survivor") {
    val long = (1 to 60).map(i => s"base$i").mkString(" ")
    val mutated = (1 to 59).map(i => s"base$i").mkString(" ") + " changedtok"
    val fresh = (1 to 30).map(i => s"fresh$i").mkString(" ")
    val rows = Seq(
      (1L, long, "s1"),              // corpus original
      (2L, "other corpus doc with plenty of words here", "s1"),
      (10L, s"  $long  ", "s1"),     // delta: fingerprint folds whitespace
      (20L, fresh, "s1"),            // delta: first of a delta pair
      (30L, fresh, "s1"),            // delta: exact dup of 20
      (40L, mutated, "s1"),          // delta: near-dup of corpus doc 1
      (50L, (1 to 40).map(i => s"solo$i").mkString(" "), "s1")) // new
    val t = Tables(spark, docsDir(rows))
    val out = TextQueries.deltaDedup(t).collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(out(10L) == (("exact_dup_corpus", 1L)), out)
    assert(out(20L) == (("new", -1L)), out)
    assert(out(30L) == (("exact_dup_delta", 20L)), out)
    assert(out(40L) == (("near_dup_corpus", 1L)), out)
    assert(out(50L) == (("new", -1L)), out)
  }

  test("x42: the near-dup ham cut runs inside the delta-vs-corpus join; no corpus self-join") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val p = TextQueries.deltaDedup(t).queryExecution.executedPlan.toString
    val joinLine = p.split("\n")
      .find(l => l.contains("Join") && l.contains("bit_count"))
    assert(joinLine.isDefined, p.take(3000))
    // both banded sides are mod-filtered (delta vs corpus), so the
    // corpus never pairs with itself: the plan carries both the
    // = 0 (delta) and the negated (corpus) residue filter
    assert(p.contains("% 10) = 0"), p.take(2000))
    assert(p.contains("NOT"), p.take(2000))
  }

  test("x40: tercile buckets are ordered and cover all scored docs") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val scored = TextQueries.bigramPerplexity(t).count()
    val out = TextQueries.pplPartition(t).collect()
    assert(out.length == scored)
    val byBucket = out.groupBy(_.getAs[String]("bucket"))
      .map { case (b, rs) => b -> rs.map(_.getAs[Double]("ce")) }
    assert(byBucket.keySet == Set("head", "middle", "tail"), byBucket.keySet)
    assert(byBucket("head").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("tail").min)
    // terciles: each bucket within a couple of docs of n/3 (ties aside)
    val n = out.length
    byBucket.values.foreach(v =>
      assert(math.abs(v.length - n / 3) <= n / 6 + 2, s"skewed: ${v.length} of $n"))
  }
}
