package graft.operators

import graft.SparkSpec
import graft.core.Tables
import java.nio.file.Files

/** Specs for the round-5 pipeline operators: benchmark decontamination
  * (x26), cross-document boilerplate fraction (x27), per-source
  * token-budget fill (x28). */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("r5docs").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("decontaminate flags docs sharing a 3-gram with the benchmark set") {
    // doc 0 (0 % 97 == 0) is the benchmark; its shingles: "a b c", "b c d"
    val dir = docsDir(Seq(
      (0L, "a b c d", "s0"),
      (1L, "x a b c y", "s0"),   // contains "a b c" → contaminated, 1 hit
      (2L, "a b x c d", "s0"),   // no shared 3-gram → clean
      (3L, "a b c d e", "s0"),   // both benchmark shingles → 2 hits
      (4L, "q r", "s0")))        // too short for shingles → clean
    val out = TextQueries.decontaminate(Tables(spark, dir)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // benchmark doc itself excluded from the output
    assert(out == Map(
      1L -> ((1L, true)), 2L -> ((0L, false)),
      3L -> ((2L, true)), 4L -> ((0L, false))))
  }

  test("decontaminate broadcasts the benchmark shingle set") {
    val dir = docsDir((0L until 20L).map(i => (i, s"a b c d$i e f", "s0")))
    val plan = TextQueries.decontaminate(Tables(spark, dir))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("boilerplate fraction counts shingles above the doc-frequency bar") {
    // "c a t x y" appears in 12 docs → its shingles "c a t", "a t x",
    // "t x y" each have df=12 > 10; doc 100 shares only "c a t"
    val common = (0L until 12L).map(i => (i, "c a t x y", "s0"))
    val dir = docsDir(common ++ Seq(
      (100L, "c a t q r", "s0"),  // shingles: "c a t"(df=13>10), "a t q", "t q r"
      (101L, "p q", "s0")))       // no shingles
    val out = TextQueries.boilerplate(Tables(spark, dir)).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3))))
      .toMap
    assert(out(100L) == ((3L, 1L, 0.333333)))
    assert(out(0L) == ((3L, 3L, 1.0)))       // pure boilerplate doc
    assert(out(101L) == ((0L, 0L, -1.0)))    // shingle-less → NULL fraction
  }

  test("budget fill takes best-quality docs per source until the token budget") {
    // quality is dominated by the n/100 length term, so longer docs
    // score higher; source s0: doc 0 (40 toks) > doc 1 (30) > doc 2 (20);
    // budget 80 fits 40+30 but not +20. s1 fills independently.
    def words(n: Int, tag: String) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val dir = docsDir(Seq(
      (0L, words(40, "a"), "s0"),
      (1L, words(30, "b"), "s0"),
      (2L, words(20, "c"), "s0"),
      (3L, words(60, "d"), "s1"),
      (4L, words(25, "e"), "s1")))
    val out = TextQueries.budgetFill(Tables(spark, dir), budget = 80).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, "s0", 40L), (1L, "s0", 70L),      // doc 2 would exceed 80
      (3L, "s1", 60L)))                       // doc 4 would exceed 80
    // every emitted cumulative count respects the budget
    assert(out.forall(_._3 <= 80L))
  }

  test("sequence packing chunks the per-source token stream at fixed boundaries") {
    // s0 stream (doc_id order): 300 + 300 + 500 tokens; seqLen 512 →
    //   doc 0: [0, 300)   → seq 0 only
    //   doc 1: [300, 600) → spans the 512 boundary: seqs 0..1
    //   doc 2: [600,1100) → spans 1024: seqs 1..2
    def words(n: Int, tag: String) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val dir = docsDir(Seq(
      (0L, words(300, "a"), "s0"),
      (1L, words(300, "b"), "s0"),
      (2L, words(500, "c"), "s0"),
      (3L, words(600, "d"), "s1"),  // other source packs independently
      (4L, "", "s1")))              // empty doc excluded
    val out = TextQueries.packSequences(Tables(spark, dir)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out == Map(
      0L -> ((0L, 0L, 0L)),
      1L -> ((300L, 0L, 1L)),
      2L -> ((600L, 1L, 2L)),
      3L -> ((0L, 0L, 1L))))  // 600 tokens in s1: seqs 0..1 from offset 0
  }

  test("budget fill and packing shuffle once, on the source key") {
    val dir = docsDir(Seq((0L, "a b c", "s0"), (1L, "d e f", "s1")))
    for (df <- Seq(TextQueries.budgetFill(Tables(spark, dir)),
        TextQueries.packSequences(Tables(spark, dir)))) {
      val plan = df.queryExecution.executedPlan.toString
      // the window's one hash exchange on source; the only other
      // exchange is the final orderBy's range partitioning
      assert(plan.contains("hashpartitioning(source"), plan.take(1500))
      val hashExchanges = "Exchange hashpartitioning".r
        .findAllIn(plan).length
      assert(hashExchanges == 1, s"$hashExchanges hash exchanges:\n" + plan.take(2000))
    }
  }

  test("curation pipeline assigns one status per doc by precedence") {
    def words(n: Int, tag: String) = (0 until n).map(i => s"$tag$i").mkString(" ")
    // 20+ tokens clears too_short; en stopwords make pred_lang = en
    val en = "the a of and to in is " + words(13, "w")
    val dir = docsDir(Seq(
      (0L, words(22, "b"), "s0"),               // 0 % 97 == 0 → benchmark
      (1L, "b0 b1 b2 " + words(20, "u"), "s0"), // shares "b0 b1 b2" → contaminated
      (2L, words(25, "x"), "s0"),               // no stopwords → lang
      (3L, words(25, "x"), "s0"),               // same text, higher id → exact_dup
      (4L, "t0 t1 t2", "s0"),                   // 3 tokens → too_short
      (5L, en, "s0")))                          // English, distinct, clean → kept
    val out = TextQueries.curationPipeline(Tables(spark, dir)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(0L -> "benchmark", 1L -> "contaminated", 2L -> "lang",
      3L -> "exact_dup", 4L -> "too_short", 5L -> "kept"), out)
  }

  test("budget fill breaks quality ties by doc_id and excludes empty docs") {
    val dir = docsDir(Seq(
      (5L, "t t t", "s0"), (6L, "t t t", "s0"), // identical quality
      (7L, "", "s0")))                          // token-less: excluded
    val out = TextQueries.budgetFill(Tables(spark, dir), budget = 3).collect()
      .map(r => (r.getLong(0), r.getLong(4)))
    assert(out.toSeq == Seq((5L, 3L)))  // lower doc_id wins the tie slot
  }
}
