package graft.operators

import graft.SparkSpec
import graft.core.Tables
import java.nio.file.Files

/** Round-6 constant-factor guards: the composed pipelines (x19/x30)
  * must tokenize the corpus ONCE (a persisted token table feeds every
  * branch), and x26's benchmark broadcast must survive a 10x corpus
  * blowup (its design premise is a bounded eval side however large the
  * corpus grows). */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("r6docs").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Final adaptive plan (the section that actually ran). */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  /** Structural cache-sharing check on the OPTIMIZED LOGICAL plan.
    * (The first cut counted "FileScan"/"InMemoryRelation" occurrences
    * in the AQE final physical plan — but AQE's stage-reuse decisions
    * are completion-order-dependent, so those render counts can
    * legitimately differ run to run. Cache substitution happens before
    * optimization and is deterministic: every documents read must
    * appear as an InMemoryRelation leaf, never a direct
    * LogicalRelation, and the tokenizer expression must live only
    * inside the cache-build plan.) */
  private def assertAllReadsCached(df: org.apache.spark.sql.DataFrame,
                                   minConsumers: Int): Unit = {
    df.collect()
    val opt = df.queryExecution.optimizedPlan
    val direct = opt.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(direct.isEmpty,
      s"direct parquet scan outside the token cache: ${direct.mkString("; ")}")
    val caches = opt.collect {
      case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m
    }
    assert(caches.size >= minConsumers,
      s"expected >= $minConsumers cache consumers, saw ${caches.size}")
    val splits = opt.flatMap(_.expressions.flatMap(_.collect {
      case s: org.apache.spark.sql.catalyst.expressions.StringSplit => s
    }))
    assert(splits.isEmpty,
      s"tokenization outside the cache build: ${splits.mkString("; ")}")
  }

  test("x30: every branch reads the ONE persisted tokenization, no direct rescans") {
    spark.catalog.clearCache()
    val dir = docsDir((0L until 200L).map(i =>
      (i, s"the quick brown fox ${i % 7} jumps over dog $i end", s"s${i % 3}")) ++
      // a near-dup cluster so the LSH branch has work at runtime
      (900L until 905L).map(i => (i, "alpha beta gamma delta epsilon zeta", "s9")))
    assertAllReadsCached(TextQueries.curationPipeline(Tables(spark, dir)), 4)
    spark.catalog.clearCache()
  }

  test("x19: corpus filter shares the tokenization the same way") {
    spark.catalog.clearCache()
    val dir = docsDir((0L until 150L).map(i =>
      (i, s"pack my box with ${i % 5} dozen liquor jugs $i", s"s${i % 2}")))
    assertAllReadsCached(TextQueries.corpusFilter(Tables(spark, dir)), 3)
    spark.catalog.clearCache()
  }

  test("x26: benchmark side still broadcast at a 10x corpus blowup") {
    // the x26 design premise: eval suites are bounded (thousands of
    // docs) no matter how big the corpus — the contamination join must
    // stay a broadcast of the benchmark shingle set, never a
    // corpus-vs-corpus SortMergeJoin. Grow the corpus 10x over the
    // Round5Spec fixture scale and assert the plan holds.
    spark.catalog.clearCache()
    val dir = docsDir((0L until 20000L).map(i =>
      (i, s"w${i % 13} w${(i / 2) % 17} w${i % 5} w${i % 7} tail$i", s"s${i % 4}")))
    val df = TextQueries.decontaminate(Tables(spark, dir))
    val p = finalPlan(df)
    val hsJoin = p.split("\n")
      .filter(l => l.contains("Join") && l.contains("hs#"))
    assert(hsJoin.nonEmpty && hsJoin.forall(_.contains("BroadcastHashJoin")),
      s"contamination probe lost its broadcast:\n${hsJoin.mkString("\n")}\n${p.take(2000)}")
    spark.catalog.clearCache()
  }
}
