package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Round-9 additions: the build-once [[TextQueries.DedupIndex]]
  * (buildDedupIndex / deltaDedupAgainst / absorbDelta) — the
  * production shape of x42 where the standing corpus is fingerprinted
  * and banded ONCE and every ingest batch queries the materialized
  * artifact (the buildIvfIndex pattern, prescribed by the r8 verdict:
  * the gate form rebuilt the corpus side on every delta). */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    rows.map { case (id, text) => (id, text, "en", "s1", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private val base = (1 to 60).map(i => s"base$i").mkString(" ")
  private val baseNear = (1 to 59).map(i => s"base$i").mkString(" ") + " mutated"
  private val other = (1 to 50).map(i => s"other$i").mkString(" ")
  private val fresh1 = (1 to 60).map(i => s"fresh$i").mkString(" ")
  private val fresh1Near = (1 to 59).map(i => s"fresh$i").mkString(" ") + " tweaked"
  private val fresh2 = (1 to 45).map(i => s"solo$i").mkString(" ")

  private val corpus = docs(Seq(1L -> base, 2L -> other))
  private val batch1 = docs(Seq(
    10L -> s"  $base  ", // exact dup of corpus 1 (fingerprint folds ws)
    11L -> fresh1,       // new
    12L -> fresh1))      // exact dup within the delta
  private val batch2 = docs(Seq(
    20L -> base,         // exact dup of corpus 1 (via the ORIGINAL index entry)
    21L -> fresh1,       // exact dup of absorbed batch-1 doc 11
    22L -> fresh1Near,   // near dup of absorbed batch-1 doc 11
    23L -> baseNear,     // near dup of corpus 1
    24L -> fresh2))      // new

  private def statuses(df: DataFrame): Map[Long, (String, Long)] =
    df.collect().map(r => r.getLong(0) ->
      ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap

  test("x42 index: batch-2 against the absorbed index = from-scratch rebuild, survivors stable") {
    val idx0 = TextQueries.buildDedupIndex(corpus)
    val s1 = statuses(TextQueries.deltaDedupAgainst(idx0, batch1))
    assert(s1(10L) == (("exact_dup_corpus", 1L)), s1)
    assert(s1(11L) == (("new", -1L)), s1)
    assert(s1(12L) == (("exact_dup_delta", 11L)), s1)

    val idx1 = TextQueries.absorbDelta(idx0, batch1)
    val s2 = statuses(TextQueries.deltaDedupAgainst(idx1, batch2))
    // survivors point at the FIRST occurrence ever ingested: corpus 1
    // for the base text (not batch-1's 10), batch-1's 11 for fresh1
    assert(s2(20L) == (("exact_dup_corpus", 1L)), s2)
    assert(s2(21L) == (("exact_dup_corpus", 11L)), s2)
    assert(s2(22L) == (("near_dup_corpus", 11L)), s2)
    assert(s2(23L) == (("near_dup_corpus", 1L)), s2)
    assert(s2(24L) == (("new", -1L)), s2)

    // the incremental index answers batch 2 identically to a
    // from-scratch rebuild over corpus+batch1 (the append-only-id case)
    val scratch = TextQueries.buildDedupIndex(corpus.union(batch1))
    assert(statuses(TextQueries.deltaDedupAgainst(scratch, batch2)) == s2)
    scratch.release(); idx1.release(); idx0.release()
  }

  test("x42 index: batch queries consume the cached artifact — no corpus re-fingerprint") {
    val idx = TextQueries.buildDedupIndex(corpus)
    idx.fp.count(); idx.bands.count() // materialize the build
    val q = TextQueries.deltaDedupAgainst(idx, batch2)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan"), p.take(3000))
    idx.release()
  }

  test("x59: media bytes -> features -> IVF -> top-k, end-to-end on the fixture") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val df = Similarity.mediaIvfTopK(t)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // query batch is every 10th media item; ranks are 1..5 per query
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet.forall(_ % 10 == 0))
    byQ.values.foreach { rs =>
      val rks = rs.map(_.getLong(3)).sorted
      assert(rks.head == 1L && rks.length <= 5 && rks.last == rks.length)
    }
    // byte-histogram features are non-negative: cosines in [0, 1]
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= 0.0 && c <= 1.0 + 1e-9, r.toString)
    }
    // neighbors never include the query itself
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("x30 staged: byte-identical statuses to the one-query form") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val t = graft.core.Tables(spark, s"/root/testdata/$sf")
      val plain = TextQueries.curationPipeline(t).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val staged = TextQueries.curationPipelineStaged(t).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(staged.sameElements(plain), s"$sf diverged")
    }
  }

  test("x60: PQ-ADC top-k — shape, determinism, recall above the PQ floor") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val rows = Similarity.pqAdcTopK(t).collect()
    // 10 queries x 10 ranks, contiguous ranks, never the query itself
    assert(rows.length == 100)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(3)).sorted.sameElements(1L to 10L))
    }
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    // cosine of a reconstruction is still a cosine
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    // deterministic end-to-end (seeded sample, seeded per-subspace
    // k-means, decimal ADC fold): a second full run is identical
    val again = Similarity.pqAdcTopK(t).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
    // recall@10 vs the exact scan: i.i.d. random vectors are PQ's
    // worst case (no subspace cluster structure), measured 0.21 at
    // sf0.001 / 0.24 at sf0.01 against a 10/499 ≈ 0.02 random
    // baseline; the floor asserts the ADC ranking carries real signal
    val bf = Similarity.bruteForceTopK(t).select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & got).size.toDouble / bf.size
    assert(recall >= 0.12, f"recall@10 = $recall%.3f")
    // empty corpus → empty frame with the declared schema (no crash)
    val dir = java.nio.file.Files.createTempDirectory("x60empty").toString
    t.embeddings.filter(org.apache.spark.sql.functions.lit(false))
      .write.parquet(s"$dir/embeddings.parquet")
    val e = Similarity.pqAdcTopK(graft.core.Tables(spark, dir))
    assert(e.columns.toSeq == Seq("qid", "vec_id", "cos_pq", "rk"))
    assert(e.count() == 0)
  }

  test("x42 index: absorb is O(delta) — only unseen fingerprints/sims are appended") {
    val idx0 = TextQueries.buildDedupIndex(corpus)
    val idx1 = TextQueries.absorbDelta(idx0, batch1)
    // batch1 carries one already-known fp (base) and one new fp
    // (fresh1, kept once at id 11): fp table grows by exactly 1
    assert(idx0.fp.count() == 2 && idx1.fp.count() == 3)
    // the new fp's survivor is the delta's first occurrence
    val surv = idx1.fp.filter(!$"corpus_id".isin(1L, 2L)).collect()
    assert(surv.map(_.getAs[Long]("corpus_id")).toSeq == Seq(11L))
    // bands grow by one distinct sim's 4 band rows
    assert(idx1.bands.count() == idx0.bands.count() + 4)
    idx1.release(); idx0.release()
  }
}
