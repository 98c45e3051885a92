package graft.operators

import graft.SparkSpec
import graft.core.Tables
import java.nio.file.Files

/** Round-8 specs: the x21 fingerprint collapse (SOAK_corpus.md).
  * `dupClusters` no longer consumes the materialized x13 pair list
  * (quadratic in fingerprint duplicity — 2.86e9 in-bucket candidates
  * at 500k docs); it collapses to distinct fingerprints and runs CC
  * over member→rep stars + rep–rep banded pairs. These pin the
  * component-equivalence and edge-linearity properties the 500k soak
  * verified at scale. */
class Round8Spec extends SparkSpec {
  import spark.implicits._

  /** documents table with heavy duplicity: `copies` bag-identical
    * variants (token rotations — same bag, same simhash) of each of
    * `base` distinct docs, plus a few singletons. */
  private def dupDir(base: Int, copies: Int): String = {
    val dir = Files.createTempDirectory("r8docs").toString
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val rows = (0 until base).flatMap { d =>
      val toks = (0 until 8).map(i => words((d * 3 + i * 2) % words.length))
      (0 until copies).map { c =>
        val rotated = toks.drop(c % toks.length) ++ toks.take(c % toks.length)
        ((d * copies + c).toLong, rotated.mkString(" "))
      }
    } ++ (0 until 5).map(i =>
      ((base * copies + i).toLong, s"single unique doc number$i payload"))
    rows.map { case (id, text) => (id, text, "en", "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dupClusters matches union-find over the FULL x13 pair list under heavy duplicity") {
    val t = Tables(spark, dupDir(base = 6, copies = 7))
    // ground truth: union-find over every verified ham<=6 pair (the
    // pre-collapse edge semantics, C(g,2) twin pairs included)
    val pairs = TextQueries.simhashPairs(t)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r); r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b); if (ra != rb) parent(ra) = rb
    }
    val minOf = scala.collection.mutable.HashMap.empty[Long, Long]
    parent.keys.foreach { v =>
      val r = find(v); minOf(r) = math.min(minOf.getOrElse(r, v), v)
    }
    val expected = parent.keys.map(v => v -> minOf(find(v))).toMap

    val got = TextQueries.dupClusters(t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"collapse changed components: got ${got.size} labeled vs ${expected.size}")
  }

  test("collapsed edge list is linear in duplicity, pair list is quadratic") {
    val t = Tables(spark, dupDir(base = 4, copies = 10))
    val sims = TextQueries.simhashDf(t.documents)
    val edges = TextQueries.dupEdges(sims).count()
    val pairs = TextQueries.simhashPairs(t).count()
    // 4 groups of 10 twins: pair list >= 4*C(10,2) = 180; collapsed
    // edges ~ 4*(10-1) member->rep + a few rep-rep = tens
    assert(pairs >= 180, s"pair list $pairs")
    assert(edges <= 50, s"collapsed edges $edges not linear")
  }

  // ---- round-8 additions: x31 / x32 / x33 --------------------------------

  test("x31 bloom path is row-identical to x26 and plans bloom prefilter + shuffle verify") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val exact = TextQueries.decontaminate(t).collect().toSeq
    val viaBloom = TextQueries.bloomDecontaminate(t)
    assert(viaBloom.collect().toSeq == exact)
    val plan = viaBloom.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"),
      "bloom prefilter missing from the physical plan")
    assert(plan.contains("ShuffledHashJoin"),
      "exact verify join must stay a shuffle join (the non-broadcastable-bench path)")
  }

  test("x31 false positives die in the exact verify even at a sieve-like fpp") {
    // fpp 0.5: roughly half the clean shingles survive the prefilter —
    // the verify join must still produce the exact x26 answer
    val t = Tables(spark, "/root/testdata/sf0.001")
    val exact = TextQueries.decontaminate(t).collect().toSeq
    assert(TextQueries.bloomDecontaminate(t, fpp = 0.5).collect().toSeq == exact)
  }

  test("x32 bm25 matches a hand-computed score and plans a TakeOrdered top-k") {
    // 3 docs, query terms 'spark' and 'window' (from the gate set)
    val dir = Files.createTempDirectory("r8bm25").toString
    val docs = Seq(
      (0L, "spark spark window alpha beta"),   // tf(spark)=2 tf(window)=1 dl=5
      (1L, "spark gamma delta eps zeta eta"),  // tf(spark)=1 dl=6
      (2L, "alpha beta gamma delta"))          // no query terms, dl=4
      .map { case (id, tx) => (id, tx, "en", "s0", tx.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.bm25TopK(Tables(spark, dir)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def idf(df: Int) = math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
    val avgdl = 5.0 // (5 + 6 + 4) / 3
    def term(tf: Long, dl: Long, df: Int) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val exp0 = BigDecimal(term(2, 5, 2) + term(1, 5, 1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp1 = BigDecimal(term(1, 6, 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == Set(0L, 1L), s"docs without query terms must not score: $got")
    assert(math.abs(got(0L) - exp0) < 2e-6 && math.abs(got(1L) - exp1) < 2e-6,
      s"got $got expected ($exp0, $exp1)")
    val plan = TextQueries.bm25TopK(Tables(spark, dir))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "top-k must be TakeOrdered, not sort+window")
  }

  test("x33 flags exactly the planted later-id twins, first-id survives") {
    val dir = Files.createTempDirectory("r8sem").toString
    val dim = 16
    def oneHot(i: Int): Array[Float] =
      Array.tabulate(dim)(j => if (j == i % dim) 1.0f else 0.0f)
    // 12 orthogonal base vectors (ids 0..11) + an identical twin of
    // each (ids 100..111): twins land in the base's cell whatever the
    // quantizer does, bases are pairwise cos=0 < threshold
    val rows = (0 until 12).map(i => (i.toLong, oneHot(i), "base")) ++
      (0 until 12).map(i => ((100 + i).toLong, oneHot(i), "twin"))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.semanticDedup(Tables(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getBoolean(3),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toList
    val dups = got.filter(_._2).map(_._1).toSet
    assert(dups == (100L until 112L).toSet,
      s"expected exactly the twins flagged, got $dups")
    got.filter(_._2).foreach { case (id, _, pc) =>
      assert(math.abs(pc - 1.0) < 1e-9, s"twin $id prior_cos $pc != 1") }
  }
}
