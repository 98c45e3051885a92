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
}
