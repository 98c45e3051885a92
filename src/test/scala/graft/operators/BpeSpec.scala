package graft.operators

import graft.SparkSpec
import graft.core.Tables
import java.nio.file.Files

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(texts: Seq[String]): String = {
    val dir = Files.createTempDirectory("bpe").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("learn recovers hand-computed merges with pinned tie-breaks") {
    // corpus: "abab abab cd" ×3 + "ab cd"
    //   word counts: abab→6, cd→4, ab→1
    //   pairs round 1: (a,b)=6*2+1=13, (b,a)=6, (c,d)=4 → merge (a,b)
    //   round 2: words abab→[ab,ab], pairs: (ab,ab)=6, (c,d)=4 → (ab,ab)
    //   round 3: only (c,d)=4 remains
    val dir = docsDir(Seq.fill(3)("abab abab cd") :+ "ab cd")
    val docs = Tables(spark, dir).documents
    val merges = Bpe.learn(docs, numMerges = 3)
    assert(merges == Seq(("a", "b"), ("ab", "ab"), ("c", "d")))
    // exhaustion: after (a,b),(ab,ab),(c,d) every word is one symbol —
    // asking for more merges stops cleanly at 3
    assert(Bpe.learn(docs, numMerges = 10).size == 3)
  }

  test("ties break lexicographically, deterministically") {
    // "ab" and "cd" both appear exactly twice → equal (a,b)/(c,d)
    // counts; (a,b) < (c,d) lexicographically
    val dir = docsDir(Seq("ab cd", "ab cd"))
    val merges = Bpe.learn(Tables(spark, dir).documents, numMerges = 1)
    assert(merges == Seq(("a", "b")))
  }

  test("encodeWord applies merges greedily left-to-right") {
    val merges = Seq(("a", "b"), ("ab", "ab"))
    assert(Bpe.encodeWord("ababab", merges).toSeq == Seq("abab", "ab"))
    assert(Bpe.encodeWord("ba", merges).toSeq == Seq("b", "a"))
    assert(Bpe.encodeWord("a", merges).toSeq == Seq("a"))
  }

  test("tokenize counts BPE tokens per document with the learned table") {
    val dir = docsDir(Seq("abab cd", "zz"))
    val docs = Tables(spark, dir).documents
    val merges = Seq(("a", "b"), ("ab", "ab"), ("c", "d"))
    val out = Bpe.tokenize(docs, merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // "abab cd" → [abab] [cd] = 2 tokens, 2 types; "zz" → [z, z] = 2 tokens 1 type
    assert(out == Map(0L -> ((2L, 2L)), 1L -> ((2L, 1L))))
  }

  test("maxWords truncation suppresses the oracle but keeps tokenize correct") {
    // 4 distinct words, maxWords=2 → vocab truncated to the top 2
    val dir = docsDir(Seq("aa aa bb cc", "aa bb dd"))
    val docs = Tables(spark, dir).documents
    val merges = Bpe.learn(docs, numMerges = 2, maxWords = 2)
    // learning still works on the truncated vocab (aa→6... counts: aa=3,
    // bb=2 survive; (a,a) from aa×3 wins round 1, then (b,b))
    assert(merges == Seq(("a", "a"), ("b", "b")))
    // the truncated training emits NO oracle: its literal encoding table
    // misses cc/dd, so the SQL would undercount a correct engine's rows —
    // the gate must fall back to the driver's rows-only check
    assert(Bpe.oracleFor(numMerges = 2, maxWords = 2).isEmpty)
    // an untruncated training at another key still emits one (the guard
    // is per-key, not global)
    Bpe.learn(docs, numMerges = 2, maxWords = 100)
    assert(Bpe.oracleFor(numMerges = 2, maxWords = 100).isDefined)
    // and the rows-only fallback is still CORRECT: tokenize with the
    // truncated merges covers every word, including out-of-vocab ones
    val out = Bpe.tokenize(docs, merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc0 "aa aa bb cc": [aa][aa][bb][c,c] = 5 tokens, 3 types
    // doc1 "aa bb dd":    [aa][bb][d,d]     = 4 tokens, 3 types
    assert(out == Map(0L -> ((5L, 3L)), 1L -> ((4L, 3L))))
  }

  test("more merges never increase the token count (compression monotonicity)") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val m20 = Bpe.learn(t.documents, numMerges = 20)
    val n0 = Bpe.tokenize(t.documents, Seq.empty)
      .agg(org.apache.spark.sql.functions.sum("n_bpe")).collect()(0).getLong(0)
    val n20 = Bpe.tokenize(t.documents, m20)
      .agg(org.apache.spark.sql.functions.sum("n_bpe")).collect()(0).getLong(0)
    assert(n20 < n0, s"20 merges: $n20 tokens vs char-level $n0")
    // determinism across runs
    assert(Bpe.learn(t.documents, numMerges = 20) == m20)
  }
}
