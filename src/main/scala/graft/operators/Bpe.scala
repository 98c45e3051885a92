package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Learned byte-pair encoding over a document corpus — the real
  * tokenizer-training step of a training-data pipeline (Sennrich et
  * al. 2016), beyond the x15 regex approximation of token counts.
  *
  * Scale shape follows how BPE is actually trained on large corpora:
  * the CORPUS-scale work is one distributed word-count (explode +
  * map-side-combined groupBy — the wordcount shuffle); merge learning
  * then iterates on the BOUNDED weighted vocabulary (top `maxWords`
  * types by count, deterministic tie-break), which is orders of
  * magnitude smaller than the corpus — the same driver-on-reduced-data
  * routing as the repo's other kernels. Applying the merges streams
  * over the corpus with the merges table broadcast: linear, no
  * shuffle.
  *
  * Pinned semantics (spec'd): pair counts weight every overlapping
  * adjacent occurrence by word frequency; the best pair is max count
  * with lexicographic (left, right) tie-break; merges apply greedily
  * left-to-right within a word.
  */
object Bpe {

  /** Gate parameters for x22 (the defaults of [[learn]]/[[counts]]). */
  private val GateMerges = 20
  private val GateMaxWords = 50000

  /** Learned-state snapshot keyed by its parameters (the Similarity
    * QuantKey pattern): the generated x22 oracle is built from the
    * GATE key's snapshot specifically, so other trainings cannot
    * clobber it. `truncated` records whether the vocab hit maxWords —
    * if so the literal encoding table would not cover the corpus and
    * no oracle is emitted (falls back to the rows-only check). */
  private[operators] final case class LearnKey(numMerges: Int, maxWords: Int)
  private[operators] final case class LearnSnap(
      merges: Seq[(String, String)], vocab: Seq[String], truncated: Boolean)
  private val snaps =
    new java.util.concurrent.ConcurrentHashMap[LearnKey, LearnSnap]()

  /** Learn `numMerges` merges from the corpus' word counts. */
  def learn(docs: DataFrame, numMerges: Int,
            maxWords: Int = GateMaxWords): Seq[(String, String)] = {
    val vocab = docs
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var words: Array[(Array[String], Long)] =
      vocab.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    for (_ <- 0 until numMerges if !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (mergeOnce(syms, best), c) }
      }
    }
    snaps.put(LearnKey(numMerges, maxWords),
      LearnSnap(merges.toSeq, vocab.map(_._1).toSeq,
        truncated = vocab.length == maxWords))
    merges.toSeq
  }

  /** One greedy left-to-right pass replacing adjacent (a, b) with a+b. */
  private[operators] def mergeOnce(syms: Array[String],
                                   pair: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Encode one word with the ordered merges table. */
  private[operators] def encodeWord(word: String,
                                    merges: Seq[(String, String)]): Array[String] = {
    var syms = word.map(_.toString).toArray
    merges.foreach { m =>
      if (syms.length > 1) syms = mergeOnce(syms, m)
    }
    syms
  }

  /** Tokenize the corpus with a learned merges table: per document,
    * the BPE token count and the count of distinct BPE types. The
    * merges table rides the closure (broadcast by Spark); the pass is
    * one narrow map over documents — no shuffle. A per-partition memo
    * caches word encodings, so each distinct word in a partition is
    * encoded once regardless of frequency. */
  def tokenize(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val sess = docs.sparkSession
    import sess.implicits._
    val ms = merges.toArray
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, text) =>
          val toks = text.split(" ").filter(_.nonEmpty)
          val enc = toks.flatMap(w =>
            memo.getOrElseUpdate(w, encodeWord(w, ms.toSeq)))
          (id, enc.length.toLong, enc.distinct.length.toLong)
        }
      }
      .toDF("doc_id", "n_bpe", "n_types")
      .orderBy("doc_id")
  }

  /** x22 gate: train on the corpus, tokenize the corpus. */
  def counts(t: graft.core.Tables, numMerges: Int = GateMerges): DataFrame =
    tokenize(t.documents, learn(t.documents, numMerges))

  val all: Seq[(String, graft.core.Tables => DataFrame)] = Seq(
    "x22_bpe_learned" -> (t => counts(t)))

  /** Generated x22 oracle (a `def`, the x14 pattern): the learned
    * per-word encodings are emitted as a literal (word, tokens) table,
    * then per-document token and distinct-type counts are reproduced
    * in SQL. Only emitted when the training vocab covered every corpus
    * word (untruncated). */
  def oracles: Map[String, String] =
    oracleFor(GateMerges, GateMaxWords).map("x22_bpe_learned" -> _).toMap

  /** The oracle SQL for one training key, or None when that training
    * never ran or hit the maxWords truncation (a truncated vocab's
    * literal encoding table would not cover the corpus, so emitting an
    * oracle would FAIL a correct engine — suppress it and let the
    * driver's rows-only fallback gate the query instead). */
  private[operators] def oracleFor(numMerges: Int, maxWords: Int): Option[String] = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    Option(snaps.get(LearnKey(numMerges, maxWords)))
      .filterNot(_.truncated)
      .map { s =>
        val rows = s.vocab.map { w =>
          val toks = encodeWord(w, s.merges).map(q).mkString("[", ", ", "]")
          s"(${q(w)}, $toks)"
        }.mkString(", ")
        s"""
      WITH enc(w, toks) AS (SELECT * FROM (VALUES $rows) AS v(w, toks)),
      words AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w FROM documents),
      bt AS (SELECT doc_id, unnest(e.toks) AS tok FROM words JOIN enc e ON e.w = words.w),
      agg AS (SELECT doc_id, COUNT(*) AS n, COUNT(DISTINCT tok) AS t FROM bt GROUP BY doc_id)
      SELECT d.doc_id, CAST(COALESCE(a.n, 0) AS BIGINT) AS n_bpe,
        CAST(COALESCE(a.t, 0) AS BIGINT) AS n_types
      FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
      ORDER BY d.doc_id"""
      }
  }
}
