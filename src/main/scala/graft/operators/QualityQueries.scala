package graft.operators

import graft.core.Tables
import graft.ml.QualityClassifier
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gate registry for the model-based quality filter (x45) — the
  * fastText-style classifier of [[graft.ml.QualityClassifier]], the
  * third quality-signal family beside the heuristic rules (x10/x37)
  * and the bigram-LM perplexity (x39/x40).
  *
  * Oracle strategy (the x14/x22 learned-state pattern): the gate query
  * trains the GATE-parameter model and snapshots it; [[oracles]] is a
  * `def` that — once that snapshot exists, i.e. after Verify has run
  * the queries — emits DuckDB SQL with the learned weights embedded as
  * a literal `(bucket, wt)` table, reproducing the ENTIRE scoring
  * pipeline (tokenize → hash-bucket → L1 tf → dot → sigmoid) in SQL.
  * The training itself (driver-side deterministic GD) is thereby
  * hash-checked end-to-end: a single weight off by 1 ulp flips the
  * rounded probabilities. Weight literals use `Double.toString`
  * (shortest round-trip form), which DuckDB parses back to the
  * identical IEEE double.
  */
object QualityQueries {

  /** Gate parameters. Buckets is 1024 (not the 4096 production
    * default) purely to bound the embedded oracle weight table; the
    * hashing-trick semantics are identical. */
  private[operators] val GateBuckets = 1024
  private[operators] val GateIters = 200
  private[operators] val GateLr = 2.0
  private[operators] val GateL2 = 1e-6
  private[operators] val GateMaxTrain = 20000
  private[operators] val GateSeed = 42L

  /** The curated positive slice — the same in-domain source x36 (DSIR)
    * and x39 (LM) treat as target. */
  private[operators] val GatePositive = "src0"

  private final case class GateKey(buckets: Int, iters: Int, lr: Double,
                                   l2: Double, maxTrain: Int, seed: Long)
  private val snaps =
    new java.util.concurrent.ConcurrentHashMap[GateKey, QualityClassifier.Model]()
  private def gateKey =
    GateKey(GateBuckets, GateIters, GateLr, GateL2, GateMaxTrain, GateSeed)

  /** x45: train on (source = src0) vs rest, score every document.
    * Output `(doc_id, quality_prob)` rounded to 6 dp, doc-id ordered
    * (oracle-mandated global order, post-reduction size = |docs|). */
  def classifierQuality(t: Tables): DataFrame = {
    val m = QualityClassifier.train(
      t.documents, col("source") === GatePositive,
      buckets = GateBuckets, iters = GateIters, lr = GateLr, l2 = GateL2,
      maxTrain = GateMaxTrain, seed = GateSeed)
    snaps.put(gateKey, m)
    QualityClassifier.score(t.documents, m)
      .select(col("doc_id"),
        round(col("quality_prob"), 6).as("quality_prob"))
      .orderBy("doc_id")
  }

  val all: Seq[(String, Tables => DataFrame)] = Seq(
    "x45_quality_classifier" -> (t => classifierQuality(t)))

  /** DuckDB mirror of [[QualityClassifier.score]] for the trained gate
    * model. Emitted only once the gate training has run (Verify runs
    * every query before dumping oracle_sql.json, so the SQL reflects
    * exactly that run's weights). */
  def oracles: Map[String, String] =
    Option(snaps.get(gateKey)).map("x45_quality_classifier" -> sqlFor(_)).toMap

  private[graft] def sqlFor(m: QualityClassifier.Model): String = {
    val rows = (m.weights.zipWithIndex.collect {
      case (w, j) if w != 0.0 =>
        s"(CAST($j AS BIGINT), CAST(${java.lang.Double.toString(w)} AS DOUBLE))"
    }).mkString(", ")
    val toksSql = "list_filter(string_split(text, ' '), x -> x <> '')"
    s"""
      WITH w(bucket, wt) AS (VALUES $rows),
      toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
      tok AS (SELECT doc_id, len(tk) AS n_toks, unnest(tk) AS tok FROM toks),
      tf AS (SELECT doc_id, n_toks,
               CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % ${m.buckets} AS bucket,
               CAST(COUNT(*) AS DOUBLE) / n_toks AS v
             FROM tok GROUP BY doc_id, n_toks, bucket),
      dots AS (SELECT tf.doc_id,
                 SUM(CAST(ROUND(COALESCE(w.wt, 0.0) * tf.v, 9)
                   AS DECIMAL(28,9))) AS dot
               FROM tf LEFT JOIN w ON w.bucket = tf.bucket
               GROUP BY tf.doc_id)
      SELECT d.doc_id,
        ROUND(1.0 / (1.0 + exp(-(COALESCE(CAST(dots.dot AS DOUBLE), 0.0) + ${java.lang.Double.toString(m.bias)}))), 6) AS quality_prob
      FROM documents d LEFT JOIN dots ON dots.doc_id = d.doc_id
      ORDER BY d.doc_id"""
  }
}
