package graft.ml

import graft.SparkSpec
import graft.core.Tables
import graft.operators.QualityQueries
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Golden specs for the fastText-style quality classifier (x45):
  * bitwise-deterministic training, class separation on a planted
  * corpus, the bias-only path for token-less documents, the broadcast
  * weight join, and the DuckDB-oracle SQL round-trip of the learned
  * weights. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** A corpus where the positive source uses a disjoint content
    * vocabulary — linearly separable, so GD must drive the classes
    * apart. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("qcls").toString
    val good = Seq("theorem", "proof", "lemma", "corollary", "axiom",
      "integral", "manifold", "tensor")
    val bad = Seq("click", "free", "winner", "prize", "casino",
      "pills", "deal", "offer")
    val rows = (0 until 120).map { i =>
      val (voc, src) = if (i % 3 == 0) (good, "src0") else (bad, "srcX")
      val toks = (0 until 12).map(j => voc((i * 5 + j * 7) % voc.length))
      (i.toLong, toks.mkString(" "), "en", src, toks.mkString(" ").length.toLong)
    } :+ (999L, "", "en", "srcX", 0L) // token-less doc
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }
  private def docs = Tables(spark, dir).documents

  private def fit() = QualityClassifier.train(
    docs, col("source") === "src0", buckets = 256, iters = 150,
    maxTrain = 200)

  test("training is bitwise deterministic") {
    val a = fit(); val b = fit()
    assert(a.bias == b.bias)
    assert(java.util.Arrays.equals(a.weights, b.weights))
  }

  test("separates the planted classes and scores token-less docs at the bias") {
    val m = fit()
    val scored = QualityClassifier.score(docs, m)
      .join(docs.select("doc_id", "source", "text"), "doc_id").collect()
    val pos = scored.filter(_.getAs[String]("source") == "src0")
      .map(_.getAs[Double]("quality_prob"))
    val neg = scored.filter(r => r.getAs[String]("source") != "src0" &&
        r.getAs[String]("text").nonEmpty)
      .map(_.getAs[Double]("quality_prob"))
    assert(pos.min > 0.8, s"positives should score high, min=${pos.min}")
    assert(neg.max < 0.2, s"negatives should score low, max=${neg.max}")
    val empty = scored.find(_.getAs[Long]("doc_id") == 999L).get
      .getAs[Double]("quality_prob")
    val sigBias = 1.0 / (1.0 + math.exp(-m.bias))
    assert(math.abs(empty - sigBias) < 1e-12,
      s"token-less doc must score sigmoid(bias)=$sigBias, got $empty")
  }

  test("score plan broadcasts the weight table") {
    val m = fit()
    // AQE wraps the tree (AdaptiveSparkPlanExec), so pin via the plan
    // string (includes the initial plan) — the PlanSpec convention.
    val p = QualityClassifier.score(docs, m)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"weight-table join must be a BroadcastHashJoin, plan:\n${p.take(2000)}")
  }

  test("oracle SQL embeds weights that round-trip to the identical double") {
    val m = fit()
    val sql = QualityQueries.sqlFor(m)
    // every embedded literal parses back (JVM side) to the same bits
    m.weights.filter(_ != 0.0).foreach { w =>
      assert(java.lang.Double.parseDouble(java.lang.Double.toString(w)) == w)
    }
    assert(sql.contains("quality_prob") && sql.contains("ORDER BY d.doc_id"))
  }

  test("gate query returns one row per document, id-ordered") {
    val out = QualityQueries.classifierQuality(Tables(spark, dir)).collect()
    assert(out.length == docs.count())
    assert(out.map(_.getLong(0)).toSeq == out.map(_.getLong(0)).sorted.toSeq)
  }
}
