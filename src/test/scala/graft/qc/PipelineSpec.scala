package graft.qc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dataIntegration → configureEmbedding over a two-population matrix:
  * the full downstream analytics path on Experiment handles. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val (expr, cells) = {
    // 24 cells, two expression programs of 8 genes each + 4 shared genes
    val rows = (0 until 24).flatMap { c =>
      val program = if (c < 12) "gA" else "gB"
      val own = (0 until 8).map(g => (s"s1", f"c$c%02d", s"$program$g", 30L + (c % 4) * 2))
      val shared = (0 until 4).map(g => (s"s1", f"c$c%02d", s"gS$g", 5L + c % 3))
      own ++ shared
    }
    val e = rows.toDF("sample", "barcode", "gene", "count")
    val c = graft.operators.MergeSamples.withCellsId(
      e.select("sample", "barcode").distinct())
    (e, c)
  }

  test("dataIntegration: PCA separates the two programs") {
    val red = DataIntegration.run(expr, cells, numHvg = 20, numPcs = 5)
    assert(red.varianceExplained.head > 0.5)
    assert(red.hvg.count() > 0)
    val pc1 = red.pca.join(cells, "cells_id")
      .select("barcode", "pc").collect()
      .map(r => r.getAs[String]("barcode") -> r.getSeq[Double](1).head)
    val (a, b) = pc1.partition(_._1 < "c12")
    val (ma, mb) = (a.map(_._2).sum / a.length, b.map(_._2).sum / b.length)
    // the two programs land on opposite sides of PC1
    assert(a.forall(p => math.abs(p._2 - ma) < math.abs(p._2 - mb)))
    assert(b.forall(p => math.abs(p._2 - mb) < math.abs(p._2 - ma)))
  }

  test("configureEmbedding: louvain + umap recover the two programs") {
    val red = DataIntegration.run(expr, cells, numHvg = 20, numPcs = 5)
    val emb = ConfigureEmbedding.run(red.pca, numPCs = 5, k = 8, umapEpochs = 50)
    val byCluster = emb.clusters.join(cells, "cells_id")
      .select("barcode", "cluster").collect()
      .groupBy(_.getAs[Long]("cluster"))
      .view.mapValues(_.map(_.getAs[String]("barcode")).toSet).toMap
    assert(byCluster.size == 2, s"got clusters: $byCluster")
    assert(byCluster.values.toSet ==
      Set((0 until 12).map(c => f"c$c%02d").toSet,
        (12 until 24).map(c => f"c$c%02d").toSet))
    assert(emb.umap.count() == 24)
  }
}
