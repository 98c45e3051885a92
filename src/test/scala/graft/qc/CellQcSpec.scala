package graft.qc

import graft.SparkSpec
import graft.operators.Stats
import org.apache.spark.sql.functions._

class CellQcSpec extends SparkSpec {
  import spark.implicits._

  // fixture matching MtxSpec: 4 genes (2 mito) × 3 cells
  private lazy val expr = Seq(
    ("s1", "AAA", "ENSG1", 5L), ("s1", "AAA", "ENSG2", 5L),
    ("s1", "BBB", "ENSG1", 10L), ("s1", "BBB", "ENSG3", 20L),
    ("s1", "BBB", "ENSG4", 10L), ("s1", "CCC", "ENSG3", 1L),
  ).toDF("sample", "barcode", "gene", "count")

  private lazy val genes = Seq(
    ("ENSG1", "GeneA"), ("ENSG2", "MT-CO1"),
    ("ENSG3", "GeneB"), ("ENSG4", "mt-nd1"),
  ).toDF("input", "name")

  test("mito set matches ^mt- case-insensitively (3_Seurat.r:69)") {
    val mt = CellQc.mitoGenes(genes).collect().map(_.getString(0)).toSet
    assert(mt == Set("ENSG2", "ENSG4"))
  }

  test("cellMetrics: nCount/nFeature/percent_mt golden values") {
    val m = CellQc.cellMetrics(expr, genes).collect()
      .map(r => r.getAs[String]("barcode") ->
        ((r.getAs[Long]("nCount"), r.getAs[Long]("nFeature"), r.getAs[Double]("percent_mt"))))
      .toMap
    assert(m("AAA") == ((10L, 2L, 50.0)))
    assert(m("BBB") == ((40L, 3L, 25.0)))
    assert(m("CCC") == ((1L, 1L, 0.0)))
  }

  test("degreeFilter trims genes first, then cells (Seurat order)") {
    // minCells=2: keep ENSG1 (AAA,BBB), ENSG3 (BBB,CCC)
    // then minFeatures=2 over trimmed genes: only BBB (ENSG1+ENSG3)
    val kept = CellQc.degreeFilter(expr, minCells = 2, minFeatures = 2)
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(kept == Set(("BBB", "ENSG1"), ("BBB", "ENSG3")))
  }

  test("knee threshold lands on the cliff of the rank curve") {
    val counts = (Seq(10000L, 9500L, 9000L, 8500L, 8000L) ++
      Seq(200L, 190L, 180L, 170L, 160L)).zipWithIndex.map {
      case (c, i) => ("s1", f"BC$i%02d", c)
    }.toDF("sample", "barcode", "nCount")
    val t = Knee.thresholds(counts, thresholdLow = 100).collect()
    assert(t.length == 1)
    assert(t(0).getAs[Long]("minCellSize") == 200L)
  }

  test("bhAdjust matches R p.adjust(method='BH') golden values") {
    val df = Seq(
      ("a", Some(0.005)), ("b", Some(0.009)), ("c", Some(0.05)),
      ("d", Some(0.5)), ("e", None: Option[Double]),
    ).toDF("id", "p")
    val adj = Stats.bhAdjust(df, "p", "p_adj").collect()
      .map(r => r.getAs[String]("id") -> Option(r.getAs[java.lang.Double]("p_adj"))).toMap
    assert(math.abs(adj("a").get - 0.018) < 1e-12)
    assert(math.abs(adj("b").get - 0.018) < 1e-12)
    assert(math.abs(adj("c").get - 0.05 * 4 / 3) < 1e-12)
    assert(math.abs(adj("d").get - 0.5) < 1e-12)
    assert(adj("e").isEmpty)
  }

  test("bhAdjust ties collapse to the same adjusted value") {
    val df = (1 to 5).map(i => (s"r$i", 0.01 * i)).toDF("id", "p")
    val adj = Stats.bhAdjust(df, "p", "p_adj").collect()
      .map(_.getAs[Double]("p_adj"))
    adj.foreach(v => assert(math.abs(v - 0.05) < 1e-12))
  }
}
