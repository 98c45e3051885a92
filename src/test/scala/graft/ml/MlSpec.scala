package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val expr = Seq(
    ("s1", "AAA", "G1", 5L), ("s1", "AAA", "G2", 5L),
    ("s1", "BBB", "G1", 10L), ("s1", "BBB", "G3", 30L),
    ("s1", "CCC", "G3", 1L),
  ).toDF("sample", "barcode", "gene", "count")

  test("logNormalize golden: log1p(count/total*1e4)") {
    val n = Normalize.logNormalize(expr).collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getAs[Double]("norm")).toMap
    assert(math.abs(n(("AAA", "G1")) - math.log1p(5.0 / 10 * 1e4)) < 1e-12)
    assert(math.abs(n(("BBB", "G3")) - math.log1p(30.0 / 40 * 1e4)) < 1e-12)
    assert(math.abs(n(("CCC", "G3")) - math.log1p(1.0 * 1e4)) < 1e-12)
  }

  test("geneStats includes implicit zeros (n = 3 cells)") {
    val s = Hvg.geneStats(expr, nCells = 3).collect()
      .map(r => r.getString(0) -> ((r.getAs[Double]("mean"), r.getAs[Double]("variance")))).toMap
    // G1: values (5, 10, 0): mean 5, var ((25+100) - 3*25)/2 = 25
    assert(math.abs(s("G1")._1 - 5.0) < 1e-12)
    assert(math.abs(s("G1")._2 - 25.0) < 1e-12)
    // G2: (5, 0, 0): mean 5/3, var (25 - 25/3)/2 = 25/3
    assert(math.abs(s("G2")._1 - 5.0 / 3) < 1e-12)
    assert(math.abs(s("G2")._2 - 25.0 / 3) < 1e-12)
  }

  test("loess reproduces a straight line exactly") {
    val xs = (1 to 50).map(_.toDouble).toArray
    val ys = xs.map(x => 2.0 * x + 1.0)
    val f = Loess.fit(xs, ys, span = 0.4)
    xs.indices.foreach(i => assert(math.abs(f(i) - ys(i)) < 1e-8))
  }

  test("selectHvg ranks the over-dispersed gene first") {
    // G_hi: huge variance relative to mean; G_a..G_f: Poisson-ish
    val rows = (0 until 40).flatMap { c =>
      val base = Seq.tabulate(6)(g => ("s1", s"c$c", s"G_$g", (g + 2 + c % 3).toLong))
      val hi = if (c % 10 == 0) Seq(("s1", s"c$c", "G_hi", 500L))
               else Seq(("s1", s"c$c", "G_hi", 1L))
      base ++ hi
    }.toDF("sample", "barcode", "gene", "count")
    val hvg = Hvg.selectHvg(rows, nCells = 40, numGenes = 3)
    val top = hvg.orderBy("hvg_rank").collect().map(_.getString(0))
    assert(top.head == "G_hi")
    assert(Hvg.ordinals(hvg).collect().map(_.getAs[Int]("gene_ord")).sorted.sameElements(0 until 3))
  }

  test("scaleData: zero-corrected moments, clipped z, z0") {
    val norm = Seq(
      ("s1", "AAA", "G1", 3.0), ("s1", "BBB", "G1", 6.0),
    ).toDF("sample", "barcode", "gene", "norm")
    val m = Scale.geneMoments(norm, nCells = 3).collect()(0)
    // values (3, 6, 0): mu = 3, var = (45 - 27)/2 = 9, sigma = 3
    assert(math.abs(m.getAs[Double]("mu") - 3.0) < 1e-12)
    assert(math.abs(m.getAs[Double]("sigma") - 3.0) < 1e-12)
    val z = Scale.scaleData(norm, Scale.geneMoments(norm, 3)).collect()
      .map(r => r.getAs[Double]("norm") -> r.getAs[Double]("z")).toMap
    assert(math.abs(z(3.0) - 0.0) < 1e-12)
    assert(math.abs(z(6.0) - 1.0) < 1e-12)
    val z0 = Scale.zeroZ(Scale.geneMoments(norm, 3)).collect()(0).getAs[Double]("z0")
    assert(math.abs(z0 - (-1.0)) < 1e-12)
  }

  test("PCA finds the dominant direction and keeps cell keys") {
    val ts = Seq(-2.5, -1.5, -0.5, 0.5, 1.5, 2.5)
    val scaled = ts.zipWithIndex.flatMap { case (t, c) =>
      Seq((c.toLong, 0, t), (c.toLong, 1, 2 * t), (c.toLong, 2, 0.0))
    }.toDF("cells_id", "gene_ord", "z")
    val (emb, varExp) = Pca.fit(scaled, zeroZByOrd = Array(0.0, 0.0, 0.0), k = 3)
    assert(varExp.head > 0.99)
    val rows = emb.collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Long]("cells_id")).sorted.sameElements(0L until 6L))
    // PC1 scores are an affine image of t: spacing between consecutive
    // cells is constant and non-zero
    val p1 = rows.sortBy(_.getAs[Long]("cells_id")).map(_.getSeq[Double](1).head)
    val gaps = p1.zip(p1.tail).map { case (a, b) => b - a }
    assert(gaps.forall(g => math.abs(math.abs(g) - math.abs(gaps.head)) < 1e-6))
    assert(math.abs(gaps.head) > 0.1)
  }
}
