package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntegrationSpec extends SparkSpec {
  import spark.implicits._

  /** Two batches of the same two populations, batch 2 shifted by a
    * constant vector in PC space — the canonical batch-effect shape. */
  private lazy val (pca, groups) = {
    def pop(base: Array[Double], ids: Range, shift: Array[Double]) =
      ids.map { i =>
        val jitter = Array(0.05 * (i % 5), 0.07 * (i % 3), 0.03 * (i % 2))
        (i.toLong, base.indices.map(d => base(d) + shift(d) + jitter(d)).toArray)
      }
    val batchShift = Array(8.0, -6.0, 4.0)
    val zero = Array(0.0, 0.0, 0.0)
    val p1 = Array(0.0, 0.0, 0.0); val p2 = Array(20.0, 20.0, 0.0)
    val b1 = pop(p1, 0 until 20, zero) ++ pop(p2, 20 until 40, zero)
    val b2 = pop(p1, 100 until 120, batchShift) ++ pop(p2, 120 until 140, batchShift)
    val pcaDf = (b1 ++ b2).toDF("cells_id", "pc")
    val grpDf = (b1 ++ b2).map(r => (r._1, if (r._1 < 100) "batch1" else "batch2"))
      .toDF("cells_id", "group")
    (pcaDf.persist(), grpDf)
  }

  private def dist(a: Seq[Double], b: Seq[Double]) =
    math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)

  test("MNN anchor correction removes the batch shift") {
    val out = Integration.integrateEmbeddings(pca, groups, kAnchor = 8, kWeight = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out.size == 80)
    def centroid(ids: Range) = {
      val vs = ids.map(out(_))
      vs.head.indices.map(d => vs.map(_(d)).sum / vs.size)
    }
    val p1b1 = centroid(0 until 20); val p1b2 = centroid(100 until 120)
    val p2b1 = centroid(20 until 40); val p2b2 = centroid(120 until 140)
    // corrected same-population centroids are close across batches...
    assert(dist(p1b1, p1b2) < 2.0, s"P1 cross-batch ${dist(p1b1, p1b2)}")
    assert(dist(p2b1, p2b2) < 2.0, s"P2 cross-batch ${dist(p2b1, p2b2)}")
    // ...and populations remain separated
    assert(dist(p1b1, p2b1) > 10.0)
    // reference batch untouched
    val orig = pca.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    (0 until 40).foreach(i => assert(out(i.toLong) == orig(i.toLong)))
    // before correction the shift dominated
    val rawP1b2 = (100 until 120).map(orig(_))
    val rawCentroid = rawP1b2.head.indices.map(d => rawP1b2.map(_(d)).sum / rawP1b2.size)
    assert(dist(p1b1, rawCentroid) > 5.0)
  }

  /** b1 holds P1 and P2; b2 holds P1 (batch-shifted) and P3 — a
    * population unique to b2 whose nearest reference population is P2.
    * Joint-space MNN (full-rank dims + uninformative scores) anchors
    * P3 onto P2 and collapses it; the rPCA search with shared-neighbor
    * scoring gives those false anchors score 0 and leaves P3 alone. */
  private lazy val (mixPca, mixGroups) = {
    def pop(base: Array[Double], ids: Range, shift: Array[Double]) =
      ids.map { i =>
        val jitter = Array(0.05 * (i % 5), 0.07 * (i % 3), 0.03 * (i % 2))
        (i.toLong, base.indices.map(d => base(d) + shift(d) + jitter(d)).toArray)
      }
    val shift = Array(0.0, 6.0, 0.0); val zero = Array(0.0, 0.0, 0.0)
    val p1 = Array(0.0, 0.0, 0.0)
    val p2 = Array(20.0, 0.0, 0.0)
    val p3 = Array(36.0, 0.0, 0.0)
    val b1 = pop(p1, 0 until 30, zero) ++ pop(p2, 30 until 60, zero)
    val b2 = pop(p1, 100 until 130, shift) ++ pop(p3, 130 until 160, shift)
    val pcaDf = (b1 ++ b2).toDF("cells_id", "pc")
    val grpDf = (b1 ++ b2).map(r => (r._1, if (r._1 < 100) "batch1" else "batch2"))
      .toDF("cells_id", "group")
    (pcaDf.persist(), grpDf)
  }

  test("joint-space MNN collapses a batch-unique population (the v1 failure)") {
    val out = Integration.integrateEmbeddings(mixPca, mixGroups,
      kAnchor = 5, kWeight = 5, dims = 3, kScore = 0) // full rank, unscored → plain MNN
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def centroid(ids: Range) = {
      val vs = ids.map(out(_)); vs.head.indices.map(d => vs.map(_(d)).sum / vs.size)
    }
    // P3 (unique to b2) gets dragged onto P2 — the known MNN failure mode
    assert(dist(centroid(130 until 160), centroid(30 until 60)) < 3.0)
  }

  test("rPCA anchors + shared-neighbor scoring preserve the unique population") {
    val out = Integration.integrateEmbeddings(mixPca, mixGroups,
      kAnchor = 5, kWeight = 5, dims = 1, kScore = 20)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out.size == 120)
    def centroid(ids: Range) = {
      val vs = ids.map(out(_)); vs.head.indices.map(d => vs.map(_(d)).sum / vs.size)
    }
    // true pairs still corrected: P1 centroids converge across batches
    assert(dist(centroid(0 until 30), centroid(100 until 130)) < 2.0,
      s"P1 cross-batch ${dist(centroid(0 until 30), centroid(100 until 130))}")
    // the unique population is NOT collapsed onto P2 (or P1)...
    assert(dist(centroid(130 until 160), centroid(30 until 60)) > 10.0,
      s"P3 vs P2 ${dist(centroid(130 until 160), centroid(30 until 60))}")
    assert(dist(centroid(130 until 160), centroid(0 until 30)) > 10.0)
    // ...its false anchors scored 0, so it receives the same rigid batch
    // correction the true (P1) anchors estimated, preserving structure
    val orig = mixPca.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def origCentroid(ids: Range) = {
      val vs = ids.map(orig(_)); vs.head.indices.map(d => vs.map(_(d)).sum / vs.size)
    }
    val inferredShift = origCentroid(100 until 130).zip(centroid(0 until 30))
      .map { case (b2, b1) => b2 - b1 }
    val expectedP3 = origCentroid(130 until 160).zip(inferredShift)
      .map { case (p, s) => p - s }
    assert(dist(centroid(130 until 160), expectedP3) < 1.5,
      s"P3 corrected ${centroid(130 until 160)} expected $expectedP3")
  }

  /** Average same-batch fraction of each cell's k exact nearest
    * neighbors — the kBET-style mixing statistic. 1.0 = batches fully
    * separated; the fixture's balanced 50/50 design mixes toward ~0.5
    * when correction aligns the twin populations. */
  private def mixing(emb: Map[Long, Seq[Double]], k: Int = 10): Double = {
    val ids = emb.keys.toSeq.sorted
    def batch(id: Long) = if (id < 100) 0 else 1
    val scores = ids.map { i =>
      val nn = ids.filter(_ != i).sortBy(j => dist(emb(i), emb(j))).take(k)
      nn.count(j => batch(j) == batch(i)).toDouble / k
    }
    scores.sum / scores.size
  }

  test("golden: correction moves the batch-mixing metric from separated to mixed") {
    val orig = pca.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // before: the (8,-6,4) shift dwarfs the jitter — every cell's
    // 10-NN are all same-batch
    assert(mixing(orig) == 1.0)
    val out = Integration.integrateEmbeddings(pca, groups, kAnchor = 8, kWeight = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val after = mixing(out)
    // golden: 0.6975 measured on the seeded, deterministic fixture with
    // the EXACT Seurat FindWeights kernel (1 - d/d_k distance weights,
    // score scaling, 1 - exp(-w/(2/sd^2)), sum-1 normalization); the
    // superseded score/(1+d) approximation measured 0.65875 on the same
    // fixture — the two forms measurably differ here because the exact
    // kernel zeroes the furthest selected anchor and renormalizes.
    // Tolerance covers fp drift in distributed double reductions. Not
    // the 0.49 of perfect random mixing — the weighted-anchor blend
    // leaves residual shift — but a 30-point drop from full separation
    // with population structure intact (asserted by the tests above).
    assert(math.abs(after - 0.6975) < 0.02, s"mixing after correction: $after")
  }

  test("hand-computed FindWeights kernel: furthest selected anchor contributes zero") {
    // Minimal fixture where the exact kernel and the superseded
    // score/(1+d) approximation disagree. Reference a={1:(0,0,0),
    // 2:(10,0.5,0)}; query b={11:(0,1,0), 12:(10,1,0), 13:(2,1,0)}.
    // kAnchor=1 mutual pairs: (11,1) vec (0,-1,0) and (12,2) vec
    // (0,-0.5,0); kScore=0 makes every score 1. Cell 13 selects pair
    // anchors 11 (d=2) and 12 (d=8): the exact kernel gives the
    // furthest (12) weight 1-d/d_k = 0, so the correction is pair 11's
    // vector ALONE -> 13 lands exactly at (2,0,0). The approximation
    // blended 1/3 vs 1/9 weights -> y = 0.125, measurably different.
    val pcaDf = Seq(
      (1L, Array(0.0, 0.0, 0.0)), (2L, Array(10.0, 0.5, 0.0)),
      (11L, Array(0.0, 1.0, 0.0)), (12L, Array(10.0, 1.0, 0.0)),
      (13L, Array(2.0, 1.0, 0.0))).toDF("cells_id", "pc")
    val grpDf = Seq(1L -> "a", 2L -> "a", 11L -> "b", 12L -> "b", 13L -> "b")
      .toDF("cells_id", "group")
    val out = Integration.integrateEmbeddings(pcaDf, grpDf,
      kAnchor = 1, kWeight = 2, dims = 3, kScore = 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(1L) == Seq(0.0, 0.0, 0.0) && out(2L) == Seq(10.0, 0.5, 0.0))
    // self-anchors: each anchor cell corrected by exactly its own vector
    assert(out(11L) == Seq(0.0, 0.0, 0.0), s"11 -> ${out(11L)}")
    assert(out(12L) == Seq(10.0, 0.5, 0.0), s"12 -> ${out(12L)}")
    // the non-anchor cell: nearest pair's vector alone (exact kernel)
    assert(out(13L) == Seq(2.0, 0.0, 0.0), s"13 -> ${out(13L)}")
  }

  test("sampled-anchor path: m above group sizes is bit-identical to exact; m=20 still mixes") {
    // r11 verdict item 5 prerequisite: the 4M-barcode soak's
    // "sampled-anchor variant". Above-group-size m must not perturb a
    // single double (the sampler returns the input frame itself)...
    val exact = Integration.integrateEmbeddings(pca, groups,
      kAnchor = 8, kWeight = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val big = Integration.integrateEmbeddings(pca, groups,
      kAnchor = 8, kWeight = 8, maxAnchorCells = 1000)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(big == exact)
    // ...and a genuinely thinned anchor set (m=20 of 40 per group) must
    // still move the mixing metric well off full separation: the
    // correction stage weights EVERY cell against the sampled anchors
    val sampled = Integration.integrateEmbeddings(pca, groups,
      kAnchor = 8, kWeight = 8, maxAnchorCells = 20)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(sampled.size == 80)
    // reference batch untouched, every query cell still corrected
    (0 until 40).foreach(i => assert(sampled(i.toLong) == exact(i.toLong)))
    val after = mixing(sampled)
    assert(after < 0.85, s"sampled-anchor mixing $after (exact: ~0.6975)")
  }

  test("capped-correction path: a generous per-cell cap is bit-identical to exact; a tight cap still removes the shift") {
    // r12 verdict item 1: the correction stage's anchor set bounded
    // per ε-grid cell (Snn.thinPerGridCell). A cap at/above the
    // densest cell's anchor count drops nothing, so the output must
    // not differ by a single double from the exact path...
    val exact = Integration.integrateEmbeddings(pca, groups,
      kAnchor = 8, kWeight = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val generous = Integration.integrateEmbeddings(pca, groups,
      kAnchor = 8, kWeight = 8, maxAnchorsPerCell = 1000)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(generous == exact)
    // ...and a genuinely tight cap (2 anchors per grid cell) must
    // still correct EVERY query cell well enough to remove the
    // planted batch shift: coverage, not anchor count, is what the
    // per-cell thinning preserves
    val capped = Integration.integrateEmbeddings(pca, groups,
      kAnchor = 8, kWeight = 8, maxAnchorsPerCell = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(capped.size == 80)
    (0 until 40).foreach(i => assert(capped(i.toLong) == exact(i.toLong)))
    def centroid(out: Map[Long, Seq[Double]], ids: Range) = {
      val vs = ids.map(out(_))
      vs.head.indices.map(d => vs.map(_(d)).sum / vs.size)
    }
    val p1b1 = centroid(capped, 0 until 20)
    val p1b2 = centroid(capped, 100 until 120)
    assert(dist(p1b1, p1b2) < 3.0,
      s"capped correction left the shift in: ${dist(p1b1, p1b2)}")
  }

  test("single group passes through unchanged") {
    val single = groups.filter(col("group") === "batch1")
    val out = Integration.integrateEmbeddings(
      pca.join(single, Seq("cells_id"), "left_semi"), single)
    assert(out.count() == 40)
  }
}
