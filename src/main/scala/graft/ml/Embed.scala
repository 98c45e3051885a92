package graft.ml

import org.apache.spark.sql.DataFrame

/** `RunUMAP` slot (`QC_helpers/configureEmbedding.r:73-99`,
  * `dataIntegration.r:112`) — 2-D layout of the PCA space.
  *
  * Driver-local kernel BY DESIGN (SURVEY §2.9): the input is the
  * post-reduction cells × numPCs table (≤ 50 doubles/cell — the same
  * data the reference hands to `uwot`), and SGD over kNN edges is
  * inherently sequential. Algorithm is the published UMAP optimization
  * (attract along kNN-graph edges with the fitted a·d^2b kernel, repel
  * seeded negative samples, linearly decaying step, gradient clipping);
  * initialization is the first two PCs (deterministic, replacing
  * spectral init). Parity is structural, not bitwise (SURVEY §7.4).
  */
object Embed {

  /** Returns `(cells_id, x, y)`. */
  def umapLike(emb: DataFrame, knnEdges: DataFrame, epochs: Int = 200,
               minDist: Double = 0.3, negSamples: Int = 5,
               seed: Long = 42L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // fitted curve params for min_dist ~= 0.3 (umap-learn's fit)
    val a = 1.577; val b = 0.8951

    val rows = emb.select("cells_id", "pc").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val ids = rows.map(_._1)
    val idx = ids.zipWithIndex.toMap
    val n = ids.length
    val edges = knnEdges.select("cid", "nid").collect()
      .map(r => (idx(r.getLong(0)), idx(r.getLong(1))))
      .sortBy(identity)

    // init: first two PCs scaled to [-10, 10]
    val pos = Array.ofDim[Double](n, 2)
    for (d <- 0 until 2) {
      val vals = rows.map(r => if (r._2.length > d) r._2(d) else 0.0)
      val lo = vals.min; val hi = vals.max
      val span = if (hi > lo) hi - lo else 1.0
      for (i <- 0 until n) pos(i)(d) = (vals(i) - lo) / span * 20.0 - 10.0
    }

    val rng = new java.util.SplittableRandom(seed)
    def clip(g: Double): Double = math.max(-4.0, math.min(4.0, g))
    for (epoch <- 0 until epochs) {
      val alpha = 1.0 - epoch.toDouble / epochs
      edges.foreach { case (i, j) =>
        val dx = pos(i)(0) - pos(j)(0); val dy = pos(i)(1) - pos(j)(1)
        val d2 = dx * dx + dy * dy
        if (d2 > 0) {
          val gc = -2.0 * a * b * math.pow(d2, b - 1.0) / (1.0 + a * math.pow(d2, b))
          val gx = clip(gc * dx) * alpha; val gy = clip(gc * dy) * alpha
          pos(i)(0) += gx; pos(i)(1) += gy
          pos(j)(0) -= gx; pos(j)(1) -= gy
        }
        var s = 0
        while (s < negSamples) {
          val r = rng.nextInt(n)
          if (r != i) {
            val rx = pos(i)(0) - pos(r)(0); val ry = pos(i)(1) - pos(r)(1)
            val rd2 = rx * rx + ry * ry
            val gc = 2.0 * b / ((0.001 + rd2) * (1.0 + a * math.pow(rd2, b)))
            pos(i)(0) += clip(gc * rx) * alpha
            pos(i)(1) += clip(gc * ry) * alpha
          }
          s += 1
        }
      }
    }
    ids.indices.map(i => (ids(i), pos(i)(0), pos(i)(1)))
      .toDF("cells_id", "x", "y")
  }
}
