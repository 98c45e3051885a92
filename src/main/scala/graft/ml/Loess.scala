package graft.ml

/** Driver-local loess kernel (tricube-weighted local linear
  * regression) — the mean-variance trend smoother behind Seurat's
  * `FindVariableFeatures(selection.method = "vst")`
  * (`QC_helpers/dataIntegration.r:93,102`).
  *
  * Driver-side by design: it runs on per-gene aggregates (≤ ~40k
  * points, SURVEY §2.9), never on per-cell data. O(n · span·n) with a
  * sliding nearest-neighbor window over the sorted x axis.
  */
object Loess {

  /** Fitted values at each input x. Inputs need not be sorted;
    * ties are fine. span = fraction of points per local window. */
  def fit(xs: Array[Double], ys: Array[Double], span: Double = 0.3): Array[Double] = {
    require(xs.length == ys.length && xs.nonEmpty)
    val n = xs.length
    if (n == 1) return Array(ys(0))
    val order = xs.indices.sortBy(xs(_)).toArray
    val sx = order.map(xs(_))
    val sy = order.map(ys(_))
    val k = math.min(n, math.max(2, math.ceil(span * n).toInt))
    val fitted = new Array[Double](n)
    var lo = 0
    for (i <- 0 until n) {
      // slide window to the k nearest neighbors of sx(i)
      while (lo + k < n && sx(lo + k) - sx(i) < sx(i) - sx(lo)) lo += 1
      val hi = lo + k - 1
      val h = math.max(math.max(sx(i) - sx(lo), sx(hi) - sx(i)), 1e-12)
      // tricube-weighted linear least squares over the window
      var sw = 0.0; var swx = 0.0; var swy = 0.0; var swxx = 0.0; var swxy = 0.0
      var j = lo
      while (j <= hi) {
        val d = math.abs(sx(j) - sx(i)) / h
        val t = 1.0 - d * d * d
        val w = if (t > 0) t * t * t else 0.0
        sw += w; swx += w * sx(j); swy += w * sy(j)
        swxx += w * sx(j) * sx(j); swxy += w * sx(j) * sy(j)
        j += 1
      }
      val denom = sw * swxx - swx * swx
      fitted(order(i)) =
        if (math.abs(denom) < 1e-12) swy / sw
        else {
          val beta = (sw * swxy - swx * swy) / denom
          val alpha = (swy - beta * swx) / sw
          alpha + beta * sx(i)
        }
    }
    fitted
  }
}
