package graft.ml

/** Simple Good-Turing frequency estimation (Gale & Sampson 1995) for
  * the emptyDrops ambient profile — the DropletUtils semantics
  * (`.safe_good_turing` wrapping edgeR's goodTuringProportions; Lun et
  * al. 2019, consumed at `2-1_Compute-metrics_emptyDrops.r:37`): the
  * probability a read comes from gene g is estimated from the
  * frequency-of-frequencies of the pooled ambient counts, not from the
  * raw count fraction, so rarely-seen genes are shrunk toward the
  * unseen mass P0 = n₁/N.
  *
  * Driver-side by design: the input is the per-gene ambient count
  * vector (G entries, already reduced from the distributed pool), so
  * the O(G log G) fit is negligible at any corpus scale.
  */
object GoodTuring {

  /** SGT-adjusted probabilities.
    *
    * @param counts  observed (>0) per-species counts
    * @param nUnseen number of species with zero count
    * @return (count value → probability per species with that count,
    *         probability per unseen species)
    */
  def proportions(counts: Seq[Long], nUnseen: Long): (Map[Long, Double], Double) = {
    require(counts.nonEmpty && counts.forall(_ > 0),
      "SGT needs a non-empty positive count vector")
    val nr = counts.groupBy(identity).map { case (r, g) => (r, g.size.toLong) }
    val rs = nr.keys.toArray.sorted
    val n = counts.map(_.toDouble).sum
    // .safe_good_turing symmetry with the no-singletons branch below:
    // an all-singletons profile gives P0 = n₁/N = 1, which would zero
    // every observed probability (log(0) downstream in emptyDrops) —
    // cap so the observed pool keeps at least 1/N total mass
    val p0 = math.min(nr.getOrElse(1L, 0L) / n, 1.0 - 1.0 / n)
    // PROX smoothing: Z_r = n_r / (0.5·(t − q)) with q,t the
    // neighboring observed frequencies (q = 0 at the left edge,
    // t = 2r − q at the right), then a log-log least-squares fit
    // S(r) = A·r^b
    val z = rs.indices.map { j =>
      val q = if (j == 0) 0L else rs(j - 1)
      val t = if (j == rs.length - 1) 2 * rs(j) - q else rs(j + 1)
      nr(rs(j)).toDouble / (0.5 * (t - q))
    }
    val xs = rs.map(r => math.log(r.toDouble))
    val ys = z.map(math.log).toArray
    val xm = xs.sum / xs.length
    val ym = ys.sum / ys.length
    val den = xs.map(x => (x - xm) * (x - xm)).sum
    val b =
      if (den == 0) 0.0
      else xs.indices.map(j => (xs(j) - xm) * (ys(j) - ym)).sum / den
    def lgtRatio(r: Long): Double = (r + 1.0) * math.pow((r + 1.0) / r, b)
    // Sampson's switch rule: Turing estimates (r+1)·n_{r+1}/n_r while
    // they differ significantly (1.96·sd) from the smoothed fit, the
    // LGT estimate from the first indifferent (or missing-n_{r+1}) row on
    var switched = false
    val rStar = rs.map { r =>
      val y = lgtRatio(r)
      val nr1 = nr.getOrElse(r + 1, 0L).toDouble
      if (nr1 == 0) switched = true
      if (switched) r -> y
      else {
        val nrr = nr(r).toDouble
        val x = (r + 1.0) * nr1 / nrr
        val sd = math.sqrt((r + 1.0) * (r + 1.0) * (nr1 / (nrr * nrr)) * (1.0 + nr1 / nrr))
        if (math.abs(x - y) <= 1.96 * sd) { switched = true; r -> y }
        else r -> x
      }
    }.toMap
    val nPrime = rStar.map { case (r, s) => nr(r) * s }.sum
    val pObs = rStar.map { case (r, s) => r -> (1.0 - p0) * s / nPrime }
    if (nUnseen > 0 && p0 > 0) (pObs, p0 / nUnseen)
    else if (nUnseen > 0) {
      // .safe_good_turing: with no singletons P0 = 0 would zero every
      // unseen species — give the unseen pool 1/N total probability and
      // rescale the observed mass to compensate
      val pseudo = 1.0 / n
      (pObs.map { case (r, p) => r -> p * (1.0 - pseudo) }, pseudo / nUnseen)
    } else (pObs, 0.0) // edgeR: observed mass stays 1 − P0
  }
}
