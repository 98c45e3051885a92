package graft.ml

import org.scalatest.funsuite.AnyFunSuite

class GoodTuringSpec extends AnyFunSuite {

  /** Golden fixture exercising the full published estimator: counts
    * [1,1,1,2,2,3,5] (n₁=3, n₂=2, n₃=1, n₅=1, N=15) with 2 unseen
    * species. Expected values computed independently from the Gale &
    * Sampson (1995) algorithm: PROX smoothing Z_r = n_r/(0.5(t−q)),
    * log-log fit (slope b ≈ −1.2052, valid SGT since b < −1), the
    * 1.96·sd Turing/LGT switch rule, and renormalization to (1 − P0)
    * with P0 = n₁/N = 0.2 split over the unseen species. */
  test("golden: SGT probabilities match the published estimator") {
    val (p, pUnseen) = GoodTuring.proportions(Seq(1L, 1L, 1L, 2L, 2L, 3L, 5L), nUnseen = 2)
    val expected = Map(
      1L -> 0.04982580579187208,
      2L -> 0.10571056485415464,
      3L -> 0.16244441096576512,
      5L -> 0.2766570419503095)
    expected.foreach { case (r, e) =>
      assert(math.abs(p(r) - e) < 1e-12, s"p($r) = ${p(r)}, expected $e")
    }
    assert(math.abs(pUnseen - 0.1) < 1e-12) // P0/n0 = 0.2/2
    val total = 3 * p(1L) + 2 * p(2L) + p(3L) + p(5L) + 2 * pUnseen
    assert(math.abs(total - 1.0) < 1e-9, s"mass must sum to 1, got $total")
  }

  test("GT disagrees with both raw fractions and the half-count pseudo") {
    val (p, pUnseen) = GoodTuring.proportions(Seq(1L, 1L, 1L, 2L, 2L, 3L, 5L), nUnseen = 2)
    // raw fraction for a singleton would be 1/15 ≈ 0.0667; SGT shrinks
    // it toward the unseen mass
    assert(p(1L) < 1.0 / 15)
    // the old half-count pseudo-probability would be 0.5/15 ≈ 0.0333;
    // the GT unseen share is P0/n0 = 0.1
    assert(math.abs(pUnseen - 0.5 / 15) > 0.05)
  }

  test("no singletons: safe fallback gives unseen species 1/N total") {
    // the EmptyDropsSpec ambient profile: counts (120, 60, 60), one
    // unseen gene. n1 = 0 so P0 = 0 — the .safe_good_turing fallback
    // must assign the unseen pool 1/N = 1/240 and rescale the rest.
    val (p, pUnseen) = GoodTuring.proportions(Seq(120L, 60L, 60L), nUnseen = 1)
    assert(math.abs(pUnseen - 1.0 / 240) < 1e-12)
    assert(math.abs(p(60L) - 0.2489583333333334) < 1e-12)
    assert(math.abs(p(120L) - 0.4979166666666667) < 1e-12)
    val total = 2 * p(60L) + p(120L) + pUnseen
    assert(math.abs(total - 1.0) < 1e-9)
  }

  test("all singletons: P0 capped so observed probabilities stay positive") {
    // P0 = n₁/N = 1 would zero every observed probability (and
    // emptyDrops would log(0)); the cap reserves 1/N for the observed
    // pool, mirroring the no-singletons fallback in the other direction
    val (p, pUnseen) = GoodTuring.proportions(Seq(1L, 1L, 1L, 1L), nUnseen = 3)
    assert(p(1L) > 0, s"observed singleton probability must be positive, got ${p(1L)}")
    assert(pUnseen > 0)
    val total = 4 * p(1L) + 3 * pUnseen
    assert(math.abs(total - 1.0) < 1e-9, s"mass must sum to 1, got $total")
    assert(math.abs(4 * p(1L) - 1.0 / 4) < 1e-9) // observed pool keeps 1/N
  }

  test("all species seen: observed mass stays 1 - P0 (edgeR semantics)") {
    val (p, pUnseen) = GoodTuring.proportions(Seq(1L, 2L, 2L, 3L), nUnseen = 0)
    assert(pUnseen == 0.0)
    val totalObs = p(1L) + 2 * p(2L) + p(3L)
    assert(math.abs(totalObs - (1.0 - 1.0 / 8)) < 1e-9) // P0 = n1/N = 1/8
  }
}
