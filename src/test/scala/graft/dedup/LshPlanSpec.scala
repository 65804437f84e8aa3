package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class LshPlanSpec extends AnyFunSuite with Matchers {

  test("candidates enumerate exactly the divisor pairs of numHashes") {
    val cs = LshPlan.candidates(64, 0.8)
    cs.map(_.bands) shouldBe Seq(1, 2, 4, 8, 16, 32, 64)
    cs.foreach(c => c.bands * c.rowsPerBand shouldBe 64)
  }

  test("plan minimizes the quantized error total") {
    val cs = LshPlan.candidates(64, 0.8)
    val (b, r) = LshPlan.plan(64, 0.8)
    b * r shouldBe 64
    val chosen = cs.find(_.bands == b).get
    chosen.totalQ shouldBe cs.map(_.totalQ).min
  }

  test("higher thresholds plan fewer bands (steeper S-curve needed later)") {
    // the curve's step sits near (1/b)^(1/r): pushing the threshold up
    // must not INCREASE the band count
    val b50 = LshPlan.plan(64, 0.5)._1
    val b80 = LshPlan.plan(64, 0.8)._1
    val b95 = LshPlan.plan(64, 0.95)._1
    b50 should be >= b80
    b80 should be >= b95
  }

  test("the planned curve actually separates: p well below threshold " +
    "is small, p well above is large") {
    val (b, r) = LshPlan.plan(64, 0.8)
    def p(s: Double) =
      1.0 - LshPlan.powFold(1.0 - LshPlan.powFold(s, r), b)
    p(0.4) should be < 0.25
    p(0.95) should be > 0.75
  }

  test("degenerate sizes work; bad inputs raise") {
    LshPlan.plan(1, 0.5) shouldBe ((1, 1))
    an[IllegalArgumentException] should be thrownBy LshPlan.plan(0, 0.5)
    an[IllegalArgumentException] should be thrownBy LshPlan.plan(64, 0.0)
    an[IllegalArgumentException] should be thrownBy LshPlan.plan(64, 1.0)
  }

  test("planRecallBounded: every pick satisfies the miss bound, has " +
    "minimal FP mass among those that do, and (64, 0.9) derives the " +
    "hand-tuned (16, 4)") {
    for (t <- Seq(0.5, 0.7, 0.8, 0.9, 0.95); n <- Seq(16, 64, 128)) {
      val (b, r) = LshPlan.planRecallBounded(n, t)
      b * r shouldBe n
      val miss = LshPlan.missAtThreshold(b, r, t)
      val cs = LshPlan.candidates(n, t)
      val eligible = cs.filter(c =>
        LshPlan.missAtThreshold(c.bands, c.rowsPerBand, t) <= 1e-6)
      if (eligible.nonEmpty) {
        // bound satisfied, minimal fp among those that satisfy it
        miss should be <= 1e-6
        cs.find(_.bands == b).get.fpQ shouldBe eligible.map(_.fpQ).min
      } else {
        // bound unsatisfiable at this (n, t) — e.g. 16 hashes at
        // t = 0.5 bottom out at (1−t)^16 ≈ 1.5e-5 — fall back to the
        // maximum-recall candidate
        miss shouldBe cs.map(c =>
          LshPlan.missAtThreshold(c.bands, c.rowsPerBand, t)).min
      }
    }
    // the pipelines' pinned setting is DERIVED, not hand-tuned, now
    LshPlan.planRecallBounded(64, 0.9) shouldBe ((16, 4))
    // a tighter bound can only raise the band count (more recall)
    LshPlan.planRecallBounded(64, 0.9, maxMiss = 1e-12)._1 should be >= 16
  }

  test("missAtThreshold is the linear-fold (1 - t^r)^b") {
    LshPlan.missAtThreshold(1, 1, 0.9) shouldBe (1.0 - 0.9) +- 1e-15
    val m = LshPlan.missAtThreshold(16, 4, 0.9)
    // 0.9^4 = 0.6561 exactly in IEEE; (1 - 0.6561)^16
    m shouldBe math.pow(1.0 - 0.6561, 16) +- 1e-12
    m should be < 1e-6
  }

  // ---- sign-LSH (cosine) family ------------------------------------

  test("cosine candidates enumerate divisor pairs over the [-1, 1] " +
    "domain and the pBit map is the quantized 1 - acos(s)/pi") {
    val cs = LshPlan.cosineCandidates(48, 0.35)
    cs.map(_.bands) shouldBe Seq(1, 2, 3, 4, 6, 8, 12, 16, 24, 48)
    cs.foreach(c => c.bands * c.rowsPerBand shouldBe 48)
    // quantization: exactly representable dyadic rational at 2^-20
    val p = LshPlan.pBitQ20(0.35)
    (p * 1048576.0) shouldBe math.floor(p * 1048576.0)
    p shouldBe (1.0 - math.acos(0.35) / math.Pi) +- 1e-6
    // orthogonal vectors collide per bit with probability ~1/2;
    // opposite vectors never, identical always (up to quantization)
    LshPlan.pBitQ20(0.0) shouldBe 0.5 +- 1e-6
    LshPlan.pBitQ20(-0.999999) should be < 0.001
    LshPlan.pBitQ20(0.999999) should be > 0.999
  }

  test("planRecallBoundedCosine: pick satisfies the miss bound with " +
    "minimal FP mass, anti-correlated mass is priced, fallback on " +
    "degenerate bounds") {
    for (t <- Seq(0.35, 0.8, 0.95); n <- Seq(16, 48, 64);
         mm <- Seq(1e-3, 0.05)) {
      val (b, r) = LshPlan.planRecallBoundedCosine(n, t, mm)
      b * r shouldBe n
      val cs = LshPlan.cosineCandidates(n, t)
      val eligible = cs.filter(c =>
        LshPlan.missAtThresholdCosine(c.bands, c.rowsPerBand, t) <= mm)
      if (eligible.nonEmpty) {
        LshPlan.missAtThresholdCosine(b, r, t) should be <= mm
        cs.find(_.bands == b).get.fpQ shouldBe eligible.map(_.fpQ).min
      } else {
        LshPlan.missAtThresholdCosine(b, r, t) shouldBe cs.map(c =>
          LshPlan.missAtThresholdCosine(c.bands, c.rowsPerBand, t)).min
      }
    }
    // the shallow-curve physics the scaladoc documents: the package's
    // hand-tuned (bands = 4, 12 bits) default misses ~27% of pairs AT
    // cosine 0.95 — the planner's (12, 4) at the same 48-plane budget
    // gets under 1e-3 by paying candidates for recall
    LshPlan.missAtThresholdCosine(4, 12, 0.95) should be > 0.25
    LshPlan.planRecallBoundedCosine(48, 0.95, 1e-3) shouldBe ((12, 4))
    // q259's oracle-checked setting: t = 0.35 at 48 planes
    LshPlan.planRecallBoundedCosine(48, 0.35, 1e-4) shouldBe ((24, 2))
    an[IllegalArgumentException] should be thrownBy
      LshPlan.planRecallBoundedCosine(48, 1.0)
    an[IllegalArgumentException] should be thrownBy
      LshPlan.planRecallBoundedCosine(48, -1.0)
  }
}
