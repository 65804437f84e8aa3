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
}
