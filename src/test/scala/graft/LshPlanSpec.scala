package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.NearDup

/** MinHash-LSH parameter planner ([[NearDup.planLsh]]): the S-curve
  * arithmetic, the recall constraint, and the junk-candidate
  * minimization. Pure math — no SparkSession.
  */
class LshPlanSpec extends AnyFunSuite {

  private def hit(s: Double, r: Int, b: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, r), b)

  test("every returned plan meets the false-negative budget at the threshold") {
    for (t <- Seq(0.5, 0.7, 0.8, 0.9); fn <- Seq(0.01, 0.05, 0.1)) {
      val p = NearDup.planLsh(t, fn)
      assert(p.falseNegAtThreshold <= fn + 1e-12, s"t=$t fn=$fn -> $p")
      assert(p.numHashes == p.rowsPerBand * p.bands && p.numHashes <= 256)
      // the reported rate IS the S-curve value
      assert(math.abs((1.0 - hit(t, p.rowsPerBand, p.bands)) - p.falseNegAtThreshold) < 1e-12)
    }
  }

  test("minimizes sub-threshold candidate mass among feasible plans") {
    val t = 0.8
    val p = NearDup.planLsh(t, maxFalseNeg = 0.05, maxHashes = 128)
    // exhaustive check: no feasible (r, b) within the cap produces fewer
    // candidates at the 0.6 shoulder
    val sLow = 0.6
    for (r <- 1 to 128; b <- 1 to 128 / math.max(r, 1)) {
      if (1.0 - hit(t, r, b) <= 0.05)
        assert(hit(sLow, r, b) >= p.candidateRateAtFp - 1e-12,
          s"(r=$r,b=$b) beats the plan $p")
    }
  }

  test("a tighter recall budget buys more hashes, never fewer") {
    val loose = NearDup.planLsh(0.7, maxFalseNeg = 0.1)
    val tight = NearDup.planLsh(0.7, maxFalseNeg = 0.01)
    assert(tight.falseNegAtThreshold <= 0.01 && loose.falseNegAtThreshold <= 0.1)
    assert(tight.candidateRateAtFp >= 0.0 && loose.numHashes <= 256)
  }

  test("infeasible demands fail loudly") {
    intercept[IllegalArgumentException](
      NearDup.planLsh(0.9, maxFalseNeg = 1e-9, maxHashes = 4))
  }
}
