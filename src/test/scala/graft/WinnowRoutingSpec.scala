package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** The winnow routing heuristic ([[Dedup.chooseWinnow]]) on synthetic
  * cluster shapes — pins the guide's decision rule so a profile change
  * that silently flips the default shows up here, not in production.
  * No SparkSession needed: the rule is pure arithmetic.
  */
class WinnowRoutingSpec extends AnyFunSuite {

  // measured-ish profiles (per core): local NVMe/memory shuffle vs a
  // contended 1000-executor network shuffle; selection throughput from
  // the 500 k-doc probe (~5 M tokens/s/core at winnow = 1)
  private val localShuffleBps = 2.0e9
  private val clusterShuffleBps = 3.0e7
  private val selTps = 5.0e6

  test("memory-bound local profile stays exact (winnow = 1)") {
    assert(Dedup.chooseWinnow(8, 100, localShuffleBps, selTps) == 1)
  }

  test("network-bound cluster profile flips the dial to the largest admissible w") {
    assert(Dedup.chooseWinnow(8, 100, clusterShuffleBps, selTps) == 8)
  }

  test("the semantics cap beats the economics: short target runs force exact") {
    // detection guarantee needs runs >= k, so wMax = 1 — even on the
    // network-bound profile the dial must NOT move
    assert(Dedup.chooseWinnow(8, 8, clusterShuffleBps, selTps) == 1)
    // runs >= k+1 admit only w = 2 — needs a harder-bound network than
    // w = 8 does (less volume saved), so use a 10 MB/s/core profile
    assert(Dedup.chooseWinnow(8, 9, 1.0e7, selTps) == 2)
  }

  test("borderline profile: w = 8 economic, w = 2 not — largest wins, smaller never chosen") {
    // at 50 MB/s/core: saved(8) = 16*(7/9)/5e7 ≈ 2.49e-7 > 2.4e-7 = cost,
    // saved(2) = 16*(1/3)/5e7 ≈ 1.07e-7 < cost
    val borderline = 5.0e7
    assert(Dedup.chooseWinnow(8, 100, borderline, selTps) == 8)
    // cap w below 8 and the remaining candidates are uneconomic → exact
    assert(Dedup.chooseWinnow(8, 10, borderline, selTps) == 1) // wMax = 3 → only w=2 left
  }

  test("the rule recovers the guide's ~3:1 scan:network threshold (w = 2 form)") {
    // scan side: 16 B/token at selTps ⇒ 16*selTps bytes/s/core of scan.
    // For w = 2 (the conservative dial) the flip sits at scan:network =
    // penalty/(1/3) = 3.6:1 — the guide's "~3:1" rule of thumb
    val scanBytesPerSec = 16.0 * selTps
    assert(Dedup.chooseWinnow(8, 9, scanBytesPerSec / 3.0, selTps) == 1)
    assert(Dedup.chooseWinnow(8, 9, scanBytesPerSec / 4.0, selTps) == 2)
  }

  test("guards: bad k, run target below k, non-positive rates") {
    intercept[IllegalArgumentException](Dedup.chooseWinnow(1, 10, 1e9, 1e6))
    intercept[IllegalArgumentException](Dedup.chooseWinnow(8, 7, 1e9, 1e6))
    intercept[IllegalArgumentException](Dedup.chooseWinnow(8, 20, 0, 1e6))
  }
}
