package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TextKernels
import graft.operators.Linkage

/** Jaro-Winkler kernel + blocked linkage ([[Linkage.bestMatches]],
  * q170): kernel values pinned to the oracle engine's
  * jaro_winkler_similarity (probed this round — including the 0.7 boost
  * threshold and the prefix-4 cap), then the blocking/argmax contract.
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    math.rint(TextKernels.jaroWinkler(
      UTF8String.fromString(a), UTF8String.fromString(b)) * 10000) / 10000

  test("kernel matches the oracle engine's probed values") {
    assert(jw("martha", "marhta") == 0.9611)     // transpositions + prefix 3
    assert(jw("dixon", "dicksonx") == 0.8133)
    assert(jw("jellyfish", "smellyfish") == 0.8963) // prefix 0: no boost term
    assert(jw("crate", "trace") == 0.7333)
    assert(jw("dwayne", "duane") == 0.84)
    assert(jw("aaaaaab", "aaaaaac") == 0.9429)   // prefix capped at 4
    // odd mismatch cycle: 3 out-of-order pairs floor to ONE transposition
    // (the integer-division convention the oracle engine uses)
    assert(jw("large gear 41", "larg gear 41") == 0.9679)
  }

  test("boost threshold: jaro <= 0.7 gets NO prefix boost (oracle-probed)") {
    assert(jw("ax", "ay") == 0.6667)
    assert(jw("aaaaxxxx", "aaaayyyy") == 0.6667) // prefix 4 but no boost
  }

  test("degenerate inputs: empties and zero-match pairs score 0, identity 1") {
    assert(jw("", "abc") == 0.0 && jw("", "") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0: no same-position match
    assert(jw("abc", "abc") == 1.0)
  }

  test("blocked linkage: per-left argmax, sim floor, ties break to min right id") {
    import spark.implicits._
    val left = Seq((1L, "johnathan smith"), (2L, "maria garcia"), (3L, "zzz qqq"))
      .toDF("lid", "lname")
    val right = Seq(
      (10L, "jonathan smith"),   // best for 1
      (11L, "johnathan smith"),  // exact — beats 10
      (20L, "maria garcia"), (21L, "maria garcia"), // tie: min rid wins
      (30L, "completely other")) // never above the floor
      .toDF("rid", "rname")
    val got = Linkage.bestMatches(left, right, "lid", "rid", "lname", "rname",
        minSim = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((11L, 1.0)))
    assert(got(2L) == ((20L, 1.0)))
    assert(!got.contains(3L)) // no candidate above the floor
  }

  test("length-band relaxation: a dropped char still meets its source") {
    import spark.implicits._
    // 8 chars vs 7 chars straddle a band-of-4 boundary — the ±1 band
    // emission is what lets them meet
    val left = Seq((1L, "abcdefgh")).toDF("lid", "lname")
    val right = Seq((9L, "abcdefg")).toDF("rid", "rname")
    val got = Linkage.bestMatches(left, right, "lid", "rid", "lname", "rname",
      minSim = 0.9).collect()
    assert(got.length == 1 && got.head.getLong(1) == 9L)
  }
}
