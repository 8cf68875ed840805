package graft

import graft.operators.Quality

/** Tokenizer fertility census ([[Quality.tokenizerFertility]], q168):
  * census arithmetic under a known merge table and the empty-doc
  * exclusion contract (the encode kernel itself is pinned by BpeSpec).
  */
class TokenizerFertilitySpec extends SparkSpec {

  test("per-stratum sums and ratios under a fixed merge list") {
    import spark.implicits._
    val docs = Seq(
      ("en", "aa ab", 5L),   // 'aa'→1 piece (merged), 'ab'→2 pieces
      ("en", "aa aa aa", 8L),
      ("de", "ab", 2L),
      ("de", "", 0L),        // blank: excluded
      ("de", null, 0L))      // null: excluded
      .toDF("lang", "text", "n_chars")
    val got = Quality.tokenizerFertility(docs, "text", "lang",
        merges = Seq(("a", "a")), charCountCol = "n_chars")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    // en: 2 docs, 5 words, pieces = (1+2) + (1+1+1) = 6, 13 chars
    assert(got("en") == ((2L, 5L, 6L, 13L, 6.0 / 5.0, 13.0 / 6.0)))
    // de: 1 doc (blank+null excluded), 1 word, 2 pieces, 2 chars
    assert(got("de") == ((1L, 1L, 2L, 2L, 2.0, 1.0)))
  }
}
