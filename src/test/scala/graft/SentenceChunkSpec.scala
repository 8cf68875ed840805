package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Sentence-boundary greedy chunking ([[TextAnalysis.chunkSentences]],
  * q167): boundary detection, greedy budget rule, oversize handling,
  * and the empty-doc contract.
  */
class SentenceChunkSpec extends SparkSpec {

  private def chunks(text: String, budget: Int): Seq[(Int, Int, Int, String)] = {
    import spark.implicits._
    Seq(Option(text)).toDF("text")
      .select(explode(TextAnalysis.chunkSentences(col("text"), budget)).as("c"))
      .select(col("c.chunk_idx"), col("c.n_sentences"), col("c.n_tok"), col("c.chunk_text"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq.sortBy(_._1)
  }

  test("greedy packing: whole sentences fill the budget, never split") {
    // sentences of 3/3/4/2 tokens, budget 7 → [3+3], [4+2]
    val got = chunks("One two three. Four five six. Seven eight nine ten! Eleven twelve?", 7)
    assert(got == Seq(
      (0, 2, 6, "One two three. Four five six."),
      (1, 2, 6, "Seven eight nine ten! Eleven twelve?")))
  }

  test("a sentence above the budget is its own oversize chunk, never cut") {
    val got = chunks("Tiny one. A very long sentence with many many tokens inside it. End here.", 4)
    assert(got.map(t => (t._1, t._2, t._3)) ==
      Seq((0, 1, 2), (1, 1, 10), (2, 1, 2)))
  }

  test("no boundary punctuation: one sentence, one chunk") {
    val got = chunks("just a stream of words with no terminal punctuation at all", 5)
    assert(got == Seq((0, 1, 11,
      "just a stream of words with no terminal punctuation at all")))
  }

  test("null and blank docs produce zero chunks") {
    assert(chunks(null, 10).isEmpty)
    assert(chunks("   ", 10).isEmpty)
  }

  test("boundaries need whitespace after punctuation (decimals survive)") {
    val got = chunks("Pi is 3.14 roughly. Use it.", 10)
    assert(got == Seq((0, 2, 6, "Pi is 3.14 roughly. Use it.")))
    val two = chunks("Pi is 3.14 roughly. Use it.", 4)
    assert(two.map(_._4) == Seq("Pi is 3.14 roughly.", "Use it."))
  }
}
