package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private val stop = Seq("the", "a", "of")

  test("tokenCountWs: empty and blank → 0; multiple spaces collapse") {
    val out = Seq("", "   ", "one", "one  two   three").toDF("text")
      .select(TextAnalysis.tokenCountWs(col("text"))).as[Int].collect()
    assert(out === Array(0, 0, 1, 3))
  }

  test("tokenCountBpe: 4 word chars per token plus punctuation") {
    val out = Seq(("abcd", 1L), ("abcde", 2L), ("ab, cd!", 3L), ("", 0L)).toDF("text", "want")
      .select(TextAnalysis.tokenCountBpe(col("text")).as("got"), col("want"))
      .as[(Long, Long)].collect()
    out.foreach { case (got, want) => assert(got === want) }
  }

  test("ratios stay in [0,1] and quality is bounded") {
    val docs = Seq("", "the the the", "!!!!", "normal text of the day", "x" * 1000).toDF("text")
    val out = docs.select(
      TextAnalysis.punctRatio(col("text")).as("p"),
      TextAnalysis.stopwordRatio(col("text"), stop).as("s"),
      TextAnalysis.qualityScore(col("text"), stop).as("q")
    ).as[(Double, Double, Double)].collect()
    out.foreach { case (p, s, q) =>
      assert(p >= 0 && p <= 1); assert(s >= 0 && s <= 1); assert(q >= 0 && q <= 1)
    }
  }

  test("langId picks the marker-heavy language, 'und' when no markers") {
    val markers = Map("en" -> Seq("the"), "es" -> Seq("el"))
    val out = Seq("the cat the dog", "el gato", "zzz yyy").toDF("text")
      .select(TextAnalysis.langId(col("text"), markers)).as[String].collect()
    assert(out === Array("en", "es", "und"))
  }

  test("fingerprint canonicalizes case and whitespace") {
    val out = Seq("Hello   World", "hello world", "hello  worlds").toDF("text")
      .select(TextAnalysis.fingerprint(col("text"))).as[String].collect()
    assert(out(0) === out(1))
    assert(out(0) !== out(2))
  }
}
