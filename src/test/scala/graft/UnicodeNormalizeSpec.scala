package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Unicode normalization front door ([[TextAnalysis.normalizeUnicode]] +
  * the `graft_nfc` kernel, q155): NFC composition, zero-width/control
  * strip counts, idempotence, and null handling. All non-ASCII fixture
  * content is written as unicode escapes so it stays visible in source.
  */
class UnicodeNormalizeSpec extends SparkSpec {

  // decomposed: base letter + combining mark; composed: the NFC result
  private val cafeDecomposed = "cafe\u0301"
  private val schonDecomposed = "scho\u0308n"
  private val cafeComposed = "caf\u00E9"
  private val schonComposed = "sch\u00F6n"

  private def norm(rows: (Long, String)*) = {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    rows.toDF("id", "t")
      .select(col("id"), TextAnalysis.normalizeUnicode(col("t")).as("nu"))
      .select(col("id"), col("nu.clean_text"), col("nu.n_zero_width"),
        col("nu.n_control"), col("nu.nfc_changed"))
      .orderBy("id").collect()
  }

  test("decomposed combining sequences compose to NFC") {
    val out = norm(1L -> (cafeDecomposed + " " + schonDecomposed))
    assert(out(0).getAs[String]("clean_text") == cafeComposed + " " + schonComposed)
    assert(out(0).getAs[Boolean]("nfc_changed"))
    assert(out(0).getAs[Long]("n_zero_width") == 0L)
    assert(out(0).getAs[Long]("n_control") == 0L)
  }

  test("already-NFC text is unchanged and flagged unchanged") {
    val out = norm(1L -> "plain ascii text", 2L -> cafeComposed)
    assert(!out(0).getAs[Boolean]("nfc_changed"))
    assert(out(0).getAs[String]("clean_text") == "plain ascii text")
    assert(!out(1).getAs[Boolean]("nfc_changed"))
    assert(out(1).getAs[String]("clean_text") == cafeComposed)
  }

  test("zero-width and BOM code points strip with exact counts") {
    val out = norm(1L ->
      "a\u200Bb\u200Cc\u200Dd\u2060e\uFEFFf")
    assert(out(0).getAs[String]("clean_text") == "abcdef")
    assert(out(0).getAs[Long]("n_zero_width") == 5L)
    assert(out(0).getAs[Long]("n_control") == 0L)
  }

  test("control chars strip except tab and newline") {
    val out = norm(1L -> "a\u0007\tbc\u001B\u0001\nd")
    assert(out(0).getAs[String]("clean_text") == "a\tbc\nd")
    assert(out(0).getAs[Long]("n_control") == 3L)
    assert(out(0).getAs[Long]("n_zero_width") == 0L)
  }

  test("normalization is idempotent") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val messy = Seq((1L,
      "\u200B" + cafeDecomposed + " x" + "\uFEFF")).toDF("id", "t")
    val once = messy
      .select(col("id"),
        TextAnalysis.normalizeUnicode(col("t")).getField("clean_text").as("t"))
    val twice = once
      .select(col("id"), TextAnalysis.normalizeUnicode(col("t")).as("nu"))
      .select(col("nu.clean_text"), col("nu.n_zero_width"),
        col("nu.n_control"), col("nu.nfc_changed")).collect()(0)
    assert(twice.getAs[String]("clean_text") == cafeComposed + " x")
    assert(twice.getAs[Long]("n_zero_width") == 0L)
    assert(twice.getAs[Long]("n_control") == 0L)
    assert(!twice.getAs[Boolean]("nfc_changed"))
  }

  test("null text stays null through the kernel") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val out = Seq((1L, null.asInstanceOf[String])).toDF("id", "t")
      .select(TextAnalysis.nfc(col("t")).as("n")).collect()(0)
    assert(out.isNullAt(0))
  }
}
