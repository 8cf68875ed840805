package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Round-4 operators: fuzzy substring canonicalization, MCL key
  * auto-discovery, metadata-compiled validation rules.
  */
class RecodeDiscoverySpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    FuzzyRecode.Rule(Seq("klesiella", "klebsiella", "kleb"), "KLS", "Klebsiella sp."),
    FuzzyRecode.Rule(Seq("proteus", "ptoteus"), "Prot", "Proteus sp."),
    FuzzyRecode.Rule(Seq("kleb proteus special"), "KPS", "Special combo"))

  test("fuzzyRecode: misspellings match, case-insensitive, gate respected") {
    val df = Seq(
      (1L, "Oth", "orig", "found KLESIELLA in culture"), // misspelling, uppercased
      (2L, "Oth", "orig", "ptoteus colonies"),           // misspelling of proteus
      (3L, "Oth", "orig", "nothing recognizable"),       // no match → sentinel stays
      (4L, "SA", "Staph", "klebsiella everywhere")       // gate not met → untouched
    ).toDF("id", "v", "l", "txt")
    val out = FuzzyRecode.canonicalize(df, "v", "l", col("txt"), rules)
      .orderBy("id").select("v", "l").as[(String, String)].collect()
    assert(out === Array(
      ("KLS", "Klebsiella sp."),
      ("Prot", "Proteus sp."),
      ("Oth", "orig"),
      ("SA", "Staph")))
  }

  test("fuzzyRecode: LAST matching rule wins (reference overwrite chain)") {
    // matches rule 1 ("kleb"), rule 2 ("proteus") AND rule 3 (full phrase):
    // the reference's sequential ifs leave the last assignment standing
    val df = Seq((1L, "Oth", "x", "kleb proteus special case")).toDF("id", "v", "l", "txt")
    val out = FuzzyRecode.canonicalize(df, "v", "l", col("txt"), rules)
      .select("v", "l").as[(String, String)].head()
    assert(out === ("KPS", "Special combo"))
  }

  test("fuzzyRecode: ungated form canonicalizes every matching row") {
    val df = Seq((1L, "SA", "Staph", "klebsiella")).toDF("id", "v", "l", "txt")
    val out = FuzzyRecode.canonicalize(df, "v", "l", col("txt"), rules, gate = None)
      .select("v", "l").as[(String, String)].head()
    assert(out === ("KLS", "Klebsiella sp."))
  }

  test("fuzzyRecode: label decision uses the ORIGINAL value column") {
    // regression guard for the withColumn-sequencing trap: if the label
    // replacement re-read the already-rewritten value column the gate
    // would no longer hold and the label would stay stale
    val df = Seq((1L, "Oth", "stale", "kleb")).toDF("id", "v", "l", "txt")
    val out = FuzzyRecode.canonicalize(df, "v", "l", col("txt"), rules)
      .select("v", "l").as[(String, String)].head()
    assert(out === ("KLS", "Klebsiella sp."))
  }
}
