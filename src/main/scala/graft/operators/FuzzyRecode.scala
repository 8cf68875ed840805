package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (substring-based) label canonicalization: free-text "Other …"
  * entries are matched against a rule list of known misspellings /
  * fragments and rewritten to a canonical (value, label) pair.
  *
  * Reference semantics (reference: src/data_pipeline/pipelines/
  * data_engineering/data_tyding/neolab_data_cleanup.py:12-122): when a
  * row's coded value is the "Oth" sentinel, the free-text companion field
  * is lowercased and probed with a SEQUENCE of substring checks
  * ("klesiella" / "klebsiella" / "kleb" → `Klebsiella sp.` / `KLS`, …);
  * each matching check OVERWRITES the previous assignment, so the LAST
  * matching rule in list order wins. Rows matching no rule keep their
  * original value/label.
  *
  * Scale notes: the whole rule list compiles to one chained `when`
  * expression over `contains(lower(text), pattern)` literals — pure
  * codegen, no UDFs, no joins, no shuffle; a 100-rule list is still a
  * single projection. Rule lists are deployment config (like the
  * reference's hard-coded chain) and live in the plan as literals.
  */
object FuzzyRecode {

  /** One canonicalization rule: any of `patterns` appearing as a substring
    * of the lowercased free text triggers it (patterns should be
    * lowercase). Later rules overwrite earlier ones, mirroring the
    * reference's sequential if-chain.
    */
  final case class Rule(patterns: Seq[String], value: String, label: String) {
    require(patterns.nonEmpty, "a fuzzy rule needs at least one pattern")
  }

  private def ruleHit(lowered: Column, r: Rule): Column =
    r.patterns.map(p => lowered.contains(lit(p))).reduce(_ || _)

  /** Canonical (value, label) struct for `text` under `rules`; NULL when no
    * rule matches. Last matching rule wins: the foldLeft nests earlier
    * rules inside `otherwise`, so later rules are tested first — identical
    * outcome to the reference's overwrite chain.
    */
  def matched(text: Column, rules: Seq[Rule]): Column = {
    require(rules.nonEmpty, "fuzzy recode needs at least one rule")
    val lowered = lower(text)
    rules.foldLeft(lit(null).cast("struct<value:string,label:string>")) {
      case (acc, r) =>
        when(ruleHit(lowered, r),
          struct(lit(r.value).as("value"), lit(r.label).as("label"))).otherwise(acc)
    }
  }

  /** Apply the rule list to a (value, label) column pair gated on the
    * sentinel value (the reference's `Org1.value == 'Oth'` branch): where
    * the gate holds AND the free text matches a rule, both columns are
    * rewritten; otherwise they pass through. `gate = None` canonicalizes
    * every row (the reference's ungated label-normalization checks).
    *
    * Both replacements are computed against the INPUT frame in one
    * `withColumns` — a sequential `withColumn` pair would re-read the
    * already-rewritten value column when deciding the label.
    */
  def canonicalize(df: DataFrame, valueCol: String, labelCol: String,
                   freeText: Column, rules: Seq[Rule],
                   gate: Option[String] = Some("Oth")): DataFrame = {
    val m = matched(freeText, rules)
    val gated = gate.map(g => col(valueCol) === g).getOrElse(lit(true))
    val hit = gated && m.isNotNull
    df.withColumns(Map(
      valueCol -> when(hit, m.getField("value")).otherwise(col(valueCol)),
      labelCol -> when(hit, m.getField("label")).otherwise(col(labelCol))))
  }
}
