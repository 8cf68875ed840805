package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unique-key repair for missing or colliding record ids.
  *
  * Reference semantics: when a session has no usable uid, the reference
  * derives a fallback key from the first present date-ish entry
  * (DateAdmission, DateTimeAdmission, DateTimeDeath, DateTimeDischarge,
  * DateDischarge, DateDeath, DateBCT — reference:
  * data_tyding/regenerate_unique_key.py:10); and separately it has to cope
  * with two DIFFERENT records sharing one uid (reference:
  * queries/fix_duplicate_uids_for_diff_records.py:3, a manual-repair
  * report). Both repairs land here as one pass:
  *
  *  - uid present, all its rows identical in content → keep uid.
  *  - uid missing → first non-null fallback value.
  *  - uid shared by different content, fallback present → `uid#fallback`.
  *    A resubmission (same record, corrected fields) shares its date
  *    fallback, so both copies get the SAME key and keep-latest dedup
  *    still collapses them; two genuinely different records carry
  *    different dates, get distinct keys, and both survive with their
  *    lineage to the shared uid intact.
  *  - uid colliding with NO fallback → the bare uid. Nothing then
  *    distinguishes a resubmission from a shared-uid pair, and the
  *    reference's default for that case IS keep-latest dedup on the uid
  *    (its collision report is a manual escalation); ship a date-bearing
  *    fallback to get splitting.
  *  - nothing available → NULL; callers route those to an exceptions
  *    table (ReferencePipeline does).
  *
  * Collisions are detected within (uid, scopeCols): pass the script id as
  * scope so an admission and a discharge legitimately sharing a uid are
  * NOT a collision. Rows whose content columns are entirely NULL
  * contribute no variant (matching SQL `COUNT(DISTINCT …)` semantics).
  *
  * Scale notes: content identity is an 8-byte xxhash64 over the content
  * columns, so the collision scan is a groupBy(uid) of slim rows plus one
  * shuffle join back on uid — no windows, no driver collects. Same
  * documented 2^-64 hash-collision acceptance as the near-dup family.
  */
object KeyRepair {

  /** The reference's fallback key precedence, as entry-column names. */
  val referenceFallbackKeys: Seq[String] = Seq(
    "DateAdmission", "DateTimeAdmission", "DateTimeDeath",
    "DateTimeDischarge", "DateDischarge", "DateDeath", "DateBCT")

  /** Adds `unique_key` per the rules above. `contentCols` define record
    * identity (two rows agreeing on all of them are the SAME record);
    * `fallbacks` are tried in order for missing/colliding uids;
    * `scopeCols` widen the collision-detection key (usually the script
    * id — records of DIFFERENT scripts sharing a uid are related forms of
    * one patient, not a collision).
    */
  def regenerateUniqueKeys(df: DataFrame, uidCol: String,
                           contentCols: Seq[String],
                           fallbacks: Seq[Column],
                           scopeCols: Seq[String] = Nil): DataFrame = {
    require(contentCols.nonEmpty && fallbacks.nonEmpty,
      "regenerateUniqueKeys needs content columns and at least one fallback")
    // variadic xxhash64 mixes each column with its type and position — no
    // separator ambiguity; masked to NULL when every content column is
    // null so count_distinct skips it (SQL COUNT(DISTINCT) parity — the
    // correctness oracle relies on it)
    val contentHash = when(
      coalesce(contentCols.map(c => col(c).cast("string")): _*).isNotNull,
      xxhash64(contentCols.map(col): _*))
    val fb = coalesce(fallbacks.map(_.cast("string")): _*)
    val keyCols = uidCol +: scopeCols
    val variants = df.filter(col(uidCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count_distinct(contentHash).as("__n_variants"))
    df.join(variants, keyCols, "left") // name-based: null uids simply miss
      .withColumn("unique_key",
        when(col(uidCol).isNull, fb)
          .when(col("__n_variants") > 1,
            // concat_ws skips a null fb, yielding the bare uid — the
            // documented no-fallback behavior (keep-latest dedup wins)
            concat_ws("#", col(uidCol).cast("string"), fb))
          .otherwise(col(uidCol).cast("string")))
      .drop("__n_variants")
  }
}
