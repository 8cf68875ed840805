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
  *  - uid shared by different content → `uid#fallback`, so both records
  *    survive with distinct keys AND keep their lineage to the shared uid
  *    (the reference's report exists precisely to stop dedup from
  *    swallowing one of them).
  *  - nothing available → NULL; callers route those to an exceptions
  *    table (ReferencePipeline does).
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
    * `fallbacks` are tried in order for missing/colliding uids.
    */
  def regenerateUniqueKeys(df: DataFrame, uidCol: String,
                           contentCols: Seq[String],
                           fallbacks: Seq[Column]): DataFrame = {
    require(contentCols.nonEmpty && fallbacks.nonEmpty,
      "regenerateUniqueKeys needs content columns and at least one fallback")
    // variadic xxhash64 mixes each column with its type and position — no
    // separator ambiguity, nulls handled natively
    val contentHash = xxhash64(contentCols.map(col): _*)
    val fb = coalesce(fallbacks.map(_.cast("string")): _*)
    val variants = df.filter(col(uidCol).isNotNull)
      .groupBy(col(uidCol).as("__uid"))
      .agg(count_distinct(contentHash).as("__n_variants"))
    df.join(variants, col(uidCol) === col("__uid"), "left")
      .withColumn("unique_key",
        when(col(uidCol).isNull, fb)
          .when(col("__n_variants") > 1,
            concat_ws("#", col(uidCol).cast("string"), fb))
          .otherwise(col(uidCol).cast("string")))
      .drop("__uid", "__n_variants")
  }
}
