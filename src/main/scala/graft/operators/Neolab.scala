package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The neolab (blood-culture lab results) episode summary — the
  * reference's `derived.summary_neolab` table (reference:
  * queries/create_summary_neolab_sql.py:30-66 +
  * assorted_queries.py:17 deduplicate_neolab_query).
  *
  * Semantics, clause by clause:
  *  - test-uid scrub: uploads whose uid starts with a test prefix
  *    (`0000`, `***`) never reach the summary (`uid NOT LIKE '0000%'
  *    AND uid NOT LIKE '***%'` — NULL uids fall out too, exactly like
  *    the SQL predicate).
  *  - keep-latest upload per (facility, uid, episode): `MAX(DateBCR)`
  *    per group, then a join back to EVERY culture row of that uid
  *    carrying the winning date — deliberately a fan-out, not a pick-one
  *    (one upload date can carry several cultures; all publish).
  *  - per-episode culture census: the reference's correlated
  *    `(SELECT count(uid) ... WHERE uid = ... AND episode = ...)`
  *    re-expressed as ONE `groupBy(uid, episode).count()` + join —
  *    a correlated subquery would rescan the table per row; the
  *    aggregate form is one map-side-combined pass.
  *  - `status`: BCType LIKE-recode (case-sensitive, like Postgres LIKE)
  *    to PRELIMINARY/FINAL, NULL when neither.
  *  - `date_bct`: the culture-taken date cast to DATE; `try_cast`, not
  *    cast — this summary exists to absorb messy exports, so garbage
  *    nulls out instead of aborting the publish (declared deviation
  *    from Postgres CAST-throws).
  *  - `combined_result`: the CASE family — coagulase-negative-staph
  *    positives and 'PC' are contaminants; preliminary results
  *    (`NegP`/`PosP`) whose report date is within `awaitDays` of
  *    `asOf` are 'Awaiting Final Result'; everything else passes the
  *    raw result through. `asOf` parameterizes the reference's
  *    CURRENT_DATE so runs are reproducible (pass `current_date()`
  *    for the cron behavior).
  *
  * Scale notes: three hash aggregations/joins, all keyed by uid — no
  * window sorts, no correlated rescans. The keep-latest group-by
  * partial-aggregates map-side; the join back and the census join both
  * shuffle on uid, so AQE coalesces them into the same exchange
  * layout. Nothing here is quadratic in cultures per episode.
  */
object Neolab {

  /** Default test-uid prefixes the reference scrubs. */
  val DefaultTestUidPrefixes: Seq[String] = Seq("0000", "***")

  /** Build the episode summary from a neolab-shaped frame.
    *
    * @param neolab one row per uploaded culture result
    * @param asOf   the "today" the awaiting-final-result window counts
    *               back from (reference: CURRENT_DATE)
    * @param awaitDays max age in days of a preliminary result still
    *               reported as awaiting (reference: 5)
    * Column parameters name the input columns (defaults = the names the
    * pipeline's wide extraction emits for the reference's form keys).
    */
  def episodeSummary(neolab: DataFrame, asOf: Column, awaitDays: Int = 5,
                     facilityCol: String = "facility",
                     uidCol: String = "uid",
                     episodeCol: String = "episode",
                     dateBcrCol: String = "DateBCR_value",
                     org1LabelCol: String = "Org1_label",
                     org1ValueCol: String = "Org1_value",
                     otherOrg1Col: String = "OtherOrg1_value",
                     bcResultCol: String = "BCResult_value",
                     bcTypeCol: String = "BCType_value",
                     dateBctCol: String = "DateBCT_value",
                     testUidPrefixes: Seq[String] = DefaultTestUidPrefixes): DataFrame = {
    // NOT startsWith(p) for each prefix: a NULL uid makes the conjunction
    // NULL and the filter drops it — the same rows Postgres's NOT LIKE
    // chain drops
    graft.functions.GraftFunctions.ensureRegistered(neolab.sparkSession)
    val scrub = testUidPrefixes
      .map(p => !col(uidCol).startsWith(p))
      .reduceOption(_ && _).getOrElse(lit(true))
    // graft_max_by, not max: a STRING max carries a var-width agg buffer,
    // which disqualifies HashAggregate and silently degrades the whole
    // keep-latest pass to SortAggregate (a sort of every map and reduce
    // partition); the typed-imperative form runs in ObjectHashAggregate —
    // no sorts, identical null semantics (null dates never win; an
    // all-null group yields null and is dropped by the inner join)
    val latest = neolab.filter(scrub)
      .groupBy(col(facilityCol).as("facility"), col(uidCol).as("uid"),
        col(episodeCol).as("episode"))
      .agg(call_function("graft_max_by", col(dateBcrCol), col(dateBcrCol))
        .as("date_bcr"))
    // census over the FULL input (the reference's correlated count runs
    // against the unscrubbed table; only scrubbed uids can join it, and a
    // uid's scrub status is uniform across its rows, so this matches)
    val census = neolab
      .groupBy(col(uidCol).as("__c_uid"), col(episodeCol).as("__c_episode"))
      .agg(count(col(uidCol)).as("n_cultures_episode"))
    val cultures = neolab.select(
      col(uidCol).as("__r_uid"), col(dateBcrCol).as("__r_bcr"),
      col(org1LabelCol).as("org1_label"), col(org1ValueCol).as("org1_value"),
      col(otherOrg1Col).as("other_org1_value"),
      col(bcResultCol).as("__r_result"), col(bcTypeCol).as("__r_bctype"),
      col(dateBctCol).as("__r_bct"))
    val status = when(col("__r_bctype").like("%PRELIMINARY%"), "PRELIMINARY")
      .when(col("__r_bctype").like("%FINAL%"), "FINAL")
    val combined = when(
        (col("__r_result") === "Pos" && col("org1_value") === "CONS") ||
          col("__r_result") === "PC", "Contaminant")
      .when(
        datediff(asOf.cast("date"), col("__r_bcr").try_cast("date")) <= awaitDays &&
          col("__r_result").isin("NegP", "PosP"), "Awaiting Final Result")
      .otherwise(col("__r_result"))
    latest
      .join(cultures,
        col("uid") === col("__r_uid") && col("date_bcr") === col("__r_bcr"))
      // LEFT join + coalesce-to-0, not inner: the reference's census is a
      // correlated scalar COUNT, which returns 0 — keeping the row — when
      // the episode is NULL (SQL `=` never matches NULL, so the subquery
      // sees no rows); an inner join here would silently DROP those rows
      .join(census,
        col("uid") === col("__c_uid") && col("episode") === col("__c_episode"),
        "left")
      .select(col("facility"), col("uid"), col("episode"), col("date_bcr"),
        col("org1_label"), col("org1_value"), col("other_org1_value"),
        col("__r_result").as("bc_result"), status.as("status"),
        col("__r_bct").try_cast("date").as("date_bct"),
        coalesce(col("n_cultures_episode"), lit(0L)).as("n_cultures_episode"),
        combined.as("combined_result"))
  }
}
