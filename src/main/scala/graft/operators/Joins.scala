package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Join-shaped operators from the reference's derive/check stages.
  *
  * Reference semantics:
  *  - admissions ⟕ discharges on uid with derived outcome columns
  *    (reference: derive_data/create_joined_table_and_derived_columns.py:1)
  *  - admissions_without_discharges / discharges_not_matched → anti-joins
  *    (reference: queries/assorted_queries.py)
  *  - check_row_exists_sql.py → semi-join existence checks.
  *
  * Scale notes: dimension tables are broadcast (`broadcast(dim)`) so the
  * fact side never shuffles for the join; fact-fact joins shuffle on the
  * join key and rely on AQE for skew splitting. Anti/semi joins keep only
  * the key columns of the right side on the wire.
  */
object Joins {

  /** Left join a fact to a (small) dimension, broadcasting the dimension. */
  def enrich(fact: DataFrame, dim: DataFrame, joinExpr: Column, how: String = "left"): DataFrame =
    fact.join(broadcast(dim), joinExpr, how)

  /** Rows of `left` with no match in `right` (reference:
    * admissions_without_discharges). Broadcast the right side when small —
    * anti-join only needs its keys.
    */
  def unmatched(left: DataFrame, right: DataFrame, joinExpr: Column, broadcastRight: Boolean = true): DataFrame =
    left.join(if (broadcastRight) broadcast(right) else right, joinExpr, "left_anti")

  /** Rows of `left` that have at least one match in `right`. */
  def existing(left: DataFrame, right: DataFrame, joinExpr: Column, broadcastRight: Boolean = true): DataFrame =
    left.join(if (broadcastRight) broadcast(right) else right, joinExpr, "left_semi")

  /** Skew-beating salted equi-join: the big side gets a deterministic salt
    * in [0, buckets) derived from `saltSrc` (any column that spreads rows
    * of one hot key — a unique id, an ingest offset); the small side is
    * replicated once per salt. The shuffle key becomes (key, salt), so a
    * hot key's rows land on `buckets` reducers instead of one.
    *
    * Use when ONE side is skewed and the other is small-ish but too big or
    * too dynamic to broadcast. AQE's skew-join split handles moderate skew
    * without this; salting is the deterministic heavy hammer for known
    * pathological keys at 100 TB.
    */
  def salted(big: DataFrame, small: DataFrame, key: String, saltSrc: Column,
             buckets: Int, how: String = "inner"): DataFrame = {
    import org.apache.spark.sql.functions._
    // right/full outer would emit `buckets` null-padded copies of every
    // unmatched small-side row (it was replicated per salt) — reject
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
        .contains(how.toLowerCase.replace("_", "")),
      s"salted join supports inner/left/left_semi/left_anti, not '$how' " +
        "(outer-on-small-side would duplicate unmatched replicated rows)")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(saltSrc), lit(buckets)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigS.join(smallS, Seq(key, "__salt"), how).drop("__salt")
  }
}
