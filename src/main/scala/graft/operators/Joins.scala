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

  /** Clinical-measurement match score for [[bestMatch]] — the reference's
    * `calculate_match_score` (reference: derive_data/
    * create_joined_table_and_derived_columns.py:268): each (left, right,
    * maxPts, perUnit) pair contributes `max(0, maxPts − |l−r|/perUnit)`
    * when BOTH sides parse as numbers, nothing otherwise; a row where NO
    * pair is comparable scores −1 (the "no data to compare" sentinel that
    * triggers keep-first resolution). Values arrive as strings in the
    * reference (form exports), so both sides go through `try_cast` —
    * garbage skips the comparison instead of throwing under ANSI — and
    * `!isnan` keeps a literal "nan" from poisoning the sum.
    *
    * Pure codegen arithmetic: one projection, no UDF, no extra scan.
    */
  def matchScore(pairs: Seq[(Column, Column, Double, Double)]): Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DoubleType
    require(pairs.nonEmpty, "matchScore needs at least one comparison pair")
    val contribs = pairs.map { case (l, r, maxPts, perUnit) =>
      val a = l.try_cast(DoubleType)
      val b = r.try_cast(DoubleType)
      val comparable = a.isNotNull && !isnan(a) && b.isNotNull && !isnan(b)
      (comparable, greatest(lit(0.0), lit(maxPts) - abs(a - b) / lit(perUnit)))
    }
    val nComparisons = contribs.map { case (c, _) =>
      when(c, 1).otherwise(0) }.reduce(_ + _)
    val total = contribs.map { case (c, v) =>
      when(c, v).otherwise(0.0) }.reduce(_ + _)
    when(nComparisons === 0, lit(-1.0)).otherwise(total)
  }

  /** Best-match left join: each `left` row keeps exactly ONE `right`
    * match — the candidate with the highest `score`, ties and the
    * all-scores-−1 case resolved by SMALLEST `keepFirstBy` (the
    * reference's "keep first discharge" input-order fallback; reference:
    * create_joined_table_and_derived_columns.py:330-395
    * `resolve_duplicate_matches` — `idxmax` over scores ≥ 0, `iloc[0]`
    * when every score is −1). Unmatched left rows survive with null
    * right columns, so the output has exactly one row per distinct
    * `leftId` — a multi-match right side can no longer inflate the left.
    *
    * Right-side columns colliding with left names are suffixed
    * `rightSuffix` (the reference's pandas `suffixes=('', '_discharge')`),
    * so `score`/`keepFirstBy` expressions name columns unambiguously.
    *
    * Scale notes: this is the join's shuffle plus ONE hash aggregation —
    * `graft_max_by(payload, struct(score, …))` ([[graft.functions
    * .HashExtremumBy]]) partial-aggregates map-side and shuffles one row
    * per leftId per map task. When `leftId ⊇ on`, the aggregation reuses
    * the join's hash partitioning (no second exchange). A window
    * `row_number() ... = 1` plan would sort every candidate instead.
    */
  def bestMatch(left: DataFrame, right: DataFrame, on: Seq[String],
                leftId: Seq[String], score: DataFrame => Column,
                keepFirstBy: DataFrame => Column,
                rightSuffix: String = "_r",
                nullSafeOn: Boolean = false): DataFrame = {
    // named import: the wildcard would shadow the left/right params with
    // functions.left/right
    import org.apache.spark.sql.functions.{call_function, col, struct}
    require(rightSuffix.nonEmpty, "rightSuffix must be non-empty")
    graft.functions.GraftFunctions.ensureRegistered(left.sparkSession)
    // case-INSENSITIVE collision check: Spark's default resolver is case-
    // insensitive, so left "temp_value" and right "Temp_value" would be
    // ambiguous post-join even though the names differ byte-wise
    val leftCols =
      left.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val onLower = on.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    // a pre-existing "<col><suffix>" would make the rename COLLIDE (two
    // case-equal names post-join) — refuse rather than bind wrong. The
    // right side can collide too: right {c, c+suffix} with left {c}
    // renames c onto the UNRENAMED right c+suffix.
    val rightLower =
      right.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val suffixLower = rightSuffix.toLowerCase(java.util.Locale.ROOT)
    right.columns.foreach { c =>
      val lc = c.toLowerCase(java.util.Locale.ROOT)
      if (leftCols.contains(lc) && !onLower.contains(lc)) {
        require(!leftCols.contains(lc + suffixLower),
          s"bestMatch rename target '$c$rightSuffix' already exists on the " +
            "left side — pick a different rightSuffix")
        require(!rightLower.contains(lc + suffixLower),
          s"bestMatch rename target '$c$rightSuffix' already exists on the " +
            "right side — pick a different rightSuffix")
      }
    }
    val renamed = right.columns.foldLeft(right) { (df, c) =>
      val lc = c.toLowerCase(java.util.Locale.ROOT)
      if (leftCols.contains(lc) && !onLower.contains(lc))
        df.withColumnRenamed(c, c + rightSuffix)
      else df
    }
    // nullSafeOn: a NULL join-key value matches NULL (pandas merge
    // semantics — the reference joins on (uid, facility) where facility
    // may be missing on BOTH sides of a real pair). Plain using-join
    // EqualTo would silently never match those rows.
    val joined =
      if (!nullSafeOn) left.join(renamed, on, "left")
      else {
        val onSuffix = "__on"
        val rightOn = on.foldLeft(renamed)((df, c) =>
          df.withColumnRenamed(c, c + onSuffix))
        val cond = on.map(c => left(c) <=> rightOn(c + onSuffix)).reduce(_ && _)
        left.join(rightOn, cond, "left").drop(on.map(_ + onSuffix): _*)
      }
    val payload = struct(joined.columns.map(col).toIndexedSeq: _*)
    val s = score(joined)
    val kf = keepFirstBy(joined)
    // min_by over (−score, keyIsNull, key): highest score wins (−score
    // smallest), then the SMALLEST keepFirstBy — negating the score
    // instead of the key keeps `keepFirstBy` free to be any orderable
    // type (timestamp, string), not just numeric. The isNull field keeps
    // a null key from beating real keys under min (nulls-last, the same
    // guard as [[Dedup.keepFirst]]).
    val ord = struct(-s, kf.isNull, kf)
    joined.groupBy(leftId.map(col).toIndexedSeq: _*)
      .agg(call_function("graft_min_by", payload, ord).as("__row"))
      .select(col("__row.*"))
  }

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
