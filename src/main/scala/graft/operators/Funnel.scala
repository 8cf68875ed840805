package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: how far each entity progresses through an
  * event-type sequence where every step must happen strictly AFTER the
  * previous one — the signup → activation → purchase progression measure
  * of product analytics (and the screening → admission → outcome
  * progression of clinical registries).
  *
  * Semantics: `t1` = the entity's earliest step-1 event; `tN` = the
  * earliest step-N event strictly after `t(N−1)`; a missed step leaves
  * every later step NULL (the funnel is ordered, not a bag of types).
  * `steps_completed` counts the non-NULL prefix. Entities with no step-1
  * event still get a row (steps_completed = 0) — funnels report the
  * drop-off base, not just converters.
  *
  * Scale notes: one filtered aggregation per step, every shuffle keyed on
  * the SAME entity column — the per-step join and aggregation reuse the
  * hash(key) partitioning instead of introducing new exchange keys, and
  * the per-step event filter (`typeCol = step`) pushes into the scan.
  * Step state per entity is one timestamp, never an event list — no
  * collect_list, no per-entity sort, memory O(1) per entity regardless
  * of event count.
  */
object Funnel {

  def funnelSteps(df: DataFrame, keyCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelSteps needs at least one step")
    val reserved = steps.indices.map(i => s"t${i + 1}") :+ "steps_completed"
    df.columns.find(c => reserved.exists(_.equalsIgnoreCase(c))).foreach { c =>
      throw new IllegalArgumentException(
        s"funnelSteps output column '$c' already exists on the input")
    }
    var acc = df.select(col(keyCol)).distinct()
    steps.zipWithIndex.foreach { case (step, i) =>
      val tname = s"t${i + 1}"
      val events = df.filter(col(typeCol) === step)
        .select(col(keyCol), col(tsCol))
      val gated =
        if (i == 0) events
        else events.join(acc.select(col(keyCol), col(s"t$i")), Seq(keyCol))
          .filter(col(tsCol) > col(s"t$i")) // NULL t(i) drops here: ordered
      acc = acc.join(
        gated.groupBy(keyCol).agg(min(tsCol).as(tname)), Seq(keyCol), "left")
    }
    acc.withColumn("steps_completed",
      steps.indices.map(i => when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
        .reduce(_ + _))
  }

  /** Top-K most common session paths: sessions split on `gapSec`-second
    * inactivity (the q33 rule), each session's first `maxLen` event types
    * joined into a path string, counted corpus-wide, top-K by (count
    * desc, path asc). The "what do users actually do" view — funnels
    * measure ONE hypothesized sequence, paths surface the real ones.
    *
    * Scale notes: sessionization is the one key shuffle + sort; the path
    * build is a per-session `sort_array(collect_list)` whose size is
    * bounded by the session gap (and hard-capped at `maxLen` in the
    * output), then ONE path-count hash agg and ONE global bounded-heap
    * top-K — no second sort, no global ranking window.
    */
  def topPaths(df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
               gapSec: Long = 1800, maxLen: Int = 8,
               topK: Int = 20): DataFrame = {
    require(maxLen >= 1 && topK >= 1, "maxLen and topK must be >= 1")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    Seq("__new", "__sess").foreach { reserved =>
      require(!df.columns.exists(_.equalsIgnoreCase(reserved)),
        s"topPaths uses '$reserved' internally — rename the existing column")
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(typeCol))
    val newSess = when(unix_timestamp(col(tsCol)) -
      unix_timestamp(lag(col(tsCol), 1).over(w)) > gapSec, 1L).otherwise(lit(0L))
    val sessions = df
      .withColumn("__new", coalesce(newSess, lit(0L)))
      .withColumn("__sess", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val paths = sessions
      .groupBy(col(keyCol), col("__sess"))
      .agg(concat_ws(">", slice(transform(
        sort_array(collect_list(struct(col(tsCol), col(typeCol)))),
        s => s.getField(typeCol)), 1, maxLen)).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
    paths.groupBy()
      .agg(call_function("graft_top_k_by",
        struct(col("path"), col("n_sessions")), col("n_sessions"), col("path"),
        lit(topK)).as("top"))
      .select(posexplode(col("top")))
      .select(col("col.path").as("path"), col("col.n_sessions").as("n_sessions"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** First-order (Markov) transition matrix over consecutive events per
    * entity: for every (from_type → to_type) pair, the transition count
    * and conditional probability p(to | from). The behavioral fingerprint
    * that powers next-step prediction baselines and anomaly screens.
    * `tieCol` must make (tsCol, tieCol) a total order per entity.
    *
    * Scale notes: one key shuffle + sort (the lead window), one pair hash
    * agg; the per-from totals are an aggregation OF THE MATRIX (≤ |types|²
    * rows), broadcast back — the raw events are scanned exactly once.
    * p = exact integer count ÷ exact integer total: engine-portable
    * without rounding.
    */
  def transitionMatrix(df: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .withColumn("__to", lead(col(typeCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__to").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum("n").as("n_from"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .withColumn("p", col("n").cast("double") / col("n_from"))
  }

  /** Exponentially time-decayed engagement per entity: Σ value·2^(−Δt/h)
    * with Δt in days before `refTsSeconds` and half-life `halfLifeDays` —
    * the recency-weighted activity score behind freshness-aware sampling
    * and user/source prioritization (an event h days old counts half,
    * 2h days old a quarter). Emits (key, n_events, last_ts,
    * decayed_value).
    *
    * Scale notes: the decay factor is a pure per-row codegen projection
    * (no window, no self-join against "now"), then ONE map-side-combined
    * hash agg on the key. Each term is rounded to 9 dp and
    * decimal-summed, so the result is independent of partial-agg order
    * and engine (the [[Sampling]] portability discipline — a pow() ulp
    * can't move a 9-dp-quantized term). NULL ts/value rows and non-finite
    * values are excluded (NaN ≡ missing; a single ±Inf would absorb the
    * whole sum); rows AFTER the reference instant get factors > 1 by the
    * same formula — callers wanting a hard cutoff filter first.
    */
  def decayedEngagement(df: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String, refTsMicros: Long,
                        halfLifeDays: Double): DataFrame = {
    require(halfLifeDays > 0, s"halfLifeDays must be > 0, got $halfLifeDays")
    val v = col(valueCol).cast("double")
    // MICROsecond-exact Δt (events carry sub-second timestamps; a
    // truncated-seconds Δt shifts every factor by up to ~1e-5 relative
    // and is not what another engine replays)
    val dtDays = (lit(refTsMicros) - unix_micros(col(tsCol)))
      .cast("double") / lit(86400e6)
    val term = round(v * pow(lit(2.0), -dtDays / lit(halfLifeDays)), 9)
    df.filter(col(tsCol).isNotNull && v.isNotNull && !isnan(v) &&
        v > Double.NegativeInfinity && v < Double.PositiveInfinity)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), max(col(tsCol)).as("last_ts"),
        sum(term.cast("decimal(28,9)")).cast("double").as("decayed_value"))
  }
}
