package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Summaries

/** Continuous distribution-drift monitoring: the streaming form of q104's
  * PSI monitor. The reference distribution is frozen ONCE as equi-width
  * bin bounds (a plan-time constant, like a centroid matrix); the stream
  * then maintains per-(event-time window, column, bin) counts — the only
  * state, bounded by watermark × window × columns × bins — and each
  * window's PSI is finalized against the frozen reference counts when the
  * watermark closes it.
  *
  * Split into three steps on purpose:
  *  1. [[referenceProfile]] (batch, once) — bounds + per-bin reference
  *     counts,
  *  2. [[binnedCounts]] (the streaming query; append mode) — windowed
  *     counts with NO reference join inside the stream (nothing to
  *     broadcast per batch, state stays minimal),
  *  3. [[psiOfWindows]] (batch over the emitted counts, or inside a
  *     foreachBatch finalizer) — the [[Summaries.psiFromBinCounts]]
  *     formula keyed by (window, column), so a closed window's score is
  *     exactly what batch [[Summaries.psiDrift]] would compute over the
  *     same slice (spec-pinned).
  */
object StreamDrift {

  /** Frozen reference: bin bounds + per-(col_name, bin) counts. */
  final case class ReferenceProfile(bounds: Map[String, (Double, Double)],
                                    counts: DataFrame, nBins: Int)

  def referenceProfile(ref: DataFrame, cols: Seq[String],
                       nBins: Int = 10): ReferenceProfile = {
    require(cols.nonEmpty, "referenceProfile needs at least one column")
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val bounds = Summaries.referenceBins(ref, cols, nBins)
    val counts = entries(ref, cols)
      .withColumn("bin", Summaries.psiBinColumn(bounds, nBins))
      .filter(col("bin").isNotNull)
      .groupBy("col_name", "bin").agg(count(lit(1)).as("cr"))
    ReferenceProfile(bounds, counts, nBins)
  }

  /** The streaming query: per-(window, column, bin) counts in append mode.
    * State = open windows × |cols| × nBins rows — independent of event
    * volume; the bin CASE is codegen over the frozen bounds.
    */
  def binnedCounts(stream: DataFrame, tsCol: String, delay: String,
                   windowLen: String, cols: Seq[String],
                   profile: ReferenceProfile): DataFrame =
    entries(stream.withWatermark(tsCol, delay), cols, keep = Seq(tsCol))
      .withColumn("bin", Summaries.psiBinColumn(profile.bounds, profile.nBins))
      .filter(col("bin").isNotNull)
      .groupBy(window(col(tsCol), windowLen), col("col_name"), col("bin"))
      .agg(count(lit(1)).as("cc"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("col_name"), col("bin"), col("cc"))

  /** Finalize: PSI per (window, column) from the emitted counts. Every
    * reference bin participates in every window (a window that never hit
    * a bin still owes that bin's mass-loss term) AND every stream-only
    * bin keeps its mass-gain term with cr = 0 — a full outer join, so a
    * closed window scores exactly what batch psiDrift would over the
    * same slice.
    */
  def psiOfWindows(windowCounts: DataFrame, profile: ReferenceProfile,
                   floor: Double = 1e-4): DataFrame = {
    val windows = windowCounts.select("window_start", "window_end").distinct()
    // the stream side re-aliases every column (fresh attributes): the
    // windows frame above derives FROM windowCounts, and joining a frame
    // back onto its own lineage trips Catalyst's conflicting-reference
    // check on a full outer join
    val wc = windowCounts.select(col("window_start").as("w_start"),
      col("window_end").as("w_end"), col("col_name").as("c_name"),
      col("bin").as("c_bin"), col("cc"))
    val refW = windows.crossJoin(profile.counts) // |windows| × cols × bins
    val frame = refW.join(wc,
        refW("window_start") === wc("w_start") &&
          refW("window_end") === wc("w_end") &&
          refW("col_name") === wc("c_name") && refW("bin") === wc("c_bin"),
        "full_outer")
      .select(
        coalesce(col("window_start"), col("w_start")).as("window_start"),
        coalesce(col("window_end"), col("w_end")).as("window_end"),
        coalesce(refW("col_name"), col("c_name")).as("col_name"),
        coalesce(refW("bin"), col("c_bin")).as("bin"),
        coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("cc"), lit(0L)).as("cc"))
    Summaries.psiFromBinCounts(frame,
      Seq("window_start", "window_end", "col_name"), floor)
  }

  /** (col_name, v [, keep...]) entries over the numeric columns — NaN ≡
    * missing, like the batch family.
    */
  private def entries(df: DataFrame, cols: Seq[String],
                      keep: Seq[String] = Nil): DataFrame =
    df.select(keep.map(col) :+ explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("double").as("v"))): _*)).as("e"): _*)
      .select(keep.map(col) :+ col("e.col_name").as("col_name") :+
        col("e.v").as("v"): _*)
      .filter(col("v").isNotNull && !isnan(col("v")))
}
