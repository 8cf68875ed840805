package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix curation: deterministic per-stratum document selection.
  *
  * A pretraining pipeline rarely takes a corpus whole — it takes "N
  * tokens of lang=X, M tokens of source=Y" mixes. These operators make
  * that selection reproducible (no RNG in the cut decision) and
  * Spark-native.
  *
  * Scale notes: the budget cut is a running sum WINDOW per stratum — one
  * shuffle on the stratum key plus a per-stratum sort. That is the honest
  * cost of an order-dependent cut; when any-subset-of-the-right-size is
  * acceptable, prefer [[stratifiedFractions]] (pure map-side filter, no
  * shuffle at all). Strata counts are typically few (languages, sources),
  * so AQE's skew handling covers a dominant stratum.
  */
object Sampling {

  /** Keep documents, in `order` within each stratum, until each stratum's
    * token budget is exhausted: a doc is kept iff the budget was not
    * already spent when it started (the doc that CROSSES the budget line
    * is kept, matching "take until you have at least N tokens").
    */
  def tokenBudgetPerStratum(df: DataFrame, stratumCol: Column, order: Seq[Column],
                            tokenCount: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(tokenCount).over(w))
      .filter(col("__cum") - tokenCount < budget)
      .drop("__cum")
  }

  /** Deterministic per-stratum fraction sampling WITHOUT a shuffle: keep a
    * row iff a uniform hash of its id lands under the stratum's fraction.
    * Unlike `DataFrame.sampleBy` (seeded RNG over row order) the decision
    * is a pure function of (id, seed), so it is stable across retries,
    * repartitions, and engines. Unknown strata default to fraction 0.
    */
  def stratifiedFractions(df: DataFrame, stratumCol: Column, idCol: Column,
                          fractions: Map[String, Double],
                          seed: Long = 42L): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    val frac = coalesce(element_at(typedLit(fractions), stratumCol), lit(0.0))
    // uniform in [0, 1): low 52 bits of xxhash64 → double — plenty of
    // entropy, engine-reproducible (xxhash64 is fixed by spec)
    val u = (pmod(xxhash64(idCol, lit(seed)), lit(1L << 52)).cast("double")
      / lit((1L << 52).toDouble))
    df.filter(u < frac)
  }
}
