package graft.plans

import org.apache.spark.sql.DataFrame

/** Plan utilities for ITERATIVE DataFrame algorithms (CC loops,
  * PageRank rounds, fold-the-output-back-in ingest chains).
  */
object Iterative {

  /** The iterative-fold lineage cut: `localCheckpoint()` semantics, but
    * the rebuilt leaf carries NO origin statistics. Plain
    * `localCheckpoint` preserves the child plan's Statistics, and a
    * join loop then SQUARES the carried sizeInBytes estimate every
    * fold — the BigInt's digits double per round until the driver
    * spends minutes in million-digit arithmetic inside statistics
    * estimation (measured: 10 s → 681 s per fold by fold 7 of the
    * ingest-CC chain, identical increments; see
    * [[org.apache.spark.sql.graftglue.StatsSafeCheckpoint]]).
    * Use this wherever a checkpointed frame re-enters a join in a
    * LOOP or is folded back in as the next cycle's input.
    */
  def cut(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftglue.StatsSafeCheckpoint(df)

  /** [[cut]] that ALSO answers "how many rows set boolean `flagCol`?"
    * in the SAME materialization job — the iterative loop's convergence
    * probe without a follow-up join + head action per round (r21: the
    * CC loop paid one such job every round). Retry-safe: the count sums
    * per-partition results, not accumulators.
    */
  def cutCounting(df: DataFrame, flagCol: String): (DataFrame, Long) =
    org.apache.spark.sql.graftglue.StatsSafeCheckpoint.counting(df, flagCol)
}
