package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage (entity resolution) — the step that joins
  * two tables on NAMES instead of keys: customer/supplier registries,
  * crawl metadata vs a curated catalog, any "same entity, different
  * spelling" reconciliation. Reference analogue: the fuzzy label recode
  * (`data_fix`'s dictionary repair, q47) fixes one table's variants
  * against a dictionary; linkage matches two tables against each other.
  *
  * Method: classic blocking + Jaro-Winkler scoring + per-left argmax
  * (Fellegi-Sunter's deterministic core without the EM weighting):
  *  - BLOCK on (`blockFn(name)`, length band); the left side also emits
  *    the ±1 neighbor bands, so near-length variants (a dropped char, a
  *    doubled letter) still meet. Blocking is the recall/COST dial — at
  *    100 TB the all-pairs product is off the table, and every candidate
  *    pair must share a block. The default `blockFn` (first char) is the
  *    textbook choice for natural names; over a small shared vocabulary
  *    it degenerates (1/alphabet of each side per block — q170 measured
  *    65 s at sf0.1 before switching its block to the registry-number
  *    token, ~1 s after). Pick the most selective stable feature; widen
  *    with additional block functions (phonetic key, token sets) when
  *    recall demands, and remember every block choice trades away the
  *    matches whose perturbation hits the blocked feature itself.
  *  - SCORE with `graft_jaro_winkler` (codegen kernel, semantics pinned
  *    to the oracle engine's implementation), round to 4 dp.
  *  - RESOLVE each left record to its best right match by a bounded
  *    hash aggregation (`graft_min_by` on (−sim, right id)) — never a
  *    window sort over the candidate stream.
  *
  * Scale notes: one shuffle on the block key for the join (first-letter
  * skew is real — AQE skew-join or an extra block char handles hot
  * letters), one hash agg on the left id for the argmax. Kernel scoring
  * touches only co-blocked pairs.
  */
object Linkage {

  /** Best right-side match per left record with `sim >= minSim`.
    * @return (leftId, rightId, sim) — at most one row per left id;
    *         left records with no candidate above `minSim` are absent
    *         (left-join the output to keep them).
    */
  def bestMatches(left: DataFrame, right: DataFrame,
                  leftId: String, rightId: String,
                  leftName: String, rightName: String,
                  minSim: Double = 0.9, lenBand: Int = 4,
                  blockFn: Column => Column = c => substring(c, 1, 1)): DataFrame = {
    require(minSim >= 0 && minSim <= 1, s"minSim must be in [0,1], got $minSim")
    require(lenBand >= 1, s"lenBand must be >= 1, got $lenBand")
    graft.functions.GraftFunctions.ensureRegistered(left.sparkSession)
    def norm(c: Column): Column = lower(trim(c))
    val l0 = left.select(col(leftId).as("__lid"), norm(col(leftName)).as("__ln"))
      .filter(col("__ln").isNotNull && length(col("__ln")) > 0)
    val r0 = right.select(col(rightId).as("__rid"), norm(col(rightName)).as("__rn"))
      .filter(col("__rn").isNotNull && length(col("__rn")) > 0)
    val lb = l0
      .withColumn("__d", explode(array(lit(-1), lit(0), lit(1))))
      .select(col("__lid"), col("__ln"),
        blockFn(col("__ln")).as("__c"),
        ((length(col("__ln")) / lenBand).cast("int") + col("__d")).as("__b"))
    val rb = r0.select(col("__rid"), col("__rn"),
      blockFn(col("__rn")).as("__c"),
      (length(col("__rn")) / lenBand).cast("int").as("__b"))
    val scored = lb.join(rb, Seq("__c", "__b"))
      .select(col("__lid"), col("__rid"),
        round(call_function("graft_jaro_winkler", col("__ln"), col("__rn")), 4)
          .as("sim"))
      .filter(col("sim") >= minSim)
    scored.groupBy(col("__lid"))
      .agg(call_function("graft_min_by",
        struct(col("__rid"), col("sim")), struct(-col("sim"), col("__rid"))).as("__w"))
      .select(col("__lid").as(leftId), col("__w.__rid").as(rightId),
        col("__w.sim").as("sim"))
  }
}
