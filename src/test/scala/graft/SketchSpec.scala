package graft

import org.apache.spark.sql.functions._
import graft.operators.Summaries
import graft.sources.Tables

/** Mergeable HLL distinct-sketch contract: the publish-once / merge-
  * forever pattern. The estimates are approximate, so the gate here is
  * the spec (no DuckDB oracle can replay another engine's sketch):
  *  1. merging per-part sketches is LOSSLESS vs sketching the whole
  *     directly (register-wise max — the property that makes daily
  *     incremental publishes composable),
  *  2. the estimate tracks the exact distinct count within the
  *     published error envelope,
  *  3. group roll-ups answer from sketches alone (no raw rescan).
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("merging daily sketches ≡ sketching the whole stream (lossless)") {
    val e = Tables.events(spark, sf).withColumn("day", to_date(col("ts")))
    val daily = Summaries.distinctSketch(e, Seq("day"), "user_id")
    val mergedEst = Summaries.mergeDistinctSketches(daily, Seq.empty)
      .head().getAs[Long]("n_distinct_est").toDouble
    val oneShotEst = Summaries.mergeDistinctSketches(
      Summaries.distinctSketch(e, Seq.empty, "user_id"), Seq.empty)
      .head().getAs[Long]("n_distinct_est").toDouble
    assert(mergedEst === oneShotEst) // exact equality — merge is lossless
  }

  test("estimate tracks exact distinct within the lgK=12 error envelope") {
    val e = Tables.events(spark, sf)
    val exact = e.select(countDistinct(col("user_id"))).head().getLong(0)
    val est = Summaries.mergeDistinctSketches(
      Summaries.distinctSketch(e, Seq.empty, "user_id"), Seq.empty)
      .head().getAs[Long]("n_distinct_est").toDouble
    // 3σ at lgK=12 is ~3·1.04/√4096 ≈ 4.9%
    assert(math.abs(est - exact) / exact < 0.05,
      s"estimate $est vs exact $exact")
  }

  test("group roll-up (day → week) answers from the sketch table alone") {
    val e = Tables.events(spark, sf).withColumn("day", to_date(col("ts")))
    val daily = Summaries.distinctSketch(e, Seq("day"), "user_id")
      .withColumn("week", weekofyear(col("day")))
    val weekly = Summaries.mergeDistinctSketches(daily, Seq("week"))
    val exactWeekly = e.withColumn("week", weekofyear(col("day")))
      .groupBy("week").agg(countDistinct(col("user_id")).as("exact"))
    val joined = weekly.join(exactWeekly, Seq("week")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val est = r.getAs[Long]("n_distinct_est").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(est - exact) / exact < 0.05,
        s"week ${r.get(0)}: estimate $est vs exact $exact")
    }
  }
}
