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
}
