package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

/** Pins [[Joins.autoDecide]]'s routing on the three canonical shapes —
  * broadcast on a dim-sized right, salted on the q38-style hot-key
  * fixture, plain on balanced sides — and that every route returns the
  * same rows (salting/broadcast only change physical distribution).
  */
class JoinsAutoSpec extends SparkSpec {
  import spark.implicits._

  // q38-shaped skew: half the fact lands on key 0, the rest spreads
  private lazy val skewedLeft = spark.range(0, 20000)
    .select(col("id").as("row_id"),
      when(pmod(col("id"), lit(2)) === 0, 0L)
        .otherwise(pmod(col("id"), lit(100))).as("k"))
    .cache()
  private lazy val dim25 = spark.range(0, 25)
    .select(col("id").as("k"), concat(lit("name_"), col("id")).as("nm"))
    .cache()
  private lazy val balancedRight = spark.range(0, 5000)
    .select(pmod(col("id"), lit(100)).as("k"), col("id").as("payload"))
    .cache()

  test("autoDecide routes broadcast on a dim-sized right side") {
    val d = Joins.autoDecide(skewedLeft, dim25, "k")
    assert(d.route === "broadcast")
    assert(d.rowsRight === 25L)
  }

  test("auto broadcast route builds a broadcast hash join") {
    val df = Joins.auto(skewedLeft, dim25, "k")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected BHJ in:\n$plan")
  }

  test("autoDecide routes salted on the hot-key fixture, sized from the skew") {
    // right side above the (lowered) broadcast limit but under the salted
    // replication limit; hot key 0 carries 10k of 20k rows (mean mult 198)
    val d = Joins.autoDecide(skewedLeft, dim25, "k",
      broadcastRowLimit = 10L, minHotRows = 100L, rowsPerBucket = 500L)
    assert(d.route === "salted")
    assert(d.maxLeftMult === 10000L)
    assert(d.buckets === 20, s"ceil(10000/500): got ${d.buckets}")
  }

  test("autoDecide routes plain on balanced sides and when right too big to salt") {
    val balanced = Joins.autoDecide(
      spark.range(0, 10000).select(pmod(col("id"), lit(1000)).as("k")),
      balancedRight, "k", broadcastRowLimit = 10L, minHotRows = 1L)
    assert(balanced.route === "plain") // mean mult 10 == max mult 10, no skew
    val bigRight = Joins.autoDecide(skewedLeft, balancedRight, "k",
      broadcastRowLimit = 10L, minHotRows = 100L, saltedRightRowLimit = 100L)
    assert(bigRight.route === "plain") // skewed, but right too big to replicate
  }

  test("every route returns identical rows") {
    val expected = skewedLeft.join(dim25, Seq("k"), "inner")
      .select("row_id", "k", "nm").collect().map(_.toSeq).toSet
    def got(d: Joins.AutoJoinDecision) =
      Joins.auto(skewedLeft, dim25, "k", decision = Some(d))
        .select("row_id", "k", "nm").collect().map(_.toSeq).toSet
    assert(got(Joins.AutoJoinDecision("broadcast", 1, 25, 0, 0)) === expected)
    assert(got(Joins.AutoJoinDecision("salted", 8, 25, 10000, 198)) === expected)
    assert(got(Joins.AutoJoinDecision("plain", 1, 25, 10000, 198)) === expected)
  }

  test("sampled profile still finds the hot key (scaled back up)") {
    val d = Joins.autoDecide(skewedLeft, dim25, "k", sampleFraction = 0.2,
      broadcastRowLimit = 10L, minHotRows = 100L, rowsPerBucket = 500L)
    assert(d.route === "salted")
    // sampled max mult scales by 1/fraction: expect within 2x of 10000
    assert(d.maxLeftMult > 5000L && d.maxLeftMult < 20000L, d.toString)
  }

  test("salted route degrades to plain for outer joins (replication caveat)") {
    val d = Joins.AutoJoinDecision("salted", 8, 25, 10000, 198)
    val df = Joins.auto(skewedLeft, dim25, "k", how = "full_outer",
      decision = Some(d))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("__salt"), "outer join must not take the salted route")
  }
}
