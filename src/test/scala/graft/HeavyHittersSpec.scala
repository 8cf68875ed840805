package graft

import org.apache.spark.sql.functions._
import graft.operators.Summaries

/** Bounded-state exact heavy hitters ([[Summaries.heavyHitters]], q156):
  * equality with the naive full groupBy, the fail-fast exactness
  * certificate, tie determinism, and edge cases.
  */
class HeavyHittersSpec extends SparkSpec {

  private def naiveTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.where(col("key").isNotNull)
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key").asc).limit(k)
      .collect().map(_.toString).toSeq

  test("equals the naive groupBy top-k on a skewed key, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 10 hot keys carry ~80% of 50k rows; ~9k-key cold tail
    val rows = (0 until 50000).map { i =>
      if (rnd.nextInt(10) < 8) "hot_" + rnd.nextInt(10)
      else "cold_" + rnd.nextInt(20000)
    }
    for (parts <- Seq(1, 13, 32)) {
      val df = rows.toDF("key").repartition(parts)
      val got = Summaries.heavyHitters(df, "key", k = 10, capacity = 256)
        .collect().map(_.toString).toSeq
      assert(got == naiveTopK(df, 10), s"parts=$parts")
    }
  }

  test("fails fast with the needed capacity when the certificate cannot hold") {
    import spark.implicits._
    // near-uniform: 5000 keys x ~10 rows; capacity 16 cannot certify top-5
    val rows = (0 until 50000).map(i => "k" + (i % 5000))
    val df = rows.toDF("key")
    val ex = intercept[IllegalArgumentException] {
      Summaries.heavyHitters(df, "key", k = 5, capacity = 16)
    }
    assert(ex.getMessage.contains("cannot certify"))
    assert(ex.getMessage.contains("raise capacity"))
  }

  test("fewer distinct keys than k is exact when capacity covers them all") {
    import spark.implicits._
    val df = Seq("a", "a", "b", "c", "c", "c").toDF("key")
    // capacity > N  =>  bound = 0: exhaustive candidates, 3 rows for k=5
    val got = Summaries.heavyHitters(df, "key", k = 5, capacity = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("c", 3L), ("a", 2L), ("b", 1L)))
  }

  test("count ties break by key ascending, deterministically") {
    import spark.implicits._
    val df = (1 to 100).flatMap(_ => Seq("z", "y", "x", "w")).toDF("key")
    val got = Summaries.heavyHitters(df, "key", k = 3, capacity = 50)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("w", "x", "y"))
  }

  test("null keys are excluded; empty input yields an empty frame") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("key")
    val got = Summaries.heavyHitters(df, "key", k = 2, capacity = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L), ("b", 1L)))
    val empty = Summaries.heavyHitters(
      Seq.empty[String].toDF("key"), "key", k = 3, capacity = 8)
    assert(empty.collect().isEmpty)
    assert(empty.columns.toSeq == Seq("key", "cnt"))
  }

  test("per-partition summary state stays bounded by capacity") {
    import spark.implicits._
    // high-cardinality uniform stream through a tiny capacity: the
    // operator must refuse certification (proving it did NOT silently
    // fall back to a full groupBy) rather than OOM or return a guess
    val df = (0 until 20000).map(i => "u" + i).toDF("key").repartition(4)
    val ex = intercept[IllegalArgumentException] {
      Summaries.heavyHitters(df, "key", k = 3, capacity = 8)
    }
    assert(ex.getMessage.contains("cannot certify") ||
      ex.getMessage.contains("permits undetected"))
  }

  test("large candidate sets confirm via semi-join, same certified answer") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 30000).map { _ =>
      if (rnd.nextInt(10) < 8) "hot_" + rnd.nextInt(8)
      else "cold_" + rnd.nextInt(5000)
    }
    val df = rows.toDF("key").repartition(16)
    // isinThreshold = 0 forces the broadcast-semi-join confirm path the
    // operator takes at 100 TB candidate counts; answers must be equal
    val viaSemi = Summaries.heavyHitters(df, "key", k = 8,
        capacity = 256, isinThreshold = 0)
      .collect().map(_.toString).toSeq
    val viaIsin = Summaries.heavyHitters(df, "key", k = 8, capacity = 256)
      .collect().map(_.toString).toSeq
    assert(viaSemi == viaIsin)
    assert(viaSemi == naiveTopK(df, 8))
  }

  test("returns a local relation: caller actions never re-execute the input") {
    import spark.implicits._
    val df = (1 to 100).flatMap(_ => Seq("a", "b", "c")).toDF("key")
    val out = Summaries.heavyHitters(df, "key", k = 2, capacity = 32)
    // the certified rows ride the plan as a LocalRelation leaf — acting
    // on the result cannot see different data than the certificate did
    assert(out.queryExecution.optimizedPlan.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
    assert(out.collect().map(_.getString(0)).toSeq == Seq("a", "b"))
  }
}
