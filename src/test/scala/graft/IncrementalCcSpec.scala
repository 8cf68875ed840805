package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Incremental connected-components maintenance
  * ([[Dedup.updateComponents]], q159): the contract is equality with
  * batch [[Dedup.connectedComponents]] over (history ∪ increment) pairs,
  * with history edges never re-entering the computation.
  */
class IncrementalCcSpec extends SparkSpec {

  private def cc(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def inc(history: Seq[(Long, Long)], delta: Seq[(Long, Long)]) = {
    import spark.implicits._
    val standing = Dedup.connectedComponents(history.toDF("id_a", "id_b"))
    Dedup.updateComponents(standing, delta.toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("increment-only edges: fresh nodes labeled, history untouched") {
    val history = Seq((2L, 4L), (4L, 6L), (10L, 12L))
    val delta = Seq((101L, 103L), (103L, 105L))
    assert(inc(history, delta) == cc(history ++ delta))
  }

  test("cross edge attaches an increment doc to a standing component") {
    val history = Seq((2L, 4L), (10L, 12L))
    val delta = Seq((101L, 2L), (103L, 101L)) // chain into comp 2
    assert(inc(history, delta) == cc(history ++ delta))
  }

  test("a bridging edge MERGES two standing components to the global min") {
    val history = Seq((2L, 4L), (10L, 12L), (20L, 22L))
    val delta = Seq((4L, 10L), (101L, 22L)) // merge {2,4}+{10,12}; attach 101
    val got = inc(history, delta)
    assert(got == cc(history ++ delta))
    // the merged component's label is the GLOBAL min across both halves
    assert(got.contains((12L, 2L)) && got.contains((10L, 2L)))
  }

  test("self-pairs and singleton fresh nodes label themselves (batch parity)") {
    val history = Seq((2L, 4L))
    val delta = Seq((101L, 101L), (4L, 4L))
    assert(inc(history, delta) == cc(history ++ delta))
  }

  test("an increment doc bridging history singletons never seen in pairs") {
    // 7 and 9 are history docs absent from standing (no history pair):
    // they enter as fresh nodes exactly as batch CC would admit them
    val history = Seq((2L, 4L))
    val delta = Seq((7L, 101L), (101L, 9L))
    assert(inc(history, delta) == cc(history ++ delta))
  }

  test("randomized graphs: incremental ≡ batch under chained increments") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    (0 until 3).foreach { trial =>
      val n = 120
      val history = Seq.fill(80)((rnd.nextInt(n).toLong * 2,
        rnd.nextInt(n).toLong * 2))
      val inc1 = Seq.fill(40)((rnd.nextInt(3 * n).toLong,
        rnd.nextInt(3 * n).toLong))
      val inc2 = Seq.fill(40)((rnd.nextInt(4 * n).toLong,
        rnd.nextInt(4 * n).toLong))
      // fold the first increment's output back in as next standing —
      // the continuous-ingest contract
      val s0 = Dedup.connectedComponents(history.toDF("id_a", "id_b"))
      val s1 = Dedup.updateComponents(s0, inc1.toDF("id_a", "id_b"))
      val s2 = Dedup.updateComponents(s1, inc2.toDF("id_a", "id_b"))
      val got = s2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == cc(history ++ inc1 ++ inc2), s"trial=$trial")
    }
  }

  test("string ids survive (no numeric cast inside the operator)") {
    import spark.implicits._
    val standing = Dedup.connectedComponents(
      Seq(("b", "d"), ("x", "z")).toDF("id_a", "id_b"))
    val got = Dedup.updateComponents(standing,
        Seq(("d", "x"), ("n1", "n2")).toDF("id_a", "id_b"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("b", "b"), ("d", "b"), ("x", "b"), ("z", "b"),
      ("n1", "n1"), ("n2", "n1")))
  }

  test("the history-scale remap join broadcasts the delta, not the standing") {
    import spark.implicits._
    val standing = Dedup.connectedComponents(
      (0L until 200L).map(i => (i * 2, i * 2 + 2)).toDF("id_a", "id_b"))
    val out = Dedup.updateComponents(standing,
      Seq((1001L, 0L)).toDF("id_a", "id_b"))
    val phys = out.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"),
      "expected the standing remap to ride a broadcast hash join")
  }
}
