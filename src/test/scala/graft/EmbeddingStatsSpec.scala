package graft

import graft.operators.Ann

/** Embedding QA census ([[Ann.embeddingDimStats]], q165): micro-unit
  * quantization, dead/constant detection, exact sums, and partitioning
  * invariance.
  */
class EmbeddingStatsSpec extends SparkSpec {

  private def stats(vecs: Seq[Array[Float]], parts: Int = 1) = {
    import spark.implicits._
    Ann.embeddingDimStats(vecs.toDF("embedding").repartition(parts), "embedding")
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(7), r.getDouble(8),
        r.getBoolean(9), r.getBoolean(10))))
      .toMap
  }

  private val vecs = Seq(
    Array(1.0f, 0.0f, 0.5f, -0.25f),
    Array(0.5f, 0.0f, 0.5f, 0.75f),
    Array(0.0f, 0.0f, 0.5f, 0.5f))

  test("dead and constant dimensions are flagged; live ones are not") {
    val s = stats(vecs)
    assert(s(1) == ((3L, 3L, 0L, 0L, 0L, 0.0, 0.0, true, true)))   // dead ⊂ constant
    val (_, nd2, mn2, mx2, sq2, mean2, std2, const2, dead2) = s(2)
    assert(nd2 == 0L && mn2 == 500000L && mx2 == 500000L && sq2 == 1500000L)
    assert(const2 && !dead2 && mean2 == 0.5 && std2 == 0.0)
    assert(!s(0)._8 && !s(0)._9)
  }

  test("micro-unit quantization is floor(v*1e6+0.5) on the exact double") {
    val s = stats(vecs)
    assert(s(0)._3 == 0L && s(0)._4 == 1000000L && s(0)._5 == 1500000L)
    assert(s(3)._3 == -250000L && s(3)._4 == 750000L && s(3)._5 == 1000000L)
  }

  test("mean and std derive from the exact integer sums") {
    val s = stats(vecs)
    // dim 0: q = {1e6, 5e5, 0}; mean = 0.5; var = ((1.25e12 - 2.25e12/3)/3)/1e12
    assert(s(0)._6 == 0.5)
    assert(math.abs(s(0)._7 - math.sqrt(0.25 / 1.5)) < 1e-12)
  }

  test("partitioning-invariant (integer sums cannot drift)") {
    assert(stats(vecs, parts = 1) == stats(vecs, parts = 5))
  }
}
