package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** DSIR importance resampling ([[Sampling.dsirResample]], q163): exact
  * equality with a sequential driver-side reference (same md5 bucket
  * hash, same micro-unit quantization), semantic direction (target-like
  * docs outweigh off-target docs), and partitioning invariance — the
  * integer-sum discipline means the distributed weight can never drift.
  */
class DsirSpec extends SparkSpec {

  private val B = 16
  private val micro = 100000.0

  private def md5Int(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  /** Sequential reference: same semantics, no DataFrames. */
  private def ref(docs: Seq[(Long, String, Boolean)], k: Int)
      : Seq[(Long, Long, Long, Long, Int)] = {
    val toks = docs.filter(d => d._2 != null && d._2.trim.nonEmpty)
      .flatMap { case (id, t, tgt) =>
        t.trim.toLowerCase.split("\\s+").toSeq.map(tok => (id, tgt, md5Int(tok) % B))
      }
    val byB = toks.groupBy(_._3)
    val totr = toks.size.toLong
    val tott = toks.count(_._2).toLong
    val lrm: Map[Long, Long] = byB.map { case (b, ts) =>
      val cr = ts.size.toLong
      val ct = ts.count(_._2).toLong
      b -> Math.round((math.log((ct + 1.0) / (tott + B.toDouble)) -
        math.log((cr + 1.0) / (totr + B.toDouble))) * micro)
    }
    val dw = toks.groupBy(_._1).map { case (id, ts) =>
      (id, ts.size.toLong, ts.map(t => lrm(t._3)).sum)
    }.toSeq
    val keyed = dw.map { case (id, n, lw) =>
      val u = (md5Int(s"$id:42") + 0.5) / 4294967296.0
      (id, n, lw, lw + Math.round(-math.log(-math.log(u)) * micro))
    }
    keyed.sortBy { case (id, _, _, key) => (-key, id) }.take(k)
      .zipWithIndex.map { case ((id, n, lw, key), i) => (id, n, lw, key, i + 1) }
  }

  private def run(docs: Seq[(Long, String, Boolean)], k: Int, parts: Int = 3)
      : Seq[(Long, Long, Long, Long, Int)] = {
    import spark.implicits._
    val df = docs.toDF("id", "text", "tgt").repartition(parts)
    Sampling.dsirResample(df, "id", "text", col("tgt"), k, buckets = B)
      .orderBy(col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSeq
  }

  private val corpus: Seq[(Long, String, Boolean)] = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", true),
    (2L, "spark shuffles partition data across executors", false),
    (3L, "the lazy dog sleeps while the quick fox runs", true),
    (4L, "catalyst optimizes logical plans into physical plans", false),
    (5L, "a quick brown dog and a lazy fox", false),
    (6L, "executors exchange shuffle blocks over the network", false),
    (7L, "the fox and the dog are quick and lazy", true),
    (8L, "   ", false), // blank — not a candidate
    (9L, null, false)) // null — not a candidate

  test("matches the sequential reference exactly (weights, keys, ranks)") {
    assert(run(corpus, k = 5) == ref(corpus, k = 5))
  }

  test("target-like docs carry higher importance weight than off-target docs") {
    val got = run(corpus, k = 7).map(t => t._1 -> t._3).toMap
    // doc 5 shares the target's vocabulary without being in the target —
    // DSIR should weight it ABOVE the spark-vocabulary docs
    assert(got(5L) > got(2L) && got(5L) > got(4L) && got(5L) > got(6L))
  }

  test("partitioning-invariant and k caps the draw") {
    val one = run(corpus, k = 3, parts = 1)
    assert(one == run(corpus, k = 3, parts = 7))
    assert(one.size == 3 && one.map(_._5) == Seq(1, 2, 3))
  }

  test("null/blank docs are excluded; k beyond candidates returns all ranked") {
    val got = run(corpus, k = 50)
    assert(got.size == 7)
    assert(!got.map(_._1).contains(8L) && !got.map(_._1).contains(9L))
    assert(got.map(_._5) == (1 to 7))
  }

  test("carry columns ride through functionally dependent on the id") {
    import spark.implicits._
    val df = corpus.filter(_._2 != null).map { case (id, t, tg) => (id, t, tg, s"s$id") }
      .toDF("id", "text", "tgt", "src")
    val got = Sampling.dsirResample(df, "id", "text", col("tgt"), 4,
      buckets = B, carry = Seq("src"))
    assert(got.columns.toSeq ==
      Seq("id", "src", "n_tok", "lw_micros", "key_micros", "rank"))
    assert(got.collect().forall(r => r.getString(1) == s"s${r.getLong(0)}"))
  }
}
