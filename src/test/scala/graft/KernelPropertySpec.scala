package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.{KeyRepair, NearDup}

/** Property-style sweeps over seeded random data: each test checks an
  * operator against an independent reference model (window form, vote
  * invariance, a driver-side reimplementation) across many generated
  * cases, rather than a single example.
  */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  test("top-k agg equals window rank across random k / groups / heavy ties") {
    GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 4) {
      val k = 1 + rnd.nextInt(4)
      val nGroups = 1 + rnd.nextInt(30)
      // scores from a tiny discrete set → constant tie pressure on the
      // (order desc, id asc) contract
      val rows = (1 to 1500).map { i =>
        (rnd.nextInt(nGroups).toLong, i.toLong, rnd.nextInt(8) / 4.0)
      }
      val df = rows.toDF("g", "id", "score")
      val agg = df.groupBy("g")
        .agg(call_function("graft_top_k_by",
          struct(col("id"), col("score")), col("score"), col("id"), lit(k)).as("top"))
        .select(col("g"), posexplode(col("top")))
        .select(col("g"), col("col.id").as("id"), col("col.score").as("score"),
          (col("pos") + 1).as("rank"))
        .as[(Long, Long, Double, Int)].collect().toSet
      val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
      val win = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("g"), col("id"), col("score"), col("rank"))
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(agg == win, s"k=$k nGroups=$nGroups")
    }
  }

  test("simhash signatures are token-order invariant (vote symmetry)") {
    GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(29)
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docs = (1L to 40L).map { i =>
      val toks = Seq.fill(3 + rnd.nextInt(20))(words(rnd.nextInt(words.size)))
      (i, toks.mkString(" "), rnd.shuffle(toks).mkString(" "))
    }.toDF("id", "text", "shuffled")
    val bad = docs.select(
        (NearDup.simhashFast(col("text")) =!= NearDup.simhashFast(col("shuffled"))).as("x64"),
        (NearDup.simhashMd5Fast(col("text")) =!= NearDup.simhashMd5Fast(col("shuffled"))).as("md5"))
      .filter(col("x64") || col("md5")).count()
    assert(bad == 0)
  }

  test("key repair matches a driver-side reference model on random collisions") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 400).map { i =>
      val uid = if (rnd.nextInt(5) == 0) null else s"u${rnd.nextInt(30)}"
      val content = s"c${rnd.nextInt(3)}"
      val fb = if (rnd.nextInt(4) == 0) null else f"2026-01-${1 + rnd.nextInt(28)}%02d"
      (i.toLong, uid, content, fb)
    }
    val df = rows.toDF("id", "uid", "content", "fb")
    val got = KeyRepair.regenerateUniqueKeys(df, "uid", Seq("content"), Seq(col("fb")))
      .select("id", "unique_key").as[(Long, String)].collect().toMap
    // reference model, recomputed independently on the driver
    val variants = rows.filter(_._2 != null).groupBy(_._2)
      .map { case (u, rs) => u -> rs.map(_._3).distinct.size }
    val expected = rows.map { case (id, uid, _, fb) =>
      id -> (if (uid == null) fb
             else if (variants(uid) > 1) Seq(uid, fb).filter(_ != null).mkString("#")
             else uid)
    }.toMap
    assert(got == expected)
  }
}
