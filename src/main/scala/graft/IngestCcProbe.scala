package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Throwaway probe (not part of the library surface): per-increment cost
  * of incremental component maintenance (Dedup.updateComponents, q159)
  * vs batch re-resolution as history grows — the evidence artifact for
  * the continuous-ingest chain (ingest_cc_scale_r18.json).
  */
object IngestCcProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rounds = 8
    val inc = 250000L // edges per increment (~187k fresh nodes each)
    def pairsFor(r: Long): DataFrame = {
      val base = spark.range(r * inc, (r + 1) * inc)
      // near-clique clusters of 4 consecutive ids (the near-dup shape)
      val intra = base
        .select((col("id") - pmod(col("id"), lit(4L))).as("id_a"), col("id").as("id_b"))
        .filter(col("id_a") =!= col("id_b"))
      if (r == 0) intra
      else {
        // every 20th new doc bridges into history (cross near-dup)
        val cross = base.filter(pmod(col("id"), lit(20L)) === 0)
          .select(pmod(col("id") * 7L, lit(r * inc)).as("id_a"), col("id").as("id_b"))
        intra.unionByName(cross)
      }
    }
    var standing: DataFrame = null
    var allPairs: DataFrame = null
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    for (r <- 0 until rounds) {
      val p = pairsFor(r.toLong).localCheckpoint()
      val np = p.count()
      allPairs = (if (allPairs == null) p else allPairs.unionByName(p)).localCheckpoint()
      val histPairs = allPairs.count()
      val t0 = System.nanoTime()
      standing = (if (r == 0) Dedup.connectedComponents(p)
                  else Dedup.updateComponents(standing, p)).localCheckpoint()
      val nNodes = standing.count()
      val tInc = (System.nanoTime() - t0) / 1e9
      // diagnosis: how concentrated have components become?
      val topComp = standing.groupBy(col("comp")).count()
        .orderBy(col("count").desc).limit(1).collect()
        .headOption.map(_.getLong(1)).getOrElse(0L)
      val noBatch = sys.env.get("GRAFT_PROBE_NOBATCH").contains("1")
      val (tBatch, diff) =
        if (noBatch) (0.0, 0L)
        else {
          val t1 = System.nanoTime()
          val batch = Dedup.connectedComponents(allPairs).localCheckpoint()
          batch.count()
          val tb = (System.nanoTime() - t1) / 1e9
          val d = standing.as("i")
            .join(batch.as("b"), col("i.id") === col("b.id"))
            .filter(col("i.comp") =!= col("b.comp")).count()
          (tb, d)
        }
      lines += f"""{"round":$r,"inc_pairs":$np,"hist_pairs":$histPairs,"nodes":$nNodes,"max_component":$topComp,"t_incremental_s":$tInc%.2f,"t_batch_s":$tBatch%.2f,"label_mismatches":$diff}"""
      System.err.println(lines.last)
      require(diff == 0L, s"incremental != batch at round $r")
      System.gc() // drain ContextCleaner between rounds (the bench rule)
    }
    val json = "{\"probe\":\"ingest_cc_scale_r18\",\"shape\":\"4-cliques + 1/20 cross-bridges, 250k pairs/round\",\"rounds\":[\n  " +
      lines.mkString(",\n  ") + "\n]}"
    java.nio.file.Files.write(java.nio.file.Paths.get("ingest_cc_scale_r18.json"),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
