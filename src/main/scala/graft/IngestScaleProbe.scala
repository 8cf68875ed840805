package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Cdc, Dedup, NearDup}

/** Composes the continuous-crawl ingest chain at max local scale — the
  * r15 verdict's item 6. The pieces are spec-pinned and 100×-measured
  * individually; THIS probe runs them as one loop over ~5 M synthetic
  * docs arriving in increments, the way a crawl ingest actually runs:
  *
  *   1. q85  — bloom dedup gate: increment vs history exact-text gate
  *             (history rows never reshuffle: the bloom is ONE partial
  *             aggregation over the history scan, the confirm joins
  *             broadcast the maybe-set INTO the history scan; the plan
  *             invariants are checked per increment and reported)
  *   2. q66  — near-dup probe: gate-passed docs vs history word-4-gram
  *             candidates (post-gate streams are exact-unique BY the
  *             gate's contract, so the probe runs collapseExact=false —
  *             composing the chain makes the collapse step redundant)
  *   3. q126 — additive rollup merge: per-bucket stats of the admitted
  *             slice merged into the standing rollup WITHOUT rescanning
  *             history (count/sum/min/max merge algebra)
  *   4. q115 — snapshot diff of the standing rollup vs the merged one:
  *             the change report a downstream consumer subscribes to
  *   5.      — history append: admitted docs land as NEW parquet files;
  *             existing history files are never rewritten or shuffled
  *
  * Docs are deterministic 16-word md5 texts; each post-initial increment
  * is 70% new / 20% exact dups of initial docs / 10% near-dups (word 7
  * mutated — 9 of 13 4-grams shared, jaccard ≈ 0.53). Prints ONE JSON
  * line (the [[Bench]] artifact contract). Knobs: GRAFT_INGEST_INIT
  * (default 1000000), GRAFT_INGEST_INC (500000), GRAFT_INGEST_ROUNDS (8).
  */
object IngestScaleProbe {
  def main(args: Array[String]): Unit = {
    val nInit = sys.env.getOrElse("GRAFT_INGEST_INIT", "1000000").toLong
    val incSize = sys.env.getOrElse("GRAFT_INGEST_INC", "500000").toLong
    val rounds = sys.env.getOrElse("GRAFT_INGEST_ROUNDS", "8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)

    val dir = java.nio.file.Files.createTempDirectory("ingest_probe").toString
    val histDir = s"$dir/history"
    val rollDir = s"$dir/rollup"

    // 16 deterministic 8-hex-char words per doc; near-dups mutate word 7.
    // Word identity is (seedId, position)-keyed, so two docs share grams
    // iff they share a seed — candidate space stays true-dup-only.
    def textOf(seed: org.apache.spark.sql.Column,
               mutation: Option[org.apache.spark.sql.Column]) =
      concat_ws(" ", transform(sequence(lit(0), lit(15)), j => {
        val w = substring(md5(concat(seed.cast("string"), lit("_"),
          j.cast("string"))), 1, 8)
        mutation.map(m => when(j === 7, m).otherwise(w)).getOrElse(w)
      }))

    def synth(lo: Long, hi: Long, initial: Boolean): DataFrame = {
      val ids = spark.range(lo, hi, 1, cpus.toInt)
      val kind = if (initial) lit(0L) else pmod(col("id"), lit(10L))
      // dup seeds land in the INITIAL corpus (always admitted), so the
      // duplication rates are exact by construction
      val seed = when(kind >= 7, pmod(col("id"), lit(nInit)))
        .otherwise(col("id"))
      ids.select(col("id").as("doc_id"),
        when(kind === 9, textOf(seed, Some(substring(md5(col("id").cast("string")), 1, 8))))
          .otherwise(textOf(seed, None)).as("text"),
        pmod(seed, lit(16L)).as("bucket"))
    }

    def rollup(df: DataFrame): DataFrame =
      df.groupBy("bucket").agg(count(lit(1)).as("n"),
        sum(length(col("text")).cast("long")).as("sum_chars"))

    // ── initial corpus ───────────────────────────────────────────────────
    val t0 = System.nanoTime()
    synth(0, nInit, initial = true).write.parquet(histDir)
    rollup(spark.read.parquet(histDir)).write.parquet(rollDir)
    val tInit = (System.nanoTime() - t0) / 1e9

    // persistent-filter mode (GRAFT_INGEST_PERSIST_BLOOM=1): build the
    // standing bloom ONCE from the initial corpus, gate each increment
    // against it, fold the admitted docs in for the next round — removes
    // the per-round rebuild, the gate's only history-linear term
    val persistBloom = sys.env.get("GRAFT_INGEST_PERSIST_BLOOM").contains("1")
    val expected = math.max(nInit + incSize * rounds, 1L << 20)
    val fpp = 0.01
    var bloomBytes: Array[Byte] =
      if (persistBloom)
        Dedup.historyBloom(spark.read.parquet(histDir), "text", expected, fpp)
      else null

    val incJsons = new scala.collection.mutable.ArrayBuffer[String]
    var base = nInit
    var gatePlanOk = true
    for (i <- 1 to rounds) {
      val hist = spark.read.parquet(histDir)
      val inc = synth(base, base + incSize, initial = false)

      // 1. exact gate (persistent mode probes the standing filter; the
      // default rebuilds the bloom from history each increment)
      val tg0 = System.nanoTime()
      val gated = (if (persistBloom)
          Dedup.bloomGateWith(inc, hist, bloomBytes, "text")
        else Dedup.bloomGate(inc, hist, "text",
          expectedItems = expected, fpp = fpp))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nIncRows = gated.count()
      val exactDups = gated.filter(!col("is_new")).count()
      val tGate = (System.nanoTime() - tg0) / 1e9
      // plan invariants: the confirm joins broadcast into the history
      // scan — no sort-merge join, and the only hash exchanges carry the
      // (dup-sized) maybe/confirm key sets, never history rows
      val gp = gated.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head // AQE echoes the pre-run plan below
      val ok = gp.contains("BroadcastHashJoin") && !gp.contains("SortMergeJoin") &&
        "Exchange hashpartitioning".r.findAllIn(gp).size <= 2
      gatePlanOk &&= ok

      // 2. near-dup probe: survivors vs history (exact-unique inputs —
      // the gate's contract — so collapseExact=false)
      val tn0 = System.nanoTime()
      val survivors = gated.filter(col("is_new")).select("doc_id", "text", "bucket")
      val ndIds = NearDup.crossNgramPairs(survivors, hist,
          "doc_id", "doc_id", "text", "text", n = 4,
          minJaccard = 0.3, collapseExact = false)
        .select(col("id_l").as("doc_id")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nearDups = ndIds.count()
      val admitted = survivors.join(ndIds, Seq("doc_id"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nAdmitted = admitted.count()
      val tProbe = (System.nanoTime() - tn0) / 1e9

      // 3+4. rollup merge (no history rescan) + snapshot diff report
      val tr0 = System.nanoTime()
      val oldRoll = spark.read.parquet(rollDir)
      val newRoll = Cdc.mergeAdditive(Seq(oldRoll, rollup(admitted)),
        Seq("bucket"), countCols = Seq("n"), sumCols = Seq("sum_chars"))
      val changed = Cdc.snapshotDiff(oldRoll, newRoll, Seq("bucket"))
        .filter(col("change") =!= "unchanged").count()
      newRoll.write.mode("overwrite").parquet(s"$dir/rollup_next")
      // bounded table: the overwrite moves 16 rows, not history
      spark.read.parquet(s"$dir/rollup_next").write.mode("overwrite").parquet(rollDir)
      val tRoll = (System.nanoTime() - tr0) / 1e9

      // 5. fold-then-append, in THAT order: the parquet append triggers
      // refreshByPath on histDir, which invalidates every cached plan
      // reading it — `admitted` would silently RECOMPUTE against the
      // post-append history (where its own rows are now dups) and fold
      // an empty frame. Folding first reads the still-valid cache; both
      // steps are increment-sized.
      val ta0 = System.nanoTime()
      if (persistBloom)
        bloomBytes = Dedup.foldIntoBloom(bloomBytes, admitted, "text",
          expected, fpp)
      admitted.write.mode("append").parquet(histDir)
      val tAppend = (System.nanoTime() - ta0) / 1e9

      gated.unpersist(); ndIds.unpersist(); admitted.unpersist()
      incJsons += s"""{"round":$i,"inc_rows":$nIncRows,"exact_dups":$exactDups,""" +
        s""""near_dups":$nearDups,"admitted":$nAdmitted,"rollup_changed":$changed,""" +
        f""""sec_gate":$tGate%.2f,"sec_neardup":$tProbe%.2f,"sec_rollup":$tRoll%.2f,"sec_append":$tAppend%.2f}"""
      System.err.println(s"[ingest] round $i: ${incJsons.last}")
      base += incSize
    }

    val finalRows = spark.read.parquet(histDir).count()
    val totalSec = (System.nanoTime() - t0) / 1e9
    val json = s"""{"metric":"ingest_scale","value":$totalSec,"unit":"sec",""" +
      s""""init_rows":$nInit,"inc_size":$incSize,"rounds":$rounds,""" +
      s""""final_history_rows":$finalRows,"gate_plan_ok":$gatePlanOk,""" +
      s""""persist_bloom":$persistBloom,""" +
      f""""init_sec":$tInit%.2f,"increments":[${incJsons.mkString(",")}]}"""
    println(json)
    val outFile = sys.env.getOrElse("GRAFT_INGEST_OUT", "ingest_scale_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    catch { case e: Throwable => System.err.println(s"[ingest] could not write $outFile: $e") }
    spark.stop()
  }
}
