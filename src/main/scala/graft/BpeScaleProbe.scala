package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Production-depth BPE measurement main (the r14 verdict's named
  * evidence gap): trains [[graft.operators.Quality.bpeTrainBatched]] at
  * >= 30k merges over a REALISTIC (Zipf-Mandelbrot) vocabulary and
  * reports the measured driver round-trip count (`lastTrainRounds`) —
  * the "one count job per BATCH, not per merge" claim — plus the
  * [[graft.operators.Quality.bpeEncode]] plan-build time at the
  * resulting 30k-entry merge table vs an 8-entry one (the O(1)-plan
  * claim: the table ships as ONE kernel constant, not one expression
  * node per merge).
  *
  * Corpus: deterministic synthetic — V distinct words, spellings drawn
  * from English letter frequencies (lengths 2-12), rank-r frequency
  * proportional to 1/(r+2.7)^1.07 (Zipf-Mandelbrot), scaled to ~T total
  * tokens. Built executor-side via sequence+explode so the driver never
  * holds the token stream. Seeded RNG — reruns are bit-identical.
  *
  * Prints ONE JSON line (same contract as [[Bench]]); override the
  * output path with GRAFT_BENCH_OUT, merge depth with GRAFT_BPE_MERGES,
  * vocabulary size with GRAFT_BPE_VOCAB, total tokens with
  * GRAFT_BPE_TOKENS.
  */
object BpeScaleProbe {
  // English unigram letter frequencies (per mille, a-z) — public-domain
  // Lewand ordering; exact values only shape spelling realism
  private val letterFreq: Array[(Char, Double)] = Array(
    'e' -> 12.7, 't' -> 9.1, 'a' -> 8.2, 'o' -> 7.5, 'i' -> 7.0,
    'n' -> 6.7, 's' -> 6.3, 'h' -> 6.1, 'r' -> 6.0, 'd' -> 4.3,
    'l' -> 4.0, 'c' -> 2.8, 'u' -> 2.8, 'm' -> 2.4, 'w' -> 2.4,
    'f' -> 2.2, 'g' -> 2.0, 'y' -> 2.0, 'p' -> 1.9, 'b' -> 1.5,
    'v' -> 1.0, 'k' -> 0.8, 'j' -> 0.15, 'x' -> 0.15, 'q' -> 0.1,
    'z' -> 0.07)

  /** V distinct Zipf-weighted words; driver-side (V strings, not the
    * corpus) then shipped as a one-column frame and exploded to counts.
    */
  private def zipfVocab(spark: SparkSession, v: Int, totalTokens: Long)
      : DataFrame = {
    val rnd = new scala.util.Random(20260815L)
    val cum = letterFreq.scanLeft(0.0)(_ + _._2).tail
    val tot = cum.last
    def letter(): Char = {
      val x = rnd.nextDouble() * tot
      letterFreq(cum.indexWhere(_ >= x))._1
    }
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    while (seen.size < v) {
      val len = 2 + rnd.nextInt(11)
      seen += Array.fill(len)(letter()).mkString
    }
    val words = seen.toArray
    val weights = Array.tabulate(v)(r => 1.0 / math.pow(r + 2.7, 1.07))
    val wSum = weights.sum
    val rows: Seq[org.apache.spark.sql.Row] = words.toIndexedSeq
      .zip(weights).map { case (w, wt) =>
        val f = math.max(1L, math.round(totalTokens * wt / wSum))
        org.apache.spark.sql.Row(w, f)
      }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("f",
        org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
  }

  def main(args: Array[String]): Unit = {
    val merges = sys.env.getOrElse("GRAFT_BPE_MERGES", "30000").toInt
    val vocab = sys.env.getOrElse("GRAFT_BPE_VOCAB", "60000").toInt
    val tokens = sys.env.getOrElse("GRAFT_BPE_TOKENS", "2500000").toLong
    // "local" = collapse-first + driver-side trainer (the production
    // default after the r15 batched measurement); "batched" = the
    // distributed per-round path for dictionaries too large to narrow
    val mode = sys.env.getOrElse("GRAFT_BPE_MODE", "batched")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)

    // token stream: each word exploded to its Zipf count, spread across
    // the cluster — the trainer's own first step collapses it right back
    // to (word, f), which is the honest input shape for a corpus scan
    val docs = zipfVocab(spark, vocab, tokens)
      .select(col("w"), explode(sequence(lit(1L), col("f"))).as("i"))
      .repartition(cpus.toInt)
      .select(col("w").as("text"))
      .localCheckpoint()
    val nTok = docs.count()

    val t0 = System.nanoTime()
    val table = (if (mode == "local")
      graft.operators.Quality.bpeTrainLocal(docs, "text", numMerges = merges)
    else
      graft.operators.Quality.bpeTrainBatched(docs, "text", numMerges = merges))
      .collect()
    val trainSec = (System.nanoTime() - t0) / 1e9
    val rounds = graft.operators.Quality.lastTrainRounds.get
    val emitted = table.length

    // encode-plan O(1) claim: plan-build (analyze+optimize+physical plan
    // + codegen of the kernel projection) timed at the full trained
    // table vs its 8-entry prefix; the small SF keeps execution noise out
    val mergeSeq = table.sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val tiny = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001").localCheckpoint()
    def planAndRun(ms: Seq[(String, String)]): (Double, Double) = {
      val t1 = System.nanoTime()
      val df = graft.operators.Quality.bpeEncode(tiny, "doc_id", "text", ms)
      df.queryExecution.executedPlan // force analysis through physical planning
      val plan = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      df.queryExecution.toRdd.count()
      (plan, (System.nanoTime() - t2) / 1e9)
    }
    planAndRun(mergeSeq.take(8)) // JVM warm (catalyst + codegen paths)
    val (plan8, run8) = planAndRun(mergeSeq.take(8))
    val (planFull, runFull) = planAndRun(mergeSeq)

    val json =
      s"""{"metric":"bpe_train_${mode}_${merges}m","value":$trainSec,"unit":"sec",""" +
      s""""merges_requested":$merges,"merges_emitted":$emitted,""" +
      s""""count_rounds":$rounds,"vocab":$vocab,"tokens":$nTok,""" +
      s""""avg_batch":${emitted.toDouble / math.max(rounds, 1)},""" +
      s""""encode_plan_build_sec_8":$plan8,"encode_plan_build_sec_full":$planFull,""" +
      s""""encode_exec_sec_8":$run8,"encode_exec_sec_full":$runFull,""" +
      s""""sf":"synthetic-zipf"}"""
    println(json)
    val outFile = sys.env.getOrElse("GRAFT_BENCH_OUT", "bpe_scale_out.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[probe] could not write $outFile: $e") }
    spark.stop()
  }
}
