package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ann
import graft.sources.Tables

// throwaway recall probe (verify-skill pattern) — DELETE before commit
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = Sessions.tune(
      SparkSession.builder().master("local[16]")
        .config("spark.sql.shuffle.partitions", 16)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.embeddings(spark, sfDir)
    val qset = e.filter(pmod(col("vec_id"), lit(50)) === 0)
    val exact = Ann.bruteForceTopK(qset, e, "vec_id", "embedding", k = 5)
    exact.cache().count()
    def rec(approx: org.apache.spark.sql.DataFrame): Double =
      Ann.recallAtK(approx, exact, 5).agg(avg("recall")).head().getDouble(0)

    val n = e.count()
    println(s"== corpus n=$n")
    // norm spread: does L2-vs-cosine mismatch cap recall?
    val norms = e.select(sqrt(aggregate(col("embedding"), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double"))).as("nm"))
      .agg(min("nm"), max("nm"), avg("nm")).head()
    println(s"== norms min=${norms.getDouble(0)} max=${norms.getDouble(1)} avg=${norms.getDouble(2)}")

    val coarse = Ann.autoCentroids(e, "vec_id", "embedding")
    val stride16 = Ann.strideCentroids(e, "vec_id", "embedding", nCentroids = 16)

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $tag took ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    // A: current catalog config
    val cbsA = Ann.pqCodebooks(stride16, m = 8)
    println(f"A  baseline m8 ksub16 sliced, nProbe4:      ${t("A")(rec(Ann.ivfPqTopK(qset, e, "vec_id", "embedding", coarse, cbsA, 5, 4)))}%.3f")
    // B: trained codebooks (2 iters)
    val cbsB = t("trainB")(Ann.pqTrainCodebooksExact(e, "embedding", cbsA, iters = 2))
    println(f"B  A + trained x2:                          ${t("B")(rec(Ann.ivfPqTopK(qset, e, "vec_id", "embedding", coarse, cbsB, 5, 4)))}%.3f")
    // C: residual + trained on residuals
    val resDf = {
      val centsLit = lit(graft.functions.GraftFunctions.encodeCents(coarse))
      import spark.implicits._
      val centsDf = broadcast(coarse.toSeq.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toDF("cid", "__centv"))
      e.select(col("vec_id"), col("embedding"),
          call_function("graft_ivf_nearest", col("embedding"), centsLit).as("cid"))
        .join(centsDf, Seq("cid"))
        .select(col("vec_id"), zip_with(col("embedding"), col("__centv"), (a, b) => a - b).as("res"))
    }
    val cbsC = t("trainC")(Ann.pqTrainCodebooksExact(resDf, "res", cbsA, iters = 2))
    println(f"C  residual + trained x2 (m8 ksub16):       ${t("C")(rec(Ann.ivfPqTopK(qset, e, "vec_id", "embedding", coarse, cbsC, 5, 4, residual = true)))}%.3f")
    // D: m16 trained residual
    val strideD = Ann.strideCentroids(e, "vec_id", "embedding", nCentroids = 16)
    val cbsD0 = Ann.pqCodebooks(strideD, m = 16)
    val cbsD = t("trainD")(Ann.pqTrainCodebooksExact(resDf, "res", cbsD0, iters = 2))
    println(f"D  residual + trained x2 m16 ksub16:        ${t("D")(rec(Ann.ivfPqTopK(qset, e, "vec_id", "embedding", coarse, cbsD, 5, 4, residual = true)))}%.3f")
    // E: ksub=64 m8 residual trained
    val strideE = Ann.strideCentroids(e, "vec_id", "embedding", nCentroids = 64)
    val cbsE0 = Ann.pqCodebooks(strideE, m = 8)
    val cbsE = t("trainE")(Ann.pqTrainCodebooksExact(resDf, "res", cbsE0, iters = 2))
    println(f"E  residual + trained x2 m8 ksub64:         ${t("E")(rec(Ann.ivfPqTopK(qset, e, "vec_id", "embedding", coarse, cbsE, 5, 4, residual = true)))}%.3f")
    // F: non-residual trained m16 (isolate residual's contribution)
    val cbsF = t("trainF")(Ann.pqTrainCodebooksExact(e, "embedding", cbsD0, iters = 2))
    println(f"F  trained x2 m16 ksub16 (no residual):     ${t("F")(rec(Ann.ivfPqTopK(qset, e, "vec_id", "embedding", coarse, cbsF, 5, 4)))}%.3f")
    // G: more iterations on the best shape
    val cbsG = t("trainG")(Ann.pqTrainCodebooksExact(resDf, "res", cbsD0, iters = 5))
    println(f"G  residual + trained x5 m16 ksub16:        ${t("G")(rec(Ann.ivfPqTopK(qset, e, "vec_id", "embedding", coarse, cbsG, 5, 4, residual = true)))}%.3f")
    // H: IVF ceiling — exact in-cell scoring at probe4 (recall cap of ANY
    // PQ under this coarse gate)
    println(f"H  IVF probe4 EXACT in-cell (ceiling):      ${t("H")(rec(Ann.ivfTopKWith(qset, e, "vec_id", "embedding", 5, coarse, 4)))}%.3f")
    // I: G + exact re-rank of the ADC top-25 (FAISS refine pattern)
    def rerank(cand: org.apache.spark.sql.DataFrame, kOut: Int): org.apache.spark.sql.DataFrame = {
      val withVec = cand.select("query_id", "neighbor_id")
        .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")), Seq("neighbor_id"))
        .join(broadcast(qset.select(col("vec_id").as("query_id"), col("embedding").as("qv"))), Seq("query_id"))
      val cos = call_function("graft_vec_cosine", col("qv"), col("cv"))
      val scored = withVec.select(col("query_id"), col("neighbor_id"), cos.as("cos"))
      scored.groupBy("query_id")
        .agg(call_function("graft_top_k_by",
          struct(col("neighbor_id"), col("cos")), col("cos"),
          -col("neighbor_id"), lit(kOut)).as("top"))
        .select(col("query_id"), posexplode(col("top")))
        .select(col("query_id"), col("col.neighbor_id").as("neighbor_id"))
    }
    val candG25 = Ann.ivfPqTopK(qset, e, "vec_id", "embedding", coarse, cbsG, 25, 4, residual = true)
    println(f"I  G top-25 + exact re-rank to 5:           ${t("I")(rec(rerank(candG25, 5)))}%.3f")
    val candG50 = Ann.ivfPqTopK(qset, e, "vec_id", "embedding", coarse, cbsG, 50, 4, residual = true)
    println(f"J  G top-50 + exact re-rank to 5:           ${t("J")(rec(rerank(candG50, 5)))}%.3f")
    spark.stop()
  }
}
