package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every catalog query at the driver-supplied
  * scale factor and prints ONE JSON line. Any query failure is recorded in
  * the JSON AND propagated as a nonzero exit code — a Spark job abort must
  * never masquerade as a clean run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM (catalyst init, codegen compiler, parquet reader,
    // string-expression JIT) on the tiny SF so the first timed queries
    // aren't charged for one-time compilation.
    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory) "/root/testdata/sf0.001"
      else sfDir // no tiny SF on this host: warm on the target (costs one extra pass)
    try {
      SparkEntry.queries("q01_agg_summary")(spark, warmDir).count()   // agg path
      SparkEntry.queries("q24_lang_id")(spark, warmDir).count()       // text path
      SparkEntry.queries("q03_join_enrich")(spark, warmDir).count()   // join path
    } catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val fs = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
