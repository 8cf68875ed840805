package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the Z-order publish's data-skipping claim instead of arguing
  * it (the r12→r14 carried item): runs [[graft.pipeline.ReferencePipeline]]
  * end-to-end on synthetic session exports, publishes the joined table
  * BOTH ways — plain repartition vs
  * [[graft.pipeline.ReferencePipeline.publishJoinedClustered]] — and
  * reports, for a facility+month dashboard predicate:
  *
  *  - files a min/max-stats reader skips (per-file (facility,
  *    month_year_sort) ranges grouped by input_file_name — exactly the
  *    footer stats a Delta/Iceberg-style file index or parquet reader
  *    consults), and
  *  - the Spark-observable row-group effect: the scan's numOutputRows
  *    under the pushed predicate (rows materialized from surviving row
  *    groups before the post-scan filter).
  *
  * Prints ONE JSON line (the [[Bench]] artifact contract). Knobs:
  * GRAFT_ZORDER_SESSIONS (admission count, default 300000),
  * GRAFT_ZORDER_FILES (published file count, default 64).
  */
object ZorderScaleProbe {
  def main(args: Array[String]): Unit = {
    val nAdm = sys.env.getOrElse("GRAFT_ZORDER_SESSIONS", "300000").toLong
    val numFiles = sys.env.getOrElse("GRAFT_ZORDER_FILES", "64").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // synthetic exports, executor-side: 12 facilities × 24 months spread;
    // every uid admits, 80% discharge 3 days later — the r12 probe shape
    // at artifact-reproducible size
    def sess(script: String, startExpr: org.apache.spark.sql.Column) =
      format_string(
        """{"scriptid":"%s","facility":"F%d","uid":"u%d","started_at":"%s","completed_at":"%s","entries":[{"key":"Temp","values":[{"value":"%s","label":"Temperature"}]}]}""",
        lit(script), pmod(col("id"), lit(12)), col("id"),
        startExpr, startExpr,
        format_string("%.1f", lit(35.0) + pmod(col("id"), lit(40)) / 10.0))
    def startOf(dayOff: Int) = {
      // `/` on longs is double division in Spark SQL — floor back to a
      // long month index before feeding %d
      val mi = pmod(floor(col("id") / lit(12)).cast("long"), lit(24L))
      format_string("%d-%02d-%02dT08:00:00",
        lit(2025L) + floor(mi / lit(12)).cast("long"),
        pmod(mi, lit(12L)) + 1L,
        pmod(col("id"), lit(25L)) + 1L + dayOff)
    }
    val ids = spark.range(0, nAdm, 1, cpus.toInt)
    val raw = ids.select(sess("adm", startOf(0)).as("json"))
      .unionAll(ids.filter(pmod(col("id"), lit(5)) =!= 0)
        .select(sess("dis", startOf(3)).as("json")))

    val t0 = System.nanoTime()
    val out = graft.pipeline.ReferencePipeline.run(raw, "json", Seq("Temp"),
      knownMclKeys = Some(Nil))
    val planSec = (System.nanoTime() - t0) / 1e9

    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val (plainPath, zPath) = (s"$base/joined_plain", s"$base/joined_z")
    val t1 = System.nanoTime()
    graft.pipeline.ReferencePipeline.hygiene(out.joined)
      .repartition(numFiles)
      .write.mode("overwrite").parquet(plainPath)
    val plainSec = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    graft.pipeline.ReferencePipeline.publishJoinedClustered(out, zPath, numFiles)
    val zSec = (System.nanoTime() - t2) / 1e9

    // the dashboard predicate: one facility, one month
    val (fac, month) = ("F3", 202601L)
    // per-file min/max on the two predicate columns — the same ranges
    // the parquet footer carries; a stats-indexed reader opens only
    // files whose range covers the predicate
    def filesHit(path: String): (Long, Long) = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("facility").cast("string")).as("flo"),
          max(col("facility").cast("string")).as("fhi"),
          min("month_year_sort").as("mlo"), max("month_year_sort").as("mhi"))
      val total = stats.count()
      val hit = stats.filter(
        lit(fac) >= col("flo") && lit(fac) <= col("fhi") &&
        lit(month) >= col("mlo") && lit(month) <= col("mhi")).count()
      (total, hit)
    }
    val (nPlain, hitPlain) = filesHit(plainPath)
    val (nZ, hitZ) = filesHit(zPath)

    // Spark-observable effect: pushed-filter row-group pruning — rows the
    // scan materializes under the predicate (post-prune, pre-filter)
    def scanRows(path: String): (Long, Long) = {
      val q = spark.read.parquet(path)
        .filter(col("facility") === fac && col("month_year_sort") === month)
      // drive THIS queryExecution (a separate count() would run its own
      // execution and leave these scan metrics at zero)
      val qe = q.queryExecution
      val matched = qe.toRdd.count()
      val scans = qe.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      (scans.map(_.metrics("numOutputRows").value).sum, matched)
    }
    val (rowsPlain, matchedPlain) = scanRows(plainPath)
    val (rowsZ, matchedZ) = scanRows(zPath)

    val json =
      s"""{"metric":"zorder_files_hit","value":$hitZ,"unit":"files",""" +
      s""""sessions":$nAdm,"num_files":$numFiles,"predicate":"facility=$fac AND month=$month",""" +
      s""""files_total_plain":$nPlain,"files_hit_plain":$hitPlain,""" +
      s""""files_total_z":$nZ,"files_hit_z":$hitZ,""" +
      s""""scan_rows_plain":$rowsPlain,"scan_rows_z":$rowsZ,""" +
      s""""matched_rows_plain":$matchedPlain,"matched_rows_z":$matchedZ,""" +
      s""""pipeline_plan_sec":$planSec,"publish_plain_sec":$plainSec,"publish_z_sec":$zSec,""" +
      s""""sf":"synthetic-sessions"}"""
    println(json)
    val outFile = sys.env.getOrElse("GRAFT_BENCH_OUT", "zorder_scale_out.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[probe] could not write $outFile: $e") }
    spark.stop()
  }
}
