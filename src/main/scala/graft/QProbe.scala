package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** r21 measurement probe: where does q142_bpe_train_deep's wall time go?
  * Counts Spark jobs and their wall spans across one construction of the
  * query (the trainer runs eagerly at plan build), then the terminal
  * toRdd.count. Prints one JSON line: job count, summed job wall,
  * end-to-end wall — the gap is driver-side (planning/codegen) time.
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    var jobWall = 0L
    var nJobs = 0
    val durs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int)]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time, js.stageInfos.map(_.numTasks).sum))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, nt) = jobs.getOrDefault(je.jobId, (je.time, -1))
        jobWall += (je.time - t0); nJobs += 1
        durs.add((je.jobId, je.time - t0, nt))
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
        stages.add((si.stageId,
          s"s${si.stageId}[${si.numTasks}t wall=${wall} run=${m.executorRunTime} " +
          s"deser=${m.executorDeserializeTime} gc=${m.jvmGCTime} " +
          s"serRes=${m.resultSerializationTime} cpu=${m.executorCpuTime / 1000000}]"))
      }
    }
    sys.env.get("GRAFT_PROBE_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    // warm once (JIT, codegen cache, parquet reader)
    SparkEntry.queries(sys.env.getOrElse("GRAFT_PROBE_Q","q142_bpe_train_deep"))(spark, "/root/testdata/sf0.001")
      .queryExecution.toRdd.count()
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(sys.env.getOrElse("GRAFT_PROBE_Q","q142_bpe_train_deep"))(spark, sfDir)
    val tBuild = System.nanoTime()
    df.queryExecution.toRdd.count()
    val t1 = System.nanoTime()
    Thread.sleep(500) // let the listener bus drain
    println(s"""{"n_jobs":$nJobs,"job_wall_sec":${jobWall / 1e3},"build_sec":${(tBuild - t0) / 1e9},"total_sec":${(t1 - t0) / 1e9}}""")
    import scala.jdk.CollectionConverters._
    val ds = durs.asScala.toSeq.sortBy(_._1)
    println("jobId,durMs,nTasks: " + ds.map { case (i, d, n) => s"$i:$d:$n" }.mkString(" "))
    println("stages: " + stages.asScala.toSeq.sortBy(_._1).map(_._2).mkString(" "))
    spark.stop()
  }
}
