package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Readers for the graft table layout: one parquet dataset per table under
  * a scale-factor directory. Parquet gives us column pruning + predicate
  * pushdown for free; at 100 TB these would be partitioned/bucketed
  * datasets and the same `spark.read.parquet` call still applies.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    rebalance(spark, spark.read.parquet(s"$dir/$name.parquet"),
      s"$dir/$name.parquet")

  /** Rebalance a scan whose FILE LAYOUT provides fewer splits than the
    * session's parallelism — guide §2.5's "input skew: one huge
    * unsplittable file … repartition immediately after the read", made
    * layout-adaptive instead of host-tuned: the decision reads the
    * actual input bytes vs `spark.sql.files.maxPartitionBytes`, so a
    * production table that already arrives as many splits (100 TB =
    * thousands) is a NO-OP, while a single-row-group parquet file (the
    * small-SF testdata; any under-compacted source) stops pinning every
    * first-stage pass — tokenize, codec work, map-side partial
    * aggregation — to ONE core (measured r20: the catalog's stage-1 was
    * single-threaded at sf0.1 on 32 cores). Sub-256 KB inputs are left
    * alone: dimension tables gain nothing and the exchange would only
    * add a stage in front of their broadcast. Round-robin keeps balance
    * perfect; Spark's sort-before-repartition (default on) makes the
    * spread deterministic under task retry.
    */
  private def rebalance(spark: SparkSession, df: DataFrame,
                        path: String): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    val bytes = try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(p).getLength
    } catch { case _: Exception => Long.MaxValue }
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val estSplits = math.max(1L, (bytes + maxSplit - 1) / maxSplit)
    if (bytes >= 256 * 1024 && estSplits < par) df.repartition(par) else df
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS) (pyarrow writer default),
    * which Spark's parquet reader rejects outright. Read nanos as long
    * (legacy conf, set at session build by [[graft.Sessions.tune]]; set
    * here too only as a fallback for externally-built sessions) and
    * floor-truncate to microsecond TimestampType — the same truncation the
    * DuckDB oracle applies via CAST(ts AS TIMESTAMP), so both engines
    * order and emit identical instants. Floor, not `div` (which truncates
    * toward zero): pre-epoch nanos would otherwise round up by 1us.
    */
  private def withNanosTs(spark: SparkSession, dir: String, name: String): DataFrame = {
    // value check, not getOption: a registered SQLConf always answers with
    // its default ("false"), so an Option-emptiness guard would never fire
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, name)
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
      // A TIMESTAMP_NTZ-written parquet (newer pyarrow emits isAdjustedToUTC
      // = false) reads back as TimestampNTZType, which functions like
      // unix_micros reject and which breaks the surface contract that `ts`
      // is TIMESTAMP. The NTZ→timestamp cast interprets the wall-clock in
      // the SESSION time zone — instant-preserving ONLY when that zone is
      // UTC. The build pins it (build.sbt), but a consumer embedding this
      // reader in their own session could silently shift every ts by
      // their zone offset — assert the invariant AT THE CAST SITE so a
      // mis-zoned session fails loudly instead of corrupting instants.
      case TimestampNTZType =>
        val tz = spark.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC" || tz == "Etc/UTC" || tz == "GMT",
          s"Tables: TIMESTAMP_NTZ -> TIMESTAMP relabeling requires " +
            s"spark.sql.session.timeZone=UTC (got '$tz') — the cast would " +
            "shift every ts by the zone offset")
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = withNanosTs(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
