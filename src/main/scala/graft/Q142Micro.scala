package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r21 micro-probe: per-expression cost of one bpeTrainBatched round at
  * q142's dict shape (500 md5 words). Times each sub-plan 3x (min).
  */
object Q142Micro {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sep = ""
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("text"))
    val dict0 = docs.filter(col("text").isNotNull)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .select(concat(lit(sep),
        array_join(regexp_extract_all(col("w"), lit("(?s)."), lit(0)), sep + sep),
        lit(sep)).as("seq"), col("f"))
    val dict = graft.plans.Iterative.cut(dict0).coalesce(1)
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e6
      }
      println(f"$name%-28s min=${ts.min}%8.1f ms  all=${ts.map(t => f"$t%.0f").mkString(",")}")
    }
    val syms = split(col("seq").substr(lit(2), length(col("seq")) - 2),
      java.util.regex.Pattern.quote(sep + sep))
    val pairs = zip_with(
      slice(syms, lit(1), greatest(size(syms) - 1, lit(0))),
      slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
      (a, b) => struct(a.as("l"), b.as("r")))
    time("a_read")(dict)
    time("b_split")(dict.select(syms.as("s"), col("f")))
    time("c_pairs")(dict.select(pairs.as("p"), col("f")))
    time("d_explode")(dict.select(explode(pairs).as("p"), col("f")))
    time("e_agg")(dict.select(explode(pairs).as("p"), col("f"))
      .groupBy("p").agg(sum("f").as("n")))
    time("f_full")(dict.select(explode(pairs).as("p"), col("f"))
      .groupBy("p").agg(sum("f").as("n"))
      .orderBy(col("n").desc, col("p.l"), col("p.r")).limit(513))
    // alternates: arrays_zip (codegen) instead of zip_with (interpreted HOF)
    val pairsZ = arrays_zip(
      slice(syms, lit(1), greatest(size(syms) - 1, lit(0))),
      slice(syms, lit(2), greatest(size(syms) - 1, lit(0))))
      .cast("array<struct<l:string,r:string>>")
    time("g_pairsZ")(dict.select(pairsZ.as("p"), col("f")))
    time("h_fullZ")(dict.select(explode(pairsZ).as("p"), col("f"))
      .groupBy("p").agg(sum("f").as("n"))
      .orderBy(col("n").desc, col("p.l"), col("p.r")).limit(513))
    spark.stop()
  }
}
