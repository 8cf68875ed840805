package graft

import org.apache.spark.sql.functions._
import graft.operators.Views

/** Convenience views: sentinel scrubbing and the SQL surface. */
class ViewsSpec extends SparkSpec {
  import spark.implicits._

  test("scrubbed nulls sentinels and Unk-prefixes, passes real values") {
    val df = Seq("2026-01-05", "NaT", "Unknown", "Unk", "ok", "NaN").toDF("v")
    val out = df.select(Views.scrubbed(col("v"))).as[Option[String]].collect().toSeq
    assert(out == Seq(Some("2026-01-05"), None, None, None, Some("ok"), None))
  }

  test("scrubbedDate yields NULL for sentinels and dates for valid strings") {
    val df = Seq("2026-01-05", "NaT", "Unknown").toDF("v")
    val out = df.select(Views.scrubbedDate(col("v")).cast("string"))
      .as[Option[String]].collect().toSeq
    assert(out == Seq(Some("2026-01-05"), None, None))
  }

  test("registerTables puts every catalog table on the SQL surface") {
    Views.registerTables(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      """SELECT count(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""")
      .head.getLong(0)
    assert(n > 0)
    // events view carries the nanos-ts fix: ts must be a real timestamp
    assert(spark.sql("SELECT ts FROM events").schema("ts").dataType.typeName == "timestamp")
  }

  test("views stay transparent to pushdown: filter through a view reaches the scan") {
    Views.registerTables(spark, "/root/testdata/sf0.001")
    val q = spark.sql("SELECT o_orderkey FROM orders WHERE o_orderkey = 42")
    val leaves = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(leaves.contains("PushedFilters") && leaves.contains("EqualTo(o_orderkey,42)"),
      leaves.take(800))
  }
}
