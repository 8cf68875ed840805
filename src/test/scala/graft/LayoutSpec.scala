package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order clustering: key correctness against a bit-twiddling model,
  * the loud out-of-range contract, and the property the whole operator
  * exists for — a range-clustered write yields files whose min/max
  * stats are tight in BOTH interleaved dimensions.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonModel(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zorderKey equals the bit-interleave model across random points") {
    val rnd = new scala.util.Random(47)
    val pts = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(1 << 10).toLong, rnd.nextInt(1 << 10).toLong))
    val got = pts.toDF("id", "x", "y")
      .select(col("id"), Layout.zorderKey(col("x"), col("y"), 10).as("z"))
      .as[(Long, Long)].collect().toMap
    pts.foreach { case (id, x, y) =>
      assert(got(id) === mortonModel(x, y, 10), s"x=$x y=$y")
    }
  }

  test("zorderKey: NULL input yields NULL key; out-of-range raises") {
    val ok = Seq((1L, Some(3L), None: Option[Long])).toDF("id", "x", "y")
      .select(Layout.zorderKey(col("x"), col("y"), 4).as("z")).head()
    assert(ok.isNullAt(0))
    val bad = Seq((1L, 16L, 2L)).toDF("id", "x", "y") // 16 = 2^4, one past
    val e = intercept[Throwable] {
      bad.select(Layout.zorderKey(col("x"), col("y"), 4)).collect()
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(c => Option(c.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(e).contains("zorderKey"), msgs(e))
  }

  test("normalizeToBits clamps edges and maps hi into the top cell; NULL stays NULL") {
    val out = Seq(-5.0, 0.0, 50.0, 100.0, 140.0).toDF("v")
      .select(Layout.normalizeToBits(col("v"), 0.0, 100.0, 4).as("c"))
      .as[Long].collect().toSeq
    assert(out === Seq(0L, 0L, 8L, 15L, 15L))
    // Spark's greatest/least skip NULLs — the explicit guard keeps the
    // documented NULL propagation (a bare clamp lands NULL in cell 0)
    val n = Seq(None: Option[Double], Some(50.0)).toDF("v")
      .select(Layout.normalizeToBits(col("v"), 0.0, 100.0, 4).as("c"))
      .collect()
    assert(n(0).isNullAt(0) && n(1).getLong(0) === 8L)
  }

  test("range-clustered z-order files are rectangles: tight stats in BOTH dims") {
    // the full 32x32 grid, z-ordered into 8 disjoint key ranges: every
    // file must span at most HALF the domain in x AND y (a y-sorted
    // layout gives full-width x extents — stats useless for x predicates)
    val grid = for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
      .withColumn("zkey", Layout.zorderKey(col("x"), col("y"), 5))
    val dir = Files.createTempDirectory("zorder").toString + "/t"
    Layout.writeRangeClustered(df, dir, "zkey", numFiles = 8)
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("zkey").as("zlo"), max("zkey").as("zhi"),
        (max("x") - min("x")).as("xext"), (max("y") - min("y")).as("yext"))
      .collect()
    assert(stats.length === 8, stats.mkString("\n"))
    // disjoint, contiguous key ranges (range partitioning's guarantee)
    val ranges = stats.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi < lo, ranges.mkString(","))
    }
    // both-dims locality — the point of the curve
    stats.foreach { r =>
      assert(r.getLong(3) <= 16 && r.getLong(4) <= 16,
        s"file spans xext=${r.getLong(3)} yext=${r.getLong(4)}")
    }
  }

  test("writeZorderClustered: NaN/Inf rows take the NULL-key path, bounds stay finite") {
    // a NaN in either dim used to make max() return NaN and fail the
    // hi > lo require with a confusing message; a single Inf silently
    // collapsed the whole grid to cell 0 — bounds are now finite-only
    // and non-finite rows cluster with the NULLs, present not dropped
    val df = ((1 to 64).map(i => (i.toLong, i.toDouble, (i % 8).toDouble)) ++ Seq(
      (100L, Double.NaN, 1.0),
      (101L, Double.PositiveInfinity, 2.0),
      (102L, 3.0, Double.NegativeInfinity)))
      .toDF("id", "x", "y")
    val dir = Files.createTempDirectory("znonfin").toString + "/t"
    Layout.writeZorderClustered(df, dir, col("x"), col("y"), numFiles = 2)
    val back = spark.read.parquet(dir)
    assert(back.count() === 67L) // nothing dropped
    // exactly the three non-finite rows carry a NULL key
    assert(back.filter(col("zkey").isNull).select("id").as[Long]
      .collect().toSet === Set(100L, 101L, 102L))
    // and the finite rows kept a real spread of cells (an Inf bound
    // would have collapsed every key to 0)
    assert(back.filter(col("zkey").isNotNull).select("zkey").distinct()
      .count() > 8L)
    // all-non-finite input fails with the documented error, not a
    // confusing NaN-bound require
    val bad = Seq((1L, Double.NaN, 1.0)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      Layout.writeZorderClustered(bad, Files.createTempDirectory("zbad").toString + "/t",
        col("x"), col("y"), numFiles = 1)
    }
    assert(e.getMessage.contains("all-NULL/non-finite"), e.getMessage)
  }
}
