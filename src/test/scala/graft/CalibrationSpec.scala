package graft

import org.apache.spark.sql.functions._
import graft.operators.Summaries

/** Calibration bins ([[Summaries.calibrationBins]], q169): bin edges,
  * rate/mean arithmetic, the top-edge clamp, and null-score exclusion.
  */
class CalibrationSpec extends SparkSpec {

  test("bins, rates, mean score, and the 1.0 clamp") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, Long)](
      (0.05, 0L), (0.08, 1L),   // bin 0: rate 0.5
      (0.55, 1L), (0.58, 1L),   // bin 5: rate 1.0
      (1.00, 1L),               // clamps to bin 9
      (null, 1L))               // excluded
      .toDF("score", "pos")
    val got = Summaries.calibrationBins(df, col("score"), col("pos"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set(0L, 5L, 9L))
    assert(got(0L) == ((2L, 1L, 0.5, (0.05 + 0.08) / 2)))
    assert(got(5L)._1 == 2L && got(5L)._3 == 1.0)
    assert(got(9L) == ((1L, 1L, 1.0, 1.0)))
  }

  test("calibration gap is mean_score - pos_rate") {
    import spark.implicits._
    val df = Seq((0.9, 0L), (0.92, 1L)).toDF("score", "pos")
    val r = Summaries.calibrationBins(df, col("score"), col("pos")).collect().head
    assert(math.abs(r.getDouble(5) - (0.91 - 0.5)) < 1e-9)
  }
}
