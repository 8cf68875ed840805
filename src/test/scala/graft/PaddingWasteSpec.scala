package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Padding-waste census ([[Sampling.paddingWasteCensus]], q166): ceil
  * arithmetic, packed lower bound, stratum isolation, and the
  * null/zero-token exclusion contract.
  */
class PaddingWasteSpec extends SparkSpec {

  private def run(rows: Seq[(String, java.lang.Long)], lens: Seq[Int]) = {
    import spark.implicits._
    Sampling.paddingWasteCensus(rows.toDF("lang", "n_tok"),
        col("lang"), col("n_tok"), lens)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))))
      .toMap
  }

  test("naive vs packed: ceil per doc vs ceil of the stratum total") {
    val rows = Seq[(String, java.lang.Long)](
      ("en", 10L), ("en", 30L), ("en", 33L), ("de", 65L))
    val got = run(rows, Seq(32))
    // en: naive = 1+1+2 = 4 seqs (128 padded, 73 tokens → 55 waste);
    //     packed = ceil(73/32) = 3 seqs → 96-73 = 23 waste
    assert(got(("en", 32L)) == ((3L, 73L, 4L, 55L, 3L, 23L)))
    // de: one 65-token doc at L=32 → 3 seqs either way
    assert(got(("de", 32L)) == ((1L, 65L, 3L, 31L, 3L, 31L)))
  }

  test("each seq_len gets its own row; exact-multiple docs waste nothing") {
    val rows = Seq[(String, java.lang.Long)](("en", 64L), ("en", 64L))
    val got = run(rows, Seq(32, 64))
    assert(got(("en", 64L)) == ((2L, 128L, 2L, 0L, 2L, 0L)))
    assert(got(("en", 32L)) == ((2L, 128L, 4L, 0L, 4L, 0L)))
  }

  test("null and zero token counts are excluded; ratio is waste/padded") {
    import spark.implicits._
    val rows = Seq[(String, java.lang.Long)](
      ("en", 48L), ("en", null), ("en", 0L))
    val df = Sampling.paddingWasteCensus(rows.toDF("lang", "n_tok"),
      col("lang"), col("n_tok"), Seq(32))
    val r = df.collect().head
    assert(r.getLong(2) == 1L && r.getLong(4) == 2L)
    assert(r.getDouble(8) == 16.0 / 64.0)
  }
}
