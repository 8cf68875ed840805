package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical-layout operators: space-filling-curve clustering keys and
  * range-clustered writes — the data-SKIPPING side of 100 TB design.
  *
  * Why it matters at scale: parquet readers prune whole files (and row
  * groups) from min/max column statistics before reading a byte. A table
  * sorted by ONE column gets tight stats on that column only — a
  * predicate on any other column still touches every file. A Z-order
  * (Morton) key interleaves the bits of TWO columns so that sorting by
  * the single key clusters the data in BOTH dimensions at once: every
  * contiguous key range maps to a small rectangle of the (x, y) grid, so
  * every file's min/max stats are tight on x AND y and point/band
  * predicates on either column skip most of the table (the technique
  * behind Delta/Iceberg Z-ORDER clustering; Morton 1966 — public
  * technique).
  *
  * All of it is plain column arithmetic (shifts, masks, ORs) — pure
  * codegen projections, zero shuffles until the explicit range
  * repartition in [[writeRangeClustered]].
  */
object Layout {

  /** Linear map of `c` from [lo, hi] onto the 2^bits-cell integer grid
    * (hi lands in the top cell; out-of-range inputs clamp to the edge
    * cells, NULL stays NULL — guarded explicitly: Spark's
    * greatest/least SKIP nulls, so the bare clamp would silently send a
    * NULL row to cell 0 and interleave it into a wrong-but-valid key).
    * `lo`/`hi` are plan constants — compute them once (one tiny min/max
    * agg) like a centroid matrix.
    */
  def normalizeToBits(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val cells = (1L << bits) - 1
    val d = c.cast("double")
    when(d.isNotNull, least(greatest(
      floor((d - lo) / (hi - lo) * (cells + 1).toDouble),
      lit(0L)), lit(cells)))
  }

  /** Z-order (Morton) key: the bits of `x` weave into the even positions
    * and `y` into the odd ones, so ascending key order walks the 2^bits ×
    * 2^bits grid in the Z curve. Inputs must already sit in [0, 2^bits)
    * ([[normalizeToBits]] guarantees it) — an out-of-range value would
    * SILENTLY interleave into a wrong cell, so it raises instead; NULL in
    * either column yields a NULL key.
    *
    * Scale notes: 2·bits shift/mask/OR terms over two long columns — one
    * codegen projection, constant-folded shift amounts, no kernel needed.
    */
  def zorderKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val range = lit(1L << bits)
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    def inRange(c: Column) = c.isNull || (c >= 0 && c < range)
    when(inRange(x) && inRange(y), terms.reduce(_.bitwiseOR(_)))
      .otherwise(raise_error(concat(
        lit(s"zorderKey: input outside [0, ${1L << bits}): x="),
        x.cast("string"), lit(" y="), y.cast("string"))))
  }

  /** Range-clustered write: range-repartition on `keyCol` into
    * `numFiles` partitions and sort within each, so every output file
    * covers a DISJOINT, contiguous key range — with a Z-order key that
    * makes each file a small rectangle of the value grid and its min/max
    * stats tight in BOTH interleaved dimensions.
    *
    * Scale notes: ONE range shuffle (sampled range bounds balance the
    * files even under key skew — Spark's RangePartitioner samples, it
    * does not assume uniformity) + an in-partition spillable sort; no
    * global sort, no driver involvement.
    */
  def writeRangeClustered(df: DataFrame, path: String, keyCol: String,
                          numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** The whole Z-order publish in one call: compute both dims' bounds
    * (ONE tiny min/max agg — plan constants, the centroid-matrix
    * pattern), normalize onto the 2^bits grid, interleave, and
    * range-cluster the files on the key — so every output file is a
    * small rectangle of the (x, y) value grid and its parquet min/max
    * stats are tight on BOTH underlying columns. A reader filtering on
    * either dimension then skips most files/row-groups from footer
    * stats alone.
    *
    * A constant dimension (min == max) degenerates to cell 0 — the
    * write still clusters on the other dim instead of failing on
    * `normalizeToBits`' hi > lo contract. Rows where either dim is NULL
    * — or non-finite: NaN/±Inf carry no grid position, and a NaN bound
    * would otherwise poison the grid (max() returns NaN) while an Inf
    * bound silently collapses every cell to 0 — get a NULL key and
    * range-partition together at the low end — present, not dropped.
    * Bounds come from a finite-only min/max (the Summaries isFin
    * pattern), so a single rogue Inf row no longer destroys the
    * clustering of every other row. The key column rides along in the
    * output (like an explicit cluster-key column); `keyCol` must not
    * collide.
    */
  def writeZorderClustered(df: DataFrame, path: String, x: Column, y: Column,
                           numFiles: Int, bits: Int = 8,
                           keyCol: String = "zkey"): Unit = {
    require(!df.columns.exists(_.equalsIgnoreCase(keyCol)),
      s"writeZorderClustered key column '$keyCol' already exists on the input")
    // finite-or-NULL: NULL, NaN and ±Inf all take the NULL-key path
    def fin(c: Column): Column = {
      val d = c.cast("double")
      when(!isnan(d) && d > Double.NegativeInfinity &&
        d < Double.PositiveInfinity, d)
    }
    val (fx, fy) = (fin(x), fin(y))
    val b = df.agg(min(fx), max(fx), min(fy), max(fy)).head()
    require(!b.isNullAt(0) && !b.isNullAt(2),
      "writeZorderClustered: cannot cluster an empty or all-NULL/non-finite frame")
    def cell(c: Column, lo: Double, hi: Double): Column =
      if (hi > lo) normalizeToBits(c, lo, hi, bits)
      // constant dim: every non-NULL value sits in cell 0 (keep the
      // NULL-propagation the grid form has)
      else when(c.isNotNull, lit(0L))
    val zx = cell(fx, b.getDouble(0), b.getDouble(1))
    val zy = cell(fy, b.getDouble(2), b.getDouble(3))
    writeRangeClustered(df.withColumn(keyCol, zorderKey(zx, zy, bits)),
      path, keyCol, numFiles)
  }
}
