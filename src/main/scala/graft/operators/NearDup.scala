package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Near-duplicate detection for document corpora: n-gram Jaccard,
  * MinHash + LSH banding, SimHash.
  *
  * Scale notes: the cardinal sin at 100 TB is materializing the n² pair
  * space. Every operator here joins only on shared shingles / signature
  * bands / simhash blocks, so candidate pairs — not all pairs — shuffle.
  * Shingle sets are deduplicated per doc BEFORE the self-join (set
  * semantics and smaller shuffle). Hot shingles (stopword runs) can be
  * frequency-capped upstream if a corpus has degenerate skew; AQE skew
  * handling covers the moderate case.
  */
object NearDup {

  /** Word n-gram shingles as a deduplicated array column. Docs with fewer
    * than n tokens yield an empty array — `sequence(1, 0)` would otherwise
    * run DESCENDING to [1, 0] and `slice(_, 0, n)` throws.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val count = size(toks) - (n - 1)
    when(count < 1, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), count),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** Exploded (id, shingle) pairs — one shuffle-side of the similarity join. */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("shingle"))

  /** Pairs (id_a < id_b) with n-gram Jaccard ≥ threshold.
    * Exact: |A∩B| from a self-join on shared shingles, |A∪B| = |A|+|B|−∩.
    * Only docs sharing ≥1 shingle ever pair up.
    *
    * Shuffle shape: the self-join keys on xxhash64(shingle) — an 8-byte
    * long instead of an n-word string — and each exploded row carries its
    * doc's shingle count, so |A| and |B| ride the pair aggregation
    * (`any_value`) and no second scan / size join is needed. A 64-bit hash
    * collision between distinct shingles of two compared docs would
    * perturb a count; at 10^9 distinct shingles the expected number of
    * colliding pairs is ~10^18/2^65 ≈ 0.03 — accepted for the speedup.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double): DataFrame = {
    // explode_outer, NOT explode: plain explode makes Catalyst infer a
    // `size(sh) > 0 AND isnotnull(sh)` filter and push it below the
    // projection, duplicating the whole shingle expression (regex split +
    // transform + array_distinct) into the filter — 3× the string work per
    // row. With the outer variant the array is computed once; empty-array
    // rows surface as one null shingle and are dropped by a filter on the
    // GENERATED column, which cannot sink below the Generate.
    // shuffle_hash, NOT broadcast: a broadcast self-join evaluates the
    // shingle subtree twice (broadcast build + streamed probe); with both
    // sides shuffling on h the second exchange is a ReusedExchange and the
    // string work runs once. At 100 TB neither side is broadcastable
    // anyway — this is also the only strategy that scales.
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val st = docs
      .select(col(idCol).as("id"),
        call_function("graft_ngram_hashes",
          split(lower(trim(col(textCol))), "\\s+"), lit(n)).as("sh"))
      .select(col("id"), size(col("sh")).as("nsh"), explode_outer(col("sh")).as("h"))
      .filter(col("h").isNotNull)
      .hint("shuffle_hash")
    st.as("a").join(st.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"),
        any_value(col("a.nsh")).as("nsh_a"), any_value(col("b.nsh")).as("nsh_b"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("nsh_a") + col("nsh_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature: one minimum per seed over md5(seed || shingle).
    * String-min over hex md5 is engine-portable (same result in any ANSI
    * SQL engine), which is what the oracle check needs; swap in xxhash64
    * for raw speed when portability doesn't matter.
    */
  def minhashSignature(text: Column, n: Int, numHashes: Int): Column = {
    val sh = shingles(text, n)
    val mins = (0 until numHashes).map { seed =>
      array_min(transform(sh, s => md5(concat(lit(seed.toString + ":"), s))))
    }
    array(mins.toIndexedSeq: _*)
  }

  /** LSH banding over minhash signatures: docs sharing any band (a slice
    * of `rowsPerBand` consecutive signature entries) become candidates;
    * candidates are verified with estimated Jaccard = fraction of matching
    * signature positions. Returns (id_a < id_b, est_jaccard ≥ threshold).
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int, numHashes: Int, rowsPerBand: Int,
                      threshold: Double): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val sigs = docs.select(col(idCol).as("id"),
      minhashSignature(col(textCol), n, numHashes).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(numBands - 1)),
        b => md5(concat_ws("|", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
    cand.withColumn("est_jaccard",
        round(size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b)).cast("double") / numHashes, 4))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** 64-bit SimHash over whitespace tokens: per-bit weighted vote of
    * xxhash64(token). Near-dups have small hamming distance.
    */
  def simhash(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val hashes = transform(toks, t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two signed-64 simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** [[simhash]] via the native codegen expression (one tight loop per row
    * instead of a 64-aggregate Column tree; same bits — spec-checked).
    */
  def simhashFast(text: Column): Column =
    call_function("graft_simhash64", split(lower(trim(text)), "\\s+"))

  /** SimHash near-dup pairs with hamming ≤ maxDist. Blocking: split the 64
    * bits into (maxDist+1) blocks — pigeonhole guarantees any pair within
    * maxDist shares at least one exact block, so the self-join runs on
    * block equality, never n². Hamming is filtered BEFORE the pair dedup
    * so only passing (id, id, dist) triples shuffle.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String, maxDist: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val nBlocks = maxDist + 1
    val width = 64 / nBlocks
    val sh = docs.select(col(idCol).as("id"), simhashFast(col(textCol)).as("sh"))
    val blocked = sh.select(col("id"), col("sh"),
      posexplode(array((0 until nBlocks).map { blk =>
        shiftrightunsigned(col("sh"), blk * width)
          .bitwiseAND(lit((1L << width) - 1))
      }: _*)))
      .withColumnRenamed("pos", "blk").withColumnRenamed("col", "blkval")
      .hint("shuffle_hash") // self-join: shuffle both sides → ReusedExchange
    blocked.as("a").join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.blkval") === col("b.blkval") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming64(col("a.sh"), col("b.sh")).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .dropDuplicates("id_a", "id_b")
  }
}
