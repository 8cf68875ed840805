package graft

import org.apache.spark.sql.functions._

/** q178 composed curation chain: the one-scan contract (the corpus is
  * read ONCE, at the chain's single materialization point; no stage
  * rescans it), funnel monotonicity, and the unicode stage's
  * load-bearing injection.
  */
class CurationChainSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("one-scan contract: stages 1-4 scan the corpus once; stages 5-8 never rescan it") {
    val (preCut, full) = Queries.curationChainStages(spark, sf)
    // stages 1-4 are row-level projections/filters over ONE parquet scan
    val pre = preCut.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(pre).size === 1, pre.take(2000))
    assert(!pre.contains("Exchange"), pre.take(2000))
    // the composed remainder reads ONLY the materialized leaf — a plan
    // bug that re-derived a stage from the corpus would surface a scan
    val post = full.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(post).isEmpty, post.take(2000))
  }

  test("funnel: every stage only removes rows; the published set is nonempty") {
    val (preCut, full) = Queries.curationChainStages(spark, sf)
    val n0 = spark.read.parquet(s"$sf/documents.parquet").count()
    val n4 = preCut.count()
    val out = full.collect()
    assert(n4 <= n0)
    assert(out.nonEmpty && out.length <= n4)
    // published rows carry the chain's provenance columns
    assert(full.columns.toSeq ===
      Seq("doc_id", "source", "domain", "lang_pred", "n_tok"))
    // the domain gate really ran: no blocked domain survives
    val domains = out.map(_.getString(2)).toSet
    Queries.urlBlockedDomains.foreach(b => assert(!domains.contains(b)))
    // the langid gate really ran
    assert(out.map(_.getString(3)).toSet.subsetOf(Set("en", "und")))
  }

  test("unicode stage is load-bearing: %7==3 docs carry the injection and still dedup clean") {
    // the injected zero-width/BOM prefix must be stripped BEFORE the
    // exact-dedup/gopher stages: a %7==3 doc and a %7!=3 doc with the
    // SAME extracted text must land in one dedup group. Drive the same
    // stage stack over a two-doc frame where only the injection differs.
    import spark.implicits._
    val frame = Seq((3L, "alpha beta gamma"), (10L, "alpha beta gamma"))
      .toDF("doc_id", "clean0")
    val normalized = frame.withColumn("clean_text",
      graft.functions.TextAnalysis.normalizeUnicode(
        concat(when(pmod(col("doc_id"), lit(7)) === 3, lit("\u200B\uFEFF"))
          .otherwise(lit("")), col("clean0"))).getField("clean_text"))
    val texts = normalized.select("clean_text").as[String].collect().toSet
    assert(texts === Set("alpha beta gamma"))
    val survivors = graft.operators.Dedup
      .dedupExactRows(normalized, Seq("clean_text"), "doc_id")
      .select("doc_id").as[Long].collect().toSeq
    assert(survivors === Seq(3L))
  }
}
