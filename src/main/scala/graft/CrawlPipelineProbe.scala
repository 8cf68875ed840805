package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.operators.{DatasetCard, Dedup, Layout, NearDup, Quality, Sampling}

/** Composes the FULL crawl-to-publish curation pipeline as ONE run — the
  * r16 verdict's item 7. Every stage is spec-pinned and oracled
  * individually; THIS probe is the 100 TB claim in one artifact: the
  * stages chained the way a real curation run chains them, with plan
  * invariants checked programmatically at each seam.
  *
  *   1. URL front door (q146-q148): canonicalize + registered domain in
  *      ONE kernel projection, plan-constant blocklist gate BEFORE any
  *      shuffle, bounded-heap per-domain cap (losers never shuffle)
  *   2. HTML extraction (q152): synthesize the crawl page, extract main
  *      content — a second zero-shuffle kernel projection
  *   3. exact dedup: within-batch collapse (q21 keep-min) THEN the
  *      persistent-bloom history gate (q85/foldIntoBloom mode — history
  *      rows never reshuffle; the standing filter is prebuilt)
  *   4. near-dup probe vs history (q66): banded word-4-gram candidates,
  *      collapseExact=false (the gate's exact-unique contract)
  *   4b. unicode normalization (q155 — zero-width/BOM census asserted
  *      against the constructed injection rate) + exact substring dedup
  *      (q154 stripDupSpans, winnow=4 — the two sewn boilerplate
  *      sentences are >= k+w-1 tokens, so winnowed detection is
  *      GUARANTEED and the probe asserts every boilerplate-carrying
  *      survivor was cut, span-wise, with unique prose intact)
  *   5. quality gates: Gopher word/stopword/symbol rules (q79) then the
  *      C4 line filter (q139) on the extracted (now normalized +
  *      despanned) text
  *   6. token-budget mix by source (q68): deterministic doc_id-ordered
  *      prefix cut per stratum
  *   7. Z-order publish (q102 layout key over domain×doc) + dataset
  *      card sketch (q107's one-pass buildSketch) on the published table
  *
  * Docs are deterministic md5-word texts with CONSTRUCTED rates: 12%
  * exact dups + 8% near-dups (word-7 mutation) of the unique base, 10%
  * of seeds present in the pre-seeded history, 2.5% short (Gopher
  * fails), 2% lorem-ipsum-flagged (C4 doc flag), 2 of ~nDomains
  * blocked — the probe asserts the funnel recovers them. Prints ONE
  * JSON line (the [[Bench]] artifact contract). Knobs: GRAFT_CRAWL_DOCS
  * (default 2000000), GRAFT_CRAWL_HISTORY (500000), GRAFT_CRAWL_DOMAINS
  * (10000 — ~200 docs/domain so the k=100 cap genuinely bites),
  * GRAFT_CRAWL_CAP (100).
  */
object CrawlPipelineProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("GRAFT_CRAWL_DOCS", "2000000").toLong
    val nHist = sys.env.getOrElse("GRAFT_CRAWL_HISTORY", "500000").toLong
    val nDomains = sys.env.getOrElse("GRAFT_CRAWL_DOMAINS", "10000").toLong
    val capK = sys.env.getOrElse("GRAFT_CRAWL_CAP", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val dir = java.nio.file.Files.createTempDirectory("crawl_probe").toString

    import org.apache.spark.sql.Column
    // ── deterministic synthesis (all pure functions of doc_id) ──────────
    // seed drives CONTENT identity: %100 in [0,80) unique, [80,92) exact
    // dup of base, [92,100) near-dup of base (word 7 mutated)
    def seedOf(d: Column): Column = {
      val m = pmod(d, lit(100L))
      when(m >= 80, pmod(d, lit(math.max(nDocs / 2, 1L)))).otherwise(d)
    }
    // stage-4b constructed rates: 40% of seeds sew one of two shared
    // boilerplate sentences (>= 11 tokens = the k+w-1 winnow-4 detection
    // threshold) INTO the unique prose — stripDupSpans must cut exactly
    // those docs; %25==11 seeds carry zero-width/BOM characters —
    // normalizeUnicode must count exactly those docs
    val boilerA = "subscribe to the weekly newsletter for updates and exclusive member offers today"
    val boilerB = "download the free mobile app to keep your reading list in sync everywhere"
    def textOf(seed: Column, mutate: Column): Column = {
      val words = transform(sequence(lit(0), lit(15)), j => {
        val w = substring(md5(concat(seed.cast("string"), lit("_"),
          j.cast("string"))), 1, 8)
        val base = when(pmod(j, lit(4)) === 1, lit("the")).otherwise(w)
        when(j === 7 && mutate.isNotNull, mutate).otherwise(base)
      })
      concat(
        when(pmod(seed, lit(25L)) === 11, lit("\u200B\uFEFF")).otherwise(lit("")),
        concat_ws(" ", words),
        when(pmod(seed, lit(5L)) < 2,
          concat(lit(" "), when(pmod(seed, lit(2L)) === 0, lit(boilerA))
            .otherwise(lit(boilerB)))).otherwise(lit("")),
        // quality-fail injections keyed by SEED (dup groups share fate):
        // %50==3 → C4 doc flag; the trailing period satisfies the C4
        // line rule for everyone else
        when(pmod(seed, lit(50L)) === 3, lit(" lorem ipsum.")).otherwise(lit(".")))
    }
    def shortTextOf(seed: Column): Column = // %40==7 → Gopher too_few_words
      concat(concat_ws(" ", lit("the"),
        substring(md5(concat(seed.cast("string"), lit("_s"))), 1, 8),
        lit("short the note")), lit("."))
    def urlOf(d: Column): Column = {
      val dom = pmod(d, lit(nDomains))
      val sld = concat(lit("site"),
        substring(md5(concat(lit("dom"), dom.cast("string"))), 1, 10))
      val tld = element_at(
        array(Queries.urlTlds.map(lit): _*),
        (pmod(dom, lit(Queries.urlTlds.length)) + 1).cast("int"))
      concat(
        when(pmod(d, lit(3)) === 0, lit("HTTP")).otherwise(lit("https")),
        lit("://"),
        when(pmod(d, lit(2)) === 0, lit("www.")).otherwise(lit("")),
        sld, lit("."), tld,
        lit("/p/"), substring(md5(d.cast("string")), 1, 8),
        when(pmod(d, lit(4)) === 0, lit("?utm_source=crawl&id=1")).otherwise(lit("")),
        when(pmod(d, lit(6)) === 0, lit("#frag")).otherwise(lit("")))
    }
    def domainOfIdx(i: Long): String =
      "site" + java.security.MessageDigest.getInstance("MD5")
        .digest(("dom" + i).getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 10) + "." + Queries.urlTlds((i % Queries.urlTlds.length).toInt)
    val blocked = Seq(0L, 3L).map(domainOfIdx) // one .com, one .co.uk

    // seed-keyed content: exact-dup groups share source/page/text fate,
    // so the constructed rates survive extraction intact
    def crawlDocs(lo: Long, hi: Long): DataFrame = {
      val ids = spark.range(lo, hi, 1, cpus.toInt)
      val d = col("id")
      val seed = seedOf(d)
      val near = pmod(d, lit(100L)) >= 92
      val mut = when(near, substring(md5(concat(lit("m"), d.cast("string"))), 1, 8))
      ids.select(d.as("doc_id"), seed.as("seed"),
        concat(lit("src"), pmod(seed, lit(20L)).cast("string")).as("source"),
        urlOf(d).as("url"),
        when(pmod(seed, lit(40L)) === 7, shortTextOf(seed))
          .otherwise(textOf(seed, mut)).as("raw_text"))
    }

    val t0 = System.nanoTime()
    def secs(t: Long): Double = (System.nanoTime() - t) / 1e9
    val planChecks = scala.collection.mutable.LinkedHashMap[String, Boolean]()
    def plan(df: DataFrame): String =
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head

    // ── pre-seeded history: the EXTRACTED text of seed pages
    // 10k..10k+nHist — crawl docs whose seed lands in that band are
    // history dups (same seed → same page → same extraction) ───────────
    val tH = System.nanoTime()
    val histDir = s"$dir/history"
    def pageOf(seed: Column, text: Column, source: Column): Column =
      Queries.synthHtml(pmod(seed, lit(1000000L)), text, source)
    spark.range(0, nHist, 1, cpus.toInt)
      .select((col("id") + 10000L).as("seed"))
      .select(col("seed"),
        concat(lit("src"), pmod(col("seed"), lit(20L)).cast("string")).as("source"),
        when(pmod(col("seed"), lit(40L)) === 7, shortTextOf(col("seed")))
          .otherwise(textOf(col("seed"), lit(null).cast("string"))).as("raw_text"))
      .select(col("seed").as("doc_id"),
        TextAnalysis.htmlMainText(
          pageOf(col("seed"), col("raw_text"), col("source"))).as("clean_text"))
      .write.parquet(histDir)
    val history = spark.read.parquet(histDir)
    val expected = math.max(nHist + nDocs, 1L << 20)
    var bloomBytes = Dedup.historyBloom(history, "clean_text", expected, 0.01)
    val secHistory = secs(tH)

    // ── 1. URL front door ───────────────────────────────────────────────
    val t1 = System.nanoTime()
    val crawl = crawlDocs(0, nDocs)
    val parsed = crawl.select(col("doc_id"), col("seed"), col("source"),
      col("raw_text"),
      TextAnalysis.registeredDomain(col("url")).as("domain"),
      TextAnalysis.canonicalUrl(col("url")).as("url_canon"))
    planChecks("url_projection_no_exchange") = !plan(parsed).contains("Exchange")
    val unblocked = parsed
      .filter(col("url_canon").isNotNull &&
        !TextAnalysis.domainBlocked(col("domain"), blocked))
    // the bounded-heap cap carries the full payload out — losers never
    // shuffle, no join-back needed
    val capped = Sampling.perDomainCap(
        unblocked, col("domain"), col("doc_id"), k = capK, portable = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCapped = capped.count()
    val cp = plan(capped)
    planChecks("cap_bounded_heap_no_window") =
      cp.contains("ObjectHashAggregate") && !cp.contains("Window")
    val secUrl = secs(t1)

    // ── 2. HTML synthesis + main-content extraction ─────────────────────
    val t2 = System.nanoTime()
    val page = pageOf(col("seed"), col("raw_text"), col("source"))
    val extracted = capped
      .withColumn("hm", TextAnalysis.htmlMain(page))
      .select(col("doc_id"), col("source"), col("domain"),
        col("hm").getItem(0).as("clean_text"),
        (lit(1.0) - col("hm").getItem(4).cast("double") /
          greatest(col("hm").getItem(3).cast("double"), lit(1.0)))
          .as("boilerplate_ratio"))
    // measure the projection itself, not the cap lineage it sits on
    planChecks("html_projection_no_exchange") =
      !plan(crawlDocs(0, 16)
        .select(TextAnalysis.htmlMainText(
          pageOf(col("seed"), col("raw_text"), col("source")))))
        .contains("Exchange")
    val secHtmlPlan = secs(t2)

    // ── 3. exact dedup: within-batch collapse, then the standing-bloom
    //       history gate (history never reshuffles) ──────────────────────
    val t3 = System.nanoTime()
    // land the collapse result (a real staged pipeline checkpoints here
    // anyway) so (a) the two gate actions don't recompute it and (b) the
    // gate plan check below measures the GATE's joins only — the
    // collapse's own large×large semi join correctly goes sort-merge at
    // scale (broadcast would be the bug THERE), and a cached lineage
    // would print that nested build plan inside the gate's plan string
    Dedup.dedupExactRows(extracted, Seq("clean_text"), "doc_id")
      .select("doc_id", "source", "domain", "clean_text", "boilerplate_ratio")
      .write.parquet(s"$dir/collapsed")
    val collapsed = spark.read.parquet(s"$dir/collapsed")
    val nCollapsed = collapsed.count()
    val gated = Dedup.bloomGateWith(collapsed, history, bloomBytes, "clean_text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nHistDups = gated.filter(!col("is_new")).count()
    val gp = plan(gated)
    planChecks("gate_broadcast_only") = gp.contains("BroadcastHashJoin") &&
      !gp.contains("SortMergeJoin")
    if (!planChecks("gate_broadcast_only"))
      System.err.println("[crawl] gate plan:\n" + gp.take(6000))
    val exactUnique = gated.filter(col("is_new"))
      .drop("is_new")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nExactUnique = exactUnique.count()
    val secExact = secs(t3)

    // ── 4. near-dup probe vs history (banded, collapseExact=false) ─────
    val t4 = System.nanoTime()
    // maxShingleDf: the composition-exposed fix — extraction-surviving
    // boilerplate sentences ("Related reading …") put the same grams in
    // ~1k docs each; without the cut this stage was 148 s OF a 177 s
    // run at 100k docs (hot grams × both sides = quadratic candidates)
    val ndIds = NearDup.crossNgramPairs(exactUnique, history,
        "doc_id", "doc_id", "clean_text", "clean_text", n = 4,
        minJaccard = 0.3, collapseExact = false, maxShingleDf = Some(64))
      .select(col("id_l").as("doc_id")).distinct()
    val surviving = exactUnique.join(ndIds, Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSurviving = surviving.count()
    val nNearDups = nExactUnique - nSurviving
    val secNear = secs(t4)

    // ── 4b. unicode normalize (q155) + exact substring dedup (q154,
    //        winnow=4): the zero-width census and the sewn-boilerplate
    //        cut, each asserted against its CONSTRUCTED rate ───────────
    val t4b = System.nanoTime()
    val normalized = surviving
      .withColumn("nu", TextAnalysis.normalizeUnicode(col("clean_text")))
      .select(col("doc_id"), col("source"), col("domain"),
        col("nu.clean_text").as("clean_text"),
        col("nu.n_zero_width").as("n_zw"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // measure the projection itself on a fresh frame (the persisted
    // `surviving` lineage would print its own exchanges)
    planChecks("normalize_projection_no_exchange") =
      !plan(crawlDocs(0, 16).select(
        TextAnalysis.normalizeUnicode(col("raw_text")).getField("clean_text")))
        .contains("Exchange")
    val nZwDocs = normalized.filter(col("n_zw") > 0).count()
    val spanned = Dedup.stripDupSpans(
        normalized.select("doc_id", "clean_text"),
        "doc_id", "clean_text", k = 8, winnow = 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spanRow = spanned.agg(
      sum(when(col("dup_spans") > 0, 1L).otherwise(0L)).as("d"),
      coalesce(sum("dup_tokens"), lit(0L)).as("t")).head()
    val nBoilerDocs = spanRow.getLong(0)
    val nBoilerToks = spanRow.getLong(1)
    // constructed-rate recovery as a SANDWICH (exact set containments):
    // (a) every surviving doc whose seed sews boilerplate (%5<2) MUST be
    //     detected — both sentences are >= k+w-1 = 11 tokens, so the
    //     winnow-4 guarantee applies;
    // (b) every detected doc must be EXPLAINED: boilerplate, or same-seed
    //     survivors (near-dup siblings differ only at word 7 — their
    //     position-8+ grams are genuine cross-doc duplicates; an 8-token
    //     shared run sits below the winnow guarantee, so sibling-only
    //     detection is legitimate but not promised);
    // shorts (%40==7, < k tokens) are never detected
    val survSeeds = surviving.select(col("doc_id"),
      seedOf(col("doc_id")).as("seed"),
      (pmod(seedOf(col("doc_id")), lit(40L)) === 7).as("short"))
    val multiSeeds = survSeeds.filter(!col("short"))
      .groupBy("seed").count().filter(col("count") > 1).select("seed")
    // two boilerplate classes MUST be detected (both >= 11 tokens, the
    // winnow-4 guarantee): the sewn sentences (%5<2) and the
    // extraction-surviving "Related reading … <source> …" HTML block
    // (synthHtml keeps it: 13 words, link density ~0.16) — the SAME
    // class whose hot shingles forced r16's maxShingleDf fix; the
    // dup-span stage is the operator that finally CUTS it
    val relatedKept =
      pmod(pmod(col("seed"), lit(1000000L)), lit(5L)) === 2
    // shorts (< k prose tokens) are detectable ONLY via the related
    // block: extraction splices it after "…short the note.", and all
    // shorts share source src7 (%40==7 ⇒ %20==7), so the spliced run is
    // 15 shared tokens — above the guarantee for them too
    val boilerSet = survSeeds
      .filter((!col("short") && pmod(col("seed"), lit(5L)) < 2) ||
        relatedKept)
      .select("doc_id")
    val allowedSet = boilerSet.union(survSeeds.filter(!col("short"))
        .join(multiSeeds, Seq("seed"), "left_semi").select("doc_id"))
      .distinct()
    val detectedSet = spanned.filter(col("dup_spans") > 0).select("doc_id")
    val expBoiler = boilerSet.count()
    val nMissedBoiler =
      boilerSet.join(detectedSet, Seq("doc_id"), "left_anti").count()
    val nUnexplained =
      detectedSet.join(allowedSet, Seq("doc_id"), "left_anti").count()
    if (sys.env.contains("GRAFT_CRAWL_DEBUG") && nUnexplained > 0) {
      detectedSet.join(allowedSet, Seq("doc_id"), "left_anti")
        .join(normalized.select("doc_id", "clean_text"), Seq("doc_id"))
        .withColumn("seed", seedOf(col("doc_id")))
        .select(col("doc_id"), col("seed"),
          pmod(col("seed"), lit(100L)).as("m100"),
          pmod(col("seed"), lit(40L)).as("m40"),
          pmod(col("seed"), lit(5L)).as("m5"),
          pmod(pmod(col("seed"), lit(1000000L)), lit(5L)).as("d5"),
          substring(col("clean_text"), 1, 160).as("head"))
        .limit(20).collect()
        .foreach(r => System.err.println(s"[crawl][unexplained] $r"))
    }
    val expZw = survSeeds.filter(
      !col("short") && pmod(col("seed"), lit(25L)) === 11).count()
    // GRAFT_CRAWL_SKIP4B=1: diagnostic A/B switch — route quality onto
    // the pre-4b frame to separate 4b's own cost from downstream drift
    val despanned =
      if (sys.env.contains("GRAFT_CRAWL_SKIP4B"))
        surviving.select("doc_id", "clean_text", "source", "domain")
      else {
        // LAND the 4b result (the stage-3 checkpoint rule again): the
        // span-strip lineage is a huge expression tree, and a persist()
        // alone leaves it inside every downstream plan — measured as a
        // fixed ~10x plan-time tax on quality/budget/publish (2.1->12.4,
        // 2.0->34.1, 4.4->47.3 s at the 200k debug scale). Parquet
        // read-back severs it
        spanned.select(col("doc_id"), col("clean_text"))
          .join(normalized.select("doc_id", "source", "domain"), Seq("doc_id"))
          .write.parquet(s"$dir/despanned")
        spark.read.parquet(s"$dir/despanned")
      }
    val nDespanned = despanned.count()
    // staged-pipeline hygiene: everything before 4b is consumed — free
    // the executors' cache before the quality/budget/publish stages
    Seq(capped, gated, exactUnique, normalized, spanned)
      .foreach(_.unpersist())
    if (!sys.env.contains("GRAFT_CRAWL_SKIP4B")) surviving.unpersist()
    val secNormSpan = secs(t4b)

    // ── 5. quality gates: Gopher, then C4 lines ─────────────────────────
    val t5 = System.nanoTime()
    val gopher = Quality.gopherFilter(despanned, "doc_id", "clean_text",
        stopwords = Seq("the", "a", "and", "of"),
        minWords = 10, minMeanLen = 1.0, maxMeanLen = 20.0,
        maxSymbolRatio = 2.0, minStopRatio = 0.02)
      .filter(col("keep") === 1).select("doc_id")
    val gopherKept = despanned.join(gopher, Seq("doc_id"), "left_semi")
    val c4 = Quality.c4LineFilter(gopherKept, "doc_id", "clean_text",
        minWordsPerLine = 3,
        badLineSubstrings = Seq("javascript"),
        badDocSubstrings = Seq("lorem ipsum"))
    val qualityKept = c4.filter(col("doc_flagged") === 0 && col("n_kept") > 0)
      .select(col("doc_id"), col("clean_text"))
      .join(despanned.select("doc_id", "source", "domain"), Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nQuality = qualityKept.count()
    val secQuality = secs(t5)

    // ── 6. token-budget mix by source ───────────────────────────────────
    val t6 = System.nanoTime()
    val withTokens = qualityKept.withColumn("n_tokens",
      TextAnalysis.tokenCountWs(col("clean_text")).cast("long"))
    val perSource = withTokens.groupBy("source")
      .agg(sum("n_tokens").as("tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // budget = 60% of each source's available tokens → a real cut
    val budgets = perSource.map { case (s, t) => s -> (t * 6 / 10) }
    val budgeted = Sampling.tokenBudgetMix(withTokens, col("source"),
        Seq(col("doc_id")), col("n_tokens"), budgets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBudgeted = budgeted.count()
    val secBudget = secs(t6)

    // ── 7. Z-order publish + dataset card ───────────────────────────────
    val t7 = System.nanoTime()
    val pub = budgeted.withColumn("__dx",
        pmod(xxhash64(col("domain")), lit(65536L)).cast("double"))
    val b = pub.agg(min("__dx"), max("__dx"),
      min(col("doc_id").cast("double")), max(col("doc_id").cast("double"))).head()
    val zx = Layout.normalizeToBits(col("__dx"), b.getDouble(0), b.getDouble(1), 8)
    val zy = Layout.normalizeToBits(col("doc_id").cast("double"),
      b.getDouble(2), b.getDouble(3), 8)
    val publishDir = s"$dir/published"
    pub.withColumn("zkey", Layout.zorderKey(zx, zy, 8))
      .drop("__dx")
      .repartitionByRange(64, col("zkey"))
      .write.parquet(publishDir)
    val published = spark.read.parquet(publishDir)
    val nPublished = published.count()
    val nFiles = published.select(input_file_name()).distinct().count()
    val card = DatasetCard.buildSketch(published,
      numericCols = Seq("n_tokens"), categoricalCols = Seq("source"))
    val cardRows = card.count()
    val secPublish = secs(t7)

    // funnel sanity: constructed rates must be RECOVERED, not approximated
    // (exact-dup seeds collide only within the capped survivor set, so the
    // checks are structural rather than exact-count)
    val ok = nCapped > 0 && nCollapsed <= nCapped && nHistDups > 0 &&
      nExactUnique == nCollapsed - nHistDups && nNearDups > 0 &&
      nDespanned == nSurviving &&
      nMissedBoiler == 0 && nUnexplained == 0 && nZwDocs == expZw &&
      nQuality < nSurviving && nBudgeted < nQuality && nPublished == nBudgeted
    val totalSec = secs(t0)
    val json = f"""{"metric":"crawl_pipeline","value":$totalSec%.1f,"unit":"sec","docs":$nDocs,"history":$nHist,"domains":$nDomains,"cap_k":$capK,"funnel":{"crawled":$nDocs,"after_block_and_cap":$nCapped,"after_exact_collapse":$nCollapsed,"history_dups":$nHistDups,"exact_unique":$nExactUnique,"near_dups_vs_history":$nNearDups,"zw_docs":$nZwDocs,"zw_expected":$expZw,"boiler_docs":$nBoilerDocs,"boiler_expected":$expBoiler,"boiler_missed":$nMissedBoiler,"span_unexplained":$nUnexplained,"boiler_tokens_cut":$nBoilerToks,"after_quality":$nQuality,"after_budget":$nBudgeted,"published":$nPublished,"published_files":$nFiles,"card_rows":$cardRows},"sec":{"history_seed":$secHistory%.1f,"url_gate":$secUrl%.1f,"html_plan":$secHtmlPlan%.1f,"exact":$secExact%.1f,"neardup":$secNear%.1f,"normalize_span":$secNormSpan%.1f,"quality":$secQuality%.1f,"budget":$secBudget%.1f,"publish":$secPublish%.1f},"plan_checks":{${planChecks.map { case (k, v) => s""""$k":$v""" }.mkString(",")}},"funnel_ok":$ok}"""
    println(json)
    val outFile = sys.env.getOrElse("GRAFT_CRAWL_OUT", "crawl_pipeline_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    catch { case e: Throwable => System.err.println(s"[crawl] could not write $outFile: $e") }
    spark.stop()
  }
}
