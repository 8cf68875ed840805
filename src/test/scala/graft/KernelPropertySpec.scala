package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.{KeyRepair, NearDup}

/** Property-style sweeps over seeded random data: each test checks an
  * operator against an independent reference model (window form, vote
  * invariance, a driver-side reimplementation) across many generated
  * cases, rather than a single example.
  */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  test("ngramAnyIn membership equals hash-set intersection across random corpora") {
    import graft.operators.Quality
    val rnd = new scala.util.Random(19)
    val words = Vector("a", "bb", "ccc", "δδ", "ee", "φ", "g", "hi")
    def doc() = (1 to rnd.nextInt(12)).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    for (trial <- 1 to 10) {
      val n = rnd.nextInt(3) + 1
      val bench = (1 to 5).map(_ => doc()).toDF("text")
      val corpus = (1 to 40).map(i => (i.toLong, doc())).toDF("doc_id", "text")
      val hashes = Quality.benchmarkHashes(bench, "text", n)
      // reference model: doc flagged ⟺ its distinct n-gram hash set
      // intersects the benchmark set (the graft_ngram_hashes kernel)
      val expected = corpus
        .select(col("doc_id"), call_function("graft_ngram_hashes",
          split(lower(trim(col("text"))), "\\s+"), lit(n)).as("sh"))
        .as[(Long, Seq[Long])].collect()
        .filter(_._2.exists(hashes.toSet)).map(_._1).toSet
      val got = corpus.filter(Quality.contaminatedFlag(col("text"), hashes, n))
        .select("doc_id").as[Long].collect().toSet
      assert(got === expected, s"trial $trial n=$n")
    }
  }

  test("dedupParagraphs equals a driver-side keep-first model on random corpora") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(47)
    val paraPool = Vector("aa", "bb", "cc", "dd", "ee", "ff") // heavy dup rate
    for (trial <- 1 to 8) {
      val docs = (1 to (rnd.nextInt(15) + 3)).map { i =>
        val ps = (1 to (rnd.nextInt(5) + 1)).map(_ => paraPool(rnd.nextInt(paraPool.size)))
        (i.toLong, ps.mkString("\n\n"))
      }
      // reference model: first (doc, idx) per distinct paragraph wins
      val seen = scala.collection.mutable.Set[String]()
      val expected = docs.map { case (id, text) =>
        val ps = text.split("\n{2,}").toSeq
        val kept = ps.filter(p => seen.add(p)) // add returns false on repeat
        (id, ps.size.toLong, kept.size.toLong, kept.mkString("\n\n"))
      }
      val got = Dedup.dedupParagraphs(docs.toDF("doc_id", "text"), "doc_id", "text")
        .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
      assert(got === expected, s"trial $trial")
    }
  }

  test("exactQuantile fuzz: equals percentile across distributions, thresholds, q") {
    import graft.operators.Summaries
    val rnd = new scala.util.Random(31)
    def gen(kind: Int, n: Int): Seq[Double] = kind match {
      case 0 => Seq.fill(n)(rnd.nextDouble() * 2e4 - 1e4)               // uniform
      case 1 => Seq.fill(n)(math.exp(rnd.nextGaussian() * 6))           // lognormal, extreme spread
      case 2 => Seq.fill(n)((rnd.nextInt(4) * 10).toDouble)             // few heavy ties
      case 3 => Seq.fill(n)(5.0) ++ Seq(1e12, -1e12)                    // constant + outliers
      case 4 => Seq.fill(n)(rnd.nextDouble() * 4.9e-324 * 100)          // subnormal zone
    }
    for (trial <- 1 to 15) {
      val values = gen(trial % 5, rnd.nextInt(900) + 100)
      val q = Seq(0.0, 0.01, 0.37, 0.5, 0.93, 1.0)(rnd.nextInt(6))
      val threshold = Seq(2, 8, 64, 1 << 20)(rnd.nextInt(4))
      val df = values.map(Tuple1(_)).toDF("x")
      val expected = df.agg(expr(s"percentile(x, $q)")).head().getDouble(0)
      val got = Summaries.exactQuantile(df, "x", q, threshold)
      assert(got === Some(expected),
        s"trial $trial kind=${trial % 5} n=${values.size} q=$q thr=$threshold")
    }
  }

  test("top-k agg equals window rank across random k / groups / heavy ties") {
    GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 4) {
      val k = 1 + rnd.nextInt(4)
      val nGroups = 1 + rnd.nextInt(30)
      // scores from a tiny discrete set → constant tie pressure on the
      // (order desc, id asc) contract
      val rows = (1 to 1500).map { i =>
        (rnd.nextInt(nGroups).toLong, i.toLong, rnd.nextInt(8) / 4.0)
      }
      val df = rows.toDF("g", "id", "score")
      val agg = df.groupBy("g")
        .agg(call_function("graft_top_k_by",
          struct(col("id"), col("score")), col("score"), col("id"), lit(k)).as("top"))
        .select(col("g"), posexplode(col("top")))
        .select(col("g"), col("col.id").as("id"), col("col.score").as("score"),
          (col("pos") + 1).as("rank"))
        .as[(Long, Long, Double, Int)].collect().toSet
      val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
      val win = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("g"), col("id"), col("score"), col("rank"))
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(agg == win, s"k=$k nGroups=$nGroups")
    }
  }

  test("simhash signatures are token-order invariant (vote symmetry)") {
    GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(29)
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docs = (1L to 40L).map { i =>
      val toks = Seq.fill(3 + rnd.nextInt(20))(words(rnd.nextInt(words.size)))
      (i, toks.mkString(" "), rnd.shuffle(toks).mkString(" "))
    }.toDF("id", "text", "shuffled")
    val bad = docs.select(
        (NearDup.simhashFast(col("text")) =!= NearDup.simhashFast(col("shuffled"))).as("x64"),
        (NearDup.simhashMd5Fast(col("text")) =!= NearDup.simhashMd5Fast(col("shuffled"))).as("md5"))
      .filter(col("x64") || col("md5")).count()
    assert(bad == 0)
  }

  test("key repair matches a driver-side reference model on random collisions") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 400).map { i =>
      val uid = if (rnd.nextInt(5) == 0) null else s"u${rnd.nextInt(30)}"
      val content = s"c${rnd.nextInt(3)}"
      val fb = if (rnd.nextInt(4) == 0) null else f"2026-01-${1 + rnd.nextInt(28)}%02d"
      (i.toLong, uid, content, fb)
    }
    val df = rows.toDF("id", "uid", "content", "fb")
    val got = KeyRepair.regenerateUniqueKeys(df, "uid", Seq("content"), Seq(col("fb")))
      .select("id", "unique_key").as[(Long, String)].collect().toMap
    // reference model, recomputed independently on the driver
    val variants = rows.filter(_._2 != null).groupBy(_._2)
      .map { case (u, rs) => u -> rs.map(_._3).distinct.size }
    val expected = rows.map { case (id, uid, _, fb) =>
      id -> (if (uid == null) fb
             else if (variants(uid) > 1) Seq(uid, fb).filter(_ != null).mkString("#")
             else uid)
    }.toMap
    assert(got == expected)
  }

  test("connectedComponents matches a union-find model on random graphs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 40
      val edges = (1 to 55).map(_ => (rnd.nextInt(n), rnd.nextInt(n)))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b).toLong, math.max(a, b).toLong) }
        .distinct
      // driver-side union-find oracle (min-id representative per component)
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val inPairs = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val expected = (0 until n).groupBy(find).values
        .flatMap { g => val m = g.min.toLong; g.map(_.toLong -> m) }
        .filter { case (id, _) => inPairs.contains(id) }.toMap
      val got = graft.operators.Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(got === expected)
    }
  }

  test("extractYears agrees with a port of the reference model on random age strings") {
    import graft.operators.DeriveColumns
    // reference model (utils/assorted_fixes.py::extract_years): anchored
    // number (optional 'years') wins whole; else first '<n> years' phrase
    // anywhere; else None — int(float(...)) truncation
    val whole = """(?i)^(\d+(\.\d+)?)\s*(years?)?$""".r
    val embedded = """(?i)(\d+(\.\d+)?)\s*years?""".r
    def model(v: String): Option[Int] = {
      val s = v.trim
      whole.findFirstMatchIn(s).map(_.group(1))
        .orElse(embedded.findFirstMatchIn(s).map(_.group(1)))
        .map(n => n.toDouble.toInt)
    }
    val rnd = new scala.util.Random(13)
    val bits = Vector("23", "23.5", "years", "year", "YEARS", "old", "aged",
      "unknown", "", " ", "3 months", "about")
    val cases = (1 to 300).map { i =>
      (i.toLong, (1 to (1 + rnd.nextInt(3))).map(_ => bits(rnd.nextInt(bits.size))).mkString(" "))
    }
    val got = cases.toDF("id", "raw")
      .select(col("id"), DeriveColumns.extractYears(col("raw")).as("y"))
      .as[(Long, Option[Int])].collect().toMap
    cases.foreach { case (id, s) => assert(got(id) === model(s), s"input: '$s'") }
  }

  test("fuzzyRecode matched() agrees with the last-match-wins model on random soup") {
    import graft.operators.FuzzyRecode
    val rnd = new scala.util.Random(11)
    val vocab = Vector("kleb", "klebsiella", "proteus", "staph", "yeast",
      "coagulase", "negative", "species", "group", "viridans")
    val rules = Seq(
      FuzzyRecode.Rule(Seq("kleb", "klesiella"), "KLS", "Klebsiella sp."),
      FuzzyRecode.Rule(Seq("proteus"), "Prot", "Proteus sp."),
      FuzzyRecode.Rule(Seq("coagulase negative", "staph"), "CONS", "CoNS"),
      FuzzyRecode.Rule(Seq("viridans"), "VirSt", "Viridans strep"))
    def model(text: String): Option[String] =
      rules.foldLeft(Option.empty[String]) { (acc, r) =>
        if (r.patterns.exists(text.toLowerCase.contains(_))) Some(r.value) else acc
      }
    val texts = (1 to 200).map { i =>
      (i.toLong, (1 to (1 + rnd.nextInt(6)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = texts.toDF("id", "t")
      .select(col("id"), FuzzyRecode.matched(col("t"), rules).getField("value").as("v"))
      .as[(Long, Option[String])].collect().toMap
    texts.foreach { case (id, t) => assert(got(id) === model(t), s"text: $t") }
  }
}
