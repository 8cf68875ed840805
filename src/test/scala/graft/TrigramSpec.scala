package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

/** Trigram interpolated-backoff LM (q173): kernel pinned to a
  * sequential Scala reference, the fluency-ceiling property over the
  * bigram (pair-preserving collage breaks triple continuity), backoff
  * consistency with q133 on short docs, and the empty-doc contract.
  */
class TrigramSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: the exact double sequence the kernel and the
    * DuckDB oracle replay, token by token.
    */
  private def refScore(toks: Seq[String], v: Quality.TrigramVocab,
                       alpha: Double = 1.0): (Long, Option[Double]) = {
    if (toks.isEmpty) return (0L, None)
    val uni = v.bi.uni.top.toMap
    val c1 = v.bi.first.toMap
    val c12 = v.bi.top.map { case (p, t, c) => (p, t) -> c }.toMap
    val c123 = v.top.map { case (a, p, t, c) => (a, p, t) -> c }.toMap
    val total = v.bi.uni.total.toDouble
    def p1(t: String) = uni.get(t).map(_.toDouble).getOrElse(alpha) / total
    def p2(p: String, t: String) =
      (c12.getOrElse((p, t), 0L).toDouble + alpha * p1(t)) /
        (c1.getOrElse(p, 0L).toDouble + alpha)
    def micro(x: Double): Long =
      BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.movePointRight(5).longValueExact
    var sum = 0L
    toks.zipWithIndex.foreach { case (t, i) =>
      sum +=
        (if (i == 0) micro(math.log(p1(t)))
         else if (i == 1) micro(math.log(p2(toks(0), t)))
         else {
           val (a, p) = (toks(i - 2), toks(i - 1))
           micro(math.log(
             (c123.getOrElse((a, p, t), 0L).toDouble + alpha * p2(p, t)) /
               (c12.getOrElse((a, p), 0L).toDouble + alpha)))
         })
    }
    (toks.size.toLong, Some(sum / 100000.0 / toks.size))
  }

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox runs fast"),
    (3L, "a slow red fox jumps over a fence"),
    (4L, "the lazy dog sleeps all day"),
    (5L, "quick brown foxes jump over lazy dogs"),
    (6L, null.asInstanceOf[String]),
    (7L, "   "),
    (8L, "one")).toDF("doc_id", "text")

  test("kernel matches the sequential reference exactly") {
    val v = Quality.trigramVocab(corpus, "text", maxTrigrams = 64,
      maxBigrams = 32, maxVocab = 16)
    val got = Quality.trigramLogProb(corpus, "doc_id", "text", v)
      .as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    corpus.select("doc_id", "text").as[(Long, Option[String])].collect()
      .foreach { case (id, txt) =>
        val toks = txt.map(_.trim).filter(_.nonEmpty)
          .map(_.toLowerCase.split("\\s+").toSeq).getOrElse(Seq.empty)
        val (n, m) = refScore(toks, v)
        assert(got(id)._1 === n, s"n_tokens mismatch doc $id")
        (got(id)._2, m) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12,
            s"mean mismatch doc $id: $a vs $b")
          case (a, b) => assert(a === b, s"null shape mismatch doc $id")
        }
      }
  }

  test("empty and null docs score NULL with zero tokens") {
    val v = Quality.trigramVocab(corpus, "text", maxTrigrams = 64,
      maxBigrams = 32, maxVocab = 16)
    val got = Quality.trigramLogProb(corpus, "doc_id", "text", v)
      .as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(6L) === ((0L, None)))
    assert(got(7L) === ((0L, None)))
    assert(got(8L)._1 === 1L)
    assert(got(8L)._2.isDefined)
  }

  test("triple continuity: pair-preserving collage scores below the original") {
    // train on many repeats of one fluent sentence; score (a) the
    // sentence and (b) a collage keeping every adjacent PAIR frequency-
    // plausible but breaking triples — the bigram model ties them closer
    // than the trigram does
    val train = (1L to 60L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val v = Quality.trigramVocab(train, "text", maxTrigrams = 128,
      maxBigrams = 64, maxVocab = 32)
    val probe = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      // pairs (the, quick) (quick, brown) … all seen; triple
      // (brown fox, over)-style continuity broken by splicing
      (2L, "the quick brown fox jumps over the quick brown fox")
    ).toDF("doc_id", "text")
    val tri = Quality.trigramLogProb(probe, "doc_id", "text", v)
      .as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> t._3.get).toMap
    assert(tri(1L) > tri(2L),
      s"trigram must prefer the intact sentence: ${tri(1L)} vs ${tri(2L)}")
  }

  /** Sequential KN reference: the exact three-level interpolated-KN
    * double sequence the kernel and the q177 DuckDB oracle replay —
    * continuation TYPE counts folded from the same capped tables.
    */
  private def refScoreKN(toks: Seq[String], v: Quality.TrigramVocab,
                         d: Double = 0.75,
                         alpha: Double = 1.0): (Long, Option[Double]) = {
    if (toks.isEmpty) return (0L, None)
    val c12 = v.bi.top.map { case (p, t, c) => (p, t) -> c }.toMap
    val c123 = v.top.map { case (a, p, t, c) => (a, p, t) -> c }.toMap
    val np = v.bi.top.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val b = v.bi.top.size.toLong
    val nv = v.top.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val f2 = v.top.map(e => (e._2, e._3)).distinct
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cont2 = v.top.groupBy(e => (e._2, e._3)).view.mapValues(_.size.toLong).toMap
    val f3 = v.top.groupBy(e => (e._1, e._2)).view.mapValues(_.size.toLong).toMap
    def p1(w: String) = (np.getOrElse(w, 0L).toDouble + alpha) / (b.toDouble + alpha)
    def p2(vv: String, w: String) = nv.get(vv) match {
      case None => p1(w)
      case Some(n) =>
        (math.max(cont2.getOrElse((vv, w), 0L).toDouble - d, 0.0) +
          d * f2(vv).toDouble * p1(w)) / n.toDouble
    }
    def p3(u: String, vv: String, w: String) =
      (f3.get((u, vv)), c12.get((u, vv))) match {
        case (Some(f), Some(c)) =>
          (math.max(c123.getOrElse((u, vv, w), 0L).toDouble - d, 0.0) +
            d * f.toDouble * p2(vv, w)) / c.toDouble
        case _ => p2(vv, w)
      }
    def micro(x: Double): Long =
      BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.movePointRight(5).longValueExact
    var sum = 0L
    toks.zipWithIndex.foreach { case (t, i) =>
      sum +=
        (if (i == 0) micro(math.log(p1(t)))
         else if (i == 1) micro(math.log(p2(toks(0), t)))
         else micro(math.log(p3(toks(i - 2), toks(i - 1), t))))
    }
    (toks.size.toLong, Some(sum / 100000.0 / toks.size))
  }

  test("KN kernel matches the sequential continuation-count reference") {
    val v = Quality.trigramVocab(corpus, "text", maxTrigrams = 64,
      maxBigrams = 32, maxVocab = 16)
    val got = Quality.trigramLogProbKN(corpus, "doc_id", "text", v)
      .as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    corpus.select("doc_id", "text").as[(Long, Option[String])].collect()
      .foreach { case (id, txt) =>
        val toks = txt.map(_.trim).filter(_.nonEmpty)
          .map(_.toLowerCase.split("\\s+").toSeq).getOrElse(Seq.empty)
        val (n, m) = refScoreKN(toks, v)
        assert(got(id)._1 === n, s"n_tokens mismatch doc $id")
        (got(id)._2, m) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12,
            s"KN mean mismatch doc $id: $a vs $b")
          case (a, b) => assert(a === b, s"null shape mismatch doc $id")
        }
      }
    // and the empty/null contract carries over
    assert(got(6L) === ((0L, None)))
    assert(got(7L) === ((0L, None)))
  }

  test("KN signature: continuation counts demote a frequent-but-stuck word") {
    // 'francisco' appears MANY times but always after 'san' (one
    // continuation context); 'maybe' appears fewer times across many
    // distinct contexts. As a fresh-context first token, KN must score
    // 'maybe' above 'francisco'; the absolute-count unigram does the
    // opposite — the textbook discriminating case for the two smoothers.
    val train = ((1L to 40L).map(i => (i, "we visit san francisco today")) ++
      Seq((41L, "maybe we go"), (42L, "they maybe stay"), (43L, "she said maybe"),
        (44L, "it is maybe true"), (45L, "maybe later then"),
        (46L, "he will maybe come"), (47L, "maybe not now"),
        (48L, "we could maybe try"))).toDF("doc_id", "text")
    val v = Quality.trigramVocab(train, "text", maxTrigrams = 256,
      maxBigrams = 128, maxVocab = 64)
    val probe = Seq((1L, "francisco"), (2L, "maybe")).toDF("doc_id", "text")
    val kn = Quality.trigramLogProbKN(probe, "doc_id", "text", v)
      .as[(Long, Long, Option[Double])].collect().map(t => t._1 -> t._3.get).toMap
    val lite = Quality.trigramLogProb(probe, "doc_id", "text", v)
      .as[(Long, Long, Option[Double])].collect().map(t => t._1 -> t._3.get).toMap
    assert(kn(2L) > kn(1L),
      s"KN must prefer the many-context word: maybe=${kn(2L)} francisco=${kn(1L)}")
    assert(lite(1L) > lite(2L),
      s"the absolute-count unigram prefers raw frequency: ${lite(1L)} vs ${lite(2L)}")
  }

  test("build frame is heap-shaped: one row, capped, count-ordered") {
    val f = Quality.trigramVocabFrame(corpus, "text", maxTrigrams = 5).head()
    val rows = f.getSeq[org.apache.spark.sql.Row](0)
    assert(rows.size === 5)
    val counts = rows.map(_.getLong(3))
    assert(counts === counts.sortBy(-_))
  }
}
