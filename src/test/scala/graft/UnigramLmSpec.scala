package graft

import org.apache.spark.sql.functions._
import graft.operators.{Quality, UnigramLm}
import graft.functions.TextKernels.UnigramKernel

/** Unigram-LM tokenizer ([[UnigramLm]], q160/q161): the integer Viterbi
  * kernel fuzzed against an independent exhaustive-enumeration reference,
  * trainer determinism/coverage, and the encode projection contract.
  */
class UnigramLmSpec extends SparkSpec {

  private def utf8Lt(a: Seq[String], b: Seq[String]): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = Quality.utf8Cmp(a(i), b(i))
      if (c != 0) return c < 0
      i += 1
    }
    a.length < b.length
  }

  /** Independent reference: enumerate EVERY segmentation of `w` into
    * vocab pieces (the vocab must cover all single chars), pick min by
    * (total cost, lexicographic piece sequence). Exponential — only for
    * short fuzz words.
    */
  private def bruteBest(w: String, costs: Map[String, Long]): Seq[String] = {
    val maxLen = costs.keys.map(_.length).max
    def segs(s: String): Seq[List[String]] =
      if (s.isEmpty) Seq(Nil)
      else (1 to math.min(maxLen, s.length)).flatMap { l =>
        val p = s.substring(0, l)
        if (costs.contains(p)) segs(s.substring(l)).map(p :: _) else Nil
      }
    segs(w).map(path => (path.map(costs).sum, path))
      .reduceLeft { (a, b) =>
        if (b._1 < a._1 || (b._1 == a._1 && utf8Lt(b._2, a._2))) b else a
      }._2
  }

  test("kernel Viterbi equals exhaustive enumeration on random words/vocabs") {
    val rnd = new scala.util.Random(17)
    val chars = "abcd"
    (0 until 300).foreach { trial =>
      // random vocab: all singles + random multis with random costs
      val singles = chars.map(c => c.toString -> (50000L + rnd.nextInt(100000)))
      val multis = (0 until 8).map { _ =>
        val l = 2 + rnd.nextInt(3)
        Seq.fill(l)(chars(rnd.nextInt(chars.length))).mkString ->
          (20000L + rnd.nextInt(200000)).toLong
      }.distinctBy(_._1)
      val costs = (singles ++ multis).toMap
      val kernel = new UnigramKernel(costs.toSeq)
      val w = Seq.fill(1 + rnd.nextInt(9))(chars(rnd.nextInt(chars.length))).mkString
      val got = kernel.bestPath(w)
      val want = bruteBest(w, costs)
      assert(got == want, s"trial=$trial w=$w got=$got want=$want")
    }
  }

  test("uncoverable code points take single-char UNK steps, never crash") {
    val kernel = new UnigramKernel(Seq("a" -> 10L, "ab" -> 15L))
    assert(kernel.bestPath("aab") == Seq("a", "ab"))
    assert(kernel.bestPath("axa") == Seq("a", "x", "a")) // x = UNK step
    assert(kernel.pieceCount(
      org.apache.spark.unsafe.types.UTF8String.fromString("zz")) == 2)
  }

  test("trainer: deterministic, covers all corpus chars, drops unused multis") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low low low lower lower newest newest newest newest widest"),
      (2L, "low newest widest widest newest lowest"),
      (3L, null.asInstanceOf[String]),
      (4L, "  ")).toDF("doc_id", "text")
    val m1 = UnigramLm.trainLocal(docs, "text", seedMultis = 20, emIters = 2)
    val m2 = UnigramLm.trainLocal(docs, "text", seedMultis = 20, emIters = 2)
    assert(m1 == m2) // fully deterministic
    val pieces = m1.map(_.piece).toSet
    // every corpus char survives as a single (coverage floor)
    "lowernstid".foreach(c => assert(pieces.contains(c.toString), s"$c"))
    // every retained multi was actually used (cnt >= 1 by construction)
    assert(m1.forall(_.cnt >= 1L))
    // costs are the micro formula over final counts
    val tot = m1.map(_.cnt).sum
    m1.foreach { p =>
      val want = -math.floor(math.log(p.cnt.toDouble / tot) * 100000.0 + 0.5).toLong
      assert(p.cost == want, s"${p.piece}")
    }
    // frequent whole words should surface as pieces after EM
    assert(pieces.contains("newest") || pieces.contains("new"))
  }

  test("encode: NULL/blank docs keep NULL stats; counts match kernel per word") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa ab aab"),
      (2L, null.asInstanceOf[String]),
      (3L, "   ")).toDF("doc_id", "text")
    val pieces = Seq("a" -> 30000L, "b" -> 40000L, "aa" -> 35000L, "ab" -> 35000L)
    val out = UnigramLm.encode(docs, "doc_id", "text", pieces)
      .collect().map(r => r.getLong(0) -> r).toMap
    val kernel = new UnigramKernel(pieces)
    val wantTok = Seq("aa", "ab", "aab").map(w =>
      kernel.bestPath(w).length.toLong).sum
    assert(out(1L).getLong(1) == 3L && out(1L).getLong(2) == wantTok)
    assert(out(2L).isNullAt(1) && out(2L).isNullAt(2) && out(2L).isNullAt(3))
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(2))
  }

  test("encode is a zero-exchange codegen projection") {
    import spark.implicits._
    val docs = Seq((1L, "some words here")).toDF("doc_id", "text")
    val out = UnigramLm.encode(docs, "doc_id", "text",
      Seq("a" -> 10L, "b" -> 10L, "s" -> 10L))
    val phys = out.queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), "encode must not shuffle")
  }

  test("train + encode on corpus words equals the dict-path lengths (q161 shape)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick quick fox"),
      (3L, "brown the the jumps")).toDF("doc_id", "text")
    val model = UnigramLm.trainLocal(docs, "text", seedMultis = 40, emIters = 2)
    val kernel = new UnigramKernel(model.map(p => (p.piece, p.cost)))
    val got = UnigramLm.encode(docs, "doc_id", "text",
        model.map(p => (p.piece, p.cost)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def docCount(t: String) =
      t.split(" ").map(w => kernel.bestPath(w).length.toLong).sum
    assert(got(1L) == docCount("the quick brown fox jumps"))
    assert(got(2L) == docCount("the quick quick fox"))
    assert(got(3L) == docCount("brown the the jumps"))
  }
}
