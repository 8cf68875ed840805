package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, TextAnalysis, TextKernels}

/** HTML main-content extraction (q152). The kernel's rule list is
  * certified against the DuckDB regex replay by the oracle gate; THIS
  * spec pins the edges the synthesized corpus can't reach (unclosed
  * tags, nesting, attribute forms, stray markup) plus a fuzz pass
  * against an independent Java-regex reference implementing the
  * oracle's rules in Scala.
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def kernel(html: String, minWords: Int = 5, mld: Double = 0.5)
      : (String, Long, Long, Long, Long) = {
    val a = TextKernels.htmlMain(
      org.apache.spark.unsafe.types.UTF8String.fromString(html), minWords, mld)
    (a.getUTF8String(0).toString, a.getUTF8String(1).toString.toLong,
      a.getUTF8String(2).toString.toLong, a.getUTF8String(3).toString.toLong,
      a.getUTF8String(4).toString.toLong)
  }

  test("block scoring: boilerplate dropped, content kept, moderate links survive") {
    val html = "<h1>Doc 9 overview</h1>" +
      """<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>""" +
      "<p>the quick brown fox jumps over lazy dogs</p>" +
      """<p>Related reading follows the src3 line with a <a href="/r">reference link</a> included for context.</p>""" +
      """<footer>Copyright <a href="/tos">Terms</a> <a href="/priv">Privacy</a> <a href="/c">Cookies</a></footer>"""
    val (clean, nBlocks, nKept, total, kept) = kernel(html)
    assert(nBlocks === 5)
    assert(nKept === 2) // the content paragraph + the linked-but-content one
    assert(clean === "the quick brown fox jumps over lazy dogs\n" +
      "Related reading follows the src3 line with a reference link included for context.")
    // h1 "Doc 9 overview"=14, nav=18, p=40, related=81, footer=31
    assert(total === 14L + 18 + 40 + 81 + 31)
    assert(kept === 40L + 81)
  }

  test("markup edges: unclosed, nested, attributes, stray tags, empties") {
    // unclosed block is no block; blocks INSIDE it are still found
    assert(kernel("<p>lost text <nav>Home</nav> more")._2 === 1)
    // nested same tag: block ends at the FIRST close (flat model)
    val (c1, nb1, _, _, _) = kernel("<div>alpha beta gamma delta epsilon <div>x</div> tail</div>")
    assert(nb1 === 1 && c1 === "alpha beta gamma delta epsilon x")
    // attributes on the open tag; '>' inside an attr value ends the tag
    assert(kernel("""<p class="big">one two three four five six</p>""")._3 === 1)
    assert(kernel("""<p title="a>b">one two three four five six</p>""")._1
      === "b\">one two three four five six") // the [^>]* rule, both sides
    // stray close, unknown and UPPERCASE tags are not blocks
    assert(kernel("</p><span>ignored</span><P>SHOUT</P>")._2 === 0)
    // empty / blockless input → zero census, empty clean text
    assert(kernel("") === (("", 0L, 0L, 0L, 0L)))
    assert(kernel("no markup at all") === (("", 0L, 0L, 0L, 0L)))
    // whitespace-only block text: trimmed to empty, 0 words, counted block
    assert(kernel("<p>   </p>") === (("", 1L, 0L, 0L, 0L)))
    // self-closing anchor toggles nothing; unclosed anchor counts the
    // block's remainder as link text (conservative: reads link-dense)
    assert(kernel("""<p>alpha <a href="/x"/>beta gamma delta epsilon</p>""")._3 === 1)
    assert(kernel("""<p>alpha <a href="/x">beta gamma delta epsilon</p>""")._3 === 0)
    // NULL propagates through the expression form
    GraftFunctions.ensureRegistered(spark)
    val r = Seq(Tuple1(null: String)).toDF("html")
      .select(TextAnalysis.htmlMain(col("html"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("thresholds parameterize: minWords and maxLinkDensity move the gate") {
    val html = """<p>four words right here</p><p>half <a href="/x">link.</a></p>"""
    assert(kernel(html, minWords = 5)._3 === 0)
    assert(kernel(html, minWords = 4)._3 === 1) // first block now passes
    // second block: text "half link." = 10 chars, link "link." = 5 → 0.5
    assert(kernel(html, minWords = 2, mld = 0.5)._3 === 1)  // 0.5 < 0.5 false
    assert(kernel(html, minWords = 2, mld = 0.51)._3 === 2) // boundary opens
  }

  test("fuzz: kernel == independent regex reference on well-formed pages") {
    // the oracle's rules in Java regex — shares no code with the walker
    val blockRe = ("(?s)" + TextKernels.htmlBlockTags
      .map(t => s"<$t(?: [^>]*)?>.*?</$t>").mkString("|")).r
    val anchorRe = "(?s)<a(?: [^>]*)?>(.*?)</a>".r
    def ref(html: String, minWords: Int, mld: Double): (String, Long, Long, Long, Long) = {
      val blocks = blockRe.findAllIn(html).toList
      def strip(s: String) = s.replaceAll("<[^>]*>", "")
      val rows = blocks.map { b =>
        val text = strip(b).replaceAll("^\\s+|\\s+$", "")
        val words = if (text.isEmpty) 0 else text.split("\\s+").length
        val link = anchorRe.findAllMatchIn(b).map(m => strip(m.group(1)).length).sum
        val keep = words >= minWords &&
          link.toDouble / math.max(text.length, 1) < mld
        (text, keep)
      }
      (rows.filter(_._2).map(_._1).mkString("\n"), rows.length.toLong,
        rows.count(_._2).toLong, rows.map(_._1.length.toLong).sum,
        rows.filter(_._2).map(_._1.length.toLong).sum)
    }
    val rnd = new scala.util.Random(20260817L)
    val pool = "the a quick brown fox lazy dog data query scan merge".split(" ")
    val tags = TextKernels.htmlBlockTags ++ Seq("span", "em", "b")
    def words(k: Int) = Seq.fill(k)(pool(rnd.nextInt(pool.length))).mkString(" ")
    for (_ <- 1 to 2000) {
      val page = (1 to rnd.nextInt(8)).map { _ =>
        val t = tags(rnd.nextInt(tags.length))
        val attr = if (rnd.nextBoolean()) " class=\"x\"" else ""
        val inner = (1 to 1 + rnd.nextInt(3)).map { _ =>
          if (rnd.nextInt(3) == 0) s"""<a href="/l">${words(1 + rnd.nextInt(3))}</a>"""
          else words(rnd.nextInt(6))
        }.mkString(" ")
        s"<$t$attr>$inner</$t>"
      }.mkString(if (rnd.nextBoolean()) "" else " between ")
      val got = kernel(page, 3, 0.5)
      assert(got === ref(page, 3, 0.5), s"page=<$page>")
    }
  }

  test("q152 plan: shuffle-free codegen projection, ONE kernel walk per row") {
    val df = Queries.all("q152_html_extract")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join") && !p.contains("Sort"),
      p.take(1500))
    assert(p.contains("*(1)"), p.take(1500))
    // six projections off one `hm` array must collapse to ONE htmlMain
    // call under subexpression elimination
    val code = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert("htmlMain".r.findAllIn(code).size === 1, code.take(2000))
  }

  test("streaming: HTML extraction front door, stream ≡ batch, zero exchanges") {
    GraftFunctions.ensureRegistered(spark)
    def chain(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.select(col("doc_id"), TextAnalysis.htmlMain(col("html")).as("hm"))
        .select(col("doc_id"),
          col("hm").getItem(0).as("clean_text"),
          col("hm").getItem(2).cast("long").as("n_kept"))
    val inc1 = Seq(
      (1L, "<p>alpha beta gamma delta epsilon zeta</p><nav><a href=\"/\">Home</a></nav>"),
      (2L, "<footer><a href=\"/t\">Terms</a></footer>")).toDF("doc_id", "html")
    val inc2 = Seq(
      (3L, "<p>one two three four five six seven</p>")).toDF("doc_id", "html")
    assert(!chain(inc1).queryExecution.executedPlan.toString.contains("Exchange"))
    val dir = java.nio.file.Files.createTempDirectory("graft_htmlstream").toString
    inc1.write.parquet(s"$dir/in1")
    val schema = spark.read.parquet(s"$dir/in1").schema
    val q = chain(spark.readStream.schema(schema).parquet(s"$dir/in*"))
      .writeStream.format("memory").queryName("html_front").outputMode("append").start()
    q.processAllAvailable()
    inc2.write.parquet(s"$dir/in2")
    q.processAllAvailable()
    q.stop()
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val got = shape(spark.table("html_front"))
    assert(got === shape(chain(inc1.unionByName(inc2))))
    assert(got(1L) === (("alpha beta gamma delta epsilon zeta", 1L)))
    assert(got(2L) === (("", 0L)))
  }
}
