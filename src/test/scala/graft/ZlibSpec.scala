package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

/** zlib compression profile (q174 — spec-pinned, not oracled: no SQL
  * engine replays deflate). Pins: exact equality with a driver-side
  * java.util.zip reference at the same level, the repetitive < prose <
  * random tail ordering the Gopher-family gate relies on, flag cuts,
  * determinism across partitionings, and the null/empty shape.
  */
class ZlibSpec extends SparkSpec {
  import spark.implicits._

  private def refLens(s: String, level: Int = 6): (Long, Long) = {
    val raw = s.getBytes("UTF-8")
    if (raw.isEmpty) return (0L, 0L)
    val d = new java.util.zip.Deflater(level, false)
    try {
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](8192)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      (raw.length.toLong, out)
    } finally d.end()
  }

  private val docs = Seq(
    (1L, "spam " * 400),                                   // repetitive
    (2L, { // varied prose: seeded draws from a vocabulary, no block repeats
      val vocab = ("the quick brown fox jumps over lazy dog data pipeline " +
        "shuffles partition broadcast join filter scan column batch row " +
        "window stream spark vector hash merge sort group order query " +
        "table index key value count mean total small large fast slow").split(" ")
      val rnd = new scala.util.Random(7)
      Seq.fill(300)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }),
    (3L, new scala.util.Random(42).alphanumeric.take(2000).mkString), // random
    (4L, null.asInstanceOf[String]),
    (5L, "")).toDF("doc_id", "text")

  test("matches the java.util.zip reference byte for byte") {
    val got = Quality.compressionProfile(docs, "doc_id", "text")
      .select("doc_id", "n_bytes", "zlib_bytes")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    docs.as[(Long, Option[String])].collect().foreach { case (id, txt) =>
      txt match {
        case Some(t) =>
          val (r, z) = refLens(t)
          assert(got(id) === ((Some(r), Some(z))), s"doc $id")
        case None => assert(got(id) === ((None, None)))
      }
    }
  }

  test("tail ordering: repetitive < prose < random, flags follow the cuts") {
    val out = Quality.compressionProfile(docs, "doc_id", "text")
      .select("doc_id", "zlib_ratio", "zlib_flag")
      .as[(Long, Option[Double], Option[String])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val rep = out(1L)._1.get; val prose = out(2L)._1.get; val rnd = out(3L)._1.get
    assert(rep < prose && prose < rnd, s"ordering broke: $rep $prose $rnd")
    assert(out(1L)._2 === Some("repetitive"))
    assert(out(2L)._2 === Some("ok"))
    // 2000 alphanumerics still carry some structure; pin the flag by cut
    assert(out(3L)._2 === Some(if (rnd > 0.95) "incompressible" else "ok"))
    assert(rnd > 0.5, s"random text should resist compression, got $rnd")
  }

  test("null keeps NULL measurements; empty flags repetitive at ratio 0") {
    val out = Quality.compressionProfile(docs, "doc_id", "text")
      .select("doc_id", "n_bytes", "zlib_ratio", "zlib_flag")
      .as[(Long, Option[Long], Option[Double], Option[String])].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(out(4L) === ((None, None, None)))
    assert(out(5L) === ((Some(0L), Some(0.0), Some("repetitive"))))
  }

  test("partitioning-invariant") {
    val a = Quality.compressionProfile(docs.repartition(1), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val b = Quality.compressionProfile(docs.repartition(7), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
