package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Dedup, ImageIoCodec, Multimodal, NearDup}

/** Perceptual image near-dup (q171): the aHash kernel's exact-integer
  * contract, the PNG round-trip against the synthesis formulas, the
  * signature-pair exact-recall guarantee, and the end-to-end dedup
  * decision including undecodable-payload routing.
  */
class PhashSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference for the synthesis pattern's expected bits. */
  private def expectedBits(id: Long): Array[Int] = {
    val g = id / 4; val m = id % 4
    val key = if (m == 3) s"$g:alt" else g.toString
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
      .take(8).map(b => f"${b & 0xff}%02x").mkString
    Array.tabulate(64) { i =>
      if (i == 0) 0
      else if (i == 63) 1
      else {
        val nib = Integer.parseInt(hex.substring(i / 4, i / 4 + 1), 16)
        val raw = (nib >> (3 - (i % 4))) & 1
        if (m == 2 && (i == 1 || i == 17 || i == 42)) 1 - raw else raw
      }
    }
  }

  private def packBits(bits: Array[Int]): Long =
    bits.zipWithIndex.foldLeft(0L) { case (h, (b, i)) =>
      if (b == 1) h | (1L << i) else h
    }

  test("aHash64: exact integer thresholding, brightness-shift invariance") {
    // 16x16 image, 2x2 cells per hash cell: half dark half bright
    val w = 16; val h = 16
    def img(shift: Int): Array[Int] =
      Array.tabulate(w * h) { p =>
        val cell = (p / w / 2) * 8 + (p % w / 2)
        (if (cell % 3 == 0) 200 else 40) + shift
      }
    val base = Multimodal.aHash64(w, h, img(0))
    // expected: bit set exactly where cell % 3 == 0
    val expect = packBits(Array.tabulate(64)(i => if (i % 3 == 0) 1 else 0))
    assert(base === expect)
    // uniform brightness shift preserves every pixel-vs-mean comparison
    assert(Multimodal.aHash64(w, h, img(7)) === base)
    // flipping one cell's tone moves exactly that bit (margins are wide)
    val flipped = img(0).zipWithIndex.map { case (v, p) =>
      val cell = (p / w / 2) * 8 + (p % w / 2)
      if (cell == 5) 200 else v // cell 5 was dark (5 % 3 != 0)
    }
    assert(java.lang.Long.bitCount(
      Multimodal.aHash64(w, h, flipped) ^ base) === 1)
  }

  test("prodGt: 128-bit cross-product compare is exact past Long overflow") {
    // sums(w)*n wraps a plain Long once the products pass 2^63 — the
    // hash-bit comparison must stay exact there (r19 advice: ~25 min of
    // 44.1 kHz stereo reaches it for audio). Check against BigInt.
    val cases = Seq(
      (1L << 40, 1L << 40, (1L << 40) - 1, 1L << 40),  // both overflow, a*b larger
      ((1L << 40) - 1, 1L << 40, 1L << 40, 1L << 40),  // both overflow, a*b smaller
      (1L << 40, 1L << 40, 1L << 40, 1L << 40),        // equal (strict > is false)
      (512L * 200000000L, 200000000L, 300L * 200000000L, 3125000L), // audio-shaped
      (3L, 5L, 2L, 7L), (2L, 7L, 3L, 5L), (0L, 5L, 0L, 7L),        // small sanity
      (Long.MaxValue, Long.MaxValue, Long.MaxValue, Long.MaxValue - 1))
    for ((a, b, c, d) <- cases) {
      val expect = BigInt(a) * BigInt(b) > BigInt(c) * BigInt(d)
      assert(Multimodal.prodGt(a, b, c, d) === expect,
        s"prodGt($a,$b,$c,$d)")
    }
    // randomized cross-check over magnitudes that straddle the wrap
    val rnd = new scala.util.Random(171)
    for (_ <- 0 until 2000) {
      val a = rnd.nextLong(1L << 45); val b = rnd.nextLong(1L << 45)
      val c = rnd.nextLong(1L << 45); val d = rnd.nextLong(1L << 45)
      assert(Multimodal.prodGt(a, b, c, d) ===
        (BigInt(a) * BigInt(b) > BigInt(c) * BigInt(d)),
        s"prodGt($a,$b,$c,$d)")
    }
  }

  test("PNG round-trip: decode + hash reproduce the synthesis formulas") {
    val src = (0L until 40L).toDF("doc_id")
    val media = Multimodal.synthesizeNearDupImages(src, "doc_id")
    val got = Multimodal.perceptualHash(media, ImageIoCodec)
      .select("media_id", "phash").as[(Long, Long)].collect().toMap
    assert(got.size === 40)
    (0L until 40L).foreach { id =>
      assert(got(id) === packBits(expectedBits(id)),
        s"phash mismatch for id $id")
    }
    // the member contracts: m1 hash-equal to m0; m2 at Hamming 3
    (0L until 10L).foreach { g =>
      assert(got(4 * g) === got(4 * g + 1))
      assert(java.lang.Long.bitCount(got(4 * g) ^ got(4 * g + 2)) === 3)
    }
  }

  test("signaturePairs: exact recall — all pairs at <= maxDist, none beyond") {
    // signatures engineered around the threshold, plus random fill
    val rnd = new scala.util.Random(7)
    val sigs = (0 until 60).map(i => (i.toLong, rnd.nextLong())) ++ Seq(
      (100L, 0x0f0f0f0f0f0f0f0fL), (101L, 0x0f0f0f0f0f0f0f0eL), // d=1
      (102L, 0x0f0f0f0f0f0f0f00L),                              // d=4 from 100
      (103L, 0x0f0f0f0f0f0f0f0fL))                              // exact dup of 100
    val df = sigs.toDF("id", "sig")
    val got = NearDup.signaturePairs(df, "id", "sig", maxDist = 3,
        collapseExact = false)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    val expect = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 3
    } yield (a, b, d)).toSet
    assert(got === expect)
    assert(expect.contains((100L, 101L, 1)))
    assert(expect.contains((100L, 103L, 0)))
    assert(!expect.exists { case (a, b, _) => (a, b) == ((100L, 102L)) })
  }

  test("signaturePairs: NULL signatures are excluded from pairing") {
    val df = Seq[(Long, Option[Long])]((1L, Some(5L)), (2L, Some(5L)),
      (3L, None)).toDF("id", "sig")
    val got = NearDup.signaturePairs(df, "id", "sig", maxDist = 3,
        collapseExact = false)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("phashDedup end-to-end: components, keep flags, corrupt routing") {
    val src = (0L until 24L).toDF("doc_id")
    val media = Multimodal.synthesizeNearDupImages(src, "doc_id")
    // corrupt one payload: id 21 (an m=1 twin) becomes undecodable
    val schema = media.schema
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val corrupted = media.map { r =>
      if (r.getLong(0) == 21L)
        Row(r.get(0), r.get(1), "not a png".getBytes("UTF-8"), r.get(3))
      else r
    }(enc)
    val out = Multimodal.phashDedup(
        Multimodal.perceptualHash(corrupted, ImageIoCodec), maxDist = 3)
      .select("media_id", "comp", "keep").as[(Long, Long, Boolean)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out.size === 24)
    // group 0 intact: 0,1,2 share comp 0; 3 alone
    assert(out(0L) === ((0L, true)))
    assert(out(1L) === ((0L, false)))
    assert(out(2L) === ((0L, false)))
    assert(out(3L) === ((3L, true)))
    // id 21 undecodable: routed as its own singleton, kept
    assert(out(21L) === ((21L, true)))
    // its group survives without it: 20 and 22 still pair
    assert(out(20L) === ((20L, true)))
    assert(out(22L) === ((20L, false)))
    // exactly one keeper per component
    val comps = out.values.groupBy(_._1)
    comps.foreach { case (c, members) =>
      assert(members.count(_._2) === 1, s"component $c keepers != 1")
    }
  }

  test("phashDedup matches member-level connected components") {
    val src = (0L until 32L).toDF("doc_id")
    val hashes = Multimodal.perceptualHash(
      Multimodal.synthesizeNearDupImages(src, "doc_id"), ImageIoCodec)
    val viaOp = Multimodal.phashDedup(hashes, maxDist = 3)
      .select("media_id", "comp").as[(Long, Long)].collect().toMap
    // reference: per-instance pairs + member-level CC
    val pairs = NearDup.signaturePairs(hashes, "media_id", "phash",
      maxDist = 3, collapseExact = false)
    val cc = Dedup.connectedComponents(pairs.select("id_a", "id_b"),
        "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    viaOp.foreach { case (id, comp) =>
      assert(comp === cc.getOrElse(id, id), s"comp mismatch for $id")
    }
  }
}
