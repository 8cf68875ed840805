package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{GifFrameCodec, Multimodal, StubCodec}

/** Serializable codec double for the majority-fold unit test: frame f's
  * raster is the f-th bit set rendered on the 8×8 aHash grid.
  */
case class FakeGrayCodec(frames: Seq[Set[Int]]) extends graft.operators.MediaCodec {
  def decodeImage(bytes: Array[Byte]): Option[graft.operators.DecodedImage] = None
  def decodeFrame(bytes: Array[Byte], frame: Int): Array[Float] = null
  override def decodeGrayFrames(bytes: Array[Byte], fs: Seq[Int])
      : Iterator[(Int, Option[(Int, Int, Array[Int])])] =
    fs.iterator.map { f =>
      (f,
        if (f < frames.size) {
          val bits = frames(f)
          Some((32, 32, Array.tabulate(32 * 32) { p =>
            val cell = (p / 32 / 4) * 8 + (p % 32 / 4)
            if (bits.contains(cell)) 224 else 32
          }))
        } else None)
    }
}

/** Video perceptual-signature near-dup (q176): the GIF round-trip against
  * the synthesis formulas, the strict-majority frame fold, the sampling
  * discipline (wrong stride → wrong signature), re-exposure invariance,
  * and the end-to-end dedup decision reusing the q171 machinery unchanged.
  */
class VideoFpSpec extends SparkSpec {
  import spark.implicits._

  private def memberBits(id: Long): Array[Int] = {
    val g = id / 4; val m = id % 4
    val key = if (m == 3) s"v:$g:alt" else s"v:$g"
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
      .take(8).map(b => f"${b & 0xff}%02x").mkString
    Array.tabulate(64) { i =>
      if (i == 0) 0
      else if (i == 63) 1
      else {
        val nib = Integer.parseInt(hex.substring(i / 4, i / 4 + 1), 16)
        val raw = (nib >> (3 - (i % 4))) & 1
        if (m == 2 && (i == 3 || i == 29 || i == 47)) 1 - raw else raw
      }
    }
  }

  private def packBits(bits: Array[Int]): Long =
    bits.zipWithIndex.foldLeft(0L) { case (h, (b, i)) =>
      if (b == 1) h | (1L << i) else h
    }

  test("majority fold: strict majority per bit, ties break to 0") {
    // three synthetic frames: bit 1 set in 2/3 (majority), bit 2 in 1/3,
    // bit 3 in 3/3; a fourth frame makes bit 1 a 2/4 TIE → cleared
    def media(frames: Seq[Set[Int]]): org.apache.spark.sql.DataFrame = {
      // a codec double: frame f's raster is the f-th bit set (bytes
      // carry the frame count; the codec is exercised via the real GIF
      // path in the round-trip test below)
      spark.createDataFrame(
        java.util.List.of(Row(1L, "video", Array(frames.size.toByte),
          Row(Integer.valueOf(32), Integer.valueOf(32), null,
            Integer.valueOf(frames.size), "image/gif"))),
        Multimodal.mediaSchema)
    }
    val threeFrames = Seq(Set(1, 3, 63), Set(1, 2, 3, 63), Set(3, 63))
    val got3 = Multimodal.videoSignature(media(threeFrames),
        FakeGrayCodec(threeFrames), everyNth = 1)
      .select("phash").as[Long].head()
    assert(got3 === packBits(Array.tabulate(64)(i =>
      if (i == 1 || i == 3 || i == 63) 1 else 0)))
    val fourFrames = threeFrames :+ Set(3, 63)
    val got4 = Multimodal.videoSignature(media(fourFrames),
        FakeGrayCodec(fourFrames), everyNth = 1)
      .select("phash").as[Long].head()
    // bit 1 now 2/4 — strict majority fails, the tie clears it
    assert(got4 === packBits(Array.tabulate(64)(i =>
      if (i == 3 || i == 63) 1 else 0)))
  }

  test("GIF round-trip: decode + per-frame hash + fold reproduce the formulas") {
    val media = Multimodal.synthesizeNearDupVideos((0L until 40L).toDF("doc_id"), "doc_id")
    val got = Multimodal.videoSignature(media, GifFrameCodec, everyNth = 2)
      .select("media_id", "phash").as[(Long, Long)].collect().toMap
    assert(got.size === 40)
    (0L until 40L).foreach { id =>
      assert(got(id) === packBits(memberBits(id)), s"signature mismatch id $id")
    }
    // member contracts: m1 (re-exposure) fold-equal to m0; m2 at Hamming 3
    (0L until 10L).foreach { g =>
      assert(got(4 * g) === got(4 * g + 1))
      assert(java.lang.Long.bitCount(got(4 * g) ^ got(4 * g + 2)) === 3)
    }
  }

  test("sampling discipline is load-bearing: wrong stride corrupts the fold") {
    val media = Multimodal.synthesizeNearDupVideos((0L until 8L).toDF("doc_id"), "doc_id")
    // everyNth=1 pulls the inverted decoy frames 1,3 into the majority —
    // the fold must NOT reproduce the member bits for every clip
    val all = Multimodal.videoSignature(media, GifFrameCodec, everyNth = 1)
      .select("media_id", "phash").as[(Long, Long)].collect().toMap
    val mismatches = (0L until 8L).count(id => all(id) != packBits(memberBits(id)))
    assert(mismatches > 0, "decoy frames did not perturb an all-frames fold")
  }

  test("end-to-end video dedup: q171 machinery unchanged, corrupt routed") {
    val media = Multimodal.synthesizeNearDupVideos((0L until 24L).toDF("doc_id"), "doc_id")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(media.schema)
    val corrupted = media.map { r =>
      if (r.getLong(0) == 13L)
        Row(r.get(0), r.get(1), "not a gif".getBytes("UTF-8"), r.get(3))
      else r
    }(enc)
    val out = Multimodal.phashDedup(
        Multimodal.videoSignature(corrupted, GifFrameCodec, everyNth = 2),
        maxDist = 3)
      .select("media_id", "comp", "keep").as[(Long, Long, Boolean)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out.size === 24)
    assert(out(0L) === ((0L, true)))
    assert(out(1L) === ((0L, false)))
    assert(out(2L) === ((0L, false)))
    assert(out(3L) === ((3L, true)))
    // id 13 (an m=1 twin) corrupt: routed as its own kept singleton;
    // 12 and 14 still pair without it
    assert(out(13L) === ((13L, true)))
    assert(out(12L) === ((12L, true)))
    assert(out(14L) === ((12L, false)))
    val comps = out.values.groupBy(_._1)
    comps.foreach { case (c, members) =>
      assert(members.count(_._2) === 1, s"component $c keepers != 1")
    }
    // a feature-only codec (no gray-frame support) routes EVERY clip as
    // NULL-signature singletons — the default-method contract
    val stubbed = Multimodal.videoSignature(media, StubCodec, everyNth = 2)
    assert(stubbed.filter(col("phash").isNotNull).count() === 0)
  }
}
