package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{AudioWavCodec, Multimodal}

/** Audio energy-envelope fingerprint near-dup (q175): the WAV round-trip
  * against the synthesis formulas, gain invariance, the member Hamming
  * contract, and the end-to-end dedup decision reusing the q171
  * machinery unchanged.
  */
class AudioFpSpec extends SparkSpec {
  import spark.implicits._

  private def expectedBits(id: Long): Array[Int] = {
    val g = id / 4; val m = id % 4
    val key = if (m == 3) s"a:$g:alt" else s"a:$g"
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
      .take(8).map(b => f"${b & 0xff}%02x").mkString
    Array.tabulate(64) { w =>
      if (w == 0) 0
      else if (w == 63) 1
      else {
        val nib = Integer.parseInt(hex.substring(w / 4, w / 4 + 1), 16)
        val raw = (nib >> (3 - (w % 4))) & 1
        if (m == 2 && (w == 2 || w == 23 || w == 55)) 1 - raw else raw
      }
    }
  }

  private def packBits(bits: Array[Int]): Long =
    bits.zipWithIndex.foldLeft(0L) { case (h, (b, i)) =>
      if (b == 1) h | (1L << i) else h
    }

  test("fingerprint64: exact thresholding and uniform-gain invariance") {
    // 128 samples, 2 per window: alternate loud/quiet windows
    def wave(scale: Int): Array[Int] = Array.tabulate(128) { i =>
      val w = i / 2
      val a = (if (w % 2 == 0) 900 else 100) * scale
      if (i % 2 == 0) a else -a
    }
    val base = Multimodal.audioFingerprint64(wave(1))
    val expect = packBits(Array.tabulate(64)(w => if (w % 2 == 0) 1 else 0))
    assert(base === expect)
    assert(Multimodal.audioFingerprint64(wave(3)) === base)
    assert(Multimodal.audioFingerprint64(Array.empty[Int]) === 0L)
  }

  test("WAV round-trip: decode + fingerprint reproduce the synthesis formulas") {
    val media = Multimodal.synthesizeNearDupAudio((0L until 40L).toDF("doc_id"), "doc_id")
    val got = Multimodal.audioFingerprint(media, AudioWavCodec)
      .select("media_id", "phash").as[(Long, Long)].collect().toMap
    assert(got.size === 40)
    (0L until 40L).foreach { id =>
      assert(got(id) === packBits(expectedBits(id)), s"fingerprint mismatch id $id")
    }
    // member contracts: m1 (gain) hash-equal to m0; m2 at Hamming 3
    (0L until 10L).foreach { g =>
      assert(got(4 * g) === got(4 * g + 1))
      assert(java.lang.Long.bitCount(got(4 * g) ^ got(4 * g + 2)) === 3)
    }
  }

  test("end-to-end audio dedup: q171 machinery unchanged, corrupt routed") {
    val media = Multimodal.synthesizeNearDupAudio((0L until 24L).toDF("doc_id"), "doc_id")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(media.schema)
    val corrupted = media.map { r =>
      if (r.getLong(0) == 13L)
        Row(r.get(0), r.get(1), "not a wav".getBytes("UTF-8"), r.get(3))
      else r
    }(enc)
    val out = Multimodal.phashDedup(
        Multimodal.audioFingerprint(corrupted, AudioWavCodec), maxDist = 3)
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
  }
}
