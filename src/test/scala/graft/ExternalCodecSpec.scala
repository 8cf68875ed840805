package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{DecodedImage, MediaCodec, Multimodal}

/** The EXTERNAL-codec sidecar contract, spec-asserted (r17 verdict item
  * #3): [[graft.operators.StubCodec]] documents that mp4/webm-class
  * formats swap in through the [[MediaCodec]] boundary — this spec
  * PROVES the boundary by driving `frameFeatures`/`decodeMeta` with a
  * codec for a synthetic container NO JDK decoder knows ("FKV1"), and
  * asserting format, per-frame payload, batch shape, and corrupt-input
  * behavior all carry through the Spark-side plumbing faithfully.
  *
  * FKV1 wire layout (stands in for any foreign container):
  * bytes 0–3 = ASCII magic "FKV1"; byte 4 = n_frames (u8);
  * bytes 5–6 = width (u16 BE); bytes 7–8 = height (u16 BE);
  * bytes 9.. = one fill byte per frame. A sidecar codec must honor the
  * [[MediaCodec]] contract exactly as this one does: decodeFrames opens
  * the container ONCE per clip and yields one (frame, feature) pair per
  * REQUESTED index in order with null features for out-of-range frames;
  * decodeImage returns None on bytes it cannot parse (rows survive with
  * null measurements, never dropped).
  */
object ExternalCodecSpec {
  val containerOpens = new java.util.concurrent.atomic.AtomicInteger(0)

  object FakeExternalCodec extends MediaCodec {
    private def parse(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
      if (bytes.length < 9 || new String(bytes.take(4), "US-ASCII") != "FKV1") None
      else {
        val n = bytes(4) & 0xff
        val w = ((bytes(5) & 0xff) << 8) | (bytes(6) & 0xff)
        val h = ((bytes(7) & 0xff) << 8) | (bytes(8) & 0xff)
        if (bytes.length < 9 + n) None else Some((n, w, h, bytes.drop(9)))
      }
    def decodeImage(bytes: Array[Byte]): Option[DecodedImage] =
      parse(bytes).map { case (_, w, h, fills) =>
        val f = if (fills.nonEmpty) fills(0) & 0xff else 0
        DecodedImage(w, h, f, f, f)
      }
    def decodeFrame(bytes: Array[Byte], frame: Int): Array[Float] =
      decodeFrames(bytes, Seq(frame)).next()._2
    override def decodeFrames(bytes: Array[Byte],
                              frames: Seq[Int]): Iterator[(Int, Array[Float])] = {
      containerOpens.incrementAndGet() // ONE open per clip — spec-counted
      parse(bytes) match {
        case None => frames.iterator.map(f => (f, null: Array[Float]))
        case Some((n, w, h, fills)) =>
          frames.iterator.map { f =>
            if (f < 0 || f >= n) (f, null: Array[Float])
            else (f, Array(w.toFloat, h.toFloat, (fills(f) & 0xff) / 255.0f))
          }
      }
    }
  }

  def fkv1(nFrames: Int, w: Int, h: Int, fills: Seq[Int]): Array[Byte] =
    "FKV1".getBytes("US-ASCII") ++ Array(nFrames.toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte) ++
      fills.map(_.toByte).toArray
}

class ExternalCodecSpec extends SparkSpec {
  import ExternalCodecSpec._

  private def mediaDf(rows: Seq[(Long, Array[Byte], Int)]) = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType),
      StructField("bytes", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("sample_rate", IntegerType),
        StructField("n_frames", IntegerType),
        StructField("mime", StringType))))))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (id, b, n) =>
        Row(id, "video", b, Row(null, null, null, Integer.valueOf(n),
          "video/x-fake")) }: _*), schema)
  }

  test("frameFeatures carries a foreign container's per-frame payload faithfully") {
    val media = mediaDf(Seq(
      (1L, fkv1(4, 320, 240, Seq(10, 20, 30, 40)), 4),
      (2L, fkv1(2, 64, 48, Seq(200, 100)), 2)))
    val got = Multimodal.frameFeatures(media, everyNth = 2,
        codec = FakeExternalCodec)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getAs[scala.collection.Seq[Float]](2))).toSet
    // every sampled frame reproduces ITS OWN fill byte — format (w, h)
    // and the frame payload both crossed the boundary
    assert(got == Set(
      (1L, 0, Seq(320.0f, 240.0f, 10 / 255.0f)),
      (1L, 2, Seq(320.0f, 240.0f, 30 / 255.0f)),
      (2L, 0, Seq(64.0f, 48.0f, 200 / 255.0f))))
  }

  test("one container open per clip (the batch contract), not per frame") {
    val media = mediaDf(Seq((7L, fkv1(8, 16, 16, (0 until 8).map(_ * 10)), 8)))
      .coalesce(1)
    containerOpens.set(0)
    val n = Multimodal.frameFeatures(media, everyNth = 1,
      codec = FakeExternalCodec).collect().length
    assert(n == 8)
    assert(containerOpens.get() == 1,
      s"expected ONE decodeFrames call for 8 sampled frames, got ${containerOpens.get()}")
  }

  test("metadata n_frames overshoot yields null features, rows survive") {
    // meta CLAIMS 5 frames, container holds 2: sampled frames 2..4 must
    // come back null-featured (the decodeFrame contract), never dropped
    val media = mediaDf(Seq((3L, fkv1(2, 32, 32, Seq(1, 2)), 5)))
    val got = Multimodal.frameFeatures(media, everyNth = 1,
        codec = FakeExternalCodec)
      .collect().map(r => r.getInt(1) -> r.isNullAt(2)).toMap
    assert(got == Map(0 -> false, 1 -> false, 2 -> true, 3 -> true, 4 -> true))
  }

  test("corrupt bytes: frameFeatures nulls, decodeMeta nulls, nothing dropped") {
    val junk = "NOTAFILE".getBytes("US-ASCII")
    val media = mediaDf(Seq((9L, junk, 3)))
    val feats = Multimodal.frameFeatures(media, everyNth = 1,
      codec = FakeExternalCodec).collect()
    assert(feats.length == 3 && feats.forall(_.isNullAt(2)))
    val meta = Multimodal.decodeMeta(
      media.withColumn("kind", lit("image")), FakeExternalCodec).collect()
    assert(meta.length == 1 && meta(0).isNullAt(2)) // null width, row kept
  }

  test("decodeMeta carries a foreign container's header through the boundary") {
    val media = mediaDf(Seq((4L, fkv1(1, 1280, 720, Seq(77)), 1)))
      .withColumn("kind", lit("image"))
    val r = Multimodal.decodeMeta(media, FakeExternalCodec).collect()(0)
    val (w, h, mr) = (r.getInt(r.fieldIndex("width")),
      r.getInt(r.fieldIndex("height")), r.getInt(r.fieldIndex("mean_r")))
    assert((w, h, mr) == ((1280, 720, 77)))
  }
}
