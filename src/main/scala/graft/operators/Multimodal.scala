package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns with a typed metadata struct —
  * the lakehouse-standard shape (mirrors Spark's own `image` schema and
  * parquet BYTE_ARRAY storage). Decode / feature-extraction runs
  * per-partition in batches via `mapPartitions`; the decode kernel itself
  * is STUBBED (no codec libs in this container) behind
  * [[MediaCodec.decodeStub]] — a deterministic fake that preserves the
  * real batch shape, schema and partitioning so the Spark-side plumbing is
  * fully exercised and tested.
  *
  * Scale notes: binary blobs never participate in shuffles here — metadata
  * extraction projects the blob away before any wide operation; frame
  * sampling emits (id, frame_no, feature) rows sized by the sampler, not
  * the source bytes. Partition sizing for 100 TB of media = keep
  * `maxPartitionBytes` at parquet-row-group granularity; blobs stay
  * columnar until the mapPartitions boundary.
  */
object Multimodal {

  /** The canonical media column group: blob + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("mime", StringType, nullable = true)
    )), nullable = true)
  ))

  /** Synthesize a media table from any source table: deterministic fake
    * blobs (sha-derived) so plumbing tests have real bytes to move.
    */
  def synthesize(src: DataFrame, idCol: String): DataFrame =
    src.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("kind"),
      unbase64(base64(sha2(col(idCol).cast("string"), 256).cast("binary"))).as("bytes"),
      struct(
        (pmod(col(idCol).cast("long"), lit(4)) * 160 + 320).cast("int").as("width"),
        (pmod(col(idCol).cast("long"), lit(4)) * 90 + 180).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col(idCol).cast("long"), lit(8)) + 1).cast("int").as("n_frames"),
        lit("application/octet-stream").as("mime")
      ).as("meta"))

  /** Blob-free metadata projection (what a catalog scan should read —
    * column pruning keeps the bytes on disk).
    */
  def metadataOnly(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"),
      length(col("bytes")).as("n_bytes"),
      col("meta.width"), col("meta.height"), col("meta.sample_rate"),
      col("meta.n_frames"), col("meta.mime"))

  /** Resize: fit image/video media into a target box, keeping the
    * metadata struct honest (aspect-preserving scaled width/height; audio
    * rows pass through untouched). The pixel resample itself is stubbed
    * as a deterministic content hash — a real codec would swap in a
    * mapPartitions batch exactly like [[frameFeatures]]; everything else
    * (schema, conditional routing by kind, metadata math) is real.
    */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("meta.width"),
      lit(maxH.toDouble) / col("meta.height"), lit(1.0))
    // resizable = image/video WITH usable dimensions: a NULL meta (or a
    // zero width/height, whose division nulls out `scale`) must pass the
    // row through untouched — resizing would otherwise propagate NULL
    // into `bytes` and silently destroy the payload
    val resizable = col("kind").isin("image", "video") &&
      col("meta.width") > 0 && col("meta.height") > 0
    // target dims are computed ONCE against the ORIGINAL meta (as temp
    // columns) before meta is replaced — referencing meta.width in a later
    // withColumn would silently re-evaluate against the resized struct
    media
      .withColumn("__w", (col("meta.width") * scale).cast("int"))
      .withColumn("__h", (col("meta.height") * scale).cast("int"))
      .withColumn("bytes",
        when(resizable,
          udfFreeResizeBytes(col("bytes"), col("__w"), col("__h"))).otherwise(col("bytes")))
      .withColumn("meta",
        when(resizable, struct(
          col("__w").as("width"), col("__h").as("height"),
          col("meta.sample_rate"), col("meta.n_frames"), col("meta.mime")))
          .otherwise(col("meta")))
      .drop("__w", "__h")
  }

  /** Deterministic stand-in for the pixel resample: real systems hand the
    * byte batch to a codec here; the stub derives bytes from (payload,
    * target box) so plumbing tests see size/metadata effects.
    */
  private def udfFreeResizeBytes(bytes: org.apache.spark.sql.Column,
                                 w: org.apache.spark.sql.Column,
                                 h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unbase64(base64(sha2(concat(base64(bytes), w.cast("string"), h.cast("string")), 256).cast("binary")))

  /** Frame-sample features: one row per sampled frame per media item,
    * batched per partition. The decode is [[MediaCodec.decodeStub]].
    */
  def frameFeatures(media: DataFrame, everyNth: Int): DataFrame = {
    // API-boundary guard: 0 would throw 'step cannot be 0' per-row deep
    // inside mapPartitions, and a negative stride silently samples nothing
    require(everyNth >= 1, s"frameFeatures needs everyNth >= 1, got $everyNth")
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("feature", ArrayType(FloatType), nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("media_id", "bytes", "meta.n_frames")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val nFrames = if (r.isNullAt(2)) 0 else r.getInt(2)
          (0 until nFrames by everyNth).iterator.map { f =>
            Row(id, f, MediaCodec.decodeStub(bytes, f))
          }
        }
      }(enc)
  }
}

/** The decode kernel boundary. In production this wraps a real codec
  * (libjpeg/ffmpeg/…) over the byte batch; none ship in this container, so
  * the stub derives a deterministic 8-dim feature from the bytes — same
  * signature, same batch shape, honest plumbing.
  */
object MediaCodec {
  def decodeStub(bytes: Array[Byte], frame: Int): Array[Float] = {
    val h = java.util.Arrays.hashCode(bytes) * 31 + frame
    Array.tabulate(8)(i => ((h >>> (i * 4)) & 0xff).toFloat / 255.0f)
  }
}
