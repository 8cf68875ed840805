package graft

import graft.operators.GifFrameCodec

/** Measures the GIF batch-decode claim instead of arguing it (the r16
  * verdict item): synthesizes animated GIFs at growing frame counts
  * (the [[graft.operators.Multimodal.synthesizeVideos]] writer, driver-
  * local), samples every 2nd frame, and times BOTH codec entry points —
  * the per-frame `decodeFrame` loop (re-opens the container and rescans
  * the descriptors per sampled frame → O(F²)-ish raster work) and the
  * batched `decodeFrames` (ONE reader + ONE descriptor scan per clip →
  * linear in frames). Prints ONE JSON line (the [[Bench]] artifact
  * contract): per-frame-count µs/clip for both paths plus the ratio.
  * Pure JVM codec work — no SparkSession, the numbers are the codec's.
  * Knobs: GRAFT_GIF_CLIPS (clips per frame count, default 200).
  */
object GifDecodeProbe {
  private def synthGif(id: Long, nf: Int): Array[Byte] = {
    val w = ((id % 4) * 16 + 32).toInt
    val h = ((id % 3) * 16 + 32).toInt
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nf) {
        val rgb = ((((id + 17 * f) % 256) << 16) |
          (((id * 7 + 29 * f) % 256) << 8) | ((id * 13 + 41 * f) % 256)).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        img.setRGB(0, 0, w, h, Array.fill(w * h)(rgb), 0, w)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  def main(args: Array[String]): Unit = {
    javax.imageio.ImageIO.setUseCache(false)
    val clips = sys.env.getOrElse("GRAFT_GIF_CLIPS", "200").toInt
    val frameCounts = Seq(2, 4, 8, 16, 32)
    def timeUs(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e3
    }
    // JIT + ImageIO plugin warmup before any measured pass
    (0 until 50).foreach { i =>
      val b = synthGif(i.toLong, 4)
      GifFrameCodec.decodeFrames(b, 0 until 4 by 2).foreach(_ => ())
      (0 until 4 by 2).foreach(f => GifFrameCodec.decodeFrame(b, f))
    }
    val rows = frameCounts.map { nf =>
      val gifs = Array.tabulate(clips)(i => synthGif(i.toLong, nf))
      val sample = 0 until nf by 2
      var sink = 0L // fold features in so the JIT can't drop the work
      // min of 3 interleaved passes per path — the bench_baseline noise
      // discipline, host jitter swamps single-pass timings at this size
      val (perFrameUs, batchUs) = (1 to 3).map { _ =>
        val pf = timeUs {
          gifs.foreach { b =>
            sample.foreach { f =>
              val a = GifFrameCodec.decodeFrame(b, f)
              if (a != null) sink += a(2).toLong
            }
          }
        } / clips
        val bt = timeUs {
          gifs.foreach { b =>
            GifFrameCodec.decodeFrames(b, sample).foreach { case (_, a) =>
              if (a != null) sink += a(2).toLong
            }
          }
        } / clips
        (pf, bt)
      }.reduce((a, b) => (math.min(a._1, b._1), math.min(a._2, b._2)))
      (nf, perFrameUs, batchUs, sink)
    }
    val detail = rows.map { case (nf, pf, b, _) =>
      f"""{"n_frames":$nf,"sampled":${(nf + 1) / 2},"per_frame_us":$pf%.1f,"batch_us":$b%.1f,"speedup":${pf / b}%.2f}"""
    }.mkString("[", ",", "]")
    // linearity witness: batch µs per SAMPLED frame should be ~flat as
    // frames grow; the per-frame loop's grows with container size
    val perSampled = rows.map { case (nf, _, b, _) => b / ((nf + 1) / 2) }
    println(
      f"""{"metric":"gif_decode_probe","clips_per_point":$clips,"rows":$detail,"batch_us_per_sampled_frame_first":${perSampled.head}%.2f,"batch_us_per_sampled_frame_last":${perSampled.last}%.2f}""")
  }
}
