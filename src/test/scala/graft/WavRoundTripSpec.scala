package graft

import graft.operators.{AudioWavCodec, Multimodal}

/** Cross-certification of the fast RIFF path against the JDK codec:
  * [[Multimodal.writeWavPcm16]] output must decode identically through
  * the JDK reader AND [[AudioWavCodec.decodePcm]]; JDK-written WAVs
  * must decode identically through the direct RIFF parser. The fast
  * path exists because AudioSystem costs ~2-3 ms of provider machinery
  * per clip (q175's first 100x cut: 937 s); these pins stop it from
  * ever drifting from the reference implementation.
  */
class WavRoundTripSpec extends SparkSpec {

  private def pcmOf(samples: Array[Int]): Array[Byte] = {
    val b = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      b(2 * i) = (samples(i) & 0xff).toByte
      b(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    b
  }

  private def jdkWav(rate: Int, samples: Array[Int]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcmOf(samples)), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def jdkDecode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val f = ais.getFormat
      val pcm = ais.readAllBytes()
      val out = Array.tabulate(pcm.length / 2)(i =>
        ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt)
      (f.getSampleRate.toInt, f.getChannels, out)
    } finally ais.close()
  }

  private val samples = Array.tabulate(517)(t => ((t * 31 + 7) % 65536) - 32768)

  test("our writer -> JDK reader: container accepted, samples identical") {
    val wav = Multimodal.writeWavPcm16(16000, pcmOf(samples))
    val (rate, ch, got) = jdkDecode(wav)
    assert(rate === 16000 && ch === 1)
    assert(got.toSeq === samples.toSeq)
  }

  test("JDK writer -> our parser: samples identical") {
    val wav = jdkWav(8000, samples)
    val Some((rate, ch, got)) = AudioWavCodec.decodePcm(wav)
    assert(rate === 8000 && ch === 1)
    assert(got.toSeq === samples.toSeq)
  }

  test("our writer -> our parser: closed loop") {
    val wav = Multimodal.writeWavPcm16(44100, pcmOf(samples))
    val Some((rate, ch, got)) = AudioWavCodec.decodePcm(wav)
    assert(rate === 44100 && ch === 1)
    assert(got.toSeq === samples.toSeq)
  }

  test("rejections: corrupt, truncated, non-PCM format code") {
    assert(AudioWavCodec.decodePcm("not a wav at all".getBytes).isEmpty)
    assert(AudioWavCodec.decodePcm(null).isEmpty)
    val wav = Multimodal.writeWavPcm16(16000, pcmOf(samples))
    assert(AudioWavCodec.decodePcm(wav.take(30)).isEmpty)
    // flip the fmt audioFormat code to 3 (float) — must be rejected
    val bad = wav.clone(); bad(20) = 3
    assert(AudioWavCodec.decodePcm(bad).isEmpty)
  }

  test("odd-length chunk alignment is honored") {
    // build a WAV with an odd-sized junk chunk before fmt/data: parsers
    // that forget word alignment misread every following chunk
    val base = Multimodal.writeWavPcm16(16000, pcmOf(samples))
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 1, 2, 3)
    val padded = junk ++ Array[Byte](0) // writer pads to word boundary
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 12)          // RIFF....WAVE
    out.write(padded)
    out.write(base, 12, base.length - 12)
    val bytes = out.toByteArray
    // fix the RIFF size field
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, bytes.length - 8)
    val Some((rate, _, got)) = AudioWavCodec.decodePcm(bytes)
    assert(rate === 16000)
    assert(got.toSeq === samples.toSeq)
  }
}
