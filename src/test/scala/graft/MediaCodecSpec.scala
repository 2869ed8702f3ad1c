package graft

import java.io.ByteArrayInputStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MediaCodec

/** The media codecs must be REAL container implementations, not a private
  * round-trip convention — so every direction is cross-validated against
  * the JDK's independent decoders/encoders (`javax.imageio.ImageIO` for
  * BMP, `javax.sound.sampled.AudioSystem` for WAV), which share no code
  * with [[MediaCodec]].
  */
class MediaCodecSpec extends AnyFunSuite {

  private def sampleRgb(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 31 + seed * 17 + i / 7) % 256).toByte)

  test("our BMP encode is readable by ImageIO with identical pixels") {
    for ((w, h, seed) <- Seq((1, 1, 0), (3, 2, 1), (8, 8, 2), (31, 48, 3), (64, 9, 4))) {
      val rgb = sampleRgb(w, h, seed)
      val bytes = MediaCodec.encodeBmp(w, h, rgb)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO could not parse our ${w}x$h BMP")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        val p = (y * w + x) * 3
        assert(((argb >> 16) & 0xff) == (rgb(p) & 0xff), s"R mismatch at ($x,$y)")
        assert(((argb >> 8) & 0xff) == (rgb(p + 1) & 0xff), s"G mismatch at ($x,$y)")
        assert((argb & 0xff) == (rgb(p + 2) & 0xff), s"B mismatch at ($x,$y)")
      }
    }
  }

  test("our BMP decode reads ImageIO-written (bottom-up) BMPs with identical pixels") {
    for ((w, h, seed) <- Seq((1, 1, 5), (5, 3, 6), (22, 48, 7), (64, 48, 8))) {
      val rgb = sampleRgb(w, h, seed)
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val p = (y * w + x) * 3
        img.setRGB(x, y, ((rgb(p) & 0xff) << 16) | ((rgb(p + 1) & 0xff) << 8) | (rgb(p + 2) & 0xff))
      }
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "bmp", baos), "ImageIO has no BMP writer")
      // ImageIO writes bottom-up (positive height) — the orientation our
      // own encoder does NOT produce, so this leg proves the parser's
      // row-order handling rather than replaying our own layout
      val dec = MediaCodec.decodeBmp(baos.toByteArray)
      assert(dec.width == w && dec.height == h)
      assert(dec.rgb.sameElements(rgb), s"pixel mismatch on ImageIO-written ${w}x$h BMP")
    }
  }

  test("BMP round-trip is exact across a dimension sweep (incl. every stride-pad case)") {
    val rnd = new scala.util.Random(20260815)
    for (_ <- 0 until 60) {
      val (w, h, seed) = (1 + rnd.nextInt(40), 1 + rnd.nextInt(30), rnd.nextInt(1000))
      val rgb = sampleRgb(w, h, seed)
      val dec = MediaCodec.decodeBmp(MediaCodec.encodeBmp(w, h, rgb))
      assert(dec.width == w && dec.height == h && dec.rgb.sameElements(rgb),
        s"round-trip broke at ${w}x$h seed=$seed")
    }
  }

  test("PNG encode/decode recovers exact pixels and matches the BMP path") {
    for ((w, h, seed) <- Seq((1, 1, 10), (7, 5, 11), (31, 48, 12), (64, 9, 13))) {
      val rgb = sampleRgb(w, h, seed)
      val png = MediaCodec.encodePng(w, h, rgb)
      // real PNG signature on disk
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
      val dec = MediaCodec.decodePng(png)
      assert(dec.width == w && dec.height == h)
      assert(dec.rgb.sameElements(rgb), s"PNG pixel mismatch at ${w}x$h")
      // cross-container agreement: the SAME logical pixels through the
      // hand-rolled BMP path and the zlib PNG path give one buffer
      val viaBmp = MediaCodec.decodeBmp(MediaCodec.encodeBmp(w, h, rgb))
      assert(dec.rgb.sameElements(viaBmp.rgb), "PNG and BMP paths disagree")
    }
  }

  test("8-bit paletted BMP is readable by ImageIO with identical expanded pixels") {
    for ((w, h, seed) <- Seq((1, 1, 20), (5, 3, 21), (17, 9, 22), (33, 12, 23))) {
      val palette = Array.tabulate(256)(k =>
        (((k * 37 + seed) % 256) << 16) | (((k * 11) % 256) << 8) | ((k * 73 + 5) % 256))
      val idx = Array.tabulate(w * h)(i => ((i * 131 + seed * 7) % 256).toByte)
      val bytes = MediaCodec.encodeBmp8(w, h, palette, idx)
      // our own parse expands through the palette
      val dec = MediaCodec.decodeBmp(bytes)
      assert(dec.width == w && dec.height == h)
      for (i <- 0 until w * h) {
        val c = palette(idx(i) & 0xff)
        assert((dec.rgb(3 * i) & 0xff) == ((c >> 16) & 0xff)
          && (dec.rgb(3 * i + 1) & 0xff) == ((c >> 8) & 0xff)
          && (dec.rgb(3 * i + 2) & 0xff) == (c & 0xff), s"palette expand broke at $i")
      }
      // the JDK's independent BMP reader agrees on every pixel
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO could not parse our ${w}x$h paletted BMP")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        val p = (y * w + x) * 3
        assert(((argb >> 16) & 0xff) == (dec.rgb(p) & 0xff)
          && ((argb >> 8) & 0xff) == (dec.rgb(p + 1) & 0xff)
          && (argb & 0xff) == (dec.rgb(p + 2) & 0xff),
          s"ImageIO disagrees at ($x,$y) on paletted BMP")
      }
    }
  }

  test("malformed BMP8 (truncated pixels, partial palette) fails loudly, not OOB") {
    // ADVICE r10: decodeImage is the untrusted mixed-crawl-shard entry
    // point — a spec-valid-looking header must never send the parser past
    // the payload or read pixel bytes as palette colors
    val palette = Array.tabulate(256)(k => (k << 16) | (k << 8) | k)
    val idx = Array.tabulate(8 * 4)(i => (i % 256).toByte)
    val good = MediaCodec.encodeBmp8(8, 4, palette, idx)
    // truncate mid-pixel-data: must throw a require with a message, not AIOOBE
    val truncated = good.take(good.length - 10)
    val e1 = intercept[IllegalArgumentException](MediaCodec.decodeBmp(truncated))
    assert(e1.getMessage.contains("truncated"), e1.getMessage)
    // shrink the declared pixelOffset so only 16 palette entries fit
    // between header and pixels: indices >= 16 must be REJECTED as
    // out-of-palette instead of silently reading pixel bytes as colors
    val partial = good.clone()
    val bb = java.nio.ByteBuffer.wrap(partial).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val palOff = 14 + 40
    val newPixelOffset = palOff + 16 * 4
    // move pixel rows up to the new offset (keeps the file self-consistent)
    val oldPixelOffset = bb.getInt(10)
    System.arraycopy(good, oldPixelOffset, partial, newPixelOffset,
      good.length - oldPixelOffset)
    bb.putInt(10, newPixelOffset)
    bb.putInt(46, 0) // biClrUsed=0 -> "256" per spec, but only 16 fit
    val shrunk = java.util.Arrays.copyOf(partial,
      newPixelOffset + (good.length - oldPixelOffset))
    val e2 = intercept[IllegalArgumentException](MediaCodec.decodeBmp(shrunk))
    assert(e2.getMessage.contains("palette index"), e2.getMessage)
  }

  test("decodeImage sniffs the container by magic bytes") {
    val rgb = sampleRgb(9, 4, 30)
    assert(MediaCodec.decodeImage(MediaCodec.encodeBmp(9, 4, rgb)).rgb.sameElements(rgb))
    assert(MediaCodec.decodeImage(MediaCodec.encodePng(9, 4, rgb)).rgb.sameElements(rgb))
    assert(MediaCodec.decodeImage(MediaCodec.encodeJpeg(9, 4, rgb)).width == 9)
    val boom = intercept[IllegalArgumentException](
      MediaCodec.decodeImage("notanimage!!".getBytes("US-ASCII")))
    assert(boom.getMessage.contains("unsupported image container"))
  }

  test("JPEG: exact structure, bounded lossy pixel error on a smooth image") {
    // lossy codec contract: dimensions/channels exact always; pixel error
    // bounded on DCT-friendly (smooth) content — a gradient, not noise
    for ((w, h) <- Seq((16, 16), (64, 48), (33, 9))) {
      val rgb = Array.tabulate(w * h * 3) { i =>
        val px = i / 3; val x = px % w; val y = px / w
        ((x * 255 / math.max(1, w - 1) + y * 255 / math.max(1, h - 1)) / 2).toByte
      }
      val jpeg = MediaCodec.encodeJpeg(w, h, rgb)
      assert((jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8, "bad JPEG magic")
      val dec = MediaCodec.decodeJpeg(jpeg)
      assert(dec.width == w && dec.height == h && dec.rgb.length == w * h * 3)
      val meanErr = rgb.indices.map(i =>
        math.abs((dec.rgb(i) & 0xff) - (rgb(i) & 0xff))).sum.toDouble / rgb.length
      assert(meanErr < 8.0, s"JPEG mean abs pixel error $meanErr too large at ${w}x$h")
    }
  }

  test("our WAV encode is readable by AudioSystem with identical format and PCM") {
    val samples = Array.tabulate(1234)(t => ((t * 7919 + 13) % 65536 - 32768).toShort)
    val bytes = MediaCodec.encodeWav(8000, samples)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16)
    val pcm = in.readAllBytes()
    assert(pcm.length == samples.length * 2, s"AudioSystem read ${pcm.length} PCM bytes")
    for (t <- samples.indices) {
      val v = ((pcm(2 * t) & 0xff) | (pcm(2 * t + 1) << 8)).toShort
      assert(v == samples(t), s"sample $t: $v != ${samples(t)}")
    }
  }

  test("our WAV decode reads AudioSystem-written WAVs with identical samples") {
    val samples = Array.tabulate(777)(t => ((t * 257 - 5000) % 32768).toShort)
    val pcm = new Array[Byte](samples.length * 2)
    for (t <- samples.indices) {
      pcm(2 * t) = (samples(t) & 0xff).toByte
      pcm(2 * t + 1) = ((samples(t) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val dec = MediaCodec.decodeWav(baos.toByteArray)
    assert(dec.sampleRate == 8000 && dec.channels == 1 && dec.bitsPerSample == 16)
    assert(dec.samples.sameElements(samples), "PCM mismatch on AudioSystem-written WAV")
  }

  test("WAV chunk walk skips unknown chunks (LIST present in every payload)") {
    val samples = Array.tabulate(50)(t => (t * 100).toShort)
    val bytes = MediaCodec.encodeWav(8000, samples)
    // the LIST chunk sits between fmt and data; a byte-44 assumption
    // would misread — verify data is NOT at offset 44
    assert(new String(bytes, 36, 4, "US-ASCII") == "LIST")
    val dec = MediaCodec.decodeWav(bytes)
    assert(dec.samples.sameElements(samples))
  }

  test("stereo WAV cross-validates against AudioSystem in both directions") {
    // interleaved L/R with distinct per-channel patterns
    val inter = Array.tabulate(600)(t =>
      (if (t % 2 == 0) (t * 131) % 32768 else -((t * 37) % 32768)).toShort)
    val bytes = MediaCodec.encodeWav(16000, inter, channels = 2)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == 16000f && fmt.getChannels == 2 && fmt.getSampleSizeInBits == 16)
    val pcm = in.readAllBytes()
    assert(pcm.length == inter.length * 2)
    for (t <- inter.indices) {
      val v = ((pcm(2 * t) & 0xff) | (pcm(2 * t + 1) << 8)).toShort
      assert(v == inter(t), s"interleaved sample $t: $v != ${inter(t)}")
    }
    // reverse: AudioSystem-written stereo parsed by our chunk walk
    val raw = new Array[Byte](inter.length * 2)
    for (t <- inter.indices) {
      raw(2 * t) = (inter(t) & 0xff).toByte
      raw(2 * t + 1) = ((inter(t) >> 8) & 0xff).toByte
    }
    val afmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(raw), afmt, inter.length / 2L)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val dec = MediaCodec.decodeWav(baos.toByteArray)
    assert(dec.sampleRate == 16000 && dec.channels == 2 && dec.bitsPerSample == 16)
    assert(dec.samples.sameElements(inter), "stereo PCM mismatch")
  }

  test("WAV round-trip is exact across a length sweep (odd and even)") {
    val rnd = new scala.util.Random(99)
    for (_ <- 0 until 40) {
      val (n, seed) = (1 + rnd.nextInt(3000), rnd.nextInt(1 << 20))
      val samples = Array.tabulate(n)(t => (((t * 31 + seed) % 65536) - 32768).toShort)
      val dec = MediaCodec.decodeWav(MediaCodec.encodeWav(8000, samples))
      assert(dec.sampleRate == 8000 && dec.samples.sameElements(samples),
        s"round-trip broke at n=$n seed=$seed")
    }
  }
}
