package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

/** The TRUE image-decode arm (JDK ImageIO; round-10 directive #5): the
  * fixture PNGs are genuine encoded images, the decode reproduces the
  * closed-form pixels exactly, corrupt payloads quarantine instead of
  * poisoning the batch, and the color path's integer luminance is
  * deterministic.
  */
class ImageIoSpec extends SparkSpecBase {

  private lazy val s = spark
  import s.implicits._

  test("pngPayload emits genuine PNGs (magic header, real codec round-trip)") {
    val recs = Multimodal.pngPayload(
      Seq(7L, 42L).toDF("doc_id"), "doc_id").collect()
    assert(recs.length === 2)
    recs.foreach { r =>
      val m = r.png.take(8).map(_ & 0xff)
      assert(m.toSeq === Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
        "PNG signature bytes")
      // a REAL codec reads it back at the declared size
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.png))
      assert(img.getWidth === 27 && img.getHeight === 24)
    }
  }

  test("decodeToGrid reproduces the closed-form pixels at the sampled coords") {
    val png = Multimodal.pngPayload(Seq(123L).toDF("doc_id"), "doc_id")
      .collect()(0).png
    val Some((w, h, grid)) = Multimodal.decodeToGrid(png)
    assert((w, h) === (27, 24))
    for (gy <- 0 until 8; gx <- 0 until 9) {
      val expect = Multimodal.fixturePixel(123L, gx * 27 / 9, gy * 24 / 8)
      assert((grid(gy * 9 + gx) & 0xff) === expect,
        s"grid($gx,$gy) decode mismatch")
    }
  }

  test("undecodable payloads quarantine; the batch survives") {
    val good = Multimodal.pngPayload(Seq(5L).toDF("doc_id"), "doc_id")
    val bad = Seq(Multimodal.ImageRecord(99L, Array[Byte](1, 2, 3))).toDS()
    val out = Multimodal.decodeImages(good.union(bad)).collect()
    assert(out.map(_.media_id).toSeq === Seq(5L),
      "corrupt image dropped, good one decoded")
  }

  test("color images decode through the deterministic integer luminance") {
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 9)
      img.setRGB(x, y, ((x * 20) << 16) | ((y * 25) << 8) | 40)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val Some((w, h, grid)) = Multimodal.decodeToGrid(bos.toByteArray)
    assert((w, h) === (9, 8))
    for (y <- 0 until 8; x <- 0 until 9) {
      val expect = (299 * (x * 20) + 587 * (y * 25) + 114 * 40) / 1000
      assert((grid(y * 9 + x) & 0xff) === expect)
    }
  }

  test("wavPayload emits genuine RIFF/WAVE; decode reproduces the closed-form PCM") {
    val recs = Multimodal.wavPayload(Seq(11L).toDF("doc_id"), "doc_id",
      nSamples = 512).collect()
    val wav = recs(0).wav
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    // the REAL codec parses it back: format and samples exact
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getSampleSizeInBits === 16)
    assert(ais.getFormat.getChannels === 1)
    val bytes = ais.readAllBytes()
    assert(bytes.length === 1024)
    for (i <- 0 until 512) {
      val got = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff))
      assert(got === Multimodal.fixtureSample(11L, i), s"sample $i")
    }
  }

  test("decodeWavFrames: exact features, quarantine for junk and non-PCM16") {
    val frames = Multimodal.decodeWavFrames(
      Multimodal.wavPayload(Seq(3L).toDF("doc_id"), "doc_id", nSamples = 512),
      window = 128).collect().sortBy(_.frame_i)
    assert(frames.length === 4)
    // driver recompute of frame 1
    val f1 = frames(1)
    var energy = 0L
    var zc = 0
    var peak = 0
    for (i <- 128 until 256) {
      val s = Multimodal.fixtureSample(3L, i)
      energy += s.toLong * s
      if (i > 128 &&
        Multimodal.fixtureSample(3L, i - 1).toLong * s < 0) zc += 1
      peak = math.max(peak, math.abs(s))
    }
    assert((f1.energy, f1.zero_crossings, f1.peak) === ((energy, zc, peak)))
    // junk bytes quarantine; the good record still decodes
    val mixed = Multimodal.wavPayload(Seq(5L).toDF("doc_id"), "doc_id",
        nSamples = 256)
      .union(Seq(Multimodal.AudioRecord(99L, Array[Byte](9, 9, 9))).toDS())
    assert(Multimodal.decodeWavFrames(mixed).collect()
      .map(_.media_id).distinct.toSeq === Seq(5L))
  }

  test("canonicalWav is byte-identical to the javax AudioSystem.write encoding") {
    for (id <- Seq(0L, 7L, 123456L); n <- Seq(1, 255, 512)) {
      val data = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val s = Multimodal.fixtureSample(id, i)
        data(2 * i) = (s & 0xff).toByte
        data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      assert(Multimodal.canonicalWav(data, 8000).toSeq === bos.toByteArray.toSeq,
        s"id=$id n=$n")
    }
  }

  test("parsePcm16MonoWav parity with the javax reader") {
    def javaxParse(b: Array[Byte]): Option[(Seq[Byte], Boolean)] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(b))
        val fmt = ais.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
        else Some((ais.readAllBytes().toSeq, fmt.isBigEndian))
      } catch { case _: Exception => None }
    // canonical: both parse, same pcm bytes, little-endian
    val data = Array.tabulate(512 * 2)(i => (i * 13 % 251).toByte)
    val wav = Multimodal.canonicalWav(data, 8000)
    val manual = Multimodal.parsePcm16MonoWav(wav)
    assert(manual.map { case (p, be) => (p.toSeq, be) } === javaxParse(wav))
    assert(manual.get._1.toSeq === data.toSeq)
    // non-PCM16-mono payloads: manual declines, javax quarantines too —
    // stereo 16-bit
    val stereoFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val stereoAis = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](64)), stereoFmt, 16L)
    val sb = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stereoAis,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, sb)
    assert(Multimodal.parsePcm16MonoWav(sb.toByteArray) === None)
    assert(javaxParse(sb.toByteArray) === None)
    // truncated data chunk: manual hands off (None); junk: both None
    val truncated = wav.take(wav.length - 10)
    assert(Multimodal.parsePcm16MonoWav(truncated) === None)
    assert(Multimodal.parsePcm16MonoWav(Array[Byte](1, 2, 3)) === None)
    // an extra chunk between fmt and data still parses (chunk walk)
    val extra = {
      val junk = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0)
      val head = wav.take(36) // RIFF..fmt chunk
      val tail = wav.drop(36) // data chunk
      val out = new Array[Byte](head.length + junk.length + tail.length)
      System.arraycopy(head, 0, out, 0, head.length)
      System.arraycopy(junk, 0, out, head.length, junk.length)
      System.arraycopy(tail, 0, out, head.length + junk.length, tail.length)
      // fix the RIFF size field
      val sz = out.length - 8
      out(4) = (sz & 0xff).toByte; out(5) = ((sz >> 8) & 0xff).toByte
      out(6) = ((sz >> 16) & 0xff).toByte; out(7) = ((sz >>> 24) & 0xff).toByte
      out
    }
    assert(Multimodal.parsePcm16MonoWav(extra).map(_._1.toSeq) === Some(data.toSeq))
  }

  test("the dHash kernel over a decoded grid matches a driver recompute") {
    val df = Multimodal.decodeImages(
        Multimodal.pngPayload(Seq(7L, 250L, 999L).toDF("doc_id"), "doc_id"))
      .toDF()
      .select(col("media_id"), Multimodal.dHash(col("grid")).as("dh"))
      .select(col("media_id"), col("dh.lo"), col("dh.hi"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    Seq(7L, 250L, 999L).foreach { id =>
      var lo = 0L
      var hi = 0L
      for (gy <- 0 until 8; gx <- 0 until 8) {
        val a = Multimodal.fixturePixel(id, gx * 27 / 9, gy * 24 / 8)
        val b = Multimodal.fixturePixel(id, (gx + 1) * 27 / 9, gy * 24 / 8)
        if (b > a) {
          val bit = gy * 8 + gx
          if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
        }
      }
      assert(df(id) === ((lo, hi)), s"dHash mismatch for id=$id")
    }
  }
}
