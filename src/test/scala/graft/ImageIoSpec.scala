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
