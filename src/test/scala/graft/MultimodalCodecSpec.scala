package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.operators.Multimodal

/** The REAL image-codec path (javax.imageio): crafted PNG byte arrays
  * go through G1/G4 end-to-end — true header dimensions, actual pixel
  * rescale, decodable output payloads — while non-image payloads keep
  * the declared deterministic stub. */
class MultimodalCodecSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) { img.setRGB(x, y, 0x3366AA + 31 * x + y); y += 1 }
      x += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("G1 decodes real PNG bytes: true dimensions, header-only probe") {
    val bytes = png(100, 40)
    val media = Seq((1L, "image", bytes), (2L, "audio", bytes))
      .toDF("doc_id", "kind", "payload")
    val out = Multimodal.decodeMetaPayloads(media).orderBy("doc_id").collect()
    val img = out(0)
    assert(img.getAs[Int]("width") === 100 && img.getAs[Int]("height") === 40)
    assert(img.getAs[Int]("frames") === 1)
    assert(img.getAs[Int]("n_bytes") === bytes.length)
    // audio keeps the declared stub — no audio codec in this container
    assert(out(1).getAs[String]("kind") === "audio")
  }

  test("G4 resizes real PNG bytes: output payload IS a decodable image at target dims") {
    val bytes = png(100, 40)
    val media = Seq((1L, "image", bytes)).toDF("doc_id", "kind", "payload")
    val r = Multimodal.resizePayloads(media, 50, 50).collect().head
    assert(r.getAs[Int]("src_w") === 100 && r.getAs[Int]("src_h") === 40)
    assert(r.getAs[Int]("dst_w") === 50 && r.getAs[Int]("dst_h") === 20) // aspect kept
    val out = ImageIO.read(
      new ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
    assert(out != null && out.getWidth === 50 && out.getHeight === 20)
    assert(r.getAs[Int]("n_bytes") === r.getAs[Array[Byte]]("payload").length)
  }

  test("G4 never upscales: an in-bounds image passes its original bytes through") {
    val bytes = png(30, 20)
    val media = Seq((1L, "image", bytes)).toDF("doc_id", "kind", "payload")
    val r = Multimodal.resizePayloads(media, 224, 224).collect().head
    assert(r.getAs[Int]("dst_w") === 30 && r.getAs[Int]("dst_h") === 20)
    assert(r.getAs[Array[Byte]]("payload").toSeq === bytes.toSeq) // untouched
  }

  test("is_real marks decodable payloads; stub subsamples and nulls are flagged") {
    val good = png(300, 300) // downscales for real
    val junk = "not an image at all, just bytes".getBytes("UTF-8")
    val media = Seq((1L, "image", good), (2L, "image", junk),
        (3L, "image", null: Array[Byte]))
      .toDF("doc_id", "kind", "payload")
    val rows = Multimodal.resizePayloads(media, 50, 50)
      .select("doc_id", "is_real").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rows(1L), "real resized PNG must be flagged is_real")
    assert(!rows(2L), "stub byte-subsample must NOT be flagged is_real")
    assert(!rows(3L), "null payload takes the stub path without an NPE")
    // null payloads survive decodeMeta too (stubMeta hashes empty)
    val meta = Multimodal.decodeMetaPayloads(
      Seq((9L, "audio", null: Array[Byte])).toDF("doc_id", "kind", "payload"))
      .collect().head
    assert(meta.getAs[Int]("n_bytes") === 0)
  }

  test("corrupt image payloads fall back to the stub instead of crashing the task") {
    // valid PNG signature + IHDR start, then truncated/garbage body —
    // JDK readers throw (IOException or unchecked) on payloads like
    // this; the codec must answer None/stub, never escape the task
    val valid = png(20, 10)
    val corrupt = valid.take(24) ++ Array.fill[Byte](16)(0x41)
    assert(Multimodal.Codec.resizeImage(corrupt, 5, 5).isEmpty)
    val media = Seq((9L, "image", corrupt)).toDF("doc_id", "kind", "payload")
    val out = Multimodal.decodeMetaPayloads(media).collect().head
    assert(out.getAs[Int]("n_bytes") === corrupt.length) // stub path
  }

  test("decompression-bomb payloads are refused before the pixel allocation") {
    // hand-built PNG IHDR declaring 1e5 x 1e5 (10 gigapixels) in a
    // tiny stream: the header probe must report the declared dims, and
    // resizeImage must refuse (None) rather than allocate ~40 GiB
    def be(i: Int): Array[Byte] =
      Array(((i >> 24) & 0xff).toByte, ((i >> 16) & 0xff).toByte,
        ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdrData = be(100000) ++ be(100000) ++
      Array[Byte](8, 2, 0, 0, 0) // bit depth 8, RGB
    val crc = new java.util.zip.CRC32()
    crc.update("IHDR".getBytes("US-ASCII")); crc.update(ihdrData)
    val bomb = sig ++ be(13) ++ "IHDR".getBytes("US-ASCII") ++
      ihdrData ++ be(crc.getValue.toInt)
    assert(Multimodal.Codec.imageSize(bomb) === Some((100000, 100000)))
    assert(Multimodal.Codec.resizeImage(bomb, 224, 224).isEmpty)
  }

  test("G3 extracts real grid-pooled luminance features from PNG bytes, hand-computable") {
    // 8×8 PNG in four solid 4×4 quadrants of pure gray — BT.601
    // luminance of rgb(g,g,g) is exactly g/255, so each 2×2 pool cell
    // of the 4×4 grid lies inside one quadrant and must equal its
    // gray level exactly (up to float cast)
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    def fill(x0: Int, y0: Int, g: Int): Unit =
      for (x <- x0 until x0 + 4; y <- y0 until y0 + 4)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
    fill(0, 0, 0); fill(4, 0, 255); fill(0, 4, 51); fill(4, 4, 102)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val bytes = bos.toByteArray

    val got = Multimodal.Codec.imageFeatures(bytes, 4).get.toSeq
    val q = Seq(0.0, 255.0, 51.0, 102.0).map(g => (g / 255.0).toFloat)
    val expect = Seq(q(0), q(0), q(1), q(1), q(0), q(0), q(1), q(1),
                     q(2), q(2), q(3), q(3), q(2), q(2), q(3), q(3))
    got.zip(expect).foreach { case (a, e) => assert(math.abs(a - e) < 1e-6f) }

    // through the operator: image payload real + flagged; junk stub
    val media = Seq((1L, "image", bytes),
        (2L, "image", "junk".getBytes("UTF-8")),
        (3L, "audio", bytes)) // right bytes, wrong modality: stub
      .toDF("doc_id", "kind", "payload")
    val out = Multimodal.featureExtractPayloads(media, dim = 16)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("is_real"))
    assert(out(0).getAs[Seq[Float]]("embedding") === expect)
    assert(!out(1).getAs[Boolean]("is_real"))
    assert(!out(2).getAs[Boolean]("is_real"))
    assert(out.forall(_.getAs[Seq[Float]]("embedding").size === 16))
  }

  test("G3 refuses decompression bombs and non-square dims onto the stub path") {
    // same 10-gigapixel IHDR craft as the resize bomb test
    def be(i: Int): Array[Byte] =
      Array(((i >> 24) & 0xff).toByte, ((i >> 16) & 0xff).toByte,
        ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdrData = be(100000) ++ be(100000) ++ Array[Byte](8, 2, 0, 0, 0)
    val crc = new java.util.zip.CRC32()
    crc.update("IHDR".getBytes("US-ASCII")); crc.update(ihdrData)
    val bomb = sig ++ be(13) ++ "IHDR".getBytes("US-ASCII") ++
      ihdrData ++ be(crc.getValue.toInt)
    assert(Multimodal.Codec.imageFeatures(bomb, 4).isEmpty)

    // dim=12 has no integer grid — a real image still lands on the
    // stub (flagged), never a mis-sized vector
    val small = png(10, 10)
    val media = Seq((1L, "image", small)).toDF("doc_id", "kind", "payload")
    val out = Multimodal.featureExtractPayloads(media, dim = 12).collect().head
    assert(!out.getAs[Boolean]("is_real"))
    assert(out.getAs[Seq[Float]]("embedding").size === 12)
  }

  test("payloads imageio doesn't recognize keep the deterministic stub") {
    val junk = "definitely not an image stream".getBytes("UTF-8")
    val media = Seq((7L, "image", junk)).toDF("doc_id", "kind", "payload")
    val out = Multimodal.decodeMetaPayloads(media).collect().head
    assert(out.getAs[Int]("n_bytes") === junk.length)
    assert(out.getAs[Int]("width") >= 64) // stub dimension range
    assert(Multimodal.Codec.imageSize(junk).isEmpty)
  }

  // ---- the REAL audio path (javax.sound.sampled, WAV/PCM) ----------

  /** Canonical 16-bit little-endian PCM WAV from raw shorts. */
  private def wav(rate: Float, samples: Array[Short],
                  channels: Int = 1): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED, rate, 16,
      channels, 2 * channels, rate, false)
    val data = new Array[Byte](2 * samples.length)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(data), fmt, samples.length / channels)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("G1 decodes real WAV bytes: true rate/channels/duration, header-only") {
    val mono = wav(8000f, new Array[Short](16000))           // 2 s mono
    val stereo = wav(44100f, new Array[Short](44100 * 2), 2) // 1 s stereo
    val junk = "not audio".getBytes("UTF-8")
    val media = Seq((1L, "audio", mono), (2L, "audio", stereo),
        (3L, "audio", junk))
      .toDF("doc_id", "kind", "payload")
    val out = Multimodal.decodeMetaPayloads(media).orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("sample_rate") === 8000)
    assert(out(0).getAs[Int]("channels") === 1)
    assert(out(0).getAs[Int]("frames") === 16000)
    assert(out(0).getAs[Double]("duration_s") === 2.0)
    assert(out(0).getAs[Boolean]("is_real"))
    assert(out(1).getAs[Int]("sample_rate") === 44100)
    assert(out(1).getAs[Int]("channels") === 2)
    assert(out(1).getAs[Double]("duration_s") === 1.0)
    assert(out(1).getAs[Boolean]("is_real"))
    // unrecognized bytes keep the declared stub
    assert(!out(2).getAs[Boolean]("is_real"))
    assert(out(2).getAs[Int]("sample_rate") === 0)
  }

  test("G3 extracts hand-computable RMS/zero-crossing features from real WAV") {
    // two 4-sample windows at dim=4: [±0.5 alternating] → rms .5,
    // zcr 3/3 = 1; [0.25 constant] → rms .25, zcr 0. The shorts are
    // exact powers of two, so 16-bit quantization is lossless
    val samples = Array[Short](16384, -16384, 16384, -16384,
      8192, 8192, 8192, 8192)
    val media = Seq((1L, "audio", wav(8000f, samples)))
      .toDF("doc_id", "kind", "payload")
    val out = Multimodal.featureExtractPayloads(media, dim = 4).collect().head
    assert(out.getAs[Boolean]("is_real"))
    // collection.Seq: Spark hands array columns back as mutable
    // ArraySeq — an immutable-Seq ascription CCEs at the assignment
    val v = out.getAs[scala.collection.Seq[Float]]("embedding")
    assert(v.size === 4)
    assert(math.abs(v(0) - 0.5f) < 1e-6f, s"rms window 0: ${v(0)}")
    assert(v(1) === 1.0f, s"zcr window 0: ${v(1)}")
    assert(math.abs(v(2) - 0.25f) < 1e-6f, s"rms window 1: ${v(2)}")
    assert(v(3) === 0.0f, s"zcr window 1: ${v(3)}")
    // stereo channel-averaging: L/R cancel to silence → rms 0
    val quiet = Multimodal.Codec.audioFeatures(
      wav(8000f, Array[Short](16384, -16384, 16384, -16384), 2), 2).get
    assert(math.abs(quiet(0)) < 1e-6f, s"cancelled stereo rms: ${quiet(0)}")
    // odd dim can't hold (rms, zcr) pairs → stub, flagged
    val odd = Multimodal.featureExtractPayloads(media, dim = 5).collect().head
    assert(!odd.getAs[Boolean]("is_real"))
    assert(odd.getAs[Seq[Float]]("embedding").size === 5)
  }

  test("audio bombs and corrupt streams are refused before the decode loop") {
    // hand-built RIFF/WAVE header declaring ~1 G frames in a 44-byte
    // payload: the header probe may report it, but the feature path
    // must refuse (None → stub) rather than spin the decode loop
    def le(i: Int): Array[Byte] =
      Array((i & 0xff).toByte, ((i >> 8) & 0xff).toByte,
        ((i >> 16) & 0xff).toByte, ((i >> 24) & 0xff).toByte)
    def le16(i: Int): Array[Byte] =
      Array((i & 0xff).toByte, ((i >> 8) & 0xff).toByte)
    val bomb = "RIFF".getBytes("US-ASCII") ++ le(0x7ffffff0) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le(16) ++ le16(1) ++ le16(1) ++
      le(48000) ++ le(96000) ++ le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le(0x7fffff00)
    assert(Multimodal.Codec.audioFeatures(bomb, 4).isEmpty,
      "declared ~1G-frame stream must be refused")
    // truncated real WAV (header promises more data than exists):
    // trailing windows are empty → 0f, flagged real, never a crash
    val full = wav(8000f, Array.fill[Short](1000)(8192))
    val truncated = full.take(full.length - 1500)
    val f = Multimodal.Codec.audioFeatures(truncated, 4)
    assert(f.isDefined)
    assert(math.abs(f.get(0) - 0.25f) < 1e-6f) // window 0 has data
    assert(f.get(2) === 0.0f)                  // window 1 starved
    // corrupt body bytes after a valid-ish prefix: stub, no crash
    val corrupt = full.take(20) ++ Array.fill[Byte](10)(0x41)
    val media = Seq((9L, "audio", corrupt)).toDF("doc_id", "kind", "payload")
    assert(!Multimodal.decodeMetaPayloads(media).collect().head
      .getAs[Boolean]("is_real"))
  }
}
