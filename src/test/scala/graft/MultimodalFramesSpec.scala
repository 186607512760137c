package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
import javax.imageio.metadata.IIOMetadataNode

import graft.operators.Multimodal

/** The REAL G2 motion path: animated GIFs written by the JDK's own
  * sequence writer go through frame probe + sampling end-to-end —
  * true frame counts, composited per-frame pixels (GIF89a offsets and
  * disposal), timestamps from the stream's own delays — while
  * non-animated payloads keep the declared stub. */
class MultimodalFramesSpec extends SparkSpec {
  import spark.implicits._

  /** (img, delayCs, (x, y), disposalMethod) per frame → GIF bytes. */
  private def animatedGif(
      frames: Seq[(BufferedImage, Int, (Int, Int), String)]): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { case (img, delayCs, (x, y), disposal) =>
        val p = writer.getDefaultWriteParam
        val meta = writer.getDefaultImageMetadata(new ImageTypeSpecifier(img), p)
        val fmt = meta.getNativeMetadataFormatName
        val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
        def node(name: String): IIOMetadataNode = {
          var c = root.getFirstChild
          while (c != null && c.getNodeName != name) c = c.getNextSibling
          if (c != null) c.asInstanceOf[IIOMetadataNode]
          else { val n = new IIOMetadataNode(name); root.appendChild(n); n }
        }
        val gce = node("GraphicControlExtension")
        gce.setAttribute("disposalMethod", disposal)
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("transparentColorIndex", "0")
        gce.setAttribute("delayTime", delayCs.toString)
        val desc = node("ImageDescriptor")
        desc.setAttribute("imageLeftPosition", x.toString)
        desc.setAttribute("imageTopPosition", y.toString)
        desc.setAttribute("imageWidth", img.getWidth.toString)
        desc.setAttribute("imageHeight", img.getHeight.toString)
        desc.setAttribute("interlaceFlag", "FALSE")
        meta.setFromTree(fmt, root)
        writer.writeToSequence(new IIOImage(img, null, meta), p)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  private def solid(w: Int, h: Int, rgb: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
    img
  }

  private val RED = 0xFF0000
  private val GREEN = 0x00FF00
  private val BLUE = 0x0000FF

  test("G1 reports REAL frame counts for animated-GIF video payloads") {
    val gif = animatedGif((0 until 5).map(i =>
      (solid(12, 10, RED + i), 10, (0, 0), "none")))
    assert(Multimodal.Codec.frameProbe(gif) === Some((12, 10, 5)))
    val media = Seq((1L, "video", gif),
        (2L, "video", "mpeg? not here".getBytes("UTF-8")))
      .toDF("doc_id", "kind", "payload")
    val out = Multimodal.decodeMetaPayloads(media).orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("frames") === 5)
    assert(out(0).getAs[Int]("width") === 12 && out(0).getAs[Int]("height") === 10)
    // non-GIF "video" keeps the declared stub
    assert(out(1).getAs[Int]("n_bytes") === 14)
  }

  test("G2 extracts composited frames with timestamps from the stream's own delays") {
    // 7 solid full-canvas frames, 25 cs each; step=3 samples 0, 3, 6
    val colors = Seq(RED, GREEN, BLUE, 0x808080, 0xFFFF00, 0x00FFFF, 0xFF00FF)
    val gif = animatedGif(colors.map(c => (solid(12, 10, c), 25, (0, 0), "none")))
    val media = Seq((7L, "video", gif)).toDF("doc_id", "kind", "payload")
    val rows = Multimodal.frameSamplePayloads(media, step = 3, fps = 24.0)
      .orderBy("frame_idx").collect()
    assert(rows.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 3, 6))
    assert(rows.forall(_.getAs[Int]("frames") === 7))
    assert(rows.forall(_.getAs[Boolean]("is_real")))
    // t of frame i = cumulative delay of frames 0..i-1 (GIF cs→s)
    assert(rows.map(_.getAs[Double]("t_offset_s")).toSeq === Seq(0.0, 0.75, 1.5))
    rows.zip(Seq(RED, 0x808080, 0xFF00FF)).foreach { case (r, expect) =>
      val img = ImageIO.read(
        new ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      assert(img.getWidth === 12 && img.getHeight === 10)
      assert((img.getRGB(6, 5) & 0xFFFFFF) === expect,
        s"frame ${r.getAs[Int]("frame_idx")} center pixel")
    }
  }

  test("G2 composites sub-rect frames and honors restoreToBackgroundColor") {
    // frame 0: full red canvas; frame 1: 4x3 blue patch at (5,4) whose
    // disposal clears its rect; frame 2: 1x1 green at (0,0).
    val gif = animatedGif(Seq(
      (solid(12, 10, RED), 10, (0, 0), "none"),
      (solid(4, 3, BLUE), 10, (5, 4), "restoreToBackgroundColor"),
      (solid(1, 1, GREEN), 10, (0, 0), "none")))
    val media = Seq((3L, "video", gif)).toDF("doc_id", "kind", "payload")
    val rows = Multimodal.frameSamplePayloads(media, step = 1)
      .orderBy("frame_idx").collect()
    assert(rows.length === 3)
    val at1 = ImageIO.read(
      new ByteArrayInputStream(rows(1).getAs[Array[Byte]]("payload")))
    assert((at1.getRGB(6, 5) & 0xFFFFFF) === BLUE)   // patch drew over red
    assert((at1.getRGB(1, 1) & 0xFFFFFF) === RED)    // outside the patch
    val at2 = ImageIO.read(
      new ByteArrayInputStream(rows(2).getAs[Array[Byte]]("payload")))
    assert((at2.getRGB(0, 0) & 0xFFFFFF) === GREEN)  // frame 2's pixel
    assert((at2.getRGB(1, 1) & 0xFFFFFF) === RED)    // untouched canvas
    assert((at2.getRGB(6, 5) >>> 24) === 0,          // cleared rect:
      "disposed patch rect must be transparent")     // alpha 0
  }

  test("G2 falls back to idx/fps when the stream carries no timing") {
    val gif = animatedGif((0 until 4).map(i =>
      (solid(8, 8, RED + i), 0, (0, 0), "none")))
    val media = Seq((4L, "video", gif)).toDF("doc_id", "kind", "payload")
    val rows = Multimodal.frameSamplePayloads(media, step = 2, fps = 10.0)
      .orderBy("frame_idx").collect()
    assert(rows.map(_.getAs[Double]("t_offset_s")).toSeq === Seq(0.0, 0.2))
  }

  private def jpeg(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos); bos.toByteArray
  }
  private def le32(v: Long): Array[Byte] = Array((v & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 24) & 0xff).toByte)
  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad: Array[Byte] =
      if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
    id.getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body ++ pad
  }
  private def riffList(kind: String, body: Array[Byte]): Array[Byte] =
    riffChunk("LIST", kind.getBytes("US-ASCII") ++ body)

  /** Wrap pre-encoded frame chunk bodies in a minimal MJPEG AVI
    * (RIFF → LIST hdrl(avih) → LIST movi(00dc …)) — the layout ffmpeg
    * writes, reduced to the chunks the reader contract requires. */
  private def aviOf(frameBodies: Seq[Array[Byte]], w: Int, h: Int,
                    usPerFrame: Long): Array[Byte] = {
    val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frameBodies.length.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w.toLong) ++ le32(h.toLong) ++ Array.fill[Byte](16)(0)
    val hdrl = riffList("hdrl", riffChunk("avih", avih))
    val movi = riffList("movi",
      frameBodies.toArray.flatMap(b => riffChunk("00dc", b)))
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(payload.length.toLong) ++ payload
  }

  /** JPEG-encode frames and wrap them ([[aviOf]]). */
  private def mjpegAvi(frames: Seq[BufferedImage],
                       usPerFrame: Long): Array[Byte] =
    aviOf(frames.map(jpeg), frames.head.getWidth, frames.head.getHeight,
      usPerFrame)

  test("G1/G2 MJPEG AVI takes the REAL path: probe, per-frame JPEGs, avih clock") {
    val colors = Seq(RED, GREEN, BLUE, 0x808080, 0xFFFF00)
    val avi = mjpegAvi(colors.map(solid(16, 12, _)), usPerFrame = 40000L)
    assert(Multimodal.Codec.frameProbe(avi) === Some((16, 12, 5)))

    val media = Seq((11L, "video", avi)).toDF("doc_id", "kind", "payload")
    val rows = Multimodal.frameSamplePayloads(media, step = 2, fps = 99.0)
      .orderBy("frame_idx").collect()
    assert(rows.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 2, 4))
    assert(rows.forall(_.getAs[Boolean]("is_real")))
    assert(rows.forall(_.getAs[Int]("frames") === 5))
    // the avih µs/frame clock wins over the fallback fps
    assert(rows.map(_.getAs[Double]("t_offset_s")).toSeq === Seq(0.0, 0.08, 0.16))
    rows.zip(Seq(RED, BLUE, 0xFFFF00)).foreach { case (r, expect) =>
      val img = ImageIO.read(
        new ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      assert(img.getWidth === 16 && img.getHeight === 12)
      val got = img.getRGB(8, 6)
      def ch(v: Int, s: Int) = (v >> s) & 0xff
      // JPEG is lossy: solid colors come back within a few counts
      Seq(16, 8, 0).foreach(s =>
        assert(math.abs(ch(got, s) - ch(expect, s)) <= 32,
          f"frame ${r.getAs[Int]("frame_idx")} channel>>$s: got $got%06x"))
    }
    // G1 metadata flows through the same probe
    val meta = Multimodal.decodeMetaPayloads(media).collect()(0)
    assert(meta.getAs[Int]("frames") === 5 && meta.getAs[Boolean]("is_real"))
  }

  test("AVI with a non-JPEG codec or hostile sizes keeps the stub, never crashes") {
    // same container, but the frame chunks hold an H.264-ish bitstream
    // the JDK cannot decode → recognized AVI, refused payload, stub row
    val real = mjpegAvi(Seq(solid(8, 8, RED)), 40000L)
    val h264ish =
      aviOf(Seq(Array[Byte](0, 0, 0, 1, 0x67, 0x42, 0, 30)), 8, 8, 40000L)
    // declared chunk size far past the payload end: the walk stops at
    // the bounds check and the bytes read as not-AVI (no frames)
    val hostile = {
      val body = "AVI ".getBytes("US-ASCII") ++
        "00dc".getBytes("US-ASCII") ++ le32(0x7fffffffL) ++ Array[Byte](1, 2)
      "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
    }
    // a hostile avih declaring unsigned-overflow dims (0xFFFFFFFF):
    // the probe must not surface negative "real" dimensions — it
    // falls back to the first frame's own JPEG header dims
    val overflowDims = {
      val good = mjpegAvi(Seq(solid(8, 8, RED)), 40000L)
      // patch dwWidth/dwHeight inside avih: RIFF(12) LIST hdr(12) avih hdr(8) + 32
      val patched = good.clone()
      val dimsOff = 12 + 12 + 8 + 32
      Array.copy(Array.fill[Byte](8)(0xff.toByte), 0, patched, dimsOff, 8)
      patched
    }
    // G1 and G2 agree on every verdict: the probe sniffs each frame
    // chunk for the JPEG SOI marker
    assert(Multimodal.Codec.frameProbe(h264ish) === None)
    assert(Multimodal.Codec.frameProbe(hostile) === None)
    assert(Multimodal.Codec.frameProbe(overflowDims) === Some((8, 8, 1)))
    val media = Seq((1L, "video", real), (2L, "video", h264ish),
        (3L, "video", hostile))
      .toDF("doc_id", "kind", "payload")
    val rows = Multimodal.frameSamplePayloads(media, step = 30, fps = 24.0)
      .collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc(1L).forall(_.getAs[Boolean]("is_real")))
    assert(byDoc(2L).forall(!_.getAs[Boolean]("is_real")))
    assert(byDoc(3L).forall(!_.getAs[Boolean]("is_real")))
  }

  test("a zero-length drop-frame chunk keeps its slot but never bombs the stream") {
    // frame 0 dropped (standard capture-tool encoding), frames 1-2 real
    val avi = aviOf(Seq(Array.emptyByteArray, jpeg(solid(8, 8, GREEN)),
      jpeg(solid(8, 8, BLUE))), 8, 8, 100000L)
    assert(Multimodal.Codec.frameProbe(avi) === Some((8, 8, 3)))
    val media = Seq((5L, "video", avi)).toDF("doc_id", "kind", "payload")
    val rows = Multimodal.frameSamplePayloads(media, step = 1, fps = 24.0)
      .orderBy("frame_idx").collect()
    // the dropped slot emits no pixels but frames 1-2 stay REAL and
    // keep their stream positions + avih-clock offsets
    assert(rows.map(_.getAs[Int]("frame_idx")).toSeq === Seq(1, 2))
    assert(rows.forall(_.getAs[Boolean]("is_real")))
    assert(rows.forall(_.getAs[Int]("frames") === 3))
    assert(rows.map(_.getAs[Double]("t_offset_s")).toSeq === Seq(0.1, 0.2))
  }

  test("non-animated video payloads keep the stub path, nulls never NPE") {
    val junk = "h264 bitstreams have no JDK codec".getBytes("UTF-8")
    val media = Seq((1L, "video", junk), (2L, "video", null: Array[Byte]),
        (3L, "image", junk)) // wrong modality: filtered out entirely
      .toDF("doc_id", "kind", "payload")
    val rows = Multimodal.frameSamplePayloads(media, step = 30, fps = 24.0)
      .collect()
    assert(rows.forall(!_.getAs[Boolean]("is_real")))
    assert(rows.forall(_.getAs[Array[Byte]]("payload") == null))
    assert(rows.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 2L))
    // stub rows mirror the metadata-only sampler exactly (same stub
    // frame counts, same every-step indices, same idx/fps offsets)
    val viaMeta = Multimodal.frameSample(
      Multimodal.decodeMetaPayloads(media), step = 30, fps = 24.0)
      .select("doc_id", "frame_idx", "t_offset_s").orderBy("doc_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    val viaPayload = rows.map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Int]("frame_idx"), r.getAs[Double]("t_offset_s")))
      .sorted.toSeq
    assert(viaPayload === viaMeta)
  }

  test("a frame bomb (small canvas, huge declared frame rect) is refused before decode") {
    // logical screen 12x10 passes the canvas check, but the single
    // frame's ImageDescriptor declares 30000x30000 (900 Mpx — over
    // maxDecodePixels yet under Int.MaxValue, so the reader itself
    // would happily allocate the ~900 MB raster): the per-frame check
    // must refuse BEFORE r.read
    def le(i: Int): Array[Byte] = Array((i & 0xff).toByte, ((i >> 8) & 0xff).toByte)
    val bomb = "GIF89a".getBytes("US-ASCII") ++
      le(12) ++ le(10) ++ Array[Byte](0x00, 0, 0) ++
      Array(0x2C.toByte) ++ le(0) ++ le(0) ++ le(30000) ++ le(30000) ++
      Array(0x80.toByte) ++
      Array[Byte](0, 0, 0, -1, -1, -1) ++
      Array[Byte](2, 2, 0x44, 0x01, 0) ++
      Array(0x3B.toByte)
    assert(Multimodal.Codec.frameProbe(bomb) === Some((12, 10, 1)))
    assert(Multimodal.Codec.sampleFrames(bomb, 1, 24.0).isEmpty)
  }

  test("a canvas bomb (65535x65535 logical screen) is refused before allocation") {
    // hand-built minimal GIF: 6-byte header, LSD declaring 65535x65535
    // (4.3 Gpx > maxDecodePixels), one 1x1 frame with a 2-color local
    // table — the frame probe reports the declared dims, sampling
    // refuses rather than allocating a ~17 GiB canvas
    def le(i: Int): Array[Byte] = Array((i & 0xff).toByte, ((i >> 8) & 0xff).toByte)
    val bomb = "GIF89a".getBytes("US-ASCII") ++
      le(65535) ++ le(65535) ++ Array[Byte](0x00, 0, 0) ++      // LSD, no GCT
      Array(0x2C.toByte) ++ le(0) ++ le(0) ++ le(1) ++ le(1) ++ // img desc 1x1
      Array(0x80.toByte) ++                                     // LCT, 2 colors
      Array[Byte](0, 0, 0, -1, -1, -1) ++                       // the table
      Array[Byte](2, 2, 0x44, 0x01, 0) ++                       // LZW: 1 pixel
      Array(0x3B.toByte)                                        // trailer
    assert(Multimodal.Codec.frameProbe(bomb) === Some((65535, 65535, 1)))
    assert(Multimodal.Codec.sampleFrames(bomb, 1, 24.0).isEmpty)
    val media = Seq((9L, "video", bomb)).toDF("doc_id", "kind", "payload")
    val rows = Multimodal.frameSamplePayloads(media, step = 1).collect()
    assert(rows.nonEmpty && rows.forall(!_.getAs[Boolean]("is_real")))
  }
}
