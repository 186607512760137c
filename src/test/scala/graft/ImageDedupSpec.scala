package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/** D12/D13/G5: image dedup — the REAL dHash codec path on crafted
  * pixels, the rendered-PNG media frame's injectivity contract (what
  * lets D12's DuckDB mirror compare texts instead of pixels), and the
  * banded-hamming pair operators' containment + perceptual-recall
  * properties. */
class ImageDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Horizontal grayscale gradient: column x at level `lo + x·step`
    * (strictly monotone along x when step ≠ 0). */
  private def gradient(w: Int, h: Int, lo: Int, step: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) {
      val v = lo + x * step
      val p = (v << 16) | (v << 8) | v
      var y = 0
      while (y < h) { img.setRGB(x, y, p); y += 1 }
      x += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dHash: rising gradient sets all 64 bits, falling none — hamming 64 apart") {
    val up = Multimodal.Codec.dHash(gradient(63, 56, 0, 4))
    val down = Multimodal.Codec.dHash(gradient(63, 56, 252, -4))
    assert(up === Some(-1L))  // every cell(x+1) > cell(x): all bits set
    assert(down === Some(0L)) // strictly falling: no bit set
    assert(hamming(up.get, down.get) === 64)
    // not an image at all → None (stub path upstream)
    assert(Multimodal.Codec.dHash("just text".getBytes("UTF-8")) === None)
  }

  test("dHash survives rescale + re-encode — the property byte equality lacks") {
    val a = gradient(64, 64, 0, 3)
    val b = Multimodal.Codec.resizeImage(a, 32, 32).get
    assert(!java.util.Arrays.equals(a, b)) // bytes differ...
    val (ha, hb) = (Multimodal.Codec.dHash(a).get, Multimodal.Codec.dHash(b).get)
    assert(hamming(ha, hb) <= 3)           // ...the perceptual hash doesn't
  }

  test("G5 imagePhash: real for decodable pixels, deterministic stub for garbage; byte-identical payloads share a hash on BOTH paths") {
    val img = gradient(40, 30, 10, 5)
    val junk = "no codec recognizes this".getBytes("UTF-8")
    val media = Seq((1L, "image", img), (2L, "image", img),
        (3L, "image", junk), (4L, "image", junk), (5L, "audio", img))
      .toDF("doc_id", "kind", "payload")
    val out = Multimodal.imagePhash(media).orderBy("doc_id").collect()
    assert(out.length === 4) // audio-kind rows are not phashed
    assert(out(0).getAs[Boolean]("is_real") && out(1).getAs[Boolean]("is_real"))
    assert(out(0).getAs[Long]("phash") === out(1).getAs[Long]("phash"))
    assert(!out(2).getAs[Boolean]("is_real") && !out(3).getAs[Boolean]("is_real"))
    assert(out(2).getAs[Long]("phash") === out(3).getAs[Long]("phash"))
  }

  test("renderTextImages: deterministic, injective on distinct texts, decodable 16-wide PNGs, null text renders") {
    val docs = Seq((0L, "alpha beta"), (3L, "alpha beta"), (6L, "alpha betb"),
        (9L, "x" * 40), (12L, null.asInstanceOf[String]), (7L, "not image kind"))
      .toDF("doc_id", "text")
    val out = Multimodal.renderTextImages(docs).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 3L, 6L, 9L, 12L)) // pmod 3 filter
    val p = out.map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    assert(java.util.Arrays.equals(p(0L), p(3L)))  // identical text → identical bytes
    assert(!java.util.Arrays.equals(p(0L), p(6L))) // one char off → different bytes
    assert(Multimodal.Codec.imageSize(p(9L)) === Some((16, 3)))  // ⌈40/16⌉ rows
    assert(Multimodal.Codec.imageSize(p(12L)) === Some((16, 1))) // null → one black row
  }

  test("renderText* CHECKS the NUL-free injectivity precondition (fails loudly, never silently collides)") {
    // "a\u0000" would raster byte-identical to "a" (zero-padded tail)
    // while the exact mirrors compare raw texts — the render must
    // refuse such a corpus instead of silently diverging
    val nul = Seq((0L, "a\u0000b"), (2L, "c\u0000")).toDF("doc_id", "text")
    val eImg = intercept[org.apache.spark.SparkException] {
      Multimodal.renderTextImages(nul).collect()
    }
    assert(eImg.getMessage.contains("NUL") ||
      Option(eImg.getCause).exists(_.getMessage.contains("NUL")))
    val eVid = intercept[org.apache.spark.SparkException] {
      Multimodal.renderTextVideo(nul).collect()
    }
    assert(eVid.getMessage.contains("NUL") ||
      Option(eVid.getCause).exists(_.getMessage.contains("NUL")))
    // audio needs no check: the WAV length header makes it injective
    // on ALL texts, NULs included
    val wav = Multimodal.renderTextAudio(Seq((1L, "a\u0000"), (4L, "a"))
        .toDF("doc_id", "text")).orderBy("doc_id").collect()
    assert(!java.util.Arrays.equals(wav(0).getAs[Array[Byte]]("payload"),
      wav(1).getAs[Array[Byte]]("payload")))
  }

  /** The catalog's planted-duplicate construction (the corpus ships no
    * byte-identical texts): every 5th doc replicated at +30,000,000 —
    * the offset keeps each replica in its source's modality stratum. */
  private def withReplicas(docs: org.apache.spark.sql.DataFrame) =
    docs.unionByName(docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .withColumn("doc_id", col("doc_id") + lit(30000000L)))

  test("D12 imageExactPairs over rendered docs ≡ text-equality pairs (the mirror's contract)") {
    val docs = withReplicas(Tables.documents(spark, sfDir))
    val got = Dedup.imageExactPairs(Multimodal.renderTextImages(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val img = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("t"))
    val expected = img.as("a").join(img.as("b"),
        col("a.t") === col("b.t") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected && got.nonEmpty)
    // exactly the planted (d, d+30M) pairs — nothing natural exists
    assert(got.forall { case (a, b) => b === a + 30000000L })
  }

  test("D13 imagePhashPairs: contains every exact pair at hamming 0, and catches the rescaled copy D12 misses") {
    // containment on the verify corpus (the catalog recall gate's claim)
    val docs = withReplicas(Tables.documents(spark, sfDir).filter(col("doc_id") < 300))
    val media = Multimodal.renderTextImages(docs)
    val exact = Dedup.imageExactPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val phash = Dedup.imagePhashPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toList
    val pairs = phash.map(t => (t._1, t._2)).toSet
    assert(exact.subsetOf(pairs) && exact.nonEmpty)
    assert(phash.filter(t => exact((t._1, t._2))).forall(_._3 === 0))
    // the perceptual win: a rescaled re-encode pairs with its original
    val a = gradient(64, 64, 0, 3)
    val b = Multimodal.Codec.resizeImage(a, 32, 32).get
    val c = gradient(64, 64, 252, -3)
    val crafted = Seq((1L, "image", a), (2L, "image", b), (3L, "image", c))
      .toDF("doc_id", "kind", "payload")
    assert(Dedup.imageExactPairs(crafted).count() === 0)
    val soft = Dedup.imagePhashPairs(crafted)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(soft.contains((1L, 2L)) && !soft.contains((1L, 3L)) &&
      !soft.contains((2L, 3L)))
  }

  /** 16-bit PCM mono WAV from raw samples (little-endian RIFF). */
  private def wav16(rate: Int, samples: Array[Short]): Array[Byte] = {
    val n = samples.length * 2
    val bos = new ByteArrayOutputStream(44 + n)
    def ascii(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff) }
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    ascii("RIFF"); le32(36 + n); ascii("WAVE")
    ascii("fmt "); le32(16); le16(1); le16(1)
    le32(rate); le32(rate * 2); le16(2); le16(16)
    ascii("data"); le32(n)
    samples.foreach(s => le16(s & 0xffff))
    bos.toByteArray
  }

  test("D14 audio: envelope dHash survives resampling; render is injective; exact ≡ text equality; phash ⊇ exact") {
    // codec: a rising-amplitude tone has a rising envelope at ANY rate
    def ramp(rate: Int): Array[Byte] = {
      val n = (rate * 0.8125).toInt // 65 windows × ≥100 samples each
      wav16(rate, Array.tabulate[Short](n)(i =>
        (math.sin(2 * math.Pi * 440 * i / rate) * 30000.0 * (i + 1) / n).toShort))
    }
    val (h8, h16) = (Multimodal.Codec.audioPhash(ramp(8000)).get,
      Multimodal.Codec.audioPhash(ramp(16000)).get)
    assert(hamming(h8, h16) <= 3)  // resample + re-encode tolerant
    assert(Multimodal.Codec.audioPhash("not audio".getBytes("UTF-8")) === None)

    // render: audio-kind stratum only, decodable 8 kHz WAV, injective
    val small = Seq((1L, "abc"), (4L, "abc"), (7L, "abd"), (3L, "image kind"))
      .toDF("doc_id", "text")
    val r = Multimodal.renderTextAudio(small).orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 4L, 7L))
    val p = r.map(x => x.getLong(0) -> x.getAs[Array[Byte]]("payload")).toMap
    assert(java.util.Arrays.equals(p(1L), p(4L)))
    assert(!java.util.Arrays.equals(p(1L), p(7L)))
    assert(Multimodal.Codec.audioMeta(p(1L)) === Some((8000, 1, 3L)))

    // gate contracts on the verify corpus + planted replicas
    val media = Multimodal.renderTextAudio(
      withReplicas(Tables.documents(spark, sfDir).filter(col("doc_id") < 300)))
    val exact = Dedup.audioExactPairs(media)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(exact.nonEmpty && exact.forall { case (a, b) => b === a + 30000000L })
    val soft = Dedup.audioPhashPairs(media)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(exact.subsetOf(soft))
  }

  test("D15 video: rendered GIFs decode frame-exact; frame hashes pair exact dups and a shared-prefix copy; exact ⊆ phash") {
    val base = Seq((2L, "ab" * 200), (5L, "ab" * 200), (8L, "zq" * 80),
        (11L, null.asInstanceOf[String]), (1L, "not video kind"))
      .toDF("doc_id", "text")
    val media = Multimodal.renderTextVideo(base)
    val r = media.orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(2L, 5L, 8L, 11L)) // pmod 3 = 2
    val p = r.map(x => x.getLong(0) -> x.getAs[Array[Byte]]("payload")).toMap
    assert(Multimodal.Codec.frameProbe(p(2L)) === Some((16, 16, 2))) // 400 B → 2 frames
    assert(Multimodal.Codec.frameProbe(p(11L)) === Some((16, 16, 1))) // null → 1 black
    assert(java.util.Arrays.equals(p(2L), p(5L)))   // identical text → identical GIF
    assert(!java.util.Arrays.equals(p(2L), p(8L)))

    val fh = Multimodal.videoPhash(media).collect()
    assert(fh.forall(_.getAs[Boolean]("is_real"))) // every frame takes the decode path
    assert(fh.count(_.getLong(0) === 2L) === 2)    // one hash row per frame

    val pairs = Dedup.videoPhashPairs(media).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(pairs.contains((2L, 5L, 2L))) // identical videos share BOTH frames

    // a shared-prefix copy ("ab"×128 = exactly doc 2's first chunk)
    // pairs on the one frame it kept — what byte equality can't see
    val withTrim = base.unionByName(Seq((14L, "ab" * 128)).toDF("doc_id", "text"))
    val trimmed = Dedup.videoPhashPairs(Multimodal.renderTextVideo(withTrim))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(trimmed.contains((2L, 14L)) && trimmed.contains((5L, 14L)))

    // containment on the verify corpus + planted replicas
    val gate = Multimodal.renderTextVideo(
      withReplicas(Tables.documents(spark, sfDir).filter(col("doc_id") < 300)))
    val exact = Dedup.videoExactPairs(gate).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val soft = Dedup.videoPhashPairs(gate).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(exact.nonEmpty && exact.forall { case (a, b) => b === a + 30000000L })
    assert(exact.subsetOf(soft))
  }

  test("D13 star-collapse: a mega bucket of identical images emits O(size) hub spokes, not size²") {
    // 40 byte-identical payloads: one 40-member bucket in EVERY band
    // (the boilerplate-image posture — thumbnails, logos, tracking
    // pixels repeated wholesale across a crawl)
    val img = gradient(40, 30, 5, 6)
    val media = (1L to 40L).map(i => (i, "image", img))
      .toDF("doc_id", "kind", "payload")
    val pairs = Dedup.imagePhashPairs(media, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the hub (min id) pairs each member once — connectivity survives
    // for transitive clustering, the size² enumeration is given up
    assert(pairs === (2L to 40L).map(j => (1L, j)).toSet)
  }

  test("D13 deploy table: phashFromTable ≡ imagePhashPairs, zero exchange on the bucket key") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ph").toString
    val media = Multimodal.renderTextImages(
      withReplicas(Tables.documents(spark, sfDir).filter(col("doc_id") < 300)))
    Dedup.writePhashTable(media, "ph_b", s"$wh/ph_b", buckets = 8)

    val fromTable = Dedup.phashFromTable(spark, "ph_b")
    val plan = fromTable.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(([a-z_#0-9]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(!exchanges.exists(_.startsWith("bucket")),
      s"bucket key should be co-located by bucketing, got exchanges on: $exchanges")

    val a = fromTable.orderBy("doc_a", "doc_b").collect().toSeq.map(_.toSeq)
    val b = Dedup.imagePhashPairs(media, maxBucket = Long.MaxValue)
      .orderBy("doc_a", "doc_b").collect().toSeq.map(_.toSeq)
    assert(a === b && a.nonEmpty)
    spark.sql("DROP TABLE IF EXISTS ph_b")
  }

  test("D13 arrival batch: verified pairs vs corpus + within batch; append replay-idempotent") {
    val wh = java.nio.file.Files.createTempDirectory("graft_phb").toString
    val a = gradient(64, 64, 0, 3)
    val c = gradient(64, 64, 252, -3)
    val corpus = Seq((1L, "image", a), (3L, "image", c))
      .toDF("doc_id", "kind", "payload")
    Dedup.writePhashTable(corpus, "ph_i", s"$wh/ph_i", buckets = 4)

    // batch: a rescaled re-encode of corpus doc 1 + two identical new docs
    val b = Multimodal.Codec.resizeImage(a, 32, 32).get
    val junk = "same undecodable payload".getBytes("UTF-8")
    val batch = Seq((10L, "image", b), (11L, "image", junk), (12L, "image", junk))
      .toDF("doc_id", "kind", "payload")
    val pairs = Dedup.phashBatch(spark, "ph_i", batch, ingestBatch = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 10L)))  // rescaled copy found vs corpus
    assert(pairs.contains((11L, 12L))) // within-batch stub-identical pair
    assert(!pairs.exists(p => p._1 === 3L || p._2 === 3L)) // reverse gradient unrelated
    val rowsAfterFirst = spark.table("ph_i").count()

    // replay the SAME ingest batch: identical pairs, no row growth
    val replay = Dedup.phashBatch(spark, "ph_i", batch, ingestBatch = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.refreshTable("ph_i")
    assert(replay === pairs)
    assert(spark.table("ph_i").count() === rowsAfterFirst)

    // a LATER batch pairs against batch-0 docs through the table
    val batch2 = Seq((20L, "image", junk)).toDF("doc_id", "kind", "payload")
    val p2 = Dedup.phashBatch(spark, "ph_i", batch2, ingestBatch = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p2 === Set((11L, 20L), (12L, 20L)))
    spark.sql("DROP TABLE IF EXISTS ph_i")
  }
}
