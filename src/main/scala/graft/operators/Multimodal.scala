package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (SURVEY.md §2 G).
  *
  * Media payloads are opaque `binary` columns + typed metadata — the
  * lakehouse-native layout for image/audio/video at 100 TB (payload
  * bytes travel inside parquet row groups; no tiny-file problem, and
  * column pruning means metadata-only queries never touch the bytes).
  *
  * Decoding runs batched inside `mapPartitions` over a typed Dataset —
  * the Scala analogue of a Pandas-batch UDF: the partition iterator is
  * chunked so a real codec would amortize per-batch setup (model load,
  * JNI handle) across [[Codec.batchSize]] payloads. The actual
  * image/audio codecs are NOT in this container, so [[Codec.decode]]
  * is a clearly-marked deterministic stub; everything around it —
  * schema, encoders, batching, partition flow — is the real plumbing
  * a production codec would drop into.
  */
object Multimodal {

  /** Typed decode result — the metadata face of an opaque payload. */
  final case class MediaMeta(doc_id: Long, kind: String, n_bytes: Int,
                             width: Int, height: Int, frames: Int)

  object Codec {
    val batchSize = 64

    /** STUB — deterministic fake decode. A real implementation would
      * hand the batch to an image/audio/video library here (the
      * integration point a production build replaces); those libs are
      * absent in this container, so metadata is derived purely from
      * the payload bytes (stable hash + length), keeping the operator
      * deterministic and testable.
      */
    def decode(batch: Seq[(Long, String, Array[Byte])]): Seq[MediaMeta] =
      batch.map { case (id, kind, bytes) =>
        val h = scala.util.hashing.MurmurHash3.bytesHash(bytes, 42)
        val w = 64 + math.floorMod(h, 1856)          // 64..1919
        val hgt = 64 + math.floorMod(h >> 11, 1016)  // 64..1079
        val frames = kind match {
          case "video" => 1 + math.floorMod(h >> 22, 240)
          case "audio" => 1 + math.floorMod(h >> 22, 48000)
          case _       => 1
        }
        MediaMeta(id, kind, bytes.length, w, hgt, frames)
      }
  }

  /** G2: frame sampling — every `step`-th frame index of each video
    * payload, exploded to one row per sampled frame with its timestamp
    * offset at `fps`. The Generate (explode) is a narrow op: frames
    * fan out inside the scan stage, no shuffle; a real pipeline hands
    * (doc_id, frame_idx) to the batched decoder for pixel extraction. */
  def frameSample(decoded: DataFrame, step: Int = 30, fps: Double = 24.0): DataFrame = {
    require(step > 0, s"step=$step must be positive (sequence would reject it " +
      "deep inside codegen otherwise)")
    require(fps > 0.0, s"fps=$fps must be positive")
    decoded.filter(col("kind") === "video")
      .select(col("doc_id"), col("frames"),
        explode(sequence(lit(0), col("frames") - 1, lit(step))).as("frame_idx"))
      .withColumn("t_offset_s", col("frame_idx") / lit(fps))
  }

  /** G3: feature extraction — payload bytes → fixed-width float
    * vector. The vector here is a deterministic hash projection (the
    * model inference is STUBBED like [[Codec.decode]] — no ML runtime
    * in this container); the Spark plumbing is the real part: binary
    * in, `array<float>` out, batched per partition, schema ready for
    * the E-block ANN operators. */
  def featureExtract(docs: DataFrame, dim: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      // plain per-element map: the hash projection has no per-batch
      // setup to amortize (unlike resize/decodeMeta, whose Codec.decode
      // genuinely runs once per batch) — a grouped() wrapper here only
      // implied batching that didn't exist
      .mapPartitions(_.map { case (id, bytes) =>
        // null payload (null text upstream) hashes as empty, never NPEs
        val b = if (bytes == null) Array.emptyByteArray else bytes
        val h0 = scala.util.hashing.MurmurHash3.bytesHash(b, 7)
        val v = Array.tabulate(dim) { d =>
          val h = scala.util.hashing.MurmurHash3.productHash((h0, d))
          (h.toFloat / Int.MaxValue.toFloat)
        }
        (id, v)
      })
      .toDF("doc_id", "embedding")
  }

  /** Typed resize result — dims + the (stub-)rescaled payload. */
  final case class Resized(doc_id: Long, src_w: Int, src_h: Int,
                           dst_w: Int, dst_h: Int, n_bytes: Int,
                           payload: Array[Byte])

  /** G4: resize — fit every image payload inside (maxW, maxH)
    * preserving aspect ratio, never upscaling. Decode and rescale run
    * in the SAME batched partition pass (the realistic layout: one
    * codec handle per batch does both), so the payload bytes are read
    * once. The pixel scaler is a STUB like [[Codec.decode]] (byte
    * subsample proportional to the area change — deterministic,
    * size-realistic); the schema, the fused decode+transform batch
    * pass, and the binary-in/binary-out flow are the production
    * plumbing. Narrow op: no shuffle, payload bytes never leave their
    * partition.
    */
  /** Shared payload prelude: modality tag + opaque binary payload —
    * ONE definition so decode and resize can never classify the same
    * doc differently. */
  private def payloads(docs: DataFrame): DataFrame =
    docs
      .withColumn("kind",
        // pmod, not %: a signed/hashed id domain makes doc_id % 3
        // zero or negative — element_at(0) throws, element_at(-1)
        // silently reads from the END (audio tagged as video)
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")))
      .select(col("doc_id"), col("kind"), encode(col("text"), "UTF-8").as("payload"))

  def resize(docs: DataFrame, maxW: Int = 224, maxH: Int = 224): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    payloads(docs)
      .filter(col("kind") === "image")
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.grouped(Codec.batchSize).flatMap { batch =>
        val metas = Codec.decode(batch.toSeq)
        metas.zip(batch).map { case (m, (id, _, bytes)) =>
          val scale = math.min(1.0,
            math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
          val dw = math.max(1, math.floor(m.width * scale).toInt)
          val dh = math.max(1, math.floor(m.height * scale).toInt)
          val outLen = math.min(bytes.length,
            math.max(1, math.ceil(bytes.length.toDouble *
              (dw.toLong * dh) / (m.width.toLong * m.height)).toInt))
          // min() above: an empty payload keeps n_bytes = 0 = the
          // actual output length — take(1) of nothing is nothing, and
          // a consumer asserting n_bytes == length(payload) must hold
          Resized(id, m.width, m.height, dw, dh, outLen, bytes.take(outLen))
        }
      })
      .toDF()
  }

  /** G1: attach an opaque binary payload (here: utf-8 bytes of `text`,
    * standing in for real media) + a modality tag, then batch-decode to
    * typed metadata. Pure narrow transformation — no shuffle; at scale
    * this is one codegen'd scan stage feeding the batched decoder. */
  def decodeMeta(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val typed: Dataset[(Long, String, Array[Byte])] =
      payloads(docs).as[(Long, String, Array[Byte])]
    typed
      .mapPartitions(_.grouped(Codec.batchSize).flatMap(b => Codec.decode(b.toSeq)))
      .toDF()
  }
}
