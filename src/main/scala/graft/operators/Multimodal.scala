package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** SURVEY §2.G — multimodal plumbing: media as opaque binary columns
  * with typed metadata, and a batch-shaped feature-extraction pipeline.
  *
  * The DECODE step is a deterministic stub (no image/audio libraries
  * in this environment — and at scale the decoder is an external
  * native lib anyway); everything Spark-side is real: binary column
  * handling, schema, partition-parallel batched iteration, and typed
  * output. Swapping `decodeStub` for a JNI/ONNX call changes no
  * plumbing.
  */
object Multimodal {

  final case class Media(doc_id: Long, bytes: Array[Byte])
  final case class MediaFeatures(doc_id: Long, n_bytes: Int,
                                 width: Int, height: Int,
                                 features: Array[Float])

  /** G1: typed metadata over a binary column — byte length, header
    * hex, payload digest. Pure column expressions on `binary`. */
  def binaryMeta(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(binCol)).cast("long").as("n_bytes"),
      lower(hex(substring(col(binCol), 1, 8))).as("header_hex"),
      md5(col(binCol)).as("payload_md5"))

  /** The stubbed decoder: deterministic pseudo-decode of a byte
    * payload into (width, height, 16-bin byte histogram). Replace with
    * a real decoder (libjpeg/ffmpeg/ONNX) without touching the
    * pipeline around it. */
  private[graft] def decodeStub(m: Media): MediaFeatures = {
    // null payload decodes like an empty one (zero histogram) instead
    // of NPE-ing the task — a real decoder would do the same triage
    val bytes = if (m.bytes == null) Array.emptyByteArray else m.bytes
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xFF) % 16) += 1f; i += 1 }
    val n = math.max(bytes.length, 1)
    var b = 0
    while (b < 16) { hist(b) /= n.toFloat; b += 1 }
    MediaFeatures(m.doc_id, bytes.length,
      width = 64 + (bytes.length % 1024),
      height = 64 + ((bytes.length / 7) % 1024),
      features = hist)
  }

  final case class Frame(doc_id: Long, frame_idx: Int, bytes: Array[Byte])

  /** G3: frame sampling — every `everyNth` fixed-size chunk of the
    * payload emitted as a "frame" row (the deterministic stub of a
    * video keyframe iterator; a real implementation swaps the chunker
    * for ffmpeg and nothing else changes). The Spark shape is the real
    * thing: a typed flatMap exploding one media row into its sampled
    * frames, which downstream operators treat as first-class media —
    * at 100 TB the explosion stays partition-local (no shuffle) and
    * frame count is bounded by payload size / frameBytes / everyNth.
    */
  def sampleFrames(media: Dataset[Media], frameBytes: Int = 4096,
                   everyNth: Int = 2): Dataset[Frame] = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(everyNth > 0, s"everyNth must be positive, got $everyNth")
    import media.sparkSession.implicits._
    media.flatMap { m =>
      // a null payload samples to no frames — the same skip the
      // mm_frame_sample oracle's octet_length filter applies, and the
      // behavior a null media column should have (not a task failure)
      if (m.bytes == null) Iterator.empty
      else {
        val nChunks = (m.bytes.length + frameBytes - 1) / frameBytes
        Iterator.range(0, nChunks).filter(_ % everyNth == 0).map { c =>
          val from = c * frameBytes
          val until = math.min(from + frameBytes, m.bytes.length)
          Frame(m.doc_id, c, java.util.Arrays.copyOfRange(m.bytes, from, until))
        }
      }
    }
  }

  /** The stubbed resizer: deterministic byte-stride subsampling to a
    * target budget (a real impl calls libvips/ffmpeg scale here).
    * Payloads already under budget pass through untouched. */
  private[graft] def resizeStub(bytes: Array[Byte], targetBytes: Int): Array[Byte] =
    if (bytes == null) null // null payload passes through (1:1 op)
    else if (bytes.length <= targetBytes) bytes
    else {
      val stride = (bytes.length + targetBytes - 1) / targetBytes
      val out = new Array[Byte]((bytes.length + stride - 1) / stride)
      var i = 0
      while (i < out.length) { out(i) = bytes(i * stride); i += 1 }
      out
    }

  /** G4: resize — batch-shaped like [[extractFeatures]] (codec setup
    * amortized per batch), typed Media in/out: chain it BEFORE
    * [[sampleFrames]] (which explodes Media into Frame rows) or
    * before/after [[extractFeatures]]'s input. */
  def resize(media: Dataset[Media], targetBytes: Int = 1024,
             batchSize: Int = 64): Dataset[Media] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map(m => Media(m.doc_id, resizeStub(m.bytes, targetBytes)))
      }
    }
  }

  /** G2: partition-parallel, batch-shaped feature extraction.
    * `mapPartitions` + `grouped(batchSize)` mirrors how a real decoder
    * amortizes model/codec setup over a batch (the mapInPandas batch
    * shape, in JVM form) — per-partition imperative code is the right
    * tool here, since the decode is opaque to Catalyst either way. */
  def extractFeatures(media: Dataset[Media], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real impl would invoke the codec
        // once for `batch.size` payloads
        batch.iterator.map(decodeStub)
      }
    }
  }
}
