package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata carried alongside an opaque media payload. */
case class MediaMeta(modality: String, format: String, width: Int,
    height: Int, durationMs: Long)

/** One multimodal record: opaque bytes + typed metadata. */
case class MediaRecord(media_id: Long, meta: MediaMeta, payload: Array[Byte])

/** Decoded/extracted features for one record. */
case class MediaFeatures(media_id: Long, modality: String, n_bytes: Long,
    byte_entropy: Double, frames_sampled: Int, feature: Array[Float])

/** Multimodal-column plumbing: image/audio/video as opaque BINARY
  * columns with a typed metadata struct, processed per-partition in
  * batches (the Scala analogue of a vectorized `mapInPandas` stage).
  *
  * The decode step is STUBBED — this container has no image/audio
  * codecs — behind [[StubCodec]], a deterministic fake with the real
  * signature (bytes -> frames -> feature vector). Everything around it
  * is real and tested: the schema, the per-partition batch shape, the
  * partition-preserving execution (no shuffle introduced by the decode
  * stage), and the downstream relational use of the extracted features.
  *
  * Scale: decode work is embarrassingly parallel; partitioning is
  * whatever the upstream scan produced (size-based parquet splits), and
  * the stage is a narrow transformation, so a 100 TB media corpus
  * decodes with zero shuffle and per-task memory bounded by one batch.
  */
object Multimodal {

  /** Deterministic stand-in for a media codec. Real deployments swap
    * this for an actual decoder; the pipeline contract (signature,
    * batching, determinism-per-payload) is what the engine tests.
    */
  object StubCodec {
    /** "Decode" = sample up to `maxFrames` pseudo-frames, each frame a
      * fixed-size byte slice; "feature" = per-frame mean byte value.
      */
    def decodeAndExtract(payload: Array[Byte], meta: MediaMeta,
        maxFrames: Int = 8): (Int, Array[Float]) = {
      if (payload.isEmpty) return (0, Array.fill(maxFrames)(0f))
      val frameSize = math.max(1, payload.length / maxFrames)
      val nFrames = math.min(maxFrames, math.max(1, payload.length / frameSize))
      val feat = Array.tabulate(maxFrames) { f =>
        if (f >= nFrames) 0f
        else {
          val from = f * frameSize
          val until = math.min(payload.length, from + frameSize)
          var s = 0L; var i = from
          while (i < until) { s += payload(i) & 0xff; i += 1 }
          (s.toDouble / math.max(1, until - from)).toFloat
        }
      }
      (nFrames, feat)
    }
  }

  private def entropy(payload: Array[Byte]): Double = {
    if (payload.isEmpty) return 0.0
    val counts = new Array[Long](256)
    payload.foreach(b => counts(b & 0xff) += 1)
    val n = payload.length.toDouble
    var h = 0.0
    counts.foreach { c =>
      if (c > 0) { val p = c / n; h -= p * math.log(p) / math.log(2) }
    }
    h
  }

  /** The decode/feature-extract stage: batch iteration per partition,
    * narrow (partition-preserving), deterministic per payload.
    */
  def extractFeatures(records: Dataset[MediaRecord], maxFrames: Int = 8)
      : Dataset[MediaFeatures] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val (nFrames, feat) = StubCodec.decodeAndExtract(r.payload, r.meta, maxFrames)
        MediaFeatures(r.media_id, r.meta.modality, r.payload.length.toLong,
          entropy(r.payload), nFrames, feat)
      }
    }
  }

  /** One resized record: same id/meta shape, payload downsampled to a
    * fixed target size.
    */
  case class ResizedRecord(media_id: Long, meta: MediaMeta,
      payload: Array[Byte], orig_bytes: Long)

  /** The resize stage: downsample every payload to exactly `targetBytes`
    * by strided byte sampling (index i reads byte i·len/target — the
    * byte-domain analogue of nearest-neighbor image resizing; a real
    * deployment swaps the kernel exactly like [[StubCodec]]). Metadata
    * is rewritten to the target "dimensions" so downstream stages see a
    * uniform shape — the normalization every multimodal training
    * pipeline runs before batching tensors. Narrow, partition-
    * preserving, deterministic per payload; payloads already at or
    * below the target pass through zero-padded so the OUTPUT SHAPE is
    * constant (the tensor-batching contract).
    */
  def resize(records: Dataset[MediaRecord], targetBytes: Int = 64)
      : Dataset[ResizedRecord] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val n = r.payload.length
        val out = Array.tabulate(targetBytes) { i =>
          if (n == 0) 0.toByte
          else if (n >= targetBytes) r.payload((i.toLong * n / targetBytes).toInt)
          else if (i < n) r.payload(i)
          else 0.toByte
        }
        ResizedRecord(r.media_id,
          r.meta.copy(width = math.min(r.meta.width, targetBytes),
            height = math.min(r.meta.height, targetBytes)),
          out, n.toLong)
      }
    }
  }

  /** Build a synthetic media table from any table with an id + string
    * column (fixture `documents` in tests): payload = UTF-8 bytes,
    * metadata derived deterministically. Lets the whole pipeline run in
    * an environment with no real media fixtures.
    */
  def syntheticFromText(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("media_id"),
        struct(
          when(col(idCol) % 3 === 0, "image")
            .when(col(idCol) % 3 === 1, "audio").otherwise("video").as("modality"),
          lit("stub").as("format"),
          (col(idCol) % 640 + 1).cast("int").as("width"),
          (col(idCol) % 480 + 1).cast("int").as("height"),
          (length(col(textCol)) * 10).cast("long").as("durationMs")).as("meta"),
        col(textCol).cast("binary").as("payload"))
      .as[MediaRecord]
  }
}
