package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads travel as opaque `binary`
  * columns with typed metadata, and per-item decode/feature-extraction runs
  * batched over `mapPartitions` (the Scala analog of `mapInPandas`): one
  * decoder instantiation per partition, items processed in bounded batches.
  *
  * The actual byte→pixels decode is STUBBED (no image/audio libs in this
  * environment): `FakeDecoder` derives deterministic pseudo-features from
  * an md5 of the payload, so the Spark-side plumbing — schema, batching,
  * partitioning — is real and testable end-to-end.
  */
object Media {

  case class MediaRecord(id: Long, payload: Array[Byte], mimeType: String)
  case class MediaFeatures(id: Long, byteLen: Long, width: Int, height: Int,
                           contentHash: String)
  case class Frame(id: Long, frameIdx: Int, frameHash: String)
  case class Resized(id: Long, origW: Int, origH: Int, outW: Int, outH: Int,
                     scaleX: Double, scaleY: Double, resizedHash: String)

  /** Deterministic stand-in for a real decoder. A real implementation
    * would decode `payload` (JPEG/WAV/...) here; we derive fake dimensions
    * from the content hash instead: width/height = 16 + 16 * (hash byte % 16).
    */
  object FakeDecoder extends Serializable {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] = batch.map { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(r.payload).map("%02x".format(_)).mkString
      val w = 16 + 16 * Integer.parseInt(hex.substring(0, 2), 16) % 256
      val h = 16 + 16 * Integer.parseInt(hex.substring(2, 4), 16) % 256
      MediaFeatures(r.id, r.payload.length.toLong, w, h, hex)
    }

    private def md5Hex(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString

    /** Stub frame sampler: a real decoder would demux the container and
      * decode every `step`-th frame; the fake derives a deterministic
      * frame count from the payload length (1 + len % 8) and per-frame
      * hashes from (content hash, frame index).
      */
    def sampleFrames(batch: Seq[MediaRecord], step: Int): Seq[Frame] =
      batch.flatMap { r =>
        val hex = md5Hex(r.payload)
        val nFrames = 1 + (r.payload.length % 8)
        (0 until nFrames by step).map(i =>
          Frame(r.id, i, md5Hex(s"$hex:$i".getBytes("UTF-8"))))
      }

    /** Stub resize: a real decoder would decode, rescale to outW×outH and
      * re-encode; the fake reports the same deterministic source dims as
      * [[decodeBatch]], the scale factors a real resampler would use, and
      * a content hash of the (payload, target-size) pair standing in for
      * the resized bytes.
      */
    def resizeBatch(batch: Seq[MediaRecord], outW: Int, outH: Int): Seq[Resized] =
      batch.map { r =>
        val hex = md5Hex(r.payload)
        val w = 16 + 16 * Integer.parseInt(hex.substring(0, 2), 16) % 256
        val h = 16 + 16 * Integer.parseInt(hex.substring(2, 4), 16) % 256
        Resized(r.id, w, h, outW, outH, outW.toDouble / w, outH.toDouble / h,
          md5Hex(s"$hex:${outW}x$outH".getBytes("UTF-8")))
      }
  }

  /** documents-style (id, text) → (id, payload binary, mimeType) frame. */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(textCol).cast("binary").as("payload"),
      lit("text/plain").as("mimeType"))

  /** Batched stub decode over mapPartitions. batchSize bounds per-call
    * memory exactly like an Arrow batch would for mapInPandas.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap(FakeDecoder.decodeBatch)
    }
  }

  /** Batched frame sampling (1→N rows per media item) over mapPartitions —
    * the video twin of `extractFeatures`. Output is narrow (id, idx, hash),
    * so the row explosion happens after the wide payload column is dropped.
    */
  def sampleFrames(media: DataFrame, step: Int = 2,
                   batchSize: Int = 64): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap(FakeDecoder.sampleFrames(_, step))
    }
  }

  /** Batched stub resize to a fixed target — the image-preprocessing twin
    * of `extractFeatures` (same batching, 1→1). The wide payload column is
    * consumed inside the partition and only narrow metadata + the resized
    * content hash leave it.
    */
  def resize(media: DataFrame, outW: Int = 64, outH: Int = 64,
             batchSize: Int = 64): Dataset[Resized] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap(FakeDecoder.resizeBatch(_, outW, outH))
    }
  }
}
