package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY §2.8).
  *
  * Media payloads are opaque `binary` columns + typed metadata; decode /
  * feature-extract runs per-partition in batches so a real decoder
  * (libjpeg, ffmpeg, …) would amortize init per partition — exactly the
  * mapInPandas/mapPartitions shape a production pipeline uses. The
  * decoders themselves are STUBS (this container ships no media
  * libraries): deterministic functions of the bytes, clearly marked, so
  * the Spark-side plumbing — schema, batching, partition flow — is real
  * and tested while the pixel math is fake.
  */
object MultiModal {

  case class MediaRow(id: Long, media: Array[Byte], mime: String)
  case class MediaFeatures(id: Long, mime: String, n_bytes: Int,
                           checksum: Long, feat_mean: Double)

  /** STUB decoder: stands in for image/audio decode. Deterministic in
    * the payload bytes: polynomial checksum + mean byte value. A real
    * deployment swaps only this function. */
  def decodeStub(bytes: Array[Byte]): (Long, Double) = {
    var h = 0L
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % Embed.HashMod
      sum += (bytes(i) & 0xff)
      i += 1
    }
    (h, if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length)
  }

  /** Batched per-partition feature extraction over a binary column —
    * the partition iterator is the batch boundary; decoder init happens
    * once per partition (simulated by the lazy val shape).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition "decoder init" would live here
      rows.map { r =>
        val (checksum, mean) = decodeStub(r.media)
        MediaFeatures(r.id, r.mime, r.media.length, checksum, mean)
      }
    }
  }

  case class ResizedMedia(id: Long, n_bytes_out: Int, out_hash: Long)

  /** STUB resize: stands in for an image downscale. Deterministic
    * subsample — every `factor`-th byte — plus the portable polynomial
    * checksum of the result. A real deployment swaps only the byte
    * transform; the per-partition batching is the production shape. */
  def resizeStub(bytes: Array[Byte], factor: Int): (Int, Long) = {
    var h = 0L
    var n = 0
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % Embed.HashMod
      n += 1
      i += factor
    }
    (n, h)
  }

  /** Batched media resize over a binary column. */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder/scaler init would live here
      rows.map { r =>
        val (n, h) = resizeStub(r.media, factor)
        ResizedMedia(r.id, n, h)
      }
    }
  }

  /** Documents re-cast as a media table: payload = utf-8 bytes of the
    * text (deterministic fake "image"), typed metadata columns kept.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("id"),
      col("text").cast("binary").as("media"),
      lit("text/plain").as("mime"),
      col("lang"), col("source"))

  /** Frame sampling plan over a binary column: one "frame" of
    * `frameLen` bytes every `stride` bytes. Pure Catalyst arithmetic on
    * offsets — the scan never materializes the full frame list per row
    * wider than needed.
    */
  def frameSample(media: DataFrame, stride: Int, frameLen: Int): DataFrame = {
    val nBytes = length(col("media"))
    val nFrames = floor((nBytes - 1).cast("double") / stride).cast("bigint") + 1
    media
      .withColumn("n_bytes", nBytes)
      .withColumn("n_frames", nFrames)
      .withColumn("first_frame",
        substring(col("media").cast("string"), 1, frameLen))
  }

  /** Overlapping audio-style framing (STFT shape): `frameLen`-byte
    * frames every `hop` bytes, one output row per frame with a
    * per-frame polyhash standing in for the energy/feature computation
    * (a real pipeline swaps the hash for an FFT over the same rows —
    * the Spark-side plumbing, offsets, and row shape are what's being
    * exercised). Payloads shorter than one frame produce no rows, like
    * an STFT would. Frame explosion is map-side Catalyst arithmetic —
    * at 100 TB the only cost is the output row count, no shuffle.
    */
  def audioFrames(media: DataFrame, frameLen: Int, hop: Int): DataFrame = {
    val nBytes = length(col("media"))
    val nFrames = (floor((nBytes - frameLen).cast("double") / hop)
      .cast("bigint") + 1)
    media
      .filter(nBytes >= frameLen)
      .withColumn("frame_idx",
        explode(sequence(lit(0L), nFrames - 1)))
      .withColumn("frame_off", col("frame_idx") * hop)
      .withColumn("frame_hash", Embed.tokenHash(
        col("media").cast("string")
          .substr((col("frame_idx") * hop + 1).cast("int"), lit(frameLen))))
      .select(col("id"), col("frame_idx"), col("frame_off"), col("frame_hash"))
  }
}
