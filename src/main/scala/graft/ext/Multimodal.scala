package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines. Media payloads are opaque `binary` columns travelling next
  * to a typed metadata struct; heavy per-record work (decode, resize,
  * frame-sample, feature-extract) runs as `mapPartitions` over the typed
  * Dataset so one task processes a whole parquet row-group batch without
  * per-row serialization churn.
  *
  * ==STUB NOTICE==
  * No image/audio codec libraries exist in this container, so the decode
  * step is a clearly-marked DETERMINISTIC FAKE ([[fakeDecode]]): it derives
  * pseudo pixel statistics from the payload bytes. The Spark-side plumbing
  * — schema, typed Encoders, partition-batched execution, feature-vector
  * shape — is real and is what a production codec would drop into.
  */
object Multimodal {

  /** Typed media record: id + modality kind + opaque payload + metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  /** Decoded feature row produced by the (stubbed) decoder. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Int,
      checksum: Long,
      features: Array[Float])

  /** DETERMINISTIC FAKE of a media decoder. A real implementation would
    * call an image/audio codec here (e.g. JPEG decode → pixel tensor);
    * unavailable in this container, so features are derived from payload
    * bytes with a stable polynomial hash — same input, same output, any
    * cluster size.
    */
  def fakeDecode(payload: Array[Byte], dim: Int): (Long, Array[Float]) = {
    // Checksum is the PORTABLE byte fold (h = (h*31 + unsigned byte) mod
    // 2^31-1, seed 97531) rather than a wrapping Java polynomial: the
    // DuckDB oracle reproduces it exactly from hex(payload), making
    // media_features hash-checkable end to end (ANSI-safe too — no
    // silent long wrap-around).
    var h = graft.ext.PortableHash.Init
    var i = 0
    while (i < payload.length) {
      h = (h * 31L + (payload(i) & 0xffL)) % graft.ext.PortableHash.P
      i += 1
    }
    val out = new Array[Float](dim)
    var j = 0
    var s = h
    while (j < dim) {
      s = s * 6364136223846793005L + 1442695040888963407L // LCG step
      out(j) = ((s >>> 16) % 1000L) / 1000.0f
      j += 1
    }
    (h, out)
  }

  /** Attach a fake binary payload column derived from a string column —
    * stands in for reading real media files; keeps the pipeline testable
    * with the `documents` table.
    */
  def withFakePayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      (pmod(col(idCol), lit(1024)) + 32).cast("int").as("width"),
      (pmod(col(idCol), lit(768)) + 32).cast("int").as("height"),
      lit(0L).as("duration_ms"))

  /** Batch feature extraction: one decoder invocation per record, executed
    * partition-at-a-time (the batch shape a vectorized codec wants). Narrow
    * map — no shuffle; scales linearly with input bytes.
    */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      it.map { r =>
        val (checksum, feats) = fakeDecode(r.payload, dim)
        MediaFeatures(r.media_id, r.kind, r.payload.length, checksum, feats)
      }
    }
  }

  /** Frame sampling stub for video: emits `n` evenly spaced frame indices
    * and byte-slices of the payload as stand-in frames. Real impl would
    * demux + decode keyframes; the explode-to-frames plan shape is real.
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media.select(col("media_id"), col("kind"), col("payload"),
        posexplode(sequence(lit(0), lit(n - 1))).as(Seq("frame_i", "frame_n")))
      .withColumn("frame_offset",
        (col("frame_n") * length(col("payload")) / n).cast("int"))
      .withColumn("frame_bytes",
        call_function("substring", col("payload"), col("frame_offset") + 1, lit(64)))
      .drop("frame_n", "payload")

  /** Pure-SQL metadata pass usable with a DuckDB oracle: byte length and
    * md5 of the payload — the part of the multimodal path that needs no
    * codec at all.
    */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"), col("width"), col("height"),
      length(col("payload")).as("byte_len"),
      md5(col("payload")).as("payload_md5"))
}
