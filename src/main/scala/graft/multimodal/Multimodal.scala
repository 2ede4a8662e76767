package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** One raw media record: opaque binary payload + typed metadata.
  * At 100 TB the payload column is images/audio/video bytes; here the
  * payload is the document's UTF-8 bytes standing in for an encoded
  * asset — the schema, encoders, partitioning and batch shape are the
  * real thing, only the codec is stubbed.
  */
final case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String)

/** Extracted features — what a real decode→feature stage would emit. */
final case class MediaFeatures(doc_id: Long, byte_len: Long, width: Long,
    height: Long, channels: Long, first_byte: Long)

/** Multimodal-column plumbing: binary payloads processed per-partition
  * in batches through a (stubbed) decoder.
  *
  * Scale notes: the pipeline is `Dataset[MediaRecord].mapPartitions` —
  * the decoder is invoked once per partition over an iterator (the
  * Scala analogue of `mapInPandas` batch shape), so a real codec would
  * amortize model/codec init per partition, not per row.  Payload bytes
  * never hit the driver; feature extraction is narrow (no shuffle).
  */
object Multimodal {

  /** STUB DECODER.  A real implementation would parse the codec header
    * and decode frames; this container has no image/audio libs, so the
    * stub derives deterministic pseudo-features from the bytes.  The
    * arithmetic is intentionally SQL-expressible so the DuckDB oracle
    * can check the full pipeline end to end.
    */
  private def stubDecode(r: MediaRecord): MediaFeatures = {
    val len = r.payload.length.toLong
    MediaFeatures(
      doc_id = r.doc_id,
      byte_len = len,
      width = len % 64 + 1,
      height = (len / 64) % 64 + 1,
      channels = r.doc_id % 3 + 1,
      first_byte = if (len > 0) (r.payload(0) & 0xff).toLong else -1L)
  }

  /** documents → binary media records (encode step). */
  def mediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("media_type"))
      .as[MediaRecord]
  }

  /** Full pipeline: encode → per-partition batched stub-decode →
    * features, back to a DataFrame for downstream relational ops. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaRecords(spark, dir)
      .mapPartitions(batch => batch.map(stubDecode))
      .toDF()
  }

  /** Frame sampling for video-shaped payloads: treat the payload as
    * consecutive `frameBytes` windows ("frames") and emit every
    * `stride`-th one with its index, byte length, and content hash —
    * the sample-then-decode stage of a video pipeline, where sampling
    * is pure column math (explode over an integer grid + a slice per
    * frame, narrow, no shuffle, no codec) and only the dropped-out
    * decode needs the stubbed mapPartitions path above.  Downstream
    * frame-level dedup/similarity runs on (frame_md5, embeddings)
    * without ever touching pixels.
    *
    * The slices here run over the HEX form of the payload (2 chars =
    * 1 byte) purely so the DuckDB oracle can mirror them — DuckDB
    * cannot slice BLOBs.  In production the same plan slices the
    * binary column directly (`substring` on BinaryType), which is
    * also what keeps per-frame cost O(frameBytes): re-deriving hex()
    * per generated row is O(payload) and would matter for MB-scale
    * payloads (the Project-above-Generate re-evaluation documented at
    * CorpusStats.repetition). */
  def frameSample(spark: SparkSession, dir: String,
      frameBytes: Int = 64, stride: Int = 4): DataFrame =
    frameSampleOf(Tables(spark, dir).documents, frameBytes, stride)

  /** Frame-level entry (docs = (doc_id, text)) — exposed so degenerate
    * payloads (empty text) are testable without a table fixture. */
  def frameSampleOf(docs: DataFrame,
      frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val fhex = frameBytes * 2
    val hx = hex(encode(col("text"), "UTF-8"))
    val nFrames = floor((length(hx) + lit(fhex - 1)) / lit(fhex)).cast("int")
    // empty payloads are expected input (features() handles them; the
    // oracle's range(0, 0, stride) is empty) — but sequence(0, -1,
    // +stride) is an illegal-boundary runtime error, so the grid must
    // collapse to an empty array explicitly (the TextFunctions.shingles
    // guard, same hazard)
    val grid = when(nFrames > 0, sequence(lit(0), nFrames - 1, lit(stride)))
      .otherwise(typedLit(Seq.empty[Int]))
    docs
      .select(col("doc_id"), hx.as("hx"), explode(grid).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("hx").substr(col("frame_idx") * fhex + 1, lit(fhex)).as("fh"))
      .select(col("doc_id"), col("frame_idx"),
        (length(col("fh")) / lit(2)).cast("long").as("frame_len"),
        md5(col("fh")).as("frame_md5"))
  }
}
