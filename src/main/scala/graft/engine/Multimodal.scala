package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, and a batched decode/feature-extract stage.
  *
  * The test corpus has no real image/audio bytes, so payloads are
  * synthesized (UTF-8 bytes of `documents.text`) — but the Spark-side
  * plumbing is the real thing: a `binary` column + metadata struct
  * (content hash, byte length, declared kind), decoded partition-wise in
  * fixed-size batches exactly as an image library would be driven.
  *
  * Scale posture: payload bytes never shuffle for metadata queries — the
  * projection is per-row expressions inside the scan stage. The decode
  * stage is `mapPartitions` (one library context per partition, batched
  * rows), the Scala analogue of Python's `mapInPandas` batch contract;
  * at 100 TB you size `maxPartitionBytes` so a batch of payloads fits
  * executor memory, and the decoded features (small, fixed-width) are
  * what flows downstream — not the blobs.
  */
object Multimodal {

  /** Attach the payload + metadata struct. `kind` is declared (by source
    * here; by MIME sniffing in production). */
  def withPayload(df: DataFrame): DataFrame =
    df.withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("meta", struct(
        octet_length(col("payload")).as("byte_len"),
        md5(col("payload")).as("content_md5"),
        lit("text/plain").as("kind")))

  /** Decoded-feature row shape: fixed-width, small — this is what flows
    * downstream instead of payload bytes. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("mean_byte", DoubleType),
    StructField("head", BinaryType)))

  /** STUB DECODE: stands in for an image/audio decode (libraries not
    * available in this environment). Deterministic fake: byte-level
    * moments + an 8-byte head sample. The partition-wise batching, row
    * shape, and driver-free execution are the real contract — swap the
    * body for e.g. JPEG decode + embedding without touching the plan. */
  def decodeFeatures(withPayloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    withPayloads
      .select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // One decoder context per partition; rows arrive in batches.
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val mean =
            if (bytes.isEmpty) 0.0
            else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
          Row(id, bytes.length, mean, bytes.take(8))
        }
      }(enc)
  }

  /** Metadata projection over payloads — expression-only (no decode), so
    * it is oracle-checkable and never moves blob bytes past the scan. */
  def q29MultimodalMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    withPayload(Tables.documents(spark, sfDir))
      .select($"doc_id", $"meta.byte_len".as("byte_len"),
        $"meta.content_md5".as("content_md5"), $"meta.kind".as("kind"))
      .orderBy($"doc_id")
  }

  def q29Sql: String =
    """SELECT doc_id, octet_length(encode(text)) AS byte_len,
       md5(text) AS content_md5, 'text/plain' AS kind
       FROM documents ORDER BY doc_id"""

  /** Decode stage output. The mapPartitions decode has no direct SQL
    * twin, but its byte statistics DO on this corpus: the text is pure
    * ASCII (verified at every SF), so DuckDB's per-char ord() equals the
    * UTF-8 byte, and both engines sum exact integers (< 2^53 even
    * accumulated in doubles) before a single rounded division — so the
    * decode path is hash-checked end to end, not rows-only. */
  def q30MultimodalDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(withPayload(Tables.documents(spark, sfDir)))
      .select($"doc_id", $"n_bytes", round($"mean_byte", 6).as("mean_byte"))
      .orderBy($"doc_id")
  }

  def q30Sql: String =
    """SELECT doc_id, CAST(length(text) AS INT) AS n_bytes,
       CASE WHEN length(text) = 0 THEN 0.0 ELSE
         round(list_reduce(list_transform(range(1, length(text) + 1),
                 i -> ord(substr(text, i, 1))), (x, y) -> x + y)
               / CAST(length(text) AS DOUBLE), 6) END AS mean_byte
       FROM documents ORDER BY doc_id"""

  /** Frame-sampling plumbing for video/audio payloads: one row per
    * fixed-stride frame with its byte extent — the fan-out a frame
    * decoder consumes downstream (here over the synthesized payloads;
    * with real media, `frame_len` comes from the container index). The
    * explode happens AFTER dropping the payload column, so blob bytes
    * are scanned once and never duplicated per frame. */
  val FrameLen = 256
  def q59FrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    withPayload(Tables.documents(spark, sfDir))
      .withColumn("nframes", expr(s"octet_length(payload) div $FrameLen"))
      .filter($"nframes" >= 1)
      .select($"doc_id", explode(sequence(lit(0L), $"nframes" - 1)).as("frame_idx"))
      .select($"doc_id", $"frame_idx",
        ($"frame_idx" * FrameLen).as("byte_offset"),
        lit(FrameLen).as("frame_len"))
      .orderBy($"doc_id", $"frame_idx")
  }

  def q59Sql: String =
    s"""WITH d AS (
          SELECT doc_id, octet_length(encode(text)) // $FrameLen AS nframes
          FROM documents),
        f AS (
          SELECT doc_id, unnest(range(0, nframes)) AS frame_idx
          FROM d WHERE nframes >= 1)
        SELECT doc_id, frame_idx, frame_idx * $FrameLen AS byte_offset,
          $FrameLen AS frame_len
        FROM f ORDER BY doc_id, frame_idx"""

  /** Resize/thumbnail plumbing: derive a bounded-size payload from each
    * blob (here a deterministic head crop standing in for an image
    * resize — with real media the crop becomes the resampling kernel)
    * and audit the shrink per source: payload count, bytes before/after,
    * distinct thumb hashes. The binary ops (substring/md5/octet_length
    * on BinaryType) run expression-level inside the scan stage — blob
    * bytes never shuffle; only the audit aggregate does. The oracle
    * crops VARCHAR instead, byte-identical because the corpus is pure
    * ASCII (verified: octet_length(encode(text)) == length(text) for
    * every row at every SF). */
  val ThumbLen = 64
  def q85Resize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    withPayload(Tables.documents(spark, sfDir))
      .select($"source", $"meta.byte_len".as("orig_len"),
        substring($"payload", 1, ThumbLen).as("thumb"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_payloads"),
        sum($"orig_len").as("orig_bytes"),
        sum(octet_length($"thumb")).as("thumb_bytes"),
        countDistinct(md5($"thumb")).as("n_thumbs"))
      .orderBy($"source")
  }

  def q85Sql: String =
    s"""SELECT source, count(*) AS n_payloads,
        CAST(sum(octet_length(encode(text))) AS BIGINT) AS orig_bytes,
        CAST(sum(octet_length(encode(substring(text, 1, $ThumbLen)))) AS BIGINT)
          AS thumb_bytes,
        count(DISTINCT md5(substring(text, 1, $ThumbLen))) AS n_thumbs
        FROM documents GROUP BY source ORDER BY source"""
}
