package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Decoded media metadata for one blob — the output schema of the
  * multimodal extract stage. Top-level case class so encoder codegen
  * stays on the compiled path.
  */
case class MediaFeatures(
  doc_id: Long, kind: String, n_payload: Long, width: Long, height: Long,
  channels: Long, sample_rate: Long, payload_sum: Long)

/** Multimodal-column plumbing (builder brief): media as opaque binary
  * columns with typed metadata, decoded/feature-extracted in a
  * partition-mapped stage.
  *
  * The blobs are REAL container formats built around the corpus bytes
  * (PNG: signature + IHDR with CRC-32 + zlib-deflated IDAT + IEND;
  * WAV: RIFF/WAVE with fmt and data subchunks), and
  * [[graft.sources.MediaCodec.decode]] genuinely parses them — magic
  * sniffing, chunk walking, big/little-endian field reads, CRC
  * verification, Inflater round-trip — inside the typed
  * `mapPartitions` boundary (same batch-at-a-time shape as
  * `mapInPandas`/Arrow in PySpark). Only pixel/sample interpretation
  * is out of scope (the payload is corpus text, not imagery); the
  * container layer a production ingest must survive is exercised for
  * real.
  */
object Multimodal {

  /** multimodal_extract — documents.text packed into real PNG/WAV
    * containers (even doc_ids → PNG, odd → WAV), then decoded via
    * mapPartitions into typed media metadata. One narrow stage: the
    * decode runs where the data lives, no shuffle before it, and only
    * the small typed features survive the stage — the blob never
    * shuffles.
    */
  def multimodalExtract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would load the codec/model once here
        it.map { case (id, payload) =>
          val blob =
            if (id % 2 == 0) graft.sources.MediaCodec.encodePng(payload)
            else graft.sources.MediaCodec.encodeWav(payload)
          graft.sources.MediaCodec.decode(id, blob)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }
  /** Oracle mirrors the CONSTRUCTION rule (container fields are pure
    * functions of payload size / doc parity, which is what lets an
    * independent engine check a binary decode), byte semantics via
    * octet_length(encode(..)); payload_sum sums ascii() per character,
    * which equals the byte sum on this MEASURED-ASCII corpus.
    */
  val multimodalExtractSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS kind,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_payload,
      |  CAST(CASE WHEN doc_id % 2 = 0
      |    THEN 16 + octet_length(encode(text)) % 64 ELSE 0 END AS BIGINT) AS width,
      |  CAST(CASE WHEN doc_id % 2 = 0
      |    THEN 16 + (octet_length(encode(text)) // 64) % 64 ELSE 0 END AS BIGINT) AS height,
      |  CAST(CASE WHEN doc_id % 2 = 0
      |    THEN 3 ELSE 1 + octet_length(encode(text)) % 2 END AS BIGINT) AS channels,
      |  CAST(CASE WHEN doc_id % 2 = 0
      |    THEN 0 ELSE 8000 + octet_length(encode(text)) % 8000 END AS BIGINT) AS sample_rate,
      |  CAST(coalesce(list_aggregate(list_transform(generate_series(1, strlen(text)),
      |    p -> ascii(text[p])), 'sum'), 0) AS BIGINT) AS payload_sum
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Output schema of the frame-sampling stage. */
  case class FrameSample(doc_id: Long, n_frames: Long, n_sampled: Long, checksum: Long)

  /** multimodal_frame_sample — the video-style frame-sampling stage:
    * the blob is treated as a sequence of fixed 16-byte frames; every
    * 4th frame is sampled (indices 0, 4, 8, …) and summarized (byte-sum
    * checksum stands in for the per-frame feature a codec would emit).
    * Same typed mapPartitions boundary as the extract stage: sampling
    * runs where the bytes live, emits one small typed row per doc —
    * at 100 TB the blob column never survives past this narrow stage
    * and only features shuffle. The oracle mirrors the exact byte/frame
    * arithmetic from the text (ASCII fixture, see extract's note).
    */
  def multimodalFrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, blob) =>
          val n = blob.length
          val nFrames = (n + 15L) / 16L
          var checksum = 0L
          var i = 0
          while (i < n) {
            if ((i / 16) % 4 == 0) checksum += (blob(i) & 0xff)
            i += 1
          }
          FrameSample(id, nFrames, (nFrames + 3) / 4, checksum)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }
  val multimodalFrameSampleSql: String =
    """SELECT doc_id,
      |  CAST((octet_length(encode(text)) + 15) // 16 AS BIGINT) AS n_frames,
      |  CAST(((octet_length(encode(text)) + 15) // 16 + 3) // 4 AS BIGINT) AS n_sampled,
      |  CAST(coalesce(list_aggregate(list_transform(generate_series(1, strlen(text)),
      |    p -> CASE WHEN ((p - 1) // 16) % 4 = 0 THEN ascii(text[p]) ELSE 0 END),
      |    'sum'), 0) AS BIGINT) AS checksum
      |FROM documents ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_extract" -> (multimodalExtract _),
    "multimodal_frame_sample" -> (multimodalFrameSample _),
  )
  val oracle: Map[String, String] = Map(
    "multimodal_extract" -> multimodalExtractSql,
    "multimodal_frame_sample" -> multimodalFrameSampleSql,
  )
}
