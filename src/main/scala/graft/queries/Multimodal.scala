package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Decoded "frame" features for one blob — the output schema of the
  * multimodal extract stage. Top-level case class so encoder codegen
  * stays on the compiled path.
  */
case class FrameFeatures(
  doc_id: Long, n_bytes: Int, width: Int, height: Int, channels: Int, first_byte: Int)

/** Multimodal-column plumbing (builder brief): media as opaque binary
  * columns with typed metadata, decoded/feature-extracted in a
  * partition-mapped stage.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic STUB ([[Multimodal.decodeStub]]) — what
  * is real and tested is the Spark-side plumbing a production pipeline
  * needs: the binary column + metadata schema, the typed
  * `mapPartitions` boundary (same batch-at-a-time shape as
  * `mapInPandas`/Arrow in PySpark — per-partition iterator in, typed
  * rows out), the Encoder-backed output schema, and the per-partition
  * batching that would amortize a model/codec load at scale.
  */
object Multimodal {

  /** STUB decoder — stands in for an image/audio codec. Deterministic
    * features derived only from the byte stream, so the DuckDB oracle
    * can mirror them from octet_length/ascii. A real deployment swaps
    * this body for the codec call; the Spark plumbing is unchanged.
    */
  def decodeStub(docId: Long, blob: Array[Byte]): FrameFeatures = {
    val n = blob.length
    FrameFeatures(
      doc_id = docId,
      n_bytes = n,
      width = 16 + n % 64,
      height = 16 + (n / 64) % 64,
      channels = 3,
      first_byte = if (n > 0) blob(0) & 0xff else 0)
  }

  /** multimodal_extract — documents.text encoded to a binary blob
    * column (standing in for stored media bytes), then decoded via
    * mapPartitions into typed frame features. One narrow stage: the
    * "decode" runs where the data lives, no shuffle before it.
    */
  def multimodalExtract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would load the codec/model once here
        it.map { case (id, blob) => decodeStub(id, blob) }
      }
      .toDF()
      .orderBy("doc_id")
  }
  /** Oracle mirrors BYTE semantics: sizes via octet_length(encode(..))
    * — the UTF-8 byte count, exactly what the Spark side's blob length
    * is — not strlen's codepoint count. first_byte uses ascii() of the
    * first CHARACTER, which equals the first byte only for ASCII;
    * MEASURED: the fixture corpus is ASCII-only at every sf (0 docs
    * with octet_length(encode(text)) <> strlen(text)), so the two
    * agree here. A non-ASCII corpus would need a blob-indexing
    * function on the oracle side.
    */
  val multimodalExtractSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  CAST(16 + octet_length(encode(text)) % 64 AS INTEGER) AS width,
      |  CAST(16 + (octet_length(encode(text)) // 64) % 64 AS INTEGER) AS height,
      |  3 AS channels,
      |  CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte
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
