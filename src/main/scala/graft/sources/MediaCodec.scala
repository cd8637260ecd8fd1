package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32, Deflater, Inflater}

import graft.queries.MediaFeatures

/** Real container-format codec for the multimodal tier (C9): builds
  * and parses genuine PNG and WAV byte streams.
  *
  * PNG: 8-byte signature, IHDR chunk (13 bytes: width/height as
  * big-endian u32, bit depth, color type, compression, filter,
  * interlace) with a real CRC-32 over type+data, one IDAT chunk whose
  * data is the zlib-DEFLATE-compressed payload, and IEND. The decoder
  * validates the signature, walks chunks by their length fields,
  * verifies IHDR's CRC, maps color type → channel count, and INFLATES
  * the IDAT back to the payload.
  *
  * WAV: RIFF header with total-size field, WAVE form type, a 16-byte
  * PCM `fmt ` subchunk (little-endian: audio format, channels, sample
  * rate, byte rate, block align, bits per sample) and a `data`
  * subchunk holding the payload (even-padded per RIFF, size field
  * exact). The decoder validates both magics and walks subchunks by
  * their size fields, honoring the pad byte.
  *
  * Container geometry (PNG width/height, WAV channels/rate) is derived
  * from the payload size at ENCODE time so an independent engine can
  * oracle the decode; the decoder reads every value back from the
  * bytes, never from the rule.
  */
object MediaCodec {

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def crc32(parts: Array[Byte]*): Int = {
    val c = new CRC32
    parts.foreach(p => c.update(p))
    c.getValue.toInt
  }

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val bb = ByteBuffer.allocate(12 + data.length).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(data.length).put(t).put(data).putInt(crc32(t, data))
    bb.array()
  }

  /** Payload → PNG bytes: width/height from the payload size, RGB
    * (color type 2), IDAT = deflate(payload).
    */
  def encodePng(payload: Array[Byte]): Array[Byte] = {
    val n = payload.length
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(16 + n % 64)        // width
      .putInt(16 + (n / 64) % 64) // height
      .put(8.toByte)              // bit depth
      .put(2.toByte)              // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    val deflater = new Deflater()
    deflater.setInput(payload); deflater.finish()
    val buf = new Array[Byte](n + 64)
    val m = deflater.deflate(buf)
    deflater.end()
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", buf.take(m)) ++
      chunk("IEND", Array.empty)
  }

  /** Payload → WAV bytes: 8-bit PCM, channels/rate from payload size,
    * data subchunk even-padded with an exact size field.
    */
  def encodeWav(payload: Array[Byte]): Array[Byte] = {
    val n = payload.length
    val channels = 1 + n % 2
    val rate = 8000 + n % 8000
    val pad = n % 2
    val bb = ByteBuffer.allocate(44 + n + pad).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n + pad)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)                 // PCM
      .putShort(channels.toShort)
      .putInt(rate)
      .putInt(rate * channels)             // byte rate (8-bit samples)
      .putShort(channels.toShort)          // block align
      .putShort(8.toShort)                 // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(n).put(payload)
    bb.array()
  }

  /** Sniff the magic and parse the matching container. Malformed input
    * (bad magic, bad IHDR CRC, truncated chunks) throws — a decode
    * stage must fail loudly, not emit garbage features.
    */
  def decode(docId: Long, blob: Array[Byte]): MediaFeatures =
    if (blob.length >= 8 && blob.take(8).sameElements(PngSig)) decodePng(docId, blob)
    else if (blob.length >= 12 &&
      new String(blob, 0, 4, "US-ASCII") == "RIFF" &&
      new String(blob, 8, 4, "US-ASCII") == "WAVE") decodeWav(docId, blob)
    else throw new IllegalArgumentException(s"doc $docId: unrecognized container magic")

  /** Inflate one zlib stream assembled from ALL IDAT chunks. Per the
    * PNG spec a datastream may split across multiple IDAT chunks, each
    * holding an arbitrary slice of ONE deflate stream — inflating
    * chunks independently rejects conformant files on the first
    * partial chunk, so the chunk walk concatenates first and inflates
    * once.
    */
  private def inflateIdat(docId: Long, idat: Array[Byte]): Array[Byte] = {
    val inflater = new Inflater()
    inflater.setInput(idat)
    val out = new java.io.ByteArrayOutputStream(idat.length * 4)
    val buf = new Array[Byte](8192)
    while (!inflater.finished()) {
      val k = inflater.inflate(buf)
      require(k > 0 || inflater.finished(), s"doc $docId: truncated IDAT stream")
      out.write(buf, 0, k)
    }
    inflater.end()
    out.toByteArray
  }

  /** Decode and return the raw payload bytes (the decompressed IDAT
    * stream for PNG, the data subchunk for WAV) — the pixel/sample
    * accessor that content-level feature extraction builds on, with
    * the same validation as [[decode]] (IHDR CRC included).
    */
  def decodePayload(docId: Long, blob: Array[Byte]): Array[Byte] =
    if (blob.length >= 8 && blob.take(8).sameElements(PngSig)) {
      val bb = ByteBuffer.wrap(blob).order(ByteOrder.BIG_ENDIAN).position(8)
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done && bb.remaining() >= 12) {
        val len = bb.getInt
        val typ = new Array[Byte](4); bb.get(typ)
        val data = new Array[Byte](len); bb.get(data)
        val storedCrc = bb.getInt
        new String(typ, "US-ASCII") match {
          case "IHDR" =>
            require(storedCrc == crc32(typ, data), s"doc $docId: IHDR CRC mismatch")
          case "IDAT" => idat.write(data)
          case "IEND" => done = true
          case _ => ()
        }
      }
      inflateIdat(docId, idat.toByteArray)
    } else if (blob.length >= 12 &&
      new String(blob, 0, 4, "US-ASCII") == "RIFF" &&
      new String(blob, 8, 4, "US-ASCII") == "WAVE") {
      val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN).position(12)
      var payload: Array[Byte] = Array.empty
      while (bb.remaining() >= 8) {
        val typ = new Array[Byte](4); bb.get(typ)
        val size = bb.getInt
        if (new String(typ, "US-ASCII") == "data") {
          payload = new Array[Byte](size); bb.get(payload)
          if (size % 2 == 1 && bb.hasRemaining) bb.get()
        } else bb.position(bb.position() + size + size % 2)
      }
      payload
    } else throw new IllegalArgumentException(s"doc $docId: unrecognized container magic")

  private def decodePng(docId: Long, blob: Array[Byte]): MediaFeatures = {
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.BIG_ENDIAN).position(8)
    var width, height, channels = 0L
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && bb.remaining() >= 12) {
      val len = bb.getInt
      val typ = new Array[Byte](4); bb.get(typ)
      val data = new Array[Byte](len); bb.get(data)
      val storedCrc = bb.getInt
      new String(typ, "US-ASCII") match {
        case "IHDR" =>
          require(storedCrc == crc32(typ, data), s"doc $docId: IHDR CRC mismatch")
          val h = ByteBuffer.wrap(data).order(ByteOrder.BIG_ENDIAN)
          width = h.getInt.toLong
          height = h.getInt.toLong
          h.get() // bit depth
          channels = h.get() match {
            case 0 => 1L // grayscale
            case 2 => 3L // truecolor
            case 4 => 2L // gray+alpha
            case 6 => 4L // truecolor+alpha
            case other => throw new IllegalArgumentException(
              s"doc $docId: unsupported color type $other")
          }
        case "IDAT" => idat.write(data) // slices of ONE zlib stream
        case "IEND" => done = true
        case _ => () // ancillary chunk: skip
      }
    }
    val payload = inflateIdat(docId, idat.toByteArray)
    MediaFeatures(docId, "png", payload.length.toLong, width, height, channels,
      sample_rate = 0L, payload_sum = byteSum(payload))
  }

  private def decodeWav(docId: Long, blob: Array[Byte]): MediaFeatures = {
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN).position(12)
    var channels, rate = 0L
    var payload: Array[Byte] = Array.empty
    while (bb.remaining() >= 8) {
      val typ = new Array[Byte](4); bb.get(typ)
      val size = bb.getInt
      new String(typ, "US-ASCII") match {
        case "fmt " =>
          val fmt = bb.slice().order(ByteOrder.LITTLE_ENDIAN)
          require(fmt.getShort == 1, s"doc $docId: not PCM")
          channels = fmt.getShort.toLong
          rate = fmt.getInt.toLong
          bb.position(bb.position() + size)
        case "data" =>
          payload = new Array[Byte](size); bb.get(payload)
          if (size % 2 == 1 && bb.hasRemaining) bb.get() // RIFF pad byte
        case _ =>
          bb.position(bb.position() + size + size % 2)
      }
    }
    MediaFeatures(docId, "wav", payload.length.toLong, width = 0L, height = 0L,
      channels = channels, sample_rate = rate, payload_sum = byteSum(payload))
  }

  private def byteSum(bytes: Array[Byte]): Long = {
    var s = 0L; var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
    s
  }
}
