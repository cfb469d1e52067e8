package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio modeled as opaque `binary`
  * payload columns with typed metadata, processed by partition-mapped
  * batch functions (the Scala analog of the mapInPandas pattern).
  *
  * The payloads are REAL uncompressed containers — 24-bit BI_RGB BMP
  * images and PCM-16 RIFF/WAVE audio — generated deterministically from
  * the document text ([[asMedia]]), and the decode path
  * ([[decodeMeta]]) is a real pure-JVM header parser: magic sniffing,
  * little-endian field extraction, RIFF chunk walking. No external
  * codec is needed because both formats store samples raw; a
  * compressed format (JPEG/FLAC) would swap only the per-format branch
  * bodies, not the Spark plumbing (binary schema, typed metadata
  * struct, `Dataset[T]` encoders, partition-preserving execution, the
  * explode shape for frame sampling).
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class DecodedRow(doc_id: Long, media_type: String, byte_len: Int,
      width: Int, height: Int, channels: Int)
  case class FeatureRow(doc_id: Long, feature: Array[Float])
  case class FrameRow(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  // --- fixture encoding --------------------------------------------------

  /** BMP geometry derived from the utf-8 byte length `n` of the source
    * text — shared with the DuckDB oracle, which re-derives the same
    * dimensions in SQL and checks them against the REAL header parse. */
  private[graft] def bmpDims(n: Int): (Int, Int) =
    (1 + n % 64, 1 + (n * 7) % 64)
  /** WAV shape from text byte length: one 16-bit sample per byte. */
  private[graft] def wavShape(n: Int): (Int, Int) =
    (1 + n % 2, 8000 + 1000 * (n % 8)) // (channels, sampleRate)

  /** A real 24-bit bottom-up BI_RGB BMP: 14-byte file header + 40-byte
    * BITMAPINFOHEADER + 4-byte-aligned pixel rows filled from the text
    * bytes (cyclic). */
  private def encodeBmp(text: Array[Byte]): Array[Byte] = {
    val n = text.length
    val (w, h) = bmpDims(n)
    val rowSize = (3 * w + 3) / 4 * 4
    val dataSize = rowSize * h
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(54 + dataSize).putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < rowSize) {
        buf.put(
          if (c < 3 * w && n > 0) text((r * 3 * w + c) % n) else 0.toByte)
        c += 1
      }
      r += 1
    }
    buf.array()
  }

  /** A real canonical PCM-16 RIFF/WAVE: "fmt " + "data" chunks, one
    * sample per text byte (centered and scaled to 16 bit). */
  private def encodeWav(text: Array[Byte]): Array[Byte] = {
    val n = text.length
    val (ch, sr) = wavShape(n)
    val dataSize = n * ch * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(ch.toShort)
      .putInt(sr).putInt(sr * ch * 2).putShort((ch * 2).toShort).putShort(16)
    buf.put("data".getBytes).putInt(dataSize)
    var i = 0
    while (i < n) {
      val s = (((text(i) & 0xff) - 128) << 8).toShort
      var c = 0
      while (c < ch) { buf.putShort(s); c += 1 }
      i += 1
    }
    buf.array()
  }

  /** PNG geometry from the utf-8 byte length `n` — shared with the
    * DuckDB oracle like [[bmpDims]]. Height ≥ 5 whenever n ≥ 4, so all
    * five PNG filter types appear in any realistic payload. */
  private[graft] def pngDims(n: Int): (Int, Int) =
    (1 + n % 60, 1 + (n * 11) % 47)

  private val PNG_SIG =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def crc32(parts: Array[Byte]*): Int = {
    val c = new java.util.zip.CRC32
    parts.foreach(c.update)
    c.getValue.toInt
  }

  private def chunk(buf: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).putInt(data.length).array()
    val t = typ.getBytes("US-ASCII")
    val crc = ByteBuffer.allocate(4).putInt(crc32(t, data)).array()
    buf.write(len); buf.write(t); buf.write(data); buf.write(crc)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** A real 8-bit RGB PNG (the COMPRESSED container the BMP/WAV pair
    * lacks): IHDR + zlib-deflated IDAT + IEND, CRC32 on every chunk.
    * Pixels are the text bytes cycled over w·h RGB samples; each
    * scanline is filtered with filter type `row % 5`, so a decoder
    * must reverse all five standard filters (None/Sub/Up/Average/
    * Paeth) to recover the data. The compressed stream is split into
    * two IDAT chunks (the spec allows any split; decoders must
    * concatenate). */
  private[graft] def encodePng(text: Array[Byte]): Array[Byte] = {
    val n = text.length
    val (w, h) = pngDims(n)
    val bpp = 3
    val stride = w * bpp
    val raw = new Array[Byte](h * (1 + stride))
    var r = 0
    while (r < h) {
      val f = r % 5
      raw(r * (1 + stride)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = if (n > 0) text((r * stride + x) % n) & 0xff else 0
        val left = if (x >= bpp)
          (if (n > 0) text((r * stride + x - bpp) % n) & 0xff else 0) else 0
        val up = if (r > 0)
          (if (n > 0) text(((r - 1) * stride + x) % n) & 0xff else 0) else 0
        val ul = if (r > 0 && x >= bpp)
          (if (n > 0) text(((r - 1) * stride + x - bpp) % n) & 0xff else 0)
        else 0
        val filtered = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(r * (1 + stride) + 1 + x) = filtered.toByte
        x += 1
      }
      r += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!deflater.finished())
      comp.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val idat = comp.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(PNG_SIG)
    val ihdr = ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte) // 8-bit RGB
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    chunk(out, "IHDR", ihdr)
    val split = idat.length / 2
    chunk(out, "IDAT", java.util.Arrays.copyOfRange(idat, 0, split))
    chunk(out, "IDAT",
      java.util.Arrays.copyOfRange(idat, split, idat.length))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def be32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) << 24 | (b(off + 1) & 0xff) << 16 |
      (b(off + 2) & 0xff) << 8 | (b(off + 3) & 0xff)

  private[graft] def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (0 until 8).forall(i => b(i) == PNG_SIG(i))

  /** Full PNG decode: CRC-checked chunk walk, IHDR parse, multi-IDAT
    * zlib inflate, per-scanline de-filtering of all five standard
    * filter types. Returns (width, height, channels, pixels) with
    * `pixels` the recovered raw samples (row-major, no filter bytes),
    * or None for anything invalid — bad signature, truncated or
    * CRC-corrupt chunks, non-8-bit or interlaced images, an inflated
    * size that disagrees with the header, or a geometry too large to
    * buffer (untrusted input must be bounded, not trusted). */
  private[graft] def parsePng(
      b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (!isPng(b)) return None
    var off = 8
    var w = 0; var h = 0; var channels = 0
    var seenIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var seenIend = false
    while (!seenIend && off + 12 <= b.length) {
      val len = be32(b, off)
      if (len < 0 || off + 12L + len > b.length) return None
      val typ = new String(b, off + 4, 4, "US-ASCII")
      val crcStored = be32(b, off + 8 + len)
      val crcReal = {
        val c = new java.util.zip.CRC32
        c.update(b, off + 4, 4 + len)
        c.getValue.toInt
      }
      if (crcStored != crcReal) return None // corrupt chunk
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(b, off + 8); h = be32(b, off + 12)
          val bitDepth = b(off + 16) & 0xff
          channels = (b(off + 17) & 0xff) match {
            case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
            case _ => return None // palette / invalid
          }
          val interlace = b(off + 20) & 0xff
          if (bitDepth != 8 || interlace != 0) return None
          if (w <= 0 || h <= 0 ||
            w.toLong * h * channels > (1L << 26)) return None
          seenIhdr = true
        case "IDAT" => idat.write(b, off + 8, len)
        case "IEND" => seenIend = true
        case _ => // ancillary chunk: CRC already checked, skip
      }
      off += 12 + len
    }
    if (!seenIhdr || !seenIend) return None
    val stride = w * channels
    val expect = h * (1 + stride)
    val raw = new Array[Byte](expect)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < expect && !inflater.finished()) {
        val k = inflater.inflate(raw, got, expect - got)
        if (k == 0 && inflater.needsInput()) return None // truncated
        got += k
      }
      if (got != expect || inflater.getRemaining > 0) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()
    // de-filter in place into the output pixel array
    val pixels = new Array[Byte](h * stride)
    val bpp = channels
    var r = 0
    while (r < h) {
      val f = raw(r * (1 + stride)) & 0xff
      if (f > 4) return None
      var x = 0
      while (x < stride) {
        val v = raw(r * (1 + stride) + 1 + x) & 0xff
        val left = if (x >= bpp) pixels(r * stride + x - bpp) & 0xff else 0
        val up = if (r > 0) pixels((r - 1) * stride + x) & 0xff else 0
        val ul = if (r > 0 && x >= bpp)
          pixels((r - 1) * stride + x - bpp) & 0xff else 0
        val rec = f match {
          case 0 => v
          case 1 => v + left
          case 2 => v + up
          case 3 => v + (left + up) / 2
          case 4 => v + paeth(left, up, ul)
        }
        pixels(r * stride + x) = rec.toByte
        x += 1
      }
      r += 1
    }
    Some((w, h, channels, pixels))
  }

  /** Model ALL documents as PNG images (the compressed-container
    * variant of [[asMedia]]). */
  def asPngMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          MediaRow(id, "image/png", encodePng(text.getBytes("UTF-8")))
        }
      }
      .toDF()
  }

  case class PngStatsRow(doc_id: Long, width: Int, height: Int,
      channels: Int, px_sum: Long)

  /** Decode PNG payloads through the FULL pipeline — CRC walk, inflate,
    * de-filter — and emit the recovered geometry plus the sum of all
    * recovered pixel bytes. The checksum is a function of the original
    * (pre-compression) pixels, so an external oracle that never runs
    * zlib can still verify the decompression + de-filtering round trip
    * byte-for-byte. Partition-mapped, no shuffle. */
  def pngPixelStats(spark: SparkSession, media: DataFrame)
      : Dataset[PngStatsRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        parsePng(m.payload) match {
          case Some((w, h, c, px)) =>
            var s = 0L; var i = 0
            while (i < px.length) { s += px(i) & 0xff; i += 1 }
            PngStatsRow(m.doc_id, w, h, c, s)
          case None => PngStatsRow(m.doc_id, 0, 0, 0, -1L)
        }
      }
    }
  }

  case class PngResizeRow(doc_id: Long, src_w: Int, src_h: Int,
      width: Int, height: Int, px_sum: Long)

  /** Nearest-neighbor ½× resize over the FULL decode pipeline: CRC
    * walk, inflate, de-filter, then a real materialized downsample of
    * the recovered pixel buffer (every output byte is copied from its
    * source pixel — not an index trick), with the resized checksum so
    * an external oracle can verify every sampled byte. Odd dimensions
    * round up ((w+1)/2), so 1-pixel images survive. Partition-mapped,
    * no shuffle — the resize stage of an image pipeline is pure map
    * work at any corpus size. */
  def pngResize(spark: SparkSession, media: DataFrame)
      : Dataset[PngResizeRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        parsePng(m.payload) match {
          case Some((w, h, c, px)) =>
            val w2 = (w + 1) / 2; val h2 = (h + 1) / 2
            val out = new Array[Byte](w2 * h2 * c)
            var y = 0
            while (y < h2) {
              var x = 0
              while (x < w2) {
                var ch = 0
                while (ch < c) {
                  out((y * w2 + x) * c + ch) =
                    px(((2 * y) * w + 2 * x) * c + ch)
                  ch += 1
                }
                x += 1
              }
              y += 1
            }
            var s = 0L; var i = 0
            while (i < out.length) { s += out(i) & 0xff; i += 1 }
            PngResizeRow(m.doc_id, w, h, w2, h2, s)
          case None => PngResizeRow(m.doc_id, 0, 0, 0, 0, -1L)
        }
      }
    }
  }

  /** Model documents as media blobs: even doc_id → BMP image, odd →
    * WAV audio, both genuinely encoded from the text bytes. */
  def asMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          if (id % 2 == 0) MediaRow(id, "image/bmp", encodeBmp(bytes))
          else MediaRow(id, "audio/wav", encodeWav(bytes))
        }
      }
      .toDF()
  }

  // --- real header parsing ----------------------------------------------

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | (b(off + 1) & 0xff) << 8 |
      (b(off + 2) & 0xff) << 16 | (b(off + 3) & 0xff) << 24
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | (b(off + 1) & 0xff) << 8

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B' && b(1) == 'M'
  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E'

  /** (width, height, bitsPerPixel/8, pixelDataOffset, rowSize) from a
    * BITMAPINFOHEADER BMP, or None for a header whose geometry cannot
    * be walked safely (non-positive dims, unsupported bpp, pixel data
    * past the buffer) — magic sniffing admits arbitrary binary, so the
    * parser must reject rather than index out of bounds. Height may be
    * stored negative (top-down). */
  private def parseBmp(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    val w = le32(b, 18)
    val h = math.abs(le32(b, 22))
    val chan = le16(b, 28) / 8
    val off = le32(b, 10)
    if (w <= 0 || h <= 0 || chan < 1 || chan > 4 || off < 54) return None
    val rowSize = (chan.toLong * w + 3) / 4 * 4
    if (rowSize > Int.MaxValue ||
      off.toLong + rowSize * h > b.length) return None
    Some((w, h, chan, off, rowSize.toInt))
  }

  /** Walk RIFF chunks for "fmt " and "data":
    * (channels, sampleRate, nSamples, dataOffset), or None when no
    * valid PCM-16 fmt+data pair is found. Chunk sizes are untrusted:
    * a non-positive or overflowing size ends the walk instead of
    * spinning or walking backwards. */
  private def parseWav(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    var off = 12L
    var ch = 0; var sr = 0; var nSamples = 0; var dataOff = -1
    while (off + 8 <= b.length) {
      val size = le32(b, off.toInt + 4).toLong & 0xffffffffL
      val id = new String(b, off.toInt, 4, "US-ASCII")
      if (id == "fmt ") {
        // the 16-byte PCM fmt body must actually fit in the buffer: a
        // hostile chunk header placed in the last few bytes would
        // otherwise index past the end — reject, don't crash the task
        if (off + 16 > b.length || size < 16) return None
        ch = le16(b, off.toInt + 10)
        sr = le32(b, off.toInt + 12)
      } else if (id == "data" && ch >= 1 && ch <= 8 &&
          off + 8 + size <= b.length) {
        nSamples = (size / (ch * 2)).toInt
        dataOff = off.toInt + 8
      }
      off += 8 + size + (size & 1) // RIFF chunks are 2-byte aligned
    }
    if (ch >= 1 && ch <= 8 && dataOff >= 0) Some((ch, sr, nSamples, dataOff))
    else None
  }

  /** Decode each payload into typed media metadata by parsing the REAL
    * container headers (magic-sniffed, not trusted from media_type).
    * Images: (width, height, channels) from the BMP header. Audio:
    * width = sample count, height = sample rate, channels from the fmt
    * chunk. Partition-mapped: no shuffle, constant memory per batch —
    * the shape a real decoder needs at 100 TB. */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val b = m.payload
        val parsed =
          if (isBmp(b)) parseBmp(b).map { case (w, h, chan, _, _) =>
            DecodedRow(m.doc_id, m.media_type, b.length, w, h, chan)
          }
          else if (isWav(b)) parseWav(b).map { case (ch, sr, nSamples, _) =>
            DecodedRow(m.doc_id, m.media_type, b.length, nSamples, sr, ch)
          }
          else if (isPng(b)) parsePng(b).map { case (w, h, chan, _) =>
            DecodedRow(m.doc_id, m.media_type, b.length, w, h, chan)
          }
          else None
        parsed.getOrElse(
          DecodedRow(m.doc_id, m.media_type, b.length, 0, 0, 0))
      }
    }
  }

  /** Feature extraction: payload → fixed-size float vector computed
    * from the DECODED samples. Images: per-channel means (B, G, R, in
    * [0,1]) over the real pixel rows (padding skipped) + normalized
    * geometry. Audio: RMS, mean amplitude and zero-crossing rate over
    * the real 16-bit samples + normalized shape. The output schema
    * (`array<float>`) plugs directly into [[Similarity]] /
    * [[Dedup.embeddingNearDup]]. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[FeatureRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val b = m.payload
        val f = new Array[Float](8)
        if (isBmp(b) && parseBmp(b).isDefined) {
          val (w, h, chan, off, rowSize) = parseBmp(b).get
          // sized by the parsed channel count (1..4 admitted), summed
          // per channel; only the first three means are reported
          val sums = new Array[Long](math.max(chan, 3))
          var r = 0
          while (r < h) {
            var c = 0
            while (c < w * chan) {
              sums(c % chan) += b(off + r * rowSize + c) & 0xff
              c += 1
            }
            r += 1
          }
          val nPix = math.max(1L, w.toLong * h)
          f(0) = (sums(0).toDouble / (255.0 * nPix)).toFloat
          f(1) = (sums(1).toDouble / (255.0 * nPix)).toFloat
          f(2) = (sums(2).toDouble / (255.0 * nPix)).toFloat
          f(3) = w / 1024f
          f(4) = h / 1024f
          f(5) = chan / 4f
        } else if (isPng(b) && parsePng(b).isDefined) {
          // channel means over the RECOVERED (inflated + de-filtered)
          // samples — the compressed-format twin of the BMP branch
          val (w, h, chan, px) = parsePng(b).get
          val sums = new Array[Long](math.max(chan, 3))
          var i = 0
          while (i < px.length) {
            sums(i % chan) += px(i) & 0xff
            i += 1
          }
          val nPix = math.max(1L, w.toLong * h)
          f(0) = (sums(0).toDouble / (255.0 * nPix)).toFloat
          f(1) = (sums(1 % chan).toDouble / (255.0 * nPix)).toFloat
          f(2) = (sums(2 % chan).toDouble / (255.0 * nPix)).toFloat
          f(3) = w / 1024f
          f(4) = h / 1024f
          f(5) = chan / 4f
        } else if (isWav(b) && parseWav(b).isDefined) {
          val (ch, sr, nSamples, dataOff) = parseWav(b).get
          val total = nSamples * ch
          var i = 0; var sumSq = 0.0; var sumAbs = 0.0
          var crossings = 0; var prev = 0
          while (i < total) {
            val s = (le16(b, dataOff + i * 2).toShort).toInt
            sumSq += s.toDouble * s; sumAbs += math.abs(s)
            if (i > 0 && (s ^ prev) < 0) crossings += 1
            prev = s
            i += 1
          }
          val n = math.max(1, total)
          f(0) = (math.sqrt(sumSq / n) / 32768.0).toFloat
          f(1) = (sumAbs / n / 32768.0).toFloat
          f(2) = crossings.toFloat / n
          f(3) = ch / 4f
          f(4) = sr / 48000f
          f(5) = nSamples / 65536f
        }
        FeatureRow(m.doc_id, f)
      }
    }
  }

  /** Frame sampling against the real container structure: images emit
    * every `everyK`-th SCANLINE top-down (padding stripped, bottom-up
    * storage accounted for); audio emits every `everyK`-th block of
    * `frameSize` samples. Explode shape: one row per frame, ordered
    * frame_idx. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameSize: Int = 256, everyK: Int = 4): Dataset[FrameRow] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { m =>
      val b = m.payload
      if (isBmp(b) && parseBmp(b).isDefined) {
        val (w, h, chan, off, rowSize) = parseBmp(b).get
        (0 until h by everyK).map { idx =>
          val srcRow = h - 1 - idx // bottom-up storage → top-down frames
          FrameRow(m.doc_id, idx, java.util.Arrays.copyOfRange(
            b, off + srcRow * rowSize, off + srcRow * rowSize + w * chan))
        }
      } else if (isPng(b) && parsePng(b).isDefined) {
        // scanlines come back already top-down and padding-free from
        // the de-filtering decode
        val (w, h, chan, px) = parsePng(b).get
        (0 until h by everyK).map { idx =>
          FrameRow(m.doc_id, idx, java.util.Arrays.copyOfRange(
            px, idx * w * chan, (idx + 1) * w * chan))
        }
      } else if (isWav(b) && parseWav(b).isDefined) {
        val (ch, _, nSamples, dataOff) = parseWav(b).get
        val nFrames = math.max(1, nSamples / frameSize)
        (0 until nFrames by everyK).map { idx =>
          val from = dataOff + idx * frameSize * ch * 2
          val until = math.min(from + frameSize * ch * 2, b.length)
          FrameRow(m.doc_id, idx,
            java.util.Arrays.copyOfRange(b, from, until))
        }
      } else Seq(FrameRow(m.doc_id, 0, b))
    }
  }

  case class AudioStatsRow(doc_id: Long, channels: Int, sample_rate: Int,
      n_samples: Int, sum_sq: Long, sum_abs: Long, crossings: Long)

  /** Model EVERY document as a WAV payload (the audio twin of
    * [[asPngMedia]]): one PCM-16 sample per text byte, channel count
    * and sample rate derived from the byte length ([[wavShape]]). */
  def asWavMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          MediaRow(id, "audio/wav", encodeWav(text.getBytes("UTF-8")))
        }
      }
      .toDF()
  }

  /** Exact-integer audio features over the REAL RIFF decode: total
    * energy (sum of squared samples), total magnitude and
    * zero-crossing count across the interleaved PCM-16 stream, plus
    * the fmt-chunk shape. All three accumulators are exact integers —
    * unlike a float RMS they are invariant to accumulation order, so
    * an external oracle can re-derive them bit-for-bit from the
    * source bytes and any mis-parsed or mis-scaled sample anywhere in
    * the chunk walk fails the hash. A crossing is a sign change
    * between consecutive interleaved samples (zero counts as
    * positive); channels carry duplicated samples, so per-frame
    * duplicates never cross — the count equals the per-channel count.
    * Partition-mapped: no shuffle, constant memory per row. */
  def audioStats(spark: SparkSession, media: DataFrame)
      : Dataset[AudioStatsRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val b = m.payload
        parseWav(b) match {
          case Some((ch, sr, nSamples, dataOff)) =>
            val total = nSamples * ch
            var i = 0
            var sumSq = 0L; var sumAbs = 0L; var crossings = 0L
            var prev = 0
            while (i < total) {
              val s = le16(b, dataOff + i * 2).toShort.toInt
              sumSq += s.toLong * s
              sumAbs += math.abs(s).toLong
              if (i > 0 && (s ^ prev) < 0) crossings += 1
              prev = s
              i += 1
            }
            AudioStatsRow(m.doc_id, ch, sr, nSamples, sumSq, sumAbs,
              crossings)
          case None => AudioStatsRow(m.doc_id, 0, 0, 0, 0L, 0L, 0L)
        }
      }
    }
  }

  case class PHashRow(doc_id: Long, sig: Long)

  /** 64-bit dHash perceptual signature over the DECODED image: the
    * recovered pixels are nearest-neighbor-sampled onto a 9×8 grid
    * (src (⌊gx·w/9⌋, ⌊gy·h/8⌋) — works for any geometry, small images
    * just repeat pixels), each cell reduced to an integer gray
    * ((r+g+b) div 3), and bit gy·8+gx set iff gray(gx,gy) <
    * gray(gx+1,gy) — the classic difference-hash gradient signature.
    * All-integer, so an external oracle replays it position-exactly
    * (the resize-oracle discipline). PNG payloads run the FULL decode
    * (CRC walk, inflate, de-filter); non-PNG rows are dropped.
    * Partition-mapped, no shuffle; feeds [[Dedup.hammingPairsFromSigs]]
    * for banded perceptual dedup. */
  def dHash(spark: SparkSession, media: DataFrame): Dataset[PHashRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.flatMap { m =>
        val b = m.payload
        if (!isPng(b)) None
        else parsePng(b).map { case (w, h, chan, px) =>
          val grays = new Array[Int](72)
          var gy = 0
          while (gy < 8) {
            val sy = gy * h / 8
            var gx = 0
            while (gx < 9) {
              val sx = gx * w / 9
              val p = (sy * w + sx) * chan
              grays(gy * 9 + gx) =
                if (chan >= 3)
                  ((px(p) & 0xff) + (px(p + 1) & 0xff) +
                    (px(p + 2) & 0xff)) / 3
                else px(p) & 0xff
              gx += 1
            }
            gy += 1
          }
          var sig = 0L
          var k = 0
          while (k < 64) {
            if (grays((k / 8) * 9 + k % 8) < grays((k / 8) * 9 + k % 8 + 1))
              sig |= 1L << k
            k += 1
          }
          PHashRow(m.doc_id, sig)
        }
      }
    }
  }

  // --- Video: RIFF AVI ---------------------------------------------

  /** Video geometry from the utf-8 byte length `n` — shared with the
    * DuckDB oracle like [[bmpDims]]/[[pngDims]]: (width, height,
    * frame count). Small frames, 2–7 frames, so every doc exercises
    * multi-frame walking and the every-2nd-frame sample keeps ≥1
    * frame. */
  private[graft] def videoShape(n: Int): (Int, Int, Int) =
    (1 + n % 24, 1 + (n * 5) % 18, 2 + n % 6)

  private def leInt(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  /** A real RIFF AVI container: `RIFF('AVI ' LIST('hdrl' avih
    * LIST('strl' strh strf)) LIST('movi' '00db'×F))` per the public
    * RIFF/AVI spec — MainAVIHeader + a 'vids'/'DIB ' stream of
    * uncompressed bottom-up 24-bit DIB frames (4-byte-aligned rows,
    * logical row r stored at physical row h−1−r like any BMP). Frame
    * f's logical pixel p carries text byte (f·3wh + p) mod n (cyclic,
    * zeros for empty text) — the same byte-cycling contract as the
    * BMP/PNG encoders, so an external oracle re-derives every sampled
    * byte from the raw text. */
  private[graft] def encodeAvi(text: Array[Byte]): Array[Byte] = {
    val n = text.length
    val (w, h, frames) = videoShape(n)
    val rowSize = (3 * w + 3) / 4 * 4
    val frameSize = rowSize * h
    def frameData(f: Int): Array[Byte] = {
      val a = new Array[Byte](frameSize)
      var r = 0
      while (r < h) {
        var c = 0
        while (c < 3 * w) {
          a((h - 1 - r) * rowSize + c) =
            if (n > 0) text((f * 3 * w * h + r * 3 * w + c) % n)
            else 0.toByte
          c += 1
        }
        r += 1
      }
      a
    }
    val out = new java.io.ByteArrayOutputStream()
    // avih: MainAVIHeader (56 bytes)
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(66667).putInt(frameSize * 15).putInt(0).putInt(0)
      .putInt(frames).putInt(0).putInt(1).putInt(frameSize)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    // strh: AVIStreamHeader (56 bytes), 'vids' / 'DIB '
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("US-ASCII")).put("DIB ".getBytes("US-ASCII"))
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(15).putInt(0).putInt(frames)
      .putInt(frameSize).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    // strf: BITMAPINFOHEADER (40 bytes)
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(frameSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    val strl = new java.io.ByteArrayOutputStream()
    strl.write("strl".getBytes("US-ASCII"))
    writeChunk(strl, "strh", strh.array())
    writeChunk(strl, "strf", strf.array())
    val hdrl = new java.io.ByteArrayOutputStream()
    hdrl.write("hdrl".getBytes("US-ASCII"))
    writeChunk(hdrl, "avih", avih.array())
    writeChunk(hdrl, "LIST", strl.toByteArray)
    val movi = new java.io.ByteArrayOutputStream()
    movi.write("movi".getBytes("US-ASCII"))
    (0 until frames).foreach(f => writeChunk(movi, "00db", frameData(f)))
    val riffBody = new java.io.ByteArrayOutputStream()
    riffBody.write("AVI ".getBytes("US-ASCII"))
    writeChunk(riffBody, "LIST", hdrl.toByteArray)
    writeChunk(riffBody, "LIST", movi.toByteArray)
    writeChunk(out, "RIFF", riffBody.toByteArray)
    out.toByteArray
  }

  private def writeChunk(b: java.io.ByteArrayOutputStream, id: String,
      data: Array[Byte]): Unit = {
    b.write(id.getBytes("US-ASCII"))
    b.write(leInt(data.length))
    b.write(data)
    if (data.length % 2 == 1) b.write(0)
  }

  private[graft] def isAvi(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'A' && b(9) == 'V' && b(10) == 'I' &&
      b(11) == ' '

  /** Full RIFF walk: verify the RIFF/'AVI ' envelope, read
    * MainAVIHeader geometry from hdrl/avih, confirm the stream is
    * 'vids' with a consistent 24-bpp BITMAPINFOHEADER, then collect
    * every '00db' frame from the movi LIST — sizes checked against
    * the header geometry, rows de-padded and un-flipped back to
    * logical order. Returns (w, h, frames, logicalPixels per frame);
    * None on any structural violation (truncation, bad magic, frame
    * count/size mismatch, non-vids stream). */
  private[graft] def parseAvi(b: Array[Byte])
      : Option[(Int, Int, Int, Array[Array[Byte]])] = {
    if (!isAvi(b)) return None
    val riffSize = le32(b, 4)
    if (riffSize + 8 > b.length) return None
    var w = -1; var h = -1; var frames = -1
    var sawVids = false
    val frameBufs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def walk(off0: Int, end: Int): Boolean = {
      var off = off0
      while (off + 8 <= end) {
        val id = new String(b, off, 4, "US-ASCII")
        val sz = le32(b, off + 4)
        val body = off + 8
        // bounds math in LONG: a hostile size like 0x7FFFFFFF would
        // wrap `body + sz` negative in Int and slip past the check,
        // crashing the copy instead of rejecting the container
        if (sz < 0 || body.toLong + sz > end) return false
        if (id == "LIST") {
          if (sz < 4) return false
          // recurse into hdrl/strl/movi with the 4-byte kind skipped
          if (!walk(body + 4, body + sz)) return false
        } else if (id == "avih") {
          if (sz < 56) return false
          frames = le32(b, body + 16)
          w = le32(b, body + 32)
          h = le32(b, body + 36)
        } else if (id == "strh") {
          if (sz < 8) return false
          sawVids = new String(b, body, 4, "US-ASCII") == "vids"
        } else if (id == "strf") {
          if (sz < 40) return false
          if (le32(b, body + 4) != w || le32(b, body + 8) != h ||
            le16(b, body + 14) != 24) return false
        } else if (id == "00db") {
          frameBufs += java.util.Arrays.copyOfRange(b, body, body + sz)
        }
        off = body + sz + (sz % 2) // RIFF word alignment
      }
      true
    }
    if (!walk(12, 8 + riffSize)) return None
    if (w <= 0 || h <= 0 || frames < 0 || !sawVids) return None
    if (frameBufs.length != frames) return None
    val rowSize = (3 * w + 3) / 4 * 4
    if (frameBufs.exists(_.length != rowSize * h)) return None
    val logical = frameBufs.map { fb =>
      val a = new Array[Byte](3 * w * h)
      var r = 0
      while (r < h) {
        System.arraycopy(fb, (h - 1 - r) * rowSize, a, r * 3 * w, 3 * w)
        r += 1
      }
      a
    }.toArray
    Some((w, h, frames, logical))
  }

  /** Model every document as a real AVI (mapPartitions, like
    * [[asPngMedia]]). */
  def asAviMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          MediaRow(id, "video/avi", encodeAvi(text.getBytes("UTF-8")))
        }
      }
      .toDF()
  }

  case class VideoStatsRow(doc_id: Long, width: Int, height: Int,
      n_frames: Int, n_sampled: Int, px_sum: Long)

  /** Frame-sampling decode — the video stage of a multimodal
    * pipeline: full RIFF walk, keep every `step`-th frame (the
    * keyframe-sampling move that turns hours of video into a bounded
    * frame set for feature extraction), and checksum the SAMPLED
    * frames' recovered logical pixels so an external oracle verifies
    * both the container round trip and the sampling arithmetic.
    * Partition-mapped, no shuffle. */
  def aviFrameSample(spark: SparkSession, media: DataFrame,
      step: Int = 2): Dataset[VideoStatsRow] = {
    require(step >= 1)
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        parseAvi(m.payload) match {
          case Some((w, h, frames, px)) =>
            var s = 0L
            var sampled = 0
            var f = 0
            while (f < frames) {
              if (f % step == 0) {
                sampled += 1
                val a = px(f)
                var i = 0
                while (i < a.length) { s += a(i) & 0xff; i += 1 }
              }
              f += 1
            }
            VideoStatsRow(m.doc_id, w, h, frames, sampled, s)
          case None => VideoStatsRow(m.doc_id, 0, 0, 0, 0, -1L)
        }
      }
    }
  }

  /** End-to-end pipeline used by the declared query: media modeling →
    * real header decode → per-type size/shape stats. Aggregation is
    * plain groupBy — fully distributed, no driver materialization. */
  def pipelineStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val decoded = decodeMeta(spark, asMedia(docs))
    decoded.groupBy("media_type")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("byte_len").cast("long")).as("total_bytes"),
        min("width").as("min_w"), max("width").as("max_w"),
        min("height").as("min_h"), max("height").as("max_h"))
      .orderBy("media_type")
  }
}
