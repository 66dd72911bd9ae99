package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media document: opaque bytes + typed sidecar metadata. The engine
  * never interprets `media` until a decoder runs — image/audio/video stay
  * a binary column, exactly like a 100 TB lakehouse media table with a
  * metadata sidecar (the `format`/`width`/`height` columns a crawler or
  * upstream extractor recorded).
  */
case class MediaRow(media_id: Long, media: Array[Byte], format: String,
                    width: Int, height: Int)

/** Decoder output: per-item feature record. `format`/`width`/`height`
  * are DECODED from the bytes (container header) when the container is
  * recognized; the sidecar metadata is only the fallback for opaque
  * payloads. `header_len` is the container-header length in bytes;
  * `content_*` statistics fold over the post-header payload bytes.
  */
case class MediaFeatures(media_id: Long, format: String, width: Int,
                         height: Int, header_len: Int, n_bytes: Long,
                         content_sum: Long, content_mean: Double,
                         content_first: Int, content_last: Int,
                         aspect: Double)

/** Pure-JVM image-container header parsing — the real decode step of the
  * multimodal column, zero native-codec dependency. Formats:
  *
  *  - PNG: 8-byte signature, then chunks of (u32 BE length, 4-byte type,
  *    data, u32 CRC); dimensions are the first two u32 BE fields of the
  *    IHDR chunk data (PNG spec §11.2.2 — IHDR is required first).
  *  - JPEG: SOI marker (FFD8), then marker segments of (FF, marker id,
  *    u16 BE length incl. itself); dimensions live in the frame header
  *    SOFn segment (precision u8, height u16 BE, width u16 BE). All SOF
  *    variants C0–CF are recognized except C4/C8/CC, which are DHT/JPG/
  *    DAC table segments, not frames (JPEG spec / ITU T.81 table B.1).
  *
  * Anything else parses to None — the caller falls back to sidecar
  * metadata and treats the payload as opaque.
  */
object ImageHeaders {

  /** @param headerLen bytes from offset 0 to the END of the dimension-
    *                  bearing header structure (IHDR chunk / SOF
    *                  segment) — the "container header" boundary the
    *                  feature extractor uses to split header vs content.
    */
  final case class Parsed(format: String, width: Int, height: Int,
                          headerLen: Int)

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  def parse(bytes: Array[Byte]): Option[Parsed] =
    parsePng(bytes).orElse(parseJpeg(bytes))

  def parsePng(b: Array[Byte]): Option[Parsed] = {
    if (b.length < 33 || !b.take(8).sameElements(PngSig)) return None
    // Walk chunks defensively (IHDR must be first per spec, but a parser
    // that trusts that is one malformed file from reading garbage).
    var pos = 8
    while (pos + 12 <= b.length) {
      val len = be32(b, pos)
      val tpe = new String(b, pos + 4, 4, "US-ASCII")
      if (tpe == "IHDR") {
        if (len != 13 || pos + 12 + 13 > b.length) return None
        val w = be32(b, pos + 8)
        val h = be32(b, pos + 12)
        if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
        return Some(Parsed("png", w.toInt, h.toInt, pos + 12 + 13))
      }
      if (len > Int.MaxValue - 12L - pos) return None
      pos += 12 + len.toInt
    }
    None
  }

  def parseJpeg(b: Array[Byte]): Option[Parsed] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var pos = 2
    while (pos + 4 <= b.length) {
      // fill bytes: any number of FFs may pad before a marker id
      if (u8(b, pos) != 0xff) return None
      var mp = pos
      while (mp < b.length && u8(b, mp) == 0xff) mp += 1
      if (mp >= b.length) return None
      val marker = u8(b, mp)
      marker match {
        case m if m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          // SOFn frame header: len(2) precision(1) height(2) width(2) …
          if (mp + 8 > b.length) return None
          val len = be16(b, mp + 1)
          if (len < 8 || mp + 1 + len > b.length) return None
          val h = be16(b, mp + 4)
          val w = be16(b, mp + 6)
          if (w <= 0 || h <= 0) return None
          return Some(Parsed("jpeg", w, h, mp + 1 + len))
        case 0xd8 | 0x01 => pos = mp + 1 // standalone: no length field
        case m if m >= 0xd0 && m <= 0xd7 => pos = mp + 1 // RSTn
        case 0xd9 => return None // EOI before any frame header
        case _ =>
          if (mp + 3 > b.length) return None
          val len = be16(b, mp + 1)
          if (len < 2) return None
          pos = mp + 1 + len
      }
    }
    None
  }
}

/** Audio-container row/feature records — the audio twin of
  * [[MediaRow]]/[[MediaFeatures]]: opaque bytes + sidecar (channels,
  * sample rate), features DECODED from the RIFF/WAVE header when the
  * container is recognized. Frame/duration arithmetic is exact integer
  * (`n_frames = data_len / block_align`, `duration_ms = n_frames·1000
  * / sample_rate`, both floor) so the oracle reproduces it bit-for-bit.
  */
case class AudioRow(media_id: Long, media: Array[Byte], format: String,
                    channels: Int, sample_rate: Int)
case class AudioFeatures(media_id: Long, format: String, channels: Int,
                         sample_rate: Int, bits_per_sample: Int,
                         data_len: Long, n_frames: Long, duration_ms: Long,
                         header_len: Int, n_bytes: Long, content_sum: Long)

/** Pure-JVM WAV (RIFF/WAVE) header parsing — the audio analogue of
  * [[ImageHeaders]], zero native-codec dependency. Layout (RIFF spec /
  * WAVE PCM): "RIFF" + u32 LE riff-size + "WAVE", then chunks of
  * (4-byte id, u32 LE size, data, odd sizes padded to even). The "fmt "
  * chunk carries (audio format u16, channels u16, sample rate u32, byte
  * rate u32, block align u16, bits/sample u16), all little-endian; the
  * "data" chunk carries the samples. Dimensions of the decode:
  * channels, sample rate, bits/sample, and the data-chunk length as the
  * HEADER declares it (what real decoders report — a truncated file is
  * the reader's problem, not the header parser's).
  */
object AudioHeaders {

  /** @param headerLen bytes from offset 0 to the START of the data
    *                  chunk's samples — the header/content boundary.
    */
  final case class ParsedWav(channels: Int, sampleRate: Int,
                             bitsPerSample: Int, dataLen: Long,
                             headerLen: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  def parseWav(b: Array[Byte]): Option[ParsedWav] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
      return None
    // Walk chunks defensively (fmt before data per spec, but verify).
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    while (pos + 8 <= b.length) {
      val id = tag(b, pos)
      val size = le32(b, pos + 4)
      if (size > Int.MaxValue - 8L - pos) return None
      id match {
        case "fmt " =>
          if (size < 16 || pos + 8 + 16 > b.length) return None
          val channels = le16(b, pos + 10)
          val rate = le32(b, pos + 12)
          val bits = le16(b, pos + 22)
          if (channels <= 0 || rate <= 0 || rate > Int.MaxValue ||
            bits <= 0 || bits % 8 != 0) return None
          fmt = Some((channels, rate.toInt, bits))
        case "data" =>
          return fmt.map { case (ch, rate, bits) =>
            ParsedWav(ch, rate, bits, size, pos + 8)
          } // data before fmt → malformed → None
        case _ => ()
      }
      pos += 8 + size.toInt + (size.toInt & 1) // odd chunks pad to even
    }
    None
  }
}

/** Video-container row/feature records — the video member of the
  * [[MediaRow]]/[[AudioRow]] family: opaque bytes + sidecar (timescale,
  * track count), features DECODED from the ISO-BMFF (MP4) box
  * structure when the container is recognized. Duration arithmetic is
  * exact integer (`duration_ms = duration_ticks·1000 / timescale`,
  * floor) so the oracle reproduces it bit-for-bit.
  */
case class VideoRow(media_id: Long, media: Array[Byte], format: String,
                    timescale: Int, n_tracks: Int)
case class VideoFeatures(media_id: Long, format: String, brand: String,
                         timescale: Int, duration_ticks: Long,
                         n_tracks: Int, duration_ms: Long, data_len: Long,
                         header_len: Int, n_bytes: Long, content_sum: Long)

/** Pure-JVM ISO-BMFF (MP4/MOV family) box walking — the video analogue
  * of [[ImageHeaders]]/[[AudioHeaders]], zero native-codec dependency.
  * Layout (ISO/IEC 14496-12): a sequence of boxes, each a u32 BE size
  * (including the 8-byte header) + 4-char type; `ftyp` carries the
  * major brand, `moov` is a pure container whose `mvhd` child carries
  * (version/flags, creation, modification, timescale u32, duration
  * u32 — 64-bit in version 1 — …, next_track_ID u32 as its last
  * field), and `mdat` carries the media payload. Track count is
  * reported as next_track_ID − 1 (the spec's "smallest unused id" for
  * sequentially-numbered files) — the header-level answer that needs
  * no per-trak walk. size==1 (64-bit largesize) and size==0
  * (to-end-of-file) boxes are rejected as out of scope, like
  * progressive JPEG variants in [[ImageHeaders]].
  */
object VideoHeaders {

  final case class ParsedMp4(brand: String, timescale: Int,
                             durationTicks: Long, nextTrackId: Int,
                             dataLen: Long, headerLen: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** mvhd payload → (timescale, duration, next_track_id). */
  private def parseMvhd(b: Array[Byte], pos: Int,
                        size: Int): Option[(Int, Long, Int)] = {
    if (size < 8 + 4 + 20) return None
    val version = u8(b, pos + 8)
    val (tsOff, durLen) = version match {
      case 0 => (pos + 8 + 4 + 8, 4)  // u32 creation+modification
      case 1 => (pos + 8 + 4 + 16, 8) // u64 creation+modification
      case _ => return None
    }
    if (tsOff + 4 + durLen > pos + size) return None
    val timescale = be32(b, tsOff)
    val duration =
      if (durLen == 4) be32(b, tsOff + 4) else be64(b, tsOff + 4)
    if (timescale <= 0 || timescale > Int.MaxValue) return None
    // next_track_ID is the LAST u32 of the box
    val next = be32(b, pos + size - 4)
    if (next <= 0 || next > Int.MaxValue) return None
    Some((timescale.toInt, duration, next.toInt))
  }

  def parseMp4(b: Array[Byte]): Option[ParsedMp4] = {
    if (b.length < 12 || tag(b, 4) != "ftyp") return None
    var pos = 0
    var brand: Option[String] = None
    var mvhd: Option[(Int, Long, Int)] = None
    var mdat: Option[(Long, Int)] = None // (dataLen, headerLen)
    while (pos + 8 <= b.length) {
      val size = be32(b, pos)
      if (size < 8 || pos + size > b.length) return None // 0/1 = out of scope
      val sz = size.toInt
      tag(b, pos + 4) match {
        case "ftyp" =>
          if (sz < 16) return None
          brand = Some(tag(b, pos + 8))
        case "moov" => // container: walk children
          var cp = pos + 8
          while (cp + 8 <= pos + sz) {
            val csize = be32(b, cp)
            if (csize < 8 || cp + csize > pos + sz) return None
            if (tag(b, cp + 4) == "mvhd")
              mvhd = parseMvhd(b, cp, csize.toInt)
            cp += csize.toInt
          }
        case "mdat" =>
          if (mdat.isEmpty) mdat = Some((size - 8, pos + 8))
        case _ => ()
      }
      pos += sz
    }
    for {
      br <- brand; (ts, dur, next) <- mvhd; (dl, hl) <- mdat
    } yield ParsedMp4(br, ts, dur, next, dl, hl)
  }
}

/** Multimodal columns for a training-data pipeline: media as opaque
  * `binary` + typed sidecar metadata, with decode / feature-extract as a
  * BATCHED per-partition transform — the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage (iterator of batches in, iterator of batches
  * out, partitioning preserved, no shuffle).
  *
  * The default decoder ([[Multimodal.HeaderDecoder]]) performs a REAL
  * pure-JVM decode: it parses the PNG IHDR / JPEG SOF container headers
  * out of the bytes ([[ImageHeaders]]) for format + dimensions, and
  * folds byte statistics over the post-header payload. Full pixel/sample
  * decode stays pluggable behind the same [[Multimodal.MediaDecoder]]
  * contract (this container ships no codecs); every Spark-side piece —
  * schema, typed Dataset boundary, batch shape, narrow (shuffle-free)
  * execution — is decoder-independent. Batching matters for real
  * codecs: init and buffer reuse amortize across a batch, exactly the
  * reason mapInPandas feeds Arrow batches rather than single rows.
  */
object Multimodal {

  /** Pluggable decode + feature-extract contract. Implementations must
    * be deterministic per (bytes, metadata) for reproducible pipelines.
    */
  trait MediaDecoder extends Serializable {
    def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures]
  }

  /** Container-header decode (PNG/JPEG via [[ImageHeaders]]); payloads
    * with an unrecognized container are opaque — sidecar metadata
    * supplies format/dimensions and the whole payload counts as content
    * (header_len 0). Unsigned byte arithmetic in plain Scala — this is
    * the genuinely imperative per-partition path where mapPartitions is
    * the right tool (SURVEY.md §2.11: everything else stays Column
    * expressions).
    */
  object HeaderDecoder extends MediaDecoder {
    def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map { r =>
        val bytes = r.media
        val (fmt, w, h, hl) = ImageHeaders.parse(bytes) match {
          case Some(p) => (p.format, p.width, p.height, p.headerLen)
          case None    => (r.format, r.width, r.height, 0)
        }
        var sum = 0L
        var i = hl
        while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
        val n = bytes.length - hl
        MediaFeatures(r.media_id, fmt, w, h,
          header_len = hl,
          n_bytes = bytes.length.toLong,
          content_sum = sum,
          content_mean = if (n == 0) 0.0 else sum.toDouble / n,
          content_first = if (n == 0) -1 else bytes(hl) & 0xff,
          content_last = if (n == 0) -1 else bytes(bytes.length - 1) & 0xff,
          aspect = w.toDouble / h)
      }
  }

  private def be4(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
  private def be2(c: Column): Column = unhex(lpad(hex(c), 4, "0"))
  // little-endian fields (RIFF/WAVE): byte-reverse the hex pairs
  private def le4(c: Column): Column = {
    val hx = lpad(hex(c), 8, "0")
    concat(unhex(substring(hx, 7, 2)), unhex(substring(hx, 5, 2)),
      unhex(substring(hx, 3, 2)), unhex(substring(hx, 1, 2)))
  }
  private def le2(c: Column): Column = {
    val hx = lpad(hex(c), 4, "0")
    concat(unhex(substring(hx, 3, 2)), unhex(substring(hx, 1, 2)))
  }

  /** Deterministic media table synthesized from the documents corpus
    * (the container ships no real media files): the payload is a REAL
    * container header — a spec-valid PNG signature + IHDR chunk
    * (including its CRC-32) or JPEG SOI + SOF0 frame header — encoding
    * the row's dimensions, followed by the document's UTF-8 bytes as
    * the content section; every third row stays a raw opaque blob to
    * exercise the sidecar-fallback path. Header assembly is pure Column
    * arithmetic (hex/unhex/crc32/concat — all codegen'd), zero UDFs.
    * Downstream code sees the real thing: (binary, string, int, int).
    */
  def mediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val w = ((id % 8 + 1) * 64).cast("int")
    val h = ((id % 5 + 1) * 48).cast("int")
    // PNG: sig(8) | len=13(4) | "IHDR" w h bit=8 color=2 comp=filt=inter=0 | crc(4)
    val ihdr = concat(lit("IHDR").cast("binary"), be4(w), be4(h),
      unhex(lit("0802000000")))
    val png = concat(unhex(lit("89504E470D0A1A0A")), unhex(lit("0000000D")),
      ihdr, be4(crc32(ihdr)))
    // JPEG: SOI | SOF0 len=11 precision=8 | h(2) w(2) | 1 component (1,0x11,0)
    val jpeg = concat(unhex(lit("FFD8FFC0000B08")), be2(h), be2(w),
      unhex(lit("01011100")))
    val header = when(id % 3 === 0, png)
      .when(id % 3 === 1, jpeg)
      .otherwise(lit(Array.emptyByteArray))
    docs.select(
      id.cast("long").as("media_id"),
      concat(header, col(textCol).cast("binary")).as("media"),
      element_at(array(lit("png"), lit("jpeg"), lit("bin")),
        (id % 3).cast("int") + 1).as("format"),
      w.as("width"),
      h.as("height"))
  }

  /** Batched per-partition decode: iterator-of-batches in/out, narrow
    * (no shuffle, upstream partitioning preserved), constant memory —
    * only `batchSize` items are materialized at once, so a 100 TB media
    * scan streams through executors regardless of file sizes.
    */
  def featurize(media: DataFrame, decoder: MediaDecoder = HeaderDecoder,
                batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => decoder.decodeBatch(b))
    }
  }

  /** Deterministic audio table synthesized from the documents corpus:
    * the payload is a spec-valid canonical 44-byte WAV header — RIFF
    * size, PCM "fmt " chunk (format 1, per-row channels/rate, 8-bit
    * samples so block align = channels), "data" chunk sized to the
    * document — followed by the document's UTF-8 bytes as the sample
    * section; every third row stays a raw opaque blob (sidecar-fallback
    * path). Header assembly is pure Column arithmetic, zero UDFs.
    */
  def audioTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val channels = (id % 2 + 1).cast("int")
    val rate = ((id % 4 + 1) * 8000).cast("int")
    val dataLen = length(col(textCol)).cast("int") // pure-ASCII corpus
    // fmt: PCM(1) channels rate byteRate(rate·channels·1) align(channels) bits(8)
    val fmtChunk = concat(lit("fmt ").cast("binary"), le4(lit(16)),
      le2(lit(1)), le2(channels), le4(rate), le4(rate * channels),
      le2(channels), le2(lit(8)))
    val wav = concat(lit("RIFF").cast("binary"), le4(dataLen + 36),
      lit("WAVE").cast("binary"), fmtChunk,
      lit("data").cast("binary"), le4(dataLen))
    val header = when(id % 3 === 2, lit(Array.emptyByteArray)).otherwise(wav)
    docs.select(
      id.cast("long").as("media_id"),
      concat(header, col(textCol).cast("binary")).as("media"),
      when(id % 3 === 2, "bin").otherwise("wav").as("format"),
      channels.as("channels"),
      rate.as("sample_rate"))
  }

  /** Audio decode contract + header implementation (the [[MediaDecoder]]
    * shape for the audio column family).
    */
  trait AudioDecoder extends Serializable {
    def decodeBatch(batch: Seq[AudioRow]): Seq[AudioFeatures]
  }

  /** RIFF/WAVE header decode ([[AudioHeaders]]); unrecognized containers
    * fall back to sidecar channels/rate with the 8-bit sidecar
    * convention and the whole payload as data. Frame count and duration
    * are exact integer arithmetic (floor division).
    */
  object WavHeaderDecoder extends AudioDecoder {
    def decodeBatch(batch: Seq[AudioRow]): Seq[AudioFeatures] =
      batch.map { r =>
        val bytes = r.media
        val (fmt, ch, rate, bits, dataLen, hl) =
          AudioHeaders.parseWav(bytes) match {
            case Some(p) =>
              ("wav", p.channels, p.sampleRate, p.bitsPerSample,
                p.dataLen, p.headerLen)
            case None =>
              (r.format, r.channels, r.sample_rate, 8,
                bytes.length.toLong, 0)
          }
        var sum = 0L
        var i = hl
        while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
        val blockAlign = ch.toLong * (bits / 8)
        val frames = if (blockAlign == 0) 0L else dataLen / blockAlign
        AudioFeatures(r.media_id, fmt, ch, rate, bits,
          data_len = dataLen,
          n_frames = frames,
          duration_ms = if (rate <= 0) 0L else frames * 1000L / rate,
          header_len = hl,
          n_bytes = bytes.length.toLong,
          content_sum = sum)
      }
  }

  /** Batched audio decode — same narrow mapPartitions shape as
    * [[featurize]].
    */
  def featurizeAudio(media: DataFrame,
                     decoder: AudioDecoder = WavHeaderDecoder,
                     batchSize: Int = 64): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[AudioRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => decoder.decodeBatch(b))
    }
  }

  /** Deterministic video table synthesized from the documents corpus:
    * the payload is a spec-valid minimal ISO-BMFF file — `ftyp`
    * (major brand "isom", compatible "mp41"), `moov` holding one
    * version-0 `mvhd` (per-row timescale, duration = 100 ticks per
    * character, unity matrix, per-row next_track_ID), and an `mdat`
    * sized to the document — followed by the document's UTF-8 bytes as
    * the media payload; every third row stays a raw opaque blob
    * (sidecar-fallback path). All box assembly is pure Column
    * arithmetic (big-endian u32 via be4), zero UDFs.
    */
  def videoTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val timescale = ((id % 3 + 1) * 600).cast("int")
    val durTicks = length(col(textCol)) * 100
    val nextTrack = (id % 2 + 2).cast("int")
    val dataLen = length(col(textCol)).cast("int") // pure-ASCII corpus
    val ftyp = concat(be4(lit(20)), lit("ftyp").cast("binary"),
      lit("isom").cast("binary"), be4(lit(0)), lit("mp41").cast("binary"))
    val mvhd = concat(be4(lit(108)), lit("mvhd").cast("binary"),
      be4(lit(0)),               // version 0 + flags
      be4(lit(0)), be4(lit(0)),  // creation, modification (epoch 0)
      be4(timescale), be4(durTicks),
      be4(lit(0x00010000)),      // rate 1.0
      be2(lit(0x0100)), be2(lit(0)), // volume 1.0, reserved
      be4(lit(0)), be4(lit(0)),  // 8 reserved bytes
      // unity display matrix (fixed-point per spec)
      be4(lit(0x00010000)), be4(lit(0)), be4(lit(0)),
      be4(lit(0)), be4(lit(0x00010000)), be4(lit(0)),
      be4(lit(0)), be4(lit(0)), be4(lit(0x40000000)),
      be4(lit(0)), be4(lit(0)), be4(lit(0)), // 24 pre_defined bytes
      be4(lit(0)), be4(lit(0)), be4(lit(0)),
      be4(nextTrack))
    val moov = concat(be4(lit(116)), lit("moov").cast("binary"), mvhd)
    val mdat = concat(be4(dataLen + 8), lit("mdat").cast("binary"))
    val header = when(id % 3 === 2, lit(Array.emptyByteArray))
      .otherwise(concat(ftyp, moov, mdat))
    docs.select(
      id.cast("long").as("media_id"),
      concat(header, col(textCol).cast("binary")).as("media"),
      when(id % 3 === 2, "bin").otherwise("mp4").as("format"),
      timescale.as("timescale"),
      (nextTrack - 1).as("n_tracks"))
  }

  /** Video decode contract + box-walk implementation (the
    * [[MediaDecoder]] shape for the video column family).
    */
  trait VideoDecoder extends Serializable {
    def decodeBatch(batch: Seq[VideoRow]): Seq[VideoFeatures]
  }

  /** ISO-BMFF box-walk decode ([[VideoHeaders]]); unrecognized
    * containers fall back to sidecar timescale/track count with brand
    * "none", zero duration, and the whole payload as data. Duration is
    * exact integer arithmetic (floor division).
    */
  object Mp4HeaderDecoder extends VideoDecoder {
    def decodeBatch(batch: Seq[VideoRow]): Seq[VideoFeatures] =
      batch.map { r =>
        val bytes = r.media
        val (fmt, brand, ts, dur, tracks, dataLen, hl) =
          VideoHeaders.parseMp4(bytes) match {
            case Some(p) =>
              ("mp4", p.brand, p.timescale, p.durationTicks,
                p.nextTrackId - 1, p.dataLen, p.headerLen)
            case None =>
              (r.format, "none", r.timescale, 0L, r.n_tracks,
                bytes.length.toLong, 0)
          }
        var sum = 0L
        var i = hl
        while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
        VideoFeatures(r.media_id, fmt, brand, ts,
          duration_ticks = dur,
          n_tracks = tracks,
          duration_ms = if (ts <= 0) 0L else dur * 1000L / ts,
          data_len = dataLen,
          header_len = hl,
          n_bytes = bytes.length.toLong,
          content_sum = sum)
      }
  }

  /** Batched video decode — same narrow mapPartitions shape as
    * [[featurize]].
    */
  def featurizeVideo(media: DataFrame,
                     decoder: VideoDecoder = Mp4HeaderDecoder,
                     batchSize: Int = 64): Dataset[VideoFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[VideoRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => decoder.decodeBatch(b))
    }
  }
}
