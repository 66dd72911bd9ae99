package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ext.{Multimodal, Sessions}

/** Sessionization (gaps-and-islands) and the multimodal batched-decode
  * plumbing.
  */
class ExtOpsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize: gap splits, window semantics, duration") {
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, t("2025-01-01 10:00:00")),
      (1L, t("2025-01-01 10:10:00")), // 10 min gap — same session
      (1L, t("2025-01-01 11:00:00")), // 50 min gap — NEW session
      (2L, t("2025-01-01 10:05:00"))) // other user, own session
      .toDF("user_id", "ts")
    val got = Sessions.sessionize(events, "user_id", "ts", 30)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("sess_seq"),
        r.getAs[Timestamp]("win_start").toString,
        r.getAs[Timestamp]("win_end").toString,
        r.getAs[Long]("n_events"), r.getAs[Long]("duration_us"))).toSet
    assert(got === Set(
      (1L, 1, "2025-01-01 10:00:00.0", "2025-01-01 10:40:00.0", 2L, 600000000L),
      (1L, 2, "2025-01-01 11:00:00.0", "2025-01-01 11:30:00.0", 1L, 0L),
      (2L, 1, "2025-01-01 10:05:00.0", "2025-01-01 10:35:00.0", 1L, 0L)))
  }

  test("sessionize: exact 30-minute gap does NOT split (strict inequality)") {
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq((1L, t("2025-01-01 10:00:00")), (1L, t("2025-01-01 10:30:00")))
      .toDF("user_id", "ts")
    assert(Sessions.sessionize(events, "user_id", "ts", 30).count() === 1L)
  }

  test("multimodal: dimensions are decoded FROM THE BYTES, content stats from the payload") {
    // id%3: 0 → png container, 1 → jpeg container, 2 → opaque blob
    val docs = Seq((7L, "abc"), (8L, ""), (9L, "Hello, multimodal!"))
      .toDF("doc_id", "text")
    val got = Multimodal.featurize(Multimodal.mediaTable(docs, "doc_id", "text"))
      .collect().map(f => f.media_id -> f).toMap
    val jpeg = got(7L) // 7%3=1 → JPEG SOI+SOF0 (15 bytes) + "abc"
    assert(jpeg.format === "jpeg" && jpeg.width === 512 && jpeg.height === 144)
    assert(jpeg.header_len === 15 && jpeg.n_bytes === 18L)
    assert(jpeg.content_sum === ('a' + 'b' + 'c').toLong)
    assert(jpeg.content_first === 'a'.toInt && jpeg.content_last === 'c'.toInt)
    val opaque = got(8L) // 8%3=2 → raw blob, sidecar metadata fallback
    assert(opaque.format === "bin" && opaque.header_len === 0)
    assert(opaque.n_bytes === 0L && opaque.content_mean === 0.0 &&
      opaque.content_first === -1 && opaque.content_last === -1)
    assert(opaque.width === 64 && opaque.height === 192)
    val png = got(9L) // 9%3=0 → PNG sig+IHDR (33 bytes) + text
    assert(png.format === "png" && png.width === 128 && png.height === 240)
    assert(png.header_len === 33 && png.n_bytes === 33L + 18L)
  }

  test("multimodal: fixture PNG header is spec-valid (signature, IHDR, real CRC-32)") {
    val docs = Seq((3L, "x")).toDF("doc_id", "text") // 3%3=0 → png
    val bytes = Multimodal.mediaTable(docs, "doc_id", "text")
      .select(col("media")).collect().head.getAs[Array[Byte]](0)
    assert((bytes(0) & 0xff) === 0x89 &&
      new String(bytes.slice(1, 4), "US-ASCII") === "PNG")
    // CRC stored at bytes 29..32 must be the zlib CRC-32 over type+data
    val crc = new java.util.zip.CRC32()
    crc.update(bytes, 12, 17) // "IHDR" + 13 data bytes
    val stored = ((bytes(29) & 0xffL) << 24) | ((bytes(30) & 0xffL) << 16) |
      ((bytes(31) & 0xffL) << 8) | (bytes(32) & 0xffL)
    assert(stored === crc.getValue)
  }

  test("ImageHeaders parses real JDK-encoded PNG and JPEG bytes") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, out), s"JDK has no $fmt writer")
      out.toByteArray
    }
    val png = graft.ext.ImageHeaders.parse(encode("png", 37, 21))
    assert(png.exists(p => p.format == "png" && p.width == 37 && p.height == 21))
    // real JPEGs carry APP0/DQT/DHT segments before SOF0 — exercises the
    // marker-segment walk, not just the fixture's minimal header
    val jpg = graft.ext.ImageHeaders.parse(encode("jpg", 64, 48))
    assert(jpg.exists(p => p.format == "jpeg" && p.width == 64 && p.height == 48))
    assert(graft.ext.ImageHeaders.parse("just some text".getBytes("UTF-8")).isEmpty)
    assert(graft.ext.ImageHeaders.parse(Array[Byte]()).isEmpty)
  }

  test("AudioHeaders parses real JDK-encoded WAV bytes") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 16 kHz, 16-bit, stereo, 250 frames of silence through the JDK's
    // own RIFF writer — exercises the chunk walk on a real container,
    // not just the fixture's minimal 44-byte header
    val frames = 250
    val fmt = new AudioFormat(16000f, 16, 2, true, false)
    val data = new Array[Byte](frames * 4)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames.toLong),
      AudioFileFormat.Type.WAVE, out)
    val parsed = graft.ext.AudioHeaders.parseWav(out.toByteArray)
    assert(parsed.exists(p => p.channels == 2 && p.sampleRate == 16000 &&
      p.bitsPerSample == 16 && p.dataLen == frames * 4L))
    // header_len points at the sample section: remaining bytes = data
    assert(parsed.exists(p => out.toByteArray.length - p.headerLen == frames * 4))
    assert(graft.ext.AudioHeaders.parseWav("RIFFnope".getBytes("UTF-8")).isEmpty)
    assert(graft.ext.AudioHeaders.parseWav(Array[Byte]()).isEmpty)
    // data chunk before any fmt chunk → malformed → None
    val noFmt = "RIFF0000WAVEdata0000".getBytes("US-ASCII")
    assert(graft.ext.AudioHeaders.parseWav(noFmt).isEmpty)
  }

  test("multimodal: decode is batched and narrow (no shuffle, partitioning preserved)") {
    val docs = (0 until 200).map(i => (i.toLong, s"doc number $i"))
      .toDF("doc_id", "text").repartition(4)
    // batch shape: a counting decoder observes every batch ≤ batchSize
    val media = Multimodal.mediaTable(docs, "doc_id", "text")
    val sizes = media.sparkSession.sparkContext.collectionAccumulator[Int]("batches")
    val counting = new Multimodal.MediaDecoder {
      def decodeBatch(b: Seq[graft.ext.MediaRow]): Seq[graft.ext.MediaFeatures] = {
        sizes.add(b.size)
        Multimodal.HeaderDecoder.decodeBatch(b)
      }
    }
    val out = Multimodal.featurize(media, counting, batchSize = 16)
    assert(out.count() === 200L)
    assert(sizes.value.size() >= 200 / 16) // ran in batches, not per-row
    sizes.value.forEach(s => assert(s <= 16))
    // narrow: the ONLY exchange is the fixture's own repartition(4) —
    // featurize adds none (MapPartitions directly over the projection)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") === 1)
  }
}
