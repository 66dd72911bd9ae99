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

  test("resampleFfill: grid spans first..last bucket, latest-in-bucket wins, gaps fill forward") {
    val hour = 3600L * 1000000L
    val t0 = 1700000000L * 1000000L // µs
    val rows = Seq(
      // user 1: two obs in bucket 0 (later ts wins), then a 3-bucket
      // jump — buckets 1 and 2 must exist and carry 2.0 forward
      (1L, t0 + 10 * 60 * 1000000L, 1.0, 101L),
      (1L, t0 + 40 * 60 * 1000000L, 2.0, 102L),
      (1L, t0 + 3 * hour + 30 * 60 * 1000000L, 9.0, 103L),
      // user 2: same-ts tie inside one bucket — larger event_id wins
      (2L, t0, 5.0, 201L),
      (2L, t0, 6.0, 202L))
      .toDF("user_id", "ts_us", "value", "event_id")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val got = graft.ext.Resample
      .resampleFfill(rows, "user_id", "ts", "value", "event_id", hour)
      .select(col("user_id"), unix_micros(col("bucket_start")), col("value_ffill"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b0 = t0 / hour * hour
    assert(got === Set(
      (1L, b0, 2.0), (1L, b0 + hour, 2.0), (1L, b0 + 2 * hour, 2.0),
      (1L, b0 + 3 * hour, 9.0),
      (2L, b0, 6.0)))
  }

  test("Fuzzy.selfPairs: in-block pairs within distance; cross-prefix pairs excluded by contract") {
    val names = Seq("small ring", "small ding", "smell ring", "big bolt",
      "small rings", "xsmall ring").toDF("p_name")
    val got = graft.ext.Fuzzy.selfPairs(names, "p_name", 2, 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // "xsmall ring" is 1 edit from "small ring" but blocks under "xs" —
    // out of scope by the blocking contract, not a bug
    assert(!got.exists(p => p._1 == "small ring" && p._2 == "xsmall ring"))
    assert(got.contains(("small ding", "small ring", 1)))
    assert(got.contains(("small ring", "smell ring", 1)))
    assert(got.contains(("small ring", "small rings", 1)))
    // every reported distance is the true Levenshtein ≤ 3, pairs ordered
    got.foreach { case (a, b, dd) => assert(a < b && dd >= 1 && dd <= 3) }
  }

  test("labelPropagation: barbell graph splits into its two triangles") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (11L, 12L), (12L, 13L), (11L, 13L), (3L, 11L))
      .toDF("a", "b")
    val got = graft.ext.Graph.labelPropagation(edges, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      11L -> 11L, 12L -> 11L, 13L -> 11L))
    // 0 rounds = identity labels
    val id0 = graft.ext.Graph.labelPropagation(edges, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(id0.forall { case (i, c) => i == c } && id0.length == 6)
  }

  test("AsOf.joinNearest: closer side wins, backward takes exact ties, tolerance excludes") {
    val mkTs = (min: Long) => new Timestamp(1700000000000L + min * 60000L)
    val left = Seq(
      (10L, 1L, mkTs(60), 1.0),  // clicks at +50 (b, gap 10) and +65 (f, gap 5) → forward
      (11L, 2L, mkTs(60), 1.0),  // clicks at +50 and +70 → equidistant → backward
      (12L, 3L, mkTs(60), 1.0),  // only click at +200 → outside ±1 h tolerance → null
      (13L, 4L, mkTs(60), 1.0))  // no clicks at all → null
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (101L, 1L, mkTs(50), 2.0), (102L, 1L, mkTs(65), 3.0),
      (103L, 2L, mkTs(50), 4.0), (104L, 2L, mkTs(70), 5.0),
      (105L, 3L, mkTs(200), 6.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = graft.ext.AsOf.joinNearest(left, right, Seq("user_id"),
        "event_id", "ts", "ts", Seq("event_id", "value"), "near_",
        Some(3600L * 1000000L))
      .select(col("event_id"), col("near_event_id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(10L -> 102L, 11L -> 103L, 12L -> -1L, 13L -> -1L))
  }

  test("Dedup.windowedFirst: earliest per key per window survives; buckets split exactly") {
    val day = 86400L * 1000000L
    val rows = Seq(
      // same user+type, same UTC day: earliest ts wins
      (1L, day * 100 + 5000L, 7L, "view", 1.0),
      (2L, day * 100 + 9000L, 7L, "view", 1.0),
      // same-ts tie inside the day: smaller event_id wins
      (3L, day * 101 + 42L, 7L, "view", 1.0),
      (4L, day * 101 + 42L, 7L, "view", 1.0),
      // one µs before midnight vs midnight: DIFFERENT buckets, both kept
      (5L, day * 103 - 1L, 7L, "view", 1.0),
      (6L, day * 103, 7L, "view", 1.0),
      // different type same day: untouched
      (7L, day * 100 + 1L, 7L, "click", 1.0))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val kept = graft.ext.Dedup.windowedFirst(rows,
        Seq("user_id", "event_type"), "ts", "event_id", day)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 5L, 6L, 7L))
  }

  test("Merge.applyCdc: delete removes, update replaces, insert adds, absent keys pass through") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "name", "v")
    val cdc = Seq((2L, "b2", 22.0, "U"), (3L, "c", 30.0, "D"),
      (9L, "new", 90.0, "I")).toDF("k", "name", "v", "op")
    val got = graft.transform.Merge.applyCdc(target, cdc, Seq("k"), "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set((1L, "a", 10.0), (2L, "b2", 22.0), (4L, "d", 40.0),
      (9L, "new", 90.0)))
    // a delete for a key not in the target is a no-op, not an error
    val delOnly = Seq((42L, "x", 0.0, "D")).toDF("k", "name", "v", "op")
    assert(graft.transform.Merge.applyCdc(target, delOnly, Seq("k"), "op")
      .count() === 4L)
    // schema drift in the feed is loud, not silently reordered
    intercept[IllegalArgumentException](graft.transform.Merge.applyCdc(
      target, cdc.drop("v"), Seq("k"), "op"))
  }

  test("binnedOverlapJoin: one row per overlapping pair even across many shared bins; touching is no overlap") {
    val left = Seq((1L, 0L, 1000L),     // long: spans 10 bins
      (2L, 350L, 450L),                 // inside bin 3-4
      (3L, 2000L, 2100L))               // touches right 4's start
      .toDF("lid", "s_lo", "s_hi")
    val right = Seq((10L, 500L, 520L),  // inside left 1 only
      (11L, 0L, 990L),                  // overlaps left 1 AND left 2, 10 shared bins with 1
      (12L, 5000L, 5100L),              // no overlap with anything
      (13L, 2100L, 2200L))              // touches left 3's end: half-open → NO match
      .toDF("rid", "i_lo", "i_hi")
    val got = graft.ext.RangeJoin.binnedOverlapJoin(
        left, "s_lo", "s_hi", right, "i_lo", "i_hi", 100L)
      .select(col("lid"), col("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // no duplicates despite bin-sharing, and exactly the true overlaps
    assert(got.length === got.distinct.length)
    assert(got.toSet === Set((1L, 10L), (1L, 11L), (2L, 11L)))
  }

  test("Regression.groupOls: exact ppm slopes, sign handling, zero-variance null") {
    val pts = Seq(
      ("a", 0L, 0L), ("a", 1L, 2000000L), ("a", 2L, 4000000L), // slope 2e6
      ("b", 0L, 10L), ("b", 1L, 5L), ("b", 2L, 0L),            // slope −5
      ("c", 7L, 1L), ("c", 7L, 2L),                            // x constant
      ("d", 0L, 0L), ("d", 1L, 1L), ("d", 2L, 1L))             // slope 1/2
      .toDF("grp", "x", "y")
    val got = graft.ext.Regression.groupOls(pts, "grp", "x", "y")
      .select(col("grp"), col("slope_ppm"))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(
      "a" -> Some(2000000L * 1000000L),
      "b" -> Some(-5000000L),
      "c" -> None,
      "d" -> Some(500000L)))
  }

  test("Selection.exactKth: exact medians across rounds, duplicates, and k bounds") {
    val rows = (Seq.fill(5)(("a", 100L)) ++ Seq.fill(4)(("a", 7L)) ++
      Seq(("a", 1000000L)) ++                       // a: 10 values, median = 100
      (1L to 101L).map(i => ("b", i * i)) ++        // b: squares 1..10201, median = 51²
      Seq(("c", -5L), ("c", -5L), ("c", 42L)))      // c: negatives + duplicate median
      .toDF("grp", "v")
    // buckets = 2 forces many bisection rounds — exercises the loop,
    // not just a lucky single-round resolve
    val got = graft.ext.Selection.exactKth(rows, "grp", "v",
        n => (n + 1) / 2, buckets = 2, maxRounds = 64)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === Map("a" -> ((10L, 100L)), "b" -> ((101L, 51L * 51L)),
      "c" -> ((3L, -5L))))
    // k = 1 (min) and k = n (max) are the degenerate selections
    val mins = graft.ext.Selection.exactKth(rows, "grp", "v", _ => 1L)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(mins === Map("a" -> 7L, "b" -> 1L, "c" -> -5L))
    val maxs = graft.ext.Selection.exactKth(rows, "grp", "v", n => n)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(maxs === Map("a" -> 1000000L, "b" -> 101L * 101L, "c" -> 42L))
    intercept[IllegalArgumentException](
      graft.ext.Selection.exactKth(rows, "grp", "v", n => n + 1).collect())
  }

  test("Selection.exactKths: every quantile equals its single-k run, in shared scans") {
    val rows = ((1L to 101L).map(i => ("b", i * i)) ++
      Seq.fill(6)(("d", 9L)) ++ Seq(("d", 10L), ("d", 11L)))
      .toDF("grp", "v")
    val ks: Seq[Long => Long] =
      Seq(_ => 1L, n => (n + 1) / 2, n => n, n => (n * 3 + 3) / 4)
    val multi = graft.ext.Selection
      .exactKths(rows, "grp", "v", ks, buckets = 2, maxRounds = 64)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3))
      .toMap
    ks.zipWithIndex.foreach { case (kOfN, qi) =>
      val single = graft.ext.Selection.exactKth(rows, "grp", "v", kOfN,
          buckets = 2, maxRounds = 64)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      single.foreach { case (g, v) =>
        assert(multi((g, qi)) == v, s"quantile $qi group $g")
      }
    }
    // heavy duplicates: q1 of d (8 values) is rank 2 -> 9; q3 rank 6 -> 9
    assert(multi(("d", 1)) == 9L && multi(("d", 3)) == 9L)
  }

  test("Encoding: dense sorted ids; nulls excluded from vocab; OOV encodes null") {
    val corpus = Seq((1L, "b"), (2L, "a"), (3L, "b"), (4L, null))
      .toDF("id", "cat")
    val dict = graft.ext.Encoding.dictionary(corpus, "cat", "cat_id")
    assert(dict.collect().map(r => r.getString(0) -> r.getInt(1)).toMap ==
      Map("a" -> 0, "b" -> 1)) // sorted, 0-based, null not a category
    // ids are stable: re-derivation yields the identical mapping
    assert(graft.ext.Encoding.dictionary(corpus, "cat", "cat_id")
      .collect().toSet == dict.collect().toSet)
    // unseen value (dictionary from a past release) and null both -> null
    val next = Seq((5L, "a"), (6L, "zz"), (7L, null)).toDF("id", "cat")
    val enc = graft.ext.Encoding.encode(next, dict, "cat")
      .collect().map(r => r.getLong(r.fieldIndex("id")) ->
        (if (r.isNullAt(r.fieldIndex("cat_id"))) null
         else r.getInt(r.fieldIndex("cat_id")))).toMap
    assert(enc == Map(5L -> 0, 6L -> null, 7L -> null))
  }

  test("Encoding.dictionaryBucketed: identical (value, id) law as the " +
       "window form — byte-prefix buckets respect string order incl. " +
       "multi-byte UTF-8, shared prefixes, and the empty string") {
    // adversarial vocabulary for the 2-byte-prefix bucketing: empty
    // string (bucket 0), 1-char values padding byte 2 with 0 ("b" must
    // rank after every "a?" — the padding-order edge), long shared
    // prefixes (same bucket, local sort decides), multi-byte UTF-8
    // (é = 2 bytes, 中 = 3, 🚀 = 4 — buckets from BYTES, not chars),
    // and near-boundary ASCII pairs
    val vocab = Seq("", "a", "aa", "ab", "az", "b", "ba", "azz", "aab",
      "é", "éa", "中", "中文", "🚀", "zz", "z", "~", " ", "  a", "0", "9a")
    val corpus = (vocab ++ vocab).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "cat")
    val win = graft.ext.Encoding.dictionary(corpus, "cat", "cat_id")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val bkt = graft.ext.Encoding
      .dictionaryBucketed(corpus, "cat", "cat_id")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(bkt == win)
    assert(bkt.values.toSeq.sorted == vocab.indices) // dense 0-based
    // the dispatcher picks each form by vocabulary size and both obey
    // the same law
    val auto = graft.ext.Encoding
      .dictionaryAuto(corpus, "cat", "cat_id", hugeThreshold = 5L)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(auto == win)
  }

  test("Selection.weightedKths: cumulative-weight law and positive-weight guard") {
    // group a: W=10, K=⌈10/2⌉=5, cw(1)=5 ≥ 5 → weighted median 1
    // (the UNweighted median of {1,2,3} would be 2 — the weight matters)
    // group b: W=7, K=4, cw(10)=3 < 4, cw(20)=7 → 20
    val rows = Seq(("a", 1L, 5L), ("a", 2L, 1L), ("a", 3L, 4L),
      ("b", 10L, 3L), ("b", 20L, 4L)).toDF("grp", "v", "w")
    val got = graft.ext.Selection.weightedKths(rows, "grp", "v", "w",
        Seq((tw: Long) => (tw + 1) / 2), buckets = 2, maxRounds = 64)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map("a" -> ((10L, 1L)), "b" -> ((7L, 20L))))
    intercept[IllegalArgumentException](
      graft.ext.Selection.weightedKths(
        rows.withColumn("w", col("w") - 3L), "grp", "v", "w",
        Seq((tw: Long) => 1L)).collect())
  }

  test("Selection.weightedKths: NULL weights fail loudly (round-12 ADVICE — " +
       "min(w) skips nulls, so the positivity guard alone would silently " +
       "treat them as weight 0)") {
    // group a mixes positive and NULL weights: min(w)=1 would pass the
    // positivity guard; the null-count guard must trip instead
    val mixed = Seq(("a", 1L, Some(5L)), ("a", 2L, None), ("b", 9L, Some(2L)))
      .toDF("grp", "v", "w")
    val e = intercept[IllegalArgumentException](
      graft.ext.Selection.weightedKths(mixed, "grp", "v", "w",
        Seq((tw: Long) => (tw + 1) / 2)).collect())
    assert(e.getMessage.toLowerCase.contains("null"))
    // an ALL-null-weight group dies with the same loud message, not NPE
    val allNull = Seq(("c", 1L, None: Option[Long]), ("c", 2L, None))
      .toDF("grp", "v", "w")
    val e2 = intercept[IllegalArgumentException](
      graft.ext.Selection.weightedKths(allNull, "grp", "v", "w",
        Seq((tw: Long) => 1L)).collect())
    assert(e2.getMessage.toLowerCase.contains("null"))
  }

  test("VideoHeaders parses the fixture's ISO-BMFF boxes and a version-1 mvhd") {
    val docs = Seq((0L, "hello world")).toDF("doc_id", "text")
    val media = Multimodal.videoTable(docs, "doc_id", "text")
      .select("media").head().getAs[Array[Byte]](0)
    val p = graft.ext.VideoHeaders.parseMp4(media)
    assert(p.exists(v => v.brand == "isom" && v.timescale == 600 &&
      v.durationTicks == 1100L && v.nextTrackId == 2 &&
      v.dataLen == 11L && v.headerLen == 144))
    // version-1 mvhd (64-bit times/duration): hand-assembled
    val bb = java.nio.ByteBuffer.allocate(20 + 8 + 120 + 8 + 4)
    bb.putInt(20).put("ftypisom".getBytes("US-ASCII")).putInt(0)
      .put("mp41".getBytes("US-ASCII"))
    bb.putInt(128).put("moov".getBytes("US-ASCII"))
    bb.putInt(120).put("mvhd".getBytes("US-ASCII"))
      .putInt(0x01000000)        // version 1
      .putLong(0L).putLong(0L)   // creation, modification (u64)
      .putInt(1000)              // timescale
      .putLong(98765L)           // duration (u64)
      .putInt(0x00010000).putInt(0x01000000) // rate, volume+reserved
      .putLong(0L)               // 8 reserved
    (0 until 9).foreach(i => bb.putInt(
      if (i == 0 || i == 4) 0x00010000 else if (i == 8) 0x40000000 else 0))
    (0 until 6).foreach(_ => bb.putInt(0))
    bb.putInt(7) // next_track_ID
    bb.putInt(12).put("mdat".getBytes("US-ASCII")).putInt(42)
    val v1 = graft.ext.VideoHeaders.parseMp4(bb.array())
    assert(v1.exists(v => v.timescale == 1000 && v.durationTicks == 98765L &&
      v.nextTrackId == 7 && v.dataLen == 4L))
    // malformed inputs: no ftyp, empty, truncated mid-box
    assert(graft.ext.VideoHeaders.parseMp4("0000nope".getBytes).isEmpty)
    assert(graft.ext.VideoHeaders.parseMp4(Array[Byte]()).isEmpty)
    assert(graft.ext.VideoHeaders.parseMp4(media.take(100)).isEmpty)
  }
}
