package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ext.{AsOf, Graph, Packing, Redact, Sampling, TextStats}

/** Curation pack round 2: connected components, PII redaction,
  * stratified sampling, backward as-of join.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ---- connected components -----------------------------------------

  test("connectedComponents: chain + separate component + transitivity") {
    // component {1,2,3,4} is a CHAIN (diameter 3 — needs >1 propagation
    // round); {7,9} separate; 5,6 not incident to any edge → absent
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (9L, 7L)).toDF("id_a", "id_b")
    val got = Graph.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 9L -> 7L))
  }

  test("connectedComponents: long path converges within maxIter") {
    // path 0-1-2-…-12: diameter 12, min label must reach the far end
    val edges = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Graph.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 13)
    assert(got.values.toSet === Set(0L))
  }

  test("connectedComponents: universe overload emits singletons (cluster_id = id)") {
    val edges = Seq((2L, 1L), (9L, 7L)).toDF("id_a", "id_b")
    val universe = Seq(1L, 2L, 5L, 7L, 9L, 11L).toDF("doc_id")
    val got = Graph.connectedComponents(edges, universe)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 7L -> 7L,
      9L -> 7L, 11L -> 11L))
  }

  test("connectedComponents: star-kernel fallback when diameter exceeds maxIter") {
    // diameter 5 cannot converge in 2 one-hop rounds — propagation must
    // hand off to large-star/small-star and still return EXACT labels
    val edges = (0L until 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Graph.connectedComponents(edges, maxIter = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0L to 5L).map(_ -> 0L).toMap)
  }

  test("connectedComponentsStar: long chain + separate component + self-loop node") {
    // a 60-node path (diameter 59) — far beyond any propagation default;
    // star converges in O(log²) rounds. 100~101 is a separate pair;
    // 200 has only a self-loop and must still be emitted as a singleton.
    val edges = ((0L until 60L).map(i => (i, i + 1)) ++
      Seq((101L, 100L), (200L, 200L))).toDF("id_a", "id_b")
    val got = Graph.connectedComponentsStar(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 64)
    assert((0L to 60L).forall(got(_) == 0L))
    assert(got(100L) === 100L && got(101L) === 100L && got(200L) === 200L)
  }

  // ---- PII redaction --------------------------------------------------

  test("scrub: all three kinds, counts and replacement text") {
    val df = Seq(
      (1L, "mail bob.smith+tag@corp.example.org now"),
      (2L, "host 192.168.0.1 and 10.0.0.255 up"),
      (3L, "call +4915512345678 today"),
      (4L, "clean text with no pii at all"),
      (5L, "a+1234567b@x.com")) // phone-shaped run inside an email local part
      .toDF("doc_id", "text")
    val got = Redact.scrub(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) === (("mail <EMAIL> now", 1L, 0L, 0L)))
    assert(got(2L) === (("host <IP> and <IP> up", 0L, 2L, 0L)))
    assert(got(3L) === (("call <PHONE> today", 0L, 0L, 1L)))
    assert(got(4L) === (("clean text with no pii at all", 0L, 0L, 0L)))
    // email redacted FIRST → the +1234567 inside it is never phone-counted
    assert(got(5L) === (("<EMAIL>", 1L, 0L, 0L)))
  }

  // ---- stratified sampling -------------------------------------------

  test("stratifiedBernoulli: rate 1 keeps all, rate 0 drops all, deterministic") {
    val df = (0L until 200L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("id", "lang")
    val all = Sampling.stratifiedBernoulli(df, "id", "lang",
      Map("en" -> 1.0, "zh" -> 1.0), 0.5, "t").count()
    assert(all === 200L)
    val none = Sampling.stratifiedBernoulli(df, "id", "lang",
      Map("en" -> 0.0, "zh" -> 0.0), 0.5, "t").count()
    assert(none === 0L)
    // half-rate sample: deterministic across invocations, plausible size
    def ids() = Sampling.stratifiedBernoulli(df, "id", "lang",
      Map("en" -> 0.5), 0.0, "t").collect().map(_.getLong(0)).toSet
    val s1 = ids()
    assert(s1 === ids())                    // same salt → same sample
    assert(s1.forall(_ % 2 == 0))           // zh stratum at default 0.0
    assert(s1.size > 25 && s1.size < 75)    // ~50 of 100 en docs
    // different salt → independent sample
    val s2 = Sampling.stratifiedBernoulli(df, "id", "lang",
      Map("en" -> 0.5), 0.0, "u").collect().map(_.getLong(0)).toSet
    assert(s1 !== s2)
  }

  test("exactQuotaSplit: exact per-stratum quota, partition-invariant membership") {
    // uneven strata incl. one too small for a full holdout row
    val docs = ((0 until 83).map(i => (i.toLong, "en")) ++
      (100 until 131).map(i => (i.toLong, "de")) ++
      Seq((200L, "fr"), (201L, "fr"), (202L, "fr"))).toDF("doc_id", "lang")
    def run(parts: Int) =
      Sampling.exactQuotaSplit(docs.repartition(parts), "doc_id", "lang",
        0.1, "spec_eq").select("doc_id", "lang", "split")
    val got = run(4).as[(Long, String, String)].collect().toSet
    // exact quotas: ⌊83·0.1⌋=8, ⌊31·0.1⌋=3, ⌊3·0.1⌋=0
    val valByLang = got.filter(_._3 == "val").groupBy(_._2).view
      .mapValues(_.size).toMap
    assert(valByLang == Map("en" -> 8, "de" -> 3))
    assert(got.size == 117) // every row labeled, none duplicated
    // membership is a pure function of (salt, id): partitioning-invariant
    assert(run(1).as[(Long, String, String)].collect().toSet == got)
  }

  test("temperatureMixture: √-flattening, cap at 1, budget, determinism") {
    // 900 "en" + 100 "fr": √-temperature targets m ∝ √n, so with
    // frac=0.5 (budget 500): S = √900+√100 = 40, m_en = 500·30/40 =
    // 375 (rate .4167), m_fr = 500·10/40 = 125 > 100 → rate capped
    // at 1 — the tail language is kept WHOLE, the head downsampled.
    val df = (0L until 1000L).map(i => (i, if (i < 900) "en" else "fr"))
      .toDF("id", "lang")
    val got = Sampling.temperatureMixture(df, "lang", "id", 0.5, "mx")
    val byLang = got.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("fr") === 100L)                      // capped: all kept
    val en = byLang("en")
    assert(en > 300L && en < 450L,                     // ~375 expected
      s"en sample $en far from the 375 target")
    // deterministic: same salt → identical sample
    val again = Sampling.temperatureMixture(df, "lang", "id", 0.5, "mx")
      .collect().map(_.getLong(0)).toSet
    assert(again === got.collect().map(_.getLong(0)).toSet)
  }

  // ---- decontamination ------------------------------------------------

  test("contamination: planted benchmark overlap counted exactly") {
    import graft.ext.Dedup
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val docs = Seq(
      // shares the full 4-trigram run of the benchmark sentence head
      (1L, "alpha beta gamma delta epsilon noise words here"),
      // shares exactly one trigram
      (2L, "alpha beta gamma completely different tail tokens"),
      // no overlap
      (3L, "totally unrelated content with zero shared trigrams"))
      .toDF("doc_id", "text")
    val got = Dedup.contamination(docs, "doc_id", "text",
        bench, "doc_id", "text", 3, 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L)) // 3 shared trigrams ≥ 2; doc 2 (1) and 3 (0) excluded
  }

  // ---- shard packing --------------------------------------------------

  test("packShards: exact replay of the shard/order/batch law") {
    // driver-side twin of TextHash.hash60 for the replay
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    val docs = (0L until 100L).map(i => (i, ("w " * (i % 20 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val tokensOf = size(graft.ext.TextHash.tokens(col("text")))
    def run() = Packing.packShards(docs, "doc_id", tokensOf, 4, 30L, "t")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val rows = run()
    assert(rows.length === 100)
    assert(rows.map(_._4).sum === (0L until 100L).map(_ % 20 + 1).sum)
    rows.foreach { case (id, shard, _, n) =>
      assert(shard === (h60(s"t$id") % 4).toInt)
      assert(n === id % 20 + 1)
    }
    // replay per shard: order by (hash, id), running sum, start-offset law
    rows.groupBy(_._2).foreach { case (_, shardRows) =>
      var cum = 0L
      shardRows.sortBy { case (id, _, _, _) => (h60(s"t$id"), id) }
        .foreach { case (_, _, batchId, n) =>
          assert(batchId === cum / 30L)
          cum += n
        }
    }
    assert(run().sortBy(_._1).sameElements(rows.sortBy(_._1))) // deterministic
  }

  // ---- as-of join -----------------------------------------------------

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("joinBackward: latest prior wins, inclusive ts, no-match → null") {
    val clicks = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (11L, 1L, ts("2024-01-01 11:00:00"), 2.0),
      (12L, 2L, ts("2024-01-01 12:00:00"), 3.0))
      .toDF("event_id", "user_id", "ts", "value")
    val purchases = Seq(
      (20L, 1L, ts("2024-01-01 10:30:00"), 9.0), // after click 10 only
      (21L, 1L, ts("2024-01-01 11:00:00"), 9.0), // AT click 11 → inclusive
      (22L, 2L, ts("2024-01-01 11:59:59"), 9.0), // before user-2's click
      (23L, 3L, ts("2024-01-01 12:00:00"), 9.0)) // user with no clicks
      .toDF("event_id", "user_id", "ts", "value")
    val got = AsOf.joinBackward(purchases, clicks, Seq("user_id"),
      "ts", "ts", Seq("event_id", "value"), "click_")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("click_event_id"))).toMap
    assert(got === Map(20L -> Some(10L), 21L -> Some(11L),
      22L -> None, 23L -> None))
  }

  test("joinBackward: null payload field does not fall back to older row") {
    val clicks = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00"), Some(1.0)),
      (11L, 1L, ts("2024-01-01 11:00:00"), None)) // latest has null value
      .toDF("event_id", "user_id", "ts", "value")
    val purchases = Seq((20L, 1L, ts("2024-01-01 12:00:00"), 9.0))
      .toDF("event_id", "user_id", "ts", "value")
    val row = AsOf.joinBackward(purchases, clicks, Seq("user_id"),
      "ts", "ts", Seq("event_id", "value"), "click_").collect().head
    assert(row.getAs[Long]("click_event_id") === 11L)
    assert(row.isNullAt(row.fieldIndex("click_value"))) // NOT 1.0
  }

  test("joinBackward: tolerance turns a stale match into no-match") {
    val clicks = Seq((10L, 1L, ts("2024-01-01 10:00:00"), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val purchases = Seq(
      (20L, 1L, ts("2024-01-01 10:30:00"), 9.0), // 30 min stale — within
      (21L, 1L, ts("2024-01-01 12:00:00"), 9.0)) // 2 h stale — beyond
      .toDF("event_id", "user_id", "ts", "value")
    val got = AsOf.joinBackward(purchases, clicks, Seq("user_id"),
      "ts", "ts", Seq("event_id"), "click_",
      toleranceUs = Some(3600L * 1000000L)) // 1 hour
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("click_event_id"))).toMap
    assert(got === Map(20L -> Some(10L), 21L -> None))
  }

  test("joinBackward: equal-ts right rows resolve to greatest payload") {
    val clicks = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (11L, 1L, ts("2024-01-01 10:00:00"), 2.0)) // same ts, higher id
      .toDF("event_id", "user_id", "ts", "value")
    val purchases = Seq((20L, 1L, ts("2024-01-01 12:00:00"), 9.0))
      .toDF("event_id", "user_id", "ts", "value")
    val row = AsOf.joinBackward(purchases, clicks, Seq("user_id"),
      "ts", "ts", Seq("event_id", "value"), "click_").collect().head
    assert(row.getAs[Long]("click_event_id") === 11L)
  }

  test("joinBackward: reserved internal names and shadowing prefixes fail loudly") {
    val clicks = Seq((10L, 1L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    // a left column named _side would be clobbered → refuse
    val badLeft = Seq((20L, 1L, ts("2024-01-01 12:00:00"), 0))
      .toDF("event_id", "user_id", "ts", "_side")
    val e1 = intercept[IllegalArgumentException](AsOf.joinBackward(
      badLeft, clicks, Seq("user_id"), "ts", "ts", Seq("event_id")))
    assert(e1.getMessage.contains("_side"))
    // a prefixed output name colliding with an existing left column
    val left = Seq((20L, 1L, ts("2024-01-01 12:00:00"), 5L))
      .toDF("event_id", "user_id", "ts", "click_event_id")
    val e2 = intercept[IllegalArgumentException](AsOf.joinBackward(
      left, clicks, Seq("user_id"), "ts", "ts", Seq("event_id"), "click_"))
    assert(e2.getMessage.contains("click_event_id"))
  }

  test("joinForward: earliest at-or-after wins, inclusive ts, no-match → null") {
    val clicks = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (11L, 1L, ts("2024-01-01 11:00:00"), 2.0),
      (12L, 2L, ts("2024-01-01 12:00:00"), 3.0))
      .toDF("event_id", "user_id", "ts", "value")
    val purchases = Seq(
      (20L, 1L, ts("2024-01-01 10:30:00"), 9.0), // next is click 11
      (21L, 1L, ts("2024-01-01 10:00:00"), 9.0), // AT click 10 → inclusive
      (22L, 2L, ts("2024-01-01 12:00:01"), 9.0), // after user-2's last click
      (23L, 3L, ts("2024-01-01 12:00:00"), 9.0)) // user with no clicks
      .toDF("event_id", "user_id", "ts", "value")
    val got = AsOf.joinForward(purchases, clicks, Seq("user_id"),
      "ts", "ts", Seq("event_id", "value"), "next_")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("next_event_id"))).toMap
    assert(got === Map(20L -> Some(11L), 21L -> Some(10L),
      22L -> None, 23L -> None))
  }

  test("joinForward: tolerance turns a too-late match into no-match") {
    val clicks = Seq((10L, 1L, ts("2024-01-01 12:00:00"), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val purchases = Seq(
      (20L, 1L, ts("2024-01-01 11:30:00"), 9.0), // 30 min ahead — within
      (21L, 1L, ts("2024-01-01 10:00:00"), 9.0)) // 2 h ahead — beyond
      .toDF("event_id", "user_id", "ts", "value")
    val got = AsOf.joinForward(purchases, clicks, Seq("user_id"),
      "ts", "ts", Seq("event_id"), "next_",
      toleranceUs = Some(3600L * 1000000L)) // 1 hour
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("next_event_id"))).toMap
    assert(got === Map(20L -> Some(10L), 21L -> None))
  }

  test("joinForward: equal-ts right rows resolve to greatest payload") {
    val clicks = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (11L, 1L, ts("2024-01-01 10:00:00"), 2.0)) // same ts, higher id
      .toDF("event_id", "user_id", "ts", "value")
    val purchases = Seq((20L, 1L, ts("2024-01-01 09:00:00"), 9.0))
      .toDF("event_id", "user_id", "ts", "value")
    val row = AsOf.joinForward(purchases, clicks, Seq("user_id"),
      "ts", "ts", Seq("event_id", "value"), "next_").collect().head
    assert(row.getAs[Long]("next_event_id") === 11L)
  }

  // ---- repetition filter ----------------------------------------------

  test("repetitionProfile: hand-computed ratios, short docs, keep verdict") {
    // "a b c a b c a b": 8 tokens → 6 trigrams, 3 distinct, each ×2
    //   dup = 1 − 3/6 = 0.5, top = 2/6 — repetitive, drop
    // "w x y z": 2 trigrams, both unique → ratios 0, keep
    // "x y": < 3 tokens → all-zero profile, keep
    val docs = Seq(
      (1L, "a b c a b c a b"), (2L, "w x y z"), (3L, "x y"))
      .toDF("doc_id", "text")
    val got = TextStats.repetitionProfile(docs, "doc_id", "text", 3, 0.35, 0.1)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(got(1L).getAs[Long]("n_ngrams") === 6L)
    assert(got(1L).getAs[Long]("n_distinct") === 3L)
    assert(got(1L).getAs[Long]("top_freq") === 2L)
    assert(got(1L).getAs[Double]("dup_ngram_ratio") === 0.5)
    assert(got(1L).getAs[Double]("top_ngram_ratio") === 2.0 / 6.0)
    assert(!got(1L).getAs[Boolean]("keep"))
    assert(got(2L).getAs[Long]("n_ngrams") === 2L)
    assert(got(2L).getAs[Boolean]("keep"))
    assert(got(3L).getAs[Long]("n_ngrams") === 0L)
    assert(got(3L).getAs[Double]("dup_ngram_ratio") === 0.0)
    assert(got(3L).getAs[Boolean]("keep"))
  }

  // ---- tf-idf ---------------------------------------------------------

  test("tfIdfTopK: scores match the fixed-point law; top-k cut and tie-break") {
    // corpus N=3; "cat" in all 3 docs (idf 0), "dog" in 1, "fish" in 2
    val docs = Seq(
      (1L, "cat cat dog"), (2L, "cat fish"), (3L, "cat fish cat"))
      .toDF("doc_id", "text")
    val got = graft.ext.Terms.tfIdfTopK(docs, "doc_id", "text", 2, 3L)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("term")) -> r).toMap
    def ppm(n: Double, df: Double) = math.round(math.log(n / df) * 1e6)
    // doc 1: dog tf=1 score=ln(3)ppm; cat tf=2 score=0 → dog rk1, cat rk2
    assert(got((1L, "dog")).getAs[Long]("score_ppm") === ppm(3, 1))
    assert(got((1L, "dog")).getAs[Int]("rk") === 1)
    assert(got((1L, "cat")).getAs[Long]("score_ppm") === 0L)
    assert(got((1L, "cat")).getAs[Int]("rk") === 2)
    // doc 3: fish tf=1 ln(3/2); cat tf=2 score 0 → fish first
    assert(got((3L, "fish")).getAs[Long]("score_ppm") === ppm(3, 2))
    assert(got((3L, "fish")).getAs[Int]("rk") === 1)
    assert(got((3L, "fish")).getAs[Long]("df") === 2L)
    // k=2 cut: every doc emits at most 2 rows
    assert(got.keys.groupBy(_._1).values.forall(_.size <= 2))
  }

  // ---- hash split -----------------------------------------------------

  test("hashSplit: disjoint-exhaustive labels, deterministic, growth-stable") {
    val docs = (0L until 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val cuts = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.hashSplit(docs, "doc_id", "s1", cuts)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
      .toMap
    assert(got.size === 400)
    assert(got.values.toSet === Set("train", "val", "test"))
    // deterministic replay
    val again = Sampling.hashSplit(docs, "doc_id", "s1", cuts)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
      .toMap
    assert(again === got)
    // growth stability: a prefix subset keeps identical assignments
    val subset = Sampling.hashSplit(
      docs.filter(col("doc_id") < 100), "doc_id", "s1", cuts)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
      .toMap
    assert(subset === got.filter(_._1 < 100))
    // rough proportions (md5 is uniform; 400 rows, generous bounds)
    val frac = got.values.groupBy(identity).view.mapValues(_.size / 400.0)
    assert(frac("train") > 0.7 && frac("train") < 0.9)
  }

  // ---- salted join ----------------------------------------------------

  test("saltedJoin: row-identical to the plain join; hot keys spread over salts") {
    import graft.ext.Skew
    // key 100 is hot (60 left rows), keys 0-9 cold (3 each)
    val left = ((0L until 60L).map(i => (100L, i)) ++
      (0L until 10L).flatMap(k => (0L until 3L).map(i => (k, 1000 + k * 10 + i))))
      .toDF("k", "pk")
    val right = (Seq(100L) ++ (0L until 10L)).map(k => (k, s"dim$k"))
      .toDF("k", "payload")
    val plain = left.join(right, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(left, right, "k", "pk", 4, 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted === plain)
    // the hot key's left rows actually use more than one salt bucket
    val saltsUsed = left.filter(col("k") === 100L)
      .select(Skew.saltCol(col("pk"), 4)).distinct().count()
    assert(saltsUsed > 1)
    // a NULL disambiguator must salt to bucket 0, not drop the row
    val leftNull = Seq((100L, Some(1L)), (100L, None), (0L, None))
      .toDF("k", "pk")
    val saltedNull = Skew.saltedJoin(leftNull, right, "k", "pk", 4, 2L)
      .collect().map(r => (r.getLong(0), r.getString(2))).sorted
    assert(saltedNull === Array((0L, "dim0"), (100L, "dim100"), (100L, "dim100")))
  }

  test("saltedJoin: reserved internal column names are refused loudly") {
    import graft.ext.Skew
    val bad = Seq((1L, 2L, 3)).toDF("k", "pk", "_salt")
    val right = Seq((1L, "d")).toDF("k", "payload")
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(bad, right, "k", "pk", 4, 2L)
    }
    assert(e.getMessage.contains("_salt"))
  }

  // ---- survivors ------------------------------------------------------

  test("survivors: argmax score per cluster, ties to smallest id, member count") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L))
      .toDF("id", "cluster_id")
    val scores = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (7L, 0.1))
      .toDF("doc_id", "q")
    val got = graft.ext.Dedup.survivors(clusters, scores, "doc_id", "q")
      .collect().map(r => r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("survivor_id"), r.getAs[Double]("q"),
          r.getAs[Long]("n_members")))).toMap
    // 2 and 3 tie at 0.9 → smallest id (2) wins
    assert(got === Map(1L -> ((2L, 0.9, 3L)), 7L -> ((7L, 0.1, 1L))))
  }

  // ---- Classifier.scoreLinear ----------------------------------------

  test("scoreLinear: exact weighted score, threshold decides keep") {
    val feats = Seq((1L, 10L, 0.5), (2L, 100L, 0.0), (3L, 0L, 1.0))
      .toDF("id", "f_a", "f_b")
    // score = 0.25·f_a − 2.0·f_b + 0.5 (all values exact in binary)
    val got = graft.ext.Classifier.scoreLinear(feats, "id",
        Seq("f_a", "f_b"), Seq(0.25, -2.0), bias = 0.5, threshold = 2.0)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("score"), r.getAs[Boolean]("keep")))).toMap
    assert(got === Map(
      1L -> ((2.0, true)),   // boundary: score == threshold keeps
      2L -> ((25.5, true)),
      3L -> ((-1.5, false))))
  }

  test("scoreLinear: null feature poisons the score and the decision") {
    val feats = Seq((1L, Some(2.0)), (2L, None)).toDF("id", "f")
    val rows = graft.ext.Classifier.scoreLinear(feats, "id",
        Seq("f"), Seq(1.0), bias = 0.0, threshold = 0.0)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.isNullAt(2), r.isNullAt(3)))).toMap
    assert(rows === Map(1L -> ((false, false)), 2L -> ((true, true))))
  }

  test("scoreLinear: weight arity and reserved columns are guarded") {
    val feats = Seq((1L, 2.0)).toDF("id", "f")
    intercept[IllegalArgumentException] {
      graft.ext.Classifier.scoreLinear(feats, "id", Seq("f"),
        Seq(1.0, 2.0), 0.0, 0.0)
    }
    intercept[IllegalArgumentException] {
      graft.ext.Classifier.scoreLinear(
        feats.withColumn("score", lit(1.0)), "id", Seq("f"), Seq(1.0), 0.0, 0.0)
    }
  }
}
