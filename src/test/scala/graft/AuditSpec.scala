package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import graft.ext.{Cooccur, Diff, Graph, Quality, Rolling, Sampling, Terms,
  Transitions, VectorStats}

/** Unit tests for the audit/temporal pack (q86–q91 families): snapshot
  * diff (all three change classes, null-safe compare, unchanged rows
  * dropped), trailing RANGE frame (gap days widen the frame — the
  * ROWS-frame bug this op exists to avoid), weighted Bernoulli sampling
  * (determinism, monotone-in-weight, max-weight rows always kept), and
  * the transition matrix (exact counts + ppm normalization).
  */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  // ---- Diff.snapshotDiff --------------------------------------------

  test("snapshotDiff: added/removed/changed classes, unchanged dropped") {
    val old = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0),
      (4L, null.asInstanceOf[String], 40.0)).toDF("k", "s", "v")
    val neu = Seq((1L, "A", 10.0),                       // unchanged
      (2L, "B", 21.0),                                   // changed value
      (4L, "D", 40.0),                                   // null -> D
      (5L, "E", 50.0)                                    // added
    ).toDF("k", "s", "v")                                // 3 removed
    val out = Diff.snapshotDiff(old, neu, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "changed",
      5L -> "added"))
  }

  test("snapshotDiff: null == null is NOT a change (null-safe compare)") {
    val old = Seq((1L, null.asInstanceOf[String])).toDF("k", "s")
    val neu = Seq((1L, null.asInstanceOf[String])).toDF("k", "s")
    assert(Diff.snapshotDiff(old, neu, Seq("k"), Seq("s")).isEmpty)
  }

  test("snapshotDiff: reserved/missing columns rejected loudly") {
    val df = Seq((1L, "x")).toDF("k", "change")
    intercept[IllegalArgumentException] {
      Diff.snapshotDiff(df, df, Seq("k"), Seq("change"))
    }
    val ok = Seq((1L, "x")).toDF("k", "s")
    intercept[IllegalArgumentException] {
      Diff.snapshotDiff(ok, ok, Seq("k"), Seq("missing"))
    }
  }

  /** Round-trip law: applying a diff to the old snapshot reconstructs
    * the new one exactly — (old minus removed/changed keys) plus the
    * diff's new-side rows equals new. Deterministic seeds, random
    * overlapping keyed tables with nulls.
    */
  test("snapshotDiff: old + diff reconstructs new (property, 5 seeds)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.pureApply(Gen.Parameters.default, Seed(seed))
    val tableGen: Gen[List[(Long, Option[String], Double)]] =
      Gen.listOfN(30, for {
        k <- Gen.choose(1L, 15L)
        s <- Gen.option(Gen.oneOf("x", "y", "z"))
        v <- Gen.choose(0, 9)
      } yield (k, s, v / 2.0)).map(_.groupBy(_._1).map(_._2.head).toList)
    for (seed <- 1 to 5) {
      val oldRows = sample(tableGen, seed)
      val newRows = sample(tableGen, seed + 50)
      val old = oldRows.map(t => (t._1, t._2.orNull, t._3)).toDF("k", "s", "v")
      val neu = newRows.map(t => (t._1, t._2.orNull, t._3)).toDF("k", "s", "v")
      val diff = Diff.snapshotDiff(old, neu, Seq("k"), Seq("s", "v")).collect()
      val removedOrChanged = diff
        .filter(r => r.getString(1) != "unchanged" && r.getString(1) != "added")
        .map(_.getLong(0)).toSet
      val applied = oldRows.filterNot(t => removedOrChanged.contains(t._1)) ++
        diff.filter(r => r.getString(1) == "added" || r.getString(1) == "changed")
          .map(r => (r.getLong(0), Option(r.getString(3)), r.getDouble(5)))
          .map(t => (t._1, t._2, t._3))
      assert(applied.map(t => (t._1, t._2.orNull, t._3)).toSet ==
        newRows.map(t => (t._1, t._2.orNull, t._3)).toSet, s"seed=$seed")
    }
  }

  // ---- Rolling.trailingDaily ----------------------------------------

  test("trailingDaily: RANGE frame spans value distance, not row count") {
    // days 1, 2, 10 — the day-10 frame must contain ONLY day 10 (days
    // 1/2 are 8+ days back); a ROWS-based frame would wrongly include
    // them.
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    val df = Seq(("g", ts(1), 100.0), ("g", ts(2), 50.0), ("g", ts(10), 7.0))
      .toDF("grp", "ts", "v")
    val out = Rolling.trailingDaily(df, "grp", "ts", "v", 7)
      .orderBy("day").collect()
    assert(out.map(_.getAs[Double]("trail_total")).toSeq ==
      Seq(100.0, 150.0, 7.0))
    assert(out.map(_.getAs[Int]("trail_days")).toSeq == Seq(1, 2, 1))
    assert(out.map(_.getAs[Date]("day")).toSeq.map(_.toString) ==
      Seq("2024-01-01", "2024-01-02", "2024-01-10"))
  }

  test("trailingDaily: same-day rows collapse before the window") {
    def ts(h: Int) = Timestamp.valueOf(f"2024-03-05 $h%02d:00:00")
    val df = Seq(("g", ts(1), 1.5), ("g", ts(9), 2.5)).toDF("grp", "ts", "v")
    val out = Rolling.trailingDaily(df, "grp", "ts", "v", 7).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("day_total") == 4.0)
    assert(out.head.getAs[Double]("trail_avg") == 4.0)
  }

  // ---- Sampling.weightedBernoulli -----------------------------------

  test("weightedBernoulli: deterministic, and max-weight rows always kept") {
    val df = (1L to 200L).map(i => (i, i % 20 + 1)).toDF("id", "w")
    val a = Sampling.weightedBernoulli(df, "id", "w", "s1")
      .select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.weightedBernoulli(df.repartition(7), "id", "w", "s1")
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b, "sample must not depend on partitioning")
    // weight == max → threshold = full hash space → always kept
    val maxIds = (1L to 200L).filter(i => i % 20 + 1 == 20)
    assert(maxIds.forall(a.contains), "max-weight rows must always be kept")
    // heavier strata keep at least as FREQUENTLY in aggregate: the kept
    // rate of the top half of weights must exceed the bottom half's
    val (hi, lo) = a.partition(i => i % 20 + 1 > 10)
    assert(hi.size > lo.size, s"expected weight-monotone sample, " +
      s"got hi=${hi.size} lo=${lo.size}")
  }

  test("weightedBernoulli: different salt gives a different sample") {
    val df = (1L to 500L).map(i => (i, i % 10 + 1)).toDF("id", "w")
    val a = Sampling.weightedBernoulli(df, "id", "w", "sA")
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedBernoulli(df, "id", "w", "sB")
      .select("id").as[Long].collect().toSet
    assert(a != b)
  }

  // ---- Transitions.transitionMatrix ---------------------------------

  test("transitionMatrix: exact counts and ppm rows") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // user 1: a -> b -> a -> c ; user 2: a -> b
    val df = Seq(
      (1L, ts(0), 1L, "a"), (1L, ts(1), 2L, "b"), (1L, ts(2), 3L, "a"),
      (1L, ts(3), 4L, "c"), (2L, ts(0), 5L, "a"), (2L, ts(1), 6L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Transitions
      .transitionMatrix(df, "user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // from a: a->b twice, a->c once (out_total 3)
    assert(out(("a", "b")) == ((2L, 3L, 666666L)))
    assert(out(("a", "c")) == ((1L, 3L, 333333L)))
    // from b: b->a once (user 2's trailing b has no successor)
    assert(out(("b", "a")) == ((1L, 1L, 1000000L)))
    assert(out.size == 3)
  }

  // ---- Terms.vocabCoverage ------------------------------------------

  test("vocabCoverage: top-V cut with tie-break, exact OOV ppm") {
    val docs = Seq(
      (1L, "a a a b b c"),   // a:3 b:2 c:1
      (2L, "a b z"),         // z is rare -> OOV at V=3? counts: a:4 b:3 c:1 z:1
      (3L, "z z")            // pushes z to 2 -> vocab top3 = a(4) b(3) z(3)? no: z=3? z:1+2=3
    ).toDF("doc_id", "text")
    // counts: a=4, b=3, z=3, c=1 → V=3 vocab = {a, b, z} (cnt desc, term asc)
    val out = Terms.vocabCoverage(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((6L, 5L, 166666L))) // c OOV: 1/6
    assert(out(2L) == ((3L, 3L, 0L)))
    assert(out(3L) == ((2L, 2L, 0L)))
  }

  test("vocabCoverage: boundary tie broken by term ascending") {
    // b and c tie at the V=2 boundary with cnt=2 → b (asc) wins
    val docs = Seq((1L, "a a a b b c c")).toDF("doc_id", "text")
    val out = Terms.vocabCoverage(docs, "doc_id", "text", 2).collect().head
    assert(out.getLong(1) == 7L)     // n_tokens
    assert(out.getLong(2) == 5L)     // a(3) + b(2); c OOV
  }

  // ---- Cooccur.frequentPairs ----------------------------------------

  test("frequentPairs: a-priori support filter, exact counts, PMI sign") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a b"), (3L, "a b d"), (4L, "c d")
    ).toDF("doc_id", "text")
    // term df: a=3 b=3 c=2 d=2; minSupport=2 keeps all; pair support:
    // ab=3, ac=1, ad=1, bc=1, bd=1, cd=1 → only (a,b) survives
    val out = Cooccur.frequentPairs(docs, "doc_id", "text", 2, 4L).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1)) == (("a", "b")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((3L, 3L, 3L)))
    // pmi = ln(3*4/(3*3)) = ln(4/3) > 0
    assert(r.getLong(5) == math.round(math.log(4.0 / 3.0) * 1e6))
  }

  test("frequentPairs: infrequent terms pruned before pair expansion") {
    val docs = Seq((1L, "a b x"), (2L, "a b y"), (3L, "a b z"))
      .toDF("doc_id", "text")
    val out = Cooccur.frequentPairs(docs, "doc_id", "text", 3, 3L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "b"))) // x/y/z df=1 < 3 → never expand
  }

  test("frequentPairs: maxDocTokens caps per-doc expansion, keeps most-frequent") {
    // term df: a=3 b=2 c=2 d=1; doc 1 holds the three frequent terms.
    // Cap=2 keeps a (df=3) and b (df=2, term-asc beats c) in doc 1, so
    // pair (b,c) loses doc 1's support and drops below minSupport=2,
    // while (a,b) keeps doc 2's support plus doc 1's.
    val docs = Seq(
      (1L, "a b c"), (2L, "a b"), (3L, "a c d")
    ).toDF("doc_id", "text")
    val uncapped = Cooccur.frequentPairs(docs, "doc_id", "text", 2, 3L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(uncapped == Set(("a", "b"), ("a", "c"))) // default cap: exact
    val capped = Cooccur.frequentPairs(docs, "doc_id", "text", 2, 3L,
        maxDocTokens = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // doc 1 keeps {a,b}, doc 3 keeps {a,c} → ab support 2, ac support 1
    assert(capped == Set(("a", "b")))
  }

  test("frequentPairs: maxDocTokens must exceed 1") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Cooccur.frequentPairs(docs, "doc_id", "text", 1, 1L, maxDocTokens = 1)
    }
  }

  // ---- Graph.triangleCount ------------------------------------------

  test("triangleCount: known graph, per-node attribution") {
    // triangle {1,2,3} + pendant 3-4; duplicate/reversed edges collapse
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (2L, 1L))
      .toDF("src", "dst")
    val out = Graph.triangleCount(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L)) // node 4: none
  }

  test("triangleCount: K4 has 4 triangles, 3 per node") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val edges = (for (a <- nodes; b <- nodes if a < b) yield (a, b))
      .toDF("src", "dst")
    val out = Graph.triangleCount(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  // ---- VectorStats.standardizePpm -----------------------------------

  test("standardizePpm: two-sample z is exactly ±1e6; zero-variance null") {
    val emb = Seq(
      (1L, Array(0.1f, 0.5f)),
      (2L, Array(0.3f, 0.5f))  // dim 1 has zero variance
    ).toDF("vec_id", "embedding")
    val out = VectorStats.standardizePpm(emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out((1L, 0)) == Some(-1000000L))
    assert(out((2L, 0)) == Some(1000000L))
    assert(out((1L, 1)) == None)
    assert(out((2L, 1)) == None)
  }

  test("reserved-column guards fail loudly across the pack") {
    val d = Seq((1L, "x")).toDF("k", "day") // 'day' reserved in Rolling
    intercept[IllegalArgumentException] {
      Rolling.trailingDaily(d, "k", "day", "day", 7)
    }
    val t = Seq((1L, "a")).toDF("user_id", "_next")
    intercept[IllegalArgumentException] {
      Transitions.transitionMatrix(t, "user_id", "_next", "_next", "_next")
    }
    val v = Seq((1L, "a", 2L)).toDF("doc_id", "text", "oov_ppm")
    intercept[IllegalArgumentException] {
      Terms.vocabCoverage(v, "doc_id", "text", 5)
    }
    val q = Seq((1L, "x")).toDF("k", "s")
    intercept[IllegalArgumentException] { // unsafe rule name charset
      Quality.ruleAudit(q, Seq("bad`name" -> col("k").isNull))
    }
    intercept[IllegalArgumentException] { // duplicate rule names
      Quality.ruleAudit(q, Seq("r" -> col("k").isNull,
        "r" -> col("s").isNull))
    }
  }

  // ---- Quality ------------------------------------------------------

  test("ruleAudit: one row per rule, null predicates don't count") {
    val df = Seq((1L, 5.0), (2L, -1.0), (3L, Double.NaN))
      .toDF("k", "v").withColumn("v",
        when(col("k") === 3L, lit(null).cast("double")).otherwise(col("v")))
    val out = Quality.ruleAudit(df, Seq(
      "neg_v" -> (col("v") < 0.0), "null_v" -> col("v").isNull))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("neg_v" -> 1L, "null_v" -> 1L))
  }

  test("duplicateKeys: surplus rows, zero on unique and empty inputs") {
    val df = Seq((1L, "x"), (1L, "y"), (1L, "z"), (2L, "w")).toDF("k", "v")
    val out = Quality.duplicateKeys(df, Seq("k"), "dup").collect().head
    assert((out.getString(0), out.getLong(1)) == (("dup", 2L)))
    val empty = Quality.duplicateKeys(df.filter(col("k") > 99), Seq("k"), "dup")
      .collect().head
    assert(empty.getLong(1) == 0L)
  }

  test("ruleAudit: empty table reports zero violations, not null") {
    val df = Seq((1L, 5.0)).toDF("k", "v").filter(col("k") > 99)
    val out = Quality.ruleAudit(df, Seq(
      "neg_v" -> (col("v") < 0.0), "null_v" -> col("v").isNull))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("neg_v" -> 0L, "null_v" -> 0L))
  }

  test("orphans: child keys missing from parent") {
    val child = Seq((1L, "a"), (2L, "b"), (9L, "c"), (9L, "d")).toDF("ck", "p")
    val parent = Seq((1L, "x"), (2L, "y")).toDF("pk", "q")
    val out = Quality.orphans(child, "ck", parent, "pk", "orphan")
      .collect().head
    assert((out.getString(0), out.getLong(1)) == (("orphan", 2L)))
  }

  test("orphans: NULL child keys are not orphans (NOT IN / NOT EXISTS law)") {
    val child = Seq((Some(1L), "a"), (None, "b"), (Some(9L), "c"))
      .toDF("ck", "p")
    val parent = Seq((1L, "x")).toDF("pk", "q")
    val out = Quality.orphans(child, "ck", parent, "pk", "orphan")
      .collect().head
    assert(out.getLong(1) == 1L) // 9 orphaned; the NULL key is excluded
  }

  test("quantizeUniform: code range, reconstruction bound, degenerate dim (q145)") {
    val vecs = Seq(
      (1L, Array(0.0f, 5.0f, 7.5f)),
      (2L, Array(1.0f, 5.0f, -2.5f)),
      (3L, Array(0.5f, 5.0f, 10.0f))).toDF("vec_id", "embedding")
    val codes = VectorStats.quantizeUniform(vecs, "vec_id", "embedding", 256)
      .select("vec_id", "dim", "code")
      .as[(Long, Int, Int)].collect()
    assert(codes.length == 9)
    assert(codes.forall { case (_, _, c) => c >= 0 && c <= 255 })
    // degenerate dim 1 (all 5.0) codes to 0
    assert(codes.filter(_._2 == 1).forall(_._3 == 0))
    // per-dim max clamps to the top code; min codes to 0
    assert(codes.find(t => t._1 == 2L && t._2 == 0).get._3 == 255)
    assert(codes.find(t => t._1 == 1L && t._2 == 0).get._3 == 0)
    assert(codes.find(t => t._1 == 3L && t._2 == 2).get._3 == 255)
    // reconstruction bound: midpoint dequant within step/2 of the input
    val vals = Map((1L, 0) -> 0.0, (2L, 0) -> 1.0, (3L, 0) -> 0.5,
      (1L, 2) -> 7.5, (2L, 2) -> -2.5, (3L, 2) -> 10.0)
    val rng = Map(0 -> (0.0, 1.0), 2 -> (-2.5, 10.0))
    codes.filter(_._2 != 1).foreach { case (id, d, c) =>
      val (mn, mx) = rng(d); val step = (mx - mn) / 256.0
      val deq = mn + (c + 0.5) * step
      assert(math.abs(deq - vals((id, d))) <= step / 2 + 1e-12,
        s"vec $id dim $d code $c")
    }
  }

  test("transitionMatrix: ties broken by tie column, not input order") {
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    val df = Seq((1L, t, 2L, "b"), (1L, t, 1L, "a"), (1L, t, 3L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Transitions
      .transitionMatrix(df, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "b"), ("b", "c"))) // event_id order a,b,c
  }
}
