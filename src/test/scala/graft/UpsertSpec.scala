package graft

import org.apache.spark.sql.functions._
import graft.transform.Upsert

/** Keyed last-write-wins merge semantics (S6/J3) — idempotence, order
  * invariance, and the two-sided incoming-beats-existing precedence
  * (SURVEY.md §5.2).
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (String, Int, String)*) =
    rows.toDF("k", "ver", "v")

  test("latestByKey keeps the max-version row per key") {
    val got = Upsert.latestByKey(
      df(("a", 1, "old"), ("a", 3, "new"), ("a", 2, "mid"), ("b", 1, "only")),
      Seq("k"), col("ver"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got === Set(("a", 3, "new"), ("b", 1, "only")))
  }

  test("latestByKey is idempotent: f(f(x)) == f(x)") {
    val x = df(("a", 1, "p"), ("a", 2, "q"), ("b", 5, "r"), ("c", 1, "s"),
      ("c", 9, "t"))
    val once = Upsert.latestByKey(x, Seq("k"), col("ver"))
    val twice = Upsert.latestByKey(once, Seq("k"), col("ver"))
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("latestByKey is input-order invariant (cluster-safe determinism)") {
    val rows = Seq(("a", 1, "p"), ("a", 2, "q"), ("b", 5, "r"), ("b", 4, "s"))
    val fwd = Upsert.latestByKey(rows.toDF("k", "ver", "v"), Seq("k"), col("ver"))
    val rev = Upsert.latestByKey(rows.reverse.toDF("k", "ver", "v").repartition(3),
      Seq("k"), col("ver"))
    assert(fwd.collect().toSet === rev.collect().toSet)
  }

  test("upsert: incoming beats existing at EQUAL version (_gen precedence)") {
    val existing = df(("a", 1, "existing"), ("b", 2, "keep"))
    val incoming = df(("a", 1, "incoming"))
    val got = Upsert.upsert(existing, incoming, Seq("k"), col("ver"))
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(got === Set(("a", "incoming"), ("b", "keep")))
  }

  test("upsert: a higher-version existing row still wins within its side") {
    val existing = df(("a", 5, "existing-new"), ("a", 1, "existing-old"))
    val incoming = df(("b", 1, "b-in"))
    val got = Upsert.upsert(existing, incoming, Seq("k"), col("ver"))
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(got === Set(("a", "existing-new"), ("b", "b-in")))
  }

  test("notYetLoaded: left-anti on the key (details.py:277-281)") {
    val incoming = df(("a", 1, "x"), ("c", 1, "y"))
    val existing = df(("a", 9, "z"))
    val got = Upsert.notYetLoaded(incoming, existing, "k")
      .collect().map(_.getString(0)).toSet
    assert(got === Set("c"))
  }
}
