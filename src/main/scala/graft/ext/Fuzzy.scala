package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked approximate string self-join (record linkage / fuzzy
  * matching): find pairs of distinct strings within a bounded edit
  * distance, without comparing all O(n²) pairs. The classic blocking
  * discipline: a cheap equi-joinable BLOCKING KEY (here a character
  * prefix) partitions the space, candidate pairs form only inside a
  * block, and the exact Levenshtein check runs on candidates only.
  * Blocking is an explicit recall contract, not an approximation the
  * caller can't see: pairs whose first `prefixLen` characters differ
  * are out of scope BY DEFINITION of the operator (the standard
  * entity-resolution trade: multiple complementary blocking passes —
  * prefix, suffix, sorted-token — union when recall matters more).
  *
  * Why this shape at 100 TB: the naive all-pairs comparison is a
  * cartesian product — dead at any scale. Blocking turns it into one
  * equi-join (shuffle on the block key, candidates colocated), and
  * the length pre-filter (|len(a)−len(b)| ≤ maxDist, a lower bound on
  * edit distance) discards most candidates before the DP runs. The
  * Levenshtein itself uses Spark's THRESHOLDED form — O(len·maxDist)
  * banded DP instead of the O(len²) full matrix, returning −1 early
  * the moment the band exceeds `maxDist` — so cost per candidate is
  * linear. Skewed blocks (every web string starting "ht") are the
  * same hot-key problem as any join — ext/Skew.saltedJoin composes
  * when a blocking key grows pathological.
  *
  * Determinism: Levenshtein distance is an integer DP — identical in
  * every engine; pair order is canonicalized (a < b).
  */
object Fuzzy {

  /** Distinct-value fuzzy pairs of `nameCol`: (name_a, name_b, dist)
    * with name_a < name_b, same `prefixLen`-char blocking prefix, and
    * Levenshtein distance ≤ `maxDist`.
    */
  def selfPairs(df: DataFrame, nameCol: String,
                prefixLen: Int, maxDist: Int): DataFrame = {
    require(prefixLen > 0 && maxDist >= 0,
      s"prefixLen=$prefixLen maxDist=$maxDist out of range")
    val names = df.select(col(nameCol).as("name")).distinct()
      .withColumn("blk", substring(col("name"), 1, prefixLen))
    val a = names.select(col("blk"), col("name").as("name_a"))
    val b = names.select(col("blk"), col("name").as("name_b"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      // thresholded (banded-DP) form: −1 when the distance exceeds
      // maxDist, the exact distance otherwise
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("name_a"), col("name_b"), col("dist"))
  }
}
