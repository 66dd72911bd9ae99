package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom-filter build + membership test, on the engine's
  * cross-engine hash contract (TextHash md5-60) so behavior is
  * deterministic and oracle-replicable.
  *
  * Why at 100 TB: filtering a huge corpus against a keyed blocklist
  * (decontamination, opt-out lists, already-processed keys) as a join
  * shuffles the CORPUS on the key. A Bloom filter makes the blocklist a
  * broadcastable O(bits) bitmap — the corpus is filtered map-side with
  * zero exchange, and only the (tiny) surviving fraction pays the exact
  * verification join. False positives are removed by that verify join;
  * false negatives are impossible (every inserted key sets all k bits),
  * so prefilter→verify is EXACTLY the semi-join, at map-side cost.
  *
  * The build is one aggregation: k positions per key (exploded), bit_or
  * of the per-position one-hot words, grouped by word index — map-side
  * combinable, ≤ numBits/64 result rows. The final `.collect()` is a
  * justified driver materialization: the bitmap IS the broadcast index
  * artifact (same category as the bucket-metadata probe in Sinks), sized
  * by construction at numBits/8 bytes, independent of data volume.
  */
final case class BloomBits(words: Array[Long], numBits: Int, numHashes: Int) {

  /** Membership test as a pure Column expression over the broadcast
    * bitmap literal: true iff all k salted-hash bit positions are set.
    * May return true for a non-member (rate ~(1-e^(-kn/m))^k); never
    * false for an inserted member. NULL keys test NULL (excluded by a
    * filter, like any SQL predicate).
    */
  def mightContain(key: Column): Column = {
    val bitmap = typedlit(words.toSeq)
    (0 until numHashes).map { j =>
      val pos = Bloom.position(key, j, numBits)
      // pos < numBits <= Int.MaxValue → the int casts are exact
      val word = element_at(bitmap, (pos / 64).cast("int") + 1)
      Bloom.shiftRight(word, (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}

object Bloom {

  /** shiftleft/shiftright with a COLUMN shift amount — the SQL builtins
    * accept one, only the Scala wrappers pin it to a literal Int.
    */
  private[ext] def shiftLeft(v: Column, n: Column): Column =
    call_function("shiftleft", v, n)
  private[ext] def shiftRight(v: Column, n: Column): Column =
    call_function("shiftright", v, n)

  /** Bit position of salted hash j: md5-60 of ("bloom_<j>_" ++ key) mod
    * numBits — k independent-enough hashes from one primitive, same
    * derivation the MinHash permutations use (TextHash seed salting).
    */
  private[ext] def position(key: Column, j: Int, numBits: Int): Column =
    pmod(TextHash.hash60(concat(lit(s"bloom_${j}_"), key)), lit(numBits.toLong))

  /** Build the bitmap from a key column of `keys`. Size numBits at
    * ~10–16 bits per expected distinct key (k=5..7 → sub-1% false
    * positives); the verify join downstream makes the RESULT exact
    * regardless, so undersizing costs only verify-join traffic.
    */
  def build(keys: DataFrame, key: Column, numBits: Int, numHashes: Int): BloomBits = {
    require(numBits > 0 && numBits % 64 == 0,
      s"numBits must be a positive multiple of 64, got $numBits")
    require(numHashes > 0, s"numHashes must be positive, got $numHashes")
    val rows = keys
      .where(key.isNotNull)
      .select(explode(array(
        (0 until numHashes).map(j => position(key, j, numBits)): _*)).as("pos"))
      .groupBy((col("pos") / 64).cast("int").as("w"))
      .agg(bit_or(shiftLeft(lit(1L), (col("pos") % 64).cast("int"))).as("bits"))
      .collect() // justified: the bitmap is the broadcastable index artifact
    val words = Array.fill(numBits / 64)(0L)
    rows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    BloomBits(words, numBits, numHashes)
  }
}
