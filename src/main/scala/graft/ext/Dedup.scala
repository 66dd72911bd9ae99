package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Functions.collapseWs
import TextHash._

/** Deduplication operators for large-scale text corpora — the
  * training-data-pipeline half of the engine (north star; no reference
  * analogue beyond the keyed upsert kernel in transform/Upsert.scala).
  *
  * Scale discipline shared by every operator here:
  *  - NO all-pairs comparison anywhere. Candidate pairs come from an
  *    equi-join (content hash, shared shingle, or LSH band bucket), so
  *    the plan is always scan → exchange-on-key → hash join, never a
  *    cartesian. At 100 TB the bucket key is what bounds the work.
  *  - Aggregates, not windows, for per-key reduction (map-side partial
  *    combine; AQE skew-split applies to hot buckets — a stop-shingle
  *    at web scale is exactly a skewed join key).
  */
object Dedup {

  /** Exact content dedup: normalize (lowercase + whitespace collapse) →
    * md5 content key → one group row per distinct content with the
    * canonical (minimum) id and the copy count. One shuffle on the
    * 128-bit key; at 100 TB this is the cheapest possible full-corpus
    * dedup (the classic first pass before any near-dup work).
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"),
        md5Hex(collapseWs(lower(col(textCol)))).as("content_key"))
      .groupBy(col("content_key"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-document distinct shingle sets: (id, shingle) exploded + the
    * per-doc shingle count. Shared by the exact-Jaccard and MinHash
    * paths.
    */
  private def shingleRows(docs: DataFrame, idCol: String, textCol: String,
                          n: Int): DataFrame =
    docs
      .select(col(idCol).as("id"), shingles(tokens(col(textCol)), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), explode(col("sh")).as("shingle"))

  /** Prefix-filtered candidate pairs for exact Jaccard ≥ threshold
    * (Chaudhuri/Bayardo-style ssjoin): rank every shingle by global
    * document frequency (rarest first, shingle text as the total-order
    * tie-break), index only each document's first
    * |sh|−⌈τ·|sh|⌉+1 shingles under that order, and equi-join the
    * indexed prefixes.
    *
    * Recall-lossless: if J(A,B) ≥ τ then |A∩B| ≥ τ·|A∪B| ≥ τ·max(|A|,|B|),
    * so the globally-smallest common shingle cannot sit outside either
    * prefix (else that side's intersection would fit in its suffix of
    * size ⌈τ·|X|⌉−1 < τ·|X|). What it buys at scale: a stop-shingle
    * shared by k documents has maximal document frequency, sorts LAST,
    * and falls outside every non-trivial prefix — so it generates zero
    * join rows instead of k². Candidate volume is driven by RARE
    * shingle collisions, which is exactly the near-duplicate signal.
    */
  private[graft] def prefixCandidates(shSets: DataFrame,
                                      threshold: Double): DataFrame = {
    // explode the per-doc sets, carrying the set size — no separate
    // per-doc count aggregation + join needed
    val sh = shSets.select(col("id"), size(col("sh")).as("n_sh"),
      explode(col("sh")).as("shingle"))
    val docFreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    // per-doc rank under the GLOBAL (df, shingle) total order; the sort
    // is per-doc (bounded by document size), never global
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df"), col("shingle"))
    // Prefix length n − ⌈τ·n⌉ + 1, with an epsilon guard: in IEEE
    // doubles (1−τ)·n can land just BELOW its mathematical value when
    // τ·n is integral ((1.0-0.9)*10 = 0.9999999999999998), and a
    // floor-based prefix then comes out one shingle short — silently
    // dropping pairs at exactly J = τ. The ε only ever LENGTHENS the
    // prefix (more candidates, never lost recall).
    val prefix = sh.join(docFreq, "shingle")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <=
        (col("n_sh") - ceil(col("n_sh") * lit(threshold) - lit(1e-9)) + 1)
          .cast("int"))
      .select(col("id"), col("shingle"))
    // Pair generation from per-shingle POSTING LISTS rather than a
    // prefix⋈prefix self-join: a self-join executes the whole prefix
    // subtree (tokenize → shingle → explode → df join → window) twice;
    // collecting each shingle's (prefix-filtered, therefore small)
    // posting list computes it once, and the pair expansion is an array
    // combination over an already-bound column — re-evaluating a bound
    // attribute inside the lambda is a row-field read, not a recompute.
    // Sorting the list makes (id_a < id_b) by construction.
    val posting = prefix
      .groupBy(col("shingle"))
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    posting
      .select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          b => struct(a.as("id_a"), b.as("id_b")))))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()
  }

  /** Test seam: prefix candidates straight from documents. */
  private[graft] def prefixCandidates(docs: DataFrame, idCol: String,
                                      textCol: String, n: Int,
                                      threshold: Double): DataFrame =
    prefixCandidates(fingerprintSets(docs, idCol, textCol, n), threshold)

  /** Exact n-gram-Jaccard near-duplicate pairs: prefix-filtered
    * candidate generation (above) + exact shingle-set verification.
    * Output is EXACTLY every pair with Jaccard ≥ threshold — the prefix
    * filter loses no recall, it only bounds the candidate join. The
    * verify step joins candidates back to the per-doc shingle ARRAYS
    * (not exploded rows), so a verified pair costs one array intersect,
    * not a per-shingle aggregation.
    */
  /** Per-doc sets of 60-bit shingle FINGERPRINTS (hash60 of each
    * shingle): the whole Jaccard pipeline — document frequencies,
    * prefix ranking, candidate join, and the per-pair set intersection
    * — runs on 8-byte longs instead of ~20-byte strings, which at
    * corpus scale cuts shuffle volume ~4× and makes the verify-step
    * intersections integer compares. Set sizes and intersections are
    * identical to the string sets barring an md5-prefix collision
    * (≈ k²/2⁶¹ — immaterial at any realistic shingle count, and the
    * DuckDB oracle recomputing over raw strings would surface one as a
    * hash mismatch).
    */
  private[graft] def fingerprintSets(docs: DataFrame, idCol: String, textCol: String,
                              n: Int): DataFrame =
    docs
      .select(col(idCol).as("id"),
        graft.plans.Hash60ArrayExpr.hash60Array(
          shingles(tokens(col(textCol)), n)).as("sh"))
      .filter(size(col("sh")) > 0)

  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double): DataFrame =
    // The fingerprint sets are this operator's INDEX, consumed three
    // times (prefix candidates + both verify joins): materialize once
    // (localCheckpoint — O(docs · shingles) longs, the operator's
    // working set by definition) instead of re-tokenizing and
    // re-hashing the corpus per consumer.
    jaccardPairsFromSets(
      fingerprintSets(docs, idCol, textCol, n).localCheckpoint(), threshold)

  /** [[jaccardPairs]] against an already-materialized fingerprint-set
    * table — the seam that lets an audit (q176) share ONE corpus
    * tokenize+hash pass between the exact-truth side and the LSH side.
    */
  private[graft] def jaccardPairsFromSets(shSets: DataFrame,
                                          threshold: Double): DataFrame =
    prefixCandidates(shSets, threshold)
      .join(shSets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shSets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("shared",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard", col("shared").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** Benchmark decontamination — the pre-training hygiene pass: flag
    * every corpus document sharing at least `minShared` distinct
    * n-gram shingles with a benchmark/blocklist corpus (eval-set leak
    * detection). Bipartite variant of the inverted-index join: the
    * benchmark's DISTINCT shingle set (small by nature — benchmarks
    * are) joins the corpus shingle rows on the 60-bit fingerprint, so
    * the plan is scan → (broadcastable) hash join → count per doc —
    * the corpus is touched once, never benchmark×corpus pairs.
    */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchIdCol: String, benchTextCol: String,
                    n: Int, minShared: Long): DataFrame = {
    def rows(df: DataFrame, id: String, text: String) =
      df.select(col(id).as("id"),
        explode(shingles(tokens(col(text)), n)).as("sh"))
        .withColumn("sh", hash60(col("sh")))
    val bsh = rows(bench, benchIdCol, benchTextCol).select(col("sh")).distinct()
    rows(docs, idCol, textCol)
      .join(bsh, "sh") // per-doc shingles already distinct → count = distinct count
      .groupBy(col("id"))
      .agg(count(lit(1)).as("shared_shingles"))
      .filter(col("shared_shingles") >= minShared)
  }

  /** MinHash signatures: numHashes permutation minima per doc, one
    * aggregation over the exploded shingles (h_i = min (a_i·x+b_i) mod P
    * — map-side combinable, no sort).
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, numHashes: Int): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol, n)
      .withColumn("x", hash60(col("shingle")) % P)
    val mins = minhashPerms(numHashes).zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("x") + lit(b)) % P).as(s"h$i")
    }
    sh.groupBy(col("id")).agg(mins.head, mins.tail: _*)
  }

  /** Near-duplicate pairs via banded MinHash LSH: docs agreeing on ALL
    * rows of ≥1 band become candidates (equi-join on the band key), then
    * exact shingle-set Jaccard verifies ≥ threshold. Probabilistic
    * recall (a true pair missing every band is possible), deterministic
    * output (fixed permutation constants — both engines compute the
    * identical candidate set). This is the shape that scales: signature
    * cost is linear in corpus size, and the self-join touches only
    * band-bucket collisions.
    */
  /** Banded LSH rows (id, band, bk) of a fingerprint-set table: the
    * MinHash signature built from the exploded sets, banded into
    * `bands` concatenated keys. This IS the prior-release index
    * artifact the incremental path stores (see incrementalLshPairs).
    */
  private[graft] def lshBandRows(shSets: DataFrame, numHashes: Int,
                                 bands: Int): DataFrame =
    bandRowsOfSig(minhashSigOfSets(shSets, numHashes), numHashes, bands)

  /** The raw `numHashes`-column MinHash signature of a fingerprint-set
    * table — split out of [[lshBandRows]] so a multi-config audit
    * (q176: production banding vs under-banded) computes the signature
    * aggregation ONCE and only re-projects the band keys per config.
    */
  private[graft] def minhashSigOfSets(shSets: DataFrame,
                                      numHashes: Int): DataFrame = {
    val sh = shSets.select(col("id"), explode(col("sh")).as("h60"))
      .withColumn("x", col("h60") % P)
    val mins = minhashPerms(numHashes).zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("x") + lit(b)) % P).as(s"h$i")
    }
    sh.groupBy(col("id")).agg(mins.head, mins.tail: _*)
  }

  /** Band-key projection of a precomputed signature table (pure
    * projection + explode — no aggregation, no shuffle). */
  private[graft] def bandRowsOfSig(sig: DataFrame, numHashes: Int,
                                   bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    sig.select(col("id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("_", (0 until rows).map(r => col(s"h${b * rows + r}")): _*)
            .as("bk"))
      }: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bk").as("bk"))
  }

  /** Exact-Jaccard verification of candidate (id_a, id_b) pairs against
    * a fingerprint-set table: ≥ threshold survives, with the shared
    * jaccard value. Intersections run on 8-byte longs.
    */
  private def verifyJaccard(cand: DataFrame, shSets: DataFrame,
                            threshold: Double): DataFrame =
    cand
      .join(shSets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shSets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard", col("shared").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int, numHashes: Int, bands: Int,
                      threshold: Double): DataFrame = {
    // ONE materialized fingerprint-set index feeds both the signature
    // build (exploded rows) and the exact-Jaccard verify joins — the
    // corpus is tokenized+hashed once, and the verify intersections run
    // on 8-byte longs (identical sizes to the string sets barring an
    // md5-prefix collision, see fingerprintSets).
    val shSets = fingerprintSets(docs, idCol, textCol, n).localCheckpoint()
    lshPairsFromBandRows(lshBandRows(shSets, numHashes, bands), shSets,
      threshold)
  }

  /** Candidate generation (band-bucket self-join) + exact verify from
    * precomputed band rows and fingerprint sets — the multi-config
    * audit seam. */
  private[graft] def lshPairsFromBandRows(bandRows: DataFrame,
                                          shSets: DataFrame,
                                          threshold: Double): DataFrame = {
    val cand = bandRows.as("a")
      .join(bandRows.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyJaccard(cand, shSets, threshold)
  }

  /** The prior-release LSH index artifact for incremental dedup: the
    * band rows and the fingerprint sets of an already-released corpus,
    * both plain tables a release pipeline writes once (parquet) and
    * every later ingest batch reads. Band rows find candidates; the
    * sets verify exact Jaccard without re-reading released TEXT.
    */
  def lshIndexOf(docs: DataFrame, idCol: String, textCol: String,
                 n: Int, numHashes: Int, bands: Int): (DataFrame, DataFrame) = {
    val shSets = fingerprintSets(docs, idCol, textCol, n)
    (lshBandRows(shSets, numHashes, bands), shSets)
  }

  /** Incremental near-dup detection of a NEW batch against a released
    * corpus — the continuously-growing-corpus shape: the released side
    * is represented ONLY by its stored index artifact (band rows +
    * fingerprint sets from lshIndexOf); its text is never re-tokenized
    * and its signatures never recomputed. The new batch is fingerprinted
    * and banded (O(new)), candidates are new×(released ∪ new) band-key
    * collisions (released×released is structurally excluded — those
    * pairs were adjudicated when the release was cut), and exact
    * Jaccard verifies against the union of set tables.
    *
    * Law: exactly the full-corpus minhashLshPairs output restricted to
    * pairs with ≥ 1 new side (same permutation constants ⇒ identical
    * band keys ⇒ identical candidate set; id_a < id_b canonical order).
    *
    * Scale shape: per-batch cost is O(new tokens) signature work plus
    * an equi-join of the new band rows against the index — a
    * broadcast-able probe when the batch is small, a shuffle join
    * whose released side the band-key equi-join prunes to colliding
    * buckets otherwise. Nothing is ever all-pairs, and the released
    * corpus contributes index ROWS (bands × docs), not text.
    */
  def incrementalLshPairs(newDocs: DataFrame, idCol: String, textCol: String,
                          indexBands: DataFrame, indexSets: DataFrame,
                          n: Int, numHashes: Int, bands: Int,
                          threshold: Double): DataFrame = {
    val newSets = fingerprintSets(newDocs, idCol, textCol, n).localCheckpoint()
    val newBands = lshBandRows(newSets, numHashes, bands)
    val allBands = indexBands.unionByName(newBands)
    val cand = newBands.as("a")
      .join(allBands.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
    verifyJaccard(cand, indexSets.unionByName(newSets), threshold)
  }

  /** 60-bit SimHash fingerprint per document: for each bit position,
    * sum ±1 votes from every shingle's content hash; the bit is set when
    * the vote is positive. Two documents with small Hamming distance
    * between fingerprints are near-duplicates.
    *
    * Shape: ONE aggregation — the per-bit votes are `bits` conditional
    * sums over the same shingle-hash rows (bit positions are constants,
    * so each vote is a static expression, no bit-position explode). The
    * shuffle carries one row per (id, shingle), map-side combined to one
    * partial row per id per partition; an exploded bit axis would
    * multiply shuffle volume by the bit width for no information gain.
    */
  /** SimHash near-duplicate pairs (the Google-crawl dedup shape): band
    * the fingerprint into `bands` equal bit-slices; documents agreeing
    * on ≥1 band become candidates (pigeonhole: hamming ≤ bands−1 ⇒ some
    * band is untouched, so recall is EXACT for maxDist ≤ bands−1), then
    * verify bit_count(xor) ≤ maxDist. Candidate generation is an
    * equi-join on the band key — a hot band bucket is a skewed join
    * key, AQE's problem, never an all-pairs product. Fingerprints ride
    * along through the band join, so verification needs no extra join.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, bits: Int = 60, bands: Int = 4,
                   maxDist: Int = 3): DataFrame = {
    require(bits % bands == 0, "bands must divide bits")
    require(maxDist < bands, "exact recall needs maxDist <= bands - 1")
    val width = bits / bands
    val mask = (1L << width) - 1
    val fp = simhash(docs, idCol, textCol, n, bits)
    val bandRows = fp.select(col("id"), col("simhash"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * width).bitwiseAND(lit(mask)).as("bk"))
      }: _*)).as("bb"))
      .select(col("id"), col("simhash"),
        col("bb.band").as("band"), col("bb.bk").as("bk"))
    bandRows.as("a")
      .join(bandRows.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.simhash").as("fp_a"),
        col("b.id").as("id_b"), col("b.simhash").as("fp_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("int"))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  def simhash(docs: DataFrame, idCol: String, textCol: String,
              n: Int, bits: Int = 60): DataFrame = {
    val votes = (0 until bits).map { j =>
      sum(when(expr(s"shiftright(h, $j) & 1") === 1, 1L).otherwise(-1L)).as(s"v$j")
    }
    val assemble = (0 until bits).map { j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    shingleRows(docs, idCol, textCol, n)
      .withColumn("h", hash60(col("shingle")))
      .groupBy(col("id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("id"), assemble.as("simhash"))
  }

  /** The release step of the dedup story: given cluster assignments
    * (Graph.connectedComponents output: id, cluster_id) and a
    * per-document score, keep the BEST document of each duplicate
    * cluster — argmax score, ties to the smallest id, so the choice is
    * total-ordered and replays identically anywhere. Returns one row
    * per cluster: survivor id, its score, and the cluster size.
    *
    * Shape: one equi-join on id (cluster assignments ⋈ scores) and one
    * per-cluster window. Duplicate clusters are small by construction
    * (they are near-dup groups), so the window partitions are bounded —
    * no giant-partition risk even at full-corpus scale.
    */
  def survivors(clusters: DataFrame, scores: DataFrame, idCol: String,
                scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col(scoreCol).desc, col("id"))
    clusters
      .join(scores.withColumnRenamed(idCol, "id"), "id")
      .withColumn("_rk", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))))
      .filter(col("_rk") === 1)
      .select(col("cluster_id"), col("id").as("survivor_id"),
        col(scoreCol), col("n_members"))
  }

  /** Windowed keep-first deduplication — "at most one row per key per
    * time window, the EARLIEST wins": the recrawl/rate-limit dedup
    * (same page fetched daily, same user action retried) that exact
    * dedup (q22, content-global) and streaming dedup (q79,
    * watermark-scoped) both miss: here the horizon is a fixed
    * CALENDAR window, batch-computable over all of history.
    *
    * Shape at 100 TB: windows are integer floor-division buckets of
    * epoch micros (no calendar/timezone arithmetic), and the winner
    * per (keys, bucket) is ONE partial-aggregable `min_by` of the full
    * row over the (ts, tie) order — each input partition collapses to
    * ≤1 row per group before the exchange. The window-function
    * formulation (row_number = 1) would shuffle every row and sort;
    * this shuffles only group winners. Same law, an exchange of
    * winners instead of an exchange of everything.
    */
  def windowedFirst(df: DataFrame, keys: Seq[String], tsCol: String,
                    tieCol: String, windowMicros: Long): DataFrame = {
    require(windowMicros > 0, s"windowMicros must be > 0, got $windowMicros")
    val cols = df.columns.toSeq
    // `div`, not `/`: IEEE division can round up across the boundary
    val bucket = expr(s"unix_micros(`$tsCol`) div ${windowMicros}L")
    df.withColumn("_wb", bucket)
      .groupBy((keys :+ "_wb").map(col): _*)
      .agg(min_by(struct(cols.map(col): _*),
        struct(col(tsCol), col(tieCol))).as("_r"))
      .select(cols.map(c => col(s"_r.$c")): _*)
  }

  /** Exact repeated-substring spans (the passage-level dedup of
    * "Deduplicating Training Data Makes Language Models Better",
    * Lee et al. 2022, re-expressed relationally): find every token
    * n-gram that occurs in ≥ 2 DISTINCT documents, then report, per
    * document, the merged [start, end) token spans those duplicated
    * n-grams cover — the regions a curation pass would mask or cut.
    * Complements the whole-document operators above: exactGroups
    * removes identical documents, LSH/Jaccard near-identical ones;
    * this catches boilerplate passages embedded in otherwise-unique
    * documents, which neither whole-document pass can see.
    *
    * Law (cross-engine deterministic): 1-based token positions from
    * the whitespace token law; an n-gram at position i covers
    * [i, i+n); spans merge when overlapping OR touching (a duplicated
    * region is contiguous in token space); output one row per document
    * that has ≥ 1 duplicated span. Gram identity is hash60 of the
    * space-joined gram (both engines compute the identical md5-prefix
    * key, so a collision — ~2⁻⁶⁰ — changes both sides identically).
    *
    * Scale shape: gram rows ≈ token count, carrying only (id, i,
    * 60-bit hash) — the gram TEXT never shuffles. One aggregation on
    * the hash finds cross-doc grams (partial-aggregable two-phase
    * count-distinct), one semi-join back marks hit positions, and the
    * interval merge is a per-document window whose partition size is
    * bounded by document length. No all-pairs stage anywhere; at
    * 100 TB every stage is proportional to corpus tokens. A
    * stop-gram shared by k docs contributes k rows to the semi-join
    * probe — linear, unlike the k² a pair-join would emit.
    */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame =
    spanIslands(docs, idCol, textCol, n)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_spans"),
        sum((col("se") - col("ss")).cast("long")).as("masked_tokens"),
        concat_ws(",", transform(
          array_sort(collect_list(struct(col("ss"), col("se")))),
          x => concat(x("ss").cast("string"), lit("-"),
            x("se").cast("string")))).as("spans"))

  /** The merged repeated-span intervals — (id, ss, se), token
    * positions 1-based, [ss, se) — shared by the REPORT
    * ([[repeatedSpans]]) and the REMOVAL ([[removeRepeatedSpans]]).
    */
  private def spanIslands(docs: DataFrame, idCol: String,
                          textCol: String, n: Int): DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2, got $n")
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= n)
    val grams = toks
      .select(col("id"), explode(expr(
        s"""transform(sequence(1, size(t) - ${n - 1}),
           |  i -> named_struct('i', i, 'g', array_join(slice(t, i, $n), ' ')))"""
          .stripMargin)).as("p"))
      .select(col("id"), col("p.i").as("i"), hash60(col("p.g")).as("gh"))
    val dupGrams = grams.groupBy(col("gh"))
      .agg(countDistinct(col("id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("gh"))
    val hits = grams.join(dupGrams, Seq("gh"), "left_semi")
      .select(col("id"), col("i").as("s"), (col("i") + n).as("e"))
    // classic island detection: a hit starts a new span iff it begins
    // strictly after everything seen so far ends (touching merges)
    val byPos = Window.partitionBy(col("id")).orderBy(col("s"), col("e"))
    val flagged = hits.withColumn("new_span",
      when(col("s") > coalesce(
        max(col("e")).over(byPos.rowsBetween(Window.unboundedPreceding, -1)),
        lit(-1)), 1L).otherwise(0L))
    flagged.withColumn("span_id",
      sum(col("new_span")).over(byPos.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("id"), col("span_id"))
      .agg(min(col("s")).as("ss"), max(col("e")).as("se"))
      .select(col("id"), col("ss"), col("se"))
  }

  /** ExactSubstr REMOVAL — the second half of Lee et al. 2021
    * ("Deduplicating Training Data Makes Language Models Better"):
    * [[repeatedSpans]] detects cross-document repeated token spans;
    * this verb REMOVES them and reassembles the survivors in order —
    * the usable corpus output, one row per input document
    * (`clean_text` empty when everything was repeated). n_removed
    * per document equals the report's masked_tokens by construction.
    *
    * Shape at 100 TB: the detection stages are [[spanIslands]]'s
    * (gram explode, bucketed dup-gram count, semi-join back, bounded
    * per-doc island window); removal adds one bounded explode of the
    * span intervals, one anti-join of token rows on (id, position) —
    * O(corpus tokens), bucketed, never all-pairs — and the q255-style
    * per-document reassembly aggregate bounded by document length.
    */
  def removeRepeatedSpans(docs: DataFrame, idCol: String,
                          textCol: String, n: Int): DataFrame = {
    val drop = spanIslands(docs, idCol, textCol, n)
      .select(col("id"), explode(sequence(col("ss"), col("se") - 1))
        .as("i"))
    val toks = docs.select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("p0", "tok")))
      .select(col("id"), (col("p0") + 1).as("i"), col("tok"))
    val kept = toks.join(drop, Seq("id", "i"), "left_anti")
      .groupBy(col("id"))
      .agg(array_join(transform(array_sort(collect_list(
          struct(col("i"), col("tok")))), x => x.getField("tok")), " ")
          .as("clean_text"),
        count(lit(1)).as("n_kept"))
    docs.select(col(idCol).as("id"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(kept, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"))
  }

  /** LINE-level exact dedup — the C4/RefinedWeb repeated-line removal
    * law, the one public text-dedup granularity between document
    * (exactGroups) and passage (repeatedSpans): boilerplate
    * (navigation bars, cookie banners, signatures) repeats VERBATIM
    * across pages while each page's body is unique, so a line whose
    * corpus-wide DOCUMENT FREQUENCY exceeds `maxDocFreq` is removed
    * from EVERY document and the survivors reassemble in their
    * original order. Output: (id, dedup_text, n_kept, n_dropped) —
    * one row per input document, empty string when everything
    * dropped.
    *
    * Line identity is the md5 of the exact line (128-bit — the
    * exactGroups collision discipline; a 60-bit key would collide at
    * web scale). Frequency is per-DOCUMENT (a line repeated inside
    * one doc counts once), computed distinct-first so the count is
    * the paper's df.
    *
    * Shape at 100 TB: one line explode; one distinct + one count on
    * the md5 key (map-side combinable); one equi-join back on the
    * same key — the frequency table is O(distinct lines), so Catalyst
    * broadcasts it only while it measurably fits and the join
    * degrades to scan → exchange → hash join at corpus scale (the
    * family's no-all-pairs rule either way); one per-document
    * reassembly aggregate whose collect is bounded by document
    * length. AQE's skew handling covers the hot boilerplate keys —
    * exactly the stop-shingle case above.
    */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
                maxDocFreq: Int, delimiter: String = "\n"): DataFrame = {
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1, got $maxDocFreq")
    require(delimiter.nonEmpty, "lineDedup needs a non-empty delimiter")
    // `delimiter` generalizes the granularity: "\n" is C4's line law,
    // "\n\n" is RefinedWeb's paragraph law — the unit whose verbatim
    // repetition across documents marks boilerplate. Same identity,
    // frequency, and reassembly machinery at every granularity; the
    // delimiter is quoted (a literal, not a regex) and survivors
    // rejoin with it verbatim.
    val lines = docs.select(col(idCol).as("_ld_id"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(delimiter), -1))
          .as(Seq("_ld_pos", "_ld_line")))
      .withColumn("_ld_h", md5Hex(col("_ld_line")))
    val freq = lines.select(col("_ld_id"), col("_ld_h")).distinct()
      .groupBy(col("_ld_h")).agg(count(lit(1)).as("_ld_df"))
    val keep = col("_ld_df") <= maxDocFreq
    lines.join(freq, Seq("_ld_h"))
      .groupBy(col("_ld_id"))
      .agg(
        coalesce(array_join(transform(
          array_sort(collect_list(when(keep,
            struct(col("_ld_pos"), col("_ld_line"))))),
          x => x.getField("_ld_line")), delimiter), lit(""))
          .as("dedup_text"),
        sum(when(keep, lit(1L)).otherwise(lit(0L))).as("n_kept"),
        sum(when(keep, lit(0L)).otherwise(lit(1L))).as("n_dropped"))
      .select(col("_ld_id").as(idCol), col("dedup_text"),
        col("n_kept"), col("n_dropped"))
  }
}
