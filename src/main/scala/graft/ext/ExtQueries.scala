package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Tables

/** Correctness queries for the LLM-data-pipeline operator pack (dedup,
  * similarity search, text analysis) over the `documents` / `embeddings`
  * testdata — the north-star extension surface (no reference analogue;
  * the reference stops at relational ETL).
  *
  * Every query has a full DuckDB oracle that recomputes the SAME
  * deterministic pipeline in SQL — the MinHash permutation and
  * hyperplane constants are inlined from TextHash into the generated
  * oracle text, so both engines evaluate identical integer/IEEE
  * operation sequences (see TextHash's cross-engine hashing contract).
  */
object ExtQueries {

  // Fixed operator parameters — shared by the Spark defs and the
  // generated oracle SQL below. Small enough to be cheap at sf0.01,
  // shaped exactly like the 100 TB configuration (only numHashes/bits
  // grow with scale, never the join shape).
  private[ext] val ShingleN = 3
  private val NumHashes = 16
  private val SpanGramN = 8 // q132: repeated-substring gram order

  /** q133: the prior-release LSH index artifact (band rows +
    * fingerprint sets of the released corpus, doc_id % 3 != 0), staged
    * once per JVM per sf dir — in a real pipeline the release step
    * writes these tables and every later ingest batch only READS them.
    * The query's subject is the incremental batch-vs-index join, not
    * the (already-released) index build.
    */
  private val lshIndexStaged =
    scala.collection.concurrent.TrieMap[String, (String, String)]()
  private def stagedLshIndex(s: SparkSession, d: String): (String, String) =
    lshIndexStaged.getOrElseUpdate(new java.io.File(d).getCanonicalPath, {
      val bp = graft.sources.Sinks.tmpPathFor("lsh_index_bands", d)
      val sp = graft.sources.Sinks.tmpPathFor("lsh_index_sets", d)
      val (bands, sets) = Dedup.lshIndexOf(
        Tables.documents(s, d).filter(col("doc_id") % 3 =!= 0),
        "doc_id", "text", ShingleN, NumHashes, Bands)
      bands.write.mode("overwrite").parquet(bp)
      sets.write.mode("overwrite").parquet(sp)
      (bp, sp)
    })
  private val Bands = 4
  private[ext] val JaccardThreshold = 0.5
  private val KnnK = 10
  private val KnnQueryIds = 5 // vec_id < 5 → 5 query vectors
  private val PqM = 4    // q248: subspaces (64 dims → 4 × 16)
  private val PqBits = 4 // q248: ≤ 16 codebook entries per subspace
  private val EmbDims = 64
  private val QuantLevels = 256      // q146: int8 quantizer levels
  private val RerankCandidates = 48  // q146: stage-1 survivors per query
  private val CosineThreshold = 0.3
  private val IvfProbes = 4
  private val LloydIters = 2
  private val CmsDepth = 4
  private val CmsWidth = 1024
  private val HeavyK = 50
  private val HllBuckets = 64 // m=64 → ~13% rel. error, plenty per-type
  private val DayMicros = 86400L * 1000000L // q120: UTC-day dedup window

  /** LSH signature width is SCALE-ADAPTIVE: Similarity.bitsFor(N) keeps
    * expected bucket occupancy ~32 as the corpus grows (sf0.01: N=500 →
    * 4 bits; sf0.1: N=2000 → 6 bits; 1e9 vectors → 25 bits). The static
    * oracle SQL inlines the hyperplanes for the driver's verify corpus
    * (sf0.01, N=VerifyEmbCount → 4 bits) — the Spark defs compute the
    * same width from the live corpus count at runtime.
    * Verify.main calls [[assertVerifyScale]] so a drifted fixture fails
    * loudly instead of as an opaque hash mismatch on q29/q30/q43/q45/q74.
    */
  private val VerifyEmbCount = 500L // TESTDATA.md: sf0.01 embeddings rows
  private val VerifyLshBits = Similarity.bitsFor(VerifyEmbCount)

  /** Loud guard for the static-oracle assumption above: if the verify
    * corpus's embedding count maps to a different signature width than
    * the inlined one, FAIL FAST naming exactly which queries would
    * mismatch and why — a drifted fixture must not proceed to an opaque
    * q29/q30/q43/q45/q74 hash mismatch. Callers probe for the embeddings
    * table first (Verify.main); this throws only on real drift.
    */
  def assertVerifyScale(s: SparkSession, d: String): Unit = {
    val n = embCount(s, d)
    if (Similarity.bitsFor(n) != VerifyLshBits)
      throw new IllegalStateException(
        s"embeddings count $n in $d → bitsFor=${Similarity.bitsFor(n)} " +
          s"but the static oracle SQL inlines $VerifyLshBits-bit " +
          s"hyperplanes (count $VerifyEmbCount); q29/q30/q43/q45/q74 would " +
          "hash-mismatch for this corpus.")
  }

  /** Corpus row count, one metadata-only job per (dir) per JVM — the
    * defs below need it for the scale-adaptive signature width, and
    * without caching every query CONSTRUCTION (bench warmup + timed
    * pass, Explain, Verify) would fire a count job.
    */
  private val embCounts = scala.collection.concurrent.TrieMap[String, Long]()
  private def embCount(s: SparkSession, d: String): Long =
    embCounts.getOrElseUpdate(d, Tables.embeddings(s, d).count())

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact content dedup: normalize → md5 group key → canonical id +
    // copy count. One shuffle on the 128-bit key.
    "q22_dedup_exact" -> ((s, d) =>
      Dedup.exactGroups(Tables.documents(s, d), "doc_id", "text")),

    // Windowed keep-first dedup: at most one event per (user, type)
    // per UTC day, earliest (ts, event_id) wins — one partial-
    // aggregable min_by of the full row, shuffling winners only.
    "q120_windowed_dedup" -> ((s, d) =>
      Dedup.windowedFirst(Tables.events(s, d),
        Seq("user_id", "event_type"), "ts", "event_id", DayMicros)),

    // MinHash signatures (16 permutations over 3-gram shingles): one
    // aggregation over the exploded shingles, map-side combinable.
    "q23_minhash_sig" -> ((s, d) =>
      Dedup.minhashSignatures(Tables.documents(s, d), "doc_id", "text",
        ShingleN, NumHashes)),

    // Banded-LSH near-dup pairs (4 bands × 4 rows) with exact-Jaccard
    // verification — candidate generation is an equi-join on the band
    // key, never all-pairs.
    "q24_lsh_neardup" -> ((s, d) =>
      Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
        ShingleN, NumHashes, Bands, JaccardThreshold)),

    // Exact n-gram-Jaccard pairs via the shingle inverted-index
    // self-join (exact recall; the LSH query above is the scale path).
    "q25_jaccard_pairs" -> ((s, d) =>
      Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text",
        ShingleN, JaccardThreshold)),

    // 60-bit SimHash fingerprints per document.
    "q26_simhash" -> ((s, d) =>
      Dedup.simhash(Tables.documents(s, d), "doc_id", "text", ShingleN)),

    // LSH RECALL AUDIT — the banding recall contract (documented on
    // minhashLshPairs since r5) made INSPECTABLE: exactly which true
    // ≥-threshold pairs a banding config misses (truth ANTI JOIN lsh;
    // every verified LSH pair is true by construction, so the missed
    // pairs ARE the recall story). Two configs side by side: the
    // production 4×4 (P[miss] = (1−j⁴)⁴ — tiny at this corpus' high-
    // jaccard near-dups, and the audit PROVES it misses nothing here)
    // and a deliberately under-banded 1×16 (candidate only on a full
    // 16-hash signature match, P[catch] = j¹⁶ — at j=0.8 only 2.8%),
    // whose misses both engines must derive identically. This is the
    // release gate that decides whether to buy more bands — run on a
    // sample at 100 TB, exact here.
    "q176_lsh_recall_audit" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // ONE corpus tokenize+hash pass and ONE 16-hash signature
      // aggregation shared by the truth side and BOTH banding configs
      // (the configs differ only in the band-key projection); the truth
      // pair set is materialized once instead of recomputed per
      // anti-join branch. Identical output — the audit previously ran
      // three fingerprint passes and two signature aggregations.
      val shSets = Dedup.fingerprintSets(docs, "doc_id", "text", ShingleN)
        .localCheckpoint()
      val sig = Dedup.minhashSigOfSets(shSets, NumHashes).localCheckpoint()
      val truth = Dedup.jaccardPairsFromSets(shSets, JaccardThreshold)
        .localCheckpoint()
      def missesOf(bands: Int, tag: String) =
        truth.join(
            Dedup.lshPairsFromBandRows(
              Dedup.bandRowsOfSig(sig, NumHashes, bands), shSets,
              JaccardThreshold)
              .select("id_a", "id_b"),
            Seq("id_a", "id_b"), "left_anti")
          .withColumn("config", lit(tag))
      missesOf(Bands, s"b$Bands").unionByName(missesOf(1, "b1"))
    }),

    // Incremental near-dup detection: the arriving batch (doc_id
    // % 3 == 0) against the staged prior-release LSH index — released
    // text is never re-tokenized, released signatures never recomputed;
    // released×released pairs structurally excluded.
    "q133_incremental_dedup" -> ((s, d) => {
      val (bp, sp) = stagedLshIndex(s, d)
      Dedup.incrementalLshPairs(
        Tables.documents(s, d).filter(col("doc_id") % 3 === 0),
        "doc_id", "text", s.read.parquet(bp), s.read.parquet(sp),
        ShingleN, NumHashes, Bands, JaccardThreshold)
    }),

    // Exact repeated-substring spans (passage-level dedup): merged
    // [start, end) token spans of every 8-gram shared by ≥ 2 docs —
    // the regions a curation pass would mask. Gram rows carry only a
    // 60-bit hash; no all-pairs stage.
    // ExactSubstr REMOVAL (Lee et al. 2021, the second half of q132's
    // detection): repeated cross-document token spans cut out of
    // every document, survivors reassembled in order — the usable
    // corpus output of passage-level dedup.
    "q257_span_removal" -> ((s, d) =>
      Dedup.removeRepeatedSpans(Tables.documents(s, d), "doc_id",
        "text", SpanGramN)),

    "q132_repeated_spans" -> ((s, d) =>
      Dedup.repeatedSpans(Tables.documents(s, d), "doc_id", "text",
        SpanGramN).withColumnRenamed("id", "doc_id")),

    // Text profiling: counts, quality score, language guess, rolling
    // fingerprint — pure projection, no shuffle.
    "q27_text_stats" -> ((s, d) =>
      TextStats.profile(Tables.documents(s, d), "doc_id", "text")),

    // Exact top-k cosine neighbors for a small query set (broadcast
    // nested loop — the correctness baseline for ANN).
    "q28_knn_brute" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < KnnQueryIds), KnnK)
    }),

    // Two-stage quantized ANN: int8-code integer-dot prefilter (q145's
    // storage layer made searchable; zero IEEE in the corpus-wide
    // stage) → exact cosine re-rank of the top candidates.
    "q146_quantized_rerank" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.quantizedRerankTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < KnnQueryIds), KnnK, QuantLevels,
        RerankCandidates)
    }),

    // Approximate top-k via sign-LSH buckets (equi-join on the
    // signature — the 100 TB path; deterministic hyperplanes,
    // scale-adaptive width from the live corpus count — a
    // metadata-only parquet count).
    "q29_knn_lsh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val bits = Similarity.bitsFor(embCount(s, d))
      Similarity.lshTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < KnnQueryIds), KnnK, bits, EmbDims)
    }),

    // Embedding-cosine near-dup pairs, LSH-bucketed self-join,
    // scale-adaptive width.
    "q30_embed_neardup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.nearDupPairs(emb, "vec_id", "embedding",
        CosineThreshold, Similarity.bitsFor(embCount(s, d)), EmbDims)
    }),

    // SemDeDup (Abbas et al.) — embedding-space near-dup PRUNING,
    // cluster-first: the IVF coarse cells play the paper's k-means
    // clusters, cosine pairs are emitted only within a cell, and a
    // vector is pruned iff a same-cell neighbor above the threshold
    // dominates it by quality (document length; ties keep the lower
    // id — q64's argmax-survivor law pairwise). Completes the dedup
    // family: exact, n-gram, MinHash, SimHash, passage-level,
    // incremental, and now embedding-space.
    "q244_semdedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.semDeDup(emb, "vec_id", "embedding",
        Tables.documents(s, d), "doc_id", "n_chars",
        CosineThreshold, Similarity.bitsFor(embCount(s, d)), EmbDims)
    }),

    // Semantic duplicate CLUSTERS — the SemDeDup edge set (cell-exact
    // cosine pairs) closed under transitivity: every vector in a
    // semantic near-dup component labeled with the component's min id
    // (q46's closure law on embedding-space edges instead of
    // n-gram-Jaccard ones).
    "q246_semdedup_clusters" -> ((s, d) =>
      Graph.connectedComponents(
        Similarity.semDupPairs(Tables.embeddings(s, d), "vec_id",
          "embedding", CosineThreshold,
          Similarity.bitsFor(embCount(s, d)), EmbDims)
          .select(col("id_a"), col("id_b")))),

    // Embedding-space benchmark decontamination — the semantic half
    // of the hygiene pass (q55 is the n-gram half): corpus vectors
    // cosine-matched against a held-out benchmark slice, within
    // shared LSH cells only (bipartite SemDeDup — never
    // corpus × benchmark).
    "q256_sem_decontaminate" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.semContamination(
        emb.filter(col("vec_id") % 23 =!= 0), "vec_id", "embedding",
        emb.filter(col("vec_id") % 23 === 0), "vec_id", "embedding",
        CosineThreshold, Similarity.bitsFor(embCount(s, d)), EmbDims)
    }),

    // SimHash near-dup pairs: 4-banded 60-bit fingerprints, exact
    // recall for hamming <= 3.
    "q44_simhash_pairs" -> ((s, d) =>
      Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text", ShingleN)),

    // IVF coarse quantizer: per-bucket mean embedding + population,
    // decimal-exact (order-independent) distributed sums. Registered in
    // FLAT form (sig, pos, mean, n — scalar columns only): the driver's
    // compare hashes sorted cells, which an array column defeats.
    "q43_bucket_centroids" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bucketCentroidsFlat(emb, "vec_id", "embedding",
        Similarity.bitsFor(embCount(s, d)), EmbDims)
    }),

    // IVF search: rank cells by centroid cosine, scan the nProbe
    // nearest cells' members only.
    "q45_knn_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < KnnQueryIds), KnnK,
        Similarity.bitsFor(embCount(s, d)), EmbDims, IvfProbes)
    }),

    // Product quantization + ADC search (Jégou et al. — the Faiss
    // IVF-PQ codebook leg): dims split into PqM subspaces, per-
    // subspace codebooks from the subvector sign-cell quantized means
    // (fixed hyperplanes — train is deterministic), every vector
    // stored as PqM small codes, search = per-query distance TABLE +
    // a lookup-sum over the code table (the corpus-wide stage never
    // touches floats wider than the integer micro-unit distances).
    "q248_pq_adc_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < KnnQueryIds), KnnK, PqM, PqBits,
        EmbDims)
    }),

    // THE COMPOSED IVF-PQ INDEX (Faiss's deployment shape): the
    // coarse quantizer picks each query's nProbe nearest cells, the
    // ADC lookup-sum runs over only those cells' member codes —
    // q45's cell law × q248's code law, composed.
    "q249_pq_ivf_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqIvfTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < KnnQueryIds), KnnK, PqM, PqBits,
        EmbDims, Similarity.bitsFor(embCount(s, d)), IvfProbes)
    }),

    // Lloyd-trained quantizer: k-means refinement rounds over the
    // LSH-bucket seeding — zero-RNG, cross-engine-exact training.
    "q74_lloyd_refine" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lloydRefineFlat(emb, "vec_id", "embedding",
        Similarity.bitsFor(embCount(s, d)), EmbDims, LloydIters)
    }),

    // Count-min heavy hitters: exact top-k terms cross-checked against
    // the sketch estimate (est >= exact by construction). The sketch is
    // built from the pre-aggregated vocabulary (weighted insert), so
    // the corpus shuffles ONCE — everything downstream is
    // vocabulary-sized, and the sketch itself is fixed-size.
    "q75_cms_heavy_hitters" -> ((s, d) => {
      val exact = Tables.documents(s, d)
        .select(explode(TextHash.tokens(col("text"))).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("term").agg(count(lit(1)).as("n_exact"))
        .localCheckpoint() // feeds the sketch build AND the probe side
      val cms = Sketches.countMin(exact, "term", CmsDepth, CmsWidth,
        col("n_exact"))
      val top = exact.orderBy(col("n_exact").desc, col("term")).limit(HeavyK)
      Sketches.estimateMin(cms, top, "term", CmsDepth, CmsWidth)
        .select(col("term"), col("n_exact"), col("n_est"))
    }),

    // Sketch-SCREENED exact heavy hitters — the CMS as a shuffle gate,
    // not just a summary (the q75 complement): row-local broadcast
    // probe appends each token row's estimate with NO shuffle, the
    // threshold gate drops the tail before the exchange, and the exact
    // groupBy counts only survivors (complete per term — every
    // occurrence screens identically; CMS overcounts ⇒ no false
    // negatives; the final exact HAVING removes false positives). The
    // oracle needs no sketch: the result provably equals plain GROUP
    // BY ... HAVING. Threshold = ⌊total_tokens/32⌋, scale-proportional
    // and integer-exact on both engines.
    "q140_sketch_heavy_exact" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(TextHash.tokens(col("text"))).as("term"))
        .filter(length(col("term")) > 0)
        .localCheckpoint() // feeds sketch build, screen, and threshold
      // the sketch is the index artifact — materialize it once, or
      // every one of screenEstimate's `depth` broadcast joins rebuilds
      // the full aggregation from lineage (measured 7.9 s → 0.6 s at
      // sf0.1)
      val cms = Sketches.countMin(toks, "term", CmsDepth, CmsWidth)
        .localCheckpoint()
      val thr = toks.agg(expr("count(1) div 32").as("thr"))
      val screened = Sketches
        .screenEstimate(toks, "term", cms, CmsDepth, CmsWidth, "n_est")
        .join(broadcast(thr), col("n_est") >= col("thr")) // scalar gate
      screened.groupBy(col("term")).agg(count(lit(1)).as("n"))
        .join(broadcast(thr), col("n") >= col("thr"))
        .select(col("term"), col("n"))
    }),

    // HyperLogLog registers per event type — the cardinality sketch's
    // mergeable STATE (element-wise max), exact integers end to end
    // (md5-60 hash, leading zeros via binary-string length).
    "q115_hll_registers" -> ((s, d) =>
      Sketches.hllRegisters(Tables.events(s, d), "event_type", "user_id",
        HllBuckets)),

    // The reason registers are STORED (q115's doc): per-day sketches
    // fold into any window by element-wise max — here the COMPLETE
    // 7-day rolling distinct-user sketch per day. A range-frame window
    // would only emit buckets observed on the frame's own day; the
    // days × daily-registers interval join keeps every bucket observed
    // anywhere in the window, and the whole computation is
    // sketch-sized (days × 64 registers), never event-sized.
    "q124_hll_rolling" -> ((s, d) => {
      val daily = Sketches.hllRegisters(
        Tables.events(s, d).withColumn("day",
          expr("unix_micros(ts) div 86400000000L")),
        "day", "user_id", HllBuckets)
      val days = daily.select(col("day").as("at_day")).distinct()
      daily.join(days,
          col("day").between(col("at_day") - 6, col("at_day")))
        .groupBy(col("at_day").as("day"), col("bucket"))
        .agg(max(col("register")).as("register"))
    }),

    // Production-grade mergeable cardinality via Spark's native Apache
    // DataSketches HLL (q115/q124 build the register law by hand; this
    // is the binary-artifact path a lakehouse actually stores): each
    // (event_type, day) shard aggregates to ONE sketch blob with
    // `hll_sketch_agg` — the per-release artifact — and cross-release
    // accounting is `hll_union_agg` over the stored blobs, NO rescan of
    // history. At 100 TB: shard sketches are built once per increment
    // (map-side combinable, output bounded by 2^lgK bytes per group),
    // and any window/release union touches only sketch-sized data —
    // the q54 O(delta) discipline applied to distinct counting.
    //
    // Verify form is SELF-CHECKING: sketch blobs and estimates cannot
    // hash-match a foreign engine, so the registered output is the
    // exact distinct twin plus `within_bound` — computed Spark-side as
    // |est − exact| ≤ max(8% · exact, 1) (5σ for lgK=12's 1.6% RSE) —
    // which the oracle pins to literal TRUE: an estimate drifting out
    // of bound turns the row red. The tighter 3σ law and the
    // union-of-shards ≡ sketch-of-whole identity are pinned in
    // SketchesSpec.
    "q127_hll_cardinality" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val shards = ev
        .withColumn("day", expr("unix_micros(ts) div 86400000000L"))
        .groupBy("event_type", "day")
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      val est = shards.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("n_est"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"))
      exact.join(est, Seq("event_type"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("n_est") - col("n_exact")) <=
            greatest(ceil(col("n_exact") * lit(0.08)), lit(1L)))
            .as("within_bound"))
    }))

  // ------------------------------------------------------------------
  // DuckDB oracle generation. Shared fragments mirror the Column
  // expressions in TextHash/Dedup/TextStats/Similarity one-for-one; the
  // folds are sequential (list_reduce) so IEEE operation order matches
  // Spark's `aggregate` exactly.
  // ------------------------------------------------------------------

  private val P = TextHash.P

  /** Tokenize → distinct 3-gram shingles, per doc (twin of
    * TextHash.tokens + TextHash.shingles).
    */
  private[ext] val shingleCtes =
    s"""toks AS (
       |  SELECT doc_id AS id, regexp_split_to_array(trim(text), '\\s+') AS t
       |  FROM documents),
       |sh AS (
       |  SELECT id,
       |    CASE WHEN len(t) >= $ShingleN THEN
       |      list_distinct(list_transform(range(1, len(t) - ${ShingleN - 2}),
       |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
       |    ELSE CAST([] AS VARCHAR[]) END AS s
       |  FROM toks)""".stripMargin

  /** 60-bit md5-prefix hash of a string expression (twin of
    * TextHash.hash60).
    */
  private def hash60Sql(x: String): String =
    s"CAST('0x' || substr(md5($x), 1, 15) AS BIGINT)"

  /** Exploded shingle rows with the MinHash domain value x (twin of
    * Dedup.shingleRows + the `% P` mapping).
    */
  private val xsCte =
    s"""xs AS (
       |  SELECT id, ${hash60Sql("u")} % $P AS x
       |  FROM (SELECT id, unnest(s) AS u FROM sh WHERE len(s) > 0))""".stripMargin

  /** MinHash signature aggregation (twin of Dedup.minhashSignatures). */
  private val sigCte = {
    val mins = TextHash.minhashPerms(NumHashes).zipWithIndex.map {
      case ((a, b), i) => s"min(($a * x + $b) % $P) AS h$i"
    }.mkString(",\n    ")
    s"""sig AS (
       |  SELECT id,
       |    $mins
       |  FROM xs GROUP BY id)""".stripMargin
  }

  /** Sequential left fold `((0 + x1) + x2) + …` — twin of Spark's
    * `aggregate(items, 0.0, (acc, x) => acc + x)`.
    */
  private def foldSum(items: String): String =
    s"list_reduce(list_prepend(0.0, $items), (acc, x) -> acc + x)"

  /** Twin of Functions.dotProduct (zip_with product, then fold). */
  private def dotSql(a: String, b: String): String =
    foldSum(s"list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])")

  /** Twin of Functions.l2Norm (fold of acc + x*x). */
  private def normSql(a: String): String =
    s"sqrt(list_reduce(list_prepend(0.0, list_transform($a, x -> x * x)), (acc, x) -> acc + x))"

  /** Twin of Functions.cosineSim (null on zero norms). */
  private def cosineSql(a: String, b: String): String =
    s"""CASE WHEN ${normSql(a)} * ${normSql(b)} = 0.0 THEN NULL
       |     ELSE ${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}) END""".stripMargin

  /** Twin of Similarity.signSignature: bit j set iff dot(v, plane_j) > 0.
    * Hyperplane ±1 entries inlined as a literal list per bit.
    */
  private def signSigSqlFor(v: String, bits: Int, dims: Int): String =
    TextHash.hyperplanes(bits, dims).zipWithIndex.map { case (w, j) =>
      val lits = w.map(x => if (x > 0) "1.0" else "-1.0").mkString(", ")
      val dot = foldSum(
        s"list_transform(range(1, len($v) + 1), i -> $v[i] * (LIST_VALUE($lits))[i])")
      s"(CASE WHEN $dot > 0.0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  private def signSigSql(v: String): String =
    signSigSqlFor(v, VerifyLshBits, EmbDims)

  /** Twin of Similarity.sqDist: left-to-right squared-L2 fold. */
  private def sqDistSql(a: String, b: String): String =
    foldSum(s"list_transform(range(1, len($a) + 1), " +
      s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))")

  /** Banded LSH candidate pairs + exact-Jaccard verification (twin of
    * Dedup.minhashLshPairs), parameterized by band count so the q176
    * recall audit can compare configs.
    */
  private def lshPairsSqlFor(bands: Int): String = {
    val rows = NumHashes / bands
    val bandSelects = (0 until bands).map { b =>
      val cols = (0 until rows).map(r => s"h${b * rows + r}").mkString(", ")
      s"SELECT id, $b AS band, concat_ws('_', $cols) AS bk FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH $shingleCtes,
       |$xsCte,
       |$sigCte,
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bk = b.bk AND a.id < b.id),
       |sets AS (SELECT id, s FROM sh WHERE len(s) > 0),
       |verified AS (
       |  SELECT c.id_a, c.id_b,
       |    CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS shared,
       |    len(a.s) AS na, len(b.s) AS nb
       |  FROM cand c
       |  JOIN sets a ON a.id = c.id_a
       |  JOIN sets b ON b.id = c.id_b)
       |SELECT id_a, id_b,
       |  CAST(shared AS DOUBLE) / CAST(na + nb - shared AS DOUBLE) AS jaccard
       |FROM verified
       |WHERE CAST(shared AS DOUBLE) / CAST(na + nb - shared AS DOUBLE) >= $JaccardThreshold""".stripMargin
  }

  private val lshPairsSql = lshPairsSqlFor(Bands)

  /** Exact shingle-inverted-index Jaccard CTE chain — `j` is the final
    * scored-pairs CTE. Shared with the connected-components oracle
    * (CurationQueries), which extends the chain with a recursive
    * closure.
    */
  private[ext] val jaccardCtes =
    s"""$shingleCtes,
       |rows_ AS (SELECT id, unnest(s) AS shingle FROM sh WHERE len(s) > 0),
       |counts AS (SELECT id, count(*) AS n_sh FROM rows_ GROUP BY id),
       |shared AS (
       |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
       |  FROM rows_ a JOIN rows_ b
       |    ON a.shingle = b.shingle AND a.id < b.id
       |  GROUP BY a.id, b.id),
       |j AS (
       |  SELECT s.id_a, s.id_b,
       |    CAST(s.shared AS DOUBLE) /
       |      CAST(ca.n_sh + cb.n_sh - s.shared AS DOUBLE) AS jaccard
       |  FROM shared s
       |  JOIN counts ca ON ca.id = s.id_a
       |  JOIN counts cb ON cb.id = s.id_b)""".stripMargin

  /** Twin of Dedup.jaccardPairs. */
  private val jaccardPairsSql =
    s"""WITH $jaccardCtes
       |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= $JaccardThreshold""".stripMargin

  /** SimHash twin (votes per bit, then bit assembly). */
  private val simhashSql =
    s"""WITH $shingleCtes,
       |hx AS (
       |  SELECT id, ${hash60Sql("u")} AS h
       |  FROM (SELECT id, unnest(s) AS u FROM sh WHERE len(s) > 0)),
       |v AS (
       |  SELECT id, j,
       |    CAST(sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS vote
       |  FROM hx CROSS JOIN (SELECT unnest(range(0, 60)) AS j) js
       |  GROUP BY id, j)
       |SELECT id,
       |  CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << j)
       |           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
       |FROM v GROUP BY id""".stripMargin

  /** TextStats.profile twin, parameterized by the source relation so
    * the curation-pipeline oracle (CurationQueries q51) can run it over
    * a deduped subset.
    */
  private[ext] def textStatsSql(src: String): String = {
    val ratios = TextStats.stopwords.map { case (lang, words) =>
      val in = words.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(t, x -> x IN ($in))) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS r_$lang"
    }.mkString(",\n    ")
    val langs = TextStats.stopwords.map(_._1)
    val best = s"greatest(${langs.map(l => s"r_$l").mkString(", ")})"
    val guess = langs.map(l =>
      s"WHEN r_$l = best AND best > 0.0 THEN '$l'").mkString(" ")
    s"""WITH base AS (
       |  SELECT doc_id AS id, text,
       |    regexp_split_to_array(trim(text), '\\s+') AS t
       |  FROM $src),
       |m AS (
       |  SELECT id, text, t,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len(t) AS BIGINT) AS n_tokens,
       |    CAST(len(regexp_extract_all(text, '${TextStats.BpeIshPattern}')) AS BIGINT) AS n_bpe_tokens,
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(t, x -> CAST(length(x) AS BIGINT))),
       |      (acc, x) -> acc + x) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS avg_token_len,
       |    $ratios
       |  FROM base),
       |g AS (SELECT *, ${best} AS best FROM m)
       |SELECT id, n_chars, n_tokens, n_bpe_tokens, avg_token_len,
       |  r_en AS stopword_ratio,
       |  0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
       |    + 0.3 * (1.0 - r_en)
       |    + 0.3 * least(1.0, avg_token_len / 8.0) AS quality,
       |  CASE $guess ELSE 'und' END AS lang_guess,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, length(text) + 1),
       |        i -> CAST(ord(substr(text, i, 1)) AS BIGINT))),
       |    (acc, x) -> (acc * 31 + x) % ${TextHash.FpMod}) AS fingerprint
       |FROM g""".stripMargin
  }

  /** Brute-force top-k cosine twin. */
  private val knnBruteSql =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $KnnQueryIds),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS nbr_id,
       |    ${cosineSql("q.qv", "e.v")} AS cosine
       |  FROM e JOIN q ON e.vec_id <> q.query_id),
       |r AS (
       |  SELECT query_id, nbr_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, nbr_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, nbr_id, cosine, rank FROM r WHERE rank <= $KnnK""".stripMargin

  /** Quantized-rerank twin: identical integer quantizer (q145's law),
    * integer dot-product candidate rank, exact-cosine re-rank — only
    * the re-rank touches IEEE, under the q28 cosine contract.
    */
  private val quantRerankSql =
    s"""WITH ex AS (
       |  SELECT vec_id, CAST(u.i AS INT) AS dim,
       |    CAST(embedding[CAST(u.i AS INT) + 1] AS DOUBLE) AS x
       |  FROM embeddings, unnest(range(len(embedding))) AS u(i)),
       |mm AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM ex GROUP BY dim),
       |c AS (
       |  SELECT ex.vec_id, ex.dim,
       |    CAST(CASE WHEN mm.mx = mm.mn THEN 0
       |         ELSE LEAST(${QuantLevels - 1},
       |           floor((ex.x - mm.mn) * ${QuantLevels.toDouble}
       |             / (mm.mx - mm.mn))) END AS BIGINT) AS code
       |  FROM ex JOIN mm ON ex.dim = mm.dim),
       |qc AS (SELECT vec_id AS query_id, dim, code AS qcode FROM c
       |       WHERE vec_id < $KnnQueryIds),
       |dots AS (
       |  SELECT qc.query_id, c.vec_id AS nbr_id,
       |    sum(c.code * qc.qcode) AS dot_q
       |  FROM c JOIN qc ON c.dim = qc.dim AND c.vec_id <> qc.query_id
       |  GROUP BY 1, 2),
       |cand AS (
       |  SELECT query_id, nbr_id FROM (
       |    SELECT query_id, nbr_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY dot_q DESC, nbr_id) AS rn
       |    FROM dots) WHERE rn <= $RerankCandidates),
       |e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |scored AS (
       |  SELECT cand.query_id, cand.nbr_id,
       |    ${cosineSql("q.v", "n.v")} AS cosine
       |  FROM cand
       |  JOIN e q ON q.vec_id = cand.query_id
       |  JOIN e n ON n.vec_id = cand.nbr_id),
       |r AS (
       |  SELECT query_id, nbr_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, nbr_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, nbr_id, cosine, rank FROM r WHERE rank <= $KnnK""".stripMargin

  /** Sign-LSH top-k twin (multi-probe: own bucket + every
    * one-bit-flipped bucket on the query side).
    */
  private val knnLshSql = {
    val probeList = ("sig" +: (0 until VerifyLshBits).map(j =>
      s"xor(sig, ${1L << j})")).mkString(", ")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |s AS (SELECT vec_id, v, ${signSigSql("v")} AS sig FROM e),
       |q0 AS (SELECT vec_id AS query_id, v AS qv, sig FROM s WHERE vec_id < $KnnQueryIds),
       |q AS (
       |  SELECT query_id, qv, unnest(LIST_VALUE($probeList)) AS sig
       |  FROM q0),
       |scored AS (
       |  SELECT q.query_id, s.vec_id AS nbr_id,
       |    ${cosineSql("q.qv", "s.v")} AS cosine
       |  FROM s JOIN q ON s.sig = q.sig AND s.vec_id <> q.query_id),
       |r AS (
       |  SELECT query_id, nbr_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, nbr_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, nbr_id, cosine, rank FROM r WHERE rank <= $KnnK""".stripMargin
  }

  /** Embedding near-dup pairs twin (multi-probe on side A). */
  private val embedNearDupSql = {
    val probeList = ("sig" +: (0 until VerifyLshBits).map(j =>
      s"xor(sig, ${1L << j})")).mkString(", ")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |s AS (SELECT vec_id, v, ${signSigSql("v")} AS sig FROM e),
       |pa AS (
       |  SELECT vec_id, v, unnest(LIST_VALUE($probeList)) AS sig FROM s),
       |p AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    ${cosineSql("a.v", "b.v")} AS cosine
       |  FROM pa a JOIN s b ON a.sig = b.sig AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b, cosine FROM p WHERE cosine >= $CosineThreshold""".stripMargin
  }

  /** PQ + ADC twin: the identical subvector slicing, sign-cell
    * quantized-mean codebooks, micro-unit encode argmin, per-query
    * distance table, and lookup-sum ranking.
    */
  private val pqAdcSql = {
    val subDims = EmbDims / PqM
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |sv AS (
       |  SELECT vec_id, CAST(s.range AS INT) AS sub,
       |    list_slice(v, s.range * $subDims + 1,
       |      s.range * $subDims + $subDims) AS semb
       |  FROM e, range(0, $PqM) s),
       |cells AS (
       |  SELECT vec_id, sub, semb,
       |    ${signSigSqlFor("semb", PqBits, subDims)} AS sig
       |  FROM sv),
       |px AS (
       |  SELECT sub, sig, i.range - 1 AS pos,
       |    semb[CAST(i.range AS INT)] AS x
       |  FROM cells, range(1, ${subDims + 1}) i),
       |bk AS (
       |  SELECT sub, sig AS code, pos,
       |    CAST(sum(CAST(round(x * ${Similarity.MeanQuantum}) AS BIGINT)) AS DOUBLE)
       |      / ${Similarity.MeanQuantum} / count(*) AS mean
       |  FROM px GROUP BY sub, sig, pos),
       |books AS (
       |  SELECT sub, code, list(mean ORDER BY pos) AS centroid
       |  FROM bk GROUP BY sub, code),
       |enc0 AS (
       |  SELECT c.vec_id, c.sub, b.code,
       |    CAST(floor(${sqDistSql("c.semb", "b.centroid")}
       |      * ${Similarity.MeanQuantum}) AS BIGINT) AS d
       |  FROM cells c JOIN books b ON b.sub = c.sub),
       |codes AS (
       |  SELECT vec_id, sub, code FROM (
       |    SELECT enc0.*, row_number() OVER (PARTITION BY vec_id, sub
       |      ORDER BY d, code) AS rk FROM enc0)
       |  WHERE rk = 1),
       |dt AS (
       |  SELECT q.vec_id AS query_id, q.sub, b.code,
       |    CAST(floor(${sqDistSql("q.semb", "b.centroid")}
       |      * ${Similarity.MeanQuantum}) AS BIGINT) AS d
       |  FROM cells q JOIN books b ON b.sub = q.sub
       |  WHERE q.vec_id < $KnnQueryIds),
       |adc AS (
       |  SELECT dt.query_id, c.vec_id AS nbr_id,
       |    CAST(sum(dt.d) AS BIGINT) AS adist_micro
       |  FROM codes c JOIN dt ON dt.sub = c.sub AND dt.code = c.code
       |  WHERE c.vec_id <> dt.query_id
       |  GROUP BY 1, 2),
       |r AS (
       |  SELECT query_id, nbr_id, adist_micro,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY adist_micro, nbr_id) AS INT) AS rank
       |  FROM adc)
       |SELECT query_id, nbr_id, adist_micro, rank
       |FROM r WHERE rank <= $KnnK""".stripMargin
  }

  /** IVF-PQ twin: the coarse probed-cell CTEs (knnIvfSql's) composed
    * with the PQ codebook/encode/distance-table CTEs (pqAdcSql's),
    * the ADC sum restricted to probed-cell members.
    */
  private val pqIvfSql = {
    val subDims = EmbDims / PqM
    val Q = Similarity.MeanQuantum
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |s AS (SELECT vec_id, v, ${signSigSql("v")} AS sig FROM e),
       |cpx AS (
       |  SELECT sig, i.range - 1 AS pos, v[CAST(i.range AS INT)] AS x
       |  FROM s, range(1, ${EmbDims + 1}) i),
       |ca AS (
       |  SELECT sig, pos,
       |    CAST(sum(CAST(round(x * $Q) AS BIGINT)) AS DOUBLE)
       |      / $Q / count(*) AS mean
       |  FROM cpx GROUP BY sig, pos),
       |c AS (SELECT sig, list(mean ORDER BY pos) AS centroid
       |      FROM ca GROUP BY sig),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM s
       |      WHERE vec_id < $KnnQueryIds),
       |pr AS (
       |  SELECT q.query_id, c.sig,
       |    ${cosineSql("q.qv", "c.centroid")} AS c_cos
       |  FROM q, c),
       |probed AS (
       |  SELECT query_id, sig FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY c_cos DESC, sig) AS crk FROM pr)
       |  WHERE crk <= $IvfProbes),
       |sv AS (
       |  SELECT vec_id, CAST(t.range AS INT) AS sub,
       |    list_slice(v, t.range * $subDims + 1,
       |      t.range * $subDims + $subDims) AS semb
       |  FROM e, range(0, $PqM) t),
       |cells AS (
       |  SELECT vec_id, sub, semb,
       |    ${signSigSqlFor("semb", PqBits, subDims)} AS ssig
       |  FROM sv),
       |spx AS (
       |  SELECT sub, ssig, i.range - 1 AS pos,
       |    semb[CAST(i.range AS INT)] AS x
       |  FROM cells, range(1, ${subDims + 1}) i),
       |sbk AS (
       |  SELECT sub, ssig AS code, pos,
       |    CAST(sum(CAST(round(x * $Q) AS BIGINT)) AS DOUBLE)
       |      / $Q / count(*) AS mean
       |  FROM spx GROUP BY sub, ssig, pos),
       |books AS (
       |  SELECT sub, code, list(mean ORDER BY pos) AS centroid
       |  FROM sbk GROUP BY sub, code),
       |enc0 AS (
       |  SELECT cl.vec_id, cl.sub, b.code,
       |    CAST(floor(${sqDistSql("cl.semb", "b.centroid")}
       |      * $Q) AS BIGINT) AS d
       |  FROM cells cl JOIN books b ON b.sub = cl.sub),
       |codes AS (
       |  SELECT vec_id, sub, code FROM (
       |    SELECT enc0.*, row_number() OVER (PARTITION BY vec_id, sub
       |      ORDER BY d, code) AS rk FROM enc0)
       |  WHERE rk = 1),
       |dt AS (
       |  SELECT qq.vec_id AS query_id, qq.sub, b.code,
       |    CAST(floor(${sqDistSql("qq.semb", "b.centroid")}
       |      * $Q) AS BIGINT) AS d
       |  FROM cells qq JOIN books b ON b.sub = qq.sub
       |  WHERE qq.vec_id < $KnnQueryIds),
       |mem AS (
       |  SELECT p.query_id, s.vec_id
       |  FROM s JOIN probed p ON s.sig = p.sig),
       |adc AS (
       |  SELECT m.query_id, cd.vec_id AS nbr_id,
       |    CAST(sum(dt.d) AS BIGINT) AS adist_micro
       |  FROM mem m
       |  JOIN codes cd ON cd.vec_id = m.vec_id
       |  JOIN dt ON dt.query_id = m.query_id AND dt.sub = cd.sub
       |         AND dt.code = cd.code
       |  WHERE m.vec_id <> m.query_id
       |  GROUP BY 1, 2),
       |r AS (
       |  SELECT query_id, nbr_id, adist_micro,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY adist_micro, nbr_id) AS INT) AS rank
       |  FROM adc)
       |SELECT query_id, nbr_id, adist_micro, rank
       |FROM r WHERE rank <= $KnnK""".stripMargin
  }

  /** SemDeDup twin: cell-exact pairs (no multi-probe — the paper's
    * method is strictly within-cluster), quality = document length,
    * domination = higher quality (ties: lower id).
    */
  private val semDedupSql =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |s AS (
       |  SELECT e.vec_id, e.v, CAST(${signSigSql("v")} AS BIGINT) AS sig,
       |    CAST(d.n_chars AS BIGINT) AS q
       |  FROM e JOIN documents d ON d.doc_id = e.vec_id),
       |pruned AS (
       |  SELECT DISTINCT a.vec_id
       |  FROM s a JOIN s b
       |    ON a.sig = b.sig AND a.vec_id <> b.vec_id
       |   AND (b.q > a.q OR (b.q = a.q AND b.vec_id < a.vec_id))
       |  WHERE ${cosineSql("a.v", "b.v")} >= $CosineThreshold)
       |SELECT s.vec_id, s.sig, s.q AS quality,
       |  p.vec_id IS NOT NULL AS pruned
       |FROM s LEFT JOIN pruned p ON p.vec_id = s.vec_id""".stripMargin

  /** Semantic-decontamination twin: the bipartite cell-exact match —
    * the same signature/cosine CTEs, corpus slice vs benchmark slice,
    * count per contaminated corpus vector.
    */
  private val semContaminationSql =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |s AS (SELECT vec_id, v, ${signSigSql("v")} AS sig FROM e),
       |c AS (SELECT * FROM s WHERE vec_id % 23 <> 0),
       |b AS (SELECT * FROM s WHERE vec_id % 23 = 0)
       |SELECT c.vec_id, CAST(count(*) AS BIGINT) AS n_bench_matches
       |FROM c JOIN b ON c.sig = b.sig
       |WHERE ${cosineSql("c.v", "b.v")} >= $CosineThreshold
       |GROUP BY c.vec_id""".stripMargin

  /** Semantic-cluster twin: the cell-exact pair set closed under
    * transitivity — q46's recursive-closure form over embedding-space
    * edges instead of n-gram-Jaccard ones.
    */
  private val semDedupClustersSql =
    s"""WITH RECURSIVE e0 AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |s AS (SELECT vec_id, v, ${signSigSql("v")} AS sig FROM e0),
       |pairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM s a JOIN s b ON a.sig = b.sig AND a.vec_id < b.vec_id
       |  WHERE ${cosineSql("a.v", "b.v")} >= $CosineThreshold),
       |e AS (
       |  SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION
       |  SELECT id_b AS u, id_a AS v FROM pairs),
       |reach(u, v) AS (
       |  SELECT u, v FROM e
       |  UNION
       |  SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u)
       |SELECT u AS id, least(u, min(v)) AS cluster_id
       |FROM reach GROUP BY u""".stripMargin

  /** SimHash banded near-dup twin: same CTE chain as simhashSql up to
    * the per-doc fingerprint, then 4 × 15-bit band keys, band-bucket
    * self-join, xor popcount verify.
    */
  private val simhashPairsSql =
    s"""WITH $shingleCtes,
       |hx AS (
       |  SELECT id, ${hash60Sql("u")} AS h
       |  FROM (SELECT id, unnest(s) AS u FROM sh WHERE len(s) > 0)),
       |v AS (
       |  SELECT id, j,
       |    CAST(sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS vote
       |  FROM hx CROSS JOIN (SELECT unnest(range(0, 60)) AS j) js
       |  GROUP BY id, j),
       |f AS (
       |  SELECT id,
       |    CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << j)
       |             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS fp
       |  FROM v GROUP BY id),
       |bands AS (
       |  SELECT id, fp, b.range AS band, (fp >> CAST(b.range * 15 AS INT)) & 32767 AS bk
       |  FROM f, range(0, 4) b),
       |cand AS (
       |  SELECT DISTINCT a.id AS id_a, a.fp AS fa, b.id AS id_b, b.fp AS fb
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bk = b.bk AND a.id < b.id)
       |SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(fa, fb)) <= 3""".stripMargin

  /** IVF coarse-quantizer twin, flat form: 1e-6-grid integer sums →
    * one double division sequence → mean; one scalar row per
    * (bucket, position). The quantize (x·1e6 multiply + round-half-away)
    * and the divide chain mirror bucketCentroidsFlat op-for-op — both
    * engines produce bit-identical means (a DECIMAL cast would not:
    * Spark converts via the shortest round-trip string, DuckDB via the
    * exact expansion).
    */
  private val Quantum = Similarity.MeanQuantum // 1e6
  private val bucketCentroidsSql =
    s"""WITH e AS (
       |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |s AS (SELECT v, ${signSigSql("v")} AS sig FROM e),
       |px AS (
       |  SELECT sig, i.range - 1 AS pos, v[CAST(i.range AS INT)] AS x
       |  FROM s, range(1, ${EmbDims + 1}) i),
       |a AS (
       |  SELECT sig, pos,
       |    CAST(sum(CAST(round(x * $Quantum) AS BIGINT)) AS DOUBLE)
       |      / $Quantum / count(*) AS mean,
       |    count(*) AS n
       |  FROM px GROUP BY sig, pos)
       |SELECT CAST(sig AS BIGINT) AS sig, CAST(pos AS INT) AS pos, mean,
       |  CAST(n AS BIGINT) AS n
       |FROM a""".stripMargin

  /** IVF search twin: centroid CTEs + per-query cell ranking (nProbe
    * nearest) + member scan of only those cells + exact rank.
    */
  private val knnIvfSql =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |s AS (SELECT vec_id, v, ${signSigSql("v")} AS sig FROM e),
       |px AS (
       |  SELECT sig, i.range - 1 AS pos, v[CAST(i.range AS INT)] AS x
       |  FROM s, range(1, ${EmbDims + 1}) i),
       |a AS (
       |  SELECT sig, pos,
       |    CAST(sum(CAST(round(x * $Quantum) AS BIGINT)) AS DOUBLE)
       |      / $Quantum / count(*) AS mean
       |  FROM px GROUP BY sig, pos),
       |c AS (SELECT sig, list(mean ORDER BY pos) AS centroid FROM a GROUP BY sig),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM s WHERE vec_id < $KnnQueryIds),
       |pr AS (
       |  SELECT q.query_id, q.qv, c.sig,
       |    ${cosineSql("q.qv", "c.centroid")} AS c_cos
       |  FROM q, c),
       |probed AS (
       |  SELECT query_id, qv, sig FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY c_cos DESC, sig) AS crk FROM pr)
       |  WHERE crk <= $IvfProbes),
       |scored AS (
       |  SELECT p.query_id, s.vec_id AS nbr_id,
       |    ${cosineSql("p.qv", "s.v")} AS cosine
       |  FROM s JOIN probed p ON s.sig = p.sig AND s.vec_id <> p.query_id),
       |r AS (
       |  SELECT query_id, nbr_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, nbr_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, nbr_id, cosine, rank FROM r WHERE rank <= $KnnK""".stripMargin

  /** Lloyd twin: c0 = the LSH-bucket quantizer, then per round an
    * assignment CTE (argmax cosine, tie on cluster id) and the quantized
    * mean recompute — generated per iteration so the SQL is mechanically
    * the same law as the Scala loop.
    */
  private val lloydSql = {
    val init =
      s"""e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |s AS (SELECT vec_id, v, ${signSigSql("v")} AS sig FROM e),
         |px0 AS (
         |  SELECT sig AS cluster, i.range - 1 AS pos, v[CAST(i.range AS INT)] AS x
         |  FROM s, range(1, ${EmbDims + 1}) i),
         |m0 AS (
         |  SELECT cluster, pos,
         |    CAST(sum(CAST(round(x * $Quantum) AS BIGINT)) AS DOUBLE)
         |      / $Quantum / count(*) AS mean,
         |    count(*) AS n
         |  FROM px0 GROUP BY cluster, pos),
         |c0 AS (SELECT cluster, list(mean ORDER BY pos) AS centroid FROM m0 GROUP BY cluster)""".stripMargin
    val rounds = (1 to LloydIters).map { i =>
      s"""sc$i AS (
         |  SELECT s.vec_id, s.v, c.cluster,
         |    ${cosineSql("s.v", "c.centroid")} AS cs
         |  FROM s, c${i - 1} c),
         |asg$i AS (
         |  SELECT cluster, v FROM (
         |    SELECT cluster, v, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cs DESC, cluster) AS rk
         |    FROM sc$i) WHERE rk = 1),
         |px$i AS (
         |  SELECT cluster, i.range - 1 AS pos, v[CAST(i.range AS INT)] AS x
         |  FROM asg$i, range(1, ${EmbDims + 1}) i),
         |m$i AS (
         |  SELECT cluster, pos,
         |    CAST(sum(CAST(round(x * $Quantum) AS BIGINT)) AS DOUBLE)
         |      / $Quantum / count(*) AS mean,
         |    count(*) AS n
         |  FROM px$i GROUP BY cluster, pos),
         |c$i AS (SELECT cluster, list(mean ORDER BY pos) AS centroid FROM m$i GROUP BY cluster)""".stripMargin
    }
    s"""WITH ${(init +: rounds).mkString(",\n")}
       |SELECT CAST(cluster AS BIGINT) AS cluster, CAST(pos AS INT) AS pos,
       |  mean, CAST(n AS BIGINT) AS n
       |FROM m$LloydIters""".stripMargin
  }

  /** CMS twin: vocabulary → weighted cell inserts per hash row →
    * cell sums; probe = left join + coalesce 0 + min (absent cell means
    * never inserted). DuckDB sums BIGINT into HUGEINT — cast back.
    */
  private val cmsHeavyHittersSql = {
    val cellSelects = (0 until CmsDepth).map(j =>
      s"""SELECT $j AS row,
         |    CAST(${hash60Sql(s"'cms_${j}_' || term")} % $CmsWidth AS INT) AS pos,
         |    n_exact FROM exact""".stripMargin).mkString("\n  UNION ALL\n  ")
    val probeSelects = (0 until CmsDepth).map(j =>
      s"""SELECT term, n_exact, $j AS row,
         |    CAST(${hash60Sql(s"'cms_${j}_' || term")} % $CmsWidth AS INT) AS pos
         |  FROM top""".stripMargin).mkString("\n  UNION ALL\n  ")
    s"""WITH toks AS (
       |  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
       |  FROM documents),
       |exact AS (
       |  SELECT term, count(*) AS n_exact FROM toks
       |  WHERE length(term) > 0 GROUP BY term),
       |cells AS (
       |  $cellSelects),
       |cms AS (SELECT row, pos, sum(n_exact) AS cnt FROM cells GROUP BY row, pos),
       |top AS (SELECT term, n_exact FROM exact ORDER BY n_exact DESC, term LIMIT $HeavyK),
       |probe AS (
       |  $probeSelects)
       |SELECT p.term, p.n_exact,
       |  CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS n_est
       |FROM probe p LEFT JOIN cms c ON c.row = p.row AND c.pos = p.pos
       |GROUP BY p.term, p.n_exact""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q22_dedup_exact" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_key,
        |  min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "q23_minhash_sig" -> {
      val hs = (0 until NumHashes).map(i => s"h$i").mkString(", ")
      s"WITH $shingleCtes,\n$xsCte,\n$sigCte\nSELECT id, $hs FROM sig"
    },
    "q24_lsh_neardup" -> lshPairsSql,
    "q25_jaccard_pairs" -> jaccardPairsSql,

    // truth minus banding-survivors, per config — CTE chains inlined,
    // inner names shadowing per engine scoping rules
    "q176_lsh_recall_audit" ->
      s"""WITH t AS ($jaccardPairsSql),
         |l$Bands AS ($lshPairsSql),
         |l1 AS (${lshPairsSqlFor(1)})
         |SELECT t.id_a, t.id_b, t.jaccard, 'b$Bands' AS config
         |FROM t LEFT JOIN l$Bands l ON t.id_a = l.id_a AND t.id_b = l.id_b
         |WHERE l.id_a IS NULL
         |UNION ALL
         |SELECT t.id_a, t.id_b, t.jaccard, 'b1' AS config
         |FROM t LEFT JOIN l1 l ON t.id_a = l.id_a AND t.id_b = l.id_b
         |WHERE l.id_a IS NULL""".stripMargin,
    "q26_simhash" -> simhashSql,

    // the incremental path must equal the full-corpus LSH recompute
    // restricted to pairs with >= 1 new-batch side — same permutation
    // constants, identical band keys, identical candidate set
    "q133_incremental_dedup" ->
      s"""SELECT id_a, id_b, jaccard FROM ($lshPairsSql)
         |WHERE id_a % 3 = 0 OR id_b % 3 = 0""".stripMargin,

    // same position/merge law: 1-based i, span [i, i+8), islands merge
    // on touch (s > running max(e) starts a new span)
    "q132_repeated_spans" -> {
      val nm1 = SpanGramN - 1
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
         |  FROM documents),
         |grams AS (
         |  SELECT doc_id, CAST(i AS INT) AS i,
         |    ${hash60Sql(s"array_to_string(t[i:i+$nm1], ' ')")} AS gh
         |  FROM toks, unnest(range(1, len(t) - ${nm1 - 1})) AS u(i)
         |  WHERE len(t) >= $SpanGramN),
         |dup AS (SELECT gh FROM grams GROUP BY gh
         |  HAVING count(DISTINCT doc_id) >= 2),
         |hits AS (
         |  SELECT doc_id, i AS s, i + $SpanGramN AS e
         |  FROM grams WHERE gh IN (SELECT gh FROM dup)),
         |flagged AS (
         |  SELECT doc_id, s, e,
         |    CASE WHEN s > coalesce(max(e) OVER (
         |      PARTITION BY doc_id ORDER BY s, e
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
         |    THEN 1 ELSE 0 END AS new_span
         |  FROM hits),
         |islands AS (
         |  SELECT doc_id, s, e, sum(new_span) OVER (
         |    PARTITION BY doc_id ORDER BY s, e
         |    ROWS UNBOUNDED PRECEDING) AS span_id
         |  FROM flagged),
         |spans AS (
         |  SELECT doc_id, span_id, min(s) AS ss, max(e) AS se
         |  FROM islands GROUP BY 1, 2)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(se - ss) AS BIGINT) AS masked_tokens,
         |  string_agg(ss || '-' || se, ',' ORDER BY ss, se) AS spans
         |FROM spans GROUP BY doc_id""".stripMargin
    },
    // q132's island CTEs + interval explode + positional anti-join +
    // ordered reassembly — the removal twin
    "q257_span_removal" -> {
      val nm1 = SpanGramN - 1
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
         |  FROM documents),
         |grams AS (
         |  SELECT doc_id, CAST(i AS INT) AS i,
         |    ${hash60Sql(s"array_to_string(t[i:i+$nm1], ' ')")} AS gh
         |  FROM toks, unnest(range(1, len(t) - ${nm1 - 1})) AS u(i)
         |  WHERE len(t) >= $SpanGramN),
         |dup AS (SELECT gh FROM grams GROUP BY gh
         |  HAVING count(DISTINCT doc_id) >= 2),
         |hits AS (
         |  SELECT doc_id, i AS s, i + $SpanGramN AS e
         |  FROM grams WHERE gh IN (SELECT gh FROM dup)),
         |flagged AS (
         |  SELECT doc_id, s, e,
         |    CASE WHEN s > coalesce(max(e) OVER (
         |      PARTITION BY doc_id ORDER BY s, e
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
         |    THEN 1 ELSE 0 END AS new_span
         |  FROM hits),
         |islands AS (
         |  SELECT doc_id, s, e, sum(new_span) OVER (
         |    PARTITION BY doc_id ORDER BY s, e
         |    ROWS UNBOUNDED PRECEDING) AS span_id
         |  FROM flagged),
         |spans AS (
         |  SELECT doc_id, span_id, min(s) AS ss, max(e) AS se
         |  FROM islands GROUP BY 1, 2),
         |drp AS (
         |  SELECT doc_id, unnest(range(ss, se)) AS i FROM spans),
         |tk AS (
         |  SELECT doc_id, CAST(i AS INT) AS i, t[i] AS tok
         |  FROM toks, unnest(range(1, len(t) + 1)) AS u(i)),
         |kept AS (
         |  SELECT tk.doc_id, tk.i, tk.tok
         |  FROM tk LEFT JOIN drp d
         |    ON d.doc_id = tk.doc_id AND d.i = tk.i
         |  WHERE d.i IS NULL),
         |agg AS (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text,
         |    CAST(count(*) AS BIGINT) AS n_kept
         |  FROM kept GROUP BY doc_id),
         |cnt AS (
         |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks)
         |SELECT cnt.doc_id, COALESCE(agg.clean_text, '') AS clean_text,
         |  COALESCE(agg.n_kept, 0) AS n_kept,
         |  cnt.n_tokens - COALESCE(agg.n_kept, 0) AS n_removed
         |FROM cnt LEFT JOIN agg USING (doc_id)""".stripMargin
    },

    "q27_text_stats" -> textStatsSql("documents"),
    "q28_knn_brute" -> knnBruteSql,
    "q146_quantized_rerank" -> quantRerankSql,
    "q29_knn_lsh" -> knnLshSql,
    "q30_embed_neardup" -> embedNearDupSql,
    "q244_semdedup" -> semDedupSql,
    "q246_semdedup_clusters" -> semDedupClustersSql,
    "q256_sem_decontaminate" -> semContaminationSql,
    "q248_pq_adc_topk" -> pqAdcSql,
    "q249_pq_ivf_topk" -> pqIvfSql,
    "q43_bucket_centroids" -> bucketCentroidsSql,
    "q44_simhash_pairs" -> simhashPairsSql,
    "q45_knn_ivf" -> knnIvfSql,
    "q74_lloyd_refine" -> lloydSql,
    "q75_cms_heavy_hitters" -> cmsHeavyHittersSql,

    // the sketch is invisible to the oracle BY THEOREM (no false
    // negatives + exact verify): screened exact ≡ plain HAVING
    "q140_sketch_heavy_exact" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |tt AS (SELECT term FROM toks WHERE length(term) > 0),
        |tot AS (SELECT count(*) // 32 AS thr FROM tt),
        |ex AS (SELECT term, count(*) AS n FROM tt GROUP BY term)
        |SELECT term, n FROM ex, tot WHERE n >= thr""".stripMargin,

    // keep-first per (user, type, UTC day): integer bucket of epoch
    // micros, earliest (ts, event_id) wins — row_number is the oracle
    // form of the engine's min_by
    "q120_windowed_dedup" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
        |    event_type, value, props,
        |    row_number() OVER (
        |      PARTITION BY user_id, event_type,
        |        epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
        |      ORDER BY ts, event_id) AS rn
        |  FROM events)
        |WHERE rn = 1""".stripMargin,

    // hash60 % m buckets; rho = leading zeros of the remaining 54-bit
    // field + 1, via bin() string length (identical no-leading-zeros
    // semantics in both engines); registers = per-bucket max
    "q115_hll_registers" -> {
      val rhoMax = 60 - 6 + 1 // 54 w-bits (m=64) all zero → 55
      s"""WITH h AS (
         |  SELECT event_type,
         |    ${hash60Sql("'hll_' || CAST(user_id AS VARCHAR)")} AS hv
         |  FROM events),
         |r AS (SELECT event_type, hv % 64 AS bucket,
         |  CASE WHEN hv // 64 = 0 THEN $rhoMax
         |    ELSE $rhoMax - length(bin(hv // 64)) END AS rho
         |  FROM h)
         |SELECT event_type, CAST(bucket AS INT) AS bucket,
         |  CAST(max(rho) AS INT) AS register
         |FROM r GROUP BY 1, 2""".stripMargin
    },

    // daily registers + element-wise max over the 7-day RANGE frame —
    // the merge law q115's SketchesSpec pins, applied across time
    "q124_hll_rolling" -> {
      val rhoMax = 60 - 6 + 1
      s"""WITH h AS (
         |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
         |    ${hash60Sql("'hll_' || CAST(user_id AS VARCHAR)")} AS hv
         |  FROM events),
         |r AS (SELECT day, hv % 64 AS bucket,
         |  CASE WHEN hv // 64 = 0 THEN $rhoMax
         |    ELSE $rhoMax - length(bin(hv // 64)) END AS rho
         |  FROM h),
         |d AS (SELECT day, bucket, max(rho) AS reg FROM r GROUP BY 1, 2),
         |days AS (SELECT DISTINCT day AS at_day FROM d)
         |SELECT CAST(at_day AS BIGINT) AS day, CAST(bucket AS INT) AS bucket,
         |  CAST(max(reg) AS INT) AS register
         |FROM d JOIN days ON d.day BETWEEN at_day - 6 AND at_day
         |GROUP BY 1, 2""".stripMargin
    },

    // the exact twin + the bound the engine must meet: the sketch
    // estimate itself never crosses engines (binary artifact), so the
    // oracle states the law — exact distinct per type, and TRUE for
    // the Spark-side |est − exact| ≤ max(8%·exact, 1) check
    "q127_hll_cardinality" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
        |  TRUE AS within_bound
        |FROM events GROUP BY 1""".stripMargin)
}
