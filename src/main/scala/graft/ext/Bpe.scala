package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import TextHash.tokens

/** BPE merge induction — the tokenizer-TRAINING step that follows
  * q92's frequency vocabulary: learn the first `rounds` byte-pair-
  * encoding merges from corpus word frequencies (start from
  * characters; each round merges the most frequent adjacent symbol
  * pair across the weighted vocabulary). The learned merge table IS
  * the tokenizer model artifact.
  *
  * Shape at 100 TB: the corpus is touched ONCE — a word-frequency
  * aggregation (map-side combinable). Everything after runs on the
  * DISTINCT-WORD table, which is vocabulary-bounded (millions of rows
  * at web scale, never corpus-bounded) — per round: one pair-count
  * aggregation + one bounded argmax + one projection applying the
  * merge. The per-round argmax row (ONE row — the model artifact) is
  * the only driver data, the same bounded-artifact exception as
  * Bloom's bitmap. Rounds are inherently sequential (each merge
  * depends on the previous state) — that is BPE, not a plan defect;
  * production tokenizer trainers (e.g. HF tokenizers) run the same
  * loop over the same word-count table.
  *
  * Merge application is GREEDY LEFT-TO-RIGHT NON-OVERLAPPING (the BPE
  * contract). Within one round a merge cannot cascade (the merged
  * symbol `left+right` never equals `left`), so greedy selection
  * reduces to: among hit positions, select every hit not immediately
  * preceded by a selected hit — runs of consecutive hits (only
  * possible for left==right symbol runs) select alternate positions.
  * The fold is expressed as a deterministic `aggregate` over the hit
  * index array — pure Column arithmetic, no UDF.
  *
  * Determinism: pair-count ties break on (count desc, left asc, right
  * asc) — binary string order, identical across engines.
  */
object Bpe {

  /** Learned symbols are interpolated into an expr() string — escape
    * backslash and quote so corpus words like "don't" can't break (or
    * inject into) the expression.
    */
  private def lit1(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Learn `rounds` merges; returns (round, merge_left, merge_right,
    * pair_count) — `rounds` rows, the ordered merge table.
    */
  def learnMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    val (_, merges) = learnState(docs, textCol, rounds)
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.map {
        case (k, a, b, c) => Row(k, a, b, c)
      }),
      StructType(Seq(
        StructField("round", IntegerType, nullable = false),
        StructField("merge_left", StringType, nullable = false),
        StructField("merge_right", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** ENCODE under the trained tokenizer: per-document word and subword
    * counts after `rounds` merges — the "how many tokens is my corpus"
    * question asked of the real trained tokenizer rather than the
    * q27 regex approximation. The per-word subword table is
    * vocabulary-bounded and BROADCASTS back to the token stream
    * (exactly the q92 vocabulary-join shape), so encoding costs one
    * corpus-wide aggregation beyond training.
    * `subwords_per_word_ppm` is exact integer fixed-point.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             rounds: Int): DataFrame = {
    val (state, _) = learnState(docs, textCol, rounds)
    val perWord = state.select(col("w"), size(col("l")).as("nsw"))
    docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(perWord), "w")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_words"),
        sum(col("nsw")).as("n_subwords"))
      .withColumn("subwords_per_word_ppm",
        expr("n_subwords * 1000000L div n_words"))
  }

  /** The training loop: final symbol state (w, freq, l) + the ordered
    * merge list. Shared by [[learnMerges]] (the model artifact) and
    * [[encode]] (applying it).
    */
  private def learnState(docs: DataFrame, textCol: String, rounds: Int)
      : (DataFrame, Seq[(Int, String, String, Long)]) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // the ONE corpus-wide pass: word frequencies
    val words = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    // character-split initial state; localCheckpoint per round keeps the
    // (vocabulary-sized) state physical and the lineage flat
    var state = words.select(col("w"), col("freq"),
      expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("l"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (k <- 1 to rounds) {
      val best = state
        .filter(size(col("l")) >= 2) // sequence(0,-1) descends — guard
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(l)-2), i -> struct(l[i] AS a, l[i+1] AS b))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      require(best.nonEmpty, s"round $k: no adjacent pairs left to merge")
      val Row(a: String, b: String, cnt: Long) = best.head
      merges += ((k, a, b, cnt))
      val (la, lb) = (lit1(a), lit1(b))
      // hit indices -> greedy-selected subset -> rebuilt symbol array
      state = state.withColumn("l", expr(
        s"""CASE WHEN size(l) < 2 THEN l ELSE
           |  filter(
           |    transform(sequence(0, size(l) - 1), j -> CASE
           |      WHEN array_contains(
           |        aggregate(
           |          filter(transform(sequence(0, size(l) - 2),
           |            i -> IF(l[i] = $la AND l[i+1] = $lb, i, NULL)),
           |            x -> x IS NOT NULL),
           |          struct(CAST(-2 AS INT) AS last, CAST(array() AS ARRAY<INT>) AS sel),
           |          (acc, i) -> IF(i > acc.last + 1,
           |            struct(CAST(i AS INT) AS last,
           |              CAST(array_union(acc.sel, array(i)) AS ARRAY<INT>) AS sel),
           |            acc)).sel,
           |        j) THEN concat(l[j], l[j+1])
           |      WHEN array_contains(
           |        aggregate(
           |          filter(transform(sequence(0, size(l) - 2),
           |            i -> IF(l[i] = $la AND l[i+1] = $lb, i, NULL)),
           |            x -> x IS NOT NULL),
           |          struct(CAST(-2 AS INT) AS last, CAST(array() AS ARRAY<INT>) AS sel),
           |          (acc, i) -> IF(i > acc.last + 1,
           |            struct(CAST(i AS INT) AS last,
           |              CAST(array_union(acc.sel, array(i)) AS ARRAY<INT>) AS sel),
           |            acc)).sel,
           |        j - 1) THEN NULL
           |      ELSE l[j] END),
           |    x -> x IS NOT NULL)
           |END""".stripMargin))
        .localCheckpoint()
    }
    (state, merges.result())
  }
}
