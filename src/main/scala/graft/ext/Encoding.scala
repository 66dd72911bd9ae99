package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic categorical dictionary (label) encoding — the
  * feature-engineering staple that turns a string category into the
  * dense 0-based integer id an embedding table indexes (the reference
  * pipeline's categorical columns — sector, industry, currency — all
  * feed models this way downstream).
  *
  * The dictionary is the SORTED distinct vocabulary: ids are stable
  * under re-runs and across engines (no hash, no arrival order), and
  * contiguous (id ∈ [0, |V|), exactly what an embedding matrix wants).
  * Determinism is the whole point — a training pipeline that re-derives
  * ids per run shuffles its embedding rows silently.
  *
  * Scale: the id assignment is one window over the DISTINCT vocabulary
  * — the aggregate's output, metadata-sized for real categorical
  * columns (thousands, not billions), so the single-task sort ranks
  * categories, never corpus rows. A genuinely huge vocabulary (open
  * vocab ids over raw tokens) rides [[dictionaryBucketed]] — the SAME
  * sorted-distinct contract via [[Interleave.bucketedGroupRank]]'s
  * bucketed prefix-sum rank, so no task ever sorts more than one
  * byte-prefix bucket of the vocabulary. Encoding is a broadcast
  * equi-join: the corpus never shuffles.
  */
object Encoding {

  /** (value, id) dictionary over `valueCol`'s non-null distinct values,
    * ids 0-based dense in sorted order.
    */
  def dictionary(df: DataFrame, valueCol: String,
                 idCol: String): DataFrame =
    df.select(col(valueCol)).where(col(valueCol).isNotNull).distinct()
      .withColumn(idCol,
        (row_number().over(Window.orderBy(col(valueCol))) - 1).cast("int"))

  /** Unsigned byte `i` (1-based) of a binary column, 0 past the end —
    * via hex, so the value is order-identical to the byte comparison
    * Spark's UTF8String uses.
    */
  private def byteAt(bin: Column, i: Int): Column =
    when(length(substring(bin, i, 1)) === 1,
      conv(hex(substring(bin, i, 1)), 16, 10).cast("long"))
      .otherwise(lit(0L))

  /** [[dictionary]] for an EMBEDDING-TABLE-SCALE vocabulary (open-vocab
    * token ids, entity ids): the identical (value, id) result — ids
    * 0-based dense in sorted order — computed without the single-task
    * vocabulary sort. The rank rides
    * [[Interleave.bucketedGroupRank]] with the bucket = the value's
    * first two UTF-8 bytes zero-padded (an integer in [0, 65536)).
    * That bucket is a PREFIX of Spark's string order (UTF8String
    * compares bytewise, and a missing byte pads as 0, which is <= every
    * real byte), so lower buckets sort strictly first — exactly the
    * kernel's contract — and the counts table is at most 65,536 rows
    * whatever the vocabulary size: a broadcastable prefix-sum, with the
    * max per-task sort one shared-2-byte-prefix slice of the vocab.
    */
  def dictionaryBucketed(df: DataFrame, valueCol: String,
                         idCol: String): DataFrame = {
    val d = df.select(col(valueCol)).where(col(valueCol).isNotNull)
      .distinct()
    val bin = org.apache.spark.sql.functions.encode(col(valueCol), "UTF-8")
    val bucket = byteAt(bin, 1) * 256L + byteAt(bin, 2)
    Interleave.bucketedGroupRank(d, Nil, bucket, 1L,
        Seq(col(valueCol)), "_enc_rank")
      .withColumn(idCol, (col("_enc_rank") - 1).cast("int"))
      .drop("_enc_rank")
  }

  /** Dispatching [[dictionary]]: counts the distinct vocabulary (one
    * aggregate — the scan the dictionary build pays anyway) and picks
    * the single-sort window form below `hugeThreshold`, the bucketed
    * kernel at or above it. The ScaleRank sizing law calibrates the
    * threshold: below ~10^5 terms the window's one-task sort beats the
    * kernel's extra join; far above it the window is the scale killer.
    */
  def dictionaryAuto(df: DataFrame, valueCol: String, idCol: String,
                     hugeThreshold: Long = 100000L): DataFrame = {
    val vocabSize = df.select(col(valueCol))
      .where(col(valueCol).isNotNull).distinct().count()
    if (vocabSize >= hugeThreshold) dictionaryBucketed(df, valueCol, idCol)
    else dictionary(df, valueCol, idCol)
  }

  /** Attach the dictionary's id column; unseen/null values (not in the
    * dictionary) encode as null — the caller decides between an OOV
    * bucket and a loud failure.
    */
  def encode(df: DataFrame, dict: DataFrame, valueCol: String): DataFrame =
    df.join(broadcast(dict), Seq(valueCol), "left")
}
