package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for training-data preparation: split each document
  * into overlapping fixed-width windows (the step between curation and
  * tokenization — context-window packing consumes chunks, not whole
  * documents; cf. ext/Packing for the shard/batch step downstream).
  *
  * Deterministic law (no RNG, cross-engine exact):
  *   n_chunks = ceil(max(len - chunkSize, 0) / stride) + 1
  *   chunk i  = substring(text, i*stride + 1, chunkSize)   (1-based)
  * so consecutive chunks overlap by chunkSize - stride characters and
  * the last chunk is the only one shorter than chunkSize. A document
  * shorter than one chunk yields exactly itself; an empty document
  * yields one empty chunk; a NULL text yields no rows — via an explicit
  * not-null filter, NOT null propagation (Spark's `greatest` IGNORES
  * nulls, so greatest(length(NULL)-cs, 0) would silently produce a
  * phantom single-chunk row with a NULL body).
  *
  * Scale shape: pure projection + generator (explode of a tiny int
  * sequence) — NO shuffle, fully inside whole-stage codegen, output
  * partitioning inherits the input's. Fan-out is bounded by
  * ceil(maxDocLen/stride), so executor memory per task grows only by
  * the overlap factor chunkSize/stride (~1.33 at the defaults here).
  */
object Chunking {

  private val OutCols = Seq("chunk_id", "n_chunks", "chunk_text", "chunk_len")

  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    require(!OutCols.contains(idCol) && !OutCols.contains(textCol),
      s"$idCol/$textCol collide with output columns $OutCols")
    // integer `div` = exact ceil-division building block (non-negative
    // numerator by construction of greatest(..., 0))
    val nChunks = expr(
      s"CAST((greatest(length(`$textCol`) - $chunkSize, 0) + ${stride - 1}) " +
        s"div $stride AS INT) + 1")
    docs
      .where(col(textCol).isNotNull)
      .select(col(idCol), nChunks.as("n_chunks"), col(textCol))
      .withColumn("chunk_id", explode(sequence(lit(0), col("n_chunks") - 1)))
      .select(col(idCol), col("chunk_id"), col("n_chunks"),
        col(textCol).substr(col("chunk_id") * stride + 1, lit(chunkSize))
          .as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")))
  }
}
