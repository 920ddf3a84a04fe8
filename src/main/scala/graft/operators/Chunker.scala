package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for embedding / retrieval / training pipelines:
  * fixed-size token windows with overlap, the preprocessing step in
  * front of every embedding model with a context limit.
  */
object Chunker {

  /** Sliding-window chunks: windows of `chunkTokens` tokens starting
    * every `strideTokens` (overlap = chunkTokens − strideTokens),
    * emitted as (doc_id, chunk_id, n_tokens, chunk). Starts are
    * 0, stride, 2·stride, … while start < n_tokens, so the final
    * window may be short; a document always yields ≥ 1 chunk
    * (tokenizing "" gives one empty token, matching the q69 chunker's
    * convention — empty docs surface as one empty chunk, not as a
    * silent drop).
    *
    * Scale shape: completely narrow — one projection, one
    * higher-order transform over per-row start offsets, one
    * posexplode. No shuffle, no state; output order and content are a
    * pure function of each input row, so the operator composes with
    * any downstream partitioning (and the DuckDB oracle replays it
    * row-for-row). The fan-out factor is ~n_tokens/stride; at 100 TB
    * the only knob that matters is stride, and the expansion is
    * streamed through the scan stage rather than materialized.
    */
  def slidingChunks(docs: DataFrame, id: Column, text: Column,
      chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens >= 1 && strideTokens >= 1,
      "chunk and stride must be positive")
    docs
      .select(id.as("doc_id"),
        graft.functions.TextFunctions.tokens(text).as("w"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("w")) - 1, lit(strideTokens)),
          s => slice(col("w"), s + 1, lit(chunkTokens)))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        size(col("col")).cast("long").as("n_tokens"),
        array_join(col("col"), " ").as("chunk"))
  }
}
