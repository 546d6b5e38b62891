package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Overlapping token chunking — the retrieval-prep step that splits
  * documents into embedding-window-sized pieces with overlap (RAG
  * indexing, long-document embedding): the SPLIT counterpart of
  * [[Packing]]'s concatenate-and-cut. Chunk i covers tokens
  * [i·stride, i·stride + width), the last chunk clamps to the document
  * end, and a document shorter than one chunk is a single chunk —
  * every token lands in at least one chunk, adjacent chunks share
  * width − stride tokens of context.
  *
  * Deterministic integer arithmetic end to end; the chunk count is
  * 1 + ⌈max(0, n − width) / stride⌉, so coverage and overlap are exact
  * and engine-replayable. Scale shape: tokenize + one scan-fused
  * transform/explode, linear in corpus tokens × (width/stride) — no
  * shuffle, no join; chunk text stays with its document row until the
  * explode, so nothing document-sized crosses the wire twice. */
object Chunking {

  /** (doc_id, chunk_id, tok_from, tok_to, n_tok, chunk_md5): token
    * ranges ([tok_from, tok_to), 0-based) and the md5 of each chunk's
    * space-joined tokens. `width` = chunk size in tokens, `stride` =
    * hop (stride ≤ width keeps full coverage; stride < width overlaps). */
  def overlappingChunks(df: DataFrame, id: Column, text: Column,
      width: Int, stride: Int): DataFrame = {
    require(width > 0, "width must be positive")
    require(stride > 0 && stride <= width,
      "stride must be in (0, width] — stride > width would skip tokens")
    df.select(id.as("doc_id"), T.tokens(lower(text)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        // n_chunks − 1 = ceil(max(0, n − width) / stride), integer form
        expr(s"(greatest(size(toks) - $width, 0) + ${stride - 1}) div $stride")
          .as("__last"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0L), col("__last")),
          i => struct(
            (i * stride).as("tok_from"),
            least(i * stride + width, size(col("toks")).cast("long"))
              .as("tok_to"),
            md5(array_join(slice(col("toks"),
              (i * stride + 1).cast("int"),
              least(lit(width.toLong),
                size(col("toks")).cast("long") - i * stride).cast("int")),
              " ").cast("binary")).as("chunk_md5")))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        col("col.tok_from"), col("col.tok_to"),
        (col("col.tok_to") - col("col.tok_from")).as("n_tok"),
        col("col.chunk_md5"))
  }
}
