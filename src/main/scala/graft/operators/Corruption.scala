package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Deterministic span corruption — the denoising-objective preparation
  * step (T5/BART-style: replace token spans with a sentinel; the model
  * learns to reconstruct them). Production pipelines do this with an
  * RNG; this engine's version is a PURE FUNCTION of the data, so the
  * corrupted corpus is reproducible across runs, engines and
  * partitionings, and hash-checks against the SQL oracle — the same
  * no-RNG discipline as [[Sampling]] and [[Dataloader]].
  *
  * Masking rule: token position p (0-based) of document d is masked iff
  * `(hash60(d) + p) mod stride < spanLen` — fixed-length spans repeating
  * every `stride` positions with a per-document hash phase. Non-
  * overlapping by construction, exact mask rate spanLen/stride, span
  * boundaries vary per document (the hash phase), and each masked RUN
  * collapses to ONE `sentinel` token (the T5 convention — the target
  * sequence length shrinks by the span length, which is the training
  * signal's whole point). A document whose phase lands mid-span at
  * position 0 emits the sentinel there (partial leading span).
  *
  * Scale shape: tokenize + posexplode (linear in corpus tokens, scan-
  * fused) and ONE groupBy(doc) rollup for reassembly — the [[Bpe]]
  * rollup pattern; per-doc collected lists are document-bounded. No
  * joins, no windows. */
object Corruption {

  /** Per-document corruption artifact: (doc_id, n_tok, n_masked,
    * n_spans, masked_md5) — token/masked/span counts plus the md5 of
    * the space-joined corrupted token stream. */
  def spanMask(df: DataFrame, id: Column, text: Column, stride: Int,
      spanLen: Int, sentinel: String = "<extra_id>"): DataFrame = {
    require(stride > 0, "stride must be positive")
    require(spanLen > 0 && spanLen < stride,
      "spanLen must be in (0, stride) — spanLen >= stride masks everything")
    val toks = df.select(id.as("doc_id"), T.tokens(lower(text)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(col("toks")))
      .select(col("doc_id"), col("pos"), col("col").as("word"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") + col("pos")).as("__k"))
    val phased = toks.select(col("doc_id"), col("pos"), col("word"),
      (col("__k") % stride).as("__m"))
    // out token: the word (kept), the sentinel (first masked position of
    // a run: mod == 0, or a partial leading span at pos 0), or null
    // (interior masked position — dropped at reassembly)
    val emitted = phased.select(col("doc_id"), col("pos"),
      when(col("__m") >= spanLen, col("word"))
        .when(col("__m") === 0 || col("pos") === 0, lit(sentinel))
        .otherwise(lit(null).cast("string")).as("out"),
      when(col("__m") < spanLen, 1L).otherwise(0L).as("__masked"),
      when((col("__m") === 0 || (col("pos") === 0 && col("__m") < spanLen)),
        1L).otherwise(0L).as("__span"))
    emitted.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(col("__masked")).as("n_masked"),
        sum(col("__span")).as("n_spans"),
        md5(array_join(filter(transform(
          array_sort(collect_list(struct(col("pos"), col("out")))),
          s => s.getField("out")), x => x.isNotNull), " ").cast("binary"))
          .as("masked_md5"))
  }
}
