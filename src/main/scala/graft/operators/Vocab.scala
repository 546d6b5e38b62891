package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Corpus vocabulary construction and token-id encoding — the step
  * between cleaned text and a training shard: build the frequency-ranked
  * token→id table, then rewrite every document as id sequences (OOV → 0).
  * Word-level stand-in for a subword tokenizer's vocab-build phase; the
  * distribution of work is identical (count, rank, broadcast-map).
  *
  * Scale shape:
  *   - Counting is ONE groupBy on the token with map-side combine — the
  *     classic wordcount, shuffle carries (token, partial count).
  *   - Ranking runs on the VOCABULARY, which is Zipf-bounded (a tokenized
  *     web crawl tops out in the low millions of distinct words while the
  *     corpus holds trillions of tokens) — the same index-not-corpus
  *     argument as [[Keywords]]' df table. The rank window is
  *     deliberately unpartitioned over that vocab-sized frame;
  *     deterministic total order (count DESC, token ASC) is the point.
  *   - Encoding joins the exploded corpus against the vocab — by default
  *     as a BROADCAST: no corpus shuffle, and hot tokens (the Zipf head)
  *     replicate with the broadcast instead of concentrating on one
  *     task. That default assumes the vocab is executor-memory-sized —
  *     true for any `maxSize`-capped build (the normal case) and for
  *     word vocabs to ~10⁶ terms, but an UNCAPPED build over raw web
  *     text reaches 10⁷–10⁸ distinct "words" (typos, ids, urls) and
  *     outgrows it, so the hint is a knob (`broadcastVocab` = false →
  *     plain shuffle join, AQE picks the strategy and splits hot-token
  *     skew). VocabSpec pins both paths result-identical.
  */
object Vocab {

  /** Frequency-ranked vocabulary: (token, cnt, id) with id 1..|V| by
    * (cnt DESC, token ASC); tokens with cnt < `minCount` are excluded,
    * and with `maxSize` > 0 only the top `maxSize` ids are kept (the
    * standard vocab-size cap) — excluded tokens become OOV at encode
    * time. The (count, token) tiebreak makes the cap deterministic.
    *
    * Scale: the global `row_number` window runs on the AGGREGATED
    * distinct-token frame (vocab-sized — bounded by the token universe,
    * not the corpus; the heavy per-token work is the map-side-combined
    * count above it). A vocabulary fundamentally needs one global rank;
    * single-partition sorting of a vocab-sized frame is the intended
    * cost, never paid per corpus row. */
  def build(df: DataFrame, text: Column, minCount: Long = 1L,
      maxSize: Long = 0L): DataFrame = {
    val counts = df.select(explode(T.tokens(lower(text))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val ranked = counts.withColumn("id",
      row_number().over(Window.orderBy(col("cnt").desc, col("token"))).cast("long"))
    if (maxSize > 0L) ranked.filter(col("id") <= maxSize) else ranked
  }

  /** Encode each document against `vocab` (a [[build]] result): returns
    * one row per input doc, (doc_id, n_tok, n_oov, enc_sum) where
    * `enc_sum` = Σ position·id over the doc's token stream (1-based
    * positions, OOV id 0) — an order-SENSITIVE integer checksum of the
    * encoded sequence, so the driver artifact stays one fixed-width row
    * per document at any corpus size while still pinning every id and
    * its position. Callers wanting the id arrays use [[encoded]]. */
  def encodeStats(df: DataFrame, id: Column, text: Column,
      vocab: DataFrame, broadcastVocab: Boolean = true): DataFrame =
    encoded(df, id, text, vocab, broadcastVocab)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("token_id") === 0L, 1L).otherwise(0L)).as("n_oov"),
        sum(col("pos") * col("token_id")).as("enc_sum"))

  /** Exploded encoding: (doc_id, pos, token_id) — one row per token,
    * 1-based pos, OOV → id 0. The materialized training-shard form. */
  def encoded(df: DataFrame, id: Column, text: Column,
      vocab: DataFrame, broadcastVocab: Boolean = true): DataFrame = {
    val toks = Parallelism.ensureMinPartitions(
      df.select(id.as("doc_id"), T.tokens(lower(text)).as("toks")),
      col("doc_id"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos0", "token")))
    val v = vocab.select(col("token"), col("id"))
    toks.join(if (broadcastVocab) broadcast(v) else v,
        Seq("token"), "left")
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        coalesce(col("id"), lit(0L)).as("token_id"))
  }
}
