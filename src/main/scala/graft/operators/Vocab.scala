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
  *     argument as [[Keywords]]' df table. Even so, an UNCAPPED raw-text
  *     token universe can reach 10⁸–10⁹ rows, so the global rank is
  *     computed SHARDED (range-partitioned on the sort key, per-shard
  *     row_number + broadcast base offsets — see [[build]]); the
  *     deterministic total order (count DESC, token ASC) is preserved
  *     exactly.
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
    * Scale: a vocabulary fundamentally needs ONE global rank, but a
    * global `Window.orderBy` sorts the whole distinct-token frame in a
    * single task — and a raw web corpus's token universe (typos, ids,
    * urls) reaches 10⁸–10⁹ rows, far past what one task should sort. So
    * the rank is SHARDED the way [[Dataloader]]'s within-group rank is,
    * with the shard key made order-aligned by construction:
    * `repartitionByRange` on the sort key itself (cnt DESC, token ASC)
    * splits the frame into `rankShards` contiguous key ranges (partition
    * i's rows all sort before partition i+1's), each shard ranks locally
    * (`row_number` partitioned by shard, one task per shard), and each
    * row adds its shard's cumulative base offset — a broadcast-joined
    * frame of ≤`rankShards` rows whose cumulative sum is the one
    * remaining unpartitioned window (shard-count-sized: the bounded-
    * cardinality contract). Global ids are IDENTICAL to the
    * single-window formulation for every shard count (VocabSpec pins
    * shard invariance); the range partitioner's sampled boundaries only
    * move work between shards, never reorder keys. The frame is
    * persisted across its two consumers (base histogram + final rank) so
    * the range exchange and partition ids are evaluated once — same
    * cache lifecycle contract as [[graft.operators.Dedup]] (callers
    * `clearCache()` when done). `rankShards` ≤ 0 uses the session's
    * shuffle parallelism. */
  def build(df: DataFrame, text: Column, minCount: Long = 1L,
      maxSize: Long = 0L, rankShards: Int = 0): DataFrame = {
    val counts = df.select(explode(T.tokens(lower(text))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val n =
      if (rankShards > 0) rankShards
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = counts
      .repartitionByRange(n, col("cnt").desc, col("token").asc)
      .withColumn("__shard", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bases = parted.groupBy(col("__shard"))
      .agg(count(lit(1)).as("__cnt"))
      .select(col("__shard"),
        coalesce(sum(col("__cnt")).over(Window.orderBy(col("__shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("__base"))
    val w = Window.partitionBy(col("__shard"))
      .orderBy(col("cnt").desc, col("token").asc)
    val ranked = parted
      .withColumn("__rn", row_number().over(w).cast("long"))
      .join(broadcast(bases), Seq("__shard"))
      .select(col("token"), col("cnt"), (col("__rn") + col("__base")).as("id"))
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
