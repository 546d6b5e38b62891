package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the pretraining-preprocessing step that turns a
  * cleaned document corpus into fixed-token-budget training sequences
  * (GPT-style concatenate-and-chunk: documents are laid out on one
  * deterministic token stream and the stream is cut every `budget`
  * tokens; a document that straddles a cut starts in one sequence and
  * spills into the next, which is exactly what packed-pretraining
  * dataloaders consume).
  *
  * Determinism is the whole point: the layout order is md5(id) — a pure
  * function of the data, like [[Sampling]]'s buckets — so the same corpus
  * always packs to the same (seq_id, seq_off) assignment across reruns,
  * engines, and partitionings, and the assignment is SQL-replayable for
  * the oracle.
  *
  * Scale shape: a single global ORDER BY window would serialize the whole
  * corpus through one task, so the stream is first split into `shards`
  * independent streams by a hash of the id (uniform, deterministic), the
  * cumulative-sum window runs PARTITIONED by shard (parallel, one pass),
  * and sequences never span shards. Global sequence ids stay dense and
  * collision-free via a per-shard base offset computed from the
  * shards-row totals frame (ceil-div per shard, exclusive cumsum over
  * `shards` rows — index-sized work). At 100 TB you raise `shards` to a
  * few thousand so each window partition is executor-sized; everything
  * else is a scan-fused projection plus one tiny broadcast join.
  */
object Packing {

  /** Pack each row's `tokens`-long span onto the stream; returns
    * (id, n_tokens, shard, seq_id, seq_off):
    * `seq_id` = the global sequence the row STARTS in, `seq_off` = its
    * token offset within that sequence ([0, budget)). Rows with
    * tokens <= 0 are dropped (nothing to pack). Invariants (pinned in
    * PackingSpec): within a shard, seq_id*budget + seq_off is exactly the
    * running token sum of all earlier rows (no gaps, no overlaps); a
    * shard with T total tokens occupies ceil(T/budget) sequences; shards'
    * sequence-id ranges are disjoint and consecutive. */
  def packSequences(df: DataFrame, id: Column, tokens: Column,
      budget: Long, shards: Int = 1): DataFrame =
    positioned(df, id, tokens, budget, shards)
      .select(col("id"), col("n_tokens"), col("shard"),
        (col("__base") + expr("__cum div __budget")).as("seq_id"),
        (col("__cum") % col("__budget")).as("seq_off"))

  /** The packed stream in the form a dataloader CONSUMES: one row per
    * (sequence, document-slice), including the continuation rows of
    * documents that straddle a cut. Returns (id, n_tokens, shard, seq_id,
    * token_from, token_to, seq_from): doc tokens [token_from, token_to)
    * (0-based, exclusive end) land in `seq_id` starting at in-sequence
    * offset `seq_from`. Invariants (pinned in PackingSpec): slices of a
    * doc tile [0, n_tokens) in seq_id order; slices of a sequence tile
    * [0, budget) exactly (the last sequence of a shard may end short);
    * the first slice of every doc agrees with [[packSequences]]'
    * (seq_id, seq_off).
    *
    * Scale shape: same single shard-partitioned cumsum window + tiny
    * broadcast base join as [[packSequences]]; the explode adds
    * ceil(n_tokens/budget)+1 rows per doc — linear in corpus tokens /
    * budget, never quadratic. */
  def packedSlices(df: DataFrame, id: Column, tokens: Column,
      budget: Long, shards: Int = 1): DataFrame =
    positioned(df, id, tokens, budget, shards)
      // shard-local sequence index range this doc touches
      .select(col("id"), col("n_tokens"), col("shard"), col("__cum"),
        col("__base"), col("__budget"),
        expr("__cum div __budget").as("__k0"),
        expr("(__cum + n_tokens - 1) div __budget").as("__k1"))
      .select(col("id"), col("n_tokens"), col("shard"), col("__cum"),
        col("__base"), col("__budget"),
        explode(sequence(col("__k0"), col("__k1"))).as("__k"))
      .select(col("id"), col("n_tokens"), col("shard"),
        (col("__base") + col("__k")).as("seq_id"),
        greatest(col("__k") * col("__budget") - col("__cum"), lit(0L))
          .as("token_from"),
        least((col("__k") + 1) * col("__budget") - col("__cum"),
          col("n_tokens")).as("token_to"),
        greatest(col("__cum") - col("__k") * col("__budget"), lit(0L))
          .as("seq_from"))

  /** Shared internal frame: (id, n_tokens, shard, __cum, __base,
    * __budget) — the exclusive shard-stream running sum plus the global
    * sequence-id base per shard (object scaladoc). */
  private def positioned(df: DataFrame, id: Column, tokens: Column,
      budget: Long, shards: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0, "shards must be positive")
    // md5 layout key; shard = first 60 hash bits mod `shards` (portable:
    // ('0x' || substr(md5(k),1,15))::UBIGINT % shards in DuckDB — the
    // same idiom as Sampling.ppmBucket).
    val keyed = df.select(id.as("id"), tokens.cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0L)
      .select(col("id"), col("n_tokens"),
        md5(col("id").cast("string")).as("__key"))
      .select(col("id"), col("n_tokens"), col("__key"),
        (conv(substring(col("__key"), 1, 15), 16, 10).cast("long")
          % lit(shards.toLong)).as("shard"))
    // Exclusive running token sum within the shard's stream.
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__key"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = keyed.select(col("id"), col("n_tokens"), col("shard"),
      coalesce(sum(col("n_tokens")).over(w), lit(0L)).as("__cum"))
    // Per-shard sequence counts -> exclusive base offsets. `shards` rows:
    // the window here is over an index-sized frame, and the join back is
    // a broadcast by construction.
    // `div` (integer division), not `/`-then-cast: Spark's `/` is a
    // double-precision Divide, and a truncated double quotient can differ
    // from the oracle's exact integer `//` once cumsums approach 2^53.
    // the unpartitioned running-sum window below runs on the per-SHARD
    // totals frame — `shards` rows, not corpus rows — so the one-partition
    // sort it implies is a constant-size driver-adjacent step by design
    val bases = keyed.groupBy(col("shard"))
      .agg(sum(col("n_tokens")).as("__tot"))
      .select(col("shard"),
        expr(s"(__tot + ${budget - 1}) div $budget").as("__nseq"))
      .select(col("shard"),
        coalesce(sum(col("__nseq")).over(
          Window.orderBy(col("shard")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("__base"))
    cum.join(broadcast(bases), Seq("shard"))
      .withColumn("__budget", lit(budget))
  }
}
