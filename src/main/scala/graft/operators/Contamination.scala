package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Benchmark-contamination check — the n-gram-overlap audit every LLM
  * training pipeline runs before a data release: how much of each
  * training document's n-gram set also appears in a held-out benchmark
  * set, and which documents exceed the contamination threshold.
  *
  * Shape (the inverted-index join, NOT a document×benchmark cross):
  *
  *   1. benchmark docs → exploded DISTINCT n-gram set. Benchmarks are
  *      small relative to the corpus (10^4–10^6 grams vs 10^12), so this
  *      side is `broadcast()` — candidate documents never shuffle;
  *   2. candidate docs → (id, n-gram) pairs, inner-joined against the
  *      broadcast gram set — a map-side hash probe fused into the scan;
  *   3. groupBy(id) count — partial aggregation combines map-side, so
  *      the only shuffle carries one (id, count) row per document with
  *      at least one hit.
  *
  * Per-document shingle sets are distinct ([[TextFunctions.shingles]]),
  * so `matched` counts distinct overlapping n-grams and the ratio
  * `matched / total` is a true set-overlap fraction. The contaminated
  * flag compares `matched * denomFactor >= total` in integers — no
  * float threshold to diverge across engines.
  */
object Contamination {

  /** Per-candidate overlap vs `benchmark`'s n-gram set.
    * Returns (id, matched, total, contaminated), one row per candidate
    * doc; `contaminated` ⇔ matched/total ≥ 1/denomFactor. */
  def ngramOverlap(candidates: DataFrame, benchmark: DataFrame,
      id: Column, text: Column, n: Int = 3,
      denomFactor: Int = 2): DataFrame = {
    // tokens projected separately from the shingle transform — the HOF
    // re-eval trap (T.tokenShingles scaladoc) re-splits per shingle
    // otherwise. Persisted: read by both the gram explode and the totals
    // projection, and the tokenize+shingle pass is the dominant cost
    // (same cache-lifecycle contract as Dedup's shingle frames).
    val cand = candidates
      .select(id.as("doc_id"), T.tokens(lower(text)).as("toks"))
      .select(col("doc_id"), T.tokenShingles(col("toks"), n).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val benchGrams = benchmark
      .select(T.tokens(lower(text)).as("toks"))
      .select(explode(T.tokenShingles(col("toks"), n)).as("gram"))
      .distinct()
    val matched = cand.select(col("doc_id"), explode(col("sh")).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("matched"))
    cand.select(col("doc_id"), size(col("sh")).cast("long").as("total"))
      .join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("matched"), lit(0L)).as("matched"),
        col("total"),
        // total > 0 guard: an empty/whitespace-only doc has no grams to
        // audit and must NOT satisfy `0·f >= 0` — it shares nothing with
        // the benchmark
        (col("total") > 0L &&
          coalesce(col("matched"), lit(0L)) * denomFactor >= col("total"))
          .as("contaminated"))
  }

  /** Build the m-bit Bloom filter of `benchmark`'s n-gram set: bit
    * `hash60(j + ":" + gram) % m` set for each of the k salted hashes
    * (the identical md5 position idiom as [[Sketch.cmsPos]] — a Bloom
    * filter is the 1-bit Count-Min). Driver-side collect of the DISTINCT
    * set positions only (≤ m booleans however large the benchmark) —
    * index-build class, same as IVF centroids. The point at 100 TB:
    * [[ngramOverlap]] broadcasts the benchmark's gram STRINGS (gigabytes
    * for a large benchmark suite); the filter compresses that broadcast
    * to m bits with a bounded, auditable false-positive rate (~(1-e^(-kn/m))^k),
    * and the probe becomes a scan-fused O(k) bit test per gram — no join
    * at all. False positives only ever ADD matches, so the pre-filter is
    * safe for contamination screening: nothing contaminated escapes. */
  def bloomBits(benchmark: DataFrame, text: Column, n: Int = 3,
      m: Int = 2048, k: Int = 3): Seq[Boolean] = {
    require(m >= 2, "m must be >= 2")
    require(k >= 1, "k must be >= 1")
    val grams = benchmark
      .select(T.tokens(lower(text)).as("toks"))
      .select(explode(T.tokenShingles(col("toks"), n)).as("gram"))
      .distinct()
    val positions = grams
      .select(explode(array((0 until k).map(j =>
        Sketch.cmsPos(j, col("gram"), m)): _*)).as("p"))
      .distinct()
      .collect().map(_.getLong(0).toInt)
    val bits = Array.fill(m)(false)
    positions.foreach(bits(_) = true)
    bits.toSeq
  }

  /** [[ngramOverlap]]'s counting leg run against a Bloom filter instead
    * of the exact gram set: (doc_id, bloom_matched, total) where
    * `bloom_matched` counts the doc's distinct n-grams whose k bits are
    * ALL set — a superset of the exact matched count (one-sided, like
    * the CMS estimate; the driver query q126 pins bloom ≥ exact row by
    * row against the same split). The probe is zero-join: the m-bit
    * array rides the plan as ONE array literal and each gram pays k
    * md5+element_at tests fused into the scan — candidate documents
    * never shuffle and nothing is broadcast but the bits. */
  def bloomNgramOverlap(candidates: DataFrame, bits: Seq[Boolean],
      id: Column, text: Column, n: Int = 3, k: Int = 3): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val m = bits.size
    val bitsLit = typedlit(bits)
    val cand = candidates
      .select(id.as("doc_id"), T.tokens(lower(text)).as("toks"))
      .select(col("doc_id"), T.tokenShingles(col("toks"), n).as("sh"))
    val maybe = (g: Column) => (0 until k)
      .map(j => element_at(bitsLit, (Sketch.cmsPos(j, g, m) + lit(1L)).cast("int")))
      .reduce(_ && _)
    cand.select(col("doc_id"),
      size(filter(col("sh"), maybe)).cast("long").as("bloom_matched"),
      size(col("sh")).cast("long").as("total"))
  }

  /** The COMPOSED decontamination screen from a pre-shingled frame —
    * [[bloomNgramOverlap]]'s suspect pre-filter and [[ngramOverlap]]'s
    * exact confirm sharing ONE staged (doc_id, sh) projection instead
    * of each re-tokenizing the corpus from raw text (the r19 flat-bench
    * finding: the screen's duplicate tokenize+shingle pass was q164's
    * dominant cost, ~flat for three rounds). Returns the
    * confirmed-contaminated doc_ids:
    *
    *   - suspects = rows with ≥ 1 shingle passing all k Bloom bit tests
    *     (`exists` over the staged sh array — zero-join, scan-fused, and
    *     short-circuiting where [[bloomNgramOverlap]]'s full count
    *     can't; sound because the filter has no false negatives, so
    *     non-suspects are exactly-clean);
    *   - confirmed = suspects whose distinct-gram overlap with the
    *     broadcast benchmark gram set reaches 1/denomFactor of their own
    *     gram count — [[ngramOverlap]]'s integer arithmetic
    *     (matched·f ≥ total, total > 0 guard) over the SAME sh sets.
    *
    * The shingle n is whatever the staged frame was built with — the
    * caller shares the frame with the near-dup banding
    * ([[Dedup.stagedScopedShingles]]), which is what makes the screen's
    * marginal tokenize cost zero. `n` here shapes only the benchmark
    * side and must match the staged frame's. */
  def contaminatedIdsFromShingles(staged: DataFrame, bits: Seq[Boolean],
      benchmark: DataFrame, text: Column, n: Int = 3, k: Int = 3,
      denomFactor: Int = 2): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val m = bits.size
    val bitsLit = typedlit(bits)
    val maybe = (g: Column) => (0 until k)
      .map(j => element_at(bitsLit,
        (Sketch.cmsPos(j, g, m) + lit(1L)).cast("int")))
      .reduce(_ && _)
    val suspects = staged.filter(exists(col("sh"), maybe))
    val benchGrams = benchmark
      .select(T.tokens(lower(text)).as("toks"))
      .select(explode(T.tokenShingles(col("toks"), n)).as("gram"))
      .distinct()
    val matched = suspects
      .select(col("doc_id"), explode(col("sh")).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("matched"))
    suspects.select(col("doc_id"), size(col("sh")).cast("long").as("total"))
      .join(matched, Seq("doc_id"), "left")
      .filter(col("total") > 0L &&
        coalesce(col("matched"), lit(0L)) * denomFactor >= col("total"))
      .select(col("doc_id"))
  }

  /** Cross-split near-duplicate leakage — the OTHER contamination axis:
    * [[ngramOverlap]] audits a corpus against an external benchmark;
    * this audits a corpus against its OWN train/val/test split, finding
    * near-duplicate pairs that straddle split boundaries (evaluation
    * rows whose near-copy sits in train — the leakage Lee et al. showed
    * inflates benchmark scores even after exact dedup).
    *
    * Pure zero-join composition: [[Dedup.minhashNearDupPairs]] emits the
    * verified pairs, and [[Sampling.splitLabel]] is a HASH of the id —
    * each side's split label is a scan-fused projection on the pair
    * frame, no corpus re-join, no extra shuffle beyond what the pair
    * search already does. Returns (id_a, id_b, jaccard, split_a,
    * split_b, leak); `leak` ⇔ the sides land in different splits. */
  def crossSplitNearDups(df: DataFrame, id: Column, text: Column,
      shingleN: Int = 3, k: Int = 8, rowsPerBand: Int = 1,
      threshold: Double = 0.4, trainBound: String = "cccc",
      valBound: String = "e666"): DataFrame =
    Dedup.minhashNearDupPairs(df, id, text, shingleN, k, rowsPerBand, threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"),
        Sampling.splitLabel(col("id_a"), trainBound, valBound).as("split_a"),
        Sampling.splitLabel(col("id_b"), trainBound, valBound).as("split_b"))
      .withColumn("leak", col("split_a") =!= col("split_b"))
}
