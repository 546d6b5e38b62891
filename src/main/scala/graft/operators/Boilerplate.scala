package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Segment-level boilerplate removal — the CCNet/RefinedWeb "drop
  * duplicated lines across documents" pass, the one corpus-cleaning move
  * the per-document surface (q07 exact dedup, q23/q37 near-dup, q55 gram
  * audit) cannot make: navigation chrome, cookie banners and license
  * footers repeat across MANY documents while each host document stays
  * unique, so document-granular dedup keeps every copy. The fix operates
  * WITHIN documents: split each into segments, count each normalized
  * segment's cross-document frequency, drop segments shared too widely,
  * and reassemble the survivors in order.
  *
  * Production corpora segment on newlines/sentences; this fixture's
  * synthetic text is single-line, so the segmenter is a deterministic
  * fixed-width token chunker (non-overlapping, unlike [[Dedup]]'s
  * overlapping shingles — a rewrite needs a partition of the document,
  * not a sliding audit). The pipeline shape is segmenter-agnostic:
  * swap `chunk` for `split(text, "\n")` and nothing downstream changes.
  *
  * Scale shape (the reason this formulation survives 100 TB):
  *   1. ONE inverted-index groupBy on the segment key with map-side
  *      combine — the shuffle carries (segment, partial count), never
  *      (segment, doc).
  *   2. The removal join tests each segment occurrence against the
  *      boilerplate set = segments with docfreq > `maxDocs`. How big that
  *      set is depends ENTIRELY on the threshold: at a high `maxDocs`
  *      (drop only the Zipf head) it is index-sized and broadcasting it
  *      wins — no second shuffle of the exploded corpus, and the hot
  *      segments never concentrate on one task because they never
  *      shuffle at all. But at the CCNet-style `maxDocs` = 2 actually
  *      used for cleaning, boilerplate is ubiquitous BY PREMISE and the
  *      duplicated-segment set of a web corpus is corpus-scale — a
  *      forced broadcast of it OOMs the driver. So the broadcast is a
  *      KNOB (`broadcastBoiler`), default off: the plain shuffle join
  *      lets AQE pick the strategy from the set's runtime size (and
  *      split any skewed segment key). BoilerplateSpec pins that both
  *      paths return identical results.
  *   3. Reassembly groups by doc_id — the explode's natural key, so
  *      partial aggregation applies and skew follows document length,
  *      not segment popularity.
  */
object Boilerplate {

  /** Single-split inputs must not serialize the segment pass on one
    * core — see [[Parallelism]]. */
  private def ensureParallelism(df: DataFrame, id: Column): DataFrame =
    Parallelism.ensureMinPartitions(df, id)

  /** Remove segments appearing in more than `maxDocs` distinct documents.
    *
    * Returns one row per input document with a non-empty token stream:
    * (doc_id, n_seg, n_dropped, clean_md5) where `clean_md5` is the md5
    * of the surviving segments joined by single spaces in original order
    * (empty string when every segment was boilerplate) — a fixed-width
    * proof of the rewritten text that keeps the driver artifact bounded
    * at any corpus size. Callers wanting the text itself use
    * [[cleaned]].
    *
    * `segTokens` is the chunk width; per-doc segment keys are NOT
    * deduplicated before counting docfreq, so `count(distinct doc_id)`
    * semantics are made explicit in the index aggregate. */
  def stripSharedSegments(df: DataFrame, id: Column, text: Column,
      segTokens: Int = 3, maxDocs: Long = 2L,
      broadcastBoiler: Boolean = false): DataFrame = {
    val kept = cleaned(df, id, text, segTokens, maxDocs, broadcastBoiler)
    kept.select(col("doc_id"), col("n_seg"), col("n_dropped"),
      md5(col("clean_text")).as("clean_md5"))
  }

  /** As [[stripSharedSegments]] but returning the rewritten text:
    * (doc_id, n_seg, n_dropped, clean_text). `broadcastBoiler` forces a
    * broadcast of the boilerplate segment set — only safe when `maxDocs`
    * is high enough that the set is the Zipf HEAD (index-sized); at
    * cleaning thresholds (maxDocs ≈ 2) leave it off and let AQE decide
    * (object scaladoc, point 2). Results are identical either way. */
  def cleaned(df: DataFrame, id: Column, text: Column,
      segTokens: Int = 3, maxDocs: Long = 2L,
      broadcastBoiler: Boolean = false): DataFrame = {
    require(segTokens > 0, "segTokens must be positive")
    require(maxDocs > 0, "maxDocs must be positive")
    val docs = ensureParallelism(
      df.select(id.as("doc_id"), T.tokens(lower(text)).as("toks")),
      col("doc_id"))
      .filter(size(col("toks")) > 0)
      // project the token array BEFORE the lambda uses it (HOF re-eval
      // trap — see TextFunctions.tokenShingles): each chunk is
      // slice(toks, p*w+1, w); the final chunk clamps automatically
      .select(col("doc_id"),
        transform(
          sequence(lit(0),
            ceil(size(col("toks")) / lit(segTokens.toDouble)).cast("int") - 1),
          p => concat_ws(" ", slice(col("toks"),
            p * segTokens + 1, lit(segTokens)))).as("segs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val segs = docs.select(col("doc_id"), posexplode(col("segs")).as(Seq("pos", "seg")))
    // inverted index: distinct-per-doc first so count(*) == docfreq even
    // when a doc repeats a segment internally; both aggregates combine
    // map-side
    val boiler = segs.select(col("doc_id"), col("seg")).distinct()
      .groupBy(col("seg")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocs)
      .select(col("seg"))
    val marked = boiler.withColumn("__bp", lit(1))
    val surviving = segs.join(
      if (broadcastBoiler) broadcast(marked) else marked, Seq("seg"), "left")
    val out = surviving.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_seg"),
        count(col("__bp")).as("n_dropped"),
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("__bp").isNull, struct(col("pos"), col("seg"))))),
          s => s.getField("seg"))).as("clean_text"))
    // docs stays persisted for the job's lifetime — same cache-lifecycle
    // contract as [[Dedup]] (caller clears via spark.catalog.clearCache())
    out
  }
}
