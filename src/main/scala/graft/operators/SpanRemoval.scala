package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Exact duplicated-SPAN removal — the Lee-et-al-style deduplication pass
  * that rewrites documents by deleting the regions they share with other
  * documents, rather than dropping whole documents ([[Dedup]]) or whole
  * repeated segments ([[Boilerplate]]). Reference behavior:
  * TopN-ClashRoyal-ETL-SQL-snapshot has only whole-row dedup
  * (load_snapshot.py:61's match-hash distinct); span-level rewriting is
  * part of this engine's training-data-pipeline extension surface
  * (SURVEY.md §2.12), completing the dedup family q55/q70 (audit) and
  * q77 (segment drop) with the pass that *edits* documents.
  *
  * Semantics (deterministic, hence oracle-checkable):
  *   1. Tokenize (lowercase whitespace tokens) and enumerate POSITIONAL
  *      n-grams — (doc, pos, gram) for pos in [1, len-n+1]; docs shorter
  *      than n carry no gram and are never edited.
  *   2. A gram is DUPLICATED when it occurs in >= `minDocs` distinct
  *      documents.
  *   3. Every occurrence of a duplicated gram covers token interval
  *      [pos, pos+n-1]; the union of those intervals per document,
  *      merged into maximal spans (overlap OR adjacency), is removed.
  *   4. The surviving tokens, in order, single-space-joined, are the
  *      clean text.
  *
  * Returns (doc_id, n_tokens, n_removed, n_spans, clean_md5): original
  * token count, removed token count, count of maximal removed spans, and
  * md5 of the rewritten text ('' — md5 d41d8… — when everything was
  * removed).
  *
  * Scale shape:
  *   - Gram docfreq is ONE two-phase aggregate: groupBy(gram, doc) then
  *     groupBy(gram) — both with map-side combine, the shuffle carries
  *     (gram, partial) rows, never postings.
  *   - The duplicated-gram set join is Zipf-LEFT-skewed exactly like
  *     [[Dedup.sharedNgramStats]]' gram join (postings-many left rows vs
  *     one right row per gram); AQE skew-split handles it, and
  *     `saltBuckets` > 0 engages [[Skew.saltedJoin]] as the
  *     deterministic fallback — inner join against a unique right key,
  *     so multiplicity is unchanged and results are identical.
  *   - Interval union/merge is windows PARTITIONED BY doc — work and
  *     skew bounded by document length, never by gram popularity.
  *   - Reassembly is one groupBy(doc) over kept tokens; the collected
  *     list is document-sized, the same per-doc bound every rewriting
  *     pass carries.
  *
  * Cache lifecycle (the [[Dedup]] convention): the tokenized doc frame
  * is persisted for the duration of the returned plan — callers running
  * many operators in one session free it with
  * `spark.catalog.clearCache()` once results are materialized.
  */
object SpanRemoval {

  /** See object scaladoc. `n` = gram width (tokens), `minDocs` = docfreq
    * at which a gram counts as duplicated (>= 2: shared with at least
    * one other document). */
  def removeDuplicatedSpans(df: DataFrame, id: Column, text: Column,
      n: Int = 3, minDocs: Long = 2L, saltBuckets: Int = 0): DataFrame = {
    require(n > 0, "n must be positive")
    require(minDocs >= 2L, "minDocs must be >= 2 (a gram always occurs in its own doc)")
    val docs = Parallelism.ensureMinPartitions(
        df.select(id.as("doc_id"), T.tokens(lower(text)).as("toks")),
        col("doc_id"))
      .filter(size(col("toks")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // positional grams: scan-fused transform over the token array — the
    // per-window slice is the HOF form (TokenShingles scaladoc), but here
    // positions matter so the distinct native shingle expression doesn't
    // apply; the explode is bounded by corpus token count
    val gramOcc = docs
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(1), size(col("toks")) - (n - 1)),
        i => array_join(slice(col("toks"), i, lit(n)), " "))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("gram"))
    // docfreq per gram, two-phase (doc-distinct first, both map-side
    // combined); the duplicated set is gram-keyed and unique
    val dup = gramOcc.select(col("gram"), col("doc_id")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select(col("gram"))
    val dupOcc =
      (if (saltBuckets > 0) Skew.saltedJoin(gramOcc, dup, "gram", saltBuckets)
       else gramOcc.join(dup, Seq("gram")))
        .select(col("doc_id"), col("pos"))
    // union of covered token positions, then maximal spans by the
    // gaps-and-islands window — both doc-partitioned
    val removed = dupOcc
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (n - 1))).as("pos"))
      .distinct()
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val removedStats = removed
      .select(col("doc_id"), col("pos"), lag(col("pos"), 1).over(wDoc).as("__prev"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_removed"),
        sum(when(col("__prev").isNull || col("pos") > col("__prev") + 1, 1L)
          .otherwise(0L)).as("n_spans"))
    // reassembly: kept tokens in order -> single-space join -> md5
    val toks = docs.select(col("doc_id"), posexplode(col("toks")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("token"))
    val rewritten = toks
      .join(removed.withColumn("__rm", lit(1)), Seq("doc_id", "pos"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(when(col("__rm").isNull,
            struct(col("pos"), col("token"))))),
          s => s.getField("token")), " ").as("__clean"))
    rewritten.join(removedStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        md5(col("__clean").cast("binary")).as("clean_md5"))
  }
}
