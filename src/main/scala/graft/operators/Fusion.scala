package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a LEXICAL ranking
  * ([[Keywords.bm25TopK]]) with a VECTOR ranking ([[Similarity]] topK)
  * into one result list, the standard two-tower search architecture.
  *
  * Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR'09):
  * score(d) = Σ_lists 1/(c + rank_list(d)), c = 60 by convention. RRF is
  * the fusion method of choice here precisely because it consumes RANKS,
  * not scores — BM25 and cosine live on incomparable scales, and rank
  * fusion needs no per-query score normalization (which would drag
  * engine-specific float pipelines back in). Every op is a
  * correctly-rounded double division plus a fixed-order sum of two
  * terms, so fused scores are bit-stable and the whole hybrid stack
  * hash-checks (q75).
  *
  * Scale shape: inputs are ALREADY top-k-bounded per query (k·|queries|
  * rows each — the upstream operators did the corpus-sized work), so the
  * full-outer join and the per-query ranking window here run on
  * retrieval-result-sized frames. The window is partitioned by query_id;
  * no corpus data moves.
  */
object Fusion {

  /** Fuse two (query_id, doc_id, rnk) rankings by RRF; returns
    * (query_id, doc_id, rnk) with the top `k` fused results per query.
    * A document present in only one list contributes only that list's
    * term (the other coalesces to 0 — the standard treatment). Ties
    * break by doc_id ascending. The sum order is fixed (a-term + b-term),
    * so scores are deterministic. */
  def reciprocalRank(a: DataFrame, b: DataFrame, k: Int,
      c: Int = 60): DataFrame = {
    val an = a.select(col("query_id"), col("doc_id"), col("rnk").as("rnk_a"))
    val bn = b.select(col("query_id"), col("doc_id"), col("rnk").as("rnk_b"))
    val fused = an.join(bn, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(lit(1.0) / (lit(c) + col("rnk_a")), lit(0.0))
          + coalesce(lit(1.0) / (lit(c) + col("rnk_b")), lit(0.0))).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    fused.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"), col("rnk"))
  }
}
