package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{VectorFunctions => V}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact — broadcast the (small) query set against
  *    the full corpus; per-partition scoring, ranking via a window
  *    partitioned by query. The corpus side never shuffles its vectors —
  *    only (query_id, vec_id, score) triples move, and AQE/TakeOrdered
  *    keeps the top-k per query cheap. The baseline and the recall oracle.
  *  - [[srpTopK]]: approximate — sign-random-projection LSH with
  *    multi-probe (query probes its own bucket plus all 1-bit-flip
  *    neighbors). Corpus is bucketed once (a single uniform shuffle /
  *    or pre-materialized at write time); each query scores only its
  *    probed buckets ⇒ cost drops from O(N·Q) to O(N·Q / 2^bits · probes).
  *    This is the 100 TB path: bucket the corpus at ingest, broadcast the
  *    probe list, score within buckets.
  */
object Similarity {

  /** Exact top-k neighbors per query vector. `queries` and `corpus` both
    * expose (idCol, vecCol); self-matches are excluded. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        V.cosine(col("q_vec"), col("c_vec")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rnk"))
  }

  /** Approximate top-k via SRP-LSH with 1-bit multi-probe. Returns the
    * same shape as [[bruteForceTopK]]; recall measured in tests. */
  def srpTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nBits: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = V.randomPlanes(nBits, dim, seed)
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_vec"),
      V.srpBucket(col("embedding"), planes).as("bucket"))
    // query probes: own bucket + every 1-bit flip (nBits+1 probes)
    val probes = array((0 to nBits).map { i =>
      if (i == 0) col("q_bucket")
      else col("q_bucket").bitwiseXOR(1L << (i - 1))
    }: _*)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_vec"),
      V.srpBucket(col("embedding"), planes).as("q_bucket"))
      .withColumn("bucket", explode(probes))
      .drop("q_bucket")
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        V.cosine(col("q_vec"), col("c_vec")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rnk"))
  }

  /** Recall@k of `approx` against `exact` (both in topK output shape):
    * |approx ∩ exact| / |exact| per query, averaged. */
  def recallAtK(exact: DataFrame, approx: DataFrame): Double = {
    val hit = exact.select("query_id", "neighbor_id")
      .join(approx.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"), "left_semi")
      .count().toDouble
    val total = exact.count().toDouble
    if (total == 0) 1.0 else hit / total
  }
}
