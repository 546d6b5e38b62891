package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Model-based quality filtering — the fastText-shaped hashed LINEAR
  * classifier modern pipelines run after the heuristic gates (the
  * DCLM/fastText quality-filter move): features are hashed n-grams, the
  * model is one weight vector, the score is a dot product. The
  * heuristic gates ([[graft.functions.TextFunctions.qualityScore]])
  * encode what a curator wrote down; this scores what a trained model
  * learned — both are per-row scan-fused projections, so swapping the
  * model is swapping a literal.
  *
  * Engine shape (the 100 TB points):
  *   - feature hashing, not a vocabulary join: bucket = salted-md5(gram)
  *     mod nBuckets ([[Sketch.cmsPos]] — the same portable primitive as
  *     the CMS/Bloom family), so scoring needs NO dictionary shuffle
  *     and the model size is fixed whatever the corpus;
  *   - the weight vector rides the plan as ONE array literal (the Bloom
  *     bits / PQ table idiom) and the score is an `aggregate` fold over
  *     the token array — zero joins, zero shuffles, one projection;
  *   - INTEGER micro-weights: the fold sums longs, so the score is
  *     order-independent and hash-checks against a SQL oracle (a float
  *     dot product's low bits depend on summation order).
  *
  * Feature map (documented contract): unigram BAG counts (every token
  * instance scores, salt 0) + DISTINCT bigram presence (salt 1 —
  * [[TextFunctions.tokenShingles]] emits distinct windows). Weights here
  * are seeded stand-ins with the real model's shape — a trained
  * exported model drops in as the same literal. */
object QualityModel {

  /** Deterministic stand-in weight table: n integer micro-weights in
    * [-10⁶, 10⁶), derived from md5(seed:i) — the driver-side "model
    * artifact" (rendered into the generated oracle as literals, the
    * q28-planes discipline). */
  def hashWeights(n: Int, seed: Long): Seq[Long] =
    (0 until n).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$i".getBytes("UTF-8"))
      val h = md.take(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      (((h % 2000000L) + 2000000L) % 2000000L) - 1000000L
    }

  /** Score every document: (doc_id, n_feats, score_micros, kept) with
    * score = bias + Σ W[h₀(token)] over the token BAG
    *              + Σ W[h₁(bigram)] over DISTINCT bigrams,
    * kept ⇔ score ≥ 0. One scan-fused projection per row. */
  def score(docs: DataFrame, id: Column, text: Column,
      weights: Seq[Long], bias: Long = 0L): DataFrame =
    docs
      .select(id.as("doc_id"), T.tokens(lower(text)).as("toks"))
      .select(col("doc_id"), col("toks"),
        T.tokenShingles(col("toks"), 2).as("bi"))
      .select(col("doc_id"),
        (size(col("toks")) + size(col("bi"))).cast("long").as("n_feats"),
        scoreMicrosExpr(col("toks"), col("bi"), weights, bias)
          .as("score_micros"))
      .withColumn("kept", col("score_micros") >= 0L)

  /** The per-row score as a COLUMN over a pre-tokenized lowercase token
    * array and its bigram array — the expression [[score]] wraps,
    * exposed so a fused scan (e.g. the streaming card's single-pass
    * partial) can share one tokenization across legs. Identical
    * expression tree to [[score]]'s, so composing it reproduces the
    * model's integers bit for bit. */
  def scoreMicrosExpr(toks: Column, bi: Column, weights: Seq[Long],
      bias: Long = 0L): Column = {
    val n = weights.size
    require(n >= 2, "weights must have >= 2 buckets")
    val wLit = typedlit(weights)
    def w(salt: Int, gram: Column): Column =
      element_at(wLit, (Sketch.cmsPos(salt, gram, n) + 1).cast("int"))
    def foldSum(arr: Column, salt: Int): Column =
      aggregate(arr, lit(0L), (acc, g) => acc + w(salt, g))
    lit(bias) + foldSum(toks, 0) + foldSum(bi, 1)
  }
}
