package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{TextFunctions => T}

/** TF-IDF-style keyword extraction: the top-k most DISTINCTIVE terms per
  * document — highest in-document frequency, rarest across the corpus.
  *
  * The ranking key is the integer triple (tf DESC, df ASC, term ASC)
  * rather than the float score tf·ln(N/df): the float orders pairs
  * identically whenever tf dominates, but `ln` is not guaranteed
  * bit-identical across libm implementations, and a last-ulp difference
  * flips ranks between engines. The integer triple is the same ordering
  * intent with zero float hazard — fully oracle-checkable.
  *
  * Scale shape: one explode + groupBy(doc, term) shuffle builds the
  * term-frequency fact (map-side combine collapses repeats before the
  * exchange); document frequency is a second aggregation OVER THE TF
  * FRAME (|doc·distinct-term| rows, not raw tokens). The df dimension is
  * |vocabulary| rows — broadcast for the join back, so the window sees a
  * single shuffle on doc_id. At 100 TB the vocabulary of a tokenized web
  * corpus is 10^7–10^8 terms; if it outgrows broadcast, drop the hint
  * and the same plan becomes a shuffle join on term — no rewrite.
  */
object Keywords {

  /** Integer UNIGRAM SURPRISAL per document — the perplexity-proxy
    * quality signal (gibberish and boilerplate sit at the surprisal
    * extremes) computed with ZERO floats: each token's self-information
    * −log₂ p(token) is approximated in whole bits as
    * `bitlen(N) − bitlen(freq)` (bin-length of the corpus token total
    * minus bin-length of the token's corpus frequency — exact for
    * powers of two, within 1 bit otherwise, and monotone in 1/p, which
    * is all a filter threshold needs). Engine-portable (`length(bin(n))`
    * on both sides, the q92 idiom) where a float Σ−log p would be
    * libm- and order-dependent.
    *
    * Returns (doc_id, n_tok, bits, bits_per_tok_x100): total surprisal
    * bits and the centi-bits-per-token rate (integer: bits·100 div n).
    *
    * Scale shape: one tokenize+explode, one map-side-combined
    * groupBy(word) for the vocab frequencies (vocab-sized, Zipf-
    * bounded), a 1-row total broadcast, the word join back (broadcast
    * knob = [[Vocab.encoded]]'s discipline), one groupBy(doc) rollup. */
  def unigramSurprisal(docs: DataFrame, id: Column, text: Column,
      broadcastWords: Boolean = false): DataFrame = {
    val toks = docs.select(id.as("doc_id"), T.tokens(lower(text)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), explode(col("toks")).as("word"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freqs = toks.groupBy(col("word")).agg(count(lit(1)).as("__f"))
    val total = freqs.agg(sum(col("__f")).as("__n"))
    val scored = freqs.crossJoin(broadcast(total))
      .select(col("word"),
        (length(bin(col("__n"))) - length(bin(col("__f"))))
          .cast("long").as("__bits"))
    toks.join(if (broadcastWords) broadcast(scored) else scored, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("__bits")).as("bits"))
      .withColumn("bits_per_tok_x100", expr("(bits * 100) div n_tok"))
  }

  /** Top-k distinctive terms per document: (doc_id, term, tf, df, rnk). */
  def topTerms(docs: DataFrame, id: Column, text: Column,
      k: Int = 3): DataFrame = {
    val tf = docs
      .select(id.as("doc_id"), explode(T.tokens(lower(text))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(broadcast(df), "term")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rnk"))
  }

  /** BM25 retrieval: top-k documents per keyword query — the LEXICAL
    * retrieval complement of [[Similarity]]'s vector search (hybrid
    * search runs both and fuses). Standard BM25 shape with k1=1.2,
    * b=0.75, two deliberate engine-portability choices:
    *
    *  - idf is the ODDS RATIO (N − df + 0.5)/(df + 0.5) without the
    *    usual `ln`: every arithmetic op here (+, −, ×, ÷ on doubles) is
    *    IEEE correctly-rounded and therefore bit-identical across
    *    engines, but `ln` is libm-dependent — a last-ulp difference
    *    flips ranks and breaks hash checks (same reasoning as
    *    [[topTerms]]'s integer triple). The ln form is one withColumn
    *    away if cross-engine comparison is not needed.
    *  - the tf saturation term is RATIONALIZED to integers:
    *    tf·(k1+1) / (tf + k1(1−b+b·len/avgdl)) ≡
    *    22·tf·avgdl / (10·avgdl·tf + 3·avgdl + 9·len) with avgdl
    *    floored to a whole token count — one correctly-rounded double
    *    division per term instead of a tower of float intermediates.
    *
    * Scale shape: the query set is LITERAL (a search-API batch), so
    * per-term tf columns are scan-fused projections over the token
    * array — no explode, no shuffle; corpus stats (N, Σlen, per-term df)
    * are ONE aggregate row broadcast back; scoring is a pure projection;
    * ranking is the bounded [[TopK]] aggregator (k·partitions rows
    * shuffle per query — never the scored corpus). Per-term sums are
    * explicit left-associated `+` chains in fixed term order, so scores
    * are bit-stable under any partitioning. A query set too large to
    * inline becomes a (term, query) fact joined against an exploded tf
    * frame — a different operator with a genuine shuffle.
    *
    * Returns (query_id, doc_id, rnk); rank ties by doc_id ascending.
    * Query terms are matched verbatim against lowercased whitespace
    * tokens; docs matching NO term of a query score 0 but still rank —
    * pass corpora through a candidate filter first if zero-hit docs
    * should be excluded (at k ≪ corpus they never surface anyway). */
  def bm25TopK(docs: DataFrame, id: Column, text: Column,
      queries: Seq[(Int, Seq[String])], k: Int = 10): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "each query needs at least one term")
    val terms = queries.flatMap(_._2).distinct.sorted
    val ti = terms.zipWithIndex.toMap
    val toks = docs
      .select(id.as("doc_id"), T.tokens(lower(text)).as("toks"))
      .filter(size(col("toks")) > 0)
    val withTf = toks.select(
      col("doc_id") +: size(col("toks")).cast("long").as("len") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("toks"), x => x === lit(t))).cast("long").as(s"tf_$i")
        }: _*)
    val stats = withTf.agg(
      count(lit(1)).as("n"),
      sum(col("len")).as("sumlen") +:
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0L, 1L).otherwise(0L)).as(s"df_$i")): _*)
      .select(col("n") +:
        floor(col("sumlen").cast("double") / col("n")).cast("long").as("avgl") +:
        terms.indices.map(i => col(s"df_$i")): _*)
    val scored = withTf.crossJoin(broadcast(stats))
    def scoreOf(ts: Seq[String]): Column = ts.map { t =>
      val i = ti(t)
      val tf = col(s"tf_$i")
      val dfc = col(s"df_$i")
      when(tf === 0L, lit(0.0)).otherwise(
        ((col("n") - dfc + lit(0.5)) / (dfc + lit(0.5))) *
          ((lit(22L) * tf * col("avgl")).cast("double") /
            (lit(10L) * col("avgl") * tf + lit(3L) * col("avgl")
              + lit(9L) * col("len")).cast("double")))
    }.reduceLeft(_ + _)
    scored
      .select(col("doc_id"), explode(array(queries.map { case (qid, ts) =>
        struct(lit(qid).as("query_id"), scoreOf(ts).as("score")) }: _*)).as("qs"))
      .select(col("qs.query_id").as("query_id"), col("doc_id"),
        col("qs.score").as("score"))
      .groupBy(col("query_id"))
      .agg(TopK.topK(k)(col("doc_id"), col("score")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("doc_id"),
        (col("pos") + 1).cast("int").as("rnk"))
  }
}
