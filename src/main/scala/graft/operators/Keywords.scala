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
}
