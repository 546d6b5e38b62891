package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a partial-aggregatable UDAF.
  *
  * Why not a window: `row_number().over(partitionBy(query))` shuffles EVERY
  * scored row to the query's partition — with few queries that's a skewed
  * all-data shuffle. This Aggregator keeps at most `k` candidates per
  * partition per key (map-side partial aggregation), so only `k × partitions`
  * rows cross the wire per key regardless of corpus size — the shape that
  * survives a 100 TB corpus scan.
  *
  * Ordering: score descending, id ascending on ties — fully deterministic,
  * identical to `ORDER BY score DESC, id` ranking.
  */
object TopK {

  case class Scored(id: Long, score: Double)

  private def ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  /** Buffer is an unsorted candidate list trimmed whenever it exceeds 4k —
    * amortized O(1) per row, exact after the final trim. */
  class TopKAggregator(k: Int)
      extends Aggregator[Scored, ArrayBuffer[Scored], Seq[Scored]] {
    private def trim(b: ArrayBuffer[Scored]): ArrayBuffer[Scored] = {
      val kept = b.sorted(ord).take(k)
      b.clear(); b ++= kept
    }
    override def zero: ArrayBuffer[Scored] = ArrayBuffer.empty
    override def reduce(b: ArrayBuffer[Scored], a: Scored): ArrayBuffer[Scored] = {
      b += a
      if (b.length > 4 * k) trim(b) else b
    }
    override def merge(x: ArrayBuffer[Scored], y: ArrayBuffer[Scored]): ArrayBuffer[Scored] = {
      x ++= y
      if (x.length > 4 * k) trim(x) else x
    }
    override def finish(b: ArrayBuffer[Scored]): Seq[Scored] = b.sorted(ord).take(k).toSeq
    override def bufferEncoder: Encoder[ArrayBuffer[Scored]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  /** `topK(k)(id, score)` → array<struct<id,score>> of the k best. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k), Encoders.product[Scored])
    (id: Column, score: Column) => fn(id, score)
  }
}
