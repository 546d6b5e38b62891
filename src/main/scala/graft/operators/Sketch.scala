package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch — approximate
  * COUNT(DISTINCT) with BOUNDED per-group state, the cardinality
  * monitor that scales where exact distinct cannot: exact distinct
  * shuffles every distinct value to its group; the sketch shuffles at
  * most k 8-byte hashes per group per map partition, whatever the
  * corpus size. Unlike HyperLogLog (whose register layouts differ per
  * engine), KMV over the md5-prefix hash is DETERMINISTIC and
  * ENGINE-PORTABLE: both engines keep the identical k smallest distinct
  * 60-bit hashes, so the sketch — and the estimate, computed in integer
  * arithmetic — hash-checks against the SQL oracle exactly ([[Sampling]]'s
  * portable-hash discipline applied to cardinality estimation).
  *
  * Estimator (Bar-Yossef et al.): the k-th smallest of n distinct
  * uniform hashes in [0, 2⁶⁰) sits near k/n of the range, so
  * n̂ = (k−1)·2⁶⁰ div h₍ₖ₎ — the unbiased form, integer division. A
  * group with fewer than k distinct values short-circuits: the sketch
  * IS the value set, the estimate is exact.
  *
  * Scale shape: one scan computes the hash (fused), the KMV aggregator
  * runs with map-side partial aggregation (k-bounded buffers, duplicate
  * hashes collapse inside the buffer — no pre-distinct shuffle), and
  * only sketch-sized state crosses the wire. The estimate is a per-group
  * projection over the k-sized array.
  */
object Sketch {

  /** Bounded distinct-min-k aggregator: buffer holds candidate hashes,
    * trimmed to the k smallest DISTINCT whenever it exceeds 4k —
    * amortized O(1) per row, exact after the final trim (any value a
    * trim drops is strictly larger than the buffer's k-th smallest
    * distinct, so it can never re-enter the final k). */
  class KmvAggregator(k: Int)
      extends Aggregator[Long, ArrayBuffer[Long], Seq[Long]] {
    private def trim(b: ArrayBuffer[Long]): ArrayBuffer[Long] = {
      val kept = b.distinct.sorted.take(k)
      b.clear(); b ++= kept
    }
    override def zero: ArrayBuffer[Long] = ArrayBuffer.empty
    override def reduce(b: ArrayBuffer[Long], a: Long): ArrayBuffer[Long] = {
      b += a
      if (b.length > 4 * k) trim(b) else b
    }
    override def merge(x: ArrayBuffer[Long], y: ArrayBuffer[Long]): ArrayBuffer[Long] = {
      x ++= y
      if (x.length > 4 * k) trim(x) else x
    }
    override def finish(b: ArrayBuffer[Long]): Seq[Long] =
      b.distinct.sorted.take(k).toSeq
    override def bufferEncoder: Encoder[ArrayBuffer[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** `kmv(k)(hash)` → sorted array of the k smallest distinct hashes. */
  def kmv(k: Int): Column => Column = {
    val fn = udaf(new KmvAggregator(k), Encoders.scalaLong)
    (hash: Column) => fn(hash)
  }

  /** SKETCH-MERGE aggregator: folds whole KMV arrays instead of raw
    * hashes. The mergeability law — `kmvMerge(k)` over per-partition
    * sketches ≡ `kmv(k)` over the union of their raw inputs — holds
    * EXACTLY (not approximately): each input array is its partition's k
    * smallest distinct hashes, any union-wide top-k hash is in its own
    * partition's top-k, so concatenate + distinct + sort + take(k) loses
    * nothing. This is what makes the sketch warehouse-able at 100 TB:
    * per-day / per-shard sketch tables roll up to any coarser grain
    * without revisiting raw data, shuffling only k-sized arrays. */
  class KmvMergeAggregator(k: Int)
      extends Aggregator[Seq[Long], ArrayBuffer[Long], Seq[Long]] {
    private def trim(b: ArrayBuffer[Long]): ArrayBuffer[Long] = {
      val kept = b.distinct.sorted.take(k)
      b.clear(); b ++= kept
    }
    override def zero: ArrayBuffer[Long] = ArrayBuffer.empty
    override def reduce(b: ArrayBuffer[Long], a: Seq[Long]): ArrayBuffer[Long] = {
      if (a != null) b ++= a
      if (b.length > 4 * k) trim(b) else b
    }
    override def merge(x: ArrayBuffer[Long], y: ArrayBuffer[Long]): ArrayBuffer[Long] = {
      x ++= y
      if (x.length > 4 * k) trim(x) else x
    }
    override def finish(b: ArrayBuffer[Long]): Seq[Long] =
      b.distinct.sorted.take(k).toSeq
    override def bufferEncoder: Encoder[ArrayBuffer[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** `kmvMerge(k)(mins)` → the union sketch of the input sketch arrays. */
  def kmvMerge(k: Int): Column => Column = {
    val fn = udaf(new KmvMergeAggregator(k), ExpressionEncoder[Seq[Long]]())
    (mins: Column) => fn(mins)
  }

  /** The 60-bit md5-prefix hash of `v` — the engine-portable uniform
    * hash every sketch here keys on (DuckDB:
    * ('0x' || substr(md5(v), 1, 15))::UBIGINT). */
  def hash60(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 15), 16, 10).cast("long")

  /** Per-group approximate distinct count of `value`: (group, n_kept,
    * kth_hash, est_distinct). `n_kept` < k means the group held fewer
    * than k distinct values and `est_distinct` is exact (kth_hash is
    * the largest kept hash, or NULL for an all-null group). */
  def distinctEstimate(df: DataFrame, group: Column, value: Column,
      k: Int = 256): DataFrame = {
    require(k >= 2, "k must be >= 2")
    df.select(group.as("grp"), hash60(value).as("__h"))
      .filter(col("__h").isNotNull) // null value -> null hash -> not a value
      .groupBy(col("grp"))
      .agg(kmv(k)(col("__h")).as("__mins"))
      .select(estimateProjection(k): _*)
  }

  /** (grp, __mins) → (grp, n_kept, kth_hash, est_distinct).
    * (k−1)·2⁶⁰ ≈ 2.9e20 at k=256 overflows int64, so the estimate's
    * numerator is exact DECIMAL and `div` (IntegralDivide) brings it
    * back to BIGINT — the oracle mirrors with HUGEINT `//`. */
  private def estimateProjection(k: Int): Seq[Column] = Seq(
    col("grp"),
    size(col("__mins")).cast("long").as("n_kept"),
    expr("element_at(__mins, size(__mins))").as("kth_hash"),
    // ONE estimator expression ([[kmvEstimate]]) for both the direct
    // sketch and stored-state reads — a fix to the arithmetic lands in
    // both or the streaming ≡ batch contract breaks. The empty-mins NULL
    // branch is unreachable here (a group exists only with ≥1 hash).
    kmvEstimate("__mins", k).as("est_distinct"))

  /** The KMV cardinality estimate read off a STORED mins array — the
    * [[distinctEstimate]] projection for consumers holding merged sketch
    * state (a streaming card's standing table, a warehouse sketch
    * rollup): same integer arithmetic, bit-identical to the direct
    * estimate by the merge law. Name-based (`div` needs an attribute);
    * an EMPTY mins array estimates NULL — the no-values group, matching
    * the batch card's absent-leg left join. */
  def kmvEstimate(minsCol: String, k: Int): Column =
    when(size(col(minsCol)) === 0, lit(null).cast("long"))
      .when(size(col(minsCol)) < k, size(col(minsCol)).cast("long"))
      .otherwise(expr(
        s"(CAST(${k - 1} AS DECIMAL(28,0)) * CAST(1152921504606846976 AS DECIMAL(28,0)))" +
          s" div element_at($minsCol, $k)"))

  /** KMV SET ALGEBRA — pairwise distinct-set overlap estimated from the
    * groups' sketches alone (Beyer et al.; the theta-sketch idea): for
    * every group pair (ga < gb), the union's k smallest hashes are a
    * subset of sketchA ∪ sketchB (each side holds its own k smallest),
    * so the union sketch — and from it est_union — computes exactly from
    * stored state; the Jaccard estimator is the fraction of the union's
    * top-k also present in BOTH sketches, and est_inter = (inter_topk ·
    * est_union) div min(n_union_kept, k) stays in integer arithmetic
    * (hash-checkable). Groups smaller than k short-circuit to EXACT
    * intersection counts (the sketch IS the set). At scale this is the
    * audience-overlap / cross-contamination query answered without
    * revisiting raw data: one sketch table, pairwise array ops on
    * k-sized state.
    *
    * Returns (grp_a, grp_b, n_union_kept, union_kth, inter_topk,
    * est_union, est_inter). */
  def sketchOverlap(df: DataFrame, group: Column, value: Column,
      k: Int = 256): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val sk = df.select(group.as("grp"), hash60(value).as("__h"))
      .filter(col("__h").isNotNull)
      .groupBy(col("grp"))
      .agg(kmv(k)(col("__h")).as("__mins"))
    val a = sk.select(col("grp").as("grp_a"), col("__mins").as("__ma"))
    val b = sk.select(col("grp").as("grp_b"), col("__mins").as("__mb"))
    a.join(b, col("grp_a") < col("grp_b"))
      .withColumn("__u",
        expr(s"slice(array_sort(array_distinct(concat(__ma, __mb))), 1, $k)"))
      .withColumn("__nu", size(col("__u")).cast("long"))
      .withColumn("__kth", expr("element_at(__u, size(__u))"))
      .withColumn("__ni",
        expr("size(filter(array_intersect(__ma, __mb), x -> x <= __kth))")
          .cast("long"))
      .withColumn("__eu",
        when(col("__nu") < k, col("__nu"))
          .otherwise(expr(
            s"(CAST(${k - 1} AS DECIMAL(28,0)) * CAST(1152921504606846976 AS DECIMAL(28,0)))" +
              s" div element_at(__u, $k)")))
      .select(col("grp_a"), col("grp_b"),
        col("__nu").as("n_union_kept"), col("__kth").as("union_kth"),
        col("__ni").as("inter_topk"), col("__eu").as("est_union"),
        expr(s"(__ni * __eu) div least(__nu, ${k}L)").as("est_inter"))
  }

  /** [[distinctEstimate]] computed the WAREHOUSE way: per-(group, shard)
    * sketches first, then [[kmvMerge]] rolls shards up per group. By the
    * mergeability law the result is bit-identical to the direct
    * single-pass sketch — which is exactly how it's oracle-checked
    * (q111's SQL computes the direct whole-group sketch; a hash match
    * PROVES merge ≡ union on real data). At scale the first level is the
    * once-per-ingest sketch table; the second runs on sketch-sized rows
    * only. */
  def shardedDistinctEstimate(df: DataFrame, group: Column, value: Column,
      shard: Column, k: Int = 256): DataFrame = {
    require(k >= 2, "k must be >= 2")
    df.select(group.as("grp"), shard.as("__s"), hash60(value).as("__h"))
      .filter(col("__h").isNotNull)
      .groupBy(col("grp"), col("__s"))
      .agg(kmv(k)(col("__h")).as("__pmins"))
      .groupBy(col("grp"))
      .agg(kmvMerge(k)(col("__pmins")).as("__mins"))
      .select(estimateProjection(k): _*)
  }

  // ------------------------------------------------------------------
  // COUNT-MIN SKETCH — approximate per-item FREQUENCIES in fixed
  // depth×width state (Cormode & Muthukrishnan), the frequency
  // complement of KMV's cardinality sketch. Exact per-item counts
  // shuffle every distinct item; the CMS shuffles at most depth·width
  // pre-aggregated cells per map partition whatever the item universe
  // (heavy-hitter monitoring over a 100 TB token stream in kilobytes
  // of state). Estimates only ever OVER-count (each cell is a sum over
  // the item plus its hash collisions; min over depth rows picks the
  // least-collided one), and the sketch is ADDITIVE: cell-wise sum of
  // two sketches ≡ the sketch of the concatenated streams — the same
  // warehouse-rollup law as [[kmvMerge]], which is what lets per-shard
  // / per-day CMS tables fold into any coarser grain (and lets a
  // streaming ingest maintain one via additive merge) without
  // revisiting raw data. All hashing is the portable md5 idiom, so the
  // sketch — cells and estimates — hash-checks against a SQL oracle.
  // ------------------------------------------------------------------

  /** Row-`r` cell position of `item` in a width-`width` CMS row:
    * the [[hash60]] of `"r:item"` mod width (md5-salted per row — depth
    * independent hash functions from one primitive; DuckDB:
    * ('0x' || substr(md5(r || ':' || item), 1, 15))::UBIGINT % width).
    * The 60-bit prefix is non-negative, so `%` needs no pmod. */
  def cmsPos(r: Int, item: Column, width: Int): Column =
    conv(substring(md5(concat(lit(s"$r:"), item.cast("string"))), 1, 15),
      16, 10).cast("long") % width

  /** The CMS cell table of an item stream: (r, c, cnt) with
    * r ∈ [0, depth), c ∈ [0, width), cnt = Σ weight of items hashing
    * there — at most depth·width rows however many items. One scan
    * computes all depth positions fused (`posexplode` of the position
    * array), and the groupBy partial-aggregates map-side, so the
    * shuffle carries ≤ depth·width·partitions cells, never the stream.
    * Null items don't count (no row). `weight` defaults to 1 per row;
    * pass a count column to sketch pre-aggregated data. */
  def cmsCells(df: DataFrame, item: Column, depth: Int, width: Int,
      weight: Column = lit(1L)): DataFrame = {
    require(depth >= 1, "depth must be >= 1")
    require(width >= 2, "width must be >= 2")
    val base = df
      .select(item.cast("string").as("__it"), weight.cast("long").as("__w"))
      .filter(col("__it").isNotNull)
    val positions = array((0 until depth).map(r =>
      cmsPos(r, col("__it"), width)): _*)
    base.select(col("__w"), posexplode(positions).as(Seq("r", "c")))
      .groupBy(col("r"), col("c"))
      .agg(sum(col("__w")).as("cnt"))
  }

  /** Cell-wise additive merge: the sketch of the union stream from the
    * shards' sketches. Runs on sketch-sized frames only (≤ depth·width
    * rows each) — the rollup leg of the mergeability law, proven
    * bit-identical to the direct sketch by spec and (end-to-end, via a
    * streaming ingest) by the driver oracle. */
  def cmsMerge(shards: DataFrame*): DataFrame =
    shards.reduce(_.unionByName(_))
      .groupBy(col("r"), col("c"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-query estimates for `queries`' items against a cell table:
    * (item, est) with est = min over the depth rows of the item's cell
    * count (0 where a cell is absent — an item the sketch never saw).
    * est ≥ the item's true count ALWAYS (the one-sided CMS guarantee;
    * spec-pinned). The cell table is depth·width rows, so it broadcasts:
    * the probe is a scan-fused position explode + broadcast join —
    * query cost scales with |queries|, never with the sketched stream. */
  def cmsEstimate(cells: DataFrame, queries: DataFrame, item: Column,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1, "depth must be >= 1")
    require(width >= 2, "width must be >= 2")
    val q = queries.select(item.cast("string").as("__it"))
      .filter(col("__it").isNotNull).distinct()
    val positions = array((0 until depth).map(r =>
      cmsPos(r, col("__it"), width)): _*)
    q.select(col("__it"), posexplode(positions).as(Seq("r", "c")))
      .join(broadcast(cells), Seq("r", "c"), "left")
      .groupBy(col("__it"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
      .withColumnRenamed("__it", "item")
  }
}
