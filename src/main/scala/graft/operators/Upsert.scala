package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{coalesce, col, lit, row_number, sum, when, xxhash64}

/** Upsert semantics for a parquet warehouse — the reference's
  * `ON CONFLICT (pk) DO UPDATE` sinks (etl_snapshot_topn.py:374-453,
  * SURVEY S8). After a full TRUNCATE those degrade to plain inserts, but
  * an *incremental* refresh (the snapshot pipeline run on only new
  * battlelogs) needs real merge: new rows win, unmatched old rows survive.
  *
  * On a transactional table format this is `MERGE INTO`; on plain parquet
  * it is read → anti-join → union → rewrite. The rewrite is full-table —
  * correct at any scale but O(table); partition the table and merge only
  * affected partitions when update keys are partition-aligned.
  */
object Upsert {

  /** Merge `updates` into `current` by `keys`: every update row replaces
    * its match; unmatched current rows pass through. Pure plan — one
    * anti-join (broadcast when updates are small) + union.
    *
    * `ON CONFLICT (pk) DO UPDATE` requires the merged table to stay
    * key-unique, so duplicate keys WITHIN the updates batch are collapsed
    * first: when `version` is given the row with the highest version wins
    * (last-wins); rows TYING on the highest version are broken by a stable
    * content hash over all columns, so the winner is deterministic across
    * runs and partitionings (exact-copy ties hash identically — any
    * representative is the same row). Without `version` an arbitrary
    * representative per key is kept (`dropDuplicates`) — fine only when
    * batch duplicates are exact copies. */
  def upsert(current: DataFrame, updates: DataFrame, keys: Seq[String],
      version: Option[Column] = None): DataFrame = {
    val deduped = version match {
      case Some(v) =>
        // temp-column name guaranteed absent from the updates schema
        val rn = Iterator.iterate("__rn")(_ + "_")
          .dropWhile(updates.columns.contains).next()
        val tieBreak = xxhash64(updates.columns.map(col).toSeq: _*)
        val w = Window.partitionBy(keys.map(col): _*).orderBy(v.desc, tieBreak.asc)
        updates.withColumn(rn, row_number().over(w))
          .filter(col(rn) === 1).drop(rn)
      case None => updates.dropDuplicates(keys)
    }
    deduped.unionByName(current.join(deduped, keys, "left_anti"))
  }

  /** Additive rollup merge: combine two aggregates of DISJOINT inputs by
    * summing their metric columns per key — the incremental-refresh form
    * of the reference's recomputed rollup tables (meta_deck_types etc.,
    * SURVEY A1-A6). Where [[upsert]] REPLACES a matched row (dimension
    * semantics), count/sum rollups must ADD: `rollup(A ∪ B) ==
    * additiveMerge(rollup(A), rollup(B))` for any associative metrics —
    * the property that lets a 100 TB pipeline aggregate only the new
    * partition and fold it into the standing rollup instead of rescanning
    * history. One union + one partial-aggregating groupBy; inputs must be
    * aggregates of disjoint row sets or overlapping rows double-count. */
  def additiveMerge(current: DataFrame, updates: DataFrame,
      keys: Seq[String], metrics: Seq[String]): DataFrame = {
    val aggs = metrics.map(m => sum(col(m)).as(m))
    current.unionByName(updates)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Snapshot diff — change-data capture between two versions of a
    * keyed table: one FULL OUTER join on the keys classifies every key as
    * `added` (new only), `removed` (old only) or `changed` (both sides,
    * any common non-key column differs under null-safe equality);
    * unchanged keys are dropped. This is the audit/incremental-publish
    * primitive: feed `changed` ∪ `added` to [[upsert]] and `removed` to a
    * delete pass instead of republishing a full snapshot.
    *
    * One key-partitioned shuffle join; the column comparison is a per-row
    * conjunction, no second pass. Columns present on only one side are
    * ignored (schema evolution is a separate concern — diff what both
    * versions share). Returns (keys*, change_type). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keys: Seq[String]): DataFrame = {
    // __o/__n are this operator's side-presence markers; an input that
    // already carries them would have its column silently overwritten AND
    // the constant marker would enter the payload comparison — same
    // reserved-name discipline as __salt/__rn elsewhere.
    val reserved = Set("__o", "__n")
    val clash = (oldDf.columns ++ newDf.columns).filter(reserved.contains).distinct
    require(clash.isEmpty,
      s"snapshotDiff inputs must not carry reserved columns ${clash.mkString(", ")}")
    val shared = oldDf.columns.toSeq.intersect(newDf.columns.toSeq)
      .filterNot(keys.contains)
    // side-presence markers, not key nullness: a row whose KEY column is
    // genuinely NULL never joins (null ≠ null), and classifying on the
    // key would flip it to the wrong side ("added" for an old-only row);
    // a non-null marker column is authoritative about which side exists.
    val o = oldDf.select((keys ++ shared).map(col): _*)
      .withColumn("__o", lit(true)).alias("o")
    val n = newDf.select((keys ++ shared).map(col): _*)
      .withColumn("__n", lit(true)).alias("n")
    val keyCond = keys.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _)
    val sameRow = shared
      .map(c => col(s"o.$c") <=> col(s"n.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, keyCond, "full_outer")
      .withColumn("change_type",
        when(col("o.__o").isNull, "added")
          .when(col("n.__n").isNull, "removed")
          .when(!sameRow, "changed"))
      .filter(col("change_type").isNotNull)
      .select(keys.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k))
        :+ col("change_type"): _*)
  }

  /** Upsert against a parquet path with a staged write: merge into
    * `<path>__staged`, then swap directories. The swap is atomic on a
    * POSIX filesystem; on object stores use a manifest/table format
    * instead — this is the local-warehouse shape of the idea. */
  def upsertParquet(spark: SparkSession, path: String, updates: DataFrame,
      keys: Seq[String]): Unit =
    mergeParquet(spark, path, updates)(upsert(_, _, keys))

  /** Marker file recording which batch ids have been folded into a rollup
    * table. It lives INSIDE the table directory: Spark's file index skips
    * `_`-prefixed files on read, and the staged-swap rename moves it
    * atomically WITH the data it describes — the applied-set can never
    * disagree with the table contents, which a sidecar path could after a
    * crash between two writes. */
  private val AppliedMarker = "_graft_applied_batches"

  /** Batch ids already applied to the table at `path` (empty when the
    * table or marker doesn't exist). */
  def appliedBatches(path: String): Set[Long] =
    Fs.readText(s"$path/$AppliedMarker") match {
      case None => Set.empty
      case Some(text) =>
        text.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
          .map(_.toLong).toSet
    }

  private def writeApplied(dir: String, ids: Set[Long]): Unit =
    Fs.writeText(s"$dir/$AppliedMarker",
      ids.toSeq.sorted.mkString("", "\n", "\n"))

  /** Merge `updates` into the parquet table at `path` with `combine`
    * (e.g. [[upsert]] for replace semantics, [[additiveMerge]] for
    * rollups), via the staged write-swap with crash recovery. `combine`
    * is skipped when no table exists yet — `updates` becomes the table.
    *
    * `batchId` makes the merge IDEMPOTENT per batch: a batch id already
    * recorded in the table's applied-marker is skipped outright, so a
    * replayed `foreachBatch` (crash recovery, full stream re-run) cannot
    * double-count an additive rollup. The marker is written into the
    * staged directory before the swap, so data + applied-set commit in
    * the same rename. */
  /** Crash recovery for the staged write-swap, runnable on its own —
    * [[Fs.recoverStagedSwap]], kept here as the name every merge caller
    * historically imports. Any caller that READS the table before
    * merging (e.g. [[Maintenance.compact]] sizing the rewrite) must run
    * this first, or a recoverable table looks missing. */
  def recoverStagedSwap(path: String): Unit = Fs.recoverStagedSwap(path)

  def mergeParquet(spark: SparkSession, path: String, updates: DataFrame,
      batchId: Option[Long] = None)(
      combine: (DataFrame, DataFrame) => DataFrame): Unit =
    mergeParquetBatches(spark, path, updates, batchId.toSet)(combine)

  /** [[mergeParquet]] for a GROUP COMMIT: one staged swap records a whole
    * SET of batch ids (a [[graft.streaming.StateFold]] flush covering
    * every batch folded since the last one). Skipped only when every id
    * is already applied — a replayed flush; a PARTIAL overlap still
    * writes (the in-memory state is the union, and replace-semantics
    * callers pass the whole table), recording the full union of markers.
    * An empty id set is an unconditional merge (the non-streaming
    * callers' shape). */
  def mergeParquetBatches(spark: SparkSession, path: String,
      updates: DataFrame, batchIds: Set[Long])(
      combine: (DataFrame, DataFrame) => DataFrame): Unit = {
    Fs.recoverStagedSwap(path)
    val applied = appliedBatches(path)
    if (batchIds.nonEmpty && (batchIds -- applied).isEmpty)
      return // replayed batch/flush: no-op
    Fs.stagedSwap(path) { staged =>
      val merged =
        if (Fs.exists(path)) combine(spark.read.parquet(path), updates)
        else updates
      merged.write.mode(SaveMode.Overwrite).parquet(staged)
      // the applied-set survives every rewrite (marker files don't survive
      // SaveMode.Overwrite, so it is re-written into the staged dir)
      val nextApplied = applied ++ batchIds
      if (nextApplied.nonEmpty) writeApplied(staged, nextApplied)
    }
  }
}
