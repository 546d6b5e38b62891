package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileStatus, FileSystem, FileUtil, Options, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem primitives for the artifact lifecycle (staged write-swaps,
  * tree sizing, marker files), on the Hadoop [[FileSystem]] API — so every
  * swap site resolves the SAME filesystem Spark's own reads and writes
  * use (`file://` locally, `hdfs://` on a cluster) instead of assuming
  * `java.io.File`. On local disk and HDFS a directory rename is a single
  * atomic metadata operation, which is what the `__staged`/`__old` swap
  * discipline relies on.
  *
  * OBJECT-STORE CAVEAT: on S3/GCS-style stores `rename` is copy-then-
  * delete — neither atomic nor cheap — so the swap discipline does NOT
  * give crash-atomicity there. The deployment strategy for object stores
  * is commit-by-pointer: write each table generation to a fresh
  * immutable directory (`<table>/gen-<n>/`) and flip a small pointer
  * file (one PUT, atomic on every store) to the new generation, never
  * renaming data files — i.e. a manifest/table format (Iceberg-style
  * metadata pointer) rather than directory swaps. These helpers
  * intentionally fail loudly rather than fall back silently: a rename
  * that an object store implements as a partial copy surfaces as a
  * failed/slow swap, not silent corruption, because the target is only
  * ever replaced by a completed rename.
  */
object Fs {

  /** Tombstone-table subdir of an index artifact (`<index>/_tombstones`):
    * the DELETE verb of the artifact lifecycle. `_`-prefixed so Spark's
    * hidden-file rule keeps it invisible to every data listing of the
    * index tree — probes must opt in by reading the path explicitly.
    * Writes are blind appends of id rows (O(|deleted|), never touching
    * index data); readers apply it as an anti-join, so replayed deletes
    * and duplicate rows are harmless (set semantics); compaction folds
    * it in physically and drops the table. */
  val TombstonesSubdir = "_tombstones"

  /** The Hadoop configuration in effect: the active Spark session's (so
    * `fs.defaultFS`, credentials and mount tables match the engine's own
    * I/O), or a vanilla one when no session is up (pure-path utilities
    * in tests). */
  private def conf: Configuration =
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** Resolve `path` to its owning FileSystem + qualified Path. */
  def resolve(path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(conf), p)
  }

  def exists(path: String): Boolean = {
    val (fs, p) = resolve(path)
    fs.exists(p)
  }

  def isDirectory(path: String): Boolean = {
    val (fs, p) = resolve(path)
    fs.exists(p) && fs.getFileStatus(p).isDirectory
  }

  /** Recursive delete; no-op when absent. */
  def rmTree(path: String): Unit = {
    val (fs, p) = resolve(path)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Rename `src` → `dst`, refusing when `dst` already exists (Hadoop's
    * `rename` would MOVE INTO an existing directory, HDFS-mv-style —
    * the opposite of what a swap wants; the java.io contract this
    * replaces failed in that case, and every swap site pre-clears its
    * destination). Returns false on refusal or filesystem failure. */
  def rename(src: String, dst: String): Boolean = {
    val (fs, s) = resolve(src)
    val d = new Path(dst)
    if (fs.exists(d)) false else fs.rename(s, d)
  }

  /** Atomically REPLACE the file at `dst` with the file at `src` — the
    * pointer-flip primitive. Unlike [[rename]], an existing destination
    * is overwritten in ONE metadata operation, so a concurrent reader
    * observes the old file or the new, never a missing one. Local paths
    * go through java.nio `ATOMIC_MOVE` (POSIX rename(2) overwrites
    * atomically — the Hadoop local-FS shim would degrade OVERWRITE to
    * delete-then-rename, reintroducing the no-file window this exists
    * to close); every other scheme goes through
    * `FileContext.rename(OVERWRITE)`, which HDFS implements as a single
    * atomic namespace op and object stores as one small-object PUT
    * (atomic replace) plus a delete of the source — in no case is `dst`
    * ever absent. Files only: directory swaps stay on the
    * [[stagedSwap]] discipline. */
  def renameOverwrite(src: String, dst: String): Unit = {
    val s = new Path(src)
    val scheme = s.toUri.getScheme
    if (scheme == null || scheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(new Path(src).toUri.getPath),
        java.nio.file.Paths.get(new Path(dst).toUri.getPath),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ()
    } else {
      val fc = FileContext.getFileContext(s.toUri, conf)
      fc.rename(s, new Path(dst), Options.Rename.OVERWRITE)
    }
  }

  /** Recursive copy `src` → `dst` (same filesystem), refusing an
    * existing destination — the carry primitive [[stagedSwap]] uses for
    * `keepSubdirs`: copying (not moving) means the ORIGINAL never
    * leaves the old tree until the swap's final rename commits, so a
    * crash at any point in the carry loses nothing. Returns false on
    * refusal or filesystem failure. */
  def copyTree(src: String, dst: String): Boolean = {
    val (fs, s) = resolve(src)
    val d = new Path(dst)
    if (fs.exists(d)) false
    else FileUtil.copy(fs, s, fs, d, /*deleteSource=*/ false, conf)
  }

  /** Data bytes in the tree at `path`: recursive, skipping `_`/`.`-
    * prefixed names (Spark's hidden-file rule) at every level. 0 when
    * absent. */
  def dataBytes(path: String): Long = {
    val (fs, p) = resolve(path)
    def walk(st: FileStatus): Long =
      if (st.getPath.getName.startsWith("_") ||
          st.getPath.getName.startsWith(".")) 0L
      else if (st.isDirectory) fs.listStatus(st.getPath).map(walk).sum
      else st.getLen
    if (!fs.exists(p)) 0L else fs.listStatus(p).map(walk).sum
  }

  /** Top-level entry names under `path` (empty when absent). */
  def listNames(path: String): Seq[String] = {
    val (fs, p) = resolve(path)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName).toSeq
  }

  /** Write `text` to `path` atomically enough for a marker INSIDE a
    * staged directory (the enclosing swap rename is the commit). */
  def writeText(path: String, text: String): Unit = {
    val (fs, p) = resolve(path)
    val out = fs.create(p, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read `path` as UTF-8 text; None when absent. */
  def readText(path: String): Option[String] = {
    val (fs, p) = resolve(path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  /** Generation directory prefix under a pointer-committed artifact
    * root: `<root>/gen-<n>/` trees are immutable-once-published (swap
    * verbs write a NEW generation; blind-append verbs — tombstones,
    * streamed assignments — only ever ADD files, which is a single
    * object PUT per file and safe on every store). */
  val GenPrefix = "gen-"

  /** Pointer file under a pointer-committed artifact root: one small
    * file naming the current generation. `_`-prefixed so Spark data
    * listings skip it. */
  val PointerFile = "_current"

  /** The current generation's full path under `root`, when `root` is a
    * pointer-committed artifact: reads `<root>/_current`, validates the
    * named generation exists. None when there is no pointer (a plain
    * directory artifact — callers fall back to `root` itself, so every
    * probe accepts either layout). Fails loudly on a dangling pointer:
    * that is a torn publish or an over-eager prune, never a state to
    * silently read through. */
  def currentGeneration(root: String): Option[String] =
    readText(s"$root/$PointerFile").map { name =>
      val trimmed = name.trim
      require(trimmed.startsWith(GenPrefix) && !trimmed.contains("/"),
        s"pointer file $root/$PointerFile names '$trimmed', " +
          s"not a $GenPrefix<n> generation")
      val gen = s"$root/$trimmed"
      require(isDirectory(gen),
        s"pointer file $root/$PointerFile names missing generation " +
          s"$trimmed — torn publish or pruned-current; refusing to guess")
      gen
    }

  /** COMMIT-BY-POINTER publication — the object-store-safe counterpart
    * of [[stagedSwap]] (see the class scaladoc's caveat: object-store
    * rename is copy-then-delete, so directory swaps are not atomic
    * there). `write` materializes the next generation into a FRESH
    * immutable directory `<root>/gen-<n+1>/` — invisible to every
    * reader, whatever the store does with in-progress writes — and the
    * commit is flipping the pointer file, one small-object write.
    * A crash before the flip leaves the old generation current and the
    * half-written directory unreferenced (swept by the next publish's
    * garbage pass for its own n, or [[pruneGenerations]]); a crash
    * after the flip is a completed publish. Returns the new
    * generation's path.
    *
    * Pointer-write atomicity: written to `_current__tmp` then
    * [[renameOverwrite]]-d over the pointer — one atomic file-over-file
    * replace (POSIX rename(2) locally, FileContext OVERWRITE on HDFS,
    * one small-object PUT on stores), so a reader sees the old pointer
    * or the new; there is NO point at which the pointer is absent and a
    * concurrent [[currentGeneration]] would fall back to the
    * plain-directory layout. */
  def publishGeneration(root: String)(write: String => Unit): String = {
    val next = 1L + generationNumbers(root).foldLeft(0L)(math.max)
    val gen = s"$root/$GenPrefix$next"
    rmTree(gen) // an unreferenced half-write of OUR number, never current
    write(gen)
    require(isDirectory(gen),
      s"publishGeneration writer left no directory at $gen")
    val tmp = s"$root/${PointerFile}__tmp"
    writeText(tmp, s"$GenPrefix$next")
    renameOverwrite(tmp, s"$root/$PointerFile")
    gen
  }

  /** Garbage-collect generations: drop all OLDER than the current one
    * except the newest `keep` (retention for readers still holding the
    * previous pointer), and drop any NEWER than the current one (a
    * publish that died before its flip — never referenced, pure
    * garbage). Never touches the current generation or the pointer.
    * No-op on a plain (pointer-less) artifact. Single-writer
    * discipline, like every artifact mutation here: do not prune while
    * a publish is in flight, or its half-written generation is swept
    * from under it (the publish would fail loudly at its own
    * directory check, not corrupt anything — but it would fail). */
  def pruneGenerations(root: String, keep: Int = 1): Unit =
    currentGeneration(root).foreach { cur =>
      val curN = cur.substring(cur.lastIndexOf(GenPrefix) + GenPrefix.length).toLong
      val gens = generationNumbers(root)
      (gens.filter(_ < curN).sorted.reverse.drop(keep) ++ gens.filter(_ > curN))
        .foreach(n => rmTree(s"$root/$GenPrefix$n"))
    }

  private def generationNumbers(root: String): Seq[Long] =
    listNames(root).collect {
      case n if n.startsWith(GenPrefix) &&
          n.drop(GenPrefix.length).forall(_.isDigit) &&
          n.length > GenPrefix.length =>
        n.drop(GenPrefix.length).toLong
    }

  /** Crash recovery for a staged swap at `path`: a previous swap may have
    * died between its two renames. target missing + `__old` present =
    * died between the renames → the old table is the only copy; restore
    * it. target present + `__old` present = died after the swap → `__old`
    * is garbage (left for the next swap to clear). Idempotent. Any caller
    * that READS the table before swapping (sizing a rewrite) must run
    * this first, or a recoverable table looks missing. */
  def recoverStagedSwap(path: String): Unit =
    if (!exists(path) && exists(path + "__old")) {
      if (!rename(path + "__old", path))
        throw new java.io.IOException(
          s"could not recover $path from ${path}__old")
    }

  /** The staged write-swap discipline, shared by every artifact rewrite
    * (merge, compaction, rebuild): recover any earlier half-swap, clear
    * scratch, let `write` produce the new table at `<path>__staged`,
    * then swap it in — `path` → `__old`, carry `keepSubdirs` entries
    * over from the old tree untouched, `__staged` → `path`, drop
    * `__old`. A crash at any point either leaves the old table in place
    * or is repaired by the next call's recovery; the table is only ever
    * one complete generation or the other.
    *
    * `keepSubdirs` entries that exist in the old tree are COPIED into
    * the staged tree between the two renames (the
    * [[Maintenance.compactTree]] mid-stream contract: the current
    * micro-batch's own subdir must survive a fold without being
    * folded). Copied, not moved: the originals stay inside `__old`
    * until the final rename commits, so a crash anywhere in the carry —
    * or a mid-carry failure's restore of `__old` — loses nothing; the
    * next call's recovery restores a COMPLETE old tree, and its
    * `rmTree(__staged)` only ever discards copies. (A moved carry left
    * already-moved subdirs stranded in `__staged`, where the next
    * call's scratch-clear silently destroyed them — un-deleting
    * takedowns when the carried entry was `_tombstones`.) `write`
    * receives the staged path and must fully materialize the new
    * generation there.
    *
    * When no table exists yet the staged tree simply renames into place
    * (first write). */
  def stagedSwap(path: String, keepSubdirs: Set[String] = Set.empty)(
      write: String => Unit): Unit = {
    val staged = path + "__staged"
    val old = path + "__old"
    recoverStagedSwap(path)
    rmTree(staged)
    rmTree(old)
    write(staged)
    val hadTarget = exists(path)
    if (hadTarget && !rename(path, old))
      throw new java.io.IOException(s"could not stage out $path")
    if (hadTarget) keepSubdirs.foreach { name =>
      if (exists(s"$old/$name") && !copyTree(s"$old/$name", s"$staged/$name")) {
        rename(old, path)
        throw new java.io.IOException(s"could not carry $name over in $path")
      }
    }
    if (!rename(staged, path)) {
      if (hadTarget) rename(old, path)
      throw new java.io.IOException(s"could not swap $path")
    }
    rmTree(old)
  }
}
