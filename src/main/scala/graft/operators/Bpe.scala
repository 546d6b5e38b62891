package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** One distributed BPE merge round — the real subword vocab-build step
  * ([[Vocab]] builds the word-level table; this is the character-level
  * pass under it). Reference behavior: TopN-ClashRoyal-ETL-SQL-snapshot
  * has no tokenizer training; this is part of the engine's
  * training-data-pipeline extension surface (SURVEY.md §2.12).
  *
  * Round semantics (the classic Sennrich-et-al step, deterministic and
  * hence oracle-checkable for a fixed number of merges):
  *   1. Every distinct word starts as its character-symbol sequence.
  *   2. Adjacent symbol pairs are counted across the corpus, weighted by
  *      word frequency (overlapping positions each count, the standard
  *      per-position convention).
  *   3. The best pair is chosen by (count DESC, left ASC, right ASC) —
  *      a total order, so every engine picks the same pair.
  *   4. Each word is re-encoded by merging occurrences of the pair
  *      GREEDILY LEFT-TO-RIGHT: a merged symbol never re-merges within
  *      the round ("aaaa" + (a,a) → [aa, aa], not [aa, a, a]).
  *
  * Scale shape:
  *   - All heavy per-string work (pair explode, the re-encode fold) runs
  *     on the DISTINCT-WORD frame — vocab-sized, Zipf-bounded — never on
  *     the corpus. The corpus contributes one tokenize+explode and one
  *     groupBy(word) with map-side combine.
  *   - The chosen pair is a 1-row broadcast crossJoin (same pattern as
  *     [[Keywords]]' BM25 stats row).
  *   - The re-encode fold is the `aggregate` higher-order function —
  *     interpreted, not codegen, but over vocab-sized rows and
  *     word-length arrays that is bounded work; the corpus-sized path
  *     stays codegen'd.
  *   - The encoded-word join back to the corpus is Zipf-LEFT-skewed
  *     (hot words have postings-many left rows, one right row);
  *     `broadcastWords` = true broadcasts the vocab frame (safe for
  *     natural-language vocabs to ~10⁶ words; an uncapped web corpus'
  *     10⁷–10⁸ "words" outgrow it — same knob discipline as
  *     [[Vocab.encoded]]), false leaves AQE to pick and skew-split.
  *
  * Iterating the round N times IS the BPE trainer; each round is one
  * job over the vocab frame, so N merges cost N vocab-sized passes plus
  * the single corpus tokenize — the standard distributed formulation.
  *
  * Cache lifecycle (the [[Dedup]] convention): [[trainRounds]] and
  * [[mergeRound]] persist the corpus token frame for the duration of
  * the returned plan — callers running many operators in one session
  * free those blocks with `spark.catalog.clearCache()` once results are
  * materialized. [[train]]'s per-round checkpoints are dropped eagerly
  * inside the loop as each round supersedes the last; only the FINAL
  * round's blocks outlive the call (they back the returned frame) and
  * are freed when that frame is garbage-collected — or eagerly via
  * [[dropCheckpoint]]. `clearCache` does NOT cover RDD-level checkpoint
  * blocks, hence the explicit management here.
  */
object Bpe {

  /** Eagerly drop a `localCheckpoint`'ed frame's cached blocks (they
    * otherwise live until the backing RDD is garbage-collected;
    * `spark.catalog.clearCache()` only covers cached QUERIES). No-op on
    * non-checkpoint plans. */
  def dropCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Adjacent-pair counts over the symbol sequences of `words`
    * (word, freq): returns (l, r, cnt), cnt = Σ freq over positions. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(length(col("word")) > 1)
      .select(col("freq"), explode(transform(
        sequence(lit(1), length(col("word")) - 1),
        i => struct(col("word").substr(i, lit(1)).as("l"),
          col("word").substr(i + 1, lit(1)).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))

  /** The round's merge rule: the 1-row (l, r, cnt) frame chosen by
    * (cnt DESC, l ASC, r ASC). */
  def bestPair(pairs: DataFrame): DataFrame =
    pairs.orderBy(col("cnt").desc, col("l").asc, col("r").asc).limit(1)

  /** Words re-encoded under the 1-row `best` merge rule: (word, freq,
    * enc, n_sym) where `enc` is the space-joined symbol sequence after
    * the greedy left-to-right merge. The fold keeps the invariant that
    * `acc`'s LAST space-separated symbol is checked exactly — a longer
    * symbol merely ending in `l`'s characters never matches, and a
    * just-merged `l||r` can't re-merge because it no longer equals `l`. */
  def encodeWords(words: DataFrame, best: DataFrame): DataFrame =
    words.crossJoin(broadcast(best))
      .select(col("word"), col("freq"), aggregate(
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))),
        lit(""),
        (acc, x) => when(acc === "", x)
          .when(acc === col("l") && x === col("r"),
            concat(col("l"), col("r")))
          .when(acc.endsWith(concat(lit(" "), col("l"))) && x === col("r"),
            concat(acc.substr(lit(1), length(acc) - length(col("l"))),
              col("l"), col("r")))
          .otherwise(concat(acc, lit(" "), x))).as("enc"))
      .withColumn("n_sym", size(split(col("enc"), " ")).cast("long"))

  /** Adjacent-pair counts over already-encoded words (word, freq, enc):
    * the general-round form of [[pairCounts]] — symbols are the
    * space-separated units of `enc`, possibly multi-character. */
  def pairCountsEncoded(encodedWords: DataFrame): DataFrame =
    encodedWords
      .select(col("freq"), split(col("enc"), " ").as("syms"))
      .filter(size(col("syms")) > 1)
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("l"),
          element_at(col("syms"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))

  /** One greedy merge of the LITERAL rule (l, r) applied to encoded
    * words — the fold of [[encodeWords]] with the rule fixed, reusable
    * both for training rounds and for applying a learned merge table to
    * new text. */
  def applyMerge(encodedWords: DataFrame, l: String, r: String): DataFrame =
    encodedWords.withColumn("enc", aggregate(
      split(col("enc"), " "),
      lit(""),
      (acc, x) => when(acc === "", x)
        .when(acc === lit(l) && x === lit(r), lit(l + r))
        .when(acc.endsWith(lit(" " + l)) && x === lit(r),
          // Spark length()/substr() count CODEPOINTS — strip the left
          // symbol by its codepoint count, not java.lang.String.length
          // (a supplementary-plane symbol is 1 codepoint but 2 UTF-16
          // units; the UTF-16 count would eat the separator too)
          concat(acc.substr(lit(1),
              length(acc) - lit(l.codePointCount(0, l.length))),
            lit(l + r)))
        .otherwise(concat(acc, lit(" "), x))))

  /** The BPE TRAINER: `rounds` merge rounds over the corpus' distinct
    * words. Returns (merges, encodedWords): the ordered merge table
    * ((l, r, cnt) per round) and the final (word, freq, enc) frame.
    *
    * The per-round best pair is collected to the driver — ONE row per
    * round, the merge table IS driver-held metadata in every BPE
    * trainer (the same documented index-sized-collect exception as
    * [[Similarity]]'s codebook builds) — and re-applied as a literal
    * rule, so each round's plan is one vocab-sized aggregate plus one
    * vocab-sized fold. `localCheckpoint` truncates the growing fold
    * lineage each round, and each round's blocks are dropped as soon as
    * the next round's checkpoint materializes (object scaladoc's cache
    * lifecycle); N merges cost N vocab-sized passes and never touch the
    * corpus. Stops early (and drops the round) if no pair repeats (best
    * cnt < 2 — merging a count-1 pair learns noise). */
  def train(words: DataFrame, rounds: Int): (Seq[(String, String, Long)], DataFrame) = {
    require(rounds > 0, "rounds must be positive")
    var enc = words.select(col("word"), col("freq"),
      array_join(transform(sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1))), " ").as("enc"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    for (_ <- 1 to rounds if !done) {
      val top = bestPair(pairCountsEncoded(enc)).collect()
      if (top.isEmpty || top(0).getAs[Long]("cnt") < 2L) done = true
      else {
        val (l, r, c) = (top(0).getAs[String]("l"), top(0).getAs[String]("r"),
          top(0).getAs[Long]("cnt"))
        merges += ((l, r, c))
        // localCheckpoint is eager: the next round is materialized
        // before the superseded round's blocks are released
        val next = applyMerge(enc, l, r).localCheckpoint()
        dropCheckpoint(enc)
        enc = next
      }
    }
    (merges.toSeq, enc)
  }

  /** INFERENCE: the initial character encoding of `words` folded
    * through an ORDERED literal merge table — the apply-a-learned-
    * tokenizer path ([[train]] without the pair counting; each rule is
    * one vocab-sized [[applyMerge]] fold). Returns (word, freq, enc). */
  def applyMerges(words: DataFrame,
      rules: Seq[(String, String)]): DataFrame =
    rules.foldLeft(
      words.select(col("word"), col("freq"),
        array_join(transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))), " ").as("enc"))) {
      case (enc, (l, r)) => applyMerge(enc, l, r)
    }

  /** [[applyMerges]] as ONE native expression per word
    * ([[graft.expressions.BpeEncode]]) — the production-inference form:
    * the fold builds one Catalyst `aggregate` PER RULE, so a real
    * tokenizer's tens of thousands of merges would compile (and re-scan
    * every word through) tens of thousands of chained folds; the native
    * expression holds the table as state — one plan node at any size,
    * one O(rules × |word|) JVM loop per word. Byte-identical to
    * [[applyMerges]] (spec-pinned). */
  def applyMergesNative(words: DataFrame,
      rules: Seq[(String, String)]): DataFrame =
    words.select(col("word"), col("freq"),
      graft.expressions.BpeEncode(col("word"), rules).as("enc"))

  /** Corpus encoding under a FIXED merge table, rolled up per document:
    * (doc_id, n_tok, n_sym, enc_md5) — [[trainRounds]]' artifact shape
    * with the training replaced by [[applyMerges]] over caller-supplied
    * rules (the production inference pass: train once, encode every
    * corpus snapshot after). Same scale shape: heavy work on the
    * distinct-word frame, corpus joined once ([[Dedup]]-convention
    * cache lifecycle — the token frame persists for the plan's
    * duration; clearCache() frees it). */
  def encodeCorpus(df: DataFrame, id: Column, text: Column,
      rules: Seq[(String, String)],
      broadcastWords: Boolean = false): DataFrame = {
    val toks = Parallelism.ensureMinPartitions(
        df.select(id.as("doc_id"), T.tokens(lower(text)).as("toks")),
        col("doc_id"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(col("toks")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("word"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val words = toks.groupBy(col("word")).agg(count(lit(1)).as("freq"))
    // the native single-expression encode (byte-identical to the fold;
    // the fold's per-rule plans don't survive production rule tables)
    val enc = applyMergesNative(words, rules)
      .withColumn("n_sym", size(split(col("enc"), " ")).cast("long"))
      .select(col("word"), col("enc"), col("n_sym"))
    toks.join(if (broadcastWords) broadcast(enc) else enc, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(col("n_sym")).as("n_sym"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("enc")))),
          s => s.getField("enc")), " ").cast("binary")).as("enc_md5"))
  }

  /** `rounds`-round training rolled up per document: (doc_id, n_tok,
    * n_sym, enc_md5, rules) — symbol counts and the md5 of the doc's
    * encoded symbol stream after ALL merges, plus the ordered merge
    * table rendered as one constant "l+r:cnt,…" column so the artifact
    * pins the table and the checksums together. */
  def trainRounds(df: DataFrame, id: Column, text: Column, rounds: Int,
      broadcastWords: Boolean = false): DataFrame = {
    val toks = Parallelism.ensureMinPartitions(
        df.select(id.as("doc_id"), T.tokens(lower(text)).as("toks")),
        col("doc_id"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(col("toks")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("word"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val words = toks.groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val (merges, encoded) = train(words, rounds)
    // the `rules` column (and any generated oracle mirroring it) encodes
    // EXACTLY `rounds` merges — a corpus that saturates earlier would
    // silently produce a shorter table and masquerade as an engine
    // mismatch, so fail loudly instead; callers wanting the early-stop
    // behavior use train() directly
    if (merges.length != rounds) throw new IllegalStateException(
      s"Bpe.trainRounds: corpus saturated after ${merges.length} of $rounds" +
        " merge rounds (best pair count < 2); lower `rounds` or use" +
        " Bpe.train, whose contract permits early stop")
    val rules = merges.map { case (l, r, c) => s"$l+$r:$c" }.mkString(",")
    val enc = encoded
      .withColumn("n_sym", size(split(col("enc"), " ")).cast("long"))
      .select(col("word"), col("enc"), col("n_sym"))
    toks.join(if (broadcastWords) broadcast(enc) else enc, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(col("n_sym")).as("n_sym"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("enc")))),
          s => s.getField("enc")), " ").cast("binary")).as("enc_md5"))
      .withColumn("rules", lit(rules))
  }

  /** The MATERIALIZABLE tokenizer — train once, encode every corpus
    * snapshot after, across JOBS: the ordered merge table lands as a
    * parquet artifact (rank, l, r, cnt) with the training round count
    * embedded (`p_rounds`, the [[Dedup.nearDupIndex]] versioned-artifact
    * discipline — an encode under the wrong tokenizer generation should
    * fail loudly, not silently re-tokenize). Production tokenizers are
    * exactly this shape (an ordered merge list shipped beside the
    * corpus); at 100 TB the trainer runs once per tokenizer version and
    * every encode pass is [[encodeCorpus]] under the loaded table — the
    * corpus never re-trains. Fails loudly if the corpus saturates before
    * `rounds` merges (the [[trainRounds]] contract). */
  def writeTokenizer(df: DataFrame, id: Column, text: Column, rounds: Int,
      path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = Parallelism.ensureMinPartitions(
        df.select(id.as("doc_id"), T.tokens(lower(text)).as("toks")),
        col("doc_id"))
      .filter(size(col("toks")) > 0)
      .select(explode(col("toks")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val (merges, encoded) = train(words, rounds)
    dropCheckpoint(encoded)
    if (merges.length != rounds) throw new IllegalStateException(
      s"Bpe.writeTokenizer: corpus saturated after ${merges.length} of" +
        s" $rounds merge rounds (best pair count < 2); lower `rounds`")
    merges.zipWithIndex
      .map { case ((l, r, c), i) => (i + 1, l, r, c, rounds) }
      .toDF("rank", "l", "r", "cnt", "p_rounds")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** The artifact's ordered merge rules, read back — rules-count rows,
    * the bounded driver-side half of every encode (the readCentroids
    * class). The versioned-artifact fail-fasts that make "wrong
    * tokenizer generation" loud instead of a silent mis-tokenization:
    * requires a parameter-carrying artifact holding exactly ONE
    * `p_rounds` generation, a complete rule table (rows = p_rounds),
    * and — when the caller pins `expectedRounds` (a job built against a
    * specific tokenizer version probing a path that may have been
    * re-trained since) — that generation to match. */
  def loadTokenizer(spark: org.apache.spark.sql.SparkSession,
      path: String, expectedRounds: Option[Int] = None): Seq[(String, String)] = {
    val t = spark.read.parquet(path)
    require(t.columns.contains("p_rounds"),
      s"tokenizer artifact at $path carries no p_rounds — not a" +
        " writeTokenizer artifact")
    val rows = t.orderBy(col("rank")).collect()
    require(rows.nonEmpty, s"tokenizer artifact at $path is empty")
    val gens = rows.map(_.getAs[Int]("p_rounds")).distinct
    require(gens.length == 1,
      s"tokenizer artifact at $path holds ${gens.length} p_rounds " +
        "generations — a single generation is required; rebuild it")
    require(rows.length == gens.head,
      s"tokenizer artifact at $path holds ${rows.length} rules for a " +
        s"${gens.head}-round generation — incomplete or duplicated table")
    expectedRounds.foreach(e => require(gens.head == e,
      s"tokenizer artifact at $path is the ${gens.head}-round generation " +
        s"but the caller was built against $e rounds — encoding under " +
        "the wrong tokenizer silently mis-tokenizes; retrain or repoint"))
    rows.map(r => (r.getAs[String]("l"), r.getAs[String]("r"))).toSeq
  }

  /** [[encodeCorpus]] under a stored tokenizer — the cross-job inference
    * pass: load the ordered merges (bounded collect, generation
    * fail-fasts included), encode the corpus through the native
    * single-expression path. */
  def encodeCorpusWith(df: DataFrame, id: Column, text: Column,
      tokenizerPath: String, expectedRounds: Option[Int] = None): DataFrame =
    encodeCorpus(df, id, text,
      loadTokenizer(df.sparkSession, tokenizerPath, expectedRounds))

  /** One full merge round over a document corpus: tokenize, count pairs,
    * pick the rule, re-encode, and roll up per document. Returns
    * (doc_id, n_tok, n_sym, enc_md5, pair_left, pair_right, pair_count):
    * token/symbol counts, md5 of the doc's space-joined encoded symbol
    * stream in token order, and the (constant) chosen rule — the merge
    * table and the re-encoded corpus checksums in one hash-checkable
    * artifact. */
  def mergeRound(df: DataFrame, id: Column, text: Column,
      broadcastWords: Boolean = false): DataFrame = {
    val toks = Parallelism.ensureMinPartitions(
        df.select(id.as("doc_id"), T.tokens(lower(text)).as("toks")),
        col("doc_id"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(col("toks")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("word"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val words = toks.groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val best = bestPair(pairCounts(words))
    val enc = encodeWords(words, best).select(col("word"), col("enc"), col("n_sym"))
    val joined = toks.join(
      if (broadcastWords) broadcast(enc) else enc, Seq("word"))
    joined.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(col("n_sym")).as("n_sym"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("enc")))),
          s => s.getField("enc")), " ").cast("binary")).as("enc_md5"))
      .crossJoin(broadcast(best))
      .select(col("doc_id"), col("n_tok"), col("n_sym"), col("enc_md5"),
        col("l").as("pair_left"), col("r").as("pair_right"),
        col("cnt").as("pair_count"))
  }
}
