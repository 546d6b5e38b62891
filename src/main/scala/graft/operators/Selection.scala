package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Importance-resampling data selection — the published DSIR move (Xie
  * et al. 2023, "Data Selection for Language Models via Importance
  * Resampling"): fit cheap bag-of-hashed-n-gram language models over a
  * small TARGET corpus (the distribution you want) and the big RAW
  * corpus (what you have), weight every raw document by the
  * log-likelihood RATIO of the two models, then sample without
  * replacement with probability ∝ weight via the Gumbel top-k trick.
  * [[QualityModel]] scores "is this good"; this scores "is this LIKE
  * my target" — the complementary selection axis every pretraining
  * pipeline runs (domain adaptation, language targeting).
  *
  * Engine shape (the 100 TB points):
  *   - the FIT is two hashed-count aggregations: one scan per corpus,
  *     map-side combined to ≤ 2·nBuckets cells ([[Sketch.cmsPos]]
  *     buckets — the same portable primitive as the CMS/Bloom/
  *     quality-model family), so the shuffle carries the bucket table,
  *     never the token stream, and the "model" is 2·nBuckets longs
  *     whatever the corpus size;
  *   - the fitted log-ratio table rides the SCORING plan as one array
  *     literal (the PQ-codebook / Bloom-bits idiom) and each document's
  *     weight is an `aggregate` fold over its token array — scoring is
  *     a zero-join, zero-shuffle projection, exactly what you want on
  *     the 100 TB side of the pipe;
  *   - INTEGER micro log-weights: each bucket's log-ratio is rounded
  *     ONCE (driver-side, micros) so per-document sums are exact long
  *     arithmetic — order-independent, hash-checkable against a SQL
  *     oracle (a float log-sum's low bits depend on fold order);
  *   - selection is a bounded take-ordered on the Gumbel-perturbed
  *     key, not a global sort.
  *
  * Feature map (documented contract, shared with [[QualityModel]]):
  * unigram BAG counts (salt 0) + DISTINCT-bigram presence (salt 1 —
  * [[T.tokenShingles]] emits distinct windows). Both n-gram models use
  * add-one smoothing over the nBuckets hashed vocabulary.
  *
  * Float caveat (same discipline as the cosine-threshold family): the
  * per-bucket λ = floor(1e6·ln(ratio) + 0.5) evaluates `ln` once per
  * bucket per fit — engines may differ in the last ulp of `ln`, which
  * flips a λ only when 1e6·ln(ratio) sits within ~1e-9 of a half
  * integer; the smoothed ratio itself is IEEE-exact (integer-valued
  * doubles, one multiply each side, one divide). Everything after the
  * rounding is exact integer arithmetic. */
object Selection {

  /** Hashed n-gram bucket counts of one corpus: ONE scan — tokens and
    * distinct bigrams fused into a single (salt, gram) explode — then a
    * groupBy whose map-side combine collapses each partition to
    * ≤ 2·nBuckets cells before the shuffle. Returns the two count
    * tables (unigram salt 0, bigram salt 1) plus totals, as driver
    * arrays: the fitted "model", 2·nBuckets longs however large the
    * corpus. */
  def hashedNgramCounts(docs: DataFrame, text: Column,
      nBuckets: Int): HashedNgramModel =
    fromCells(gramCells(docs, text, nBuckets).collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))), nBuckets)

  /** The fit as a FRAME: non-zero (salt, bucket, cnt) cells, ≤ 2·nBuckets
    * rows whatever the corpus — the distributed half
    * [[hashedNgramCounts]] collects, [[writeNgramModel]] persists, and
    * [[graft.streaming.ModelStream]] folds per micro-batch (the counts
    * are ADDITIVE over disjoint corpora, so per-batch partials merge
    * exactly like the CMS/card state). */
  private[graft] def gramCells(docs: DataFrame, text: Column,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, "nBuckets must be >= 2")
    docs
      .select(T.tokens(lower(text)).as("toks"))
      .select(col("toks"), T.tokenShingles(col("toks"), 2).as("bi"))
      .select(explode(concat(
        transform(col("toks"), g => struct(lit(0).as("s"), g.as("g"))),
        transform(col("bi"), g => struct(lit(1).as("s"), g.as("g")))))
        .as("f"))
      // Sketch.cmsPos with the salt as a COLUMN (same md5 bytes: the
      // literal "s:" prefix is just concat(s, ":"))
      .select(col("f.s").as("s"),
        (conv(substring(md5(concat(col("f.s").cast("string"), lit(":"),
          col("f.g"))), 1, 15), 16, 10).cast("long") % nBuckets).as("b"))
      .groupBy(col("s"), col("b")).agg(count(lit(1)).as("c"))
  }

  private def fromCells(cells: Seq[(Int, Long, Long)],
      nBuckets: Int): HashedNgramModel = {
    val uni = Array.fill(nBuckets)(0L)
    val bi = Array.fill(nBuckets)(0L)
    cells.foreach { case (s, b, c) => (if (s == 0) uni else bi)(b.toInt) = c }
    HashedNgramModel(uni.toSeq, bi.toSeq)
  }

  /** Materialize a fitted model as a VERSIONED PARQUET ARTIFACT — the
    * fit-once / score-many lifecycle (the tokenizer-merge-table
    * discipline, [[Bpe.writeTokenizer]]): non-zero (salt, b, c) cells
    * with the bucket count embedded per row as `p_nbuckets`, so a
    * scorer can never silently pair models fitted under different
    * hash widths. One fit scan per CORPUS per snapshot; every later
    * selection pass reloads two bounded tables instead of re-scanning
    * the corpora. */
  def writeNgramModel(docs: DataFrame, text: Column, nBuckets: Int,
      path: String): Unit =
    gramCells(docs, text, nBuckets)
      .select(col("s"), col("b"), col("c"), lit(nBuckets).as("p_nbuckets"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Reload a [[writeNgramModel]] artifact (bounded: ≤ 2·nBuckets rows).
    * Fail-fasts in the versioned-artifact family: parameter-less dirs
    * refused, mixed `p_nbuckets` generations refused, and a caller
    * built against a specific width can pin it — scoring under the
    * wrong hash width silently mis-weights every document. */
  def readNgramModel(spark: org.apache.spark.sql.SparkSession, path: String,
      expectedBuckets: Option[Int] = None): HashedNgramModel = {
    val t = spark.read.parquet(path)
    require(t.columns.contains("p_nbuckets"),
      s"n-gram model artifact at $path carries no p_nbuckets — not a " +
        "writeNgramModel artifact")
    val rows = t.select(col("s"), col("b"), col("c"), col("p_nbuckets"))
      .collect()
    require(rows.nonEmpty, s"n-gram model artifact at $path is empty")
    val gens = rows.map(_.getInt(3)).distinct
    require(gens.length == 1,
      s"n-gram model artifact at $path holds ${gens.length} p_nbuckets " +
        "generations — a single generation is required; refit it")
    val m = gens.head
    expectedBuckets.foreach(e => require(m == e,
      s"n-gram model artifact at $path was fitted at $m buckets but the " +
        s"caller was built against $e — scoring under the wrong hash " +
        "width silently mis-weights; refit or repoint"))
    require(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < m),
      s"n-gram model artifact at $path holds buckets outside [0, $m)")
    fromCells(rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq, m)
  }

  /** DSIR selection against STANDING model artifacts: reload the target
    * and raw fits (two bounded reads — the corpora are never
    * rescanned), difference them, score + Gumbel-select. Output ≡
    * [[dsir]] over the corpora the artifacts were fitted on. */
  def dsirWithModels(raw: DataFrame, id: Column, text: Column,
      targetModelPath: String, rawModelPath: String, k: Int,
      seed: Long): DataFrame = {
    val spark = raw.sparkSession
    val tm = readNgramModel(spark, targetModelPath)
    val rm = readNgramModel(spark, rawModelPath,
      expectedBuckets = Some(tm.uni.size))
    dsirSelect(
      importanceScore(raw, id, text,
        importanceLambdas(tm.uni, rm.uni),
        importanceLambdas(tm.bi, rm.bi)),
      k, seed)
  }

  /** One corpus's fitted hashed-n-gram counts (the DSIR "language
    * model": bucket counts + implied totals). */
  final case class HashedNgramModel(uni: Seq[Long], bi: Seq[Long]) {
    def uniTotal: Long = uni.sum
    def biTotal: Long = bi.sum
  }

  /** Per-bucket importance log-ratios in micros:
    * λ[b] = floor(1e6·ln( ((t[b]+1)·(rTot+m)) / ((r[b]+1)·(tTot+m)) )
    * + 0.5) — add-one-smoothed target/raw likelihood ratio, rounded
    * ONCE per bucket so downstream sums are exact longs. The ratio's
    * operand tree (two multiplies, one divide, all integer-valued
    * doubles) is IEEE-exact and mirrored verbatim in the generated
    * oracle. */
  def importanceLambdas(target: Seq[Long], raw: Seq[Long]): Seq[Long] = {
    require(target.size == raw.size, "bucket tables must align")
    val m = target.size
    val tTot = target.sum; val rTot = raw.sum
    target.indices.map { b =>
      val ratio = ((target(b) + 1.0) * (rTot + m).toDouble) /
        ((raw(b) + 1.0) * (tTot + m).toDouble)
      math.floor(1e6 * math.log(ratio) + 0.5).toLong
    }
  }

  /** Score every document with the fitted log-ratio tables:
    * (doc_id, n_feats, weight_micros) with
    * weight ≈ 1e6·log p_target(doc)/p_raw(doc)
    *        = Σ λ₀[h₀(token)] over the token BAG
    *        + Σ λ₁[h₁(bigram)] over DISTINCT bigrams.
    * The λ tables ride as array literals; the sums are `aggregate`
    * folds over the token arrays — one scan-fused projection, zero
    * joins, exact long arithmetic. */
  def importanceScore(docs: DataFrame, id: Column, text: Column,
      lamUni: Seq[Long], lamBi: Seq[Long]): DataFrame = {
    require(lamUni.size == lamBi.size && lamUni.size >= 2,
      "lambda tables must align and have >= 2 buckets")
    val m = lamUni.size
    def fold(arr: Column, salt: Int, lam: Seq[Long]): Column = {
      val lamLit = typedlit(lam)
      aggregate(arr, lit(0L), (acc, g) =>
        acc + element_at(lamLit, (Sketch.cmsPos(salt, g, m) + 1).cast("int")))
    }
    docs
      .select(id.as("doc_id"), T.tokens(lower(text)).as("toks"))
      .select(col("doc_id"), col("toks"),
        T.tokenShingles(col("toks"), 2).as("bi"))
      .select(col("doc_id"),
        (size(col("toks")) + size(col("bi"))).cast("long").as("n_feats"),
        (fold(col("toks"), 0, lamUni) + fold(col("bi"), 1, lamBi))
          .as("weight_micros"))
  }

  /** Seeded Gumbel perturbation in micros: g = −ln(−ln(u)) with
    * u = (h + 0.5) / 2⁴⁸, h = the first 12 md5 hex digits of
    * "seed:id" — 48 bits, so h and h + 0.5 are EXACT doubles and
    * u ∈ (0, 1) strictly (the 15-digit form the bucket hashes use
    * would round past 2⁵³ and could collapse u to 1.0). Deterministic,
    * engine-derivable, mirrored in the oracle; one rounding per row. */
  def gumbelMicros(id: Column, seed: Long): Column = {
    val h = conv(substring(md5(concat(lit(s"$seed:"), id.cast("string"))),
      1, 12), 16, 10).cast("double")
    val u = (h + 0.5) / math.pow(2.0, 48)
    floor(lit(1e6) * -log(-log(u)) + lit(0.5)).cast("long")
  }

  /** DSIR selection: keep the k raw documents with the largest
    * Gumbel-perturbed importance keys — sampling WITHOUT replacement
    * with inclusion probability ∝ importance weight (the Gumbel top-k
    * trick; the paper's resampling step). Deterministic under `seed`.
    * Output: (doc_id, n_feats, weight_micros, key_micros), k rows.
    * The take is orderBy+limit — Spark's distributed take-ordered, a
    * per-partition bounded heap + a k-row driver merge, never a global
    * sort. */
  def dsirSelect(scored: DataFrame, k: Int, seed: Long): DataFrame =
    scored
      .withColumn("key_micros",
        col("weight_micros") + gumbelMicros(col("doc_id"), seed))
      .orderBy(col("key_micros").desc, col("doc_id"))
      .limit(k)

  /** The full pipeline: fit both corpora, difference the models, score
    * raw, Gumbel-select k. Two count scans + one scoring scan; the
    * models never leave the driver as anything bigger than 2·nBuckets
    * longs each. */
  def dsir(raw: DataFrame, target: DataFrame, id: Column, text: Column,
      nBuckets: Int, k: Int, seed: Long): DataFrame = {
    val tm = hashedNgramCounts(target, text, nBuckets)
    val rm = hashedNgramCounts(raw, text, nBuckets)
    dsirSelect(
      importanceScore(raw, id, text,
        importanceLambdas(tm.uni, rm.uni),
        importanceLambdas(tm.bi, rm.bi)),
      k, seed)
  }
}
