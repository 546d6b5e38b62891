package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splitting — the
  * training-data operations `df.sample()` cannot give you: `sample` is
  * seed- and partitioning-dependent, so reruns, engine changes, or a
  * repartition silently change the sample. Hashing the row KEY instead
  * makes membership a pure function of the data: stable across runs,
  * engines, partitionings, and incremental reloads (a document keeps its
  * split forever — the property train/test hygiene actually needs).
  *
  * The bucket is the first 4 hex chars of md5(key) — uniform over 65,536
  * buckets, and hex strings compare lexicographically exactly like the
  * numbers they encode, so plain string comparison against a 4-hex-digit
  * bound expresses any fraction at 1/65,536 granularity in ANY engine
  * (the DuckDB oracle uses the same `substr(md5(..))` predicate).
  * Pure per-row projection: fuses into the scan, no shuffle, no state.
  */
object Sampling {

  /** Uniform hash bucket of `key` as a 4-hex-char string ("0000".."ffff"). */
  def hexBucket(key: Column): Column = substring(md5(key.cast("string")), 1, 4)

  /** Keep rows with `hexBucket(key) < hexBound`; e.g. "4000" keeps ~25%,
    * "8000" ~50%. Deterministic in the key — the same key is always in or
    * always out. */
  def deterministicSample(df: DataFrame, key: Column, hexBound: String): DataFrame =
    df.filter(hexBucket(key) < lit(hexBound))

  /** Stable train/val/test split label for `key`: "train" below
    * `trainBound`, "val" below `valBound`, else "test". Defaults give
    * 80/10/10 over the full hash range. */
  def splitLabel(key: Column, trainBound: String = "cccc",
      valBound: String = "e666"): Column = {
    val h = hexBucket(key)
    when(h < trainBound, "train").when(h < valBound, "val").otherwise("test")
  }

  /** Uniform integer hash bucket of `key` in [0, 1e6): the first 15 md5
    * hex chars (60 bits) as a long, mod 1e6 — the INTEGER-threshold form
    * of [[hexBucket]], for keep-rates computed at parts-per-million
    * precision. Engine-portable: `('0x' || substr(md5(k), 1, 15))::UBIGINT
    * % 1000000` reproduces it in any SQL engine. */
  def ppmBucket(key: Column): Column =
    (conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
      % lit(1000000L))

  /** Pretraining data-mixture sampling: downsample each stratum (source,
    * language, domain) so its share of the kept corpus approaches the
    * target MIX WEIGHT under a total `budget` of `unit` (chars, tokens,
    * bytes — any additive per-row column).
    *
    * Two passes, the index-build shape: (1) one aggregation collects the
    * per-stratum unit totals driver-side (one row per stratum — the same
    * bounded-collect class as [[Similarity.hashCentroids]]); (2) each
    * stratum's keep-rate `min(1, budget·weight / total)` is floored to a
    * parts-per-million INTEGER threshold and compiled into a literal CASE
    * over [[ppmBucket]] — membership is a pure function of (key, stratum),
    * so the mixture is reproducible across runs, engines and reloads, and
    * the whole second pass fuses into the scan. Strata absent from
    * `weights` are dropped (weight 0). Rates cap at 1: a stratum smaller
    * than its target contributes everything it has (the standard
    * under-budget behavior — weights are targets, not guarantees). */
  def mixtureSample(df: DataFrame, key: Column, stratum: Column,
      unit: Column, weights: Map[String, Double], budget: Long): DataFrame = {
    // stratum cast to string (weights is keyed by string) and the sum
    // read as a generic Number: sum() returns long/double/decimal
    // depending on the unit column's type, and the documented contract
    // is "any additive numeric per-row column"
    val totals = df.select(stratum.cast("string").as("__s"), unit.as("__u"))
      .groupBy(col("__s")).agg(sum(col("__u")).as("__t"))
      .collect().map(r => r.getString(0) ->
        Option(r.getAs[Number](1)).fold(0.0)(_.doubleValue)).toMap
    val thresholds = weights.map { case (s, w) =>
      val total = totals.getOrElse(s, 0.0)
      val rate =
        if (total <= 0.0) 0L
        else math.min(1000000L, (budget.toDouble * w / total * 1e6).toLong)
      s -> rate
    }
    val bound = thresholds.toSeq.sortBy(_._1)
      .foldLeft(lit(0L)) { case (acc, (s, r)) =>
        when(stratum === s, lit(r)).otherwise(acc)
      }
    df.filter(ppmBucket(key) < bound)
  }

  /** Temperature-smoothed pretraining mixture — [[mixtureSample]] with
    * the target weights derived FROM the corpus itself: w_s ∝ T_s^α at
    * α = 1/2, the standard multilingual/multi-source rebalancing move
    * (dominant strata downweighted toward the tail, tail strata kept
    * closer to whole) when no hand-tuned weight table exists.
    *
    * Exactness contract — why α is FIXED at 1/2: the weight is computed
    * as the integer floor(sqrt(T_s)) over the integer per-stratum unit
    * totals, and the normalizer S = Σ floor(sqrt(T_s)) is an INTEGER
    * sum, so the per-stratum ppm threshold
    * min(10⁶, ⌊budget · 10⁶ · w_s / (T_s · S)⌋) is all-integer
    * arithmetic after one correctly-rounded IEEE sqrt (whose floor is
    * exact for totals ≪ 2^52) — bit-reproducible in any engine. A
    * free-α form would need pow() plus an ORDER-DEPENDENT float
    * summation for S, which no SQL engine guarantees to replay our way.
    *
    * Same two-pass shape as [[mixtureSample]]: one stratum-sized
    * aggregate collected driver-side, then a literal CASE over
    * [[ppmBucket]] that fuses into the scan — no join, no shuffle on
    * the data pass, membership a pure function of (key, stratum). */
  def temperatureMixture(df: DataFrame, key: Column, stratum: Column,
      unit: Column, budget: Long): DataFrame = {
    require(budget > 0L, "budget must be positive")
    val totals = df.select(stratum.cast("string").as("__s"),
        unit.cast("long").as("__u"))
      .groupBy(col("__s")).agg(sum(col("__u")).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .filter { case (_, t) => t > 0L }
    val w = totals.map { case (s, t) => s -> math.sqrt(t.toDouble).toLong }
    val norm = w.values.sum
    val thresholds = totals.map { case (s, t) =>
      s -> math.min(1000000L,
        (BigInt(budget) * 1000000 * w(s) / (BigInt(t) * norm)).toLong)
    }
    val bound = thresholds.toSeq.sortBy(_._1)
      .foldLeft(lit(0L)) { case (acc, (s, r)) =>
        when(stratum === s, lit(r)).otherwise(acc)
      }
    df.filter(ppmBucket(key) < bound)
  }

  /** Stratified deterministic sample: a different keep-fraction per value
    * of `stratum` (hex bound per stratum; `defaultBound` for unlisted
    * strata, "0000" = drop them). The standard corpus-rebalancing move —
    * e.g. downsample the dominant language while keeping the tail whole.
    * Still a pure per-row predicate: the bounds map compiles into a
    * literal CASE chain, so there is no join, no shuffle, and membership
    * stays a pure function of (key, stratum) — stable under reloads and
    * engine changes like [[deterministicSample]]. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
      bounds: Map[String, String], defaultBound: String = "0000"): DataFrame = {
    val bound = bounds.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultBound)) { case (acc, (s, b)) =>
        when(stratum === s, lit(b)).otherwise(acc)
      }
    df.filter(hexBucket(key) < bound)
  }

  /** Keep the BEST `keepPpm`/10⁶ fraction of each stratum by `score` —
    * the quality-classifier percentile gate (keep the top X% per
    * language/domain/source, the DCLM/FineWeb-edu-style filtering move).
    * Unlike the hash samplers above, membership here is RELATIVE (a row
    * survives because it outranks its stratum peers), so it costs one
    * window shuffle partitioned by stratum.
    *
    * Zero floats: the cut is `rn·10⁶ ≤ n·keepPpm` over window INTEGERS
    * (row_number ordered by score DESC with `id` ASC tie-break; count
    * over the stratum) — exact at ppm granularity, deterministic under
    * ties, and replayable in any engine (QUALIFY with the same integer
    * comparison). Keeps exactly floor(n·ppm/10⁶) rows per stratum.
    *
    * Scale: strata are assumed executor-sized for the window sort (shard
    * a dominating stratum first); at 100 TB the production variant
    * replaces the exact window with an `approx_percentile` score
    * threshold + per-row filter — this exact form is the
    * oracle-checkable reference the approximation is validated against. */
  def keepTopFraction(df: DataFrame, stratum: Column, score: Column,
      id: Column, keepPpm: Long): DataFrame = {
    require(keepPpm >= 0L && keepPpm <= 1000000L,
      "keepPpm is parts-per-million in [0, 1000000]")
    val part = org.apache.spark.sql.expressions.Window.partitionBy(stratum)
    val w = part.orderBy(score.desc, id.asc)
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(part))
      .filter(col("__rn") * lit(1000000L) <= col("__n") * lit(keepPpm))
      .drop("__rn", "__n")
  }

  /** Keep EXACTLY min(n, stratum size) rows per stratum, chosen
    * deterministically: the n smallest (md5(key), key) per stratum —
    * "give me exactly 1000 docs per language", the fixed-quota
    * complement of the fractional samplers above. Membership is a pure
    * function of the stratum's key SET (not of ordering, partitioning,
    * or engine), and monotone under growth: a corpus gaining rows can
    * displace members only by hash rank, never by arrival order.
    * Returns the input plus `__rank` (1..n within the stratum, the
    * md5 rank) — callers wanting the bare rows drop it.
    *
    * Scale: the exact form is one window shuffle partitioned by stratum
    * (executor-sized strata, like [[keepTopFraction]]). For corpus-scale
    * strata set `prefilterHexBound`: rows first pass the [[hexBucket]] <
    * bound gate — scan-fused, no shuffle — and only survivors (expected
    * total·bound/65536 per stratum) enter the window. The gate MUST be a
    * hash-PREFIX set to preserve membership, which hexBucket is: it
    * compares the md5's leading hex chars lexicographically, the same
    * order the rank sorts the full hash by — so the n smallest hashes of
    * the survivors are the n smallest of the whole stratum whenever ≥ n
    * rows survive, and results are IDENTICAL to the exact path, just
    * cheaper. ([[ppmBucket]] would NOT work here: its modulo keeps low
    * bits, not a prefix, and a gate on it changes the sample.) An
    * under-provisioned gate (a stratum with fewer than min(n, total)
    * survivors) RAISES at execution rather than silently under-sampling:
    * pick the bound with margin over n/total, and note strata near or
    * below the quota need the whole range (gate them off). */
  def exactNPerStratum(df: DataFrame, key: Column, stratum: Column,
      n: Int, prefilterHexBound: String = ""): DataFrame = {
    require(n > 0, "n must be positive")
    require(prefilterHexBound.isEmpty
        || prefilterHexBound.matches("[0-9a-f]{4}"),
      "prefilterHexBound is 4 lowercase hex chars, or empty to disable")
    // __h/__rank (and the guard path's __s/__total/__got) are this
    // operator's working columns; an input already carrying one would be
    // silently overwritten or shadowed — same reserved-name discipline
    // as Upsert.snapshotDiff's __o/__n.
    val reserved = Set("__h", "__rank", "__s", "__total", "__got")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"exactNPerStratum input must not carry reserved columns ${clash.mkString(", ")}")
    val base = df.withColumn("__h", md5(key.cast("string")))
    val survivors =
      if (prefilterHexBound.isEmpty) base
      else base.filter(substring(col("__h"), 1, 4) < lit(prefilterHexBound))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(col("__h").asc, key.asc)
    val picked = survivors
      .withColumn("__rank", row_number().over(w).cast("long"))
      .filter(col("__rank") <= n)
    if (prefilterHexBound.isEmpty) picked.drop("__h")
    else {
      // under-provision guard: a stratum must yield min(n, total) rows.
      // totals is stratum-sized (map-side combined), the join broadcast.
      val totals = df.groupBy(stratum.as("__s")).agg(count(lit(1)).as("__total"))
      val quota = picked.groupBy(stratum.as("__s")).agg(count(lit(1)).as("__got"))
      val short = totals.join(quota, Seq("__s"), "left")
        .filter(coalesce(col("__got"), lit(0L)) < least(lit(n.toLong), col("__total")))
      picked.join(broadcast(short), stratum === col("__s"), "left")
        .filter(when(col("__s").isNotNull, raise_error(concat(
            lit("Sampling.exactNPerStratum: stratum "), col("__s").cast("string"),
            lit(s" has fewer than min(n, total) rows under prefilterHexBound="
              + s"$prefilterHexBound; raise the gate or disable it")))
          .cast("boolean")).otherwise(lit(true)))
        .drop("__s", "__total", "__got", "__h")
    }
  }
}
