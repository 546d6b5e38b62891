package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-telemetry analytics — the debounce/funnel/retention family every
  * event warehouse runs on its fact stream. Reference behavior: the
  * reference's event surface stops at windowed counts; these are the
  * standard analytics the same schema serves (SURVEY.md §2.12 extension).
  * All three are deterministic integer/timestamp arithmetic over keyed
  * windows or two-phase aggregates — no RNG, no floats — so they
  * hash-check against the SQL oracle.
  */
object EventAnalytics {

  /** Temporal DEBOUNCE — keep an event only if the previous event of the
    * same (key, kind) lies more than `gapSeconds` back (or none exists):
    * the re-fire suppressor for double-clicks, retried webhooks, chatty
    * sensors. Exact-duplicate dedup ([[Dedup]]) removes identical rows;
    * debounce removes DISTINCT rows that are too close in time.
    *
    * Note the chain semantics: each kept-or-dropped decision compares to
    * the immediately PRECEDING event (kept or not) — the standard
    * lag-based debounce, one window per (key, kind), deterministic under
    * the (ts, id) sort. Scale: one shuffle on (key, kind), per-partition
    * state is one lag value. */
  def debounce(df: DataFrame, key: Column, kind: Column, ts: Column,
      id: Column, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val w = Window.partitionBy(col("k"), col("kind"))
      .orderBy(col("tus").asc, col("id").asc)
    df.select(key.as("k"), kind.as("kind"), ts.as("tus"), id.as("id"))
      .withColumn("__prev", lag(col("tus"), 1).over(w))
      .filter(col("__prev").isNull
        || col("tus") - col("__prev") > gapSeconds * 1000000L)
      .drop("__prev")
  }

  /** Ordered FUNNEL — how far each key progresses through `stages`
    * (stage i counts only if it happens strictly AFTER the key's
    * earliest completion of stage i−1). Returns one row per stage:
    * (stage, kind, n_keys) — the classic conversion report.
    *
    * Two-phase, join-free per stage: stage 1's time is
    * min(ts | kind = s₁); stage i's is min(ts | kind = sᵢ ∧ ts > tᵢ₋₁),
    * computed as ONE conditional aggregate per stage in a single
    * groupBy(key) pass — the whole funnel is one shuffle of (key, kind,
    * ts) triples, however many stages. */
  def funnel(df: DataFrame, key: Column, kind: Column, ts: Column,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel requires at least one stage")
    val base = df.select(key.as("k"), kind.as("kind"), ts.as("tus"))
      .filter(col("k").isNotNull)
    // Chain of conditional mins: t_0 = min(ts | kind = s_0); then each
    // t_i = min(ts | kind = s_i ∧ ts > t_(i-1)) needs t_(i-1) joined
    // back before its aggregate — one (join + groupBy) per stage, every
    // pass shuffling on the SAME key (AQE/exchange-reuse friendly), with
    // earlier stage times carried through as per-key-constant mins. An
    // unreachable stage (t_(i-1) null) makes the `>` predicate null →
    // nothing aggregates → t_i null, exactly the funnel drop-off.
    var times = base.groupBy(col("k"))
      .agg(min(when(col("kind") === stages.head, col("tus"))).as("t0"))
    for (i <- 1 until stages.size) {
      val aggs = (0 until i).map(j => min(col(s"t$j")).as(s"t$j")) :+
        min(when(col("kind") === stages(i) && col("tus") > col(s"t${i - 1}"),
          col("tus"))).as(s"t$i")
      times = base.join(times, Seq("k"))
        .groupBy(col("k"))
        .agg(aggs.head, aggs.tail: _*)
    }
    stages.indices.map { i =>
      times.agg(count(col(s"t$i")).as("n_keys"))
        .select(lit(i + 1).as("stage"), lit(stages(i)).as("kind"), col("n_keys"))
    }.reduce(_ unionAll _)
  }

  /** RETENTION cohorts — keys grouped by first-activity period, counted
    * in each later period they return: (cohort, offset, n_keys), the
    * triangle every growth dashboard renders. `periodSeconds` buckets
    * event time into integer periods (epoch-microsecond div), cohort =
    * first period, offset = period − cohort. Two aggregates: first pass
    * per (key, period) distinct activity, window-free min per key, then
    * the cohort rollup — shuffles bounded by (key, period) cardinality,
    * never raw events. */
  def retention(df: DataFrame, key: Column, ts: Column,
      periodSeconds: Long): DataFrame = {
    require(periodSeconds > 0, "periodSeconds must be positive")
    val active = df.select(key.as("k"), ts.as("tus"))
      .filter(col("k").isNotNull)
      .select(col("k"), expr(s"tus div ${periodSeconds * 1000000L}").as("period"))
      .distinct()
    val firstP = active.groupBy(col("k")).agg(min(col("period")).as("cohort"))
    active.join(firstP, Seq("k"))
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_keys"))
  }
}
