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
    * earliest completion of stage i−1; equivalently tᵢ =
    * min(ts | kind = sᵢ ∧ ts > tᵢ₋₁)). Returns one row per stage:
    * (stage, kind, n_keys) — the classic conversion report. `ts` must be
    * integral (epoch micros, like [[debounce]]).
    *
    * ONE shuffle total, however many stages: the key's stage events are
    * collected and time-sorted in a single groupBy(key), then a per-key
    * `aggregate` fold advances a (progress, last-time) state through the
    * sorted list — the greedy scan IS the conditional-min chain (the
    * first sᵢ event after tᵢ₋₁ in time order is exactly
    * min(ts | kind = sᵢ ∧ ts > tᵢ₋₁); strict `>` makes equal-timestamp
    * tie order irrelevant). Stage counts then come from one scalar
    * aggregate over the per-key progress values, unpivoted with `stack`
    * — no per-stage passes anywhere. Per-key state is the key's
    * stage-kind events only (non-stage kinds are filtered before the
    * shuffle); a key hot enough to break that needs sessionization
    * upstream, not a funnel. */
  def funnel(df: DataFrame, key: Column, kind: Column, ts: Column,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel requires at least one stage")
    val nS = stages.size
    val stageArr = array(stages.map(lit): _*)
    val progress = df
      .select(key.as("k"), kind.as("kind"), ts.cast("long").as("tus"))
      // tus IS NOT NULL: defends the 'ts must be integral' contract — a
      // NULL timestamp would advance stage 1 (the p === 0 disjunct skips
      // the t > lt check) and then wedge the fold with lt = NULL, where
      // the conditional-min formulation (and the SQL oracle's MIN) simply
      // ignores NULLs. Dropping them before the shuffle keeps the two
      // formulations equivalent on dirty data too.
      .filter(col("k").isNotNull && col("tus").isNotNull &&
        col("kind").isin(stages: _*))
      .groupBy(col("k"))
      .agg(sort_array(collect_list(
        struct(col("tus").as("t"), col("kind").as("knd")))).as("__evs"))
      .select(aggregate(
        col("__evs"),
        struct(lit(0).as("p"), lit(Long.MinValue).as("lt")),
        (st, ev) => {
          val adv = st.getField("p") < lit(nS) &&
            ev.getField("knd") === element_at(stageArr, st.getField("p") + 1) &&
            (st.getField("p") === 0 || ev.getField("t") > st.getField("lt"))
          struct(
            (st.getField("p") + when(adv, 1).otherwise(0)).as("p"),
            when(adv, ev.getField("t")).otherwise(st.getField("lt")).as("lt"))
        },
        st => st.getField("p")).as("p"))
    val cexprs = stages.indices.map(i =>
      count(when(col("p") >= i + 1, lit(1))).as(s"__c$i"))
    val stackArgs = stages.indices.map { i =>
      s"${i + 1}, '${stages(i).replace("'", "''")}', __c$i"
    }.mkString(", ")
    progress.agg(cexprs.head, cexprs.tail: _*)
      .selectExpr(s"stack($nS, $stackArgs) AS (stage, kind, n_keys)")
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
