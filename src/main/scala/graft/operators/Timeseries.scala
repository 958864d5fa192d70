package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log / time-series analytics: regular-grid gap-fill with
  * last-observation-carried-forward, ordered funnel cascades, and cohort
  * retention — the event-table counterparts of the OLAP family
  * ([[Ivm]]).
  *
  * Scale shape: everything here is keyed by the entity (user) — grids
  * explode map-side from per-key spans, carry-forward windows are
  * PARTITION-LOCAL per key (never a global sort), funnels are per-stage
  * equi-joins + min-aggs, cohorts are two entity-sized aggregates. No
  * all-pairs, no driver state.
  */
object Timeseries {

  /** Densify an observation table to a regular per-key grid and carry the
    * last observation forward. `obs` must be collapsed to one row per
    * (key, tick) (use max_by for last-wins — q131 does); the grid spans
    * [min(tick), max(tick)] PER KEY, so no key pays for another's span.
    *
    * `maxSpan` is the loud runaway guard: a single key whose span exceeds
    * it (a 30-year sensor at 1 ms ticks) would explode a billion-row grid
    * out of one input row — at 100 TB that's a skew bomb, so the operator
    * fails fast instead of silently materializing it.
    *
    * Returns the grid with `value` carried forward (never null: the grid
    * starts at each key's first observation) and `is_gap` marking filled
    * ticks. The carry window is rows-unbounded-preceding per key —
    * partition-local, exactly as cheap as a per-key sort. */
  def gapFillLocf(
      obs: DataFrame,
      key: String,
      tick: String,
      value: String,
      maxSpan: Long = 1000000L): DataFrame = {
    val span = obs.groupBy(col(key))
      .agg(min(col(tick)).as("__lo"), max(col(tick)).as("__hi"))
    // the guard lives in a FILTER so column pruning can't drop it
    val guarded = span.where(
      when(col("__hi") - col("__lo") < maxSpan, lit(true))
        .otherwise(raise_error(concat(
          lit(s"gapFillLocf: key span exceeds maxSpan=$maxSpan for "),
          col(key).cast("string")))))
    val grid = guarded
      .select(col(key), explode(sequence(col("__lo"), col("__hi"))).as(tick))
    val carry = Window.partitionBy(col(key)).orderBy(col(tick))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(key, tick), "left")
      .withColumn("is_gap", col(value).isNull)
      .withColumn(value, last(col(value), ignoreNulls = true).over(carry))
  }

  /** Ordered funnel: per key, the first time each stage was reached
    * STRICTLY AFTER the previous stage (same-tick completions don't
    * count — mirrored in the oracle). Returns one row per key that
    * completed stage 1, with nullable `t1..tN` first-completion ticks;
    * conversion counts are one aggregate away.
    *
    * Stage i is events(stage_i) equi-joined to the stage-(i-1) frame
    * (entity-sized) + a min-agg — the event table is scanned once per
    * stage with the stage filter pushed down, and nothing ever pairs
    * events against events. */
  def funnel(
      events: DataFrame,
      key: String,
      tick: String,
      stageCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel: stages must be non-empty")
    val firsts = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (s, i)) =>
        val ev = events.where(col(stageCol) === s)
          .select(col(key), col(tick))
        Some(prev match {
          case None => ev.groupBy(col(key)).agg(min(col(tick)).as(s"t${i + 1}"))
          case Some(p) =>
            ev.join(p.select(col(key), col(s"t$i").as("__prev")), Seq(key))
              .where(col(tick) > col("__prev"))
              .groupBy(col(key)).agg(min(col(tick)).as(s"t${i + 1}"))
        })
    }.flatten
    firsts.reduceLeft((acc, next) => acc.join(next, Seq(key), "left"))
  }

  /** Cohort retention: cohort = each key's first-activity period, cells =
    * distinct keys active at each (cohort, offset). Two entity-keyed
    * aggregates + one equi-join — the classic matrix with no window at
    * all. */
  def cohortRetention(events: DataFrame, key: String, period: String): DataFrame = {
    val cohort = events.groupBy(col(key)).agg(min(col(period)).as("cohort"))
    val active = events.select(col(key), col(period)).distinct()
    active.join(cohort, Seq(key))
      .groupBy(col("cohort"), (col(period) - col("cohort")).as("wk_offset"))
      .agg(countDistinct(col(key)).as("n_users"))
  }
}
