package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD type 2) history build: turn an
  * append-only attribute change log into versioned validity intervals
  * `[eff_from, eff_to)` per key — the temporal-dimension contract a
  * training pipeline needs for POINT-IN-TIME correct feature joins
  * (joining tomorrow's attribute onto yesterday's example is label
  * leakage; the as-of join against this history is the guard). Pairs with
  * [[AsOfJoin]]: `asof(probes, collapse(log))` answers "the attribute as
  * of time t" without materializing the history at all.
  *
  * Scale shape: one shuffle on the key; the ordering window is
  * PARTITION-LOCAL (partitionBy key), never a global sort. Version counts
  * per key are bounded by that key's change count — no driver state.
  */
object Scd {

  /** Last-wins collapse of simultaneous changes: one row per (key, ts),
    * each attribute taken from the change with the greatest `tieBreak`
    * (map-side partial agg; deterministic when tieBreak is unique). */
  def collapse(changes: DataFrame, key: String, ts: String,
      tieBreak: String, attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "collapse: need at least one attribute")
    val aggs = attrs.map(a => max_by(col(a), col(tieBreak)).as(a))
    changes.groupBy(col(key), col(ts)).agg(aggs.head, aggs.tail: _*)
  }

  /** SCD-2 history: collapsed versions ordered per key, each valid from
    * its own change time until the next version's (`eff_to` null = current
    * version). `version` numbers from 1 in change order. */
  def scdHistory(changes: DataFrame, key: String, ts: String,
      tieBreak: String, attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts))
    collapse(changes, key, ts, tieBreak, attrs)
      .withColumn("eff_from", col(ts))
      .withColumn("eff_to", lead(col(ts), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("eff_to").isNull)
      .drop(ts)
  }
}
