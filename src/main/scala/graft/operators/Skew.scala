package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (the manual fallback when AQE's
  * skew-join split isn't available or the skew is in an aggregation).
  *
  * Salting is deterministic (hash of a stable row id, not rand()) so
  * results are reproducible and retries are safe.
  */
object Skew {

  /** Deterministic salt in [0, buckets) from a stable id column. */
  def salt(idCol: Column, buckets: Int): Column =
    pmod(hash(idCol), lit(buckets))

  /** Skew-safe inner equi-join: the big (skewed) side gets a salt from its
    * stable id; the small side is replicated `buckets` times so every
    * (key, salt) bucket finds its partner. The shuffle key becomes
    * (key, salt), splitting a hot key across `buckets` reducers. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      bigIdCol: String,
      buckets: Int): DataFrame = {
    val salted = big.withColumn("__salt", salt(col(bigIdCol), buckets))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Two-phase skew-safe aggregation: count/sum per (key, salt) first
    * (splitting hot keys across reducers), then combine per key. */
  def saltedCountSum(
      df: DataFrame,
      key: String,
      idCol: String,
      valueCol: String,
      buckets: Int): DataFrame =
    df.withColumn("__salt", salt(col(idCol), buckets))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), round(sum(col("__s")), 2).as("sum_value"))
}
