package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF join — for every left row, the single right row with
  * the greatest timestamp <= the left row's timestamp within the same key
  * (the time-series point-lookup join Spark lacks as a built-in).
  *
  * Plan shape: UNION-TAG + RUNNING CARRY, not a range join. Both sides are
  * tagged and unioned, shuffled ONCE on the key, sorted within partitions
  * by (ts, tag) — right rows sort before left rows at equal ts, making the
  * match inclusive — and a running `last(right, ignoreNulls)` carries the
  * most recent right payload forward to each left row. Cost is one shuffle
  * + one sort regardless of how many right rows precede each left row; the
  * naive `left.ts >= right.ts` theta-join Spark would plan as a
  * BroadcastNestedLoopJoin never appears (Audit asserts it).
  *
  * The right side must be unique per (key, ts) — pre-aggregate duplicates
  * (the query layer does max-by-id) so the carried row is deterministic.
  */
object AsOfJoin {

  /** @param left  probe side; must contain `key` and `ts` columns
    * @param right reference side; must contain `key` and `ts`, unique per
    *              (key, ts)
    * @return left rows (all columns) plus a `matched` struct of the as-of
    *         right row (null when no right row precedes the left row) */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    // the implementation owns these names in the unioned frame; a caller
    // column with the same name would silently collide
    val reserved = Seq("__k", "__t", "__tag", "__l", "__r")
    val clash = (left.columns ++ right.columns).filter(reserved.contains) ++
      left.columns.filter(_ == "matched")
    require(clash.isEmpty,
      s"asof: input columns collide with reserved names: ${clash.distinct.mkString(", ")}")
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(right.columns.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType
    val u = left
      .select(col(key).as("__k"), col(ts).as("__t"), lit(1).as("__tag"),
        lStruct.as("__l"), lit(null).cast(rType).as("__r"))
      .unionByName(right
        .select(col(key).as("__k"), col(ts).as("__t"), lit(0).as("__tag"),
          lit(null).cast(lType).as("__l"), rStruct.as("__r")))
    val carry = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    u
      .withColumn("matched", last(col("__r"), ignoreNulls = true).over(carry))
      .where(col("__tag") === 1)
      .select(col("__l.*"), col("matched"))
  }
}
