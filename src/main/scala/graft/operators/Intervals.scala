package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Integer-set-as-intervals utilities — the reference's gaps-and-islands
  * compression of sorted id sets and point-in-interval membership
  * (/root/reference/src/util/utils.py:343-393 and the vendored
  * intervaltree). Intervals are CLOSED [begin, end], matching
  * `intervals_extract` (utils.py:343-360).
  *
  * The interval tree is replaced by relational forms: a broadcast range
  * join covers membership (the interval set is small — it is a COMPRESSED
  * representation by construction), and island-merging covers set union.
  */
object Intervals {

  /** Compress a set of integers (column `x`, assumed distinct) into closed
    * intervals (SURVEY §2 W5).
    *
    * Scale shape: instead of the classic single global-window
    * x - row_number() (which funnels the whole set through one task), the
    * set is RANGE-partitioned and each partition compresses its sorted run
    * locally; only the (already-compressed, tiny) per-partition interval
    * lists then go through the boundary merge. */
  def islands(xs: DataFrame): DataFrame = {
    val spark = xs.sparkSession
    import spark.implicits._
    val local = xs.select(col("x").cast("long"))
      .repartitionByRange(col("x"))
      .sortWithinPartitions(col("x"))
      .as[Long]
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var begin = 0L
        var end = 0L
        var has = false
        it.foreach { x =>
          if (!has) { begin = x; end = x; has = true }
          else if (x == end + 1) end = x
          else { out += ((begin, end)); begin = x; end = x }
        }
        if (has) out += ((begin, end))
        out.iterator
      }
      .toDF("begin", "end")
    // range partitions are contiguous, so only boundary-adjacent intervals
    // remain to merge — over the compressed list, not the raw set
    mergeNeighbors(local)
  }

  /** Membership of each x in ANY interval — `is_number_in_intervals`
    * (utils.py:363-375) as a broadcast range join. */
  def membership(xs: DataFrame, intervals: DataFrame): DataFrame =
    xs.select(col("x"))
      .join(
        broadcast(intervals),
        col("x") >= col("begin") && col("x") <= col("end"),
        "left")
      .groupBy(col("x"))
      .agg(max(col("begin").isNotNull).as("in_intervals"))

  /** Merge overlapping/adjacent closed intervals (union + merge_neighbors,
    * utils.py:378-384): an interval starts a new island when its begin
    * exceeds 1 + max(end) of everything before it. */
  def mergeNeighbors(intervals: DataFrame): DataFrame = {
    val wPrev = Window
      .orderBy(col("begin"), col("end"))
      .rowsBetween(Window.unboundedPreceding, -1)
    intervals
      .withColumn("prev_max_end", max(col("end")).over(wPrev))
      .withColumn(
        "new_grp",
        when(col("prev_max_end").isNull || col("begin") > col("prev_max_end") + 1, 1)
          .otherwise(0))
      .withColumn(
        "grp",
        sum(col("new_grp")).over(
          Window.orderBy(col("begin"), col("end"))
            .rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("grp"))
      .agg(min(col("begin")).as("begin"), max(col("end")).as("end"))
      .select(col("begin"), col("end"))
  }
}
