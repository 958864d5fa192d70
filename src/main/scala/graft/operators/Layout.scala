package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization: 2-D Z-order (Morton) clustering — the
  * multi-column data-skipping layout Delta's OPTIMIZE ZORDER BY and
  * Iceberg's sort-order rewrite apply before writing a 100 TB table.
  * Sorting by the interleaved key co-locates rows that are close in BOTH
  * dimensions, so per-file min/max stats prune scans on either column.
  * Not in the reference (single-dim .fbin blobs have no layout choice);
  * first-class here because at cluster scale the difference between
  * scanning 4 files and 4000 is the layout, not the query plan.
  *
  * Scale shape: the z-value is a map-only integer expression (codegen'd
  * bitwise ops, no UDF); bucket stats are one partial-agg shuffle on the
  * bounded bucket key. In production the write path is
  * `repartitionByRange(zValue).sortWithinPartitions(zValue).write` and the
  * stats below are what parquet row-group min/max would record; here the
  * FIXED grid (top bits of z) replaces range boundaries so the result is
  * deterministic and oracle-checkable.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative integer
    * columns: bit i of x lands at position 2i, bit i of y at 2i+1. Inputs
    * are masked to `bits` bits first (callers pick `bits` to cover the
    * domain; the mask keeps out-of-range keys from corrupting neighbors'
    * positions). Pure fold of AND/shift/OR — stays in whole-stage codegen. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Write `df` as a Spark BUCKETED parquet table (external path): rows are
    * hash-distributed on `key` into `numBuckets` files, each sorted by
    * `key`. The pre-`repartition` on the same (hash, n) the bucket spec
    * uses sends each bucket to exactly one task, so the layout is one file
    * per bucket — the shape Hive/Spark bucketing assumes. A join between
    * two tables bucketed on their join keys with equal bucket counts needs
    * NO shuffle on either side (the scan itself reports the hash
    * distribution) — at 100 TB this is the difference between re-shuffling
    * both fact tables on every query and paying the distribution cost once
    * at write time. q127 audits exactly that: one Exchange in the whole
    * plan (the final aggregate), zero under the join. */
  def writeBucketed(df: DataFrame, numBuckets: Int, key: String,
      tableName: String, path: String): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$tableName`")
    df.repartition(numBuckets, col(key))
      .write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(tableName)
  }

  /** Cluster `df` on z(xCol, yCol) into 4^gridBits fixed buckets (the top
    * 2*gridBits bits of the z-value — the deterministic stand-in for
    * range-partition file boundaries) and report per bucket what a file
    * footer would: row count and min/max of both columns. `scanLo/scanHi`
    * is a canonical range predicate on xCol; `scan_needed` marks the
    * buckets whose [min,max] overlaps it — the files a pruned scan reads. */
  def zOrderBucketStats(df: DataFrame, xCol: String, yCol: String,
      bits: Int, gridBits: Int, scanLo: Long, scanHi: Long): DataFrame = {
    require(gridBits >= 1 && gridBits <= bits, s"gridBits must be in [1,$bits]")
    val z = zValue(col(xCol), col(yCol), bits)
    df.select(col(xCol), col(yCol),
        shiftright(z, 2 * bits - 2 * gridBits).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol)).cast("long").as("min_x"),
        max(col(xCol)).cast("long").as("max_x"),
        min(col(yCol)).cast("long").as("min_y"),
        max(col(yCol)).cast("long").as("max_y"))
      .withColumn("scan_needed",
        !(col("min_x") > scanHi || col("max_x") < scanLo))
  }
}
