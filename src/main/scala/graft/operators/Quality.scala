package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality operators (the Deequ / Great Expectations capability a
  * production training-data pipeline gates every ingest on): one-pass
  * table profiling and declarative constraint validation. Not present in
  * the reference (its domain is vectors); first-class here because a
  * 100 TB corpus ingest lives or dies on exactly these reports.
  *
  * Cross-engine determinism: min/max of numeric columns are EXACT stored
  * values (no arithmetic, no rounding — both engines read the same
  * parquet bits and min/max are order-independent), distinct counts are
  * exact, and timestamps format through one canonical pattern.
  */
object Quality {

  /** A profiled column: `kind` picks the min/max representation —
    * "integral" | "double" -> min_num/max_num (exact DOUBLE),
    * "string" -> min_str/max_str (binary collation both engines),
    * "timestamp" -> min_str/max_str via yyyy-MM-dd HH:mm:ss. */
  final case class ColSpec(name: String, kind: String)

  /** One-pass table profile: per column (n_rows, n_nonnull, n_distinct,
    * min, max). Scale shape: ONE aggregate over the table — Spark expands
    * the multi-column DISTINCT into one Expand + partial aggs (a single
    * scan, cols+1 duplication); at 100 TB swap the exact distinct for the
    * [[Sketches]] HLL and the shape is unchanged. The per-column pivot is
    * a driver-side literal array inline — no second pass. */
  def profile(df: DataFrame, cols: Seq[ColSpec]): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val aggs = cols.flatMap { c =>
      val base = Seq(
        count(col(c.name)).as(s"nn_${c.name}"),
        countDistinct(col(c.name)).as(s"nd_${c.name}"))
      val mm = c.kind match {
        case "string" => Seq(
          min(col(c.name)).as(s"mns_${c.name}"),
          max(col(c.name)).as(s"mxs_${c.name}"))
        case "timestamp" => Seq(
          date_format(min(col(c.name)), "yyyy-MM-dd HH:mm:ss").as(s"mns_${c.name}"),
          date_format(max(col(c.name)), "yyyy-MM-dd HH:mm:ss").as(s"mxs_${c.name}"))
        case "integral" | "double" => Seq(
          min(col(c.name)).cast("double").as(s"mnn_${c.name}"),
          max(col(c.name)).cast("double").as(s"mxn_${c.name}"))
        case other =>
          throw new IllegalArgumentException(s"profile: unknown kind $other")
      }
      base ++ mm
    }
    val agged = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = cols.map { c =>
      val numeric = c.kind == "integral" || c.kind == "double"
      struct(
        lit(c.name).as("column"),
        lit(c.kind).as("dtype"),
        col("n_rows").as("n_rows"),
        col(s"nn_${c.name}").as("n_nonnull"),
        col(s"nd_${c.name}").as("n_distinct"),
        (if (numeric) col(s"mnn_${c.name}") else lit(null).cast("double"))
          .as("min_num"),
        (if (numeric) col(s"mxn_${c.name}") else lit(null).cast("double"))
          .as("max_num"),
        (if (numeric) lit(null).cast("string") else col(s"mns_${c.name}"))
          .as("min_str"),
        (if (numeric) lit(null).cast("string") else col(s"mxs_${c.name}"))
          .as("max_str"))
    }
    agged.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Declarative constraint validation: each check contributes the
    * DataFrame of its VIOLATING rows; the report is one count per check
    * with pass/fail status. Scale shape: each violation frame is an
    * equi-anti-join / filter the caller declares (never a cross
    * product), and only COUNTS reach the report — violating rows stay
    * distributed (a caller wanting samples limits the frame itself). */
  def constraintReport(checks: Seq[(String, DataFrame)]): DataFrame = {
    require(checks.nonEmpty, "constraintReport: need at least one check")
    checks.map { case (name, viol) =>
      viol.agg(count(lit(1)).cast("long").as("violations"))
        .select(lit(name).as("check"), col("violations"))
    }.reduce(_ unionByName _)
      .withColumn("status",
        when(col("violations") === 0L, lit("pass")).otherwise(lit("fail")))
  }
}
