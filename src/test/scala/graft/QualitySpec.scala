package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Quality

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("profile: counts, distincts, nulls, per-kind min/max") {
    val t1 = Timestamp.valueOf("2001-02-03 04:05:06")
    val t2 = Timestamp.valueOf("1999-12-31 23:59:59")
    val df = Seq(
      (1L, Option(2.5), Option("b"), t1),
      (2L, None: Option[Double], Option("a"), t2),
      (3L, Option(7.25), None: Option[String], t1))
      .toDF("k", "v", "s", "ts")
    val got = Quality.profile(df, Seq(
      Quality.ColSpec("k", "integral"), Quality.ColSpec("v", "double"),
      Quality.ColSpec("s", "string"), Quality.ColSpec("ts", "timestamp")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), Option(r.get(5)), Option(r.get(6)),
        Option(r.get(7)), Option(r.get(8))))
    assert(got.toSeq === Seq(
      ("k", "integral", 3L, 3L, 3L, Some(1.0), Some(3.0), None, None),
      ("v", "double", 3L, 2L, 2L, Some(2.5), Some(7.25), None, None),
      ("s", "string", 3L, 2L, 2L, None, None, Some("a"), Some("b")),
      ("ts", "timestamp", 3L, 3L, 2L, None, None,
        Some("1999-12-31 23:59:59"), Some("2001-02-03 04:05:06"))))
  }

  test("constraintReport: pass and fail statuses from violation counts") {
    val base = Seq(1L, 2L, 2L, 3L).toDF("x")
    val got = Quality.constraintReport(Seq(
      "x_unique" -> base.groupBy(col("x")).agg(count(lit(1)).as("n"))
        .where(col("n") > 1),
      "x_positive" -> base.where(col("x") <= 0)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq === Seq(
      ("x_unique", 1L, "fail"),
      ("x_positive", 0L, "pass")))
  }
}
