package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.BinFormat
import graft.sources.BinFormat.F32

class FbinV2Spec extends SparkSpec {

  lazy val tmp = Files.createTempDirectory("graft-fbinv2").toString
  lazy val path: String = {
    val p = s"$tmp/v2.fbin"
    BinFormat.write(Tables.points(spark, sf0).where(col("id") < 100), p, F32)
    p
  }

  private def v2 = spark.read.format("fbin").load(path)

  test("DSv2 read matches the RDD reader bit-for-bit") {
    val rdd = BinFormat.read(spark, path, F32)
    assert(v2.count() === 100)
    assert(v2.join(rdd.withColumnRenamed("vec", "o"), "id")
      .where(col("vec") =!= col("o")).count() === 0)
  }

  test("id-range filters narrow the planned scan (pushdown)") {
    val filtered = v2.where(col("id") >= 10 && col("id") < 15)
    val rows = filtered.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(10L, 11L, 12L, 13L, 14L))
    // the scan itself reports the narrowed range (planned IO, not post-filter)
    val scanDesc = filtered.queryExecution.executedPlan.toString
    assert(scanDesc.contains("rows=[10,15)"), s"scan not narrowed:\n$scanDesc")
  }

  test("column pruning drops the payload from the scan") {
    val idsOnly = v2.select(col("id"))
    assert(idsOnly.queryExecution.executedPlan.toString.contains("cols=id"))
    assert(idsOnly.agg(count(lit(1)), max(col("id"))).head().toSeq === Seq(100L, 99L))
  }

  test("equality pushdown plans a single row") {
    val one = v2.where(col("id") === 42)
    assert(one.queryExecution.executedPlan.toString.contains("rows=[42,43)"))
    assert(one.select("id").head().getLong(0) === 42L)
  }
}
