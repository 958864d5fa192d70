package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Fixture-schema canary: asserts the ADAPTED schema of every `Tables.*`
  * fixture against the live testdata dir. The driver regenerates testdata
  * between rounds and has changed column physical types before (round 5:
  * events.ts flipped INT64-nanos -> TIMESTAMP(MICROS), silently breaking 13
  * queries). This suite turns that class of drift into ONE pinpointed
  * failure naming the table/column/type instead of a scatter of
  * DATATYPE_MISMATCH throws across unrelated suites.
  *
  * The pinned types are the CURRENT working contract every query/oracle pair
  * was verified against — if a pin fails here, audit the queries touching
  * that column, adapt the fixture in [[Tables]], then re-pin.
  */
class TablesSchemaSpec extends SparkSpec {

  private def assertCols(df: DataFrame, table: String, expect: (String, DataType)*): Unit = {
    val actual = df.schema.map(f => f.name -> f.dataType).toMap
    expect.foreach { case (name, dt) =>
      assert(actual.contains(name), s"$table: column '$name' missing; has ${actual.keys.toSeq.sorted}")
      assert(actual(name) == dt,
        s"$table.$name: expected $dt, testdata now yields ${actual(name)} — adapt Tables.$table")
    }
  }

  test("events fixture adapts ts to TimestampType whatever the parquet stores") {
    for (dir <- Seq(sf0, sf1)) {
      val ev = Tables.events(spark, dir)
      assertCols(ev, "events",
        "event_id" -> LongType, "user_id" -> LongType,
        "event_type" -> StringType, "ts" -> TimestampType,
        "value" -> DoubleType, "props" -> StringType)
      // and the instants must be sane (generator era, not 1970 from a
      // mis-scaled epoch): every ts within [2000-01-01, 2100-01-01).
      val n = ev.where(org.apache.spark.sql.functions.expr(
        "ts < timestamp'2000-01-01' OR ts >= timestamp'2100-01-01'")).count()
      assert(n == 0L, s"events.ts: $n instants outside [2000,2100) — epoch scale wrong in $dir")
    }
  }

  test("embeddings fixture: (vec_id LONG, embedding ARRAY<FLOAT>)") {
    assertCols(Tables.embeddings(spark, sf0), "embeddings",
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType)
    assertCols(Tables.points(spark, sf0), "points",
      "id" -> LongType, "vec" -> ArrayType(FloatType, containsNull = true))
  }

  test("documents fixture: doc_id/text/lang/source/n_chars") {
    assertCols(Tables.documents(spark, sf0), "documents",
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
  }

  test("TPC-H fixtures keep the dtypes the oracle SQL depends on") {
    // date-ish columns ship as TIMESTAMP(MICROS, isAdjustedToUTC=false)
    // => Spark TimestampNTZType; every green oracle pair was verified on
    // that reading, so it is pinned as-is.
    assertCols(Tables.lineitem(spark, sf0), "lineitem",
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_tax" -> DoubleType, "l_returnflag" -> StringType,
      "l_linestatus" -> StringType, "l_shipdate" -> TimestampNTZType)
    assertCols(Tables.orders(spark, sf0), "orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType)
    assertCols(Tables.customer(spark, sf0), "customer",
      "c_custkey" -> LongType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)
    assertCols(Tables.supplier(spark, sf0), "supplier",
      "s_suppkey" -> LongType, "s_nationkey" -> IntegerType)
    assertCols(Tables.part(spark, sf0), "part",
      "p_partkey" -> LongType, "p_size" -> IntegerType)
    assertCols(Tables.nation(spark, sf0), "nation",
      "n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType)
    assertCols(Tables.region(spark, sf0), "region", "r_regionkey" -> IntegerType)
  }
}
