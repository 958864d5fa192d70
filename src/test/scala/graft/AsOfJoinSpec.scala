package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof: greatest right ts <= left ts per key; inclusive; null when none") {
    val left = Seq(
      (1L, 100L, 10L), // after right rows 90, 100 -> matches 100 (inclusive)
      (2L, 95L, 20L), // between 90 and 100 -> matches 90
      (3L, 50L, 20L), // before any right row -> null
      (4L, 200L, 30L) // key with no right rows at all -> null
    ).toDF("event_id", "key", "ts")
      .select(col("event_id"), col("key").as("k").cast("long"), col("ts"))
    val l = Seq((10L, 100L, 1L), (20L, 95L, 2L), (20L, 50L, 3L), (30L, 200L, 4L))
      .toDF("k", "ts", "event_id")
    val r = Seq((10L, 90L, 900L), (10L, 100L, 1000L), (20L, 90L, 901L))
      .toDF("k", "ts", "rid")
    val out = AsOfJoin.asof(l, r, key = "k", ts = "ts")
      .select(col("event_id"), col("matched.rid").as("rid"))
      .collect().map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(out(1L) === Some(1000L)) // inclusive at equal ts
    assert(out(2L) === Some(901L))
    assert(out(3L) === None) // left ts before all right rows
    assert(out(4L) === None) // no right rows for the key
  }

  test("asof rejects inputs whose columns collide with reserved names") {
    val r = Seq((10L, 90L, 900L)).toDF("k", "ts", "rid")
    // output column `matched` on the left side
    val lMatched = Seq((10L, 100L, 1L)).toDF("k", "ts", "matched")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asof(lMatched, r, key = "k", ts = "ts")
    }
    assert(e1.getMessage.contains("matched"))
    // internal union-tag column on either side
    val lTag = Seq((10L, 100L, 1L)).toDF("k", "ts", "__tag")
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asof(lTag, r, key = "k", ts = "ts")
    }
    assert(e2.getMessage.contains("__tag"))
    // `matched` on the RIGHT side is fine — only the left output collides
    val rMatched = Seq((10L, 90L, 900L)).toDF("k", "ts", "matched")
    val l = Seq((10L, 100L, 1L)).toDF("k", "ts", "event_id")
    val ok = AsOfJoin.asof(l, rMatched, key = "k", ts = "ts")
      .select(col("event_id"), col("matched.matched").as("m")).collect()
    assert(ok.map(r0 => (r0.getLong(0), r0.getLong(1))).toSeq === Seq((1L, 900L)))
  }
}
