package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Dev profiling main: run the q166 suffix-array build once under a
  * SparkListener and print every job's wall time, stage count, and task
  * count — the per-round floor decomposition (guide §1). Not part of the
  * driver contract. */
object SaProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.put(e.jobId, (System.nanoTime(),
          String.valueOf(e.properties.getProperty("spark.job.description"))))
        stages.addAndGet(e.stageInfos.size)
        tasks.addAndGet(e.stageInfos.map(_.numTasks).sum)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach { case (t0, d) =>
          println(f"[job] id=${e.jobId}%4d wall=${(System.nanoTime() - t0) / 1e6}%8.1f ms  $d")
        }
      }
    })
    import org.apache.spark.sql.functions._
    // warm up
    Tables.documents(spark, sfDir).count()
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("id"), col("text"))
    val t0 = System.nanoTime()
    val out = operators.SuffixArray.build(docs)
      .where(col("pos") % 97 === 0).orderBy(col("pos"))
    out.count()
    println(f"[saprof-total] ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
      s"stages=${stages.get}, tasks=${tasks.get}")
    spark.stop()
  }
}
