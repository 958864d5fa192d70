package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev profiling main for the sink-backed streaming queries: runs the
  * named queries with a StreamingQueryListener attached and prints the
  * per-batch durationMs breakdown (queryPlanning / getBatch / addBatch /
  * walCommit / commitOffsets / triggerExecution) plus the state-operator
  * metrics (commit, update, removal times; rows) summed per query — the
  * measurement behind the streaming-floor analysis (guide §1: measure
  * first). Not part of the driver contract; changes nothing it profiles.
  *
  * usage: runMain graft.StreamProf <query substrings,comma-separated>
  * env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (Bench's knobs)
  */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val durations = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val states = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    var batches = 0L
    var inputRows = 0L
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        batches += 1
        inputRows += p.numInputRows
        p.durationMs.forEach((k, v) => durations.merge(k, v.longValue(), _ + _))
        p.stateOperators.foreach { so =>
          states.merge(s"${so.operatorName}.commitMs", so.commitTimeMs, _ + _)
          states.merge(s"${so.operatorName}.updatesMs", so.allUpdatesTimeMs, _ + _)
          states.merge(s"${so.operatorName}.removalsMs", so.allRemovalsTimeMs, _ + _)
          states.merge(s"${so.operatorName}.rowsTotal", so.numRowsTotal, math.max)
        }
      }
    })
    try Tables.events(spark, sfDir).count() catch { case _: Throwable => () }
    for ((name, fn) <- SparkEntry.queries.toSeq
         if names.exists(name.contains)) {
      durations.clear(); states.clear(); batches = 0L; inputRows = 0L
      SparkEntry.resetSinkArtifact(name, sfDir)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"== $name wall=$dt%.2f s batches=$batches input_rows=$inputRows")
      import scala.jdk.CollectionConverters._
      durations.asScala.toSeq.sortBy(-_._2).foreach { case (k, v) =>
        println(f"   durationMs.$k%-28s ${v / 1000.0}%8.2f s") }
      states.asScala.toSeq.sorted.foreach { case (k, v) =>
        println(f"   state.$k%-34s $v") }
    }
    spark.stop()
  }
}
