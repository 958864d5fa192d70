package graft
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for the named queries to text files —
  * the optimization rounds' plan-evidence artifact (plans/r<N>/). Usage:
  *   runMain graft.PlanDump <outDir> <suffix> <query substrings...>
  * e.g. runMain graft.PlanDump plans/r11 before q167,q178
  * Runs against SPARK_GRAFT_SF_DIR (default sf0.1) at SPARK_GRAFT_CPUS
  * so the dumped plans are the bench session's. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    // varargs per the usage string: every remaining arg contributes
    // (space- or comma-separated) substrings — args beyond the third were
    // silently ignored before (ADVICE r11)
    val names = args.drop(2).flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "usage: PlanDump <outDir> <suffix> <query substrings...>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // bucketed scans report their sortBy order (writeBucketed
      // guarantees the one-file-per-bucket layout that makes the claim
      // sound), so bucket-side SMJ sorts are elided (r12, guide SS2.4)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.prebuildMemos(spark, sfDir) catch { case _: Throwable => () }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val matched = SparkEntry.queries.toSeq
      .filter { case (name, _) => names.exists(name.contains) }
    require(matched.nonEmpty,
      s"no query matches any of: ${names.mkString(", ")}")
    for ((name, fn) <- matched) {
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"dumped $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
