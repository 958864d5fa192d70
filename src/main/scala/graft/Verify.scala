package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-only subset knob (same semantics as SPARK_GRAFT_BENCH_ONLY);
    // the driver never sets it, so the contract surface is unchanged
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    // A failed query must NEVER vanish from the artifact (round-5 lesson: 13
    // broken queries looked like a smaller green suite). On failure, replace
    // the query's output dir with an _ERROR marker file — the driver's
    // parquet read of that dir then fails loudly and records an `err` entry
    // for the query instead of an omission. Also aggregate into _errors.json
    // so the failure is visible at every layer.
    var failures = Vector.empty[(String, String)]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}".take(2000)
          System.err.println(s"[verify] $name failed: $msg")
          failures :+= (name -> msg)
          val qDir = Paths.get(outDir, name)
          org.apache.commons.io.FileUtils.deleteQuietly(qDir.toFile)
          Files.createDirectories(qDir)
          Files.writeString(qDir.resolve("_ERROR"), msg)
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSqlFor(sfDir)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    spark.stop()
    // Do NOT exit nonzero: the per-query _ERROR markers already surface each
    // failure as an `err` row in the driver's CORRECTNESS artifact, and a
    // nonzero rc could make the driver drop the whole (mostly-green) run.
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size} queries FAILED: " +
        failures.map(_._1).mkString(", "))
    // one machine-readable LAST line (VERDICT r11 contract repair): an
    // empty driver artifact must be distinguishable from a verify that ran
    // N queries and dumped them — nothing Verify printed before this said
    // how many queries it processed
    val ran = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
    println(s"""{"metric":"verify","n_queries":${ran.size},"n_failed":${failures.size},"failed":${
      failures.map("\"" + _._1 + "\"").mkString("[", ",", "]")},"out":"$outDir"}""")
  }
}
