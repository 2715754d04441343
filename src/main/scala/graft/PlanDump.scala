package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a list of SparkEntry queries to files —
  * the plan-evidence tool behind the optimization rounds' before/after
  * artifacts (`plans/rNN/<query>_{before,after}.txt`). Plans are captured
  * WITHOUT executing the query (no noop save), so a dump is cheap and safe
  * to run on any tree state.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <query1> [query2 ...]
  *   - writes <outDir>/<query>_<suffix>.txt per query
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query...>")
    val outDir = args(0); val suffix = args(1); val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // scratch redirect as in Bench/Probe so index-persisting queries write
    // to tmpfs during plan construction (some builders execute side jobs)
    if (sys.props.get("graft.scratch").isEmpty &&
        sys.env.get("SPARK_GRAFT_SCRATCH").isEmpty &&
        new java.io.File("/dev/shm").canWrite) {
      val d = s"/dev/shm/graft-plandump-${ProcessHandle.current().pid()}"
      sys.props("graft.scratch") = d
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator()
            .asScala.toSeq.sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: Throwable => () }))
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query $name — skipped")
        case Some(fn) =>
          try {
            val plan = fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
              plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            System.err.println(s"[plandump] wrote $name")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
