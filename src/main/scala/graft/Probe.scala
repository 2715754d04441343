package graft

import org.apache.spark.sql.SparkSession

/** Plan-and-timing probe for a single SparkEntry query: prints the
  * formatted physical plan once, then times `reps` fresh executions in
  * one JVM (same session config as [[Bench]], same noop sink, same
  * cache-clear discipline). The tool behind per-query regression
  * attribution: within-JVM repeat times separate plan cost from
  * run-context noise, and the plan dump shows the exchange count the
  * README's scale notes cite.
  *
  * Usage: sbt "runMain graft.Probe q142_mutual_knn_ivf 4"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    // diagnostic tool, so diagnose its own inputs: a typo'd query name or
    // non-numeric rep count gets a usage line, not a raw
    // NoSuchElementException/NumberFormatException stack
    def usage(problem: String): Nothing = {
      System.err.println(s"[probe] $problem")
      System.err.println("usage: sbt \"runMain graft.Probe <query_name> [reps]\"")
      sys.exit(2)
    }
    val name = args.headOption.getOrElse("q142_mutual_knn_ivf")
    if (!SparkEntry.queries.contains(name)) {
      val near = SparkEntry.queries.keys.toSeq.sorted
        .filter(_.startsWith(name.takeWhile(_ != '_'))).take(5)
      usage(s"unknown query '$name'" +
        (if (near.nonEmpty) s"; close matches: ${near.mkString(", ")}"
         else "; see SparkEntry.queries for the full list"))
    }
    val reps = args.drop(1).headOption.map { r =>
      r.toIntOption.filter(_ > 0).getOrElse(usage(s"reps must be a positive int, got '$r'"))
    }.getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // bench-parity scratch: Probe exists to attribute BENCH numbers, so
    // queries whose contract includes a write (index persistence, format
    // round trips, streaming stores) must hit the same tmpfs root the
    // flagged number was measured against — a disk-backed probe of a
    // tmpfs-measured query attributes nothing. Cleaned via shutdown hook
    // (same discipline as Bench's).
    if (sys.props.get("graft.scratch").isEmpty &&
        sys.env.get("SPARK_GRAFT_SCRATCH").isEmpty &&
        new java.io.File("/dev/shm").canWrite) {
      val d = s"/dev/shm/graft-probe-${ProcessHandle.current().pid()}"
      sys.props("graft.scratch") = d
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator()
            .asScala.toSeq.sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: Throwable => () }))
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // same context-cleaner cadence as Bench: broadcast/shuffle remnants
      // accumulate on the cleaner's schedule, and a probe attributing a
      // bench warmth curve must age them the same way
      .config("spark.cleaner.periodicGC.interval", "5min")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional per-job breakdown (-Dgraft.probe.jobs=1): job wall times and
    // stage/task counts, the local-mode substitute for the disabled UI —
    // attributes a query's seconds to scheduling waves vs real compute
    if (sys.props.get("graft.probe.jobs").contains("1")) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            t0.put(j.jobId, System.nanoTime())
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val dt = Option(t0.remove(j.jobId))
              .map(s => (System.nanoTime() - s) / 1e9).getOrElse(-1.0)
            System.err.println(f"[probe-job] job=${j.jobId}%3d ${dt}%7.3f s")
          }
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = s.stageInfo
            val dur = (for {a <- i.completionTime; b <- i.submissionTime}
              yield (a - b) / 1e3).getOrElse(-1.0)
            val m = i.taskMetrics
            val sr = m.shuffleReadMetrics.recordsRead
            val sw = m.shuffleWriteMetrics.recordsWritten
            val in = m.inputMetrics.recordsRead
            System.err.println(f"[probe-stage] stage=${i.stageId}%3d tasks=${i.numTasks}%3d ${dur}%7.3f s  in=$in sr=$sr sw=$sw  ${i.name.take(40)}")
          }
        })
    }
    val fn = SparkEntry.queries(name)
    // one warm pass (plan + janino codegen), as Bench's warmup does
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    fn(spark, sfDir).explain("formatted")
    spark.catalog.clearCache()
    (1 to reps).foreach { i =>
      // construction (driver work in the query builder — e.g. sampled
      // k-means seeding, plan assembly) timed apart from execution: the
      // split attributes a cold-JIT tail to the right phase
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val tExec = (System.nanoTime() - t1) / 1e9
      println(f"[probe] $name rep $i: build $tBuild%.3f s + exec $tExec%.3f s = ${tBuild + tExec}%.3f s")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
