package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line with per-query seconds.
  *
  * Each query is forced through the `noop` sink rather than `count()`:
  * count() lets Catalyst prune away the projected columns, which would
  * benchmark a cheaper plan than the one users run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen paths once so per-query numbers measure the
    // engine, not first-call classloading.
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // Two passes per query, report the second: pass 1 pays plan + janino
    // codegen compilation (driver-side, amortized to zero at 100 TB); pass 2
    // is the steady-state execution cost — the number that scales with data.
    // Optional comma-separated query-name filter for focused A/B runs
    // (e.g. SPARK_GRAFT_BENCH_ONLY=q33_minhash_lsh,q37_emb_pairs).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(f => SparkEntry.queries.filter(kv => f(kv._1)))
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
        val t = (System.nanoTime() - t0) / 1e9
        // Drop anything the query persisted (e.g. minhash doc state), outside
        // the timed region: pass 2 must rebuild it (cache reuse would hide
        // real compute — Spark's CacheManager matches canonicalized plans),
        // and later queries must not run under this query's cache pressure.
        spark.catalog.clearCache()
        // Nudge the context cleaner: broadcast/shuffle remnants from ~90
        // prior query runs otherwise surface as a multi-second full-GC pause
        // attributed to whichever query it lands on.
        System.gc()
        t
      }
      once()
      name -> once()
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // sbt prefixes stdout with [info], which breaks machine parsing of the
    // metric line — also write it verbatim to a file the driver can read.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
