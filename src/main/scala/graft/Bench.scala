package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is executed once untimed (JVM/codegen/parquet-footer
  * warmup) and then once timed, so reported numbers are steady-state
  * throughput rather than first-run JIT noise; queries run in sorted
  * name order for stable attribution.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to every available core (capped at 32 — the harness's
    // local[32] contract): round-1 defaulted to 4, which made the
    // driver-run bench measure a quarter-width machine.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup
    // process-CPU clock: lets a reader separate "query got slower"
    // (cpu grows with wall) from "machine was contended" (wall grows,
    // cpu doesn't — the round-2 bench artifact, see BASELINE.md)
    val procCpuNs: () => Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean =>
          () => b.getProcessCpuTime
        case _ => () => 0L // JVM without the com.sun extension
      }
    // Optional first arg (local iteration only; the driver passes none):
    // comma-separated query names to bench instead of the full set.
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val (t, cpu) = try {
        val w0 = System.nanoTime()
        fn(spark, sfDir).count() // plan + codegen + IO warmup (untimed)
        // C2 compilation is asynchronous: a query whose first run was
        // long may still be executing interpreter-mode loops when the
        // timed run starts (observed 3-7x CPU inflation, bimodal across
        // bench invocations). One extra warmup for just those queries
        // lets the JIT tail finish; sub-second queries don't pay it.
        if ((System.nanoTime() - w0) / 1e9 > 1.0) fn(spark, sfDir).count()
        // drop data caches the warmup created (operators that persist
        // internally, e.g. the MinHash signature stage) so the timed run
        // measures the real pipeline cost, not a cache read
        spark.catalog.clearCache()
        val c0 = procCpuNs()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val c1 = procCpuNs()
        // getProcessCpuTime's documented "unsupported" sentinel is -1;
        // report -1 (unknown) rather than a garbage delta
        ((System.nanoTime() - t0) / 1e9,
          if (c0 < 0 || c1 < 0) -1.0 else (c1 - c0) / 1e9)
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        (-1.0, -1.0)
      }
      (name, t, cpu)
    }
    def jmap(f: ((String, Double, Double)) => Double): String =
      results.map(r => "\"" + r._1 + "\":" + (math.rint(f(r) * 1000) / 1000))
        .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val totalR = math.rint(total * 1000) / 1000
    // Streaming queries pay a per-query harness floor (checkpoint dirs,
    // micro-batch trigger machinery, processAllAvailable drains) that
    // batch plans don't; reporting their subtotal separately lets a
    // round-over-round comparison tell plan cost from harness cost.
    def r3(d: Double) = math.rint(d * 1000) / 1000
    val isStreaming: String => Boolean =
      n => n.startsWith("p_stream_") || n.startsWith("x_stream_")
    val streamRes = results.filter(r => isStreaming(r._1))
    val streamSub = r3(streamRes.map(_._2).filter(_ >= 0).sum)
    val streamCpu = r3(streamRes.map(_._3).filter(_ >= 0).sum)
    // The per-query maps for 140+ queries overflow a tail-truncated
    // stdout capture (BENCH_r04 lost its wall-time map that way), so the
    // COMPLETE artifact — totals first, then both per-query maps — goes
    // to a known file, and stdout carries one short parseable line
    // pointing at it.
    val fullPath = new java.io.File("BENCH_FULL.json").getAbsolutePath
    val full =
      s"""{"metric":"total","value":$totalR,"unit":"sec",
         |"n_queries":${results.size},"sf":"$sfDir",
         |"streaming_subtotal_sec":$streamSub,
         |"streaming_subtotal_cpu_sec":$streamCpu,
         |"n_streaming_queries":${streamRes.size},
         |"queries":${jmap(_._2)},
         |"queries_cpu_sec":${jmap(_._3)}}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(fullPath), full)
    println(s"""{"metric":"total","value":$totalR,"unit":"sec",""" +
      s""""n_queries":${results.size},"sf":"$sfDir",""" +
      s""""detail_file":"$fullPath"}""")
    spark.stop()
  }
}
