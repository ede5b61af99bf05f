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
    // C2-compile the heavy shared expression machinery BEFORE timing.
    // The recorded bimodality (x_dedup_drop 2.75-10.4 s, x_semdedup
    // 1.1-17.5 s, x_novelty ~8 s first-run — BASELINE.md) is JIT, not
    // plan: the first query to touch a family pays interpreter-mode
    // loops while C2 compiles in the background. One ~0.5 s pass per
    // family (shingle/minhash HOF kernels, dot-product/zip_with HOFs,
    // zlib deflate via the native expression, regex tokenization)
    // front-loads that cost into the untimed prefix. Families, not
    // query plans: whole-stage codegen emits fresh classes per plan,
    // but the hot inner machinery (UTF8String ops, ArrayData access,
    // HOF lambda eval, Deflater JNI) is shared and compiles once.
    locally {
      import org.apache.spark.sql.functions._
      graft.functions.native.NativeFns.register(spark)
      val warm = spark.range(4000).selectExpr(
        "id",
        "repeat(concat('warm token ', cast(id as string), ' '), 24) AS text",
        "transform(sequence(0, 63), i -> cast(pmod(id * (i + 1), 997) AS double) / 997.0) AS emb")
      import graft.functions.native.NativeFns
      warm.select(
          // shingle → minhash → simhash family (native expressions)
          size(NativeFns.minhashSig(
            NativeFns.shingleHashes(col("text"), 5))).as("sig"),
          NativeFns.simhashNative(col("text")).as("sh"),
          // dot-product family: native codegen'd + HOF form
          NativeFns.dotNative(col("emb"), col("emb")).as("d1"),
          aggregate(zip_with(col("emb"), col("emb"), (x, y) => x * y),
            lit(0.0d), (acc, x) => acc + x).as("d2"),
          // zlib deflate family (thread-local Deflater init per core)
          NativeFns.deflateRatio(col("text")).as("z"),
          // regex tokenization / text-stats family
          size(split(lower(col("text")), "[^\\p{L}\\p{N}]+")).as("t"))
        .agg(count(lit(1))).collect()
      ()
    }
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
    // Append the same artifact as one line of run HISTORY: BANDS.json
    // (tools/make_bands.py) is computed over the last N same-code runs,
    // and the driver/judge adjudicate contention-vs-regression against
    // those bands instead of prose precedents. Only full (unfiltered)
    // runs are comparable across invocations, so filtered local runs
    // stay out of the history.
    if (only.isEmpty) {
      val line = full.replace("\n", "") + "\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_RUNS.jsonl"), line.getBytes,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    println(s"""{"metric":"total","value":$totalR,"unit":"sec",""" +
      s""""n_queries":${results.size},"sf":"$sfDir",""" +
      s""""detail_file":"$fullPath"}""")
    spark.stop()
  }
}
