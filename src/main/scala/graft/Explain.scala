package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: print the formatted physical plan and steady-state
  * timing for one named query (or all).
  * Run: sbt "runMain graft.Explain <queryName|all> [sfDir]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("all")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup
    val targets =
      if (name == "all") SparkEntry.queries.toSeq.sortBy(_._1)
      else Seq(name -> SparkEntry.queries(name))
    targets.foreach { case (n, fn) =>
      println(s"===== $n =====")
      val df = fn(spark, sfDir)
      if (sys.env.get("GRAFT_EXPLAIN").forall(_ == "1")) df.explain("formatted")
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val cnt = df.count()
        println(f"  run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($cnt rows)")
      }
    }
    spark.stop()
  }
}
