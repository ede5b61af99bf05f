package graft

import org.apache.spark.sql.functions._

/** Bucketed tables co-locate join keys at write time, so the join needs
  * no exchange at read time — the pre-partitioning strategy for repeated
  * large-scale joins (SURVEY §7 scale notes). Uses the session's local
  * warehouse (in-memory catalog).
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of two bucketed tables runs without a shuffle exchange") {
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (500 to 1500).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bucketed_l")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bucketed_r")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bucketed_l")
        .join(spark.table("bucketed_r"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 501)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bucketed_l")
      spark.sql("DROP TABLE IF EXISTS bucketed_r")
    }
  }
}
