package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE is the RUNTIME half of the skew story (SkewOps.saltedJoin is the
  * explicit half): a sort-merge join whose one hot key dwarfs the rest
  * must be re-planned mid-query into split skew partitions. This pins
  * the claim that the engine's joins survive skew WITHOUT hand-salting
  * when AQE is on — the configuration a 1000-executor deployment runs.
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot partition of a skewed sort-merge join") {
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      // keep AQE from just broadcasting the small side — force SMJ
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // thresholds scaled to test data: a partition is skewed if > 64KB
      // and > 2x the median; split chunks target ~32KB
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      // 200k rows on ONE key + a thin uniform tail vs a small dim table
      val fact = spark.range(200000).select(
          when($"id" < 190000L, lit(7L)).otherwise($"id" % 100).as("k"),
          concat(lit("payload-padding-padding-padding-"),
            $"id".cast("string")).as("payload"))
      val dim = spark.range(100).select($"id".as("k"),
        concat(lit("dim-"), $"id".cast("string")).as("name"))
      val joined = fact.join(dim, Seq("k"))
      // execute THIS dataset's own query execution (count() would build
      // a different one, leaving this AQE plan un-executed and initial)
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark/split the skewed join:\n$finalPlan")
    }
  }
}
