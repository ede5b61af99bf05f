package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must make the native functions SQL-resolvable in a
  * session built with `withExtensions` — no NativeFns.register call —
  * which is the deployment path (`spark.sql.extensions=graft.GraftExtensions`).
  *
  * Runs against its own session: extensions only apply at session build
  * time, so the suite stops whatever shared session exists and leaves a
  * clean slate for the next suite's getOrCreate.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("functions injected via SparkSessionExtensions resolve in SQL") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |       graft_simhash('hello world hello') AS sh,
          |       graft_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j
          |""".stripMargin).collect().head
      assert(math.abs(r.getDouble(0) - 11.0) < 1e-9)
      assert(r.getLong(1) != 0L)
      assert(math.abs(r.getDouble(2) - 0.5) < 1e-9)
      // catalog-level DESCRIBE works for injected (non-temp) functions
      val desc = spark.sql("DESCRIBE FUNCTION graft_dot")
        .collect().map(_.getString(0)).mkString("\n")
      assert(desc.contains("Function: graft_dot"), desc)
      // the usage doc must reach the catalog metadata (a swapped
      // ExpressionInfo ctor would put the name there instead)
      assert(desc.contains("double-array dot product"), desc)
      // graft_hilbert argument validation (ADVICE r9): BIGINT literal
      // bits works (numeric match, not asInstanceOf[Int]); wrong arity
      // and a non-foldable bits fail as ANALYSIS errors with the
      // function's own message, not a ClassCast/IndexOutOfBounds
      val h = spark.sql(
        "SELECT graft_hilbert(3L, 5L, CAST(8 AS BIGINT)) AS h")
        .collect().head.getLong(0)
      assert(h == spark.sql("SELECT graft_hilbert(3L, 5L, 8) AS h")
        .collect().head.getLong(0))
      // the registry may wrap the builder's AnalysisException — what
      // matters is that the function's own message reaches the user at
      // ANALYSIS time, not a ClassCast/IndexOutOfBounds at runtime
      def analysisMessage(sql: String): String = {
        val e = intercept[Exception] { spark.sql(sql).collect() }
        Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).map(_.getMessage).mkString("\n")
      }
      assert(analysisMessage("SELECT graft_hilbert(3L, 5L)")
        .contains("got 2 arguments"))
      assert(analysisMessage("SELECT graft_hilbert(3L, 5L, " +
        "CAST(id AS INT)) FROM range(1)").contains("foldable"))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
