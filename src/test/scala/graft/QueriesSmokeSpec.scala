package graft

/** Every registered query must run and return rows on sf0.001 — the fast
  * regression net (full value-level checking is the DuckDB gate;
  * see tools/verify_local.py).
  */
class QueriesSmokeSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name returns rows on sf0.001") {
      assert(fn(spark, sf0001).count() > 0, s"$name returned 0 rows")
    }
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
