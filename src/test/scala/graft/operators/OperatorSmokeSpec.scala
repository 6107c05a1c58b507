package graft.operators

import graft.{SparkEntry, SparkTestBase}

/** Every registry operator must run green on sf0.001 and return rows
  * (value-level correctness is the driver's DuckDB oracle gate; this spec
  * guards plan validity and non-degenerate output per operator). */
class OperatorSmokeSpec extends SparkTestBase {
  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      assert(q.run(spark, sf).count() > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle references only known tables") {
    val tables = graft.Tables.names.toSet
    SparkEntry.oracleSql.values.foreach { sql =>
      assert(sql.nonEmpty)
    }
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
