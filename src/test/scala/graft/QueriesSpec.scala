package graft

import graft.queries.Registry

/** Registry-wide invariants: every declared query runs at sf0.001 and its
  * Spark-side contract (unique names, oracle presence policy) holds. The
  * value-level check against DuckDB is the driver's t2 gate (replicated by
  * tools/check_oracle.py); these specs catch runtime regressions fast.
  */
class QueriesSpec extends SparkSpec {

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("SparkEntry maps mirror the registry") {
    assert(SparkEntry.queries.keySet === Registry.all.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet ===
      Registry.all.filter(_.oracle.isDefined).map(_.name).toSet)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- Registry.all) {
    test(s"${q.name} runs at sf0.001") {
      val df = q.run(spark, sf)
      val n = df.count()
      // d5/f7 (anti/except) may legitimately be empty; everything else
      // must produce rows on the smallest fixture.
      if (!Set("d5_left_anti", "f7_except").contains(q.name))
        assert(n > 0, s"${q.name} returned no rows")
      assert(df.columns.nonEmpty)
      assert(df.columns.distinct.length === df.columns.length,
        s"${q.name} has duplicate column names")
    }
  }
}
