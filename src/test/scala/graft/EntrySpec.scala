package graft

import graft.SparkSpec

/** Smoke: the driver contract — entry() returns rows; every query runs at
  * sf0.001 and every oracle key has a query.
  */
class EntrySpec extends SparkSpec {

  test("entry returns verdict rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries execute at sf0.001 and return rows") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
