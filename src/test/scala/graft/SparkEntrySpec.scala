package graft

/** Driver-contract smoke: the flagship entry and every catalog query
  * must run (and the flagship must return rows) on the sf0.001 smoke
  * data — this is exactly what the round driver checks first, so a
  * regression here fails fast locally instead of burning a round. */
class SparkEntrySpec extends SparkTestBase {

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("catalog keys are unique and every oracle key has a query") {
    val names = SparkEntry.queries.keys.toSet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
    assert(names.size == SparkEntry.catalog.size)
  }

  test("every catalog entry executes and is non-empty on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          if (fn(spark, "/root/testdata/sf0.001").isEmpty) Some(s"$name: empty")
          else None
        } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
