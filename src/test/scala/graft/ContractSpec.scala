package graft

/** The driver contract itself: entry() smoke, registry consistency. */
class ContractSpec extends SparkSpec {

  test("entry() returns rows on sf0.001 (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
    assert(qs.forall(_.matches("[a-z][a-z0-9_]+")))
    info(s"${qs.size} queries, ${os.size} with DuckDB oracles")
  }

  test("every query builds a plan against sf0.001 (no construction-time failures)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.schema.nonEmpty, s"$name produced an empty schema")
    }
  }

  test("oracle SQL strings contain no tab/CR control chars that could break the driver JSON") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains("\r"), s"$k has CR")
    }
  }
}
