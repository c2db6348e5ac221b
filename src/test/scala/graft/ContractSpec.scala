package graft

/** The driver contract's three surfaces must agree: every SURVEY §2 row
  * has a registered query, every registered query has a SURVEY row and a
  * DuckDB oracle. A drift here silently weakens the correctness gate, so
  * it fails the build instead.
  */
class ContractSpec extends SparkSpec {

  private lazy val surveyNames: Set[String] = {
    val src = scala.io.Source.fromFile("SURVEY.md")(scala.io.Codec.UTF8)
    val lines = try src.getLines().toSeq finally src.close()
    val s2 = lines.dropWhile(!_.startsWith("## §2"))
      .takeWhile(l => !l.startsWith("## §3"))
    s2.filter(l => l.startsWith("| ") && !l.startsWith("| ---") && !l.startsWith("| name"))
      .map(_.split("\\|")(1).trim)
      .filter(n => n.nonEmpty && n.matches("[a-z0-9_]+"))
      .toSet
  }

  test("every SURVEY §2 operator row is a registered query and vice versa") {
    val registered = SparkEntry.queries.keySet
    val missingImpl = surveyNames -- registered
    val missingDoc = registered -- surveyNames
    assert(missingImpl.isEmpty, s"SURVEY rows without a query: $missingImpl")
    assert(missingDoc.isEmpty, s"queries without a SURVEY row: $missingDoc")
  }

  test("every registered query has a DuckDB oracle or a declared rows-only slot") {
    val oracles = SparkEntry.oracleSqlFor(spark, "/root/testdata/sf0.001").keySet
    val missing = SparkEntry.queries.keySet -- oracles -- SparkEntry.rowsOnlyQueries
    assert(missing.isEmpty, s"queries without an oracle: $missing")
    val stale = SparkEntry.rowsOnlyQueries -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"rows-only declarations without a query: $stale")
    val both = SparkEntry.rowsOnlyQueries & oracles
    assert(both.isEmpty, s"rows-only declarations that DO have an oracle: $both")
  }
}
