package graft

/** Catalog-wide smoke: every registered query must at least ANALYZE against
  * the sf0.001 tables (schema resolution catches renamed columns, bad
  * casts, unresolved functions without executing a job), every oracle key
  * must reference a registered query, and the flagship entry must run.
  */
class CatalogSpec extends SparkTestBase {

  test("every query analyzes against sf0.001") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, q) =>
      withClue(s"$name: ") {
        noException should be thrownBy q(spark, dir).schema
      }
    }
  }

  test("every oracle key names a registered query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    unknown shouldBe empty
  }

  test("the flagship entry returns rows") {
    SparkEntry.entry(spark).count() should be > 0L
  }
}
