package graft

class GraftSqlSpec extends SparkTestBase {
  import spark.implicits._

  test("the engine is drivable through spark.sql over registered views") {
    GraftSql.register(spark, "/root/testdata/sf0.001")
    // the daily-KPI transform, written as SQL, equals the DataFrame operator
    val viaSql = spark.sql(
      """SELECT CAST(ts AS DATE) AS event_date, c_mktsegment AS segment,
        |       count(DISTINCT user_id) AS unique_users
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2""".stripMargin)
      .as[(java.sql.Date, String, Long)].collect().toSet
    val viaDf = SparkEntry.queries("q03_daily_kpis")(spark, "/root/testdata/sf0.001")
      .select("event_date", "segment", "unique_users")
      .as[(java.sql.Date, String, Long)].collect().toSet
    viaSql shouldBe viaDf
  }

  test("custom kernels are callable from SQL over the views") {
    GraftSql.register(spark, "/root/testdata/sf0.001")
    val r = spark.sql(
      """SELECT max(graft_vector_dot(embedding, embedding)) AS m
        |FROM embeddings""".stripMargin).as[Double].head()
    r should be > 0.0
  }
}
