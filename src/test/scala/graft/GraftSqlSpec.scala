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

  test("operators are drivable through SQL views (round 5)") {
    val dir = "/root/testdata/sf0.001"
    GraftSql.registerOperators(spark, dir, Set(
      "q49_neardup_corpus", "q109_bm25_topk", "q33_quality_report",
      "q196_fd_audit"))
    // the composed dedup pipeline through SQL == the Scala API
    val viaSql = spark.sql(
      "SELECT count(*) AS n FROM graft_q49_neardup_corpus WHERE is_canonical")
      .as[Long].head()
    val viaApi = SparkEntry.queries("q49_neardup_corpus")(spark, dir)
      .filter($"is_canonical").count()
    viaSql shouldBe viaApi
    viaSql should be > 0L
    // a projection + join THROUGH the view composes with plain tables
    val joined = spark.sql(
      """SELECT q.doc_id, d.lang
        |FROM graft_q49_neardup_corpus q JOIN documents d USING (doc_id)
        |WHERE NOT q.is_canonical""".stripMargin)
    joined.count() should be > 0L
    joined.columns.toSeq shouldBe Seq("doc_id", "lang")
    // analytics and report operators answer SQL directly
    spark.sql("SELECT * FROM graft_q109_bm25_topk").count() should be > 0L
    spark.sql(
      "SELECT n_violating FROM graft_q196_fd_audit WHERE lhs = 'o_orderkey'")
      .as[Long].head() shouldBe 0L
  }
}
