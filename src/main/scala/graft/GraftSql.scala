package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-first entry point: register every test table as a temp view (plus
  * the graft custom functions), so the whole engine is drivable through
  * `spark.sql(...)` — the interface ad-hoc users and BI layers speak.
  */
object GraftSql {

  /** Register all tables under `dir` as temp views named like the tables. */
  def register(spark: SparkSession, dir: String): Unit = {
    GraftFunctions.register(spark)
    Tables.names.foreach { name =>
      Tables.load(spark, dir, name).createOrReplaceTempView(name)
    }
  }

  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
