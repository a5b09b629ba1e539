package graft.sinks

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, Row}
import scala.jdk.CollectionConverters._

/** DynamoDB-shaped key-value sink (reference: glue_jobs/load_dynamo.py:57-78
  * — batch_writer puts with hash+range keys, skipping null-key rows).
  *
  * Spark-native shape: `foreachPartition`, so each executor writes its own
  * partition through a batched client — on a real cluster the body is a
  * DynamoDB/clone SDK batch writer; here it is an in-JVM store (local mode =
  * single JVM) so tests can assert exactly what was written. Writes are
  * idempotent puts keyed by (table, pk, sk) — retries are safe, matching the
  * at-least-once executor model.
  */
object KeyValueSink {

  /** Declared hash+range key schema for a KV table (load_dynamo.py:83-117's
    * KeySchema/AttributeDefinitions). Declaring it up front makes the
    * DynamoDB swap-in mechanical: `createTableIfNotExists` maps 1:1 onto the
    * real `client.create_table` call, and `write` can reject frames whose
    * key columns don't match the table's declared schema instead of loading
    * garbage keys.
    */
  final case class KeySchema(hashKey: String, rangeKey: String,
                             hashType: String = "S", rangeType: String = "S")

  /** In-JVM emulation of the KV service (test observability). */
  object KVStore {
    private val store =
      new ConcurrentHashMap[(String, String, String), Map[String, Any]]()
    private val tables = new ConcurrentHashMap[String, KeySchema]()
    def put(table: String, pk: String, sk: String, item: Map[String, Any]): Unit =
      store.put((table, pk, sk), item)
    def get(table: String, pk: String, sk: String): Option[Map[String, Any]] =
      Option(store.get((table, pk, sk)))
    def scan(table: String): Map[(String, String, String), Map[String, Any]] =
      store.asScala.filter(_._1._1 == table).toMap
    def createTable(name: String, schema: KeySchema): Unit =
      tables.putIfAbsent(name, schema)
    def describeTable(name: String): Option[KeySchema] = Option(tables.get(name))
    def clear(): Unit = { store.clear(); tables.clear() }
  }

  /** Provision a table with its key schema if absent
    * (load_dynamo.py:41-55). Idempotent; an existing table with a
    * *different* declared schema is a caller bug and throws.
    */
  def createTableIfNotExists(table: String, schema: KeySchema): Unit = {
    KVStore.createTable(table, schema)
    val existing = KVStore.describeTable(table).get
    require(existing == schema,
      s"table $table already exists with key schema $existing, not $schema")
  }

  /** Write a DataFrame as items keyed by (pkCol, skCol); null-key rows are
    * skipped (load_dynamo.py:122-123,134-135). Batches of `batchSize` mirror
    * the 25-item DynamoDB batch-write limit. If the table was provisioned
    * via `createTableIfNotExists`, the key columns must match its declared
    * schema.
    */
  def write(df: DataFrame, table: String, pkCol: String, skCol: String,
            batchSize: Int = 25): Unit = {
    KVStore.describeTable(table).foreach { schema =>
      require(schema.hashKey == pkCol && schema.rangeKey == skCol,
        s"table $table declares keys (${schema.hashKey}, ${schema.rangeKey}); " +
          s"write supplied ($pkCol, $skCol)")
    }
    val cols = df.columns
    df.foreachPartition { (rows: Iterator[Row]) =>
      rows.grouped(batchSize).foreach { batch =>
        batch.foreach { row =>
          val pk = row.getAs[Any](pkCol)
          val sk = row.getAs[Any](skCol)
          if (pk != null && sk != null) {
            val item = cols.map(c => c -> row.getAs[Any](c)).toMap
            KVStore.put(table, pk.toString, sk.toString, item)
          }
        }
      }
    }
  }
}
