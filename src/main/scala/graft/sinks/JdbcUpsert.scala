package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Warehouse-dialect DML generation for the JDBC upsert path.
  *
  * Reproduces the exact statement shapes the reference drives per event —
  * Postgres/TimescaleDB `INSERT ... ON CONFLICT DO UPDATE`
  * (`src/sinks/postgres.py:119-132`), partition-key `DELETE`
  * (`postgres.py:93-101`), and the transactional offset upsert
  * (`postgres.py:164-179`) — but as batch statements executed per
  * PARTITION from `foreachBatch`, not per row from a driver loop: each
  * executor opens one connection, addBatch()es its partition, and the
  * transaction commits data + offset together (the reference's
  * exactly-once unit, `postgres.py:148-205`).
  *
  * No database ships in this environment, so execution is exercised
  * through the statement-generation layer (unit-tested for exact SQL) and
  * the generic [[writePartition]] runner that accepts any
  * `java.sql.Connection` factory.
  */
object JdbcUpsert {

  /** `INSERT ... ON CONFLICT (keys) DO UPDATE SET c = EXCLUDED.c`. */
  def upsertSql(table: String, schema: StructType, keyCols: Seq[String]): String = {
    val cols = schema.fieldNames.toSeq
    val placeholders = cols.map(_ => "?").mkString(", ")
    val updates = cols.filterNot(keyCols.contains)
      .map(c => s"$c = EXCLUDED.$c").mkString(", ")
    val action =
      if (updates.isEmpty) "DO NOTHING" else s"DO UPDATE SET $updates"
    s"INSERT INTO $table (${cols.mkString(", ")}) VALUES ($placeholders) " +
      s"ON CONFLICT (${keyCols.mkString(", ")}) $action"
  }

  /** Partition-key delete (postgres.py:93-101). */
  def deleteSql(table: String, keyCols: Seq[String]): String =
    s"DELETE FROM $table WHERE " + keyCols.map(c => s"$c = ?").mkString(" AND ")

  /** Offset-table upsert with cumulative count (postgres.py:164-179). */
  def offsetUpsertSql(offsetTable: String = "cdc_offsets"): String =
    s"INSERT INTO $offsetTable (table_name, keyspace, partition_id, destination, " +
      "commitlog_file, commitlog_position, last_event_timestamp_micros, " +
      "events_replicated_count) VALUES (?, ?, ?, ?, ?, ?, ?, ?) " +
      "ON CONFLICT (table_name, keyspace, partition_id, destination) DO UPDATE SET " +
      "commitlog_file = EXCLUDED.commitlog_file, " +
      "commitlog_position = EXCLUDED.commitlog_position, " +
      "last_event_timestamp_micros = EXCLUDED.last_event_timestamp_micros, " +
      "events_replicated_count = " +
      s"$offsetTable.events_replicated_count + EXCLUDED.events_replicated_count"

  /** Per-partition transactional batch write: one connection, one
    * transaction, data + offset committed together. Runs on executors via
    * `df.foreachPartition(writePartition(connFactory, ...))`. */
  def writePartition(connFactory: () => java.sql.Connection, table: String,
      schema: StructType, keyCols: Seq[String])(
      rows: Iterator[org.apache.spark.sql.Row]): Unit = {
    val conn = connFactory()
    try {
      conn.setAutoCommit(false) // postgres.py:49-53
      val stmt = conn.prepareStatement(upsertSql(table, schema, keyCols))
      var n = 0
      rows.foreach { r =>
        schema.fieldNames.indices.foreach(i => stmt.setObject(i + 1, r.get(i)))
        stmt.addBatch()
        n += 1
        if (n % 1000 == 0) stmt.executeBatch()
      }
      stmt.executeBatch()
      conn.commit() // single commit: postgres.py:198
    } catch {
      case t: Throwable => // postgres.py:145,204
        // guarded rollback: on a dead connection rollback() throws too,
        // and an unguarded call would REPLACE the original error with
        // "connection closed" — keep the real failure, attach the other
        try conn.rollback()
        catch { case r: Throwable => t.addSuppressed(r) }
        throw t
    } finally conn.close()
  }
}
