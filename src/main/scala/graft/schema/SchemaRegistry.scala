package graft.schema

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.types._
import graft.types.CqlTypes

/** Versioned table-schema tracking with diff + compatibility gating.
  *
  * Spark-native re-expression of the reference's schema system:
  * `SchemaVersion`/`TableSchema` (`src/models/schema.py:116-295, 298-435`),
  * diffing (`schema.py:235-280`, `TableSchema.compare` at `319-391`) and the
  * compat rules (`schema.py:62-102, 331-356`). Column roles and CQL types
  * ride in `StructField.metadata` so a registered schema is one plain
  * `StructType` — usable directly in `from_json` / DataFrame plans.
  */
object SchemaMeta {
  val CqlType = "cqlType"
  val PartitionKey = "isPartitionKey"
  val ClusteringKey = "isClusteringKey"

  def field(name: String, cqlType: String, partitionKey: Boolean = false,
      clusteringKey: Boolean = false): StructField = {
    val dt = CqlTypes.toSpark(cqlType).getOrElse(StringType)
    StructField(name, dt, nullable = !(partitionKey || clusteringKey),
      new MetadataBuilder()
        .putString(CqlType, cqlType.trim.toUpperCase)
        .putBoolean(PartitionKey, partitionKey)
        .putBoolean(ClusteringKey, clusteringKey)
        .build())
  }

  def cqlTypeOf(f: StructField): String =
    if (f.metadata.contains(CqlType)) f.metadata.getString(CqlType) else ""
  def isPartitionKey(f: StructField): Boolean =
    f.metadata.contains(PartitionKey) && f.metadata.getBoolean(PartitionKey)
  def isClusteringKey(f: StructField): Boolean =
    f.metadata.contains(ClusteringKey) && f.metadata.getBoolean(ClusteringKey)
}

/** One detected change between two schema versions
  * (ADD_COLUMN / DROP_COLUMN / ALTER_TYPE, `src/models/schema.py:13-19`). */
sealed trait SchemaChange {
  def column: String
  /** Whether the change may be applied online (reference compat matrix). */
  def compatible: Boolean
}
case class AddColumn(column: String, cqlType: String) extends SchemaChange {
  val compatible = true // schema.py:62-66 — additions always compatible
}
case class DropColumn(column: String) extends SchemaChange {
  val compatible = true // schema.py:68-72 — drops always compatible
}
case class AlterType(column: String, fromCql: String, toCql: String,
    keyRole: Boolean) extends SchemaChange {
  // widening-only, never on key columns (schema.py:74-102, 331-356)
  val compatible: Boolean =
    !keyRole && CqlTypes.isCompatibleWidening(fromCql, toCql)
}

object SchemaDiff {
  /** Structural diff of two versions of one table's schema. */
  def diff(prev: StructType, next: StructType): Seq[SchemaChange] = {
    val prevByName = prev.fields.map(f => f.name -> f).toMap
    val nextByName = next.fields.map(f => f.name -> f).toMap
    val added = next.fields.collect {
      case f if !prevByName.contains(f.name) =>
        AddColumn(f.name, SchemaMeta.cqlTypeOf(f))
    }
    val dropped = prev.fields.collect {
      case f if !nextByName.contains(f.name) => DropColumn(f.name)
    }
    // a type change is visible through EITHER the declared CQL type or the
    // Spark DataType: schemas built by plain inference carry no cqlType
    // metadata, and comparing only the (empty) metadata strings would wave
    // an int→string flip through as a no-change compatible evolution
    def typeTag(f: org.apache.spark.sql.types.StructField): String = {
      val cql = SchemaMeta.cqlTypeOf(f)
      if (cql.nonEmpty) cql else f.dataType.catalogString
    }
    val altered = next.fields.flatMap { f =>
      prevByName.get(f.name).collect {
        case p if typeTag(p) != typeTag(f) =>
          AlterType(f.name, typeTag(p), typeTag(f),
            keyRole = SchemaMeta.isPartitionKey(p) || SchemaMeta.isClusteringKey(p) ||
              SchemaMeta.isPartitionKey(f) || SchemaMeta.isClusteringKey(f))
      }
    }
    (added ++ dropped ++ altered).toSeq
  }

  /** Key-role changes are always incompatible (schema.py:331-356): a column
    * may not gain or lose partition/clustering-key status between versions —
    * which includes ADDING a key column or DROPPING one (the upsert
    * identity would change mid-stream), so the key-column SETS must be
    * identical, not merely agree on the intersection. */
  def keyRolesStable(prev: StructType, next: StructType): Boolean = {
    def keySets(s: StructType) = (
      s.fields.filter(SchemaMeta.isPartitionKey).map(_.name).toSet,
      s.fields.filter(SchemaMeta.isClusteringKey).map(_.name).toSet)
    keySets(prev) == keySets(next)
  }

  def isCompatible(prev: StructType, next: StructType): Boolean =
    keyRolesStable(prev, next) && diff(prev, next).forall(_.compatible)

  /** SHA-256 of the canonical schema rendering, mirroring
    * `src/models/schema.py:412-435` (sorted columns, stable separators). */
  def schemaHash(s: StructType): String = {
    val canonical = s.fields.sortBy(_.name).map { f =>
      s"${f.name}:${SchemaMeta.cqlTypeOf(f)}:" +
        s"${SchemaMeta.isPartitionKey(f)}:${SchemaMeta.isClusteringKey(f)}"
    }.mkString("|")
    MessageDigest.getInstance("SHA-256")
      .digest(canonical.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }
}

/** Monotonically versioned per-table schema registry
  * (`src/models/schema.py:116-233`: version_number increments, registration
  * rejects incompatible evolution). Thread-safe; driver-side only — the
  * registered `StructType` flows into executors through the query plan. */
final class SchemaRegistry {
  case class Versioned(version: Int, schema: StructType, hash: String)
  private val state =
    scala.collection.concurrent.TrieMap.empty[(String, String), List[Versioned]]

  def register(keyspace: String, table: String, schema: StructType): Either[String, Versioned] =
    synchronized {
      val key = (keyspace, table)
      val history = state.getOrElse(key, Nil)
      history.headOption match {
        case Some(cur) if cur.schema == schema => Right(cur) // idempotent
        case Some(cur) if !SchemaDiff.isCompatible(cur.schema, schema) =>
          Left(SchemaDiff.diff(cur.schema, schema).filterNot(_.compatible)
            .map(c => s"incompatible change on '${c.column}': $c").mkString("; "))
        case prev =>
          val v = Versioned(prev.map(_.version).getOrElse(0) + 1, schema,
            SchemaDiff.schemaHash(schema))
          state.update(key, v :: history)
          Right(v)
      }
    }

  def latest(keyspace: String, table: String): Option[Versioned] =
    state.get((keyspace, table)).flatMap(_.headOption)

  def history(keyspace: String, table: String): List[Versioned] =
    state.getOrElse((keyspace, table), Nil).reverse
}
