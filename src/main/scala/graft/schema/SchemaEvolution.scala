package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.types.CqlTypes

/** Online schema-evolution gate for the streaming pipeline.
  *
  * Reference semantics: events for unregistered tables are allowed
  * ("schema will be discovered", `src/transform/validator.py:78-85`),
  * unknown columns are tolerated as pending changes
  * (`validator.py:94-106`), widening-only ALTERs are applied online, and
  * incompatible types route to the DLQ (`src/transform/schema_mapper.py:
  * 155-167`, strategy `config/schema-mappings.yaml:101-103`).
  *
  * Mid-stream caveat (SURVEY §7.6): a running query's `from_json` schema
  * is fixed, so evolution is applied BETWEEN micro-batches — inside
  * foreachBatch the generic map-typed envelope is re-projected against the
  * registry's latest StructType; a version bump requires no query restart
  * because the envelope schema itself never changes.
  */
object SchemaEvolution {

  sealed trait Outcome
  case class Applied(version: Int, changes: Seq[SchemaChange]) extends Outcome
  case class Discovered(version: Int) extends Outcome
  case class Rejected(reason: String) extends Outcome
  case object Unchanged extends Outcome

  /** Register `observed` for (keyspace, table): discovery for new tables,
    * compat-gated evolution otherwise. */
  def evolve(registry: SchemaRegistry, keyspace: String, table: String,
      observed: StructType): Outcome =
    registry.latest(keyspace, table) match {
      case None =>
        registry.register(keyspace, table, observed) match {
          case Right(v) => Discovered(v.version)
          case Left(e) => Rejected(e)
        }
      case Some(cur) if cur.schema == observed => Unchanged
      case Some(cur) =>
        registry.register(keyspace, table, observed) match {
          case Right(v) => Applied(v.version, SchemaDiff.diff(cur.schema, observed))
          case Left(e) => Rejected(e)
        }
    }

  /** Split a batch of envelope events into (conforming, violating) against
    * the registered CQL types: events carrying a column whose declared
    * type is unsupported are DLQ-bound (schema_mapper.py:155-167). The
    * column→type map comes from the registry's metadata. */
  def gateUnsupported(batch: DataFrame, schema: StructType): (DataFrame, DataFrame) = {
    val unsupported = schema.fields
      .filter(f => CqlTypes.isUnsupported(SchemaMeta.cqlTypeOf(f)))
      .map(_.name)
    if (unsupported.isEmpty) (batch, batch.limit(0))
    else {
      // null-safe: a NULL columns map (legal on DELETEs) must count as
      // "no bad columns" — a bare map_contains_key(NULL, c) is NULL and
      // the row would vanish from BOTH outputs
      val hasBad = unsupported
        .map(c => coalesce(map_contains_key(col("columns"), lit(c)), lit(false)))
        .reduce(_ || _)
      (batch.filter(!hasBad), batch.filter(hasBad))
    }
  }

  /** Project the generic (map-typed) envelope into the registered typed
    * shape: one column per registered field, cast from the string map —
    * the per-table "apply mapping" step (`schema_mapper.py:85-127`)
    * expressed as a single codegen'd projection. */
  def applyTyped(batch: DataFrame, schema: StructType): DataFrame = {
    val typedCols = schema.fields.map { f =>
      val raw = coalesce(
        element_at(col("partition_key"), f.name),
        element_at(col("clustering_key"), f.name),
        element_at(col("columns"), f.name))
      raw.cast(f.dataType).as(f.name)
    }
    batch.select(col("event_id") +: col("event_type") +:
      col("timestamp_micros") +: typedCols.toIndexedSeq: _*)
  }
}
