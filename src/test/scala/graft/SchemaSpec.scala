package graft

import org.apache.spark.sql.types._
import graft.schema._
import graft.types.CqlTypes

/** Schema system goldens mirroring `tests/unit/test_schema_detection.py`
  * and `tests/unit/test_schema_mapper.py` (add/drop/alter diff, compat
  * matrix, hash stability, type-map goldens). */
class SchemaSpec extends SparkSpec {

  private def users(v: Int): StructType = v match {
    case 1 => StructType(Seq(
      SchemaMeta.field("user_id", "UUID", partitionKey = true),
      SchemaMeta.field("email", "TEXT"),
      SchemaMeta.field("age", "INT")))
    case 2 => StructType(Seq( // age INT→BIGINT widened, phone added
      SchemaMeta.field("user_id", "UUID", partitionKey = true),
      SchemaMeta.field("email", "TEXT"),
      SchemaMeta.field("age", "BIGINT"),
      SchemaMeta.field("phone", "TEXT")))
  }

  test("type map goldens (schema-mappings.yaml:5-49)") {
    assert(CqlTypes.toSpark("UUID").contains(StringType))
    assert(CqlTypes.toSpark("BIGINT").contains(LongType))
    assert(CqlTypes.toSpark("DECIMAL").contains(DecimalType(18, 2)))
    assert(CqlTypes.toSpark("MAP<TEXT,INT>").contains(MapType(StringType, IntegerType)))
    assert(CqlTypes.toSpark("LIST<BIGINT>").contains(ArrayType(LongType)))
    assert(CqlTypes.toPostgres("TIMESTAMP").contains("timestamptz"))
    assert(CqlTypes.toPostgres("MAP<TEXT,TEXT>").contains("jsonb"))
    assert(CqlTypes.toClickHouse("BOOLEAN").contains("UInt8"))
    assert(CqlTypes.toClickHouse("TIME").contains("String"))
    assert(CqlTypes.toTimescale("DOUBLE").contains("double precision"))
  }

  test("unsupported types are rejected (schema_mapper.py:155-167)") {
    for (t <- Seq("FROZEN<LIST<INT>>", "TUPLE<INT,TEXT>", "COUNTER")) {
      assert(CqlTypes.isUnsupported(t), t)
      assert(CqlTypes.toSpark(t).isEmpty, t)
      assert(CqlTypes.toPostgres(t).isEmpty, t)
    }
  }

  test("widening matrix (schema.py:94-100)") {
    assert(CqlTypes.isCompatibleWidening("INT", "BIGINT"))
    assert(CqlTypes.isCompatibleWidening("FLOAT", "DOUBLE"))
    assert(CqlTypes.isCompatibleWidening("DECIMAL", "DOUBLE"))
    assert(CqlTypes.isCompatibleWidening("TEXT", "VARCHAR"))
    assert(CqlTypes.isCompatibleWidening("VARCHAR", "TEXT"))
    assert(!CqlTypes.isCompatibleWidening("BIGINT", "INT")) // narrowing
    assert(!CqlTypes.isCompatibleWidening("TEXT", "INT"))
  }

  test("diff detects ADD + compatible ALTER") {
    val changes = SchemaDiff.diff(users(1), users(2))
    assert(changes.toSet == Set(
      AddColumn("phone", "TEXT"),
      AlterType("age", "INT", "BIGINT", keyRole = false)))
    assert(changes.forall(_.compatible))
    assert(SchemaDiff.isCompatible(users(1), users(2)))
  }

  test("diff detects DROP; narrowing and key-role changes are incompatible") {
    assert(SchemaDiff.diff(users(2), users(1)).contains(DropColumn("phone")))
    // narrowing BIGINT→INT
    val narrowed = StructType(Seq(
      SchemaMeta.field("user_id", "UUID", partitionKey = true),
      SchemaMeta.field("email", "TEXT"),
      SchemaMeta.field("age", "INT"),
      SchemaMeta.field("phone", "TEXT")))
    assert(!SchemaDiff.isCompatible(users(2), narrowed))
    // key-role flip on email
    val reKeyed = StructType(Seq(
      SchemaMeta.field("user_id", "UUID", partitionKey = true),
      SchemaMeta.field("email", "TEXT", clusteringKey = true),
      SchemaMeta.field("age", "INT")))
    assert(!SchemaDiff.isCompatible(users(1), reKeyed))
  }

  test("schema hash is stable and order-independent (schema.py:412-435)") {
    val reordered = StructType(users(1).fields.reverse)
    assert(SchemaDiff.schemaHash(users(1)) == SchemaDiff.schemaHash(reordered))
    assert(SchemaDiff.schemaHash(users(1)) != SchemaDiff.schemaHash(users(2)))
    assert(SchemaDiff.schemaHash(users(1)).matches("[0-9a-f]{64}"))
  }

  test("registry: monotonic versions, idempotent re-register, incompatible rejected") {
    val reg = new SchemaRegistry
    assert(reg.register("ecommerce", "users", users(1)).toOption.get.version == 1)
    assert(reg.register("ecommerce", "users", users(1)).toOption.get.version == 1)
    assert(reg.register("ecommerce", "users", users(2)).toOption.get.version == 2)
    val narrowed = StructType(Seq(
      SchemaMeta.field("user_id", "UUID", partitionKey = true),
      SchemaMeta.field("email", "TEXT"),
      SchemaMeta.field("age", "INT"),
      SchemaMeta.field("phone", "TEXT")))
    assert(reg.register("ecommerce", "users", narrowed).isLeft)
    assert(reg.latest("ecommerce", "users").get.version == 2)
    assert(reg.history("ecommerce", "users").map(_.version) == List(1, 2))
  }
}
