package graft.types

import org.apache.spark.sql.types._

/** CQL source types and their warehouse mappings.
  *
  * Re-expresses the reference's config-declared type system
  * (`config/schema-mappings.yaml:5-49`, hardcoded fallback at
  * `src/transform/schema_mapper.py:57-83`) as a total Scala function into
  * Spark `DataType`s plus the three destination type-name tables. The
  * widening-compatibility matrix mirrors `src/models/schema.py:94-100`;
  * unsupported-type detection mirrors `src/transform/schema_mapper.py:155-167`.
  */
object CqlTypes {

  /** Canonical (upper-cased, trimmed) CQL type name. */
  private def canon(cql: String): String = cql.trim.toUpperCase

  /** Types the reference routes to the DLQ as unsupported
    * (`schema_mapper.py:155-167`, strategy `dlq` in
    * `config/schema-mappings.yaml:101-103`). */
  def isUnsupported(cql: String): Boolean = {
    val c = canon(cql)
    c.startsWith("FROZEN<") || c.startsWith("TUPLE<") || c == "COUNTER"
  }

  /** CQL → Spark SQL type (SURVEY §1.2 table). Collections map to real
    * Spark complex types internally; serialization to JSON happens only at
    * sink boundaries. */
  def toSpark(cql: String): Option[DataType] = {
    val c = canon(cql)
    if (isUnsupported(c)) None
    else c match {
      case "UUID" | "TIMEUUID" => Some(StringType)
      case "TEXT" | "VARCHAR" | "ASCII" => Some(StringType)
      case "INT" => Some(IntegerType)
      case "SMALLINT" => Some(ShortType)
      case "TINYINT" => Some(ByteType)
      case "BIGINT" | "VARINT" => Some(LongType)
      case "FLOAT" => Some(FloatType)
      case "DOUBLE" => Some(DoubleType)
      case "DECIMAL" => Some(DecimalType(18, 2))
      case "BOOLEAN" => Some(BooleanType)
      case "TIMESTAMP" => Some(TimestampType)
      case "DATE" => Some(DateType)
      case "TIME" => Some(StringType) // no native TIME; yaml:40 precedent
      case "BLOB" => Some(BinaryType)
      case "INET" => Some(StringType)
      case _ if c.startsWith("MAP<") =>
        for {
          (k, v) <- splitTwo(inner(c, "MAP<"))
          kt <- toSpark(k); vt <- toSpark(v)
        } yield MapType(kt, vt)
      case _ if c.startsWith("LIST<") =>
        toSpark(inner(c, "LIST<")).map(ArrayType(_))
      case _ if c.startsWith("SET<") =>
        toSpark(inner(c, "SET<")).map(ArrayType(_))
      case _ => None
    }
  }

  private def inner(c: String, prefix: String): String =
    c.stripPrefix(prefix).stripSuffix(">")

  private def splitTwo(s: String): Option[(String, String)] = {
    // split on the top-level comma (nested generics carry their own commas)
    var depth = 0
    s.zipWithIndex.collectFirst {
      case ('<', _) if { depth += 1; false } => 0
      case ('>', _) if { depth -= 1; false } => 0
      case (',', i) if depth == 0 => i
    }.map(i => (s.substring(0, i), s.substring(i + 1)))
  }

  /** CQL → Postgres type name (`config/schema-mappings.yaml:6-25`). */
  def toPostgres(cql: String): Option[String] = {
    val c = canon(cql)
    if (isUnsupported(c)) None
    else c match {
      case "UUID" => Some("uuid")
      case "TEXT" => Some("text")
      case "VARCHAR" => Some("varchar")
      case "INT" => Some("integer")
      case "BIGINT" => Some("bigint")
      case "FLOAT" => Some("real")
      case "DOUBLE" => Some("double precision")
      case "DECIMAL" => Some("numeric")
      case "BOOLEAN" => Some("boolean")
      case "TIMESTAMP" => Some("timestamptz")
      case "DATE" => Some("date")
      case "TIME" => Some("time")
      case "BLOB" => Some("bytea")
      case _ if c.startsWith("MAP<") || c.startsWith("LIST<") ||
        c.startsWith("SET<") => Some("jsonb") // yaml:21-25
      case _ => None
    }
  }

  /** CQL → ClickHouse type name (`config/schema-mappings.yaml:27-46`). */
  def toClickHouse(cql: String): Option[String] = {
    val c = canon(cql)
    if (isUnsupported(c)) None
    else c match {
      case "UUID" => Some("UUID")
      case "TEXT" | "VARCHAR" => Some("String")
      case "INT" => Some("Int32")
      case "BIGINT" => Some("Int64")
      case "FLOAT" => Some("Float32")
      case "DOUBLE" => Some("Float64")
      case "DECIMAL" => Some("Decimal(18,2)")
      case "BOOLEAN" => Some("UInt8")
      case "TIMESTAMP" => Some("DateTime64(3)")
      case "DATE" => Some("Date")
      case "TIME" => Some("String") // no native TIME, yaml:40
      case "BLOB" => Some("String")
      case _ if c.startsWith("MAP<") || c.startsWith("LIST<") ||
        c.startsWith("SET<") => Some("String") // JSON text, yaml:42-46
      case _ => None
    }
  }

  /** CQL → TimescaleDB: inherits Postgres (`schema_mapper.py:47-49`). */
  def toTimescale(cql: String): Option[String] = toPostgres(cql)

  /** Widening conversions the reference considers compatible
    * (`src/models/schema.py:94-100`): int→bigint, float→double,
    * decimal→double, text↔varchar. Identity is always compatible. */
  def isCompatibleWidening(from: String, to: String): Boolean = {
    val (f, t) = (canon(from), canon(to))
    f == t || ((f, t) match {
      case ("INT", "BIGINT") => true
      case ("FLOAT", "DOUBLE") => true
      case ("DECIMAL", "DOUBLE") => true
      case ("TEXT", "VARCHAR") | ("VARCHAR", "TEXT") => true
      case _ => false
    })
  }
}
