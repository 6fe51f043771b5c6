package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{ClickHouseDdl, ClickHouseDialect}

/** The ClickHouse dialect must reproduce the reference's sink DDL
  * verbatim (golden test against clickhouse/init/01-init-tables.sql —
  * the tables a user pointing this engine at an actual ClickHouse
  * writes into) and map types soundly in both directions.
  */
class ClickHouseDialectSpec extends AnyFunSuite {

  private val refSql = "/root/reference/clickhouse/init/01-init-tables.sql"

  /** Whitespace-insensitive token stream — golden comparison robust to
    * line wrapping but to nothing else. */
  private def toks(s: String): Seq[String] = s.split("\\s+").filter(_.nonEmpty).toSeq

  /** The reference file's CREATE TABLE statement for `name`, comments
    * stripped. */
  private def referenceDdl(name: String): String = {
    val text = Files.readString(Paths.get(refSql))
      .linesIterator.filterNot(_.trim.startsWith("--")).mkString("\n")
    val start = text.indexOf(s"CREATE TABLE IF NOT EXISTS $name")
    assert(start >= 0, s"reference DDL for $name not found")
    val end = text.indexOf(";", start)
    text.substring(start, end + 1)
  }

  test("golden: nodes_cdc DDL matches the reference table") {
    val ddl = ClickHouseDdl.createTable(
      table = "nodes_cdc",
      schema = Encoders.product[NodeEvent].schema,
      engine = ClickHouseDdl.MergeTree,
      orderBy = Seq("event_timestamp", "event_id"),
      partitionBy = Some(ClickHouseDdl.toYYYYMM("event_timestamp")),
      typeOverrides = Map("event_type" -> ClickHouseDdl.EventTypeEnum8))
    assert(toks(ddl) == toks(referenceDdl("nodes_cdc")),
      s"generated DDL diverged from the reference:\n$ddl")
  }

  test("golden: relationships_cdc DDL matches the reference table") {
    val ddl = ClickHouseDdl.createTable(
      table = "relationships_cdc",
      schema = Encoders.product[RelationshipEvent].schema,
      engine = ClickHouseDdl.MergeTree,
      orderBy = Seq("event_timestamp", "event_id"),
      partitionBy = Some(ClickHouseDdl.toYYYYMM("event_timestamp")),
      typeOverrides = Map("event_type" -> ClickHouseDdl.EventTypeEnum8))
    assert(toks(ddl) == toks(referenceDdl("relationships_cdc")),
      s"generated DDL diverged from the reference:\n$ddl")
  }

  test("golden: both Kafka-engine queue tables match the reference") {
    for ((table, topic, group) <- Seq(
        ("nodes_kafka_queue", "neo4j-cdc-nodes", "clickhouse_nodes_consumer"),
        ("relationships_kafka_queue", "neo4j-cdc-relationships",
          "clickhouse_relationships_consumer"))) {
      val ddl = ClickHouseDdl.kafkaEngineTable(table, "kafka:9092", topic, group)
      assert(toks(ddl) == toks(referenceDdl(table)),
        s"generated queue DDL diverged from the reference:\n$ddl")
    }
  }

  test("ReplacingMergeTree DDL carries the version column and nullable wrappers") {
    val schema = StructType(Seq(
      StructField("entity_id", StringType, nullable = false),
      StructField("version", LongType, nullable = false),
      StructField("payload", StringType, nullable = true)))
    val ddl = ClickHouseDdl.createTable(
      table = "nodes_current", schema = schema,
      engine = ClickHouseDdl.ReplacingMergeTree("version"),
      orderBy = Seq("entity_id"),
      nullable = Set("payload"),
      settings = Seq.empty)
    assert(ddl.contains("ENGINE = ReplacingMergeTree(version)"))
    assert(ddl.contains("payload Nullable(String)"))
    assert(ddl.contains("ORDER BY (entity_id)"))
    assert(!ddl.contains("SETTINGS"))
    // the dedup engine the reference's OPTIMIZE FINAL pass relies on
    // (04-optimize-tables.sql:28-29) — newest version wins, the
    // storage-side twin of CurrentState.latest
  }

  test("write-side type map speaks ClickHouse, not ANSI") {
    def t(dt: DataType) =
      ClickHouseDialect.getJDBCType(dt).map(_.databaseTypeDefinition)
    assert(t(StringType).contains("String"))
    assert(t(LongType).contains("Int64"))
    assert(t(IntegerType).contains("Int32"))
    assert(t(DoubleType).contains("Float64"))
    assert(t(TimestampType).contains("DateTime64(3)"))
    assert(t(DateType).contains("Date32"))
    assert(t(BooleanType).contains("Bool"))
    assert(t(DecimalType(12, 2)).contains("Decimal(12, 2)"))
    assert(t(ArrayType(StringType)).contains("Array(String)"))
    assert(t(ArrayType(ArrayType(LongType))).contains("Array(Array(Int64))"))
    // no mapping → None (caller fails loudly), never a silent TEXT
    assert(t(StructType(Seq(StructField("x", LongType)))).isEmpty)
    // nullability is the type wrapper, not a NOT NULL suffix
    assert(ClickHouseDdl.columnType(StringType, nullable = true)
      == "Nullable(String)")
    assert(ClickHouseDdl.columnType(ArrayType(StringType), nullable = true)
      == "Array(String)", "ClickHouse forbids Nullable(Array)")
  }

  test("read-side type map handles parameterized and wrapped names") {
    def c(n: String) = ClickHouseDialect.catalystType(n)
    assert(c("String").contains(StringType))
    assert(c("Nullable(Int64)").contains(LongType))
    assert(c("Array(String)").contains(ArrayType(StringType)))
    assert(c("Nullable(Array(Nullable(Float64)))")
      .contains(ArrayType(DoubleType)))
    assert(c("DateTime64(3)").contains(TimestampType))
    assert(c("DateTime").contains(TimestampType))
    assert(c("Decimal(20, 4)").contains(DecimalType(20, 4)))
    assert(c("Enum8('INSERT' = 1, 'UPDATE' = 2, 'DELETE' = 3)")
      .contains(StringType))
    assert(c("UInt64").contains(DecimalType(20, 0)), "UInt64 overflows Long")
    assert(c("LowCardinality(String)").contains(StringType),
      "LowCardinality is an encoding wrapper, not a type")
    assert(c("LowCardinality(Nullable(String))").contains(StringType))
    assert(c("AggregateFunction(sum, Int64)").isEmpty, "unknown types stay None")
  }

  test("read-side map covers every legitimate decimal spelling (ADVICE r5)") {
    def c(n: String) = ClickHouseDialect.catalystType(n)
    assert(c("Decimal(10)").contains(DecimalType(10, 0)), "one-arg = scale 0")
    assert(c("Decimal32(4)").contains(DecimalType(9, 4)))
    assert(c("Decimal64(8)").contains(DecimalType(18, 8)))
    assert(c("Decimal128(20)").contains(DecimalType(38, 20)))
    assert(c("Nullable(Decimal64(2))").contains(DecimalType(18, 2)))
    // past Spark's 38-digit max, or malformed → None (Spark default
    // mapping applies) rather than an exception out of the read path
    assert(c("Decimal256(10)").isEmpty)
    assert(c("Decimal").isEmpty)
    assert(c("Decimal(x, y)").isEmpty)
    assert(c("Decimal(1, 2, 3)").isEmpty)
  }

  test("write and read type maps are mutual inverses on the supported lattice") {
    // a type that survives write → DDL text → read-back unchanged is
    // safe for round-trip pipelines (snapshot export + re-import);
    // BinaryType is deliberately absent — it lands as String (lossy by
    // design, ClickHouse has no separate bytes type)
    val types: Seq[DataType] = Seq(StringType, BooleanType, ByteType,
      ShortType, IntegerType, LongType, FloatType, DoubleType, DateType,
      TimestampType, DecimalType(12, 2), ArrayType(StringType),
      ArrayType(ArrayType(DoubleType)))
    for (dt <- types) {
      val plain = ClickHouseDdl.columnType(dt, nullable = false)
      assert(ClickHouseDialect.catalystType(plain).contains(dt),
        s"$dt -> $plain failed to round-trip")
      val wrapped = ClickHouseDdl.columnType(dt, nullable = true)
      assert(ClickHouseDialect.catalystType(wrapped).contains(dt),
        s"$dt -> $wrapped (nullable) failed to round-trip")
    }
  }

  test("dialect scoping: handles clickhouse URLs only; truncate is plain") {
    assert(ClickHouseDialect.canHandle("jdbc:clickhouse://host:8123/cdc"))
    assert(ClickHouseDialect.canHandle("jdbc:ch://host:8123/cdc"))
    assert(!ClickHouseDialect.canHandle("jdbc:derby:memory:db"),
      "must not shadow the Derby round-trip (snapshot_jdbc)")
    assert(!ClickHouseDialect.canHandle("jdbc:postgresql://h/db"))
    assert(ClickHouseDialect.getTruncateQuery("cdc.nodes_cdc", Some(true))
      == "TRUNCATE TABLE cdc.nodes_cdc")
    assert(ClickHouseDialect.isCascadingTruncateTable().contains(false))
    assert(ClickHouseDialect.quoteIdentifier("event_id") == "`event_id`")
    ClickHouseDialect.register()
    ClickHouseDialect.register() // idempotent
  }
}
