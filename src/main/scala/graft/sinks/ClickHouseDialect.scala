package graft.sinks

import java.sql.Types
import java.util.Locale

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** SURVEY §2.I1 — ClickHouse dialect for the JDBC sink (VERDICT r4
  * missing #2): type mapping in both directions plus DDL generation
  * matching the reference's sink tables
  * (clickhouse/init/01-init-tables.sql:8-37 — `Array(String)`,
  * `DateTime64(3)`, MergeTree ORDER BY / PARTITION BY toYYYYMM, and
  * the ReplacingMergeTree(version) dedup engine
  * 04-optimize-tables.sql:28-29 relies on).
  *
  * Spark's generic JDBC path emits ANSI-ish DDL (`TEXT`, `TIMESTAMP`,
  * `NOT NULL` suffixes) that ClickHouse rejects or mis-types: it has
  * no standalone `NOT NULL` — nullability is the `Nullable(T)` type
  * wrapper — and arrays/enums are parameterized types with no ANSI
  * spelling. [[ClickHouseDialect]] plugs the type maps into Spark's
  * own `JdbcDialects` registry (the same extension point the built-in
  * Postgres/MySQL dialects use), so `spark.read/write.format("jdbc")`
  * against a `jdbc:clickhouse:` URL maps types correctly;
  * [[ClickHouseDdl]] generates the full CREATE TABLE with
  * engine/order/partition clauses, which plain Spark cannot express.
  */
object ClickHouseDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean = {
    val u = url.toLowerCase(Locale.ROOT)
    u.startsWith("jdbc:clickhouse:") || u.startsWith("jdbc:ch:")
  }

  override def quoteIdentifier(colName: String): String =
    s"`${colName.replace("`", "``")}`"

  /** Spark → ClickHouse write types. Arrays recurse (ClickHouse
    * arrays are parameterized, `Array(String)`); the `Nullable(T)`
    * wrapper is applied by [[ClickHouseDdl.columnType]], not here —
    * Spark's JdbcType carries no per-column nullability. */
  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType    => Some(JdbcType("String", Types.VARCHAR))
    case BooleanType   => Some(JdbcType("Bool", Types.BOOLEAN))
    case ByteType      => Some(JdbcType("Int8", Types.TINYINT))
    case ShortType     => Some(JdbcType("Int16", Types.SMALLINT))
    case IntegerType   => Some(JdbcType("Int32", Types.INTEGER))
    case LongType      => Some(JdbcType("Int64", Types.BIGINT))
    case FloatType     => Some(JdbcType("Float32", Types.FLOAT))
    case DoubleType    => Some(JdbcType("Float64", Types.DOUBLE))
    case t: DecimalType =>
      Some(JdbcType(s"Decimal(${t.precision}, ${t.scale})", Types.DECIMAL))
    case DateType      => Some(JdbcType("Date32", Types.DATE))
    // DateTime64(3): millisecond precision, the reference's event
    // timestamp type (01-init-tables.sql:11)
    case TimestampType => Some(JdbcType("DateTime64(3)", Types.TIMESTAMP))
    case BinaryType    => Some(JdbcType("String", Types.BINARY))
    case ArrayType(et, _) =>
      getJDBCType(et).map(t =>
        JdbcType(s"Array(${t.databaseTypeDefinition})", Types.ARRAY))
    case _ => None
  }

  /** ClickHouse → Spark read types, by ClickHouse type NAME (the
    * driver reports parameterized names like `DateTime64(3)`,
    * `Nullable(Int64)`, `Array(String)`, `Enum8('INSERT' = 1, ...)` —
    * JDBC type codes alone under-determine them). */
  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
                               md: MetadataBuilder): Option[DataType] =
    catalystType(typeName)

  private[graft] def catalystType(raw: String): Option[DataType] = {
    val t = raw.trim
    val lower = t.toLowerCase(Locale.ROOT)
    if (lower.startsWith("nullable(") && t.endsWith(")"))
      catalystType(t.substring("nullable(".length, t.length - 1))
    // LowCardinality is a dictionary-encoding wrapper, not a type —
    // real ClickHouse schemas use it on most string dims
    else if (lower.startsWith("lowcardinality(") && t.endsWith(")"))
      catalystType(t.substring("lowcardinality(".length, t.length - 1))
    else if (lower.startsWith("array(") && t.endsWith(")"))
      catalystType(t.substring("array(".length, t.length - 1))
        .map(ArrayType(_, containsNull = true))
    else if (lower.startsWith("datetime")) Some(TimestampType)
    else if (lower.startsWith("decimal")) {
      // All legitimate ClickHouse spellings: Decimal(P, S), Decimal(P)
      // (scale 0), and the sized aliases Decimal32/64/128(S) with fixed
      // precision 9/18/38. Decimal256 exceeds Spark's 38-digit max and
      // anything malformed falls back to None (Spark's default JDBC
      // mapping) instead of throwing out of the read path.
      val paren = lower.indexOf('(')
      if (paren < 0 || !t.endsWith(")")) None
      else try {
        val args = t.substring(paren + 1, t.length - 1).split(',')
          .map(_.trim).filter(_.nonEmpty).map(_.toInt)
        (lower.substring(0, paren), args) match {
          case ("decimal", Array(p, sc)) => Some(DecimalType(p, sc))
          case ("decimal", Array(p))     => Some(DecimalType(p, 0))
          case ("decimal32", Array(sc))  => Some(DecimalType(9, sc))
          case ("decimal64", Array(sc))  => Some(DecimalType(18, sc))
          case ("decimal128", Array(sc)) => Some(DecimalType(38, sc))
          case _                         => None
        }
      } catch { case _: NumberFormatException => None }
    }
    // enums read back as their string labels (the reference's
    // event_type round-trips as INSERT/UPDATE/DELETE strings)
    else if (lower.startsWith("enum")) Some(StringType)
    else if (lower.startsWith("fixedstring")) Some(StringType)
    else lower match {
      case "string"           => Some(StringType)
      case "bool"             => Some(BooleanType)
      case "int8"             => Some(ByteType)
      case "int16" | "uint8"  => Some(ShortType)
      case "int32" | "uint16" => Some(IntegerType)
      case "int64" | "uint32" => Some(LongType)
      case "uint64"           => Some(DecimalType(20, 0))
      case "float32"          => Some(FloatType)
      case "float64"          => Some(DoubleType)
      case "date" | "date32"  => Some(DateType)
      case _                  => None
    }
  }

  /** ClickHouse TRUNCATE takes no CASCADE and truncation never
    * cascades (no foreign keys). */
  override def getTruncateQuery(table: String,
                                cascade: Option[Boolean]): String =
    s"TRUNCATE TABLE $table"

  override def isCascadingTruncateTable(): Option[Boolean] = Some(false)

  private val registered = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Idempotent registration into Spark's dialect registry — call once
    * before reading/writing a `jdbc:clickhouse:` URL (registerDialect
    * prepends; guarding keeps repeated sink setup from stacking
    * duplicate entries). */
  def register(): Unit =
    if (registered.compareAndSet(false, true)) JdbcDialects.registerDialect(this)
}

/** CREATE TABLE generation for ClickHouse sink tables — the part of
  * the reference's DDL (engine, ORDER BY, PARTITION BY, SETTINGS)
  * Spark's JDBC writer has no vocabulary for. Golden-tested against
  * `clickhouse/init/01-init-tables.sql` in ClickHouseDialectSpec. */
object ClickHouseDdl {

  sealed trait Engine { def sql: String }
  /** The reference's CDC landing tables (01-init-tables.sql:17). */
  case object MergeTree extends Engine { val sql = "MergeTree()" }
  /** Latest-state tables: newest `versionCol` wins at merge/OPTIMIZE
    * FINAL — the dedup semantics 04-optimize-tables.sql:28-29 applies,
    * the storage twin of our CurrentState operator. */
  final case class ReplacingMergeTree(versionCol: String) extends Engine {
    def sql = s"ReplacingMergeTree($versionCol)"
  }

  /** ClickHouse column type for a Spark field: dialect base type, with
    * nullability as the `Nullable(T)` wrapper. Arrays are never
    * wrapped (ClickHouse forbids `Nullable(Array(...))`; element
    * nullability is likewise structural and dropped here — the
    * reference schema stores dense label arrays). */
  def columnType(dt: DataType, nullable: Boolean): String = {
    val base = ClickHouseDialect.getJDBCType(dt).getOrElse(
      throw new IllegalArgumentException(
        s"no ClickHouse mapping for Spark type ${dt.simpleString}")
    ).databaseTypeDefinition
    if (nullable && !dt.isInstanceOf[ArrayType]) s"Nullable($base)" else base
  }

  /** The full CREATE TABLE, shaped like the reference's
    * (01-init-tables.sql:8-20): one column per schema field in order,
    * engine + ORDER BY + optional PARTITION BY + SETTINGS clauses.
    *
    * @param typeOverrides per-column ClickHouse type text, for types
    *        Spark cannot express — the reference's
    *        `Enum8('INSERT' = 1, ...)` event_type, a LowCardinality
    *        wrapper, a codec. The override is spliced verbatim.
    * @param nullable marks columns to wrap in `Nullable(...)`;
    *        default none — MergeTree columns are dense, and the
    *        reference declares none (Spark's encoder-derived
    *        nullability would mark every String nullable, which is an
    *        artifact of the JVM type, not the sink contract).
    */
  def createTable(table: String, schema: StructType,
                  engine: Engine,
                  orderBy: Seq[String],
                  partitionBy: Option[String] = None,
                  typeOverrides: Map[String, String] = Map.empty,
                  nullable: Set[String] = Set.empty,
                  settings: Seq[(String, String)] = Seq("index_granularity" -> "8192"),
                  ifNotExists: Boolean = true): String = {
    require(orderBy.nonEmpty,
      "MergeTree-family tables require an ORDER BY key (use tuple() for none)")
    val unknown = (typeOverrides.keySet ++ nullable) -- schema.fieldNames
    require(unknown.isEmpty, s"overrides name absent columns: $unknown")
    val cols = schema.fields.map { f =>
      val t = typeOverrides.getOrElse(f.name,
        columnType(f.dataType, nullable(f.name)))
      s"    ${f.name} $t"
    }.mkString(",\n")
    val exists = if (ifNotExists) "IF NOT EXISTS " else ""
    val order = orderBy.mkString("(", ", ", ")")
    val partition = partitionBy.map(p => s"\nPARTITION BY $p").getOrElse("")
    val sets =
      if (settings.isEmpty) ""
      else settings.map { case (k, v) => s"$k = $v" }
        .mkString("\nSETTINGS ", ", ", "")
    s"""CREATE TABLE $exists$table (
       |$cols
       |) ENGINE = ${engine.sql}
       |ORDER BY $order$partition$sets;""".stripMargin
  }

  /** Month partition expression over a timestamp column — the
    * reference's layout (PARTITION BY toYYYYMM(event_timestamp)),
    * matching ParquetSink's month-partitioned tree. */
  def toYYYYMM(col: String): String = s"toYYYYMM($col)"

  /** The reference's Kafka-engine queue table
    * (01-init-tables.sql:40-49): a single raw String column consumed
    * from a topic, parameterized by the same settings
    * `CdcStream.kafkaSourceOptions` maps to Spark (broker list, topic,
    * consumer group, max block ↔ maxOffsetsPerTrigger). Generated so a
    * user standing up the reference's ClickHouse side from graft gets
    * the full init surface; the MATERIALIZED VIEWs that parse the
    * queue are deliberately NOT generated — their JSON-extraction
    * logic is re-expressed natively as [[graft.sources.CdcJson]], and
    * a Spark deployment lands TYPED rows via the JDBC sink instead of
    * re-parsing inside ClickHouse. */
  def kafkaEngineTable(table: String, brokerList: String, topic: String,
                       groupName: String, format: String = "JSONAsString",
                       numConsumers: Int = 2, maxBlockSize: Long = 1048576L,
                       ifNotExists: Boolean = true): String = {
    val exists = if (ifNotExists) "IF NOT EXISTS " else ""
    s"""CREATE TABLE $exists$table (
       |    raw String
       |) ENGINE = Kafka
       |SETTINGS
       |    kafka_broker_list = '$brokerList',
       |    kafka_topic_list = '$topic',
       |    kafka_group_name = '$groupName',
       |    kafka_format = '$format',
       |    kafka_num_consumers = $numConsumers,
       |    kafka_max_block_size = $maxBlockSize;""".stripMargin
  }

  /** The reference's INSERT/UPDATE/DELETE event enum
    * (01-init-tables.sql:10). */
  val EventTypeEnum8: String =
    "Enum8('INSERT' = 1, 'UPDATE' = 2, 'DELETE' = 3)"
}
