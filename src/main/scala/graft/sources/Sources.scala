package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink abstraction — the Spark form of the reference's
  * `DatabaseConnection` ABC and `DatabaseType` selector
  * (reference: cdc_system.py:39-56, config.py:6-30): the engine's
  * operators are storage-agnostic DataFrame transforms; these small
  * adapters are the only place a concrete format appears.
  *
  * Parquet is the canonical test/bench format (what the driver testdata
  * ships); JDBC covers the reference's declared postgresql/mysql backends
  * (reference: config.py:14-16 — declared, stubbed there too: no JDBC
  * database exists in this environment, so the JDBC adapters are plumbing
  * wired to `spark.read/write.format("jdbc")` and exercised only by
  * construction in tests).
  */
sealed trait CdcSource {
  def load(spark: SparkSession): DataFrame
}

sealed trait CdcSink {
  def save(df: DataFrame): Unit
}

/** Parquet directory/file source; `schema` skips inference when given. */
final case class ParquetSource(path: String, schema: Option[StructType] = None)
    extends CdcSource {
  override def load(spark: SparkSession): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).parquet(path)
  }
}

/** JSONL (newline-delimited JSON) source — the format raw training
  * corpora actually arrive in. PERMISSIVE mode with an explicit corrupt-
  * record column: a malformed line lands as a row whose data columns are
  * null and whose `_corrupt` holds the raw text, so ingestion can count /
  * quarantine bad lines instead of dying mid-crawl (FAILFAST) or silently
  * dropping them (DROPMALFORMED). Schema is REQUIRED: schema inference
  * over 100 TB of JSONL is a full extra pass.
  *
  * Spark contract note: a query referencing ONLY the corrupt column over
  * raw JSON is disallowed (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache or
  * land the parsed frame first, then split good/bad rows.
  */
final case class JsonlSource(
    path: String,
    schema: StructType,
    corruptCol: String = "_corrupt")
    extends CdcSource {
  override def load(spark: SparkSession): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
}

/** CSV source with the same PERMISSIVE corrupt-line quarantine contract
  * as [[JsonlSource]] (schema required; a malformed line — wrong arity,
  * unparseable field — lands with null data columns and the raw text in
  * `corruptCol`).
  */
final case class CsvSource(
    path: String,
    schema: StructType,
    corruptCol: String = "_corrupt",
    header: Boolean = false)
    extends CdcSource {
  override def load(spark: SparkSession): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .option("header", header.toString)
      .csv(path)
}

/** ORC source/sink — the other columnar format Spark reads natively;
  * same pushdown/pruning properties as parquet.
  */
final case class OrcSource(path: String, schema: Option[StructType] = None)
    extends CdcSource {
  override def load(spark: SparkSession): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).orc(path)
  }
}

final case class OrcSink(path: String, mode: String = "overwrite")
    extends CdcSink {
  override def save(df: DataFrame): Unit =
    df.write.mode(mode).orc(path)
}

/** JDBC table source (postgresql/mysql/...; driver inferred from url). */
final case class JdbcSource(
    url: String,
    table: String,
    options: Map[String, String] = Map.empty)
    extends CdcSource {
  override def load(spark: SparkSession): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).load()
}

final case class ParquetSink(path: String, mode: String = "overwrite")
    extends CdcSink {
  override def save(df: DataFrame): Unit =
    df.write.mode(mode).parquet(path)
}

final case class JdbcSink(
    url: String,
    table: String,
    mode: String = "append",
    options: Map[String, String] = Map.empty)
    extends CdcSink {
  override def save(df: DataFrame): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).mode(mode).save()
}

/** Transactional-table source: snapshot-isolated read of a [[TxTable]],
  * optionally time-traveled to a pinned version — the config arm that
  * lets a CDC pipeline read its own ACID target (or any TxTable) through
  * the same S11 switch as parquet/jdbc.
  */
final case class TxTableSource(path: String, version: Option[Long] = None)
    extends CdcSource {
  override def load(spark: SparkSession): DataFrame =
    TxTable.read(spark, path, version)
}

/** Transactional-table sink: each save is one atomic manifest-committed
  * version ("append" or "overwrite") — the ACID upgrade of [[ParquetSink]].
  */
final case class TxTableSink(path: String, mode: String = "append",
    statsColumns: Seq[String] = Nil)
    extends CdcSink {
  override def save(df: DataFrame): Unit = {
    TxTable.commit(df, path, mode, statsColumns)
    ()
  }
}

object CdcSource {
  /** Config-driven selection (S11): mirrors the reference's env-driven
    * `DatabaseType` switch (reference: config.py:50-52, `DB_TYPE`).
    */
  def forConfig(
      dbType: String,
      pathOrUrl: String,
      table: String = "",
      schema: Option[StructType] = None): CdcSource = dbType.toLowerCase match {
    case "parquet" => ParquetSource(pathOrUrl, schema)
    case "jsonl" | "json" => JsonlSource(pathOrUrl,
      schema.getOrElse(throw new IllegalArgumentException(
        "jsonl source requires an explicit schema (inference = an extra full pass)")))
    case "csv" => CsvSource(pathOrUrl,
      schema.getOrElse(throw new IllegalArgumentException(
        "csv source requires an explicit schema (inference = an extra full pass)")))
    case "orc" => OrcSource(pathOrUrl, schema)
    case "postgresql" | "mysql" | "jdbc" => JdbcSource(pathOrUrl, table)
    // `table` doubles as the optional pinned version for time travel
    case "txtable" => TxTableSource(pathOrUrl,
      Option(table).filter(_.nonEmpty).map(_.toLong))
    case other => throw new IllegalArgumentException(s"unsupported db_type: $other")
  }
}
