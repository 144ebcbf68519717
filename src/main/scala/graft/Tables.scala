package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical table registry + loaders (SURVEY.md §1.4, P6).
  *
  * The reference declares one fixed schema per table
  * (`usdc-transfers/schema.graphql:1-8`, codegen'd to Postgres DDL in
  * `db/migrations/1691424065505-Data.js:5-8`) and keeps a registry of
  * per-indexer namespaces (`scripts/manage-analytics.sh:64-148`). Here the
  * namespace is a directory (one parquet file per table, driver-generated,
  * see TESTDATA.md) and the registry is this object. Parquet is the
  * columnar analytics layout (vectorized reader = the ClickHouse
  * MergeTree role).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Load one table from a scale-factor directory. Plain parquet scan:
    * Catalyst handles column pruning + predicate pushdown into the scan
    * (the reference pushes these to its remote gateway,
    * `usdc-transfers/src/main.ts:46-57`; with Parquet they are free).
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize a raw `ts` column to session-zoned TimestampType whatever
    * parquet encoding the fixture generator used — the loader-contract
    * equivalent of the reference's datetime marshal codec
    * (`usdc-transfers/src/model/generated/marshal.ts:89`), which likewise
    * accepts any wire encoding and emits one canonical type:
    *  - TIMESTAMP(NANOS): the vectorized reader rejects it outright
    *    ([PARQUET_TYPE_ILLEGAL]); with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as
    *    LongType nanos and we truncate to microseconds (`ts DIV 1000`),
    *    bit-identical to DuckDB's own ns→µs truncation.
    *  - TIMESTAMP micros without TZ annotation → TimestampNTZType: cast
    *    to TimestampType. Every graft session pins the timezone to UTC
    *    (Sessions.scala), so the cast re-labels the same instant — no
    *    value shift — and downstream `unix_micros` / `withWatermark`
    *    (which require the zoned type) work unchanged.
    *  - TIMESTAMP micros UTC-adjusted → already TimestampType: pass.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Canonical events load: raw scan + [[normalizeTs]]. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // self-defending: the caller's session may not carry the conf (e.g.
    // a harness-owned session running SparkEntry.entry); it is a
    // runtime-settable SQLConf, so pin it before planning the scan
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(spark, sfDir, "events"))
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
