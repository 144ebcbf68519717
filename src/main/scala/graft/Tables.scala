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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). The session sets
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see Verify/Bench), the
    * column arrives as LongType nanos, and we truncate to microseconds —
    * `ts DIV 1000` — which is bit-identical to DuckDB's own ns→µs
    * truncation (verified against epoch_us on the fixture). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // self-defending: the caller's session may not carry the conf (e.g.
    // a harness-owned session running SparkEntry.entry); it is a
    // runtime-settable SQLConf, so pin it before planning the scan
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
    else raw
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
