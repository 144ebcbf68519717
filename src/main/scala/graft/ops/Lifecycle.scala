package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-lifecycle jobs (SURVEY §2.1 S11, §2.10 P1/P2).
  *
  * The reference partitions every MV (`PARTITION BY intDiv(block,
  * 100000)` / `toYYYYMM`, `usdc-transfers/sql/analytics.sql:11,27,...`),
  * clusters within parts (`ORDER BY`, `:12`), and ships an archive job
  * that moves cold rows out of the hot table
  * (`sql/archive-strategy.sql:47-72`, complete view `:41-44`).
  *
  * Spark-first: hive-style `partitionBy` directories give partition
  * pruning; `sortWithinPartitions` before write gives Parquet row-group
  * min/max stats the sparse-primary-index role; archival is a
  * partition-granular copy+drop, never a row-level delete. At 100 TB the
  * archive job touches only the cold partitions' files — the hot path
  * is never rewritten.
  */
object Lifecycle {

  /** Lay out events as a partitioned, clustered lake table:
    * month partitions (P1), (user_id, ts) clustering within each (P2). */
  def writePartitionedLake(spark: SparkSession, sfDir: String, outDir: String): Unit =
    graft.Tables.events(spark, sfDir)
      .withColumn("month", date_format(col("ts"), "yyyyMM").cast("int"))
      .repartition(col("month"))
      .sortWithinPartitions("user_id", "ts")
      .write.mode("overwrite").partitionBy("month").parquet(outDir)

  /** Archive job (S11): split the lake at a month cutoff into live and
    * archive roots. Pure partition-level filter+write; dynamic partition
    * overwrite keeps re-runs idempotent. */
  def archiveBefore(spark: SparkSession, lakeDir: String, cutoffMonth: Int,
                    archiveDir: String, liveDir: String): Unit = {
    val lake = spark.read.parquet(lakeDir)
    val write = (df: DataFrame, dir: String) =>
      df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("month").parquet(dir)
    write(lake.filter(col("month") < cutoffMonth), archiveDir)
    write(lake.filter(col("month") >= cutoffMonth), liveDir)
  }

  /** U2 complete view: archive ∪ live as one multi-path scan. */
  def completeView(spark: SparkSession, dirs: Seq[String]): DataFrame =
    spark.read.parquet(dirs: _*)
}
