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

  /** Small-file compaction — the maintenance job every streaming sink
    * needs (each micro-batch append leaves one small file; ClickHouse's
    * background part-merge plays this role for the reference's MVs).
    * Rewrites a parquet dir into ~`targetBytes` files sized from the
    * actual on-disk footprint, preserving the clustering sort. Writes to
    * a fresh dir first, so readers never observe partially-written
    * output; the swap itself is two renames, between which the path is
    * briefly absent (a crash there leaves the data intact at
    * `<dir>.old`). True atomicity needs a table format/catalog commit —
    * at production scale run this under the maintenance job's lock.
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String, targetBytes: Long = 128L << 20,
              sortCols: Seq[String] = Nil): (Int, Int) = {
    def parquetFiles(d: java.io.File): Seq[java.io.File] = {
      val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
      kids.filter(_.isFile).filter(_.getName.endsWith(".parquet")) ++
        kids.filter(_.isDirectory).flatMap(parquetFiles)
    }
    val root = new java.io.File(dir)
    val before = parquetFiles(root)
    val nOut = math.max(1, math.ceil(before.map(_.length).sum.toDouble / targetBytes).toInt)
    val df0 = spark.read.parquet(dir).coalesce(nOut)
    val df = if (sortCols.nonEmpty) df0.sortWithinPartitions(sortCols.map(col): _*) else df0
    val tmp = dir.stripSuffix("/") + ".compacting"
    df.write.mode("overwrite").parquet(tmp)
    val bak = dir.stripSuffix("/") + ".old"
    java.nio.file.Files.move(root.toPath, new java.io.File(bak).toPath)
    java.nio.file.Files.move(new java.io.File(tmp).toPath, root.toPath)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(bak))
    (before.size, parquetFiles(root).size)
  }
}
