package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window-function and multi-grain analytics (library capability beyond
  * the reference, which has no OVER clauses — SURVEY §2.5; the only
  * reference-mandated window is the keep-last dedup in Collapse).
  *
  * Scale note: both windows partition by user_id (high cardinality at
  * scale) so state per window stays tiny; the cumulative frame is
  * ROWS-based over the per-user day series. ROLLUP is one aggregate
  * with grouping-set expansion — partial aggregation still applies.
  */
object Windows {

  /** Per-user running cumulative volume by day (ROWS unbounded
    * preceding). Decimal states keep the running sums exact. */
  def runningTotal(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(38,6)")).as("v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum_value", sum(col("v")).over(w).cast("double"))
      .select(col("user_id"), col("day"), col("v").cast("double").as("day_value"), col("cum_value"))
      .orderBy("user_id", "day")
  }

  /** Day-over-day volume delta per user via lag(). */
  def dayOverDay(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(38,6)")).cast("double").as("v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    daily
      .withColumn("prev_v", lag(col("v"), 1).over(w))
      .withColumn("delta", col("v") - col("prev_v"))
      .select(col("user_id"), col("day"), col("v").as("day_value"),
              col("prev_v"), col("delta"))
      .orderBy("user_id", "day")
  }

  /** Top-3 spending days per user — per-group top-k via window rank
    * (the grouped variant of O1; `TakeOrderedAndProject` covers global
    * top-k, rank-filter covers per-key). */
  def topDaysPerUser(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(38,6)")).cast("double").as("day_value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("day_value").desc, col("day"))
    daily.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= 3)
      .orderBy("user_id", "rnk")
  }

  /** Wide pivot: one column per event type (explicit value list — a
    * dynamic pivot would need an extra distinct pass and yields a
    * nondeterministic schema). */
  def pivotEventTypes(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("day")

  /** Multi-grain totals with ROLLUP(day, event_type): per (day,type),
    * per day, and grand total in one aggregate. Grouping nulls are
    * coalesced to sentinels ('1900-01-01' / 'ALL') so the output is
    * null-free for the oracle hash compare. */
  def rollupGrains(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .rollup(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), Fns.dsum(col("value")).as("total_value"))
      .select(
        coalesce(col("day"), lit("1900-01-01").cast("date")).as("day"),
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        col("n"), col("total_value"))
      .orderBy("day", "event_type")
}
