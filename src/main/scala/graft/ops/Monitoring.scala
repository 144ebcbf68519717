package graft.ops

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Pipeline observability — the reference's `sql/monitoring.sql` role
  * (row counts, volume totals, table health probes) played by Spark's
  * `Observation` metrics: exact aggregates piggybacked on a query's own
  * scan, collected driver-side when the action completes. Zero extra
  * passes — where ClickHouse reads system tables after the fact, the
  * observation rides the job that does the work, so 100 TB of input is
  * metered by the job that already read it. */
object Monitoring {

  /** The daily rollup instrumented with scan-side metrics: input rows,
    * exact value total, null-key count (data-quality probe). Call an
    * action on the DataFrame, then read `observation.get`. */
  def observedDaily(spark: SparkSession, sfDir: String): (DataFrame, Observation) = {
    val obs = Observation("daily_metrics")
    val df = Tables.events(spark, sfDir)
      .observe(obs,
        count(lit(1)).as("rows_scanned"),
        Fns.dsum(col("value")).as("value_total"),
        count(when(col("user_id").isNull, lit(1))).as("null_users"))
      .groupBy(to_date(col("ts")).as("day"), col("user_id"))
      .agg(Fns.dsum(col("value")).as("total_value"),
           count(lit(1)).as("tx_count"))
      .orderBy("day", "user_id")
    (df, obs)
  }
}
