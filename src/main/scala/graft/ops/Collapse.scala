package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** CDC `_sign`/`_version` collapse (SURVEY §2.8 T4, §2.4 A8).
  *
  * The reference's ClickHouse replica stamps every replicated row with
  * `_sign Int8` (+1 live / -1 deleted) and `_version UInt64`
  * (`usdc-transfers/README.md:150`); a correct read keeps the
  * latest-version row per key and drops `_sign = -1`
  * (ReplacingMergeTree `sql/analytics.sql:91-94`; `WHERE _sign = 1`
  * filters at `sql/analytics.sql:21,37,52,67,87,105`).
  *
  * Spark-first shape: `row_number() OVER (PARTITION BY key ORDER BY
  * _version DESC) = 1` then the sign filter — one shuffle on the key,
  * sort only within each key group. At 100 TB the key (entity id) is
  * high-cardinality and uniform, so the window partitions stay tiny;
  * no skew risk, and AQE coalesces the post-shuffle partitions.
  */
object Collapse {

  /** Collapse a versioned changelog to its live rows. */
  def collapse(df: DataFrame, keys: Seq[String],
               versionCol: String = "_version",
               signCol: String = "_sign"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(signCol) === 1)
      .drop("__rn")
  }

  /** Fixture query: synthesize a deterministic changelog from `events`
    * (every 10th event is a delete marker, `_version` = event_id;
    * FIXTURES.md "synthesized in-test"), collapse to keep-last-per-
    * (user, type), expose the surviving version + value. */
  def cdcCollapse(spark: SparkSession, sfDir: String): DataFrame = {
    val versioned = Tables.events(spark, sfDir)
      .withColumn("_sign", when(col("event_id") % 10 === 0, lit(-1)).otherwise(lit(1)))
      .withColumn("_version", col("event_id"))
    collapse(versioned, Seq("user_id", "event_type"))
      .select(col("user_id"), col("event_type"),
              col("_version").as("last_version"), col("value").as("last_value"))
      .orderBy("user_id", "event_type")
  }
}
