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

  /** Deterministic CANCEL-PAIR changelog over an events frame — the
    * CollapsingMergeTree WRITE protocol (the reference's replica stamps
    * `_sign Int8`, `usdc-transfers/README.md:150`; a mutation emits the
    * cancel row with the SAME payload and `_sign = -1`, then the
    * corrected re-insert with `_sign = +1`). Synthesis: every base row
    * inserts at `+1`; rows with `event_id % 7 == 0` are later mutated —
    * the cancel row appears, and unless `event_id % 21 == 0` (a pure
    * delete) the corrected re-insert lands with `value × 1.1`. Each
    * changelog row derives from its own event row alone, so the
    * synthesis is stateless and batch-split-safe (a streaming ingest
    * can emit it per micro-batch with no cross-batch coordination). */
  def cancelPairChangelogOf(ev: DataFrame): DataFrame = {
    val base = ev.select(col("event_id"), col("user_id"), col("ts"),
                         col("value"), lit(1).as("_sign"))
    val cancels = ev.filter(col("event_id") % 7 === 0)
      .select(col("event_id"), col("user_id"), col("ts"),
              col("value"), lit(-1).as("_sign"))
    val reinserts = ev.filter(col("event_id") % 7 === 0 && col("event_id") % 21 =!= 0)
      .select(col("event_id"), col("user_id"), col("ts"),
              (col("value") * 1.1).as("value"), lit(1).as("_sign"))
    base.unionByName(cancels).unionByName(reinserts)
  }

  /** The SIGNED daily partial block — CollapsingMergeTree feeding a
    * summing MV, ClickHouse's canonical retraction pattern: a cancel
    * row contributes the exact NEGATED decimal partial and −1 to the
    * count, so a mutation's (cancel, re-insert) pair nets to the
    * corrected row and a pure delete nets to zero. Negation (not
    * multiplication by `_sign`) keeps the decimal bit-exact: the cast
    * of the same payload negated cancels to exactly 0. Rows are
    * independently additive, so ANY batch split — even one separating
    * a cancel from its base insert — appends to the same rollup
    * (spec: split/ordering invariance). */
  def signedDailyPartialsOf(changelog: DataFrame): DataFrame = {
    val dv = col("value").cast("decimal(38,6)")
    changelog
      .groupBy(to_date(col("ts")).as("day"), col("user_id"))
      .agg(sum(when(col("_sign") < 0, -dv).otherwise(dv)).as("v_partial"),
           sum(col("_sign").cast("long")).as("c_partial"))
  }

  /** Read side: merge signed partials; groups whose live-row count
    * netted to zero (fully deleted) vanish, exactly like a collapsed
    * read over the current state. */
  def readSignedDailyRollup(rollup: DataFrame): DataFrame =
    rollup
      .groupBy(col("day"), col("user_id"))
      .agg(sum(col("v_partial")).cast("double").as("total_value"),
           sum(col("c_partial")).as("tx_count"))
      .filter(col("tx_count") > 0)
      .orderBy("day", "user_id")

  /** Driver entry (q153): the full batch leg — synthesize the
    * cancel-pair changelog, aggregate it into SIGNED partials, merge to
    * the final daily view. The DuckDB oracle computes the ground truth
    * from the LIVE STATE directly (deletes excluded, mutated rows at
    * their corrected value), so the hash match proves retraction
    * maintenance reproduces a full recompute exactly. */
  def cdcSummingMv(spark: SparkSession, sfDir: String): DataFrame =
    readSignedDailyRollup(
      signedDailyPartialsOf(cancelPairChangelogOf(Tables.events(spark, sfDir))))

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
