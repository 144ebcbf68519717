package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Fns._

/** UNION ALL composition operators (SURVEY §2.6 U1/U2, §2.2 F7).
  *
  * Scale note: `unionByName` is a zero-shuffle plan union — both branches
  * keep their own partitioning and the downstream aggregate shuffles
  * once on the group key. Aggregating each branch BEFORE the union (as
  * here) keeps the union input at rollup, not raw, cardinality.
  */
object Pivots {

  /** mv_address_activity pivot-by-role (U1,
    * `usdc-transfers/scripts/setup-analytics.sh:91-113`): the senders
    * view ∪ receivers view with a literal role discriminator (F7,
    * `'sender' AS address_type`). Star-schema casting: order customers
    * play senders, lineitem suppliers play receivers. */
  def unionPivot(spark: SparkSession, sfDir: String): DataFrame = {
    val buyers = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("address"))
      .agg(count(lit(1)).as("n_tx"), dsum(col("o_totalprice")).as("volume"))
      .withColumn("address_type", lit("buyer"))
    val suppliers = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_suppkey").as("address"))
      .agg(count(lit(1)).as("n_tx"), dsum(col("l_extendedprice")).as("volume"))
      .withColumn("address_type", lit("supplier"))
    buyers.unionByName(suppliers)
      .select("address_type", "address", "n_tx", "volume")
      .orderBy("address_type", "address")
  }

  /** Archive ∪ live view (U2, `usdc-transfers/sql/archive-strategy.sql:
    * 41-44`; lifecycle S11 :57-64): cold rows split off by a time
    * threshold and recomposed. With a partitioned lake this is a pure
    * multi-path scan — no shuffle until the rollup. */
  def archiveUnion(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val threshold = lit("2024-01-15 00:00:00").cast("timestamp")
    val archive = ev.filter(col("ts") < threshold).withColumn("store", lit("archive"))
    val live = ev.filter(col("ts") >= threshold).withColumn("store", lit("live"))
    archive.unionByName(live)
      .groupBy(col("store"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("value")).as("total_value"))
      .orderBy("store")
  }

  /** Set cohorts — INTERSECT/EXCEPT semantics (beyond the reference's
    * UNION ALL): users who both clicked and purchased, and users who
    * viewed but never purchased.
    *
    * Scale shape: the literal `intersect`/`except` composition (see
    * [[setCohortsViaSetOps]]) cannot share work — Catalyst pushes each
    * branch's `event_type =` filter below any shared distinct, so the
    * fact table is scanned and shuffled once PER SET-OP INPUT (4× here).
    * The equivalent one-pass form is a per-user boolean-flags aggregate:
    * one scan, one shuffle on user_id, and both cohorts are filters over
    * the same reused exchange. The spec asserts both forms agree. */
  def setCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    def saw(t: String) = max(when(col("event_type") === t, 1).otherwise(0))
    val flags = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase", "view"))
      .groupBy(col("user_id"))
      .agg(saw("click").as("c"), saw("purchase").as("p"), saw("view").as("v"))
    val both = flags.filter(col("c") === 1 && col("p") === 1)
      .select(lit("click_and_purchase").as("cohort"), col("user_id"))
    val viewOnly = flags.filter(col("v") === 1 && col("p") === 0)
      .select(lit("view_no_purchase").as("cohort"), col("user_id"))
    both.unionByName(viewOnly).orderBy("cohort", "user_id")
  }

  /** The same cohorts via Spark's native INTERSECT / EXCEPT (planned as
    * left-semi / left-anti hash joins over distinct key sets — no cross
    * product). Kept as the set-op capability demo; `setCohorts` is the
    * shape to run at 100 TB. */
  def setCohortsViaSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    def usersOf(t: String) =
      ev.filter(col("event_type") === t).select(col("user_id")).distinct()
    val both = usersOf("click").intersect(usersOf("purchase"))
      .withColumn("cohort", lit("click_and_purchase"))
    val viewOnly = usersOf("view").except(usersOf("purchase"))
      .withColumn("cohort", lit("view_no_purchase"))
    both.unionByName(viewOnly)
      .select(col("cohort"), col("user_id"))
      .orderBy("cohort", "user_id")
  }
}
