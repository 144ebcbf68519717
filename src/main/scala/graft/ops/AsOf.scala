package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of (most-recent-match) join — an operator Spark SQL lacks
  * natively (capability addition; the reference has no joins at all,
  * SURVEY §2.3).
  *
  * Built by composition, per the preference order (a) in SURVEY §7.3:
  * tag both inputs, union them, and take a running `last(...,
  * ignoreNulls)` of the right-side payload over a (key, ts, side)
  * window. One shuffle on the key, one sort within partitions, no
  * per-row range probe and no pair explosion — each row is touched
  * once, so the plan scales like any windowed aggregation (key
  * cardinality × in-key time series). Right rows order before left rows
  * at equal timestamps, giving the inclusive `right.ts <= left.ts`
  * match DuckDB's native ASOF JOIN uses — which is the oracle.
  */
object AsOf {

  /** Left rows + `__asof` struct holding the most recent right row
    * (by `rightTs <= leftTs`) per key; null when no prior right row. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String): DataFrame = {
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__src"),
        struct(right.columns.map(col): _*).as("__match")): _*)
    val matchType = r.schema("__match").dataType
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__src"),
        lit(null).cast(matchType).as("__match"),
        struct(left.columns.map(col): _*).as("__left")): _*)
    val unioned = l.unionByName(r.withColumn("__left",
      lit(null).cast(l.schema("__left").dataType)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof",
        last(when(col("__src") === 0, col("__match")), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(col("__left.*"), col("__asof"))
  }

  /** Account-state attribution on the NATIVE broadcast as-of join
    * ([[graft.plans.BroadcastAsOf]]): each purchase matched to the same
    * user's most recent prior signup (account age at purchase). The
    * signup stream is the small, slowly-changing side — the broadcast
    * build — so the purchase side joins with NO shuffle anywhere in the
    * plan; the composed [[asofJoin]] stays the fact-fact path. */
  def signupAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"))
    graft.plans.BroadcastAsOf.join(purchases, signups, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("user_id"),
              col("ts").as("purchase_ts"),
              col("__asof.ts").as("signup_ts"),
              (unix_micros(col("ts")) - unix_micros(col("__asof.ts"))).as("account_age_us"))
      .orderBy("event_id")
  }

  /** Attribution query: each purchase matched to the same user's most
    * recent prior view, with the microsecond gap (null = organic). */
  def purchaseAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"))
    asofJoin(purchases, views, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("user_id"),
              col("ts").as("purchase_ts"),
              col("__asof.ts").as("last_view_ts"),
              (unix_micros(col("ts")) - unix_micros(col("__asof.ts"))).as("gap_us"))
      .orderBy("event_id")
  }

  /** FORWARD as-of: the EARLIEST right row at-or-after each left row —
    * the mirror direction ("next event": first quote after an order,
    * next page-view after a purchase). Same single-shuffle windowed
    * composition as [[asofJoin]] with the frame reversed: a running
    * `first(..., ignoreNulls)` over [current row, +∞), ordered so left
    * rows sort BEFORE right rows at equal timestamps — which makes the
    * match inclusive (`right.ts >= left.ts`), mirroring the backward
    * form's `<=`. One shuffle on the key, each row touched once. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String): DataFrame = {
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__src"),
        struct(right.columns.map(col): _*).as("__match")): _*)
    val matchType = r.schema("__match").dataType
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__src"),
        lit(null).cast(matchType).as("__match"),
        struct(left.columns.map(col): _*).as("__left")): _*)
    val unioned = l.unionByName(r.withColumn("__left",
      lit(null).cast(l.schema("__left").dataType)))
    // __src desc ⟹ left (1) before right (0) at equal __ts, so a
    // same-timestamp right row IS inside the forward frame (inclusive)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__src").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      .withColumn("__asof",
        first(when(col("__src") === 0, col("__match")), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(col("__left.*"), col("__asof"))
  }

  /** NEAREST as-of: whichever of the backward and forward matches is
    * closer in event time; equal distances prefer the PAST match — the
    * deterministic choice a fill-nearest imputation wants. Composed
    * from both directional forms: two windowed passes over the same
    * key partitioning (the second shuffle is the same hash layout, so
    * AQE/exchange-reuse keeps the marginal cost one sort), then a
    * row-local pick. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String): DataFrame = {
    val back = asofJoin(left, right, keys, leftTs, rightTs)
      .withColumnRenamed("__asof", "__back")
    val both = asofJoinForward(back, right, keys, leftTs, rightTs)
      .withColumnRenamed("__asof", "__fwd")
    val lt = unix_micros(col(leftTs))
    val backGap = lt - unix_micros(col("__back").getField(rightTs))
    val fwdGap = unix_micros(col("__fwd").getField(rightTs)) - lt
    both
      .withColumn("__asof",
        when(col("__back").isNull, col("__fwd"))
          .when(col("__fwd").isNull, col("__back"))
          .when(backGap <= fwdGap, col("__back"))
          .otherwise(col("__fwd")))
      .drop("__back", "__fwd")
  }

  /** Nearest-attribution query (q161): each purchase matched to the
    * same user's CLOSEST view in either direction (ties to the past) —
    * the imputation shape ("which browsing context does this purchase
    * belong to"). Oracle orders candidate views by absolute gap with
    * an earlier-ts tie-break, pinning the same semantics in SQL. */
  def nearestViewAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"))
    asofJoinNearest(purchases, views, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("user_id"),
              col("ts").as("purchase_ts"),
              col("__asof.ts").as("nearest_view_ts"),
              abs(unix_micros(col("__asof.ts")) - unix_micros(col("ts"))).as("gap_us"))
      .orderBy("event_id")
  }

  /** LINEAR INTERPOLATION between the as-of neighbors (q163): each
    * purchase gets the user's view value linearly interpolated between
    * the most recent view at-or-before and the earliest at-or-after —
    * the irregular-time-series resampling primitive, composed from the
    * backward and forward as-of forms. Interior-only: a row missing a
    * neighbor on either side interpolates to NULL; an exact-timestamp
    * hit degenerates to that row's value (guarding the 0/0 weight).
    * The arithmetic mirrors the oracle's expression tree term for
    * term, so the double results are bit-equal. */
  def interpolatedViewValue(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value"))
    val back = asofJoin(purchases, views, Seq("user_id"), "ts", "ts")
      .withColumnRenamed("__asof", "__back")
    val both = asofJoinForward(back, views, Seq("user_id"), "ts", "ts")
      .withColumnRenamed("__asof", "__fwd")
    val (bt, ft) = (col("__back.ts"), col("__fwd.ts"))
    val (bv, fv) = (col("__back.value"), col("__fwd.value"))
    val w = (unix_micros(col("ts")) - unix_micros(bt)).cast("double") /
            (unix_micros(ft) - unix_micros(bt)).cast("double")
    both.select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
        when(col("__back").isNull || col("__fwd").isNull, lit(null).cast("double"))
          .when(unix_micros(ft) === unix_micros(bt), bv)
          .otherwise(bv + (fv - bv) * w).as("value_interp"))
      .orderBy("event_id")
  }

  /** Forward-attribution query (q159): each purchase matched to the
    * same user's NEXT view at-or-after it — post-purchase engagement
    * (null = the user never came back). Oracle is a correlated
    * min-subquery, not DuckDB's ASOF, so the direction semantics are
    * pinned independently of any engine's ASOF defaults. */
  def nextViewAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"))
    asofJoinForward(purchases, views, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("user_id"),
              col("ts").as("purchase_ts"),
              col("__asof.ts").as("next_view_ts"),
              (unix_micros(col("__asof.ts")) - unix_micros(col("ts"))).as("gap_us"))
      .orderBy("event_id")
  }
}
