package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series gap filling (round 15) — ClickHouse's `ORDER BY day
  * WITH FILL [FROM … TO … STEP 1] INTERPOLATE (col AS expr)` as a
  * Spark plan. A sparse per-(key, day) aggregate becomes a DENSE
  * series: every key × every day of the spine appears, absent
  * measures fill with declared defaults, and carry-forward columns
  * interpolate from the last present row (the dashboard-friendly
  * "last known value" line).
  *
  * Spark-first shape, and why it scales:
  *  1. the spine is `sequence(min_day, max_day)` exploded ONCE — a
  *     few-KB driver-free generate_series, never a table scan;
  *  2. keys × spine is a broadcast nested-loop of two TINY sides
  *     (distinct keys × days — report-sized by definition, the same
  *     cardinality the dense report itself has);
  *  3. the dense frame LEFT-joins the sparse aggregate on (key, day)
  *     — one hash shuffle of report-sized rows, not facts;
  *  4. carry-forward is `last(col, ignoreNulls) OVER (PARTITION BY
  *     key ORDER BY day)` — a running frame, no self-joins.
  * The fact table is read exactly once (the aggregate). */
object GapFill {

  /** Densify `sparse` (one row per (keys…, dayCol) present) over the
    * full day spine [min(day), max(day)]: missing rows appear with
    * `defaults` for their columns; `carryForward` columns additionally
    * interpolate from the last present row per key group (NULL before
    * the first observation — ClickHouse INTERPOLATE's own behavior). */
  def fillDays(sparse: DataFrame, dayCol: String, keys: Seq[String],
               defaults: Map[String, Column],
               carryForward: Seq[String] = Nil): DataFrame = {
    val bounds = sparse.agg(min(col(dayCol)).as("lo"), max(col(dayCol)).as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"))).as(dayCol))
    val keyRows = sparse.select(keys.map(col): _*).distinct()
    val dense = broadcast(keyRows).crossJoin(broadcast(spine))
    val joined = dense.join(sparse, keys :+ dayCol, "left")
    val filled = defaults.foldLeft(joined) { case (df, (c, d)) =>
      df.withColumn(c, coalesce(col(c), d))
    }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carryForward.foldLeft(filled) { case (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** The GENERAL `WITH FILL FROM … TO … STEP …` over an arbitrary
    * NUMERIC axis (round 16 — q226 above is the day-spine special
    * case): every key × every grid value `from, from+step, … < to`
    * (TO exclusive, ClickHouse's contract) appears; missing rows take
    * `defaults`; each `interpolate` column is ClickHouse's
    * `INTERPOLATE (col AS expr)` — a filled row's value is `expr`
    * applied to the PREVIOUS row's value, iterated across the gap
    * (NULL before the first observation). Carry-forward is the
    * identity expr.
    *
    * Scale shape: the spine is a driver-free `sequence` explode,
    * keys × spine a broadcast of two report-sized sides, the join one
    * hash shuffle of report rows, and the interpolation two window
    * passes + a per-row fold bounded by the gap length — the fact is
    * read only by the caller's aggregate. CONTRACT: the sparse
    * frame's `xCol` values must lie ON the grid (callers bucket with
    * the same step); off-grid rows would be dropped, so bucket first.
    *
    * Why the fold, honestly: ClickHouse evaluates INTERPOLATE's expr
    * once per emitted filled row, carrying the previous value — a
    * stateful iteration. `aggregate(sequence(1, k), v0, (acc, _) →
    * expr(acc))` reproduces exactly that with k = the row's distance
    * from the last real row, computed from a running count-of-real
    * window — no self-joins, no driver loops. */
  def fillNumericRange(sparse: DataFrame, xCol: String, keys: Seq[String],
                       from: Long, to: Long, step: Long,
                       defaults: Map[String, Column],
                       interpolate: Map[String, Column => Column] = Map.empty)
      : DataFrame = {
    require(step > 0, s"STEP must be positive, got $step")
    require(to > from, s"TO ($to) must exceed FROM ($from)")
    require(defaults.keySet.intersect(interpolate.keySet).isEmpty,
      "a column cannot both default and interpolate — the default would " +
        "overwrite the NULL the interpolation keys on")
    // the fill machinery injects helper columns; a sparse frame that
    // already carries one of those names would be silently overwritten
    // and then dropped (round 17, review finding) — refuse loudly.
    // _seg/_k are reserved only on the interpolate path (the plain
    // default fill injects _real alone — previously-working inputs
    // stay working)
    val helpers = "_real" +: (if (interpolate.isEmpty) Nil else Seq("_seg", "_k"))
    val reserved = helpers.filter(sparse.columns.contains)
    require(reserved.isEmpty,
      s"sparse frame already carries reserved helper column(s) " +
        s"${reserved.mkString(",")} — rename them before gap-filling")
    val last = from + ((to - 1 - from) / step) * step
    val spine = sparse.sparkSession.range(1)
      .select(explode(sequence(lit(from), lit(last), lit(step))).as(xCol))
    val keyRows = sparse.select(keys.map(col): _*).distinct()
    val dense = broadcast(keyRows).crossJoin(broadcast(spine))
      .join(sparse.withColumn("_real", lit(1)), keys :+ xCol, "left")
    val filled = defaults.foldLeft(dense) { case (df, (c, d)) =>
      df.withColumn(c, coalesce(col(c), d))
    }
    if (interpolate.isEmpty) filled.drop("_real")
    else {
      val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(col(xCol))
      val withSeg = filled.withColumn("_seg",
        sum(coalesce(col("_real"), lit(0))).over(wOrd))
      val wSeg = Window.partitionBy(keys.map(col) :+ col("_seg"): _*)
        .orderBy(col(xCol))
      val withK = withSeg.withColumn("_k", row_number().over(wSeg) - 1)
      val out = interpolate.foldLeft(withK) { case (df, (c, f)) =>
        // the segment's first row IS the last real row; its value
        // seeds the fold that replays expr once per filled step
        val v0 = first(col(c), ignoreNulls = true).over(wSeg)
        df.withColumn(c,
          when(col("_seg") === 0, lit(null)) // before the first observation
            .when(col("_k") === 0, col(c)) // a real row keeps its value
            .otherwise(aggregate(
              sequence(lit(1), col("_k")), v0, (acc, _) => f(acc))))
      }
      out.drop("_real", "_seg", "_k")
    }
  }

  /** Driver entry (q242, oracled): `WITH FILL FROM 0 TO 600 STEP 25
    * INTERPOLATE (ceiling AS ceiling + 1)` over a NUMERIC axis — the
    * per-type value-bucket histogram densified over the full grid:
    * counts and volume zero-fill, and the per-bucket running ceiling
    * interpolates +1 per filled step from the last observed bucket's
    * value (a linear expr, so the DuckDB oracle can spell the fold in
    * closed form: last real value + steps-since × 1). */
  def filledBucketSeries(spark: SparkSession, sfDir: String): DataFrame = {
    val sparse = Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
               (floor(col("value") / 25.0d) * 25).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
           Fns.dsum(col("value")).as("volume"),
           max(col("value")).as("ceiling"))
      .filter(col("bucket") >= 0 && col("bucket") < 600)
    fillNumericRange(sparse, "bucket", Seq("event_type"),
        from = 0L, to = 600L, step = 25L,
        defaults = Map("n" -> lit(0L), "volume" -> lit(0.0d)),
        interpolate = Map("ceiling" -> (acc => acc + lit(1.0d))))
      .select(col("event_type"), col("bucket"), col("n"),
              col("volume"), col("ceiling"))
      .orderBy("event_type", "bucket")
  }

  /** Driver entry (q226, oracled): the high-value event series per
    * type, gap-filled — rare (value > 240) events leave (day, type) holes; the
    * dense report zero-fills counts and volume and carries the last
    * observed max forward (`WITH FILL … INTERPOLATE`). The DuckDB
    * oracle builds the same spine with generate_series and the same
    * carry with IGNORE NULLS window frames. */
  def filledSeries(spark: SparkSession, sfDir: String): DataFrame = {
    val sparse = Tables.events(spark, sfDir)
      .filter(col("value") > 240.0d)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           Fns.dsum(col("value")).as("volume"),
           max(col("value")).as("day_max"))
    fillDays(sparse, "day", Seq("event_type"),
        defaults = Map("n" -> lit(0L), "volume" -> lit(0.0d)),
        carryForward = Seq("day_max"))
      .select(col("day"), col("event_type"), col("n"), col("volume"),
              col("day_max").as("last_max"))
      .orderBy("day", "event_type")
  }
}
